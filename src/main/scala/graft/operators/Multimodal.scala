package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

case class MediaMeta(kind: String, width: Int, height: Int, sampleRate: Int)
case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)
case class MediaFeatures(media_id: Long, n_bytes: Int, checksum: Long,
                         feature: Array[Float])

/** Multimodal-column plumbing (SURVEY.md §2B L5): media payloads as
  * opaque BinaryType columns with a typed metadata struct, processed
  * partition-parallel in batches.
  *
  * The actual decoders (image/audio/video libs) are NOT available in
  * this environment, so [[decodeStub]] is a clearly-marked
  * deterministic fake; everything around it — the schema, the
  * Dataset[MediaRow] encoder, the mapPartitions batch shape (one
  * decoder instance per partition, streaming rows through it), and
  * the downstream feature column — is the real production plumbing.
  * At 100 TB the payloads stay columnar in parquet, the decode stage
  * is a narrow map (no shuffle), and partition sizing
  * (`spark.sql.files.maxPartitionBytes`) bounds decoder memory.
  */
object Multimodal {

  /** Fixture adapter: manufacture a binary payload + metadata from the
    * documents table (no binary column ships in the fixtures). */
  def fromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        struct(
          when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
          (col("n_chars") % 640).cast("int").as("width"),
          (col("n_chars") % 480).cast("int").as("height"),
          lit(16000).as("sampleRate")).as("meta"))
      .as[MediaRow]
  }

  /** STUB — stands in for a real image/audio decoder. Deterministic:
    * derives a fixed-length "feature" from payload bytes. A real
    * implementation would decode `payload` per `meta.kind` (JPEG
    * decode + resize, PCM frame extraction, ...) with one decoder
    * instance per partition. */
  private[operators] def decodeStub(payload: Array[Byte], meta: MediaMeta): Array[Float] = {
    val dims = 8
    val out = new Array[Float](dims)
    var i = 0
    while (i < payload.length) {
      out(i % dims) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Partition-parallel decode / feature-extract: the batch shape is
    * mapPartitions so per-partition setup (decoder init) happens once,
    * not per row. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // Real pipeline: initialize the decoder for this partition here.
      rows.map { r =>
        val feat = decodeStub(r.payload, r.meta)
        var h = 0xcbf29ce484222325L
        r.payload.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
        MediaFeatures(r.media_id, r.payload.length, h, feat)
      }
    }
  }

  /** Resize stub: area-fit downscale toward a target box, preserving
    * aspect ratio — the shape of an image-resize stage (payload in,
    * smaller payload + consistently updated dims out, narrow map, no
    * shuffle). A real implementation decodes, resizes with an image
    * library, and re-encodes; the stub keeps every k-th byte where
    * k = ceil(sqrt(area / box)) is the LINEAR downscale factor, and
    * reports dims divided by the same k, so metadata and payload
    * always describe the same transform (k = 1 → row unchanged).
    *
    * The sqrt-derived k is only a starting point: because each axis
    * floors at 1 pixel, extreme aspect ratios (e.g. 1000×1 into a
    * 16×16 box) would otherwise exceed the box area — so k grows
    * until the CLAMPED output area fits, making "output area ≤
    * maxW·maxH" a hard invariant for every input. */
  def resize(media: Dataset[MediaRow], maxW: Int = 64, maxH: Int = 64): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val w = math.max(1, r.meta.width)
      val h = math.max(1, r.meta.height)
      val box = maxW.toLong * maxH
      var k = math.max(1, math.ceil(
        math.sqrt((w.toDouble * h) / (maxW.toDouble * maxH))).toInt)
      while (math.max(1L, w.toLong / k) * math.max(1L, h.toLong / k) > box) k += 1
      if (k == 1) r
      else {
        val out = new Array[Byte]((r.payload.length + k - 1) / k)
        var i = 0
        var j = 0
        while (i < r.payload.length) { out(j) = r.payload(i); j += 1; i += k }
        r.copy(payload = out,
          meta = r.meta.copy(width = math.max(1, w / k), height = math.max(1, h / k)))
      }
    }
  }

  /** Frame sampling stub: emits every `stride`-th frame index implied
    * by the metadata — the explode shape of video frame extraction
    * (one output row per sampled frame, still no shuffle). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 10): DataFrame =
    media.toDF().select(
      col("media_id"), col("meta.kind").as("kind"),
      explode(expr(
        s"transform(sequence(0, CAST(octet_length(payload) / 100 AS INT)), i -> i * $stride)"))
        .as("frame_idx"))
}
