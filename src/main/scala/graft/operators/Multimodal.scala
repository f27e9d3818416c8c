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

  // ---------------------------------------------------------------
  // Decoded-content path (real codec, JDK-only)
  // ---------------------------------------------------------------

  /** PNG decode via the JDK's ImageIO (javax.imageio ships in the
    * JDK — no external library). Returns None for payloads that are
    * not a decodable image, so mixed/dirty corpora degrade row-wise,
    * not job-wise — but only for NON-fatal failures: an
    * OutOfMemoryError (decompression-bomb allocation) must kill the
    * task loudly, not be swallowed as "not an image" on an exhausted
    * heap. */
  def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (payload == null || payload.length == 0) None
    else try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }

  def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic synthetic image encoded with a REAL JDK codec
    * (`format` = "png" or "jpg") — the fixture generator for the
    * decode-audit query and the JPEG spec coverage: pixels derive from
    * (seed, x, y) integer arithmetic only, so the image (and its PNG
    * bytes) is a pure function of its arguments. JPEG re-decodes to
    * different PIXELS (lossy) but identical DIMENSIONS — which is what
    * the decode audit pins. */
  def synthImage(seed: Long, w: Int, h: Int, format: String): Array[Byte] = {
    require(w >= 1 && h >= 1, s"degenerate image ${w}x$h")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = seed * 31 + x * 7L + y * 13L
        img.setRGB(x, y,
          (((v % 251).toInt & 0xff) << 16) |
            ((((v / 7) % 241).toInt & 0xff) << 8) |
            (((v / 11) % 239).toInt & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** Deterministic nearest-neighbor resample — a manual pixel loop
    * (integer source-index arithmetic, sx = x·w/w2) rather than
    * Graphics2D scaling, so the output bytes are identical on every
    * JVM/platform and the partition-invariance spec can require
    * byte-equality. */
  private[operators] def resampleNearest(img: java.awt.image.BufferedImage,
                                         w2: Int, h2: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(w2, h2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val w = img.getWidth
    val h = img.getHeight
    var y = 0
    while (y < h2) {
      val sy = (y.toLong * h / h2).toInt
      var x = 0
      while (x < w2) {
        out.setRGB(x, y, img.getRGB((x.toLong * w / w2).toInt, sy))
        x += 1
      }
      y += 1
    }
    out
  }

  /** DECODED image resize — the real-codec upgrade of [[resize]]:
    * decode the payload (ImageIO), fit the DECODED dimensions into the
    * target box preserving aspect ratio, resample nearest-neighbor,
    * re-encode PNG. Output metadata comes from the decoded content,
    * never from the (possibly lying) input metadata — MultimodalSpec
    * feeds deliberately wrong meta dims and asserts the output carries
    * the content-derived ones. Rows whose payload does not decode pass
    * through unchanged (the honest mixed-corpus behavior). Still a
    * narrow map: one codec instance per partition, no shuffle. */
  def resizeDecoded(media: Dataset[MediaRow], maxW: Int = 64, maxH: Int = 64): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        decodeImage(r.payload) match {
          case None => r
          case Some(img) =>
            val w = img.getWidth
            val h = img.getHeight
            if (w <= maxW && h <= maxH)
              // already fits: payload untouched, meta corrected to content
              r.copy(meta = r.meta.copy(width = w, height = h))
            else {
              val scale = math.min(maxW.toDouble / w, maxH.toDouble / h)
              val w2 = math.max(1, math.floor(w * scale).toInt)
              val h2 = math.max(1, math.floor(h * scale).toInt)
              r.copy(payload = encodePng(resampleNearest(img, w2, h2)),
                meta = r.meta.copy(width = w2, height = h2))
            }
        }
      }
    }
  }

  /** Raw-video frame container for [[sampleFramesDecoded]]: "GFRV" +
    * big-endian w, h, nFrames, then nFrames packed RGB frames (3
    * bytes/pixel). A stand-in CONTAINER, not a stand-in decode: the
    * sampler genuinely parses the header, slices real frame bytes and
    * re-encodes each sampled frame as PNG — only the codec (H.264 et
    * al.) is out of scope offline. */
  object RawVideo {
    val Magic: Array[Byte] = "GFRV".getBytes("US-ASCII")

    def pack(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      require(frames.forall(_.length == w * h * 3), "frames must be w*h*3 RGB")
      val bb = java.nio.ByteBuffer.allocate(16 + frames.map(_.length).sum)
      bb.put(Magic).putInt(w).putInt(h).putInt(frames.size)
      frames.foreach(bb.put)
      bb.array()
    }

    /** (w, h, frame bytes at `idx`) — None if not a (valid) GFRV
      * payload. A CORRUPT header (non-positive or absurd dimensions,
      * a frame size that overflows Int) also returns None: dirty
      * corpus rows must degrade row-wise, not crash the executor task
      * (the same contract as decodeImage). */
    def frame(payload: Array[Byte], idx: Int): Option[(Int, Int, Array[Byte])] = {
      if (payload == null || payload.length < 16 ||
        !payload.take(4).sameElements(Magic)) return None
      val bb = java.nio.ByteBuffer.wrap(payload, 4, 12)
      val w = bb.getInt; val h = bb.getInt; val n = bb.getInt
      val szL = w.toLong * h.toLong * 3L
      if (w <= 0 || h <= 0 || n <= 0 || szL > Int.MaxValue) return None
      val sz = szL.toInt
      if (idx < 0 || idx >= n || payload.length < 16 + (idx + 1).toLong * sz) None
      else Some((w, h, java.util.Arrays.copyOfRange(
        payload, 16 + idx * sz, 16 + (idx + 1) * sz)))
    }

    def frameCount(payload: Array[Byte]): Int =
      if (payload == null || payload.length < 16 ||
        !payload.take(4).sameElements(Magic)) 0
      else {
        // dimensions must be sane too — a corrupt header yields 0
        // frames rather than driving downstream allocations — and the
        // CLAIMED count is clamped to what the payload actually
        // carries: a lying n (up to Int.MaxValue) would otherwise make
        // the sampler spin through ~n/stride useless probe iterations
        // per corrupt row
        val bb = java.nio.ByteBuffer.wrap(payload, 4, 12)
        val w = bb.getInt; val h = bb.getInt; val n = bb.getInt
        if (w <= 0 || h <= 0 || n <= 0 ||
          w.toLong * h.toLong * 3L > Int.MaxValue) 0
        else {
          val sz = w * h * 3
          val carried = ((payload.length - 16L) / sz).toInt
          math.min(n, carried)
        }
      }
  }

  /** DECODED frame sampling — the real-codec upgrade of
    * [[sampleFrames]]: parse the container header, take every
    * `stride`-th frame's actual pixel bytes, and emit each as a
    * PNG-encoded image row (media_id, frame_idx, width, height, png).
    * Frame COUNT and CONTENT both come from the payload bytes, not
    * from metadata or length heuristics. flatMap shape: one output row
    * per sampled frame, narrow, no shuffle. */
  def sampleFramesDecoded(media: Dataset[MediaRow], stride: Int = 10): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val n = RawVideo.frameCount(r.payload)
      (0 until n by stride).iterator.flatMap { idx =>
        RawVideo.frame(r.payload, idx).map { case (w, h, rgb) =>
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var p = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y, ((rgb(p) & 0xff) << 16) |
                ((rgb(p + 1) & 0xff) << 8) | (rgb(p + 2) & 0xff))
              p += 3; x += 1
            }
            y += 1
          }
          (r.media_id, idx, w, h, encodePng(img))
        }
      }
    }.toDF("media_id", "frame_idx", "width", "height", "png")
  }
}
