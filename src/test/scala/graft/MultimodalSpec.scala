package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.fromDocuments(Tables.documents(spark, sfDir))

  test("media schema: binary payload + typed metadata struct") {
    val sch = media.schema
    assert(sch("payload").dataType.typeName == "binary")
    assert(sch("meta").dataType.typeName == "struct")
  }

  test("feature extraction is deterministic and partition-count independent") {
    val a = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(media.repartition(7)).collect().sortBy(_.media_id)
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) =>
      assert(x.checksum == y.checksum && x.feature.toSeq == y.feature.toSeq)
    }
  }

  test("checksum equals the fnv64 of the text (payload round-trips)") {
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val viaExpr = Tables.documents(spark, sfDir)
      .select(col("doc_id"), GraftFunctions.fnv64(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Multimodal.extractFeatures(media).collect().foreach { f =>
      assert(f.checksum == viaExpr(f.media_id))
    }
  }

  test("resize fits the target area with metadata consistent with the payload") {
    val resized = Multimodal.resize(media, maxW = 16, maxH = 16).collect()
    val orig = media.collect().map(r => r.media_id -> r).toMap
    assert(resized.nonEmpty)
    resized.foreach { r =>
      val o = orig(r.media_id)
      // area-fit: downscaled area is within the box
      assert(r.meta.width.toLong * r.meta.height <= 16L * 16L ||
        (r.meta.width == o.meta.width && r.meta.height == o.meta.height),
        s"media ${r.media_id}: ${r.meta.width}x${r.meta.height}")
      assert(r.payload.length <= o.payload.length)
      // a row that already fits is passed through untouched
      if (math.max(1, o.meta.width).toLong * math.max(1, o.meta.height) <= 256L)
        assert(r.payload.toSeq == o.payload.toSeq && r.meta == o.meta)
      // deterministic: first kept byte is the first original byte
      if (o.payload.nonEmpty) assert(r.payload.head == o.payload.head)
    }
  }

  test("resize area invariant holds for degenerate aspect ratios") {
    import spark.implicits._
    import graft.operators.{MediaMeta, MediaRow}
    // 1000x1 into a 16x16 box: the sqrt-derived k alone would give
    // 500x1 = 500 > 256 because the short axis floors at 1 — the
    // per-axis clamp loop must keep growing k until the area fits.
    val rows = Seq(
      MediaRow(1L, Array.fill[Byte](1000)(7), MediaMeta("image", 1000, 1, 0)),
      MediaRow(2L, Array.fill[Byte](1000)(7), MediaMeta("image", 1, 1000, 0)),
      MediaRow(3L, Array.fill[Byte](64)(7), MediaMeta("image", 0, 0, 0)),
      MediaRow(4L, Array.emptyByteArray, MediaMeta("image", 5000, 2, 0)))
    val out = Multimodal.resize(rows.toDS(), maxW = 16, maxH = 16)
      .collect().map(r => r.media_id -> r).toMap
    out.values.foreach { r =>
      assert(r.meta.width.toLong * r.meta.height <= 256L,
        s"media ${r.media_id}: ${r.meta.width}x${r.meta.height}")
    }
    // 0x0 dims clamp to 1x1 (already inside the box) → passthrough
    assert(out(3L).payload.length == 64 && out(3L).meta.width == 0)
  }

  // ----- decoded-content path: real PNG bytes, JDK codec -----

  /** Deterministic real PNG: pixel (x,y) = position-derived RGB. */
  private def mkPng(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (((x * 31 + y * 17 + seed) % 256) << 16) |
        (((x * 7 + seed) % 256) << 8) | ((y * 13 + seed) % 256))
    graft.operators.Multimodal.encodePng(img)
  }

  test("decoded resize derives dimensions from CONTENT, not metadata") {
    import spark.implicits._
    import graft.operators.{MediaMeta, MediaRow, Multimodal}
    // metadata LIES about the dimensions on every row — only a real
    // decode can produce the right output dims
    val rows = Seq(
      MediaRow(1L, mkPng(100, 40, 1), MediaMeta("image", 9999, 1, 0)),
      MediaRow(2L, mkPng(12, 8, 2), MediaMeta("image", 1, 9999, 0)),
      MediaRow(3L, "not an image".getBytes, MediaMeta("image", 777, 777, 0)))
    val out = Multimodal.resizeDecoded(rows.toDS(), maxW = 16, maxH = 16)
      .collect().map(r => r.media_id -> r).toMap
    // 100x40 fit into 16x16 preserving aspect: scale 0.16 → 16x6
    assert(out(1L).meta.width == 16 && out(1L).meta.height == 6,
      s"got ${out(1L).meta}")
    // already fits: payload untouched, meta corrected to decoded 12x8
    assert(out(2L).meta.width == 12 && out(2L).meta.height == 8)
    assert(out(2L).payload.toSeq == rows(1).payload.toSeq)
    // non-decodable row passes through unchanged
    assert(out(3L).payload.toSeq == rows(2).payload.toSeq && out(3L).meta.width == 777)
    // the resized payload is itself a real decodable PNG of the
    // claimed size whose pixels equal the nearest-neighbor resample
    val img = Multimodal.decodeImage(out(1L).payload).get
    assert(img.getWidth == 16 && img.getHeight == 6)
    val src = Multimodal.decodeImage(rows.head.payload).get
    for (y <- 0 until 6; x <- 0 until 16)
      assert((img.getRGB(x, y) & 0xffffff) ==
        (src.getRGB(x * 100 / 16, y * 40 / 6) & 0xffffff),
        s"pixel ($x,$y) is not the nearest-neighbor source pixel")
  }

  test("JPEG payloads decode, resize, and re-encode like PNG ones") {
    import spark.implicits._
    import graft.operators.{MediaMeta, MediaRow, Multimodal}
    // same lying-metadata contract as the PNG test, JPEG codec: the
    // decoded DIMENSIONS drive the output even though JPEG pixels are
    // lossy (dims survive the codec exactly)
    val rows = Seq(
      MediaRow(1L, Multimodal.synthImage(1L, 100, 40, "jpg"),
        MediaMeta("image", 9999, 1, 0)),
      MediaRow(2L, Multimodal.synthImage(2L, 12, 8, "jpg"),
        MediaMeta("image", 1, 9999, 0)))
    val out = Multimodal.resizeDecoded(rows.toDS(), maxW = 16, maxH = 16)
      .collect().map(r => r.media_id -> r).toMap
    assert(out(1L).meta.width == 16 && out(1L).meta.height == 6,
      s"got ${out(1L).meta}")
    assert(out(2L).meta.width == 12 && out(2L).meta.height == 8)
    assert(out(2L).payload.toSeq == rows(1).payload.toSeq) // fits: untouched
    val img = Multimodal.decodeImage(out(1L).payload).get
    assert(img.getWidth == 16 && img.getHeight == 6)
  }

  test("synthImage is a pure function of its arguments (both codecs)") {
    import graft.operators.Multimodal
    for (fmt <- Seq("png", "jpg")) {
      val a = Multimodal.synthImage(42L, 31, 17, fmt)
      val b = Multimodal.synthImage(42L, 31, 17, fmt)
      assert(a.toSeq == b.toSeq, s"$fmt bytes differ across calls")
      val img = Multimodal.decodeImage(a).get
      assert(img.getWidth == 31 && img.getHeight == 17)
    }
    // 1x1 degenerate dims survive both codecs
    for (fmt <- Seq("png", "jpg")) {
      val img = Multimodal.decodeImage(Multimodal.synthImage(7L, 1, 1, fmt)).get
      assert(img.getWidth == 1 && img.getHeight == 1)
    }
  }

  test("decoded resize is byte-identical across partitionings") {
    import spark.implicits._
    import graft.operators.{MediaMeta, MediaRow, Multimodal}
    val rows = (0 until 20).map(i =>
      MediaRow(i.toLong, mkPng(30 + i * 7, 20 + i * 3, i), MediaMeta("image", 0, 0, 0)))
    def run(ds: org.apache.spark.sql.Dataset[MediaRow]) =
      Multimodal.resizeDecoded(ds, 16, 16).collect()
        .sortBy(_.media_id).map(r => (r.media_id, r.meta, r.payload.toSeq)).toSeq
    assert(run(rows.toDS()) == run(rows.toDS().repartition(7)))
  }

  test("decoded frame sampling slices real frame bytes by header") {
    import spark.implicits._
    import graft.operators.{MediaMeta, MediaRow, Multimodal}
    val w = 4; val h = 3
    // frame f's pixel p = (f*50 + p) mod 256 — every frame distinct
    def frameBytes(f: Int): Array[Byte] =
      Array.tabulate[Byte](w * h * 3)(p => ((f * 50 + p) % 256).toByte)
    val vid = Multimodal.RawVideo.pack(w, h, (0 until 25).map(frameBytes))
    val rows = Seq(
      MediaRow(1L, vid, MediaMeta("video", 0, 0, 0)),
      MediaRow(2L, "junk".getBytes, MediaMeta("video", 0, 0, 0)))
    val out = Multimodal.sampleFramesDecoded(rows.toDS(), stride = 10).collect()
    // junk row contributes nothing; 25 frames at stride 10 → 0, 10, 20
    assert(out.map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq ==
      Seq((1L, 0), (1L, 10), (1L, 20)))
    out.foreach { r =>
      assert(r.getInt(2) == w && r.getInt(3) == h)
      val img = Multimodal.decodeImage(r.getAs[Array[Byte]]("png")).get
      val f = r.getInt(1)
      // decoded PNG pixel content equals the packed RGB slice — the
      // sample is the FRAME'S bytes, not an index heuristic
      for (y <- 0 until h; x <- 0 until w) {
        val p = (y * w + x) * 3
        val expected = (((f * 50 + p) % 256) << 16) |
          (((f * 50 + p + 1) % 256) << 8) | ((f * 50 + p + 2) % 256)
        assert((img.getRGB(x, y) & 0xffffff) == expected)
      }
    }
  }

  test("frame sampling emits stride-spaced indices per media row") {
    val rows = Multimodal.sampleFrames(media.limit(3), stride = 10)
      .collect().groupBy(_.getLong(0))
    rows.values.foreach { frames =>
      val idx = frames.map(_.getInt(2)).sorted
      assert(idx.zipWithIndex.forall { case (v, i) => v == i * 10 })
    }
  }

  test("a corrupt GFRV header degrades row-wise, never crashes the task") {
    // negative width, and dimensions whose frame size overflows Int —
    // both must parse to 'no frames', same contract as decodeImage
    def corrupt(w: Int, h: Int, n: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(64)
      bb.put("GFRV".getBytes("US-ASCII")).putInt(w).putInt(h).putInt(n)
      bb.array()
    }
    for (p <- Seq(corrupt(-1, 8, 3), corrupt(40000, 40000, 1),
        corrupt(8, 8, -2), corrupt(0, 0, 0))) {
      assert(Multimodal.RawVideo.frameCount(p) == 0)
      assert(Multimodal.RawVideo.frame(p, 0).isEmpty)
    }
    // and through the Spark path: the corrupt row just contributes
    // zero frames while valid rows still decode
    import spark.implicits._
    val good = Multimodal.RawVideo.pack(2, 2,
      Seq(Array.fill(12)(7.toByte)))
    val ds = Seq(
      graft.operators.MediaRow(1L, corrupt(-1, 8, 3),
        graft.operators.MediaMeta("video", 0, 0, 0)),
      graft.operators.MediaRow(2L, good,
        graft.operators.MediaMeta("video", 2, 2, 0))).toDS()
    val out = Multimodal.sampleFramesDecoded(ds, stride = 1).collect()
    assert(out.map(_.getLong(0)).toSet == Set(2L))
  }
}
