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

  test("frame sampling emits stride-spaced indices per media row") {
    val rows = Multimodal.sampleFrames(media.limit(3), stride = 10)
      .collect().groupBy(_.getLong(0))
    rows.values.foreach { frames =>
      val idx = frames.map(_.getInt(2)).sorted
      assert(idx.zipWithIndex.forall { case (v, i) => v == i * 10 })
    }
  }
}
