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

  test("frame sampling emits stride-spaced indices per media row") {
    val rows = Multimodal.sampleFrames(media.limit(3), stride = 10)
      .collect().groupBy(_.getLong(0))
    rows.values.foreach { frames =>
      val idx = frames.map(_.getInt(2)).sorted
      assert(idx.zipWithIndex.forall { case (v, i) => v == i * 10 })
    }
  }
}
