package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, JaroWinkler}

/** Invariants for the record-linkage/eval pack (oracle equivalence is
  * the driver gate; these pin the semantics the oracle can't see). */
class LinkageSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinkler.sim(a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  test("jaro-winkler kernel matches published reference values") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("crate", "trace") - 0.7333333333333334) < 1e-12)
    assert(jw("same", "same") == 1.0)
    // oracle convention: empty input → 0, even for two empties; and a
    // below-threshold jaro gets NO prefix boost (crate/trace above is
    // boost-eligible-prefix-0; dwayne/duane exercises the boost).
    assert(jw("", "") == 0.0)
    assert(jw("abc", "") == 0.0)
    assert(math.abs(jw("dwayne", "duane") - 0.84) < 1e-12)
    // no matches within the horizon → 0 (not negative / NaN)
    assert(jw("ab", "ba") == 0.0)
    assert(jw("x", "y") == 0.0)
  }

  test("jaro-winkler expression: codegen and interpreted eval agree") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val pairs = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("hello world", "helo wrld"), ("", ""), ("same", "same"))
      .toDF("a", "b")
    val viaExpr = pairs
      .select(GraftFunctions.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(_.getDouble(0))
    val direct = Seq("martha" -> "marhta", "dixon" -> "dicksonx",
      "hello world" -> "helo wrld", "" -> "", "same" -> "same")
      .map { case (a, b) => jw(a, b) }
    viaExpr.zip(direct).foreach { case (e, d) => assert(e == d) }
    // null propagation
    val withNull = Seq((Some("a"), None: Option[String])).toDF("a", "b")
      .select(GraftFunctions.jaroWinkler(col("a"), col("b")))
    assert(withNull.collect().head.isNullAt(0))
  }

  test("auc is 1.0 on perfectly separated scores and 0.5 on identical ones") {
    import spark.implicits._
    // perfect separation: positives all score above negatives
    def auc(rows: Seq[(Int, Long)]): Double = {
      val byBin = rows.groupBy(_._2).map { case (bin, rs) =>
        (bin, rs.size.toLong, rs.map(_._1.toLong).sum)
      }.toSeq.sortBy(_._1)
      var cum = 0L; var twoSp = 0L; var np = 0L; var n = 0L
      byBin.foreach { case (_, cnt, pos) =>
        cum += cnt; twoSp += pos * (2 * cum - cnt + 1); np += pos; n += cnt
      }
      (twoSp - np * (np + 1)).toDouble / (2 * np * (n - np)).toDouble
    }
    assert(auc(Seq((0, 1L), (0, 2L), (1, 3L), (1, 4L))) == 1.0)
    assert(auc(Seq((0, 7L), (1, 7L), (0, 7L), (1, 7L))) == 0.5)
    // and the engine query emits AUC in [0,1]
    val out = queries.Linkage.aucGrouped(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val v = r.getDouble(3)
      assert(v >= 0.0 && v <= 1.0, s"auc out of range: $v")
    }
  }

  test("gini is bounded and value-deterministic under tie reordering") {
    val out = queries.Linkage.giniBalance(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val g = r.getDouble(2)
      assert(g >= 0.0 && g < 1.0, s"gini out of range: $g")
    }
    // repartitioned input → identical result (row_number ties carry
    // equal values, so Σi·x is invariant)
    val again = queries.Linkage.giniBalance(spark, sfDir).repartition(7).collect()
    assert(out.map(_.getDouble(2)).sorted.sameElements(
      again.map(_.getDouble(2)).sorted))
  }

  test("sorted-neighborhood emits only intra-block, threshold-passing pairs") {
    val out = queries.Linkage.sortedNeighborhood(spark, sfDir).collect()
    out.foreach { r =>
      assert(r.getInt(3) <= 12)
      assert(r.getLong(1) != r.getLong(2), "self-pair")
    }
  }

  test("rrf is maximal for rank-1-in-both and respects the 1/(60+r) form") {
    val out = queries.Linkage.rrfFusion(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val want = 1.0 / (60.0 + r.getLong(1)) + 1.0 / (60.0 + r.getLong(2))
      assert(r.getDouble(3) == want)
    }
  }

  test("cross-correlation at identical lag-0 series is exactly 1") {
    import spark.implicits._
    // self-correlation sanity on a tiny exact series
    val xs = Seq(1L, 3L, 2L, 5L, 4L)
    val n = xs.size.toLong
    val sx = xs.sum; val sxx = xs.map(x => x * x).sum
    val sxy = sxx
    val num = (n * sxy - sx * sx).toDouble
    val den = math.sqrt((n * sxx - sx * sx).toDouble) *
      math.sqrt((n * sxx - sx * sx).toDouble)
    // sqrt(a)·sqrt(a) rounds once, so allow 1 ulp around exact 1
    assert(math.abs(num / den - 1.0) <= 1e-15)
    val out = queries.Linkage.crossCorr(spark, sfDir).collect()
    assert(out.length == 7)
    out.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-12))
  }

  test("ER pipeline entities have >= 2 members and the min-id invariant") {
    val ents = queries.Linkage.erPipeline(spark, sfDir).collect()
    spark.catalog.clearCache()
    // every entity comes from at least one matched pair
    ents.foreach(r => assert(r.getAs[Long]("n_members") >= 2L,
      s"entity ${r.getAs[Long]("entity_id")} has ${r.getAs[Long]("n_members")}"))
    // entity ids are distinct min-members, so strictly increasing sorted
    val ids = ents.map(_.getAs[Long]("entity_id"))
    assert(ids.distinct.length == ids.length)
  }
}
