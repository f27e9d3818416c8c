package graft

import org.apache.spark.sql.functions._
import graft.queries.{Extras, Relational}

/** Sanity assertions for the sketch/order-dependent operators that
  * have no DuckDB oracle: bounds, internal consistency, and agreement
  * with their exact/deterministic twins within tolerance. */
class ExtrasSpec extends SparkSpec {

  test("documents corpus is pure ASCII (soundness condition of the FNV oracle)") {
    // The q_fnv_fingerprint DuckDB oracle folds ascii(char) per
    // character, which equals the UTF-8 byte only for code points
    // < 128 — this assertion is what makes that oracle exact. If the
    // fixture generator ever emits non-ASCII text, this fails HERE
    // with a clear message instead of as an opaque hash mismatch.
    import org.apache.spark.sql.functions._
    val nonAscii = Tables.documents(spark, sfDir)
      .filter(not(col("text").rlike("^[\\x00-\\x7F]*$"))).count()
    assert(nonAscii == 0, s"$nonAscii non-ASCII documents break the FNV oracle")
  }

  test("approx percentiles are bounded by min/max and ordered") {
    Extras.percentileApprox(spark, sfDir).collect().foreach { r =>
      val (p50, p90) = (r.getDouble(1), r.getDouble(2))
      val (lo, hi) = (r.getDouble(3), r.getDouble(4))
      assert(lo <= p50 && p50 <= p90 && p90 <= hi,
        s"expected $lo <= $p50 <= $p90 <= $hi")
    }
  }

  test("built-in moments agree with the exact-decimal formulation within rounding") {
    // statsBuiltin emits round(4) values (its oracle contract), so the
    // agreement tolerance is the 5e-5 absolute rounding quantum plus
    // the float-order 1e-6 relative term.
    val builtin = Extras.statsBuiltin(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = Relational.statsMoments(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toList
    assert(exact.nonEmpty)
    exact.foreach { case (flag, varQty, sdQty, corrQP) =>
      val (sdB, varB, corrB) = builtin(flag)
      def close(a: Double, b: Double, tol: Double = 5e-5) =
        math.abs(a - b) <= tol + 1e-6 * math.abs(b)
      assert(close(varB, varQty), s"$flag var $varB vs $varQty")
      assert(close(sdB, sdQty), s"$flag sd $sdB vs $sdQty")
      assert(close(corrB, corrQP), s"$flag corr $corrB vs $corrQP")
      assert(corrB >= -1.0 && corrB <= 1.0)
      // sd is rounded before squaring: error ≤ 2·|sd|·5e-5 + quantum
      assert(close(sdB * sdB, varB, 2 * math.abs(sdB) * 5e-5 + 5e-5))
    }
  }

  test("freq-items sketch guarantees items above the support threshold") {
    val n = Tables.orders(spark, sfDir).count().toDouble
    val trulyFrequent = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderstatus")).count()
      .filter(col("count") > n * 0.3)
      .collect().map(_.getString(0)).toSet
    val sketch = Extras.freqItems(spark, sfDir).collect().head
      .getString(0).split(",").toSet
    // KPS guarantee: every item above support appears in the sketch
    assert(trulyFrequent.subsetOf(sketch), s"$trulyFrequent not in $sketch")
  }

  test("compression ratio separates repetitive text and is partitioning-invariant") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val docs = Seq(
      (1L, "spam " * 200),
      (2L, (1 to 200).map(i => s"w${i * 7919 % 9973}").mkString(" ")))
      .toDF("doc_id", "text")
    val ratios = docs
      .select(col("doc_id"),
        (graft.functions.GraftFunctions.deflateSize(col("text")).cast("double") /
          length(col("text")).cast("double")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ratios(1L) < ratios(2L) / 3,
      s"repetitive ${ratios(1L)} should compress far below diverse ${ratios(2L)}")
    // fixture query: deterministic across partitionings
    val a = Extras.compressRatio(spark, sfDir).collect().map(_.toSeq).toSeq
    val wide = spark.newSession()
    wide.conf.set("spark.sql.shuffle.partitions", "3")
    val b = Extras.compressRatio(wide, sfDir).collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
