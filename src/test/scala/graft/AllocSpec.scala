package graft

import org.apache.spark.sql.functions._
import graft.queries.Alloc

/** Structural invariants of the allocation/classification pack — the
  * properties that must hold no matter the data, complementing the
  * value-exact oracle rows. */
class AllocSpec extends SparkSpec {

  test("proration: every order's allocations sum exactly to the rebate") {
    val sums = Alloc.proration(spark, sfDir, rebate = 1000L)
      .groupBy(col("l_orderkey")).agg(sum(col("alloc_cents")).as("s"))
      .select(col("s")).distinct().collect().map(_.getLong(0))
    assert(sums.toSeq == Seq(1000L))
  }

  test("proration: shares deviate from exact proportionality by < 1 cent/row") {
    // (orderkey, linenumber) duplicates exist, so compare at key grain
    // and allow one cent of rounding per underlying row.
    val keyed = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("bigint").as("w"))
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(sum(col("w")).as("w"), count(lit(1)).as("cnt"))
    val totals = keyed.groupBy(col("l_orderkey")).agg(sum(col("w")).as("tw"))
    val dev = Alloc.proration(spark, sfDir, rebate = 1000L)
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(sum(col("alloc_cents")).as("alloc"))
      .join(keyed, Seq("l_orderkey", "l_linenumber"))
      .join(totals, Seq("l_orderkey"))
      .select((abs(col("alloc").cast("double") -
        lit(1000.0) * col("w").cast("double") / col("tw").cast("double")) -
        col("cnt").cast("double")).as("over"))
      .agg(max(col("over"))).collect()(0).getDouble(0)
    assert(dev < 1e-9, s"deviation exceeds 1 cent per row by $dev")
  }

  test("abc: classes partition all parts and revenue; A-class share is ~70%") {
    val rows = Alloc.abcClass(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val nparts = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey")).distinct().count()
    assert(rows.map(_._2).sum == nparts)
    val total = rows.map(_._3).sum.toDouble
    val aShare = rows.find(_._1 == "A").map(_._3.toDouble / total).getOrElse(0.0)
    // A ends at the first part crossing 70%: share is in [0.70, 0.70+maxpart]
    assert(aShare >= 0.60 && aShare <= 0.85, s"A share $aShare")
  }

  test("concurrency: net changes telescope to zero and peaks stay positive") {
    val rows = Alloc.shippingLoad(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sum == 0L) // every +1 has its -1
    assert(rows.init.forall(_._1 > 0)) // open count only hits 0 at the end
  }

  test("hash keys: hub keys are unique and hash-diff is attribute-sensitive") {
    val df = Alloc.hashKeys(spark, sfDir)
    assert(df.select(col("hub_key")).distinct().count() == df.count())
    // hash_diff has fewer distinct values than rows only if attribute
    // collisions exist; at minimum it must not be constant
    assert(df.select(col("hash_diff")).distinct().count() > 1)
  }

  test("lift table: cumulative columns are monotone and capture ends at 1") {
    val rows = Alloc.liftTable(spark, sfDir).collect()
      .map(r => (r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(a._1 < b._1) // cum_n strictly grows (every bin nonempty)
      assert(a._2 <= b._2)
    }
    assert(math.abs(rows.last._3 - 1.0) < 1e-12)
  }

  test("mean family: harmonic <= geometric <= arithmetic") {
    Alloc.meanFamily(spark, sfDir).collect().foreach { r =>
      val (am, gm, hm) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(hm <= gm + 1e-9 && gm <= am + 1e-9, s"AM-GM-HM violated: $am $gm $hm")
    }
  }
}
