package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-5 audit/attribution/transport additions
  * (oracle equivalence is the driver gate; these pin semantics). */
class AuditSpec extends SparkSpec {

  test("ks statistic is in [0,1] and zero against itself") {
    val out = queries.Warehouse.ksTest(spark, sfDir).collect()
    assert(out.length == 1)
    val d = out.head.getDouble(2)
    assert(d >= 0.0 && d <= 1.0, s"ks_d out of range: $d")
    assert(out.head.getLong(0) > 0 && out.head.getLong(1) > 0)
    // identical samples → D = 0: recompute the same CDF against itself
    val binned = Tables.lineitem(spark, sfDir)
      .select(floor(col("l_extendedprice") / 100).cast("long").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val self = binned.withColumn("c", sum(col("n")).over(w))
      .agg(max(abs(col("c").cast("double") - col("c").cast("double"))))
      .collect().head.getDouble(0)
    assert(self == 0.0)
  }

  test("ab test marginals are consistent and z is finite") {
    val r = queries.Warehouse.abTest(spark, sfDir).collect().head
    val (n1, c1, n2, c2) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(c1 <= n1 && c2 <= n2)
    assert(n1 > 0 && n2 > 0)
    assert(r.getDouble(4) == c1.toDouble / n1.toDouble)
    assert(!r.getDouble(6).isNaN && !r.getDouble(6).isInfinite)
  }

  test("attribution credits only non-purchase channels or 'direct'") {
    val out = queries.Trend.attribution(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val ch = r.getString(3)
      assert(ch != "purchase", "a purchase must never attribute to itself")
    }
    // a user's FIRST event being a purchase must credit 'direct'
    val first = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))))
      .filter(col("rn") === 1 && col("event_type") === "purchase")
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    if (first.nonEmpty) {
      val byId = out.map(r => r.getLong(0) -> r.getString(3)).toMap
      first.foreach(id => assert(byId(id) == "direct"))
    }
  }

  test("orc round-trip preserves every row and type bit-exactly") {
    // Same TOTAL order as orcRoundtrip: (orderkey, linenumber) alone is
    // not unique in the fixture, so the row-by-row zip needs the full
    // projected-column sort on both sides.
    val direct = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"), col("l_shipdate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"), col("l_shipdate"))
    val roundtripped = queries.EtlQueries.orcRoundtrip(spark, sfDir)
    assert(roundtripped.schema == direct.schema)
    val a = roundtripped.collect()
    val b = direct.collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }
}
