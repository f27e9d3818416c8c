package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.plans.{Asof, AsofJoinExec}

/** The custom merge as-of operator (logical node → strategy →
  * physical plan): semantics against an independent composed
  * reference, the tie/null/empty contract on hand-built relations,
  * and the operator's whole reason to exist — the runtime proof that
  * only INPUT rows cross the wire, never (left × at-or-before right)
  * pairs. */
class AsofSpec extends SparkSpec {
  import spark.implicits._

  test("merge as-of ≡ composed join+argmax reference (left-outer, payload, tiebreak)") {
    val out = queries.Joins.asofMergeJoin(spark, sfDir).collect().toSeq
    val ev = Tables.events(spark, sfDir).filter(col("event_id") < 3000)
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp").as("ts"))
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("timestamp").as("o_orderdate"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
          .as("price_cents"))
    val matched = ev.join(o,
        col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"))
      .groupBy(col("event_id").as("eid"))
      .agg(max(struct(col("o_orderdate"), col("o_orderkey"),
        col("price_cents"))).as("m"))
    val expect = ev.join(matched, col("event_id") === col("eid"), "left")
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("m.o_orderdate")).as("last_order_epoch"),
        col("m.o_orderkey").as("last_orderkey"),
        col("m.price_cents").as("last_price_cents"))
      .orderBy(col("event_id"))
      .collect().toSeq
    assert(out == expect)
    assert(out.nonEmpty && out.exists(!_.isNullAt(2)))
    // (every fixture event has a prior order, so the OUTER path is
    // exercised by the hand-built relations below, not here)
  }

  test("physical plan contains AsofJoinExec — the strategy actually fires") {
    // static session: AdaptiveSparkPlanExec hides its inner tree from
    // a pre-execution collect
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = queries.Joins.asofMergeJoin(s, sfDir)
      .queryExecution.executedPlan
    assert(plan.collectWithSubqueries { case e: AsofJoinExec => e }.nonEmpty,
      s"AsofJoinExec missing from:\n$plan")
  }

  test("only input rows cross the wire — pairs never exist") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val df = queries.Joins.asofMergeJoin(s, sfDir)
    df.collect()
    val shuffled = df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e.metrics("shuffleRecordsWritten").value
    }.sum
    val nEv = Tables.events(s, sfDir).filter(col("event_id") < 3000).count()
    val nOrd = Tables.orders(s, sfDir).count()
    // two input exchanges + the result ORDER BY exchange (one row per
    // left row) — if pairs ever shuffled this would exceed the bound
    assert(shuffled == nEv + nOrd + nEv,
      s"$shuffled records shuffled; expected ${nEv + nOrd + nEv} " +
        s"(= $nEv events + $nOrd orders + $nEv results)")
  }

  test("time ties break on the declared tiebreak, deterministically") {
    val left = Seq((1L, 1L, 10L), (2L, 1L, 3L), (3L, 2L, 7L), (4L, 3L, 5L))
      .toDF("id", "lk", "lt")
    val right = Seq((1L, 10L, "a"), (1L, 10L, "b"), (1L, 11L, "c"),
      (2L, 1L, "d")).toDF("rk", "rt", "v")
    val out = Asof.backward(left, right, Seq("lk" -> "rk"), "lt" -> "rt",
        tiebreak = Seq("v"))
      .select(col("id"), col("rt"), col("v")).orderBy(col("id"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) "" else r.getString(2)))
    assert(out.toSeq == Seq(
      (1L, 10L, "b"), // tie at rt=10 → max tiebreak wins, never "a"
      (2L, -1L, ""),  // nothing at-or-before t=3
      (3L, 1L, "d"),
      (4L, -1L, ""))) // key 3 has no right rows at all
  }

  test("null keys and null times never match, null-keyed left rows still emit") {
    val left = Seq((1L, Option(1L), Option(10L)), (2L, Option.empty[Long], Option(10L)),
      (3L, Option(1L), Option.empty[Long])).toDF("id", "lk", "lt")
    val right = Seq((Option(1L), Option(5L), "x"), (Option(1L), Option.empty[Long], "y"),
      (Option.empty[Long], Option(1L), "z")).toDF("rk", "rt", "v")
    val out = Asof.backward(left, right, Seq("lk" -> "rk"), "lt" -> "rt",
        tiebreak = Seq("v"))
      .select(col("id"), col("v")).orderBy(col("id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) "" else r.getString(1)))
    assert(out.toSeq == Seq((1L, "x"), (2L, ""), (3L, "")))
  }

  test("empty sides degrade to the outer contract") {
    val left = Seq((1L, 1L, 10L)).toDF("id", "lk", "lt")
    val right = Seq((1L, 5L, "x")).toDF("rk", "rt", "v")
    val noRight = Asof.backward(left, right.limit(0),
      Seq("lk" -> "rk"), "lt" -> "rt").collect()
    assert(noRight.length == 1 && noRight.head.isNullAt(5))
    val noLeft = Asof.backward(left.limit(0), right,
      Seq("lk" -> "rk"), "lt" -> "rt").collect()
    assert(noLeft.isEmpty)
  }
}
