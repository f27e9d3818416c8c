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
    // the SAME prepared inputs the query uses — only the downstream
    // computation is independent
    val (ev, o) = queries.Joins.asofMergeInputs(spark, sfDir)
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

  test("bucketed inputs satisfy the distribution requirement — zero-exchange as-of") {
    // the 100 TB layout claim made in the operator's scaladoc, proven:
    // both sides pre-bucketed on the key (and sorted by key+time)
    // satisfy ClusteredDistribution, so EnsureRequirements inserts NO
    // exchange — the recurring as-of against a reference table costs
    // zero shuffles per query after a one-time layout write
    // static session: AdaptiveSparkPlanExec hides its tree from collect
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    // report the bucket files' sortBy order at the scan (off by
    // default since 3.0 because a multi-file bucket interleaves; the
    // writes below repartition to exactly one file per bucket, the
    // precondition that makes the order real)
    s.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    val (ev, o) = queries.Joins.asofMergeInputs(s, sfDir)
    try {
      // one file per bucket (repartition on the bucket key): the scan
      // reports the bucket sort order only then, which is what lets
      // the plan elide the sorts as well as the exchanges
      ev.repartition(4, col("user_id"))
        .write.bucketBy(4, "user_id").sortBy("user_id", "ts")
        .mode("overwrite").saveAsTable("asof_ev_b")
      o.repartition(4, col("o_custkey"))
        .write.bucketBy(4, "o_custkey")
        .sortBy("o_custkey", "o_orderdate", "o_orderkey")
        .mode("overwrite").saveAsTable("asof_o_b")
      val joined = graft.plans.Asof.backward(
        s.table("asof_ev_b"), s.table("asof_o_b"),
        on = Seq("user_id" -> "o_custkey"), time = "ts" -> "o_orderdate",
        tiebreak = Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan
      joined.collect()
      assert(plan.collectWithSubqueries { case e: AsofJoinExec => e }.nonEmpty)
      assert(plan.collect {
        case e: ShuffleExchangeExec => e
      }.isEmpty, s"bucketed as-of still shuffles:\n${plan.toString.take(1500)}")
      // matching the bucket-and-sort layout also elides the sorts
      assert(!plan.toString.contains("Sort "),
        s"bucketed as-of still sorts:\n${plan.toString.take(1500)}")
      // and it is still the same relation the shuffled plan produces
      val viaShuffle = graft.plans.Asof.backward(ev, o,
          on = Seq("user_id" -> "o_custkey"), time = "ts" -> "o_orderdate",
          tiebreak = Seq("o_orderkey"))
        .orderBy(col("event_id")).collect().toSeq
      assert(joined.sort(col("event_id")).collect().toSeq == viaShuffle)
    } finally {
      s.sql("DROP TABLE IF EXISTS asof_ev_b")
      s.sql("DROP TABLE IF EXISTS asof_o_b")
    }
  }

  test("guards: float keys, shared lineage, case/ambiguity resolution") {
    val left = Seq((1L, 1L, 10L)).toDF("id", "lk", "lt")
    val right = Seq((1L, 5L, "x")).toDF("rk", "rt", "v")
    // float/double keys or times diverge from SQL equality on -0.0 —
    // rejected at construction
    val fl = Seq((1L, 0.0, 10L)).toDF("id", "lk", "lt")
    val fr = Seq((-0.0, 5L, "x")).toDF("rk", "rt", "v")
    intercept[IllegalArgumentException] {
      Asof.backward(fl, fr, Seq("lk" -> "rk"), "lt" -> "rt")
    }
    // shared lineage = duplicated exprIds = silent misbinding — reject
    intercept[IllegalArgumentException] {
      Asof.backward(left, left.filter(col("lt") > 0L),
        Seq("lk" -> "lk"), "lt" -> "lt")
    }
    // name resolution honors spark.sql.caseSensitive=false…
    assert(Asof.backward(left, right, Seq("LK" -> "RK"), "LT" -> "RT")
      .count() == 1)
    // …and refuses ambiguity instead of binding the first match
    val dup = right.select(col("rk"), col("rt"), col("v"),
      lit("other").as("v"))
    intercept[IllegalArgumentException] {
      Asof.backward(left, dup, Seq("lk" -> "rk"), "lt" -> "rt",
        tiebreak = Seq("v"))
    }
    // canonicalization survives the guards (it rewrites BOTH sides'
    // exprIds positionally — a node-body lineage require would trip)
    val plan = Asof.backward(left, right, Seq("lk" -> "rk"), "lt" -> "rt")
      .queryExecution.analyzed
    assert(plan.canonicalized.semanticHash() == plan.canonicalized.semanticHash())
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
