package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.concurrent.TrieMap

/** Adversarial skew: ShuffleWidthSpec proves the engine is INVARIANT
  * to layout changes; this spec proves the skew levers actually LEVER.
  * The fixture is the worst case the salted paths advertise surviving:
  * a Zipf-ish key space where ONE mega-key holds 50% of all rows
  * (q_join_salted / q_agg_salted / domainCap's design point, cited in
  * their scaladocs as "survives a single mega-key").
  *
  * Two instruments, both deterministic:
  *  - layout probe: rows per reducer partition after repartitioning on
  *    the key columns — exactly the per-reducer shuffle-row counts a
  *    real cluster would see (`repartition(W, keys)` IS the join/agg
  *    routing layout for those keys);
  *  - task probe: per-task shuffle-read record counts from a
  *    SparkListener while the real join runs (AQE and auto-broadcast
  *    off so the sort-merge shuffle is the plan under test — AQE's
  *    skew-join split is Spark's own lever; this spec proves OURS).
  */
class SkewSpec extends SparkSpec {

  private val W = 16 // reducer count for layout probes
  private val N = 200000L

  /** 200k rows; key 0 holds every even id (50%), odd ids spread over
    * 1000 cold keys (~100 rows each). Deterministic (xxhash64). */
  private def fact: DataFrame =
    spark.range(N).select(
      col("id"),
      when(col("id") % 2 === 0, 0L)
        .otherwise(pmod(xxhash64(col("id")), lit(1000)) + 1).as("k"),
      (col("id") % 97).cast("bigint").as("v"))

  private def partitionRows(df: DataFrame): Seq[Int] =
    df.rdd.mapPartitions(it => Iterator(it.size)).collect().toSeq

  /** Largest single reducer's share of all rows. */
  private def maxShare(df: DataFrame): Double = {
    val sizes = partitionRows(df)
    sizes.max.toDouble / sizes.sum
  }

  /** Max share of shuffle-read records landing on one task of the
    * heaviest shuffle-consuming stage while `body` runs. The listener
    * bus is async, so poll until the recorded totals go quiet. */
  private def maxTaskShare(body: => Unit): Double = {
    val perStage = TrieMap.empty[Int, Vector[Long]]
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val recs = Option(t.taskMetrics)
          .map(_.shuffleReadMetrics.recordsRead).getOrElse(0L)
        perStage.updateWith(t.stageId)(v =>
          Some(v.getOrElse(Vector.empty) :+ recs))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      var last = -1L
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 100) { // quiet for 3×100ms, cap 10s
        Thread.sleep(100)
        waited += 1
        val cur = perStage.values.map(_.sum).sum
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    val heaviest = perStage.values.maxBy(_.sum)
    heaviest.max.toDouble / math.max(heaviest.sum, 1L).toDouble
  }

  test("mega-key layout: salting levels the reducer row distribution") {
    // unsalted routing on k: the mega-key pins ~53% of rows (its 50%
    // plus the cold keys that hash to the same reducer) on ONE reducer
    val unsalted = maxShare(fact.repartition(W, col("k")))
    assert(unsalted >= 0.45, s"fixture is not skewed enough: $unsalted")
    // the q_join_salted/q_agg_salted rewrite: route on (k, salt16)
    val salted = maxShare(fact
      .withColumn("salt", pmod(xxhash64(col("id")), lit(16)))
      .repartition(W, col("k"), col("salt")))
    assert(salted <= 0.2,
      s"salted layout still skewed: max reducer share $salted")
    assert(salted * 2 < unsalted,
      s"salting did not at least halve the max reducer share: $salted vs $unsalted")
  }

  test("salted join on a mega-key: identical result, leveled tasks") {
    // q_join_salted's exact shape (Joins.saltedJoin) on the skewed
    // fixture: salt the fact side, replicate the dim side across all
    // salts, join on (k, salt). Plan under test is the real sort-merge
    // shuffle (AQE + auto-broadcast off in a sibling session).
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.shuffle.partitions", W.toString)
    val f2 = s2.range(N).select(
      col("id"),
      when(col("id") % 2 === 0, 0L)
        .otherwise(pmod(xxhash64(col("id")), lit(1000)) + 1).as("k"),
      (col("id") % 97).cast("bigint").as("v"))
    val dim = f2.groupBy(col("k")).agg(count(lit(1)).as("keyrows"))
    def summarize(joined: DataFrame): (Long, Long) = {
      val r = joined.agg(count(lit(1)).as("n"),
        sum(col("v") * col("keyrows")).as("chk")).head
      (r.getLong(0), r.getLong(1))
    }
    val k = 16
    val plainOut = summarize(f2.join(dim, Seq("k")))
    val saltedJoined = f2
      .withColumn("salt", pmod(xxhash64(col("id")), lit(k)))
      .join(dim.crossJoin(
        s2.range(0, k).select(col("id").cast("bigint").as("salt"))),
        Seq("k", "salt"))
    // salting is a physical rewrite only: bit-identical aggregate
    assert(summarize(saltedJoined) == plainOut)
    // task probe: the unsalted sort-merge join lands the mega-key's
    // half of the fact table on one reducer task; the salted join
    // spreads it across k
    val plainShare = maxTaskShare { f2.join(dim, Seq("k")).count() }
    val saltedShare = maxTaskShare { saltedJoined.count() }
    info(f"max task share: plain $plainShare%.3f vs salted $saltedShare%.3f")
    assert(plainShare >= 0.35, s"unsalted join shows no task skew: $plainShare")
    assert(saltedShare <= plainShare / 2,
      s"salted join did not halve the max task share: $saltedShare vs $plainShare")
  }

  test("two-stage salted top-k on a mega-source: exact and leveled") {
    // domainCap's rewrite (Curate.domainCap): stage-1 ranks within
    // (source, salt) and keeps cap rows per bucket, stage-2 re-ranks
    // the ≤16·cap survivors per source — exact because a row in the
    // true per-source top-cap is in its bucket's top-cap a fortiori.
    import org.apache.spark.sql.expressions.Window
    val cap = 25
    val docs = fact.select(col("id"), col("k").as("source"), col("v"))
    val single = Window.partitionBy(col("source"))
      .orderBy(col("v").desc, col("id"))
    val expected = docs.withColumn("r", row_number().over(single))
      .filter(col("r") <= cap).drop("r")
      .orderBy(col("source"), col("v").desc, col("id"))
      .collect().toSeq
    val wSalted = Window.partitionBy(col("source"), col("salt"))
      .orderBy(col("v").desc, col("id"))
    val staged = docs
      .withColumn("salt", pmod(xxhash64(col("id")), lit(16)))
      .withColumn("r1", row_number().over(wSalted))
      .filter(col("r1") <= cap)
      .withColumn("r", row_number().over(single))
      .filter(col("r") <= cap)
      .select(col("id"), col("source"), col("v"))
      .orderBy(col("source"), col("v").desc, col("id"))
      .collect().toSeq
    assert(staged == expected,
      "two-stage salted top-k diverged from the single global window")
    // layout: stage-1's (source, salt) routing levels the mega-source
    val unsalted = maxShare(docs.repartition(W, col("source")))
    val salted = maxShare(docs
      .withColumn("salt", pmod(xxhash64(col("id")), lit(16)))
      .repartition(W, col("source"), col("salt")))
    assert(unsalted >= 0.45 && salted <= 0.2,
      s"stage-1 salting did not level the window layout: $unsalted -> $salted")
  }
}
