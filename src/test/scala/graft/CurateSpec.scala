package graft

import org.apache.spark.sql.functions._
import graft.queries.Curate

/** Invariants of the round-6 curation operators that the row-hash
  * oracle can't express: pagination continuity, normalization bounds,
  * cap enforcement, and the CUSUM zero-sum identity. */
class CurateSpec extends SparkSpec {

  test("filter funnel is monotone and its drops reconcile exactly") {
    val rows = queries.Curate.filterFunnel(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("stage"))
    assert(rows.length == 5)
    assert(rows.head.getAs[String]("filter_name") == "all")
    rows.sliding(2).foreach { case Array(prev, cur) =>
      val (np, nc) = (prev.getAs[Long]("n_surviving"), cur.getAs[Long]("n_surviving"))
      assert(nc <= np, s"stage ${cur.getAs[Int]("stage")} grew: $nc > $np")
      assert(cur.getAs[Long]("n_dropped") == np - nc, "drop must equal the delta")
    }
    assert(rows.last.getAs[Long]("n_surviving") > 0, "funnel must not drain empty")
  }

  test("domain cap never exceeds the cap and is a stable subset") {
    val out = Curate.domainCap(spark, sfDir, cap = 7)
    val per = out.groupBy(col("source")).count().collect()
    assert(per.nonEmpty && per.forall(_.getLong(1) <= 7))
    // deterministic: same coin, same survivors
    val again = Curate.domainCap(spark, sfDir, cap = 7)
    assert(out.collect().map(_.toSeq).sameElements(again.collect().map(_.toSeq)))
  }

  test("keyset pages tile: page 2 starts exactly after page 1's cursor") {
    val p1 = Curate.keysetPage(spark, sfDir, pageSize = 200).collect()
    assert(p1.length == 200)
    val last = p1.last
    val (ld, lk) = (last.getDate(1).toString, last.getLong(0))
    val p2 = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") > lit(ld) ||
        (col("o_orderdate") === lit(ld) && col("o_orderkey") > lk))
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("o_date"))
      .orderBy(col("o_date"), col("o_orderkey"))
      .limit(200).collect()
    // no overlap with page 1, and no gap: p2's head is the successor
    // of p1's tail in the full ordering
    val p1Keys = p1.map(_.getLong(0)).toSet
    assert(p2.forall(r => !p1Keys.contains(r.getLong(0))))
    val fullHead = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") > lit("1995-06-15") ||
        (col("o_orderdate") === lit("1995-06-15") && col("o_orderkey") > 3000L))
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("o_date"))
      .orderBy(col("o_date"), col("o_orderkey"))
      .limit(400).collect()
    assert(fullHead.map(_.getLong(0)).toSeq ==
      (p1.map(_.getLong(0)) ++ p2.map(_.getLong(0))).toSeq)
  }

  test("quantile normalization spans [0,1] with exact endpoints per group") {
    val out = Curate.quantileNorm(spark, sfDir).persist()
    val stats = out.groupBy(col("o_orderstatus"))
      .agg(min(col("qnorm")).as("lo"), max(col("qnorm")).as("hi"),
        count(lit(1)).as("n")).collect()
    stats.foreach { r =>
      assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 1.0,
        s"group ${r.getString(0)} spans [${r.getDouble(1)}, ${r.getDouble(2)}]")
    }
    // ranks are a bijection: qnorm values within a group are distinct
    val dup = out.groupBy(col("o_orderstatus"), col("qnorm")).count()
      .filter(col("count") > 1).count()
    assert(dup == 0L)
    out.unpersist()
  }

  test("change-point cumulative deviation returns to zero on the last day") {
    val rows = Curate.changePoint(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // S(D) = D·T − D·T = 0 — the CUSUM identity; a broken prefix sum
    // (lost partition offset) would violate it
    assert(rows.last.getLong(2) == 0L)
    assert(rows.count(_.getBoolean(3)) >= 1)
  }

  test("canonical pick dominates every member of its cluster") {
    val canon = Curate.dedupCanonical(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val labels = graft.operators.Dedup.dedupClusters(
        graft.operators.Dedup.ngramJaccardPairs(
          Tables.documents(spark, sfDir), 3, 0.6)
          .select(col("doc_id_a"), col("doc_id_b")))
      .join(Tables.documents(spark, sfDir)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("ntok")),
        Seq("doc_id"))
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getLong(3)))
    labels.foreach { case (cluster, doc, ntok) =>
      val (bestTok, bestDoc) = canon(cluster)
      assert(bestTok > ntok || (bestTok == ntok && bestDoc <= doc),
        s"cluster $cluster: member $doc ($ntok) beats canonical $bestDoc ($bestTok)")
    }
  }
}
