package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class ClusterSpec extends SparkSpec {

  private def pairsDf(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("doc_id_a", "doc_id_b")
  }

  test("connected components label chains and stars by their min id") {
    // components: {1,2,3,4} (chain), {10,11} (pair), {20,21,22} (star on 20)
    val out = Dedup.dedupClusters(
        pairsDf((1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (20, 22)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == ((1L, true)) && out(2L) == ((1L, false))
      && out(3L) == ((1L, false)) && out(4L) == ((1L, false)))
    assert(out(10L) == ((10L, true)) && out(11L) == ((10L, false)))
    assert(out(20L) == ((20L, true)) && out(21L)._1 == 20L && out(22L)._1 == 20L)
  }

  test("a deep chain converges at run time where a fixed depth would mislabel") {
    // Path graph 1-2-…-12: min-label propagation moves the root label
    // one hop per round, so node 12 needs 11 rounds — any fixed
    // 4-round unroll would leave the tail labeled by an intermediate
    // node. The convergence counter must carry it to the true fixpoint…
    val chain = pairsDf((1 to 11).map(i => (i.toLong, i + 1L)): _*)
    val out = Dedup.dedupClusters(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1 to 12).foreach(i => assert(out(i.toLong) == 1L,
      s"node $i labeled ${out(i.toLong)}, expected 1"))
    // …and an exhausted cap fails LOUDLY instead of returning
    // partially-propagated labels (4 rounds cannot reach the end of
    // an 11-edge path, and silent truncation would split the chain).
    intercept[IllegalArgumentException] {
      Dedup.dedupClusters(chain, maxIterations = 4).collect()
    }
  }

  test("star contraction labels the same components as label propagation") {
    val out = Dedup.dedupClustersStar(
        pairsDf((1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (20, 22)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == ((1L, true)) && out(4L) == ((1L, false)))
    assert(out(10L) == ((10L, true)) && out(11L) == ((10L, false)))
    assert(out(20L) == ((20L, true)) && out(21L)._1 == 20L && out(22L)._1 == 20L)
  }

  test("a v-only star center contracts in the seed rounds (both endpoints self-vote)") {
    // Star whose MIN is the center and the center appears ONLY on the
    // v side: without the (v, v) self-edge the center's own label came
    // from its neighbors (all larger), the seed's k-hop-min invariant
    // broke, and the component needed an extra star round. With both
    // endpoints self-voting, 2 seed rounds fully label a star.
    val vOnlyStar = pairsDf((5, 1), (6, 1), (7, 1), (8, 1))
    val out = Dedup.dedupClustersStar(vOnlyStar, maxRounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 1L, 8L -> 1L))
  }

  test("star contraction handles a 200-deep chain in O(log²) rounds") {
    // Label propagation needs 199 rounds here (one hop per round);
    // contraction must finish within 15 alternating rounds or the
    // require() in dedupClustersStar fails loudly.
    val chain = pairsDf((1 to 199).map(i => (i.toLong, i + 1L)): _*)
    val out = Dedup.dedupClustersStar(chain, maxRounds = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 200)
    (1 to 200).foreach(i => assert(out(i.toLong) == 1L,
      s"node $i labeled ${out(i.toLong)}, expected 1"))
  }

  test("star contraction matches label propagation on the fixture corpus") {
    val pairs = Dedup.ngramJaccardPairs(Tables.documents(spark, sfDir), 3, 0.6)
      .select(col("doc_id_a"), col("doc_id_b"))
    val prop = Dedup.dedupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    val star = Dedup.dedupClustersStar(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    assert(prop == star, "the two CC algorithms must agree exactly")
  }

  test("BFS hops measure exact chain depth and agree with CC labels") {
    // Path 1-2-…-12 (hops = position), a 3-cycle with a tail
    // (20-21-22-20, 22-23: shortest paths through the cycle), and a
    // star (30 center): hop distances must be graph distances to the
    // min-id root, not propagation-round artifacts.
    val out = Dedup.bfsHops(pairsDf(
        ((1 to 11).map(i => (i.toLong, i + 1L)) ++
          Seq((20L, 21L), (21L, 22L), (20L, 22L), (22L, 23L),
            (30L, 31L), (30L, 32L), (30L, 33L))): _*))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (1 to 12).foreach(i => assert(out(i.toLong) == ((1L, i - 1L)),
      s"node $i: ${out(i.toLong)}, expected (1, ${i - 1})"))
    assert(out(21L) == ((20L, 1L)) && out(22L) == ((20L, 1L))
      && out(23L) == ((20L, 2L)), s"cycle hops wrong: $out")
    assert(out(30L) == ((30L, 0L)) && out(31L) == ((30L, 1L)))
    // labels agree with dedupClusters on the same graph
    val cc = Dedup.dedupClusters(pairsDf(
        ((1 to 11).map(i => (i.toLong, i + 1L)) ++
          Seq((20L, 21L), (21L, 22L), (20L, 22L), (22L, 23L),
            (30L, 31L), (30L, 32L), (30L, 33L))): _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.view.mapValues(_._1).toMap == cc)
    // exhausted cap fails loudly, never returns partial distances
    intercept[IllegalArgumentException] {
      Dedup.bfsHops(pairsDf((1 to 11).map(i => (i.toLong, i + 1L)): _*),
        maxIterations = 4).collect()
    }
    // negative ids break the pack decode (div truncates, pmod floors)
    // — refused loudly, never unpacked wrong
    intercept[IllegalArgumentException] {
      Dedup.bfsHops(pairsDf((-5L, 2L))).collect()
    }
  }

  test("the run-time fixpoint matches the oracle's 8-round unroll on the corpus") {
    val pairs = Dedup.ngramJaccardPairs(Tables.documents(spark, sfDir), 3, 0.6)
      .select(col("doc_id_a"), col("doc_id_b"))
    val converged = Dedup.dedupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val eightRounds = Dedup.dedupClusters(pairs, maxIterations = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(converged == eightRounds,
      "fixture corpus did not converge within the oracle's 8-round unroll")
  }
}
