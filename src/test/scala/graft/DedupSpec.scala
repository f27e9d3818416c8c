package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Planted-duplicate tests for the dedup family: the fixture corpus
  * has near-dups but the decisive cases (exact copies, one-word edits)
  * are synthesized here so each operator's detection claim is tested
  * directly. */
class DedupSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    Seq(
      (0L, base),
      (1L, base), // exact dup of 0
      (2L, base.replace("quick", "slow")), // near-dup of 0
      (3L, "completely different words about spark query engines and columnar formats"),
      (4L, "another unrelated document mentioning neither foxes nor dogs at all whatsoever")
    ).toDF("doc_id", "text")
  }

  test("exact dedup collapses identical texts to min doc_id") {
    val out = Dedup.exact(docs, col("text"), col("doc_id")).collect()
    assert(out.length == 4) // 5 docs, one pair collapsed
    val dupGroup = out.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dupGroup.getAs[Long]("keep_id") == 0L)
  }

  test("narrow-map simhash expression is bit-identical to the aggregate formulation") {
    val fixture = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val viaAgg = Dedup.simhash(fixture, 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaExpr = Dedup.simhashNarrow(fixture, 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr.nonEmpty && viaExpr == viaAgg)
    // empty-token documents drop from BOTH (aggregate: empty group;
    // expression: NULL signature filtered)
    import spark.implicits._
    val degenerate = Seq((1L, "  "), (2L, "a b")).toDF("doc_id", "text")
    assert(Dedup.simhashNarrow(degenerate).collect().map(_.getLong(0)).toSet == Set(2L))
    assert(Dedup.simhash(degenerate).collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("narrow-map minhash expression is bit-identical to the aggregate formulation") {
    val fixture = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val viaAgg = Dedup.minhashSignatures(Dedup.shingleOccurrences(fixture, 3), 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaExpr = Dedup.minhashSignaturesNarrow(fixture, 3, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaExpr.nonEmpty && viaExpr == viaAgg)
    // short documents (< n tokens) drop from BOTH formulations
    import spark.implicits._
    val short = Seq((1L, "a b"), (2L, "a b c d")).toDF("doc_id", "text")
    assert(Dedup.minhashSignaturesNarrow(short, 3, 16)
      .collect().map(_.getLong(0)).toSet == Set(2L))
    assert(Dedup.minhashSignatures(Dedup.shingleOccurrences(short, 3), 16)
      .collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("fused shingle profile matches the standalone ngram-set and minhash expressions") {
    val fixture = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val prof = Dedup.shingleProfiles(fixture, 3, 16)
      .collect().map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getSeq[String](2))).toMap
    val sigs = Dedup.minhashSignaturesNarrow(fixture, 3, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ngram_hashes",
      exprs => graft.functions.NgramHashes(exprs.head, 3), "scala_udf")
    val sets = fixture
      .select(col("doc_id"),
        org.apache.spark.sql.functions.call_function("graft_ngram_hashes", col("text")).as("hs"))
      .filter(col("hs").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(prof.nonEmpty && prof.keySet == sigs.keySet && prof.keySet == sets.keySet)
    assert(prof.forall { case (id, (hs, sig)) => hs == sets(id) && sig == sigs(id) })
    // sub-n-token documents drop, as in the standalone forms
    import spark.implicits._
    val short = Seq((1L, "a b"), (2L, "a b c d")).toDF("doc_id", "text")
    assert(Dedup.shingleProfiles(short, 3, 16)
      .collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("minhash LSH finds exact and near dup pairs, not unrelated docs") {
    val pairs = Dedup.minhashCandidates(
        Dedup.minhashSignatures(Dedup.shingles(docs), 16), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"exact dup pair missed: $pairs")
    // near-dup (one word of 14 changed) should collide on >=1 band
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)),
      s"near-dup pair missed: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"false positive: $pairs")
  }

  test("ngram jaccard scores the planted pairs correctly") {
    val out = Dedup.ngramJaccardPairs(docs, 3, 0.2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((0L, 1L)) == 1.0)
    assert(out((0L, 2L)) > 0.3 && out((0L, 2L)) < 1.0)
    assert(!out.contains((0L, 3L)))
  }

  test("simhash: identical docs hash identically, near-dups within small hamming") {
    val sig = Dedup.simhash(docs, 32).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(0L) == sig(1L))
    val hammingNear = java.lang.Long.bitCount(sig(0L) ^ sig(2L))
    val hammingFar = java.lang.Long.bitCount(sig(0L) ^ sig(3L))
    assert(hammingNear < hammingFar,
      s"near-dup hamming $hammingNear !< unrelated hamming $hammingFar")
    val pairs = Dedup.simhashCandidates(Dedup.simhash(docs, 32), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("embedding cosine pairs find planted duplicate vectors") {
    import spark.implicits._
    val v1 = Array.tabulate(8)(i => (i + 1).toFloat)
    val v2 = v1.map(x => x * 1.001f) // near-identical direction
    val v3 = Array.tabulate(8)(i => if (i % 2 == 0) 1f else -1f)
    val emb = Seq((0L, v1.toSeq, 0), (1L, v2.toSeq, 0), (2L, v3.toSeq, 0))
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val pairs = Dedup.embeddingCosinePairs(emb, col("label"), 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)), s"got $pairs")
  }
}
