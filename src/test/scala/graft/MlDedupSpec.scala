package graft

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH, Tokenizer}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Cross-validation of the hand-rolled MinHash banding against
  * Spark MLlib's MinHashLSH (HashingTF token sets →
  * approxSimilarityJoin): both must surface the planted near-dup
  * pair. The hand-rolled path stays the engine default (oracle-able
  * md5 hashing, no Vector conversion); MLlib is the interop check. */
class MlDedupSpec extends SparkSpec {

  test("MLlib MinHashLSH agrees with the hand-rolled banding on planted dups") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val docs = Seq(
      (0L, base),
      (1L, base.replace("quick", "slow")),
      (2L, "completely different words about spark query engines and columnar formats"),
      (3L, "another unrelated document mentioning neither foxes nor dogs at all whatsoever")
    ).toDF("doc_id", "text")

    // Hand-rolled path
    val ours = Dedup.minhashCandidates(
        Dedup.minhashSignatures(Dedup.shingles(docs), 16), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // MLlib path: token multiset → hashed term vector → MinHashLSH
    val tokens = new Tokenizer().setInputCol("text").setOutputCol("words")
      .transform(docs)
    val tf = new HashingTF().setInputCol("words").setOutputCol("features")
      .setNumFeatures(1 << 14).setBinary(true)
      .transform(tokens)
    val model = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L)
      .fit(tf)
    val mllib = model.approxSimilarityJoin(tf, tf, 0.5, "jaccard_dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .filter(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(ours.contains((0L, 1L)), s"hand-rolled missed the planted pair: $ours")
    assert(mllib.contains((0L, 1L)), s"MLlib missed the planted pair: $mllib")
    assert(!mllib.exists(p => p._2 == 2L || p._2 == 3L && p._1 <= 1L),
      s"MLlib false positives: $mllib")
  }
}
