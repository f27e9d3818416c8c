package graft

/** Interpreted-vs-codegen consistency for the custom Catalyst
  * expressions: every custom Expression here ships TWO execution
  * paths — `nullSafeEval` (interpreted) and `doGenCode` (Janino) — and
  * Spark switches between them at runtime without notice (codegen
  * falls back when a generated method exceeds JIT limits, when a plan
  * has too many fields, or when compilation fails). A divergence
  * between the two paths is the classic custom-expression bug: results
  * silently change with the fallback. This spec re-runs every query
  * family built on the custom expressions (FNV64, dot/cosine F32,
  * MinHashSig, SimHash32, NgramHashes, ShingleProfile, JaroWinkler,
  * PQ encode/score, NearestCentroidsF32, LshBucketsF32) with
  * whole-stage codegen OFF and the expression factory forced to
  * NO_CODEGEN — pure interpreted eval — and requires bit-identical
  * output to the codegen'd run. */
class InterpretedModeSpec extends SparkSpec {

  private lazy val interpreted = {
    val s = spark.newSession()
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    // TESTING conf, but the stable way to force interpreted
    // projections/predicates — exactly the runtime-fallback path
    s.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    s
  }

  private val targets = Seq(
    // FNV64 fingerprints + hash-derived coins
    "q_fnv_fingerprint", "q_hash_sample",
    // MinHashSig / SimHash32 / NgramHashes / ShingleProfile
    "q_dedup_minhash", "q_dedup_simhash", "q_dedup_ngram",
    "q_minhash_error", "q_similarity_measures",
    // JaroWinkler expression + LevenshteinPrefilter rule rewrite
    "q_jaro_winkler", "q_dedup_levenshtein",
    // dot/cosine F32 + PQ encode/score + coarse assignment + LSH planes
    "q_sim_topk", "q_ann_pq", "q_ann_ivf", "q_ann_lsh", "q_ann_ivfpq",
    "q_vector_quantize",
    // multimodal feature extraction (fnv checksums over binary)
    "q_multimodal_features",
    // UnicodeNormalize + StripAccentsExpr
    "q_unicode_normalize")

  test("custom expressions: interpreted eval ≡ codegen output") {
    targets.foreach { name =>
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sfDir).collect().map(_.toSeq).toSeq
      spark.catalog.clearCache()
      val b = fn(interpreted, sfDir).collect().map(_.toSeq).toSeq
      interpreted.catalog.clearCache()
      assert(a == b, s"$name differs between codegen and interpreted eval")
    }
  }

  test("row-based parquet reader + no pushdown ≡ vectorized pushed-down scans") {
    // The other silent fallback: Spark drops to the row-based
    // parquet-mr reader for schemas the vectorized reader can't handle
    // (historically a source of decimal/timestamp divergence), and
    // filter pushdown is an optimization that must never change
    // results. Cover the decimal-heavy, timestamp-heavy, and
    // filter-heavy scan paths under both toggles at once.
    val rowReader = spark.newSession()
    rowReader.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    rowReader.conf.set("spark.sql.parquet.filterPushdown", "false")
    Seq("q_pricing_summary", "q_decimal_fidelity", "q_date_funcs",
      "q_ranged_scan", "q_filter_complex", "q_win_tumbling")
      .foreach { name =>
        val fn = SparkEntry.queries(name)
        val a = fn(spark, sfDir).collect().map(_.toSeq).toSeq
        spark.catalog.clearCache()
        val b = fn(rowReader, sfDir).collect().map(_.toSeq).toSeq
        rowReader.catalog.clearCache()
        assert(a == b, s"$name differs under the row-based parquet reader")
      }
  }
}
