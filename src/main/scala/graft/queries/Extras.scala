package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions
import graft.operators.{Multimodal, Similarity, VectorMean}

/** No-oracle operators (SURVEY.md §2B G3, G6, plus the ANN scale path
  * and the engine-native fingerprint): results are not bit-expressible
  * in DuckDB SQL (sketches, engine-specific hashes, LSH bucketing),
  * so the driver records a rows-only check and the real assertions
  * live in ScalaTest (tolerance vs exact, recall vs brute force,
  * known-answer vectors, equivalence to built-in avg).
  */
object Extras {

  /** G3 — HLL approximate distinct count alongside the exact value;
    * the spec asserts relative error < 5%. At scale this is the
    * mergeable-sketch answer to COUNT(DISTINCT) without the full
    * distinct shuffle. */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .orderBy(col("l_returnflag"))

  /** G6/D2 — custom typed Aggregator: per-label element-wise embedding
    * mean (the centroid computation behind IVF-style ANN indexing). */
  def vectorCentroids(s: SparkSession, dir: String): DataFrame = {
    val vm = udaf(new VectorMean(64))
    Tables.embeddings(s, dir)
      .groupBy(col("label"))
      .agg(vm(col("embedding")).as("centroid"))
      .select(col("label"),
        round(element_at(col("centroid"), 1), 6).as("c1"),
        round(element_at(col("centroid"), 2), 6).as("c2"),
        round(expr("aggregate(centroid, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x)"), 6)
          .as("sq_norm"))
      .orderBy(col("label"))
  }

  /** ANN — LSH-bucketed approximate top-k (the 100 TB similarity
    * path); recall vs bruteForceTopK asserted in SimilaritySpec. */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.lshTopK(emb.filter(col("vec_id") < 20), emb, 5, bits = 6, tables = 8)
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** ANN — IVF inverted-list approximate top-k (k-means coarse
    * quantizer + nprobe-list search), the second classic ANN scale
    * path; recall vs brute force asserted in SimilaritySpec. */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfTopK(emb.filter(col("vec_id") < 20), emb, 5, nprobe = 2)
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** Engine-native fingerprint via the codegen'd FNV-1a expression
    * (known-answer vectors asserted in FunctionsSpec). */
  def fnvFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), GraftFunctions.fnv64(col("text")).as("fp64"))
      .orderBy(col("doc_id"))

  /** L5 — multimodal decode/feature pipeline on synthesized payloads
    * (decode stage stubbed; plumbing real — see operators.Multimodal). */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.fromDocuments(Tables.documents(s, dir))
    Multimodal.extractFeatures(media).toDF()
      .select(col("media_id"), col("n_bytes"), col("checksum"),
        round(element_at(col("feature"), 1), 4).as("f1"))
      .orderBy(col("media_id"))
  }

  /** S3/A8 — NDJSON interchange semantics (the reference's transport
    * format: gzipped newline-delimited JSON): serialize each event row
    * to a JSON line, parse it back with an explicit schema, and emit
    * the parsed fields. The file-based gzip round trip is exercised in
    * EtlSpec. Oracle-checked: the serialize→parse cycle must reproduce
    * the source rows exactly (doubles survive via Java's shortest
    * round-trip representation), so the oracle is the source
    * projection itself — see the oracle map below. */
  def jsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    ev.select(to_json(struct(col("event_id"), col("event_type"), col("value"))).as("line"))
      .select(from_json(col("line"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_id BIGINT, event_type STRING, value DOUBLE")).as("r"))
      .select(col("r.event_id").as("event_id"), col("r.event_type").as("event_type"),
        col("r.value").as("value"))
      .orderBy(col("event_id"))
  }

  /** Approximate percentiles (t-digest-style sketch): mergeable
    * partial/final like HLL, the scale answer to exact quantiles
    * (which need a full sort). Sketch output is engine-specific →
    * rows-only + sanity bounds in the spec. */
  def percentileApprox(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("p50"),
        percentile_approx(col("o_totalprice"), lit(0.9), lit(1000)).as("p90"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
      .orderBy(col("o_orderstatus"))

  /** Built-in second-moment aggregates (stddev/variance/corr/covar):
    * their double accumulation order is engine- and shuffle-dependent,
    * so rows-only here; the deterministic exact-decimal formulation
    * with a full oracle is q_stats_moments. */
  def statsBuiltin(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        stddev_samp(col("l_quantity")).as("sd_qty"),
        var_samp(col("l_quantity")).as("var_qty"),
        corr(col("l_quantity"), col("l_extendedprice")).as("corr_qp"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("covar_qp"),
        skewness(col("l_quantity")).as("skew_qty"),
        kurtosis(col("l_quantity")).as("kurt_qty"))
      .orderBy(col("l_returnflag"))

  /** Frequent-items sketch (Karp-Papadimitriou-Shenker): approximate
    * heavy hitters without a full groupBy — mergeable, single pass.
    * Support threshold 0.3 → any item in >30% of rows is guaranteed
    * present. Rows-only (sketch contents beyond the guarantee are
    * engine-specific). */
  def freqItems(s: SparkSession, dir: String): DataFrame = {
    val fi = Tables.orders(s, dir)
      .stat.freqItems(Array("o_orderstatus", "o_orderpriority"), 0.3)
    fi.select(
      concat_ws(",", sort_array(col("o_orderstatus_freqItems"))).as("freq_status"),
      size(col("o_orderpriority_freqItems")).cast("int").as("n_freq_prio"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_json_roundtrip" -> (jsonRoundtrip _),
    "q_percentile_approx" -> (percentileApprox _),
    "q_stats_builtin" -> (statsBuiltin _),
    "q_freq_items" -> (freqItems _),
    "q_approx_distinct" -> (approxDistinct _),
    "q_vector_centroids" -> (vectorCentroids _),
    "q_ann_lsh" -> (annLsh _),
    "q_ann_ivf" -> (annIvf _),
    "q_fnv_fingerprint" -> (fnvFingerprint _),
    "q_multimodal_features" -> (multimodalFeatures _),
  )

  /** q_json_roundtrip gets a real oracle: the serialize→parse cycle
    * must reproduce the original rows exactly (Spark's to_json emits
    * round-trippable doubles), so the oracle is simply the source
    * projection. The remaining entries have no DuckDB-expressible
    * oracle (sketches, LSH/IVF, engine-specific hashes and
    * order-dependent double accumulations); the driver falls back to a
    * rows-only check and the real assertions live in ScalaTest. */
  val oracle: Map[String, String] = Map(
    "q_json_roundtrip" ->
      """SELECT event_id, event_type, value FROM events
        |ORDER BY event_id""".stripMargin,
  )
}
