package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over an ArrayType(FloatType) embedding
  * column: brute-force cosine top-k as the exact baseline, and an
  * LSH-bucketed approximate variant as the 100 TB scale path.
  *
  * The dot product accumulates left-to-right in double via the
  * higher-order `aggregate(zip_with(...))` — bit-identical to DuckDB's
  * `list_dot_product` over DOUBLE[], which makes raw cosine values
  * oracle-safe without rounding.
  */
object Similarity {

  /** Left-to-right double-precision dot product of two float arrays —
    * the codegen'd native expression (see graft.functions
    * .DotProductF32); numerically identical to [[dotHof]] but without
    * per-element lambda dispatch. Callers must hold a session with
    * GraftFunctions registered (operators entered via a DataFrame call
    * [[ensureRegistered]] first). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("dot_f32", a, b)

  /** Reference formulation via higher-order functions; kept for the
    * bit-identity cross-check in SimilaritySpec. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private[operators] def ensureRegistered(df: DataFrame): Unit =
    graft.functions.GraftFunctions.register(df.sparkSession)

  /** Cosine similarity (computes norms inline; prefer pre-computed
    * norm columns when scoring many pairs per vector). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Exact brute-force cosine top-k: every probe scored against every
    * candidate. Probes are broadcast (the probe set is small by
    * construction); candidates stream partition-parallel, so the cost
    * is |probes| × |candidates| FLOPs with no shuffle of the candidate
    * table. Use only for bounded probe sets — the scale path is
    * [[lshTopK]]. */
  def bruteForceTopK(probes: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    ensureRegistered(probes)
    val p = probes.select(col("vec_id").as("probe_id"),
      col("embedding").as("pe"),
      sqrt(dot(col("embedding"), col("embedding"))).as("pn"))
    val c = candidates.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"),
      sqrt(dot(col("embedding"), col("embedding"))).as("cn"))
    val scored = c.crossJoin(broadcast(p))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("pe"), col("ce")) / (col("pn") * col("cn")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk").cast("int").as("rnk"),
        col("neighbor_id"), col("cosine"))
  }

  /** Deterministic pseudo-random hyperplane component for global plane
    * g, dimension d — derived from md5 so buckets are reproducible
    * across runs with no RNG state. */
  private[operators] def planeComponent(g: Int, d: Int): Float = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$g|$d".getBytes("UTF-8"))
    val hex = digest.take(4).map(b => f"$b%02x").mkString.take(7)
    (java.lang.Long.parseLong(hex, 16).toDouble / 268435456.0 - 0.5).toFloat
  }

  /** Deterministic random-hyperplane LSH: `tables` independent hash
    * tables of `bits` sign bits each (one output row per (vector,
    * table)). A pair is a candidate if it collides in ANY table
    * (OR-amplification): per-table collision prob is s(θ)^bits,
    * overall 1-(1-s^bits)^tables — the multi-table union lifts recall
    * without coarsening the buckets.
    *
    * Scale shape: the plane matrix is tiny and ships as literals
    * inside the codegen'd projection (dot_f32 against a constant
    * array) — bucketing is a narrow map over the corpus, one pass,
    * tables×bits fused dot products per vector; no shuffle until the
    * candidate join. */
  def lshBuckets(emb: DataFrame, bits: Int = 6, tables: Int = 8,
                 dims: Int = 64): DataFrame = {
    ensureRegistered(emb)
    val planes = Array.tabulate(tables * bits)(g =>
      Array.tabulate(dims)(d => planeComponent(g, d)))
    // One fused expression for all tables×bits projections (single
    // codegen unit; plane matrix shipped as a reference object).
    // Registered fresh each call: the closure captures these planes.
    emb.sparkSession.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_lsh_buckets",
      exprs => graft.functions.LshBucketsF32(exprs.head, planes, bits, tables),
      "scala_udf")
    emb.withColumn("bkts",
        org.apache.spark.sql.functions.call_function("graft_lsh_buckets", col("embedding")))
      .select(col("*"), posexplode(col("bkts")).as(Seq("t", "bucket")))
      .drop("bkts")
  }

  /** Approximate top-k: score only candidates colliding with the probe
    * in at least one LSH table. At 100 TB this is the plan that
    * survives: bucket the corpus once (narrow job, written bucketed by
    * (t, bucket)), then each query touches ~tables/2^bits of the
    * corpus instead of all of it. Recall vs [[bruteForceTopK]] is
    * asserted in SimilaritySpec. */
  def lshTopK(probes: DataFrame, candidates: DataFrame, k: Int,
              bits: Int = 6, tables: Int = 8): DataFrame = {
    val p = lshBuckets(probes, bits, tables).select(col("t"), col("bucket"),
      col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val c = lshBuckets(candidates, bits, tables).select(col("t"), col("bucket"),
      col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
    val cand = c.join(broadcast(p), Seq("t", "bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"), col("pe"), col("ce"))
      .distinct() // collapse multi-table collisions before scoring
    val scored = cand.withColumn("cosine", cosine(col("pe"), col("ce")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk").cast("int").as("rnk"),
        col("neighbor_id"), col("cosine"))
  }
}
