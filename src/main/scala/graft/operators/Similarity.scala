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

  /** Left-to-right double-precision dot product of two float arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

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

  /** Deterministic random-hyperplane LSH: `tables` independent hash
    * tables of `bits` sign bits each (one output row per (vector,
    * table)). Plane components are derived from md5 of (global plane
    * index, dimension index) — fully reproducible across runs and
    * engines, no RNG state. A pair is a candidate if it collides in
    * ANY table (OR-amplification): per-table collision prob is
    * s(θ)^bits, overall 1-(1-s^bits)^tables — the multi-table union is
    * what lifts recall without coarsening the buckets.
    *
    * Plane component p[i][d] ∈ [-0.5, 0.5) is
    * (conv(md5("i|d")[1..7], 16, 10) / 16^7) - 0.5. */
  def lshBuckets(emb: DataFrame, bits: Int = 6, tables: Int = 8,
                 dims: Int = 64): DataFrame = {
    // Projection onto global plane (t*bits + i): Σ_d e[d] * plane(g, d).
    def proj(t: Column, i: Int): Column =
      expr(
        s"""aggregate(
           |  zip_with(embedding, sequence(0, ${dims - 1}),
           |    (x, d) -> CAST(x AS DOUBLE) *
           |      (CAST(conv(substring(md5(concat(CAST(t * $bits + $i AS STRING), '|',
           |        CAST(d AS STRING))), 1, 7), 16, 10) AS DOUBLE)
           |        / 268435456.0 - 0.5)),
           |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)
    val withT = emb.withColumn("t", explode(expr(s"sequence(0, ${tables - 1})")))
    val bucketBits = (0 until bits).map(i =>
      when(proj(col("t"), i) > 0, expr(s"shiftleft(CAST(1 AS BIGINT), $i)")).otherwise(0L))
    withT.withColumn("bucket", bucketBits.reduce(_ + _))
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
