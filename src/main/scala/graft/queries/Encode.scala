package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 feature-engineering and data-repair operators: leave-one-out
  * target encoding, long-tail category lumping, Tukey-fence outlier
  * auditing, and deterministic median imputation. All oracle-checked;
  * conventions per ARCHITECTURE.md "Cross-engine determinism" (exact
  * integer/decimal accumulation, md5 coins, fixed IEEE chains from
  * exact inputs, total ORDER BY).
  */
object Encode {

  /** C11 — leave-one-out target encoding: each order's priority level
    * encoded as the mean target (total price in exact cents) of every
    * OTHER order sharing the level — the standard high-cardinality
    * categorical encoder that avoids self-leakage. One small aggregate
    * (5 levels) broadcast back over the fact stream: loo =
    * (Σ_level − x)/(n_level − 1) is one double division of exact
    * integers per row — no shuffle of the fact table at any scale.
    * Levels with a single row emit NULL (no peers to encode from). */
  def targetEncode(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority"),
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint").as("cents"))
    val st = o.groupBy(col("o_orderpriority"))
      .agg(sum(col("cents")).as("s"), count(lit(1)).as("n"))
    o.join(broadcast(st), Seq("o_orderpriority"))
      .select(col("o_orderkey"), col("o_orderpriority"),
        when(col("n") > 1,
          (col("s") - col("cents")).cast("double") / (col("n") - 1))
          .as("loo_cents"))
      .orderBy(col("o_orderkey"))
  }

  val targetEncodeSql: String =
    """WITH o AS (SELECT o_orderkey, o_orderpriority,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM orders),
      |st AS (SELECT o_orderpriority, CAST(sum(cents) AS BIGINT) AS s,
      |         count(*) AS n
      |       FROM o GROUP BY o_orderpriority)
      |SELECT o_orderkey, o.o_orderpriority,
      |  CASE WHEN n > 1 THEN CAST(s - cents AS DOUBLE) / (n - 1) END AS loo_cents
      |FROM o JOIN st ON o.o_orderpriority = st.o_orderpriority
      |ORDER BY o_orderkey""".stripMargin

  /** C12 — long-tail category lumping: levels of the (brand, type)
    * cross whose support falls below 0.5% of the corpus collapse into
    * 'OTHER' — the rare-level regularization every categorical encoder
    * applies before one-hot/target encoding (unseen-at-serving levels
    * land in the same bucket). Level counts are one small aggregate;
    * the total broadcasts back as a scalar; the recode is a projection
    * over the LEVEL table (not the fact stream), so the whole operator
    * is metadata-scale after the first groupBy. */
  def rareLevels(s: SparkSession, dir: String): DataFrame = {
    val lv = Tables.part(s, dir)
      .select(concat_ws("/", col("p_brand"), col("p_type")).as("level"))
      .groupBy(col("level")).agg(count(lit(1)).as("c"))
    val tot = lv.agg(sum(col("c")).as("t"))
    lv.crossJoin(broadcast(tot))
      .select(when(col("c") * 200 < col("t"), lit("OTHER"))
          .otherwise(col("level")).as("level_out"), col("c"))
      .groupBy(col("level_out"))
      .agg(sum(col("c")).as("n_parts"), count(lit(1)).as("n_levels"))
      .orderBy(col("level_out"))
  }

  val rareLevelsSql: String =
    """WITH lv AS (SELECT concat_ws('/', p_brand, p_type) AS level, count(*) AS c
      |            FROM part GROUP BY 1),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM lv)
      |SELECT CASE WHEN c * 200 < t THEN 'OTHER' ELSE level END AS level_out,
      |  CAST(sum(c) AS BIGINT) AS n_parts, count(*) AS n_levels
      |FROM lv CROSS JOIN tot
      |GROUP BY 1 ORDER BY level_out""".stripMargin

  /** E26 — Tukey-fence (1.5×IQR) outlier audit: per return flag, the
    * exact interpolated quartiles of extended price, the derived
    * fences, and how many rows fall outside them — the standard
    * robust pre-training outlier screen (the fence variant of
    * [[Quality.winsorize]]'s clipping). Two passes: the per-group
    * quartile aggregate (3 groups — sort-based exact percentile at
    * this group count; the approx sketch replaces it at higher
    * cardinality), broadcast back over the fact stream for one
    * filtered count. Fence arithmetic is one fixed IEEE chain from
    * the two quartile doubles, identical in both engines. */
  def outlierIqr(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val q = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.25D)").as("q1"),
        expr("percentile(l_extendedprice, 0.75D)").as("q3"))
      .withColumn("lo", col("q1") - (col("q3") - col("q1")) * 1.5)
      .withColumn("hi", col("q3") + (col("q3") - col("q1")) * 1.5)
    li.join(broadcast(q), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(first(col("q1")).as("q1"), first(col("q3")).as("q3"),
        first(col("lo")).as("lo"), first(col("hi")).as("hi"),
        count(lit(1)).as("n"),
        sum(when(col("l_extendedprice") < col("lo") ||
          col("l_extendedprice") > col("hi"), 1L).otherwise(0L)).as("n_outliers"))
      .orderBy(col("l_returnflag"))
  }

  val outlierIqrSql: String =
    """WITH q AS (SELECT l_returnflag,
      |    quantile_cont(l_extendedprice, 0.25) AS q1,
      |    quantile_cont(l_extendedprice, 0.75) AS q3
      |  FROM lineitem GROUP BY l_returnflag),
      |f AS (SELECT l_returnflag, q1, q3,
      |        q1 - (q3 - q1) * 1.5 AS lo, q3 + (q3 - q1) * 1.5 AS hi FROM q)
      |SELECT li.l_returnflag, any_value(q1) AS q1, any_value(q3) AS q3,
      |  any_value(lo) AS lo, any_value(hi) AS hi, count(*) AS n,
      |  CAST(sum(CASE WHEN l_extendedprice < lo OR l_extendedprice > hi
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM lineitem li JOIN f ON li.l_returnflag = f.l_returnflag
      |GROUP BY li.l_returnflag ORDER BY li.l_returnflag""".stripMargin

  /** E16 — deterministic median imputation audit: a reproducible 10%
    * of event rows (md5 coin on event_id — the engine-portable
    * missingness simulation) have their value treated as missing;
    * each event type imputes its own median of the PRESENT values.
    * Values quantize to exact cents, so the interpolated median and
    * both means are exact-integer arithmetic up to one terminal
    * division. Emits the repair audit a pipeline logs: missing count,
    * imputed median, and the mean before vs after imputation. */
  def imputeMedian(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        floor(col("value") * 100).cast("bigint").as("cents"),
        (conv(substring(md5(col("event_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 100 < 10).as("missing"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("missing"), 1L).otherwise(0L)).as("n_missing"),
        expr("percentile(IF(missing, NULL, cents), 0.5D)").as("median_cents"),
        sum(when(col("missing"), 0L).otherwise(col("cents"))).as("s_present"))
      .select(col("event_type"), col("n"), col("n_missing"), col("median_cents"),
        (col("s_present").cast("double") / (col("n") - col("n_missing")))
          .as("mean_present"),
        ((col("s_present") + col("n_missing") * col("median_cents"))
          / col("n")).as("mean_imputed"))
      .orderBy(col("event_type"))

  val imputeMedianSql: String =
    """WITH e AS (SELECT event_type,
      |    CAST(floor(value * 100) AS BIGINT) AS cents,
      |    CAST(concat('0x', substring(md5(CAST(event_id AS VARCHAR)), 1, 8))
      |      AS BIGINT) % 100 < 10 AS missing
      |  FROM events)
      |SELECT event_type, count(*) AS n,
      |  CAST(sum(CASE WHEN missing THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
      |  quantile_cont(CASE WHEN missing THEN NULL ELSE cents END, 0.5)
      |    AS median_cents,
      |  CAST(sum(CASE WHEN missing THEN 0 ELSE cents END) AS DOUBLE)
      |    / (count(*) - sum(CASE WHEN missing THEN 1 ELSE 0 END))
      |    AS mean_present,
      |  (sum(CASE WHEN missing THEN 0 ELSE cents END)
      |    + sum(CASE WHEN missing THEN 1 ELSE 0 END)
      |      * quantile_cont(CASE WHEN missing THEN NULL ELSE cents END, 0.5))
      |    / count(*) AS mean_imputed
      |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_target_encode" -> (targetEncode _),
    "q_rare_levels" -> (rareLevels _),
    "q_outlier_iqr" -> (outlierIqr _),
    "q_impute_median" -> (imputeMedian _),
  )

  val oracle: Map[String, String] = Map(
    "q_target_encode" -> targetEncodeSql,
    "q_rare_levels" -> rareLevelsSql,
    "q_outlier_iqr" -> outlierIqrSql,
    "q_impute_median" -> imputeMedianSql,
  )
}
