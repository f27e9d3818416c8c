package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Warehouse-modeling and corpus-assembly operators (round 4
  * extensions beyond SURVEY.md §2B): slowly-changing-dimension
  * interval builds, market-basket association rules, dictionary
  * scrubbing, and context-window document packing. Each is the
  * Spark-declarative form of a pattern a 100 TB training-data or
  * analytics pipeline runs routinely; all are oracle-checked.
  */
object Warehouse {

  /** SCD Type 2 build — compress a per-user event stream into state
    * validity intervals [valid_from, valid_to): keep only rows where
    * the state CHANGES (lag compare), then close each interval with
    * the next change's timestamp (lead). The open current interval
    * gets the 9999999999 sentinel instead of NULL (cross-engine null
    * ordering differs; sentinel keeps the compare total). Bounds are
    * epoch seconds — integer-exact on both engines. Two windows, both
    * keyed by user_id: skew-safe, no global sort, scales linearly. */
  def scd2Build(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type").as("state"),
        unix_timestamp(col("ts")).as("sec"))
      .withColumn("prev_state", lag(col("state"), 1).over(w))
    val changes = e
      .filter(col("prev_state").isNull || col("prev_state") =!= col("state"))
      .withColumn("valid_from", col("sec"))
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("valid_from"), col("event_id"))
    changes
      .withColumn("valid_to",
        coalesce(lead(col("valid_from"), 1).over(w2), lit(9999999999L)))
      .select(col("user_id"), col("state"),
        col("valid_from"), col("valid_to"),
        (col("valid_to") === 9999999999L).as("is_current"))
      .orderBy(col("user_id"), col("valid_from"), col("state"))
  }

  val scd2BuildSql: String =
    """WITH e AS (SELECT user_id, event_id, event_type AS state,
      |             CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      |c AS (SELECT user_id, event_id, state, sec,
      |        lag(state) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev_state
      |      FROM e),
      |ch AS (SELECT user_id, event_id, state, sec AS valid_from FROM c
      |       WHERE prev_state IS NULL OR prev_state <> state)
      |SELECT user_id, state, valid_from,
      |  coalesce(lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id),
      |           9999999999) AS valid_to,
      |  coalesce(lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id),
      |           9999999999) = 9999999999 AS is_current
      |FROM ch ORDER BY user_id, valid_from, state""".stripMargin

  /** Market-basket association rules over order baskets: per-order
    * item sets (parts bucketed mod 50 to a catalog of bounded
    * cardinality), co-occurrence pairs from a WITHIN-ORDER self-join
    * (baskets are small and bounded — ~7 items — so the join is
    * linear in orders, never quadratic in the catalog), then exact
    * support / confidence / lift from integer counts. The catalog
    * count tables broadcast. This is the co-occurrence shape (also:
    * token co-occurrence, citation pairs) that scales by bounding the
    * per-basket fan-out, not the corpus. */
  def basketRules(s: SparkSession, dir: String, minCount: Long = 20L): DataFrame = {
    val items = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("okey"), (col("l_partkey") % 50).as("item"))
      .distinct().persist() // feeds the pair join twice plus item counts
    val nOrders = items.select(col("okey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val itemCounts = items.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val pairs = items.select(col("okey"), col("item").as("item_a"))
      .join(items.select(col("okey"), col("item").as("item_b")), Seq("okey"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    pairs
      .join(broadcast(itemCounts.select(col("item").as("item_a"), col("n_item").as("n_a"))),
        Seq("item_a"))
      .join(broadcast(itemCounts.select(col("item").as("item_b"), col("n_item").as("n_b"))),
        Seq("item_b"))
      .crossJoin(broadcast(nOrders))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        (col("n_ab").cast("double") / col("n_orders")).as("support"),
        (col("n_ab").cast("double") / col("n_a")).as("confidence"),
        ((col("n_ab").cast("double") * col("n_orders").cast("double")) /
          (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift"))
      .orderBy(col("item_a"), col("item_b"))
  }

  val basketRulesSql: String =
    """WITH items AS (SELECT DISTINCT l_orderkey AS okey, l_partkey % 50 AS item
      |               FROM lineitem),
      |n AS (SELECT count(DISTINCT okey) AS n_orders FROM items),
      |ic AS (SELECT item, count(*) AS n_item FROM items GROUP BY item),
      |p AS (SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_ab
      |      FROM items a JOIN items b ON a.okey = b.okey AND a.item < b.item
      |      GROUP BY 1, 2 HAVING count(*) >= 20)
      |SELECT item_a, item_b, n_ab,
      |  CAST(n_ab AS DOUBLE) / n_orders AS support,
      |  CAST(n_ab AS DOUBLE) / ca.n_item AS confidence,
      |  (CAST(n_ab AS DOUBLE) * CAST(n_orders AS DOUBLE)) /
      |    (CAST(ca.n_item AS DOUBLE) * CAST(cb.n_item AS DOUBLE)) AS lift
      |FROM p JOIN ic ca ON p.item_a = ca.item
      |JOIN ic cb ON p.item_b = cb.item, n
      |ORDER BY item_a, item_b""".stripMargin

  /** Dictionary scrubbing — the denylist-redaction shape of PII
    * removal at corpus scale: a (broadcast-sized) term denylist
    * compiled into one word-boundary alternation regex; every match
    * replaced in a single codegen'd regexp_replace pass and counted
    * with regexp_count. Pure narrow map — no shuffle except the final
    * presentation sort. Real pipelines swap the alternation for
    * email/phone/SSN patterns; the plan shape is identical. */
  def dictRedact(s: SparkSession, dir: String): DataFrame = {
    val pattern = "\\b(customer|key|value)\\b"
    Tables.documents(s, dir)
      .select(col("doc_id"),
        regexp_count(col("text"), lit(pattern)).cast("int").as("n_hits"),
        substring(regexp_replace(col("text"), pattern, "[X]"), 1, 80).as("head"))
      .filter(col("n_hits") > 0)
      .orderBy(col("doc_id"))
  }

  val dictRedactSql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '\b(customer|key|value)\b')) AS INT) AS n_hits,
      |  substring(regexp_replace(text, '\b(customer|key|value)\b', '[X]', 'g'), 1, 80) AS head
      |FROM documents
      |WHERE len(regexp_extract_all(text, '\b(customer|key|value)\b')) > 0
      |ORDER BY doc_id""".stripMargin

  /** Context-window document packing — assign documents (in doc_id
    * order) to fixed-capacity token windows: pack_id = floor(tokens
    * before this doc / capacity), the standard offset-packing rule of
    * distributed corpus assembly (greedy reset packing is inherently
    * sequential; offset packing is its scan-friendly form and what a
    * sharded tokenizer actually emits). The prefix sum is computed
    * scale-safely: range-repartition by doc_id, per-partition token
    * totals broadcast as offsets, partition-local cumulative sum —
    * the same no-global-sort shape as q_equidepth_hist. */
  def docPacking(s: SparkSession, dir: String, capacity: Int = 2048): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("bigint").as("ntok"))
    val parts = d.repartitionByRange(32, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .persist() // pin sampled range bounds: both readers must agree on pid
    val offsets = parts.groupBy(col("pid")).agg(sum(col("ntok")).as("c"))
      .withColumn("off", sum(col("c")).over(Window.orderBy(col("pid"))) - col("c"))
      .select(col("pid"), col("off"))
    val localW = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
    parts
      .withColumn("cum_local", sum(col("ntok")).over(localW))
      .join(broadcast(offsets), Seq("pid"))
      .withColumn("before", col("off") + col("cum_local") - col("ntok"))
      .withColumn("pack_id", expr(s"CAST(before DIV $capacity AS INT)"))
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("total_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("pack_id"))
  }

  val docPackingSql: String =
    """WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS ntok FROM documents),
      |c AS (SELECT doc_id, ntok,
      |        CAST(sum(ntok) OVER (ORDER BY doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ntok AS BIGINT) AS before
      |      FROM d)
      |SELECT CAST(before // 2048 AS INT) AS pack_id,
      |  count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS total_tokens,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM c GROUP BY 1 ORDER BY pack_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scd2_build" -> (scd2Build _),
    "q_basket_rules" -> ((s, d) => basketRules(s, d)),
    "q_dict_redact" -> (dictRedact _),
    "q_doc_packing" -> ((s, d) => docPacking(s, d)),
  )

  val oracle: Map[String, String] = Map(
    "q_scd2_build" -> scd2BuildSql,
    "q_basket_rules" -> basketRulesSql,
    "q_dict_redact" -> dictRedactSql,
    "q_doc_packing" -> docPackingSql,
  )
}
