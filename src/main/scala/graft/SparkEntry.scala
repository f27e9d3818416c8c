package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Adaptive, Alloc, Analytics, Audit, Augment, Corpus, Curate, Encode, EtlQueries, Evaluate, Extras, Featurize, Infer, Joins, Linkage, Llm, Metrics, Network, Pipeline, Quality, Relational, Serving, Train, Trend, Warehouse, Windows}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-category query packs under graft.queries; every
  * SQL-expressible operator from SURVEY.md §2B has one `queries` entry
  * and a matching DuckDB `oracleSql` string (names and output column
  * names are aligned pairwise — the driver sorts columns by name and
  * hash-compares values).
  *
  * Cache contract: operators persist() intermediates that feed two
  * readers of one returned plan (self-joins, size+pair passes) via
  * [[Caches.persist]]; every query registered here is wrapped in
  * [[Caches.own]], which releases those intermediates automatically
  * when the caller's action over the returned plan completes — no
  * caller-side clearCache() is required (CacheScopeSpec asserts zero
  * persisted blocks remain after a query runs). One returned plan is
  * good for one action; rebuild the query for another run.
  */
object SparkEntry {

  /** Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  private def packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracle),
      (Joins.queries, Joins.oracle),
      (Windows.queries, Windows.oracle),
      (EtlQueries.queries, EtlQueries.oracle),
      (Llm.queries, Llm.oracle),
      (Extras.queries, Extras.oracle),
      (Pipeline.queries, Pipeline.oracle),
      (Analytics.queries, Analytics.oracle),
      (Warehouse.queries, Warehouse.oracle),
      (Trend.queries, Trend.oracle),
      (Linkage.queries, Linkage.oracle),
      (Alloc.queries, Alloc.oracle),
      (Curate.queries, Curate.oracle),
      (Quality.queries, Quality.oracle),
      (Featurize.queries, Featurize.oracle),
      (Serving.queries, Serving.oracle),
      (Corpus.queries, Corpus.oracle),
      (Metrics.queries, Metrics.oracle),
      (Encode.queries, Encode.oracle),
      (Infer.queries, Infer.oracle),
      (Augment.queries, Augment.oracle),
      (Audit.queries, Audit.oracle),
      (Adaptive.queries, Adaptive.oracle),
      (Train.queries, Train.oracle),
      (Evaluate.queries, Evaluate.oracle),
      (Network.queries, Network.oracle),
    )

  /** One entry per implemented operator from SURVEY.md §2. Every
    * entry closes its cache scope via [[Caches.own]]: scratch
    * persists are released when the caller's action completes. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.iterator.map(_._1).reduce(_ ++ _).map { case (name, fn) =>
      name -> ((s: SparkSession, dir: String) => Caches.own(fn(s, dir)))
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver records a weaker
    * rows-only check (used for sketches/LSH where bit-identical output
    * is not SQL-expressible). */
  def oracleSql: Map[String, String] =
    packs.iterator.map(_._2).reduce(_ ++ _)
}
