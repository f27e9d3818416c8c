package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Dev scratch: stage-level timing of q_dedup_canonical (deleted once
  * the round's tuning is done). */
object CanonProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    Tables.names.foreach { n =>
      try { (if (n == "events") Tables.events(spark, dir) else Tables.load(spark, dir, n)).count() }
      catch { case _: Throwable => } }
    def time[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[T] $l%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r }
    time("warmall") { graft.SparkEntry.queries("q_dedup_canonical")(spark, dir).count() }
    spark.catalog.clearCache()
    val pairsDf = Dedup.ngramJaccardPairs(Tables.documents(spark, dir), 3, 0.6)
      .select(col("doc_id_a"), col("doc_id_b"))
    val p = time("pairs ckpt") { pairsDf.coalesce(8).localCheckpoint() }
    println(s"[T] n_pairs = ${p.count()}")
    val nodes = p.select(col("doc_id_a").as("node"))
      .union(p.select(col("doc_id_b").as("node"))).distinct()
    val edgesPlus = time("edgesPlus ckpt") {
      p.select(col("doc_id_a").as("u"), col("doc_id_b").as("v"))
        .union(p.select(col("doc_id_b").as("u"), col("doc_id_a").as("v")))
        .union(nodes.select(col("node").as("u"), col("node").as("v")))
        .repartition(col("v")).localCheckpoint() }
    var labels = time("labels init ckpt") { nodes.withColumn("label", col("node")).localCheckpoint() }
    def labelSum(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum = time("labelSum0") { labelSum(labels) }
    var converged = false; var i = 0
    while (!converged && i < 50) {
      i += 1
      labels = time(s"round $i join+agg+ckpt") {
        edgesPlus.join(labels.hint("shuffle_hash"), edgesPlus("v") === labels("node"))
          .groupBy(col("u")).agg(min(col("label")).as("label"))
          .withColumnRenamed("u", "node").localCheckpoint() }
      val curSum = time(s"round $i sum") { labelSum(labels) }
      converged = prevSum != null && curSum != null && prevSum.compareTo(curSum) == 0
      prevSum = curSum
    }
    val lab = labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
    val ntok = Tables.documents(spark, dir).select(col("doc_id"),
      size(split(col("text"), " ")).cast("bigint").as("ntok"))
    time("final join+argmax") {
      lab.join(ntok, Seq("doc_id")).groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          max(struct(col("ntok"), (-col("doc_id")).as("neg"))).as("m"))
        .select(col("cluster_id"), col("n_members"), col("m.ntok").as("best_ntok"),
          (-col("m.neg")).as("canonical_doc"))
        .orderBy(col("cluster_id")).count() }
    spark.stop()
  }
}
