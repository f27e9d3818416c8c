package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Tables, queries}
import graft.operators.Dedup

/** Scratch stage-level profiler for slow bench queries (dev tool, not
  * part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { n =>
      try {
        val df = if (n == "events") Tables.events(spark, sfDir)
                 else Tables.load(spark, sfDir, n)
        df.count()
      } catch { case _: Throwable => }
    }
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
      spark.catalog.clearCache()
    }
    val docs = Tables.documents(spark, sfDir)
    time("shingleOccurrences") {
      Dedup.shingleOccurrences(docs, 3).count()
    }
    time("shingle hash+distinct") {
      Dedup.shingleOccurrences(docs, 3)
        .select(col("doc_id"), xxhash64(col("shingle")).as("shash")).distinct().count()
    }
    time("ngramJaccardPairs(0.6)") {
      Dedup.ngramJaccardPairs(docs, 3, 0.6).count()
    }
    time("dedupClusters(pairs)") {
      val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.6)
        .select(col("doc_id_a"), col("doc_id_b"))
      Dedup.dedupClusters(pairs, 4).count()
    }
    time("full q_dedup_clusters") {
      queries.Llm.dedupClusters(spark, sfDir).count()
    }
    spark.stop()
  }
}
