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
    // SPARK_GRAFT_PROFILE=q_a,q_b: time each named SparkEntry query
    // `reps` times (first run shows cold cost, later runs warm cost).
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val names = sys.env.get("SPARK_GRAFT_PROFILE")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("q_dedup_clusters"))
    if (names == Seq("ann_phases")) {
      // Cost breakdown of the PQ/IVF-PQ training ladder by parameter
      // deltas (the private phases aren't separately callable).
      val emb = Tables.embeddings(spark, sfDir)
      val probes = emb.filter(col("vec_id") < 20)
      import graft.operators.Similarity
      (1 to reps).foreach { r =>
        time(s"pq iters=0 run$r") { Similarity.pqTopK(probes, emb, 5, iterations = 0).count() }
        time(s"pq iters=2 run$r") { Similarity.pqTopK(probes, emb, 5).count() }
        time(s"ivfpq pq=0 run$r") { Similarity.ivfPqTopK(probes, emb, 5, nprobe = 6, pqIterations = 0).count() }
        time(s"ivfpq full run$r") { Similarity.ivfPqTopK(probes, emb, 5, nprobe = 6).count() }
      }
    } else names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to reps).foreach { r =>
        time(s"$name run$r") { fn(spark, sfDir).count() }
      }
    }
    spark.stop()
  }
}
