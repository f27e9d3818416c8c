package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Embedded-Derby staging for the REAL JDBC ranged-read path (ref A1 —
  * the reference's core operator is a ranged RDBMS read; SURVEY.md
  * §2A). The sandbox has no networked RDBMS, but Derby runs embedded
  * in the Spark JVM, so the whole `format("jdbc")` surface —
  * partitionColumn striding, predicate pushdown, fetchsize — is
  * exercised against a real SQL engine rather than documented as
  * options on a parquet analog.
  *
  * At production scale the staging step disappears (the RDBMS already
  * exists) and [[JdbcRangedSource.read]] is the entire operator: each
  * Spark partition opens its own connection and reads one PK stride,
  * which is exactly the reference's hand-written
  * `WHERE pk > ? AND pk <= ?` batching, distributed.
  */
object DerbyStage {

  // Keep Derby's log out of the repo / cwd.
  System.setProperty("derby.stream.error.file", "/tmp/graft_derby.log")

  val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  def url(dbDir: String): String = s"jdbc:derby:$dbDir;create=true"

  /** Write `df` into an embedded Derby table (drop-and-recreate) and
    * return the JDBC url to read it back with. The write itself is
    * Spark's distributed JDBC sink: each partition inserts its rows
    * over its own connection in `batchsize` batches. */
  def stage(df: DataFrame, dbDir: String, table: String): String = {
    val u = url(dbDir)
    df.write.mode(SaveMode.Overwrite)
      .format("jdbc")
      .option("url", u)
      .option("driver", driver)
      .option("dbtable", table)
      .option("batchsize", "10000")
      .save()
    u
  }

  /** Ranged, partitioned JDBC read of a staged table: Spark plans
    * `numPartitions` concurrent stride reads over `pkCol`. */
  def readRanged(s: SparkSession, dbUrl: String, table: String, pkCol: String,
                 lower: Long, upper: Long, numPartitions: Int): DataFrame =
    JdbcRangedSource.read(s,
      JdbcRangedSource.options(dbUrl, table, pkCol, lower, upper, numPartitions) +
        ("driver" -> driver))
}
