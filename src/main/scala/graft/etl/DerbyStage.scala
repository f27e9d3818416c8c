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
object DerbyStage extends JdbcStage {

  // Keep Derby's log out of the repo / cwd.
  System.setProperty("derby.stream.error.file", "/tmp/graft_derby.log")

  val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  def url(dbDir: String): String = s"jdbc:derby:$dbDir;create=true"
}
