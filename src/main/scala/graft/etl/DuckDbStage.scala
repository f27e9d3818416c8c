package graft.etl

import java.sql.{Connection, Driver, DriverPropertyInfo}
import java.util.Properties
import java.util.logging.Logger

/** java.sql.Driver shim for a JDBC driver loaded from a jar OUTSIDE
  * the application classpath — the classic DriverManager pattern:
  * DriverManager refuses to hand out drivers whose class the calling
  * classloader cannot see, and Spark's JDBC source instantiates the
  * driver class by NAME on both the planning path and each task, so a
  * thin delegate that IS on the application classpath fronts the
  * URLClassLoader-loaded driver. The delegate is process-global
  * (local-mode tasks share the JVM; on a real cluster the jar ships
  * via --jars and no shim is needed). */
final class DriverShim extends Driver {
  private def d: Driver = DriverShim.delegate.getOrElse(
    throw new IllegalStateException(
      "DriverShim.delegate not initialized — call DuckDbStage.ensureLoaded()"))
  override def connect(url: String, info: Properties): Connection =
    if (acceptsURL(url)) d.connect(url, info) else null
  override def acceptsURL(url: String): Boolean =
    DriverShim.delegate.exists(_.acceptsURL(url))
  override def getPropertyInfo(url: String,
                               info: Properties): Array[DriverPropertyInfo] =
    d.getPropertyInfo(url, info)
  override def getMajorVersion: Int = d.getMajorVersion
  override def getMinorVersion: Int = d.getMinorVersion
  override def jdbcCompliant(): Boolean = d.jdbcCompliant()
  override def getParentLogger: Logger = d.getParentLogger
}

object DriverShim {
  @volatile private[etl] var delegate: Option[Driver] = None
}

/** Own Spark JDBC dialect for DuckDB — Spark ships none, and without
  * one Spark 4's `JdbcUtils.tableExists` RETHROWS the probe's
  * "Catalog Error: Table … does not exist" instead of reading it as
  * not-found (the default dialect's `isObjectNotFoundException` only
  * recognizes SQLState-carrying engines; DuckDB's JDBC sets none), so
  * every first write to a fresh database fails. Registered once by
  * [[DuckDbStage.ensureLoaded]] via the public
  * `JdbcDialects.registerDialect` extension point. Identifier quoting
  * and type mapping inherit the defaults (double-quoted identifiers
  * and ANSI types, both of which DuckDB speaks natively). */
object DuckDbDialect extends org.apache.spark.sql.jdbc.JdbcDialect {
  override def canHandle(url: String): Boolean =
    url.startsWith("jdbc:duckdb:")
  override def isObjectNotFoundException(e: java.sql.SQLException): Boolean = {
    // DuckDB phrases schema/column/catalog errors with the same "does
    // not exist" tail, so require the table-not-found shape ("Catalog
    // Error" + "Table") — a genuine failure during the exists-probe
    // must surface, not be masked as "missing table".
    val m = e.getMessage
    m != null && m.contains("does not exist") &&
      m.contains("Catalog Error") && m.contains("Table")
  }
  /** DuckDB's ResultSetMetaData reports BIGINT columns as unsigned, so
    * Spark's default mapping widens them to DECIMAL(20,0) and a staged
    * LongType fails to round-trip bit-for-bit — the same day-one type
    * quirk class SourceDialects records for MSSQL/MySQL, here fixed on
    * a live wire. INTEGER has the same quirk one width down. */
  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
      md: org.apache.spark.sql.types.MetadataBuilder)
      : Option[org.apache.spark.sql.types.DataType] =
    (sqlType, typeName) match {
      case (java.sql.Types.BIGINT, "BIGINT") =>
        Some(org.apache.spark.sql.types.LongType)
      case (java.sql.Types.INTEGER, "INTEGER") =>
        Some(org.apache.spark.sql.types.IntegerType)
      case _ => None
    }
}

/** SECOND live JDBC engine under [[JdbcStage]] (ref A1/A7 — the
  * reference supports multiple RDBMS sources; SURVEY.md §2A): DuckDB
  * over its public JDBC driver (org.duckdb:duckdb_jdbc, file-backed,
  * in-process — the same embedded shape as Derby but a columnar
  * engine with a different SQL dialect, type system, and identifier
  * folding). The jar is not a build dependency: [[ensureLoaded]]
  * discovers it in the local artifact caches at runtime (filename
  * glob — no repository layout assumed) and fronts it with
  * [[DriverShim]], so the trait's whole stage/stride/pushdown surface
  * runs against a second real engine when the jar is present and the
  * spec cancels cleanly when it is not. */
object DuckDbStage extends JdbcStage {

  val driver: String = classOf[DriverShim].getName

  def url(dbDir: String): String = {
    new java.io.File(dbDir).mkdirs()
    s"jdbc:duckdb:$dbDir/stage.duckdb"
  }

  /** Locate the DuckDB JDBC jar, load org.duckdb.DuckDBDriver through
    * a URLClassLoader, and point the shim at it. Returns false when no
    * jar is present. Idempotent. */
  def ensureLoaded(): Boolean = synchronized {
    if (DriverShim.delegate.exists(_.getClass.getName.startsWith("org.duckdb")))
      true
    else findJar() match {
      case None => false
      case Some(jar) =>
        val cl = new java.net.URLClassLoader(Array(jar.toURI.toURL),
          getClass.getClassLoader)
        val drv = Class.forName("org.duckdb.DuckDBDriver", true, cl)
          .getDeclaredConstructor().newInstance().asInstanceOf[Driver]
        DriverShim.delegate = Some(drv)
        org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(DuckDbDialect)
        true
    }
  }

  /** Search order: explicit env override, then a bounded filename walk
    * of the conventional local artifact caches. */
  private def findJar(): Option[java.io.File] = {
    val explicit = sys.env.get("GRAFT_DUCKDB_JDBC_JAR")
      .map(new java.io.File(_)).filter(_.isFile)
    if (explicit.nonEmpty) return explicit
    val home = sys.props.getOrElse("user.home", "/root")
    Seq(s"$home/.cache/coursier", s"$home/.ivy2", s"$home/.m2")
      .map(java.nio.file.Paths.get(_)).filter(java.nio.file.Files.isDirectory(_))
      .iterator.flatMap { root =>
        val found = new scala.collection.mutable.ArrayBuffer[java.io.File]
        java.nio.file.Files.walkFileTree(root, new java.nio.file.SimpleFileVisitor[java.nio.file.Path] {
          override def visitFile(f: java.nio.file.Path,
                                 a: java.nio.file.attribute.BasicFileAttributes) = {
            val n = f.getFileName.toString
            if (n.startsWith("duckdb_jdbc") && n.endsWith(".jar"))
              found += f.toFile
            java.nio.file.FileVisitResult.CONTINUE
          }
          override def visitFileFailed(f: java.nio.file.Path, e: java.io.IOException) =
            java.nio.file.FileVisitResult.CONTINUE
        })
        // newest version wins — compare version segments numerically
        // (a lexicographic filename sort would rank 1.2.0 above 1.10.0)
        found.sortBy(f => versionKey(f.getName)).lastOption
      }.nextOption()
  }

  /** Numeric sort key for a jar filename: every digit run, in order,
    * as integers. "duckdb_jdbc-1.10.0.jar" → Seq(1, 10, 0). */
  private def versionKey(name: String): Seq[Int] =
    "\\d+".r.findAllIn(name).map(_.toInt).toSeq

  implicit private val seqIntOrdering: Ordering[Seq[Int]] =
    (a: Seq[Int], b: Seq[Int]) => {
      val cmp = a.zip(b).iterator.map { case (x, y) => x.compare(y) }
        .find(_ != 0).getOrElse(0)
      if (cmp != 0) cmp else a.length.compare(b.length)
    }
}
