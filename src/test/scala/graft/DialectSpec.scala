package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SourceDialects

/** Pins the coded MSSQL/MySQL dialect surface (etl.SourceDialects) to
  * the rows MIGRATION.md "Source dialects" records from the public
  * Spark JDBC dialects — every day-one caveat row is an assertion
  * here, so the doc and the code cannot drift. The live JDBC
  * mechanics (striding, pushdown, crash/resume, quoting) run against
  * embedded Derby in EtlSpec/SourceSpec; these are the engine-specific
  * halves no offline jar can exercise. */
class DialectSpec extends AnyFunSuite {

  test("MSSQL day-one type rows (datetime2, money, bit, tinyint, datetimeoffset)") {
    import SourceDialects.mssqlCatalystType
    assert(mssqlCatalystType("datetime2").contains(TimestampType))
    assert(mssqlCatalystType("smalldatetime").contains(TimestampType))
    // offset is lost if read as timestamp — must stay text
    assert(mssqlCatalystType("datetimeoffset").contains(StringType))
    assert(mssqlCatalystType("money").contains(DecimalType(19, 4)))
    assert(mssqlCatalystType("smallmoney").contains(DecimalType(10, 4)))
    assert(mssqlCatalystType("bit").contains(BooleanType))
    // MSSQL tinyint is UNSIGNED 0–255: a signed byte would overflow at 128
    assert(mssqlCatalystType("tinyint").contains(ShortType))
    assert(mssqlCatalystType("uniqueidentifier").contains(StringType))
    assert(mssqlCatalystType("DECIMAL(12, 3)").contains(DecimalType(12, 3)))
    // scale-less declarations take the ENGINE's defaults, never (38,18):
    // bare DECIMAL is (18,0) on MSSQL, DECIMAL(10) means scale 0
    assert(mssqlCatalystType("decimal").contains(DecimalType(18, 0)))
    assert(mssqlCatalystType("decimal(10)").contains(DecimalType(10, 0)))
    assert(mssqlCatalystType("decimal(oops)").isEmpty) // malformed = loud None
    assert(mssqlCatalystType("nvarchar(255)").contains(StringType))
    assert(mssqlCatalystType("varbinary(max)").contains(BinaryType))
    assert(mssqlCatalystType("geography").isEmpty) // uncertified = loud None
  }

  test("MySQL day-one type rows (TINYINT(1), unsigned widths, YEAR, ENUM)") {
    import SourceDialects.mysqlCatalystType
    // the classic boolean surprise
    assert(mysqlCatalystType("TINYINT(1)").contains(BooleanType))
    assert(mysqlCatalystType("tinyint(4)").contains(ByteType))
    // each unsigned width needs the NEXT wider Spark type
    assert(mysqlCatalystType("tinyint unsigned").contains(ShortType))
    assert(mysqlCatalystType("smallint unsigned").contains(IntegerType))
    assert(mysqlCatalystType("int unsigned").contains(LongType))
    assert(mysqlCatalystType("bigint unsigned").contains(DecimalType(20, 0)))
    assert(mysqlCatalystType("bigint").contains(LongType))
    assert(mysqlCatalystType("datetime").contains(TimestampType))
    assert(mysqlCatalystType("timestamp").contains(TimestampType))
    assert(mysqlCatalystType("year").contains(DateType))
    assert(mysqlCatalystType("enum('a','b')").contains(StringType))
    assert(mysqlCatalystType("set('x','y')").contains(StringType))
    assert(mysqlCatalystType("longblob").contains(BinaryType))
    assert(mysqlCatalystType("geometry").isEmpty)
    // bare MySQL DECIMAL defaults to (10,0); a bare precision to scale 0
    assert(mysqlCatalystType("decimal").contains(DecimalType(10, 0)))
    assert(mysqlCatalystType("numeric(7)").contains(DecimalType(7, 0)))
  }

  test("destination type map is total over every staged Catalyst type") {
    import SourceDialects.{destinationType, mssqlCatalystType, mysqlCatalystType}
    // every type either dialect can certify must map to a destination
    // name — no silent STRING fallback, no hole
    val staged = Seq(
      "bit", "tinyint", "smallint", "int", "bigint", "money", "smallmoney",
      "decimal(10,2)", "real", "float", "date", "datetime2",
      "datetimeoffset", "uniqueidentifier", "varchar(10)", "varbinary(8)")
      .flatMap(mssqlCatalystType) ++ Seq(
      "tinyint(1)", "tinyint", "int unsigned", "bigint unsigned", "year",
      "enum('a')", "longblob", "double", "datetime")
      .flatMap(mysqlCatalystType)
    staged.foreach(dt =>
      assert(destinationType(dt).nonEmpty, s"no destination name for $dt"))
    assert(destinationType(LongType).contains("INTEGER"))
    assert(destinationType(DecimalType(20, 0)).contains("NUMERIC"))
    assert(destinationType(BooleanType).contains("BOOLEAN"))
    assert(destinationType(CalendarIntervalType).isEmpty) // unstageable = None
  }

  test("identifier quoting and frontier SQL per dialect") {
    import SourceDialects.{frontierSql, quoteIdentifier}
    assert(quoteIdentifier("mssql", "My]Table") == "[My]]Table]")
    assert(quoteIdentifier("mysql", "my`table") == "`my``table`")
    assert(quoteIdentifier("derby", "Mixed\"Case") == "\"Mixed\"\"Case\"")
    assert(frontierSql("mssql", "orders", "id", 10, 20) ==
      "SELECT * FROM [orders] WHERE [id] > 10 AND [id] <= 20")
    assert(frontierSql("mysql", "orders", "id", 10, 20) ==
      "SELECT * FROM `orders` WHERE `id` > 10 AND `id` <= 20")
    assert(frontierSql("derby", "orders", "id", 0, 5) ==
      "SELECT * FROM \"orders\" WHERE \"id\" > 0 AND \"id\" <= 5")
  }

  test("DuckDB dialect rows (the LIVE second engine's day-one quirks)") {
    // These two rows are not prose: each broke the live wire before
    // the dialect fixed it (DuckDbStageSpec + q_jdbc_duckdb exercise
    // them end-to-end; this pins the mapping functions themselves).
    import graft.etl.DuckDbDialect
    assert(DuckDbDialect.canHandle("jdbc:duckdb:/tmp/x.duckdb"))
    assert(!DuckDbDialect.canHandle("jdbc:derby:/tmp/x"))
    // Spark 4's tableExists RETHROWS unless the dialect recognizes the
    // engine's not-found error; DuckDB sets no SQLState, so the match
    // is on the message
    assert(DuckDbDialect.isObjectNotFoundException(
      new java.sql.SQLException("Catalog Error: Table with name t does not exist!")))
    assert(!DuckDbDialect.isObjectNotFoundException(
      new java.sql.SQLException("IO Error: disk full")))
    // DuckDB's JDBC metadata reports BIGINT/INTEGER unsigned; the
    // default mapping widens to DECIMAL(20,0)/LONG and breaks
    // bit-exact round-trips
    val md = new org.apache.spark.sql.types.MetadataBuilder
    assert(DuckDbDialect.getCatalystType(java.sql.Types.BIGINT, "BIGINT", 0, md)
      .contains(LongType))
    assert(DuckDbDialect.getCatalystType(java.sql.Types.INTEGER, "INTEGER", 0, md)
      .contains(IntegerType))
    // unsigned/huge variants keep the default (widened) mapping
    assert(DuckDbDialect.getCatalystType(java.sql.Types.BIGINT, "UBIGINT", 0, md).isEmpty)
    assert(DuckDbDialect.getCatalystType(java.sql.Types.BIGINT, "HUGEINT", 0, md).isEmpty)
  }
}
