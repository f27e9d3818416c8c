package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

/** Pins closed-form statistics and graph algorithms to EXTERNAL ground
  * truth — textbook worked examples hand-computed from the published
  * definitions on tiny crafted fixtures — the guard the DuckDB oracle
  * gate structurally cannot provide when the same hand authors both
  * engines' formulas (the round-13 Kruskal-Wallis /4 bug hash-matched
  * for 13 rounds because the oracle SQL mirrored the same mistake).
  * Convention per pin: build a fixture whose expected output is
  * derivable by hand from the DEFINITION (cited in the comment), run
  * the registered query function, assert the exact constants.
  * InferSpec holds the Kruskal-Wallis pins; this spec sweeps the rest
  * of the registry's closed-form statistics. */
class FormulaPinSpec extends SparkSpec {
  import spark.implicits._

  /** Write one table into a fresh fixture dir. Returns the dir; call
    * again with the same dir to add further tables. */
  private def fixture(tables: (String, DataFrame)*): String = {
    val dir = Files.createTempDirectory("formulapin").toString
    tables.foreach { case (name, df) =>
      df.coalesce(1).write.parquet(s"$dir/$name.parquet")
    }
    dir
  }

  // -------------------------------------------------------------------------
  // W45 k-core (distributed peel). Graph: triangle {1,2,3} plus the
  // tail 3-4-5-6. By definition (Seidman 1983), the 2-core is the
  // maximal subgraph with all degrees >= 2: peeling removes 6 (deg 1),
  // then 5, then 4 — three genuine peel rounds plus the confirming
  // round — leaving exactly the triangle with within-core degree 2.
  // This also exercises the loop's scale posture: the alive set stays
  // a distributed relation for all four rounds (no driver collect).
  // -------------------------------------------------------------------------
  test("k-core: triangle+tail peels to the triangle over 3 rounds (Seidman)") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    // one order per customer; each edge contributes 3 unique shared
    // parts to BOTH endpoints, so shared-distinct-parts(u,v) = 3 for
    // exactly the edge pairs and 0 otherwise (minShared = 3)
    val custs = (1L to 6L).map(c => (c, "BUILDING"))
    val orders = (1L to 6L).map(c => (c, c)) // o_orderkey = o_custkey
    val items = edges.zipWithIndex.flatMap { case ((u, v), e) =>
      (1 to 3).flatMap(i => Seq((u, e * 10L + i), (v, e * 10L + i)))
    }
    val dir = fixture(
      "customer" -> custs.toDF("c_custkey", "c_mktsegment"),
      "orders" -> orders.toDF("o_orderkey", "o_custkey"),
      "lineitem" -> items.toDF("l_orderkey", "l_partkey"))
    val out = queries.Train.kcore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 2L)),
      s"2-core must be the triangle with degree 2, got ${out.toSeq}")
  }

  test("k-core: a pure path has an empty 2-core (full peel-out)") {
    // path 1-2-3-4-5: ends peel first, the middle follows — the
    // definitional degenerate case (no subgraph with min degree 2)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val custs = (1L to 5L).map(c => (c, "BUILDING"))
    val orders = (1L to 5L).map(c => (c, c))
    val items = edges.zipWithIndex.flatMap { case ((u, v), e) =>
      (1 to 3).flatMap(i => Seq((u, e * 10L + i), (v, e * 10L + i)))
    }
    val dir = fixture(
      "customer" -> custs.toDF("c_custkey", "c_mktsegment"),
      "orders" -> orders.toDF("o_orderkey", "o_custkey"),
      "lineitem" -> items.toDF("l_orderkey", "l_partkey"))
    assert(queries.Train.kcore(spark, dir).collect().isEmpty)
  }
}
