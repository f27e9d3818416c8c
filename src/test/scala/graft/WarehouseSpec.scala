package graft

import org.apache.spark.sql.functions._
import graft.queries.Warehouse

/** Structural invariants of the warehouse/corpus-assembly pack — the
  * properties that must hold no matter the data, complementing the
  * value-exact oracle rows. */
class WarehouseSpec extends SparkSpec {

  test("scd2: per-user intervals chain without gaps and close exactly once") {
    val rows = Warehouse.scd2Build(spark, sfDir)
      .select(col("user_id"), col("valid_from"), col("valid_to"), col("is_current"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, ivs) =>
      val sorted = ivs.sortBy(_._2)
      // each interval closes where the next opens; only the last is open
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a._3 == b._2, s"gap: ${a._3} != ${b._2}")
        assert(!a._4)
      }
      assert(sorted.last._4 && sorted.last._3 == 9999999999L)
      assert(sorted.count(_._4) == 1)
    }
  }

  test("basket rules: measures are consistent with their integer counts") {
    // lowered min-count: the spec fixture (sf0.001) has ~1500 baskets
    val rows = Warehouse.basketRules(spark, sfDir, minCount = 2L).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nab, sup, conf, lift) =
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(nab >= 2)
      assert(sup > 0 && sup <= 1.0)
      assert(conf >= sup - 1e-12 && conf <= 1.0) // n_a <= n_orders
      assert(lift > 0)
    }
  }

  test("dict redaction removes every denylist word it counted") {
    val rows = Warehouse.dictRedact(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val deny = "\\b(customer|key|value)\\b".r
    rows.foreach { r =>
      assert(r.getInt(1) > 0)
      assert(deny.findFirstIn(r.getString(2)).isEmpty,
        s"denylist word survived in: ${r.getString(2)}")
    }
  }

  test("chi2 cells cover the corpus with nonnegative contributions") {
    val rows = Warehouse.chi2Independence(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(2)).sum ==
      Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getDouble(3) > 0)           // expected count
      assert(r.getDouble(4) >= 0)          // chi2 term
    }
  }

  test("fk audit checks every edge and finds the fixture intact") {
    val rows = Warehouse.fkAudit(spark, sfDir).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"${r.getString(0)} checked no rows")
      assert(r.getLong(2) == 0, s"${r.getString(0)} has orphans")
    }
  }

  test("pagerank conserves (truncated) mass and ranks every nation") {
    val rows = Warehouse.pagerankNations(spark, sfDir).collect()
    assert(rows.length == 25)
    val total = rows.map(_.getLong(1)).sum
    // integer truncation only loses mass, never creates it
    assert(total <= 1000000000000L && total > 900000000000L, s"total=$total")
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) > 0 && r.getDouble(2) < 1)
    }
  }

  test("psi bins cover both eras and terms are finite and nonnegative") {
    val rows = Warehouse.psiDrift(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // bins cover every order exactly once, per era
    val eras = Tables.orders(spark, sfDir)
      .agg(sum(when(year(col("o_orderdate")) <= 1997, 1L).otherwise(0L)),
        sum(when(year(col("o_orderdate")) > 1997, 1L).otherwise(0L))).head()
    assert(rows.map(_.getLong(1)).sum == eras.getLong(0))
    assert(rows.map(_.getLong(2)).sum == eras.getLong(1))
    rows.foreach { r =>
      // (p-q)·ln(p/q) ≥ 0 always (same sign); Laplace keeps it finite
      assert(r.getDouble(3) >= 0 && !r.getDouble(3).isInfinite)
    }
  }

  test("triangles: membership counts are multiples-of-3 in total and bounded") {
    val rows = Warehouse.triangleNations(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // every triangle contributes exactly 3 memberships
    assert(rows.map(_.getLong(1)).sum % 3 == 0)
    // a nation can be in at most C(24,2) triangles of a 25-node graph
    rows.foreach(r => assert(r.getLong(1) > 0 && r.getLong(1) <= 276))
  }

  test("zorder morton code decodes back to both dimensions exactly") {
    val rows = Warehouse.zorderKey(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cust, day, m) = (r.getLong(1), r.getLong(2), r.getLong(3))
      var (bx, by) = (0L, 0L)
      for (j <- 0 until 16) {
        bx |= ((m >> (2 * j)) & 1L) << j
        by |= ((m >> (2 * j + 1)) & 1L) << j
      }
      assert(bx == (cust & 65535L) && by == (day & 65535L),
        s"morton $m decodes to ($bx,$by), want (${cust & 65535L},${day & 65535L})")
    }
  }

  test("doc packing partitions the corpus in doc_id order") {
    val packs = Warehouse.docPacking(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("bigint").as("n"))
      .agg(count(lit(1)), sum(col("n"))).head()
    assert(packs.map(_._2).sum == docs.getLong(0))  // every doc in exactly one pack
    assert(packs.map(_._3).sum == docs.getLong(1))  // token totals conserved
    val sorted = packs.sortBy(_._1)
    assert(sorted.map(_._1).toSeq == sorted.indices.map(_ + sorted.head._1).toSeq)
    sorted.zip(sorted.tail).foreach { case (a, b) =>
      assert(a._5 < b._4, "pack doc ranges overlap") // last_doc(p) < first_doc(p+1)
    }
  }
}
