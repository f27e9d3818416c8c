package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pure-JVM model checks for the algebraic kernels (no Spark session):
  * TopKPairs must equal sort-take-k under any reduce/merge split, and
  * power iteration must find the dominant eigenvector. Generators are
  * driven directly with fixed seeds (the scalatestplus bridge isn't in
  * the offline cache — the PropertySpec convention). */
class KernelSpec extends AnyFunSuite {

  private def model(xs: Seq[(Long, Long)], k: Int): Seq[(Int, Long, Long)] =
    xs.sortBy { case (v, id) => (-v, id) }.take(k)
      .zipWithIndex.map { case ((v, id), i) => (i + 1, v, id) }

  test("TopKPairs equals sort-take-k under arbitrary reduce/merge splits") {
    val pair = for {
      v <- Gen.chooseNum(-100L, 100L)
      id <- Gen.chooseNum(0L, 1000L)
    } yield (v, id)
    val caseGen = for {
      xs <- Gen.listOf(pair)
      k <- Gen.chooseNum(1, 8)
      chunk <- Gen.chooseNum(1, 11)
    } yield (xs.distinctBy(_._2), k, chunk) // ids unique per group, the query contract
    (1 to 200).foreach { i =>
      val (xs, k, chunk) = caseGen(Gen.Parameters.default, Seed(i.toLong)).get
      val agg = new graft.operators.TopKPairs(k)
      // split into chunks, reduce each, merge pairwise — the shape
      // Spark's partial/final aggregation produces
      val chunks = if (xs.isEmpty) Seq(Seq.empty[(Long, Long)])
        else xs.grouped(chunk).toSeq
      val merged = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
        .reduce(agg.merge)
      assert(agg.finish(merged) == model(xs, k),
        s"seed=$i k=$k chunk=$chunk xs=$xs")
    }
  }

  test("power iteration finds the dominant eigenvector of a diagonal matrix") {
    // diag(5, 2, 1) as upper-triangle triples → component must be +e1
    val v = graft.operators.Pca.topComponent(3,
      Seq((1, 1, 5.0), (2, 2, 2.0), (3, 3, 1.0)), iters = 60)
    assert(math.abs(v(0)) > 0.999 && math.abs(v(1)) < 0.03 && math.abs(v(2)) < 0.03,
      v.toSeq.toString)
    assert(v(0) > 0) // sign convention: leading non-zero component positive
  }

  test("power iteration is rotation-consistent on a known 2x2") {
    // [[2, 1], [1, 2]] has dominant eigenvector (1, 1)/sqrt(2), eigenvalue 3
    val v = graft.operators.Pca.topComponent(2,
      Seq((1, 1, 2.0), (1, 2, 1.0), (2, 2, 2.0)), iters = 60)
    assert(math.abs(v(0) - v(1)) < 1e-9, v.toSeq.toString)
    assert(math.abs(v(0) - 1.0 / math.sqrt(2.0)) < 1e-9)
  }

  test("hilbert_key coarse lattice: injective, in range, unit-step adjacent") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    // the defining Hilbert property (which Z-order lacks): on the
    // 16×16 stride-4096 lattice, sorting by key must visit the cells
    // in a path whose every step is one grid-adjacent move — this is
    // exactly the test that caught the s-1-x (vs n-1-x) reflection
    // bug the SQL oracle was blind to (it replays the same rounds)
    val rows = for (i <- 0 until 16; j <- 0 until 16) yield {
      val k = graft.functions.HilbertKey(Literal(i * 4096L), Literal(j * 4096L))
        .eval(null).asInstanceOf[Long]
      (i * 4096L, j * 4096L, k)
    }
    assert(rows.map(_._3).distinct.size == 256, "keys must be injective")
    assert(rows.forall(r => r._3 >= 0L && r._3 < (1L << 32)), "keys in [0, 2^32)")
    val sorted = rows.sortBy(_._3)
    sorted.sliding(2).foreach { case Seq((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 4096L,
        s"non-adjacent consecutive keys: ($x1,$y1) -> ($x2,$y2)")
    }
  }
}
