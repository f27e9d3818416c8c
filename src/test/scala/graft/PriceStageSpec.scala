package graft

import graft.queries.PriceStage

/** Pins the staged cumulative price census (PriceStage) against the
  * explicit formulations it replaced for the percentile family: the
  * census columns must replay a local exact recompute from the fact
  * rows, and "value at rank t" read off cwc must equal the former
  * row_number-style ranking — the invariant q_percentile_disc /
  * q_winsorize / q_weighted_percentile now rest on. */
class PriceStageSpec extends SparkSpec {

  private lazy val fact = Tables.lineitem(spark, sfDir)
    .select("l_returnflag", "l_extendedprice", "l_quantity")
    .collect()
    .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2).toLong))

  private lazy val census = PriceStage.census(spark, sfDir).collect().map { r =>
    (r.getAs[String]("l_returnflag"), r.getAs[Double]("l_extendedprice")) ->
      (r.getAs[Long]("c"), r.getAs[Long]("w"), r.getAs[Long]("cwc"),
        r.getAs[Long]("cww"), r.getAs[Long]("nt"), r.getAs[Long]("wt"))
  }.toMap

  test("census replays a local exact recompute of counts and cumulatives") {
    val byFlag = fact.groupBy(_._1)
    var checked = 0
    byFlag.foreach { case (flag, rows) =>
      val byPrice = rows.groupBy(_._2).toSeq.sortBy(_._1)
      val nt = rows.length.toLong
      val wt = rows.map(_._3).sum
      var cwc = 0L
      var cww = 0L
      byPrice.foreach { case (price, prows) =>
        val c = prows.length.toLong
        val w = prows.map(_._3).sum
        cwc += c
        cww += w
        assert(census((flag, price)) == ((c, w, cwc, cww, nt, wt)),
          s"census row mismatch at ($flag, $price)")
        checked += 1
      }
    }
    assert(checked == census.size, "census has rows the fact table lacks")
    assert(checked > 100) // non-trivial fixture
  }

  test("value at rank ceil(n*q) via cwc equals explicit row_number ranking") {
    val byFlag = fact.groupBy(_._1)
    for (q <- Seq(0.05, 0.5, 0.9, 0.95); (flag, rows) <- byFlag) {
      val sorted = rows.map(_._2).sorted
      val t = math.ceil(sorted.length * q).toLong
      val expected = sorted((t - 1).toInt) // the former rank-t row value
      val got = census.collect {
        case ((f, p), (_, _, cwc, _, _, _)) if f == flag && cwc >= t => p
      }.min
      assert(got == expected, s"rank-$t cut mismatch for flag $flag at q=$q")
    }
  }

  test("weighted value at cumulative weight t via cww equals a local scan") {
    val byFlag = fact.groupBy(_._1)
    byFlag.foreach { case (flag, rows) =>
      val wt = rows.map(_._3).sum
      for (num <- Seq(1L, 2L, 3L); den = 4L) {
        val t = (wt * num + den - 1) / den // any mid-range threshold works
        var acc = 0L
        val expected = rows.groupBy(_._2).toSeq.sortBy(_._1).iterator
          .map { case (p, prs) => acc += prs.map(_._3).sum; (p, acc) }
          .collectFirst { case (p, cw) if cw >= t => p }.get
        val got = census.collect {
          case ((f, p), (_, _, _, cww, _, _)) if f == flag && cww >= t => p
        }.min
        assert(got == expected, s"weighted cut mismatch for flag $flag, t=$t")
      }
    }
  }
}
