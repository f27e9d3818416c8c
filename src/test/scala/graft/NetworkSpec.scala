package graft

import org.apache.spark.sql.functions._

/** Invariants for the network-analytics pack (oracle equivalence is
  * the driver gate; these recompute the graph math independently on
  * the driver over the bounded relations). */
class NetworkSpec extends SparkSpec {

  test("assortativity matches a driver-side Pearson recompute over the edge list") {
    val out = queries.Network.assortativity(spark, sfDir).collect()
    assert(out.length == 1)
    val edges = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val dp = edges.groupBy(_._1).map { case (k, v) => k -> v.length }
    val ds = edges.groupBy(_._2).map { case (k, v) => k -> v.length }
    val xs = edges.map(e => (dp(e._1).toDouble, ds(e._2).toDouble))
    val n = xs.length.toDouble
    val (sx, sy) = (xs.map(_._1).sum, xs.map(_._2).sum)
    val sxy = xs.map(p => p._1 * p._2).sum
    val sxx = xs.map(p => p._1 * p._1).sum
    val syy = xs.map(p => p._2 * p._2).sum
    val want = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    val r = out.head
    assert(r.getLong(0) == edges.length)
    assert(math.abs(r.getDouble(3) - want) <= 1e-6,
      s"assortativity ${r.getDouble(3)} != $want")
    assert(r.getDouble(3) >= -1.0 && r.getDouble(3) <= 1.0)
  }

  test("hits: normalization pins the max score to 1.0 and an exact integer replay agrees") {
    val out = queries.Network.hits(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(1)).max == 1000000000000L, "hub max-normalized")
    assert(out.map(_.getLong(2)).max == 1000000000000L, "authority max-normalized")
    out.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 1000000000000L)
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 1000000000000L)
    }
    // exact integer replay of the fixed-point iteration on the driver
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey"))
    val w = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey"), col("s_nationkey")).count()
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
    val wtot = w.map(_._2).sum
    val share = w.map { case (k, v) => (k, v * 1000000L / wtot) }
    val nodes = Tables.nation(spark, sfDir)
      .select(col("n_nationkey")).collect().map(_.getInt(0))
    var h = nodes.map(_ -> 1000000000000L).toMap
    var a = Map.empty[Int, Long]
    def norm(raw: Map[Int, Long]): Map[Int, Long] = {
      val mx = if (raw.isEmpty) 0L else raw.values.max
      nodes.map(n => n -> (if (mx <= 0) 0L
        else (BigInt(raw.getOrElse(n, 0L)) * 1000000000000L / mx).toLong)).toMap
    }
    for (_ <- 1 to 4) {
      a = norm(share.groupBy(_._1._2).map { case (d, es) =>
        d -> es.map(e => e._2 * h(e._1._1) / 1000000L).sum })
      h = norm(share.groupBy(_._1._1).map { case (s0, es) =>
        s0 -> es.map(e => e._2 * a(e._1._2) / 1000000L).sum })
    }
    out.foreach { r =>
      val n = r.getInt(0)
      assert(r.getLong(1) == h(n), s"hub($n): ${r.getLong(1)} != ${h(n)}")
      assert(r.getLong(2) == a(n), s"auth($n): ${r.getLong(2)} != ${a(n)}")
    }
  }

  test("label propagation: exact integer replay of the synchronous rounds agrees") {
    val out = queries.Network.labelProp(spark, sfDir).collect()
    assert(out.nonEmpty)
    val und = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sfDir),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(least(col("c_nationkey"), col("s_nationkey")).as("u"),
        greatest(col("c_nationkey"), col("s_nationkey")).as("v"))
      .count()
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val adj = und.flatMap { case (u, v, w) => Seq((u, v, w), (v, u, w)) }
    val nodes = Tables.nation(spark, sfDir)
      .select(col("n_nationkey")).collect().map(_.getInt(0))
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 1 to 4) {
      val votes = scala.collection.mutable.Map
        .empty[(Int, Int), Long].withDefaultValue(0L)
      adj.foreach { case (n, nb, w) => votes((n, lab(nb))) += w }
      nodes.foreach(n => votes((n, lab(n))) += 1L)
      lab = votes.toSeq.groupBy(_._1._1).map { case (n, vs) =>
        val best = vs.map { case ((_, l), w) => w * 128 + (127 - l) }.max
        n -> (127 - (best % 128)).toInt
      }
    }
    val sizes = lab.values.groupBy(identity).map { case (l, xs) => l -> xs.size }
    out.foreach { r =>
      val n = r.getInt(0)
      assert(r.getInt(1) == lab(n), s"community($n): ${r.getInt(1)} != ${lab(n)}")
      assert(r.getLong(2) == sizes(lab(n)).toLong)
    }
  }

  test("modularity: degree conservation and the ALL row sums the region contributions") {
    val out = queries.Network.modularity(spark, sfDir).collect()
    val (all, regions) = out.partition(_.getInt(0) == -1)
    assert(all.length == 1 && regions.length == 5)
    // every region's intra weight is part of its degree
    regions.foreach(r => assert(r.getLong(2) <= r.getLong(3),
      s"${r.getString(1)}: intra2 > degree"))
    // ALL row aggregates the regions
    assert(all.head.getLong(2) == regions.map(_.getLong(2)).sum)
    assert(all.head.getLong(3) == regions.map(_.getLong(3)).sum)
    assert(math.abs(all.head.getDouble(4) -
      regions.map(_.getDouble(4)).sum) <= 1e-8)
    // modularity of any partition is <= 1 and > -1
    assert(all.head.getDouble(4) > -1.0 && all.head.getDouble(4) <= 1.0)
    // driver recompute of Q from the emitted per-region stats
    val m2 = all.head.getLong(3).toDouble
    val want = regions.map { r =>
      r.getLong(2) * m2 - r.getLong(3).toDouble * r.getLong(3)
    }.sum / (m2 * m2)
    assert(math.abs(all.head.getDouble(4) - want) <= 1e-6,
      s"Q ${all.head.getDouble(4)} != $want")
  }
}
