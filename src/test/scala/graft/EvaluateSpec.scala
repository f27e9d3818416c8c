package graft

import org.apache.spark.sql.functions._

/** Invariants for the evaluation/estimation pack (oracle equivalence
  * is the driver gate; these pin the statistical semantics the oracle
  * can't see — each test recomputes the claim independently, usually
  * in plain driver-side arithmetic over the bounded relations). */
class EvaluateSpec extends SparkSpec {

  test("kendall tau matches a driver-side brute-force recompute and stays in [-1, 1]") {
    val out = queries.Evaluate.kendallTau(spark, sfDir).collect()
    assert(out.length == 3)
    // independent recompute from the monthly series itself
    val series = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), date_trunc("month", col("l_shipdate")))
      .agg(
        sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("bigint")).as("x"),
        sum((col("l_quantity").cast("decimal(18,2)") * 100)
          .cast("bigint")).as("y"))
      .collect()
      .groupBy(_.getString(0))
    out.foreach { r =>
      val flag = r.getString(0)
      val tau = r.getDouble(4)
      assert(tau >= -1.0 && tau <= 1.0, s"$flag: tau=$tau out of range")
      val pts = series(flag).map(row => (row.getLong(2), row.getLong(3)))
      var c = 0L; var d = 0L; var tx = 0L; var ty = 0L
      for (i <- pts.indices; j <- pts.indices if i < j) {
        val ((xa, ya), (xb, yb)) = (pts(i), pts(j))
        if (xa == xb) tx += 1
        if (ya == yb) ty += 1
        if ((xa < xb && ya < yb) || (xa > xb && ya > yb)) c += 1
        if ((xa < xb && ya > yb) || (xa > xb && ya < yb)) d += 1
      }
      val n0 = pts.length.toLong * (pts.length - 1) / 2
      val want =
        if (n0 - tx <= 0 || n0 - ty <= 0) 0.0
        else math.rint((c - d).toDouble /
          math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble) * 1e6) / 1e6
      assert(math.abs(tau - want) <= 1e-9, s"$flag: got $tau want $want")
    }
  }

  test("acf: every r_k within [-1, 1] by Cauchy-Schwarz, lags 1-6 per flag") {
    val out = queries.Evaluate.acf(spark, sfDir).collect()
    assert(out.length == 18, s"expected 3 flags x 6 lags, got ${out.length}")
    out.foreach { r =>
      val v = r.getDouble(3)
      assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9,
        s"${r.getString(0)} lag ${r.getInt(1)}: r=$v violates Cauchy-Schwarz")
    }
    // lag-1 revenue autocorrelation recompute (double arithmetic) per flag
    val series = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"),
        date_trunc("month", col("l_shipdate")).as("mon"))
      .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")).as("x"))
      .orderBy(col("l_returnflag"), col("mon"))
      .collect().groupBy(_.getString(0))
    out.filter(_.getInt(1) == 1).foreach { r =>
      val ys = series(r.getString(0)).map(_.getLong(2).toDouble)
      val mean = ys.sum / ys.length
      val cs = ys.map(_ - mean)
      val want = cs.zip(cs.tail).map { case (a, b) => a * b }.sum /
        cs.map(x => x * x).sum
      assert(math.abs(r.getDouble(3) - want) <= 1e-5,
        s"${r.getString(0)} lag1: got ${r.getDouble(3)} want ~$want")
    }
  }

  test("anova F matches a double-arithmetic recompute; Brown-Forsythe is scale-sane") {
    val a = queries.Evaluate.anova(spark, sfDir).collect()
    assert(a.length == 1)
    val groups = Tables.customer(spark, sfDir)
      .select(col("c_mktsegment"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("bigint"))
      .collect().groupBy(_.getString(0)).values
      .map(_.map(_.getLong(1).toDouble).toArray).toSeq
    val n = groups.map(_.length).sum
    val k = groups.size
    val grand = groups.map(_.sum).sum / n
    val ssb = groups.map(g => g.length * math.pow(g.sum / g.length - grand, 2)).sum
    val ssw = groups.map(g => { val m = g.sum / g.length; g.map(x => math.pow(x - m, 2)).sum }).sum
    val want = (ssb / (k - 1)) / (ssw / (n - k))
    val got = a.head.getDouble(4)
    assert(a.head.getLong(0) == k && a.head.getLong(1) == n)
    assert(math.abs(got - want) <= 1e-4 * math.max(1.0, math.abs(want)),
      s"F: got $got want ~$want")
    val bf = queries.Evaluate.brownForsythe(spark, sfDir).collect()
    assert(bf.length == 1 && bf.head.getLong(0) == k && bf.head.getLong(1) == n)
    assert(bf.head.getDouble(4) >= 0.0)
  }

  test("mrr: per-probe rr is 1/first_rel and the -1 row is their mean") {
    val out = queries.Evaluate.mrr(spark, sfDir).collect()
    val (mean, probes) = out.partition(_.getLong(0) == -1L)
    assert(mean.length == 1 && probes.length == 20)
    probes.foreach { r =>
      val fr = r.getInt(1)
      // emitted rr is rounded to 6 — mirror that in the recompute
      val want = if (fr == 0) 0.0
        else math.rint(math.floor(1e12 / fr) / 1e12 * 1e6) / 1e6
      assert(math.abs(r.getDouble(2) - want) <= 1e-9,
        s"probe ${r.getLong(0)}: rr ${r.getDouble(2)} != 1/$fr")
    }
    // mean of 6-rounded per-probe values vs the 6-rounded mean row:
    // both roundings contribute <= 5e-7 each
    val m = probes.map(_.getDouble(2)).sum / probes.length
    assert(math.abs(mean.head.getDouble(2) - m) <= 2e-6,
      s"mean row ${mean.head.getDouble(2)} vs recomputed $m")
  }

  test("precision/recall@5 are consistent counts over the ndcg fixture") {
    val out = queries.Evaluate.precisionAtK(spark, sfDir).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val nRel = r.getLong(1)
      assert(nRel >= 0 && nRel <= 5)
      assert(math.abs(r.getDouble(3) - nRel / 5.0) <= 1e-9)
      val denom = r.getLong(2)
      val wantRecall = if (denom <= 0) 0.0 else nRel.toDouble / denom
      assert(math.abs(r.getDouble(4) - wantRecall) <= 1e-6)
      assert(nRel <= math.max(denom, 0) || denom <= 0,
        s"probe ${r.getLong(0)}: found more relevant than exist")
    }
  }

  test("copeland: score identity and a tournament's conservation law") {
    val out = queries.Evaluate.copeland(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(3) == 2 * r.getLong(1) + r.getLong(2),
        s"${r.getString(0)}: copeland2 != 2*beats + ties")
    }
    // each unordered faced pair is (win, loss) or (tie, tie): total
    // beats*2 + ties must equal the number of ORDERED faced pairs
    val beats = out.map(_.getLong(1)).sum
    val ties = out.map(_.getLong(2)).sum
    val sources = out.length.toLong
    assert(2 * beats + ties == sources * (sources - 1),
      "conservation: every faced pair decides or ties exactly once")
    // ranks are 1..n in emitted order
    assert(out.map(_.getInt(4)).toSeq == (1 to out.length))
  }

  test("adamic-adar matches a driver recompute over the bounded nation graph") {
    val out = queries.Evaluate.adamicAdar(spark, sfDir).collect()
    assert(out.nonEmpty)
    // rebuild adjacency from the emitted is_edge pairs is insufficient
    // (pairs with no common neighbor are absent), so recompute edges
    // independently
    val edges = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sfDir),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .select(least(col("c_nationkey"), col("s_nationkey")),
        greatest(col("c_nationkey"), col("s_nationkey")))
      .distinct().collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    out.foreach { r =>
      val (u, v) = (r.getInt(0), r.getInt(1))
      val common = adj(u).intersect(adj(v))
        .filter(z => adj(z).size >= 2)
      assert(r.getLong(2) == common.size,
        s"($u,$v): n_common ${r.getLong(2)} != ${common.size}")
      val wantAa = common.toSeq
        .map(z => math.floor(1e12 / (math.log(adj(z).size) / math.log(2))))
        .sum
      assert(math.abs(r.getLong(3) - wantAa) <= common.size,
        s"($u,$v): aa_micro ${r.getLong(3)} != ~$wantAa")
      assert((r.getInt(4) == 1) == edges.contains((u, v)))
    }
  }

  test("readability: FRE recomputes from the emitted aggregate counts") {
    val out = queries.Evaluate.readability(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (w, s, y) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(w > 0 && s > 0 && y > 0)
      val want = math.rint(
        (206.835 - 1.015 * w.toDouble / s - 84.6 * y.toDouble / w) * 1e4) / 1e4
      assert(math.abs(r.getDouble(5) - want) <= 1e-9,
        s"${r.getString(0)}: fre ${r.getDouble(5)} != $want")
    }
  }

  test("horvitz-thompson: certainty stratum always sampled, estimate matches an independent recompute") {
    val out = queries.Evaluate.horvitzThompson(spark, sfDir).collect()
    assert(out.nonEmpty)
    // independent recompute with a different expression of the design
    val check = Tables.orders(spark, sfDir)
      .selectExpr("o_orderpriority",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents",
        "CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 8), 16, 10) AS BIGINT) % 10 AS coin")
      .selectExpr("o_orderpriority",
        """CASE WHEN cents >= 33000000 THEN cents
          |     WHEN cents >= 16500000 AND coin < 5 THEN 2 * cents
          |     WHEN cents < 16500000 AND coin < 1 THEN 10 * cents
          |     ELSE 0 END AS contrib""".stripMargin)
      .groupBy(col("o_orderpriority")).agg(sum(col("contrib")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "sampled can't exceed total")
      assert(r.getLong(4) == check(r.getString(0)),
        s"${r.getString(0)}: est ${r.getLong(4)} != ${check(r.getString(0))}")
      // the unequal-probability design should land near the truth
      assert(math.abs(r.getDouble(5)) < 0.5,
        s"${r.getString(0)}: rel_err ${r.getDouble(5)} implausibly large")
    }
  }

  test("jackknife ratio SE is positive and near the linearization SE") {
    val out = queries.Evaluate.jackknifeRatio(spark, sfDir).collect()
    assert(out.length == 3)
    // Taylor/linearization recompute: var(R) ~ sum((a_i - R b_i)^2)/Sb^2
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint"),
        (col("l_quantity").cast("decimal(18,2)") * 100).cast("bigint"))
      .collect().groupBy(_.getString(0))
    out.foreach { r =>
      val flag = r.getString(0)
      val se = r.getDouble(3)
      assert(se > 0, s"$flag: jackknife SE must be positive here")
      val data = rows(flag).map(x => (x.getLong(1).toDouble, x.getLong(2).toDouble))
      val (sa, sb) = (data.map(_._1).sum, data.map(_._2).sum)
      val rr = sa / sb
      assert(math.abs(r.getDouble(2) - math.rint(rr * 1e6) / 1e6) <= 1e-9)
      val lin = math.sqrt(data.map { case (a, b) =>
        val u = a - rr * b; u * u
      }.sum) / sb
      assert(se >= lin * 0.8 && se <= lin * 1.25,
        s"$flag: jackknife SE $se far from linearization $lin")
    }
  }

  test("hodges-lehmann matches a driver-side Walsh-average recompute") {
    val out = queries.Evaluate.hodgesLehmann(spark, sfDir).collect()
    assert(out.length == 3)
    val series = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), date_trunc("month", col("l_shipdate")))
      .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")).as("x"))
      .collect().groupBy(_.getString(0))
    def medianOf(xs: Seq[Long]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2).toDouble
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    out.foreach { r =>
      val ys = series(r.getString(0)).map(_.getLong(2))
      val walsh = for (i <- ys.indices; j <- ys.indices if i <= j)
        yield ys(i) + ys(j)
      assert(r.getLong(1) == walsh.length.toLong)
      val wantHl = math.rint(medianOf(walsh) / 200.0 * 1e6) / 1e6
      assert(math.abs(r.getDouble(2) - wantHl) <= 1e-9,
        s"${r.getString(0)}: hl ${r.getDouble(2)} != $wantHl")
      val wantMed = math.rint(medianOf(ys) / 100.0 * 1e6) / 1e6
      assert(math.abs(r.getDouble(3) - wantMed) <= 1e-9)
    }
  }

  test("ordinal association: gamma/somers agree in sign with tau and dominate it in magnitude") {
    val tau = queries.Evaluate.kendallTau(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    val out = queries.Evaluate.ordinalAssoc(spark, sfDir).collect()
    assert(out.length == 3)
    out.foreach { r =>
      val (g, d) = (r.getDouble(2), r.getDouble(3))
      val t = tau(r.getString(0))
      assert(g >= -1 && g <= 1 && d >= -1 && d <= 1)
      // gamma's denominator C+D is <= BOTH tie-corrected pair counts,
      // so |gamma| dominates |somers_d| and |tau_b| (all share C-D)
      assert(math.abs(g) + 1e-9 >= math.abs(d) &&
        math.abs(g) + 1e-9 >= math.abs(t),
        s"${r.getString(0)}: |gamma|=$g must dominate |somers|=$d, |tau|=$t")
      assert(math.signum(g) == math.signum(d) || g == 0 || d == 0)
      assert(math.signum(g) == math.signum(t) || g == 0 || t == 0)
    }
  }

  test("logrank: expected deaths sum to observed total in nano units (conservation)") {
    val out = queries.Evaluate.logrank(spark, sfDir).collect()
    assert(out.length == 1)
    val r = out.head
    val (n1, n0) = (r.getLong(0), r.getLong(1))
    assert(n1 > 0 && n0 > 0, "both groups must be populated")
    assert(r.getLong(2) <= n1, "group can't observe more deaths than members")
    // for group 1 alone the expected-death total must lie strictly
    // inside (0, all subjects)
    val e1 = r.getLong(3).toDouble / 1e9
    assert(e1 > 0 && e1 < (n1 + n0),
      s"expected1 $e1 outside plausible range")
    assert(r.getLong(4) > 0, "variance must be positive on populated data")
    assert(r.getDouble(5) >= 0)
    assert(Seq("different", "no_evidence").contains(r.getString(6)))
  }

  test("cochran-armitage matches a driver-side recompute of the trend z") {
    val out = queries.Evaluate.cochranArmitage(spark, sfDir).collect()
    assert(out.length == 1)
    val bands = Tables.orders(spark, sfDir)
      .selectExpr(
        """CASE WHEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) < 16500000 THEN 0
          |     WHEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) < 33000000 THEN 1
          |     ELSE 2 END AS sc""".stripMargin,
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS resp")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    val n = bands.length.toDouble
    val rTot = bands.map(_._2).sum.toDouble
    val sn = bands.map(_._1).sum.toDouble
    val sr = bands.filter(_._2 == 1).map(_._1).sum.toDouble
    val ssn = bands.map(b => b._1 * b._1).sum.toDouble
    val a = n * sr - rTot * sn
    val b = rTot * (n - rTot) * (n * ssn - sn * sn)
    val want = if (b <= 0) 0.0 else math.signum(a) * math.sqrt(a * a * n / b)
    val got = out.head.getDouble(2)
    assert(math.abs(got - want) <= 1e-4 * math.max(1.0, math.abs(want)),
      s"z: got $got want ~$want")
  }

  test("lexical richness: identities hold against a driver recompute per language") {
    val out = queries.Evaluate.lexicalRichness(spark, sfDir).collect()
    assert(out.nonEmpty)
    val counts = Tables.documents(spark, sfDir)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .collect().groupBy(_.getString(0))
      .map { case (l, rows) =>
        l -> rows.groupBy(_.getString(1)).map(_._2.length)
      }
    out.foreach { r =>
      val cs = counts(r.getString(0))
      assert(r.getLong(1) == cs.sum, "token count")
      assert(r.getLong(2) == cs.size, "type count")
      assert(r.getLong(3) == cs.count(_ == 1), "hapax count")
      val w = cs.sum.toDouble
      val simpson = cs.map(c => c.toDouble * (c - 1)).sum / (w * (w - 1))
      assert(math.abs(r.getDouble(6) - simpson) <= 1e-8,
        s"${r.getString(0)}: simpson ${r.getDouble(6)} != $simpson")
      assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1)
      assert(r.getDouble(5) >= 0 && r.getDouble(5) <= 1)
    }
  }

  test("capture-recapture: marks are subsets and Chapman brackets the census") {
    val out = queries.Evaluate.captureRecapture(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n1, n2, m, chap, truth) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(n1 <= truth && n2 <= truth)
      assert(m <= math.min(n1, n2))
      assert(chap == (n1 + 1) * (n2 + 1) / (m + 1) - 1)
      // with ~50% and ~33% deterministic id-keyed samples the Chapman
      // estimate lands within a broad factor of the true census
      assert(chap >= truth / 3 && chap <= truth * 3,
        s"${r.getString(0)}: chapman $chap vs true $truth")
    }
  }
}
