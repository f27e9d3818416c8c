package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Dedup, TextAnalysis}

/** Property-based invariants over ScalaCheck-generated corpora: dedup
  * conservation laws and text-stat bounds that must hold for ANY
  * input, not just fixtures. Generators are driven directly with
  * fixed seeds (deterministic; the scalatestplus bridge isn't in the
  * offline cache). Sized small — each case spins Spark jobs. */
class PropertySpec extends SparkSpec {

  private val word = Gen.oneOf("spark", "scan", "join", "sort", "the", "row", "fast")
  private val text = Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val corpus = Gen.chooseNum(2, 12).flatMap(n => Gen.listOfN(n, text))

  private def samples(n: Int): Seq[List[String]] =
    (0 until n).flatMap(i => corpus.apply(Gen.Parameters.default, Seed(42L + i)))

  test("exact dedup conserves rows: Σ n_copies == |docs| and keepers are distinct") {
    samples(5).foreach { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = Dedup.exact(docs, col("text"), col("doc_id")).collect()
      assert(out.map(_.getAs[Long]("n_copies")).sum == texts.length)
      assert(out.length == texts.distinct.length)
      val keepers = out.map(_.getAs[Long]("keep_id"))
      assert(keepers.distinct.length == keepers.length)
    }
  }

  test("jaccard pairs are ordered, bounded in (0,1], and find every exact dup") {
    samples(5).foreach { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.1).collect()
      pairs.foreach { r =>
        assert(r.getLong(0) < r.getLong(1))
        val j = r.getDouble(2)
        assert(j >= 0.1 && j <= 1.0)
      }
      val found = pairs.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      for {
        a <- texts.indices; b <- texts.indices
        if a < b && texts(a) == texts(b) && texts(a).split(" ").length >= 3
      } assert(found.exists(p => p._1 == a && p._2 == b && p._3 == 1.0),
        s"dup pair ($a,$b) missing from ${found.toSeq}")
    }
  }

  test("salted aggregation equals direct aggregation for any salt width") {
    import graft.queries.Conv
    val li = Tables.lineitem(spark, sfDir)
    val direct = li.groupBy(col("l_returnflag"))
      .agg(sum(Conv.dec2(col("l_quantity"))).cast("double").as("s"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    Seq(2, 8, 31).foreach { salts =>
      val salted = li
        .withColumn("salt", expr(s"pmod(xxhash64(l_orderkey, l_linenumber), $salts)"))
        .groupBy(col("l_returnflag"), col("salt"))
        .agg(sum(Conv.dec2(col("l_quantity"))).as("ps"), count(lit(1)).as("pn"))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("ps")).cast("double").as("s"), sum(col("pn")).as("n"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
      assert(salted == direct, s"salt width $salts diverged")
    }
  }

  test("salted join equals the unsalted join for any salt width") {
    import graft.queries.Joins
    def rows(k: Int) = Joins.saltedJoin(spark, sfDir, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val direct = rows(1) // k=1: the salt is constant → plain join
    assert(direct.nonEmpty)
    Seq(4, 8, 17).foreach { k =>
      assert(rows(k) == direct, s"salt width $k diverged")
    }
  }

  test("hash sampling is invariant under repartitioning") {
    import graft.queries.Pipeline
    val a = Pipeline.hashSample(spark, sfDir).collect().toSeq
    val b = Pipeline.hashSample(spark, sfDir)
      .repartition(13).orderBy(col("o_orderkey")).collect().toSeq
    assert(a == b)
  }

  test("moneyAvg integer rounding equals BigDecimal HALF_UP for random cent values") {
    import spark.implicits._
    val cents = Gen.chooseNum(0L, 10000000L)
    val group = Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, cents))
    (0 until 8).flatMap(i => group.apply(Gen.Parameters.default, Seed(7L + i)))
      .zipWithIndex.foreach { case (vals, g) =>
        val df = vals.map(c => (g, c / 100.0)).toDF("g", "v")
        val got = df.groupBy(col("g")).agg(queries.Conv.moneyAvg("v").as("a"))
          .collect().head.getDouble(1)
        val want = (BigDecimal(vals.sum) / 100 / vals.length)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(got == want, s"vals=$vals got=$got want=$want")
      }
  }

  test("star-contraction CC matches a driver-side union-find model on random graphs") {
    import spark.implicits._
    val edgeGen = for {
      n <- Gen.chooseNum(2, 30)
      m <- Gen.chooseNum(1, 40)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0, n - 1); b <- Gen.chooseNum(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield es.filter(e => e._1 != e._2)
    (0 until 6).foreach { i =>
      val edges = edgeGen.apply(Gen.Parameters.default, Seed(99L + i))
        .getOrElse(Nil)
      if (edges.nonEmpty) {
        // plain-Scala union-find ground truth, min-id representative
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = parent.keys.map(x => x -> find(x)).toMap
        val got = Dedup.dedupClustersStar(edges.toDF("doc_id_a", "doc_id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want, s"seed ${99 + i}: star labels $got != model $want")
      }
    }
  }

  test("KMV sketch matches the plain-Scala model exactly for any multiset") {
    import spark.implicits._
    import graft.operators.KmvSketch
    val k = 8
    def hash60(x: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(x.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    val multiset = Gen.chooseNum(1, 60)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(0L, 25L)))
    (0 until 6).foreach { i =>
      val vals = multiset.apply(Gen.Parameters.default, Seed(7000L + i)).getOrElse(Nil)
      if (vals.nonEmpty) {
        val hs = vals.map(hash60).distinct.sorted
        val want =
          if (hs.length < k) hs.length.toDouble
          else (k - 1).toDouble * 1152921504606846976.0 / hs(k - 1).toDouble
        val kmv = udaf(new KmvSketch(k))
        val got = vals.toDF("x")
          .select(expr("CAST(conv(substring(md5(CAST(x AS STRING)), 1, 15), 16, 10) AS BIGINT)").as("h"))
          .agg(kmv(col("h"))).head.getDouble(0)
        assert(got == want, s"seed ${7000 + i}: KMV $got != model $want")
      }
    }
  }

  test("text quality ratios are within [0,1] and word counts positive") {
    samples(5).foreach { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      TextAnalysis.quality(docs).collect().foreach { r =>
        assert(r.getAs[Int]("n_words") > 0)
        assert(r.getAs[Double]("stop_ratio") >= 0.0 && r.getAs[Double]("stop_ratio") <= 1.0)
        assert(r.getAs[Double]("uniq_ratio") > 0.0 && r.getAs[Double]("uniq_ratio") <= 1.0)
      }
    }
  }

  test("bitmap aggregate models a Set for any id multiset and grouping") {
    // model check: per-group popcount == |distinct ids|, word-wise AND
    // popcount == |intersection| — against plain Scala Sets, for
    // generated multisets with duplicates and shared ids across groups
    import spark.implicits._
    val ids = Gen.chooseNum(5, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 99L)))
    val two = for (a <- ids; b <- ids) yield (a, b)
    val bm = udaf(new graft.operators.BitmapAgg(128))
    (0 until 5).flatMap(i => two.apply(Gen.Parameters.default, Seed(7L + i)))
      .foreach { case (as, bs) =>
        val df = (as.map(("a", _)) ++ bs.map(("b", _))).toDF("g", "id")
        val rows = df.groupBy(col("g")).agg(bm(col("id")).as("bits"))
          .orderBy(col("g")).collect()
        def pop(x: Seq[Long]) = x.map(java.lang.Long.bitCount).sum
        val (ba, bb) = (rows(0).getSeq[Long](1), rows(1).getSeq[Long](1))
        assert(pop(ba) == as.distinct.size && pop(bb) == bs.distinct.size)
        val and = ba.zip(bb).map { case (x, y) => x & y }
        assert(pop(and) == (as.toSet & bs.toSet).size)
      }
  }

  test("bfsHops matches a reference BFS on random graphs") {
    import spark.implicits._
    // random sparse undirected graphs: up to 14 nodes, random edges —
    // mixes chains, cycles, stars, and disconnected components
    val edgeGen = for {
      n <- Gen.chooseNum(2, 14)
      m <- Gen.chooseNum(1, 20)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0L, n.toLong - 1)
        b <- Gen.chooseNum(0L, n.toLong - 1)
      } yield (a, b))
    } yield es.filter { case (a, b) => a != b }
    def referenceBfs(edges: List[(Long, Long)]): Map[Long, (Long, Long)] = {
      val adj = (edges ++ edges.map(_.swap)).groupMap(_._1)(_._2)
      val nodes = adj.keySet
      // component via DFS, then BFS hops from the component min
      var seen = Set.empty[Long]
      nodes.toSeq.sorted.flatMap { start =>
        if (seen(start)) Nil
        else {
          var comp = Set(start); var frontier = List(start)
          while (frontier.nonEmpty) {
            val next = frontier.flatMap(adj(_)).filterNot(comp)
            comp ++= next; frontier = next.distinct
          }
          seen ++= comp
          val root = comp.min
          var hops = Map(root -> 0L); var ring = List(root); var d = 0L
          while (ring.nonEmpty) {
            d += 1
            val nxt = ring.flatMap(adj(_)).distinct.filterNot(hops.contains)
            nxt.foreach(v => hops += v -> d); ring = nxt
          }
          comp.toSeq.map(v => v -> (root, hops(v)))
        }
      }.toMap
    }
    (0 until 6).flatMap(i => edgeGen.apply(Gen.Parameters.default, Seed(99L + i)))
      .foreach { edges =>
        if (edges.nonEmpty) {
          val got = graft.operators.Dedup.bfsHops(
              edges.toDF("doc_id_a", "doc_id_b"))
            .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
          assert(got == referenceBfs(edges),
            s"bfsHops diverged from reference on $edges")
        }
      }
  }
}
