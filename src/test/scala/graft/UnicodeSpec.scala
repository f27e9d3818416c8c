package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.operators.Dedup

/** Multilingual-corpus robustness: the fixture corpus is ASCII (the
  * FNV oracle's soundness condition, ExtrasSpec), but a 100 TB
  * training corpus is not — these tests pin how the text operators
  * behave on CJK, emoji (non-BMP, surrogate pairs in UTF-16),
  * combining accents, and RTL text. Two claims: (1) Spark's string
  * primitives the operators build on are CODE-POINT based
  * (UTF8String), so char-level ops never split a surrogate pair;
  * (2) the dedup/fingerprint surfaces are deterministic and
  * semantically sane on non-ASCII input — byte-identical text
  * collapses, visually-identical-but-differently-normalized (NFC vs
  * NFD) text does NOT (normalization is an explicit upstream step,
  * not something hashes guess at).
  */
class UnicodeSpec extends SparkSpec {

  // CJK (space-tokenized for the word-shingle operators), an
  // astral-plane emoji doc, NFC/NFD é, Arabic RTL
  private val cjk = "大規模 言語 モデル の 学習 データ"
  private val emoji = "data 🎉 pipeline 🚀 works"
  private val nfc = java.text.Normalizer.normalize("café quality",
    java.text.Normalizer.Form.NFC)          // é precomposed (U+00E9)
  private val nfd = java.text.Normalizer.normalize(nfc,
    java.text.Normalizer.Form.NFD)          // e + combining acute (U+0301)
  private val rtl = "مرحبا world"

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("string primitives are code-point based — surrogate pairs never split") {
    val r = docs((1L, emoji)).select(
      length(col("text")).as("len"),
      split(col("text"), "").as("chars"),
      substring(col("text"), 6, 1).as("sub")).collect()(0)
    // 23 code points; a UTF-16-unit engine would report 25 (each
    // astral emoji is a surrogate pair)
    assert(r.getAs[Int]("len") == 23, s"length = ${r.getAs[Int]("len")}")
    val chars = r.getSeq[String](1).filter(_.nonEmpty)
    assert(chars.length == 23, s"split-to-chars gave ${chars.length} units")
    assert(chars(5) == "🎉", s"char 5 is '${chars(5)}', not the whole emoji")
    // a single-char element that is ANY surrogate half is a broken
    // pair (a whole emoji is 2 UTF-16 units, length 2)
    assert(chars.forall(c =>
        !(c.length == 1 && Character.isSurrogate(c.charAt(0)))),
      "split produced a lone surrogate")
    assert(r.getAs[String]("sub") == "🎉", "substring broke the emoji")
    // CJK length is per ideograph (9 ideographs + 5 spaces = 14... plus
    // kana): count it from the source of truth
    val cjkCp = cjk.codePointCount(0, cjk.length)
    assert(docs((1L, cjk)).select(length(col("text"))).head.getInt(0) == cjkCp)
  }

  test("exact dedup collapses byte-identical unicode, keeps NFC vs NFD apart") {
    assert(nfc != nfd, "fixture strings must differ in normalization form")
    val out = Dedup.exact(
        docs((1L, cjk), (2L, cjk), (3L, nfc), (4L, nfd), (5L, rtl)),
        col("text"), col("doc_id"))
      .collect().map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies"))
      .toMap
    assert(out(1L) == 2L, "identical CJK docs must collapse")
    assert(out(3L) == 1L && out(4L) == 1L,
      "NFC and NFD spell the same glyphs but are different code-point " +
        "sequences — hashes must NOT conflate them")
    assert(out(5L) == 1L)
  }

  test("shingle dedup scores unicode duplicates at jaccard 1.0, deterministically") {
    val cjkNear = cjk + " 追加 の 文"
    def run() = Dedup.ngramJaccardPairs(
        docs((1L, emoji), (2L, emoji), (10L, cjk), (11L, cjkNear)), 3, 0.1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    val got = run()
    assert(got((1L, 2L)) == 1.0, s"emoji duplicate pair scored ${got.get((1L, 2L))}")
    val nearJ = got((10L, 11L))
    assert(nearJ > 0.1 && nearJ < 1.0, s"CJK near-dup scored $nearJ")
    // rerun determinism (md5 over UTF-8 bytes has no locale/charset knob)
    assert(run() == got)
  }

  test("unicode_normalize and strip_accents fold forms the hashes keep apart") {
    GraftFunctions.register(spark)
    import GraftFunctions.{stripAccents, unicodeNormalize}
    val d = docs((1L, nfc), (2L, nfd), (3L, cjk), (4L, emoji))
    val r = d.select(col("doc_id"),
        unicodeNormalize(col("text")).as("norm"),
        stripAccents(col("text")).as("flat"),
        unicodeNormalize(col("text"), "NFD").as("denorm")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getString(3)))
      .toMap
    // NFC(nfd) == nfc: normalization closes exactly the gap exact-dedup
    // keeps open (the upstream step a multilingual pipeline must run)
    assert(r(2L)._1 == nfc, "NFC normalization must fold NFD input")
    assert(r(1L)._1 == nfc)
    assert(r(1L)._3 == nfd, "NFD direction works too")
    // accent folding is form-blind and idempotent on unaccented text
    assert(r(1L)._2 == "cafe quality" && r(2L)._2 == "cafe quality")
    // …and it drops ALL Mn marks, not just Latin accents: Japanese
    // dakuten fold too (デ = テ + U+3099 under NFD) — exactly DuckDB
    // strip_accents' behavior (its oracle twin), documented as the
    // blocking-key (lossy) semantic, never canonical text
    assert(r(3L)._2 == "大規模 言語 モテル の 学習 テータ",
      s"dakuten folding changed: ${r(3L)._2}")
    assert(r(4L)._2 == emoji)
    // SQL registration path (the pure-SQL user's spelling)
    d.createOrReplaceTempView("unicode_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, unicode_normalize(text, 'NFC') AS n, " +
        "strip_accents(text) AS f FROM unicode_docs WHERE doc_id = 2").collect()(0)
    assert(viaSql.getString(1) == nfc && viaSql.getString(2) == "cafe quality")
    // 1-arg SQL spelling defaults to NFC like the Column wrapper
    val oneArg = spark.sql(
      "SELECT unicode_normalize(text) AS n FROM unicode_docs WHERE doc_id = 2")
      .collect()(0).getString(0)
    assert(oneArg == nfc)
    // non-literal form is a loud argument error, not a silent default
    intercept[Exception] {
      spark.sql("SELECT unicode_normalize(text, text) FROM unicode_docs").collect()
    }
  }

  test("simhash and fingerprint expressions are total and stable on non-ASCII") {
    GraftFunctions.register(spark)
    val d = docs((1L, cjk), (2L, emoji), (3L, nfc), (4L, nfd), (5L, rtl))
    def sigs() = Dedup.simhashNarrow(d, 32)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    val s1 = sigs()
    assert(s1.size == 5 && s1.values.forall(v => v >= 0 && v < (1L << 32)))
    assert(sigs() == s1, "simhash must be rerun-stable on non-ASCII input")
    def fnv() = d.select(col("doc_id"), GraftFunctions.fnv64(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val f1 = fnv()
    assert(f1 == fnv() && f1.values.toSet.size == 5,
      "FNV over UTF-8 bytes must be injective-on-fixture and rerun-stable")
  }
}
