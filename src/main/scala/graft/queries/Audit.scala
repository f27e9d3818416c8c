package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 corpus/ops audit operators: character-level entropy
  * scoring, BPE merge-rule induction, a shuffle-key skew profiler,
  * and an embedding-corpus QA audit. Conventions per ARCHITECTURE.md
  * "Cross-engine determinism" (exact integer counts, md5 buckets,
  * round() absorbers on transcendental chains, total ORDER BY).
  */
object Audit {

  /** L4r — character-level Shannon entropy per document: the
    * gibberish/encoding-garbage detector that complements word-level
    * quality scores (natural language sits in a narrow band; base64
    * blobs and key-mash spam fall outside it). Char frequencies are
    * exact integer counts from one explode; the entropy sum spans a
    * bounded alphabet per doc, with the standard round(4) absorber on
    * the transcendental chain. */
  def charEntropy(s: SparkSession, dir: String): DataFrame = {
    // Fused census expression (CharEntropyStats): the per-character
    // explode → (doc, char) hash aggregate → totals join used to emit
    // one row PER CHARACTER of the corpus and shuffle it twice; the
    // census is per-document-local, so the whole operator is now one
    // narrow projection over the scan (guide §2.3/§2.4 — aggregate
    // before you shuffle / remove the shuffle outright). Same exact
    // integer counts; the entropy float chain sums in ascending
    // code-point order under the SAME round(4) absorber that covered
    // the hash aggregate's arbitrary order before. Empty documents
    // had no surviving char rows and were absent; the total > 0
    // filter preserves that.
    Tables.widen(Tables.documents(s, dir))
      .select(col("doc_id"),
        graft.functions.GraftFunctions.charEntropyStats(col("text")).as("st"))
      .filter(col("st.total") > 0)
      .select(col("doc_id"), col("st.total").as("n_chars_counted"),
        col("st.alphabet").as("alphabet_size"),
        round(col("st.entropy"), 4).as("char_entropy"))
      .orderBy(col("doc_id"))
  }

  val charEntropySql: String =
    """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
      |            FROM documents),
      |c AS (SELECT doc_id, ch, count(*) AS n FROM ch WHERE ch <> ''
      |      GROUP BY 1, 2),
      |t AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS total FROM c
      |      GROUP BY doc_id)
      |SELECT c.doc_id, t.total AS n_chars_counted, count(*) AS alphabet_size,
      |  round(-sum((CAST(n AS DOUBLE) / total) * ln(CAST(n AS DOUBLE) / total)),
      |    4) AS char_entropy
      |FROM c JOIN t ON c.doc_id = t.doc_id
      |GROUP BY c.doc_id, t.total ORDER BY c.doc_id""".stripMargin

  /** L28 — BPE merge-rule induction, round one: the most frequent
    * adjacent character pairs across all word occurrences — exactly
    * the statistic byte-pair-encoding training maximizes at each merge
    * step (run iteratively it grows a subword vocabulary; round one is
    * the distributed-count shape). Pair counts are exact integers from
    * one narrow word→bigram explode; top 20 under a total order. */
  def bpeMerges(s: SparkSession, dir: String): DataFrame =
    Tables.widen(Tables.documents(s, dir))
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(20)

  val bpeMergesSql: String =
    """WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |p AS (SELECT unnest(list_transform(range(1, length(w)),
      |        i -> substring(w, i, 2))) AS pair
      |      FROM w WHERE length(w) >= 2)
      |SELECT pair, count(*) AS cnt FROM p
      |GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20""".stripMargin

  /** L28b — BPE merge-rule induction, ITERATED: five full rounds of
    * the byte-pair-encoding training loop (L28's q_bpe_merges is round
    * one's statistic alone) — count adjacent symbol pairs across the
    * corpus, adopt the most frequent as a merge rule, rewrite the
    * corpus, repeat. So round 2+ counts pairs over MERGED symbols
    * (multi-char units), exactly how a real subword vocabulary grows.
    *
    * Tokenization state is one string per word with every symbol
    * wrapped in pipes ("|a||b|"), which makes the rewrite a plain
    * left-to-right `replace(s, '|a||b|', '|ab|')`: the wrapper
    * anchors BOTH symbol boundaries — a pair can match neither a
    * symbol's suffix ("|h||e|" never fires inside "|xh||e|") nor a
    * longer symbol's prefix ("|h||e|" never fires inside "|h||er|") —
    * adjacent occurrences share no characters, and replace()'s scan
    * order IS BPE's greedy left-to-right order. Identical semantics
    * in both engines, no regex lookarounds needed. Words are
    * restricted to [a-z0-9]+ so '|' can never occur as data.
    *
    * Scale shape — the real trainer's: the corpus collapses ONCE to
    * the distinct-word frequency table (vocab-sized — Zipf makes this
    * orders of magnitude smaller than the occurrence stream), and all
    * five rounds iterate over THAT, weighting every pair count by the
    * word's corpus frequency (`sum(n)` ≡ the occurrence stream's
    * `count(*)` exactly, in integers). Each round is then one
    * vocab-sized pair-explode aggregate + a 1-row broadcast into the
    * rewrite map — no driver-side collect, and the corpus itself is
    * scanned exactly once regardless of `rounds`. The per-round
    * tokenizations are scoped-persisted (released with the query's
    * action). Each rule row also carries the trainer's compression
    * curve — exact corpus token count after that round's merge
    * (Σ frequency × symbols-per-word). Ties break to the
    * lexicographically largest pair under one max(struct); the oracle
    * unrolls the same five rounds over the same weighted
    * vocabulary. */
  def bpeApply(s: SparkSession, dir: String, rounds: Int = 5): DataFrame = {
    import graft.Caches.PersistScoped
    var words = Tables.widen(Tables.documents(s, dir))
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("^[a-z0-9]+$"))
      .groupBy(regexp_replace(col("w"), "(.)", "|$1|").as("s"))
      .agg(count(lit(1)).as("n"))
      .persistScoped()
    val rules = (1 to rounds).map { r =>
      // materialize the 1-row winner eagerly: it has TWO readers (the
      // rule output and the next round's broadcast rewrite) and its
      // plan is a full vocab pair-count — without truncation every
      // round's aggregate would run twice (measured 7.3 s vs 3.4 s on
      // the pre-vocab occurrence-stream shape)
      val top = words
        .select(split(expr("substring(s, 2, length(s) - 2)"), "\\|\\|").as("t"),
          col("n"))
        .filter(size(col("t")) >= 2)
        .select(explode(expr("transform(sequence(1, size(t) - 1), i -> " +
          "concat(element_at(t, i), ' ', element_at(t, i + 1)))")).as("pair"),
          col("n"))
        .groupBy(col("pair")).agg(sum(col("n")).as("cnt"))
        .agg(max(struct(col("cnt"), col("pair"))).as("m"))
        .select(col("m.pair").as("pair"), col("m.cnt").as("cnt"))
        .localCheckpoint()
      words = words.crossJoin(broadcast(top))
        .select(expr("replace(s, concat('|', replace(pair, ' ', '||'), '|'), " +
          "concat('|', replace(pair, ' ', ''), '|'))").as("s"), col("n"))
        .persistScoped()
      // the trainer's compression curve: corpus tokens AFTER this
      // round's merge (each symbol is |…|-wrapped, so symbols/word =
      // pipes/2 — exact integer div, summed weighted by frequency)
      val tokensAfter = words.agg(expr(
        "sum(n * ((length(s) - length(replace(s, '|', ''))) div 2))")
        .cast("bigint").as("corpus_tokens"))
      top.crossJoin(broadcast(tokensAfter))
        .select(lit(r).as("round"), col("pair"),
          expr("replace(pair, ' ', '')").as("merged"), col("cnt"),
          col("corpus_tokens"))
    }
    rules.reduce(_.unionAll(_)).orderBy(col("round"))
  }

  val bpeApplySql: String = {
    val rounds = (1 to 5).map { r =>
      s"""p$r AS (SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM (
         |  SELECT unnest(list_transform(range(1, len(t)),
         |    i -> t[i] || ' ' || t[i + 1])) AS pair, n
         |  FROM (SELECT string_split(substring(s, 2, length(s) - 2), '||') AS t, n
         |        FROM w${r - 1})
         |  WHERE len(t) >= 2)
         |  GROUP BY pair ORDER BY cnt DESC, pair DESC LIMIT 1),
         |w$r AS (SELECT replace(s,
         |  '|' || replace((SELECT pair FROM p$r), ' ', '||') || '|',
         |  '|' || replace((SELECT pair FROM p$r), ' ', '') || '|') AS s, n
         |  FROM w${r - 1})"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH w0 AS (SELECT regexp_replace(w, '(.)', '|\\1|', 'g') AS s,
      |    count(*) AS n
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE regexp_matches(w, '^[a-z0-9]+$$')
      |  GROUP BY 1),
      |$rounds,
      |${(1 to 5).map(r =>
        s"""t$r AS (SELECT CAST(sum(n * ((length(s) - length(replace(s, '|', ''))) // 2))
           |  AS BIGINT) AS corpus_tokens FROM w$r)""".stripMargin)
        .mkString(",\n")}
      |${(1 to 5).map(r =>
        s"SELECT $r AS round, pair, replace(pair, ' ', '') AS merged, cnt, " +
          s"corpus_tokens FROM p$r CROSS JOIN t$r")
        .mkString("\nUNION ALL ")}
      |ORDER BY round""".stripMargin
  }

  /** E17 — shuffle-key skew profiler: the pre-flight audit that
    * decides whether a join/aggregation key needs salting BEFORE the
    * job runs at scale. Rows hash (md5 — engine- and
    * partitioning-portable) into 64 buckets on the candidate key; the
    * profile emits each bucket's share and skew factor
    * (share × buckets — 1.0 is perfectly level). A hot key shows as a
    * bucket far above 1; the operator is one narrow projection + one
    * 64-row aggregate at any corpus size. */
  def skewProfile(s: SparkSession, dir: String, buckets: Int = 64): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select((conv(substring(md5(col("l_partkey").cast("string")), 1, 8), 16, 10)
        .cast("long") % buckets).cast("int").as("bucket"))
    val c = li.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val tot = c.agg(sum(col("n")).as("t"))
    c.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n"),
        (col("n").cast("double") / col("t")).as("share"),
        (col("n").cast("double") * buckets / col("t")).as("skew_factor"))
      .orderBy(col("bucket"))
  }

  val skewProfileSql: String =
    """WITH b AS (SELECT CAST(CAST(concat('0x',
      |      substring(md5(CAST(l_partkey AS VARCHAR)), 1, 8)) AS BIGINT) % 64
      |      AS INT) AS bucket
      |    FROM lineitem),
      |c AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM c)
      |SELECT bucket, n, CAST(n AS DOUBLE) / t AS share,
      |  CAST(n AS DOUBLE) * 64 / t AS skew_factor
      |FROM c CROSS JOIN t ORDER BY bucket""".stripMargin

  /** L29 — embedding-corpus QA audit: per label, vector count,
    * zero/degenerate-norm count, and exact norm statistics over
    * 1e-6-quantized norms (floor — the one rounding mode identical
    * across engines), so min/max/mean are exact-integer artifacts up
    * to one terminal division. The pre-index health check an ANN
    * pipeline runs before building (a zero vector breaks cosine; a
    * norm collapse signals an upstream encoder bug). One narrow
    * projection + one aggregate. */
  def embeddingAudit(s: SparkSession, dir: String): DataFrame =
    Tables.widen(Tables.embeddings(s, dir))
      .select(col("label"),
        floor(sqrt(aggregate(
          zip_with(col("embedding"), col("embedding"),
            (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v)) * 1e6).cast("bigint").as("normq"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("normq") === 0, 1L).otherwise(0L)).as("n_zero"),
        min(col("normq")).as("min_normq"),
        max(col("normq")).as("max_normq"),
        (sum(col("normq")).cast("double") / count(lit(1))).as("mean_normq"))
      .orderBy(col("label"))

  val embeddingAuditSql: String =
    """WITH v AS (SELECT label,
      |    CAST(floor(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |      CAST(embedding AS DOUBLE[]))) * 1e6) AS BIGINT) AS normq
      |  FROM embeddings)
      |SELECT label, count(*) AS n_vecs,
      |  CAST(sum(CASE WHEN normq = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
      |  min(normq) AS min_normq, max(normq) AS max_normq,
      |  CAST(sum(normq) AS DOUBLE) / count(*) AS mean_normq
      |FROM v GROUP BY label ORDER BY label""".stripMargin

  /** L4s — Unicode normalization + accent folding: the explicit
    * pre-dedup step a multilingual corpus needs (NFC vs NFD spell
    * identical glyphs as different code-point sequences — hashes must
    * not be left to conflate them, UnicodeSpec). The fixture corpus
    * is ASCII, so the query CONSTRUCTS the two normalization forms
    * per document (é as U+00E9 vs e+U+0301 — built with explicit
    * escapes/chr() so no tooling can silently re-normalize the
    * source) and asserts cross-engine byte equality of: NFC
    * re-normalization output, form-invariant code-point lengths, the
    * match flag, and the accent-stripped fold. Engine side is the
    * codegen'd [[graft.functions.UnicodeNormalize]] /
    * [[graft.functions.StripAccentsExpr]] pair; oracle is DuckDB's
    * nfc_normalize / strip_accents. Narrow projections only. */
  def unicodeNormalizeQ(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import graft.functions.GraftFunctions.{unicodeNormalize, stripAccents}
    Tables.widen(Tables.documents(s, dir))
      .select(col("doc_id"),
        concat(lit("caf\u00e9 "), substring(col("text"), 1, 16)).as("nfc_str"),
        concat(lit("cafe\u0301 "), substring(col("text"), 1, 16)).as("nfd_str"))
      .select(col("doc_id"),
        length(col("nfd_str")).as("n_nfd"),
        length(col("nfc_str")).as("n_nfc"),
        unicodeNormalize(col("nfd_str")).as("normalized"),
        (unicodeNormalize(col("nfd_str")) === col("nfc_str"))
          .as("renormalized_match"),
        stripAccents(col("nfc_str")).as("stripped"))
      .orderBy(col("doc_id"))
  }

  val unicodeNormalizeSql: String =
    """WITH f AS (SELECT doc_id,
      |    'caf' || chr(233) || ' ' || substring(text, 1, 16) AS nfc_str,
      |    'cafe' || chr(769) || ' ' || substring(text, 1, 16) AS nfd_str
      |  FROM documents)
      |SELECT doc_id, length(nfd_str) AS n_nfd, length(nfc_str) AS n_nfc,
      |  nfc_normalize(nfd_str) AS normalized,
      |  nfc_normalize(nfd_str) = nfc_str AS renormalized_match,
      |  strip_accents(nfc_str) AS stripped
      |FROM f ORDER BY doc_id""".stripMargin

  /** L4t — script-aware multilingual token counting: whitespace
    * tokenization UNDERCOUNTS CJK by treating whole clauses as one
    * "word" (CJK has no word spaces), so the standard fallback counts
    * Han/Hiragana/Katakana code points as one token each and
    * whitespace-words for the rest — the estimator real pipelines use
    * to budget context windows for mixed corpora. The fixture is
    * ASCII, so the query splices a fixed CJK clause into each doc
    * (explicit \\u escapes / chr() so no tooling can re-normalize the
    * source) and both engines classify scripts with their regex
    * engine's Unicode script classes (verified identical: Java
    * `\\p{IsHan}` ≡ RE2 `\\p{Han}`). Narrow projections only. */
  def mixedTokens(s: SparkSession, dir: String): DataFrame = {
    val cjk = "[\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}]"
    val clause = "\u5927\u898f\u6a21\u8a00\u8a9e\u30e2\u30c7\u30eb\u306e\u5b66\u7fd2"
    Tables.widen(Tables.documents(s, dir))
      .select(col("doc_id"),
        concat(substring(col("text"), 1, 24), lit(" "), lit(clause),
          lit(" "), substring(col("text"), 25, 12)).as("mixed"))
      .select(col("doc_id"),
        (length(col("mixed")) - length(regexp_replace(col("mixed"), cjk, "")))
          .cast("bigint").as("cjk_tokens"),
        // DataFrame-API regex (NOT expr): a SQL string literal would
        // eat the \p escape before the pattern ever reached RE2/Java
        size(filter(split(regexp_replace(col("mixed"), cjk + "+", " "), " "),
          x => x =!= lit(""))).cast("bigint").as("word_tokens"))
      .withColumn("total_tokens", col("cjk_tokens") + col("word_tokens"))
      .orderBy(col("doc_id"))
  }

  val mixedTokensSql: String = {
    val clause = (Seq(22823, 35215, 27169, 35328, 35486, 12514, 12487,
      12523, 12398, 23398, 32722)).map(c => s"chr($c)").mkString(" || ")
    s"""WITH f AS (SELECT doc_id,
      |    substring(text, 1, 24) || ' ' || $clause || ' ' ||
      |      substring(text, 25, 12) AS mixed
      |  FROM documents),
      |t AS (SELECT doc_id,
      |    CAST(length(mixed) - length(regexp_replace(mixed,
      |      '[\\p{Han}\\p{Hiragana}\\p{Katakana}]', '', 'g')) AS BIGINT)
      |      AS cjk_tokens,
      |    CAST(len(list_filter(string_split(regexp_replace(mixed,
      |      '[\\p{Han}\\p{Hiragana}\\p{Katakana}]+', ' ', 'g'), ' '),
      |      x -> x <> '')) AS BIGINT) AS word_tokens
      |  FROM f)
      |SELECT doc_id, cjk_tokens, word_tokens,
      |  cjk_tokens + word_tokens AS total_tokens
      |FROM t ORDER BY doc_id""".stripMargin
  }

  /** F5c — VARIANT semi-structured extraction (Spark 4's open-format
    * answer to schema-on-read JSON): `parse_json` once into the binary
    * variant encoding, then typed-path `variant_get` extraction — at
    * scale this beats per-access `get_json_object` re-parsing (the
    * variant is parsed ONCE and stored columnar-friendly; Parquet can
    * shred it). The query parses events.props, extracts `$.k` as
    * BIGINT, proves absent-path totality (`try_variant_get` → NULL,
    * never an error), and aggregates per event type; the oracle reads
    * the same JSON through DuckDB's native ->> extraction. */
  def variantExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("v", parse_json(col("props")))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'bigint')").as("k"),
        expr("try_variant_get(v, '$.missing', 'bigint')").as("absent"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        sum(when(col("absent").isNull, 1L).otherwise(0L)).as("n_absent"))
      .orderBy(col("event_type"))

  val variantExtractSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  min(CAST(props ->> 'k' AS BIGINT)) AS min_k,
      |  max(CAST(props ->> 'k' AS BIGINT)) AS max_k,
      |  CAST(sum(CASE WHEN props ->> 'missing' IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_absent
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** F1d — collation-aware grouping (Spark 4 collations): group
    * case-insensitively by declaring the COLUMN's comparison semantics
    * (`collate(s, 'UTF8_LCASE')`) instead of materializing a lower()
    * key — the engine-native path that lets every comparison operator
    * (GROUP BY, =, ORDER BY, joins) share one declared collation at
    * scale. The fixture text is lowercase, so the query first
    * constructs case variants deterministically (initcap on even doc
    * ids), then proves the collated grouping collapses them: per
    * group, member count, count of distinct BINARY spellings (> 1
    * where initcap changed anything), and the min doc id. Output keys
    * are the BINARY min spelling (deterministic — the collated group's
    * representative value is implementation-chosen and never
    * emitted). Oracle: the same grouping through lower(). */
  def collatedGroup(s: SparkSession, dir: String): DataFrame =
    Tables.widen(Tables.documents(s, dir))
      .select(col("doc_id"),
        substring(when(pmod(col("doc_id"), lit(2)) === 0,
            initcap(col("text"))).otherwise(col("text")), 1, 24).as("sp"))
      .groupBy(collate(col("sp"), "UTF8_LCASE").as("g"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(collate(col("sp"), "UTF8_BINARY")).as("n_spellings"),
        min(collate(col("sp"), "UTF8_BINARY")).as("spelling_repr"),
        min(col("doc_id")).as("min_doc"))
      .select(col("n_docs"), col("n_spellings"), col("spelling_repr"),
        col("min_doc"))
      .orderBy(col("min_doc"))

  val collatedGroupSql: String =
    """WITH v AS (SELECT doc_id,
      |    substring(CASE WHEN doc_id % 2 = 0
      |      THEN list_aggregate(list_transform(string_split(text, ' '),
      |        w -> upper(substring(w, 1, 1)) || substring(w, 2)), 'string_agg', ' ')
      |      ELSE text END, 1, 24) AS sp
      |  FROM documents)
      |SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(count(DISTINCT sp) AS BIGINT) AS n_spellings,
      |  min(sp) AS spelling_repr,
      |  CAST(min(doc_id) AS BIGINT) AS min_doc
      |FROM v GROUP BY lower(sp) ORDER BY min_doc""".stripMargin

  /** D7 — SQL pipe syntax (Spark 4): the linear `FROM … |> WHERE …
    * |> AGGREGATE …` form — each stage reads top-to-bottom in
    * execution order, the way the DataFrame API composes, and
    * compiles to the IDENTICAL plan as the nested-SELECT spelling.
    * The oracle is that plain-SQL equivalent (DuckDB has no pipe
    * parser), which is itself the point: pipe syntax is parse-time
    * sugar, not new semantics. Exact integer cents throughout. */
  def sqlPipe(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_p")
    s.sql(
      """FROM lineitem_p
        #|> WHERE l_shipdate >= DATE'1995-01-01'
        #|> EXTEND CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        #|> AGGREGATE COUNT(*) AS n, SUM(cents) AS sum_cents GROUP BY l_returnflag
        #|> ORDER BY l_returnflag""".stripMargin('#'))
  }

  val sqlPipeSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS sum_cents
      |FROM lineitem WHERE l_shipdate >= DATE '1995-01-01'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** D8 — SQL scalar UDF (Spark 4 `CREATE FUNCTION … RETURN expr`):
    * reusable business logic declared IN SQL and inlined by the
    * analyzer into the calling plan (no JVM round trip, full codegen —
    * the D1 Scala UDF's opposite trade). The function computes
    * discounted price in exact integer units (cents × basis points):
    * every step is integer-exact on both engines, sidestepping the
    * decimal→BIGINT cast divergence (Spark truncates, DuckDB rounds —
    * ARCHITECTURE.md rule 7). Oracle inlines the same expression. */
  def sqlUdf(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_u")
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_units(
        |  p DECIMAL(18,2), d DECIMAL(18,2)) RETURNS BIGINT
        |RETURN CAST(p * 100 AS BIGINT) * (100 - CAST(d * 100 AS BIGINT))""".stripMargin)
    s.sql(
      """SELECT l_returnflag,
        |  SUM(graft_disc_units(CAST(l_extendedprice AS DECIMAL(18,2)),
        |    CAST(l_discount AS DECIMAL(18,2)))) AS disc_units,
        |  COUNT(*) AS n
        |FROM lineitem_u GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  val sqlUdfSql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
      |    (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)))
      |    AS BIGINT) AS disc_units,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** F1e — accent+case-insensitive collation (UNICODE_CI_AI)
    * cross-validated against the EXPLICIT fold: grouping under the
    * declared collation must land the exact groups that
    * strip-accents-then-lowercase materializes — the agreement that
    * lets a pipeline pick either path (declare the column's
    * comparison semantics, or fold a blocking key) and get identical
    * dedup families. Three spellings per doc (accented lowercase,
    * unaccented uppercase, unaccented lowercase — built with explicit
    * escapes) must always co-group; representatives are binary mins
    * (the collated group's own representative is
    * implementation-chosen and never emitted). */
  def collatedFold(s: SparkSession, dir: String): DataFrame =
    Tables.widen(Tables.documents(s, dir))
      .select(col("doc_id"), substring(col("text"), 1, 16).as("sp"))
      .select(col("doc_id"), explode(array(
        concat(lit("caf\u00e9 "), col("sp")),
        concat(lit("CAFE "), upper(col("sp"))),
        concat(lit("cafe "), col("sp")))).as("v"))
      .groupBy(collate(col("v"), "UNICODE_CI_AI").as("g"))
      .agg(count(lit(1)).as("n_variants"),
        count_distinct(collate(col("v"), "UTF8_BINARY")).as("n_spellings"),
        min(collate(col("v"), "UTF8_BINARY")).as("spelling_repr"),
        min(col("doc_id")).as("min_doc"))
      .select(col("n_variants"), col("n_spellings"), col("spelling_repr"),
        col("min_doc"))
      .orderBy(col("min_doc"), col("spelling_repr"))

  val collatedFoldSql: String =
    """WITH sp AS (SELECT doc_id, substring(text, 1, 16) AS sp FROM documents),
      |v AS (SELECT doc_id, unnest([
      |        'caf' || chr(233) || ' ' || sp,
      |        'CAFE ' || upper(sp),
      |        'cafe ' || sp]) AS v
      |      FROM sp)
      |SELECT CAST(count(*) AS BIGINT) AS n_variants,
      |  CAST(count(DISTINCT v) AS BIGINT) AS n_spellings,
      |  min(v) AS spelling_repr,
      |  CAST(min(doc_id) AS BIGINT) AS min_doc
      |FROM v GROUP BY strip_accents(lower(v))
      |ORDER BY min_doc, spelling_repr""".stripMargin

  /** E21 — declarative data-contract validation: the rule-report form
    * of the reference's validation surface (its count-compare checks
    * generalized to the dbt-test / Great-Expectations shape a modern
    * ingest pipeline gates on). Nine rules across four rule classes —
    * not-null, accepted-values/range/format, key uniqueness, and
    * referential integrity — each emitting (n_checked, n_violations,
    * passed) so a scheduler can gate on `passed` and an operator can
    * triage by count.
    *
    * Scale shape: the four lineitem row-level rules share ONE scan via
    * conditional sums (map-side combined to a single row); the
    * uniqueness probes are one partial/final count per key group
    * summed; referential integrity is a distinct-FK left join (narrow
    * key columns only — at 100 TB the distinct collapses the fact
    * table to its key cardinality before the join shuffles anything),
    * with BOTH the checked total and the orphan count read off the
    * same grouped relation so the rule costs one fact scan, not two.
    * Three rules FAIL naturally on the fixture (the synthetic
    * lineitem repeats (l_orderkey, l_linenumber) pairs, some
    * o_orderpriority values break the ^[1-5]-[A-Z]+$ shape, and
    * o_custkey has repeat customers), so the report's violation path
    * is exercised by real data, not a rigged fixture — and an
    * all-empty slice (a pruned incremental day) reports every rule
    * passed with zero counts, never a NULL-poisoned gate (AuditSpec). */
  def expectations(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)
    // rules 1-4: one shared lineitem scan, conditional sums
    val liRules = li.agg(
        count(lit(1)).as("n"),
        sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("v1"),
        sum(when(!col("l_returnflag").isin("A", "N", "R"), 1L)
          .otherwise(0L)).as("v2"),
        sum(when(col("l_quantity") < 1.0 || col("l_quantity") > 50.0, 1L)
          .otherwise(0L)).as("v3"),
        sum(when(col("l_discount") < 0.0 || col("l_discount") > 0.10, 1L)
          .otherwise(0L)).as("v4"))
      .select(explode(array(
        struct(lit(1).as("rule_id"), lit("lineitem_shipdate_not_null").as("rule_name"), col("n").as("n_checked"), col("v1").as("n_violations")),
        struct(lit(2).as("rule_id"), lit("lineitem_returnflag_values").as("rule_name"), col("n").as("n_checked"), col("v2").as("n_violations")),
        struct(lit(3).as("rule_id"), lit("lineitem_quantity_range").as("rule_name"), col("n").as("n_checked"), col("v3").as("n_violations")),
        struct(lit(4).as("rule_id"), lit("lineitem_discount_range").as("rule_name"), col("n").as("n_checked"), col("v4").as("n_violations"))))
        .as("r"))
      .select(col("r.*"))
    // rule 5: PK uniqueness — per-group counts, surplus rows are the
    // violations; n_checked is the number of key groups probed
    val pkRule = li.groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_checked"),
        sum(col("c") - lit(1)).as("n_violations"))
      .select(lit(5).as("rule_id"),
        lit("lineitem_pk_unique").as("rule_name"),
        col("n_checked"), col("n_violations"))
    // rule 6: referential integrity — distinct FKs carrying their row
    // counts, left-joined against the (unique) parent key; violations
    // = orphan ROWS (the count an operator must quarantine) and
    // n_checked = Σc = total fact rows, both off the grouped relation
    // — no second scan of the fact table for its count
    val fkRule = li.groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
      .join(ord.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left")
      .agg(sum(col("c")).as("n_checked"),
        sum(when(col("o_orderkey").isNull, col("c")).otherwise(0L))
          .as("n_violations"))
      .select(lit(6).as("rule_id"),
        lit("lineitem_orderkey_in_orders").as("rule_name"),
        col("n_checked"), col("n_violations"))
    // rules 7-9: one shared orders scan — format regex, candidate-key
    // probe (count − count distinct; FAILS here: repeat customers),
    // and date bounds
    val ordRules = ord.agg(
        count(lit(1)).as("n"),
        sum(when(!col("o_orderpriority").rlike("^[1-5]-[A-Z]+$"), 1L)
          .otherwise(0L)).as("v7"),
        (count(lit(1)) - count_distinct(col("o_custkey"))).as("v8"),
        sum(when(col("o_orderdate") < lit("1992-01-01").cast("timestamp") ||
          col("o_orderdate") >= lit("2006-01-01").cast("timestamp"), 1L)
          .otherwise(0L)).as("v9"))
      .select(explode(array(
        struct(lit(7).as("rule_id"), lit("orders_priority_format").as("rule_name"), col("n").as("n_checked"), col("v7").as("n_violations")),
        struct(lit(8).as("rule_id"), lit("orders_custkey_unique").as("rule_name"), col("n").as("n_checked"), col("v8").as("n_violations")),
        struct(lit(9).as("rule_id"), lit("orders_orderdate_bounds").as("rule_name"), col("n").as("n_checked"), col("v9").as("n_violations"))))
        .as("r"))
      .select(col("r.*"))
    // coalesce EVERY count: sums over zero rows are NULL, and a NULL
    // violation count must read as a clean pass (0), not a blocked
    // gate — the empty slice is routine at scale, not an error
    liRules.unionByName(pkRule).unionByName(fkRule).unionByName(ordRules)
      .select(col("rule_id"), col("rule_name"),
        coalesce(col("n_checked").cast("bigint"), lit(0L)).as("n_checked"),
        coalesce(col("n_violations").cast("bigint"), lit(0L))
          .as("n_violations"),
        when(coalesce(col("n_violations"), lit(0L)) === 0, 1).otherwise(0)
          .as("passed"))
      .orderBy(col("rule_id"))
  }

  val expectationsSql: String =
    """WITH li AS (SELECT count(*) AS n,
      |    sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS v1,
      |    sum(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS v2,
      |    sum(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0 THEN 1 ELSE 0 END) AS v3,
      |    sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.10 THEN 1 ELSE 0 END) AS v4
      |  FROM lineitem),
      |pk AS (SELECT count(*) AS n_checked, sum(c - 1) AS n_violations
      |       FROM (SELECT count(*) AS c FROM lineitem
      |             GROUP BY l_orderkey, l_linenumber)),
      |fk AS (SELECT sum(c) AS n_checked,
      |         sum(CASE WHEN o.o_orderkey IS NULL THEN c ELSE 0 END)
      |           AS n_violations
      |       FROM (SELECT l_orderkey, count(*) AS c FROM lineitem
      |             GROUP BY l_orderkey) f
      |       LEFT JOIN orders o ON o.o_orderkey = f.l_orderkey),
      |ord AS (SELECT count(*) AS n,
      |    sum(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z]+$')
      |        THEN 1 ELSE 0 END) AS v7,
      |    count(*) - count(DISTINCT o_custkey) AS v8,
      |    sum(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01' OR
      |        o_orderdate >= TIMESTAMP '2006-01-01' THEN 1 ELSE 0 END) AS v9
      |  FROM orders),
      |r AS (
      |  SELECT 1 AS rule_id, 'lineitem_shipdate_not_null' AS rule_name,
      |    n AS n_checked, v1 AS n_violations FROM li
      |  UNION ALL SELECT 2, 'lineitem_returnflag_values', n, v2 FROM li
      |  UNION ALL SELECT 3, 'lineitem_quantity_range', n, v3 FROM li
      |  UNION ALL SELECT 4, 'lineitem_discount_range', n, v4 FROM li
      |  UNION ALL SELECT 5, 'lineitem_pk_unique', n_checked, n_violations FROM pk
      |  UNION ALL SELECT 6, 'lineitem_orderkey_in_orders',
      |    n_checked, n_violations FROM fk
      |  UNION ALL SELECT 7, 'orders_priority_format', n, v7 FROM ord
      |  UNION ALL SELECT 8, 'orders_custkey_unique', n, v8 FROM ord
      |  UNION ALL SELECT 9, 'orders_orderdate_bounds', n, v9 FROM ord)
      |SELECT rule_id, rule_name,
      |  CAST(coalesce(n_checked, 0) AS BIGINT) AS n_checked,
      |  CAST(coalesce(n_violations, 0) AS BIGINT) AS n_violations,
      |  CASE WHEN coalesce(n_violations, 0) = 0 THEN 1 ELSE 0 END AS passed
      |FROM r ORDER BY rule_id""".stripMargin

  /** W44 — Simpson's-paradox audit: per-stratum regression slope SIGN
    * vs the pooled sign, the aggregation-reversal check that belongs
    * next to any segmented A/B or trend readout (a pooled trend whose
    * strata all disagree is a confounding alarm, not a finding). The
    * trend is quantity-on-discount within each return flag.
    *
    * Signs come from the covariance numerator n·Σxy − Σx·Σy in EXACT
    * decimal(38,0) arithmetic (x the exact integer discount
    * percentage, y the integral quantity — the q_regr_slope
    * convention), so the sign is bit-determined with no float
    * tolerance. The pooled sums are re-aggregated from the per-stratum
    * rows — metadata-scale, no second fact scan — and broadcast back
    * onto the stratum rows. (The reversal is scale-dependent on the
    * fixture: at sf0.01 strata A and N trend positive against a
    * negative pooled sign, at sf0.1 stratum R flips against the
    * pooled negative, and the sf0.001 smoke slice is too small to
    * reverse at all — AuditSpec pins the sf0.01 flip and
    * cross-checks every sign against covar_pop.) */
  def simpsonsAudit(s: SparkSession, dir: String): DataFrame = {
    val d = (c: Column) => c.cast("decimal(38,0)")
    val per = Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("stratum"),
        (col("l_discount").cast("decimal(4,2)") * 100)
          .cast("decimal(38,0)").as("x"),
        floor(col("l_quantity")).cast("decimal(38,0)").as("y"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"))
    def sign(cov: Column): Column =
      when(cov > 0, 1).when(cov < 0, -1).otherwise(0)
    val stratum = per.select(col("stratum"), col("n"),
      sign(d(col("n")) * col("sxy") - col("sx") * col("sy"))
        .as("slope_sign"))
    val pooled = per.agg(sum(col("n")).as("n"), sum(col("sx")).as("sx"),
        sum(col("sy")).as("sy"), sum(col("sxy")).as("sxy"))
      .select(sign(d(col("n")) * col("sxy") - col("sx") * col("sy"))
        .as("pooled_sign"))
    stratum.crossJoin(broadcast(pooled))
      .select(col("stratum"), col("n").cast("bigint").as("n"),
        col("slope_sign"), col("pooled_sign"),
        when(col("slope_sign") =!= 0 && col("pooled_sign") =!= 0 &&
          col("slope_sign") =!= col("pooled_sign"), 1).otherwise(0)
          .as("simpson_flip"))
      .orderBy(col("stratum"))
  }

  val simpsonsAuditSql: String =
    """WITH b AS (SELECT l_returnflag AS stratum,
      |    CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS x,
      |    CAST(floor(l_quantity) AS BIGINT) AS y
      |  FROM lineitem),
      |per AS (SELECT stratum, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |          sum(x * y) AS sxy
      |        FROM b GROUP BY stratum),
      |pooled AS (SELECT CASE
      |    WHEN sum(n) * sum(sxy) - sum(sx) * sum(sy) > 0 THEN 1
      |    WHEN sum(n) * sum(sxy) - sum(sx) * sum(sy) < 0 THEN -1
      |    ELSE 0 END AS pooled_sign FROM per)
      |SELECT stratum, CAST(n AS BIGINT) AS n,
      |  CASE WHEN n * sxy - sx * sy > 0 THEN 1
      |       WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS slope_sign,
      |  pooled_sign,
      |  CASE WHEN (CASE WHEN n * sxy - sx * sy > 0 THEN 1
      |                  WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END) <> 0
      |        AND pooled_sign <> 0
      |        AND (CASE WHEN n * sxy - sx * sy > 0 THEN 1
      |                  WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END)
      |            <> pooled_sign
      |       THEN 1 ELSE 0 END AS simpson_flip
      |FROM per, pooled ORDER BY stratum""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_char_entropy" -> (charEntropy _),
    "q_bpe_merges" -> (bpeMerges _),
    "q_bpe_apply" -> ((s: SparkSession, d: String) => bpeApply(s, d)),
    "q_skew_profile" -> ((s: SparkSession, d: String) => skewProfile(s, d)),
    "q_embedding_audit" -> (embeddingAudit _),
    "q_unicode_normalize" -> (unicodeNormalizeQ _),
    "q_mixed_tokens" -> (mixedTokens _),
    "q_variant_extract" -> (variantExtract _),
    "q_collated_group" -> (collatedGroup _),
    "q_sql_pipe" -> (sqlPipe _),
    "q_sql_udf" -> (sqlUdf _),
    "q_collated_fold" -> (collatedFold _),
    "q_expectations" -> (expectations _),
    "q_simpsons_audit" -> (simpsonsAudit _),
  )

  val oracle: Map[String, String] = Map(
    "q_char_entropy" -> charEntropySql,
    "q_bpe_merges" -> bpeMergesSql,
    "q_bpe_apply" -> bpeApplySql,
    "q_skew_profile" -> skewProfileSql,
    "q_embedding_audit" -> embeddingAuditSql,
    "q_unicode_normalize" -> unicodeNormalizeSql,
    "q_mixed_tokens" -> mixedTokensSql,
    "q_variant_extract" -> variantExtractSql,
    "q_collated_group" -> collatedGroupSql,
    "q_sql_pipe" -> sqlPipeSql,
    "q_sql_udf" -> sqlUdfSql,
    "q_collated_fold" -> collatedFoldSql,
    "q_expectations" -> expectationsSql,
    "q_simpsons_audit" -> simpsonsAuditSql,
  )
}
