package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: quality
  * scoring, heuristic language ID, token counting, fingerprinting.
  * All per-row narrow transforms — no shuffle at all; at 100 TB these
  * run as a single map stage fused into the scan by whole-stage
  * codegen.
  *
  * Ratio outputs are raw doubles from single int/int IEEE divisions —
  * deterministic and oracle-safe without rounding.
  */
object TextAnalysis {

  private val stopwords = Seq("the", "a", "of", "to", "and", "in")

  /** Quality signals: word count, average word length, stopword ratio,
    * distinct-word ratio. */
  def quality(docs: DataFrame): DataFrame = {
    val stopList = stopwords.map(w => s"'$w'").mkString(", ")
    docs
      .withColumn("w", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("w")).as("n_words"),
        (length(regexp_replace(col("text"), " ", "")).cast("double") / size(col("w")))
          .as("avg_word_len"),
        (expr(s"size(filter(w, x -> x IN ($stopList)))").cast("double") / size(col("w")))
          .as("stop_ratio"),
        (size(array_distinct(col("w"))).cast("double") / size(col("w")))
          .as("uniq_ratio"))
  }

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "die", "und"),
    "es" -> Seq("el", "los", "que"),
    "fr" -> Seq("le", "les", "et"))

  /** Heuristic language ID: count language-marker stopwords, predict
    * the argmax (ties broken in fixed en>de>es>fr order). A real
    * pipeline would use char n-gram profiles; the operator shape —
    * per-row scoring + argmax — is the same. */
  def langId(docs: DataFrame): DataFrame = {
    val scored = langMarkers.foldLeft(docs.withColumn("w", split(col("text"), " "))) {
      case (df, (lang, markers)) =>
        val lst = markers.map(m => s"'$m'").mkString(", ")
        df.withColumn(s"s_$lang", expr(s"size(filter(w, x -> x IN ($lst)))"))
    }
    scored.select(
      col("doc_id"), col("s_en"), col("s_de"), col("s_es"), col("s_fr"),
      // NULL text guard first: with a null w every marker score is
      // null, every when() condition is null (skipped), and the bare
      // otherwise would label exactly the dirty rows as 'fr' — emit a
      // null prediction instead
      when(col("text").isNull, lit(null).cast("string"))
        .when(col("s_en") >= greatest(col("s_de"), col("s_es"), col("s_fr")), "en")
        .when(col("s_de") >= greatest(col("s_es"), col("s_fr")), "de")
        .when(col("s_es") >= col("s_fr"), "es")
        .otherwise("fr").as("pred_lang"))
  }

  /** Token counts: whitespace tokens, regex word tokens (a BPE-ish
    * `[a-z0-9]+` segmentation), and the chars/4 estimate. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).as("n_ws_tokens"),
      regexp_count(col("text"), lit("[a-z0-9]+")).as("n_re_tokens"),
      ceil(length(col("text")) / 4.0).cast("bigint").as("est_bpe_tokens"))

  /** Content fingerprints: md5 (portable, oracle-checked) plus a
    * 64-bit prefix as BIGINT for compact storage. The engine-native
    * fast path is [[graft.functions.FnvHash]] (custom codegen'd
    * expression, no md5 cost) — tested in FnvHashSpec. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(col("text")).as("fp_md5"),
      expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)").as("fp60"),
      length(col("text")).as("n_chars_actual"))
}
