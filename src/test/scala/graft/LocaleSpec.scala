package graft

/** JVM-default-locale independence — the casing/formatting twin of
  * [[TimezoneSpec]]. On a real cluster each executor JVM inherits the
  * host's locale, and the classic leak paths are default-locale
  * `toUpperCase`/`toLowerCase` (Turkish dotted/dotless i: "i" upcases
  * to "İ" under tr-TR, so `upper('item') = 'ITEM'` silently fails),
  * `String.format`/NumberFormat digit shaping (Thai/Arabic-Indic
  * digits, comma decimal separators under de-DE), and
  * DateFormatSymbols month/weekday names. The engine's contract is
  * that every string/number/date surface is locale-free (Spark pins
  * Locale.US internally; our own code uses Locale.ROOT), so every
  * query must produce IDENTICAL results whatever the JVM default —
  * this spec swaps the default to the three adversarial locales and
  * asserts exactly that over the locale-exposed query families:
  * casing/regex string surfaces, the scalar UDF (a user-code path the
  * session conf cannot protect), unicode normalization + collation
  * folds, identifier sanitization, langid, CSV/JSON text round-trips
  * (number parsing/rendering), decimal fidelity, and the
  * date-component extractors (weekday/month naming).
  *
  * Locale.setDefault swaps BOTH categories (DISPLAY and FORMAT), and
  * under local[*] the executor threads share the driver JVM, so the
  * swap reaches task-side code too — the same reach TimezoneSpec
  * relies on. */
class LocaleSpec extends SparkSpec {

  private val targets = Seq(
    // casing + regex + string surfaces (tr-TR dotless-i hazard)
    "q_string_funcs", "q_string_funcs2", "q_scalar_udf",
    "q_text_normalize", "q_text_scrub", "q_dict_redact",
    "q_name_sanitize", "q_text_langid",
    // collation + unicode folds (ICU collators take explicit locales;
    // the JVM default must not reach them)
    "q_collated_group", "q_collated_fold", "q_mixed_tokens",
    // number parsing/rendering through text transports (de-DE comma
    // decimals, th-TH Thai digits must not leak into %f / parseDouble)
    "q_csv_roundtrip", "q_json_roundtrip", "q_decimal_fidelity",
    "q_typemap_cast",
    // date-component extraction (DateFormatSymbols names)
    "q_date_funcs", "q_weekday_profile")

  private def run(name: String): Seq[Any] = {
    val r = SparkEntry.queries(name)(spark, sfDir).collect()
      .map(_.toSeq).toSeq
    spark.catalog.clearCache()
    r
  }

  test("locale-exposed queries are invariant to the JVM default locale") {
    val prev = java.util.Locale.getDefault
    val baseline = targets.map(n => n -> run(n))
    try {
      Seq("tr-TR", "de-DE", "th-TH-u-nu-thai").foreach { tag =>
        java.util.Locale.setDefault(java.util.Locale.forLanguageTag(tag))
        baseline.foreach { case (name, want) =>
          assert(run(name) == want, s"$name differs under JVM locale $tag")
        }
      }
    } finally java.util.Locale.setDefault(prev)
  }
}
