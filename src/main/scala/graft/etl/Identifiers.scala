package graft.etl

import org.apache.spark.sql.DataFrame

/** Identifier sanitization — the reference's schema-naming concern
  * (ref A7 adjacency): RDBMS column names may carry spaces, symbols,
  * case, or leading digits that the destination's field-name grammar
  * (BigQuery: `[a-zA-Z_][a-zA-Z0-9_]*`) rejects. Rules, applied
  * deterministically so re-runs and the SQL oracle agree:
  *
  *  1. every character outside `[a-zA-Z0-9]` becomes `_`, THEN the
  *     (now pure-ASCII) result lowercases — strip-first makes the
  *     lowercase locale-free by construction (no İ/ı surprises under
  *     a Turkish default locale; Locale.ROOT belt-and-braces) and
  *     matches `q_name_sanitize`'s SQL exactly
  *  2. a leading digit gets a `_` prefix (empty input becomes `_`)
  *  3. collisions number by ENCOUNTER ORDER: the first keeps the bare
  *     name, later ones get `_2`, `_3`, … counting past taken literal
  *     names until free — [[sanitizeAll]]'s outputs are always
  *     distinct. (`q_name_sanitize` replays rules 1-2 and the window
  *     form of rule 3 in SQL; the loop-until-free refinement for a
  *     corpus that already spells a suffixed form is library-side
  *     only — see the query's scaladoc.)
  *
  * Sanitization is schema metadata (driver-side, O(columns)) — the
  * data itself never moves.
  */
object Identifiers {

  def sanitize(name: String): String = {
    val base = name.replaceAll("[^a-zA-Z0-9]", "_")
      .toLowerCase(java.util.Locale.ROOT)
    if (base.isEmpty) "_"
    else if (base.charAt(0).isDigit) "_" + base
    else base
  }

  /** (original, safe) pairs with collision numbering by encounter
    * order. Total: distinct inputs always map to distinct outputs
    * (suffixes can themselves collide with a literal `foo_2` column
    * only if that sanitized name is ALREADY taken — the loop then
    * keeps counting until free). */
  def sanitizeAll(names: Seq[String]): Seq[(String, String)] = {
    val taken = scala.collection.mutable.Set.empty[String]
    names.map { n =>
      val base = sanitize(n)
      var candidate = base
      var k = 1
      while (taken(candidate)) { k += 1; candidate = s"${base}_$k" }
      taken += candidate
      n -> candidate
    }
  }

  /** Rename every column to its sanitized name (encounter order =
    * schema order). The usual pre-sink step before writing to a
    * name-restricted destination. Positional `toDF`, NOT a
    * `withColumnRenamed` fold: the fold renames every column matching
    * a name, so an original that equals another column's sanitized
    * target (("A B", "a_b") → both become "a_b_2") — or a post-join
    * frame with duplicate names — would end up with duplicate
    * columns, the exact condition the sanitizer exists to prevent. */
  def sanitizeColumns(df: DataFrame): DataFrame =
    df.toDF(sanitizeAll(df.columns.toSeq).map(_._2): _*)
}
