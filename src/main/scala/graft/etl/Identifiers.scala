package graft.etl

import org.apache.spark.sql.DataFrame

/** Identifier sanitization — the reference's schema-naming concern
  * (ref A7 adjacency): RDBMS column names may carry spaces, symbols,
  * case, or leading digits that the destination's field-name grammar
  * (BigQuery: `[a-zA-Z_][a-zA-Z0-9_]*`) rejects. Rules, applied
  * deterministically so re-runs and the SQL oracle agree:
  *
  *  1. lowercase, then every character outside `[a-z0-9]` becomes `_`
  *  2. a leading digit gets a `_` prefix (empty input becomes `_`)
  *  3. collisions number by ENCOUNTER ORDER: the first keeps the bare
  *     name, later ones get `_2`, `_3`, … (callers that need a
  *     canonical order sort the names first — `q_name_sanitize`
  *     sorts alphabetically, making encounter order reproducible in
  *     plain SQL as a row_number)
  *
  * Sanitization is schema metadata (driver-side, O(columns)) — the
  * data itself never moves.
  */
object Identifiers {

  def sanitize(name: String): String = {
    val base = name.toLowerCase.replaceAll("[^a-z0-9]", "_")
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
    * name-restricted destination. */
  def sanitizeColumns(df: DataFrame): DataFrame = {
    val mapping = sanitizeAll(df.columns.toSeq)
    mapping.foldLeft(df) { case (d, (from, to)) =>
      if (from == to) d else d.withColumnRenamed(from, to)
    }
  }
}
