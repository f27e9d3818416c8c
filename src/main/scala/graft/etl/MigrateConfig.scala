package graft.etl

/** The reference's config front door (ref A13 [K]: `migbq
  * run|check|retry|sync <config.yml>`, a YAML file with jinja2-style
  * value templating), re-expressed without external dependencies: a
  * MINIMAL flat-plus-one-level YAML subset parser plus `${VAR}`
  * environment interpolation (the templating use the reference's
  * sample configs actually exercise — injecting credentials and
  * paths). Deliberately NOT a general YAML engine: no sequences, no
  * multi-line scalars, no anchors — a config key is `key: value` or a
  * one-level `section:` block of them, flattened to `section.key`.
  * Unsupported syntax fails loudly rather than half-parsing.
  */
object MigrateConfig {

  /** Parse the YAML subset into a flat key → value map. `env` feeds
    * `${VAR}` interpolation (pass `sys.env` in production; a literal
    * map in tests). Unknown `${VAR}` references fail loudly — a
    * silently-empty credential is the classic templating footgun. */
  def parse(text: String, env: Map[String, String] = Map.empty): Map[String, String] = {
    var section: Option[String] = None
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    text.linesIterator.zipWithIndex.foreach { case (raw, i) =>
      val noComment = stripComment(raw, i + 1)
      val line = noComment.trim
      if (line.nonEmpty) {
        val indented = noComment.startsWith(" ") || noComment.startsWith("\t")
        val colon = line.indexOf(':')
        require(colon > 0, s"line ${i + 1}: expected 'key: value', got '$line'")
        val key = line.take(colon).trim
        require(key.matches("[A-Za-z0-9_.-]+"),
          s"line ${i + 1}: unsupported key syntax '$key'")
        val value = line.drop(colon + 1).trim
        if (value.isEmpty && !indented) section = Some(key) // section header
        else {
          require(value.nonEmpty,
            s"line ${i + 1}: nested sections beyond one level are not supported")
          val full = if (indented) {
            require(section.nonEmpty, s"line ${i + 1}: indented key without a section")
            s"${section.get}.$key"
          } else { section = None; key }
          out(full) = interpolate(unquote(value), env, i + 1)
        }
      }
    }
    out.toMap
  }

  /** Read + parse a config file with the process environment. JVM
    * system properties whose name starts with `GRAFT_` back-fill names
    * the environment lacks — the documented injection channel for
    * forked-JVM tests (a JVM cannot set its own environment); a real
    * env var always wins. The prefix scope keeps a typo'd `${VAR}`
    * from silently resolving to an unrelated JVM property
    * (user.dir, os.name, ...) instead of failing loudly. */
  def load(path: String): Map[String, String] =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"),
      sys.props.toMap.filter(_._1.startsWith("GRAFT_")) ++ sys.env)

  private def stripComment(s: String, lineNo: Int): String = {
    // a '#' inside quotes is content, not a comment — but a quote only
    // OPENS at a token boundary (start of line / after whitespace or
    // ':'), so an apostrophe inside an unquoted value (o'brien) never
    // swallows a trailing comment into the value
    var inQ: Char = 0
    val b = new StringBuilder
    var i = 0
    var done = false
    while (i < s.length && !done) {
      val c = s.charAt(i)
      val atBoundary = i == 0 || s.charAt(i - 1) == ' ' ||
        s.charAt(i - 1) == '\t' || s.charAt(i - 1) == ':'
      if (inQ != 0) { if (c == inQ) inQ = 0; b.append(c) }
      else if ((c == '\'' || c == '"') && atBoundary) { inQ = c; b.append(c) }
      else if (c == '#') done = true
      else b.append(c)
      i += 1
    }
    // An unterminated quote would otherwise HALF-parse: comment
    // stripping stays disabled for the rest of the line and unquote
    // leaves the dangling quote char in the value — exactly the silent
    // corruption this module's "unsupported syntax fails loudly"
    // doctrine forbids.
    require(inQ == 0, s"line $lineNo: unterminated $inQ quote")
    b.toString
  }

  private def unquote(v: String): String =
    if (v.length >= 2 &&
      ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
      v.substring(1, v.length - 1)
    else v

  private val VarRef = """\$\{([A-Za-z_][A-Za-z0-9_]*)\}""".r

  private def interpolate(v: String, env: Map[String, String], line: Int): String =
    VarRef.replaceAllIn(v, m =>
      scala.util.matching.Regex.quoteReplacement(
        env.getOrElse(m.group(1), sys.error(
          s"line $line: \\$${${m.group(1)}} is not set in the environment"))))
}
