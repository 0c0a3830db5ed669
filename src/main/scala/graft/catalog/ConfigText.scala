package graft.catalog

import scala.collection.mutable

/** Text-format primitives for the config-authoring tools: a
  * ConfigObj-style INI-with-nested-sections dialect (the PFP control
  * file format, reference: `code/configs_editors/pfp_configs_editor.py`
  * and `configs_editor.py:228-331` both edit it via `ConfigObj`) and a
  * string-scalar YAML-subset tree writer/parser (the site variable-map
  * format, `code/configs_editors/variable_configurator.py:595-610`).
  * Both are zero-dependency by design (offline build) and only claim
  * the subset the reference actually reads and writes: nested sections
  * of string scalars and flat string lists.
  */
object ConfigText {

  // ---------------------------------------------------------------- ConfigObj

  /** One ConfigObj section: ordered scalar/list values plus ordered
    * nested sections. A scalar is a 1-element Vector; lists keep their
    * element order. */
  final class Section {
    val values: mutable.LinkedHashMap[String, Vector[String]] =
      mutable.LinkedHashMap.empty
    /** Keys whose 1-element value is semantically a LIST (`a,` in
      * ConfigObj), not a scalar (`a`) — the Vector shape can't carry
      * the distinction, so it is tracked here and [[writeConfigObj]]
      * re-emits the trailing comma. Multi-element lists need no
      * marker. Editors that assign `values(k) = Vector(x)` produce a
      * scalar (matching ConfigObj, where assigning a str does too);
      * add the key here to author a 1-element list. */
    val listKeys: mutable.Set[String] = mutable.Set.empty
    val sections: mutable.LinkedHashMap[String, Section] =
      mutable.LinkedHashMap.empty

    def scalar(key: String): String = values(key) match {
      case Vector(v) => v
      case vs => vs.mkString("") // ConfigObj list read as joined string
    }
    def section(key: String): Section = sections(key)
    def getSection(key: String): Option[Section] = sections.get(key)
    def subsection(key: String): Section =
      sections.getOrElseUpdate(key, new Section)
  }

  /** Parse the ConfigObj dialect: `[name]` nesting by bracket depth,
    * `key = value` scalars, comma-separated lists with optional
    * single/double quoting, `#` comments. Depth must increase by at
    * most one per section header (ConfigObj's own rule). */
  def parseConfigObj(text: String): Section = {
    val root = new Section
    var stack = List(root) // head = deepest open section
    text.linesIterator.zipWithIndex.foreach { case (raw, i) =>
      val line = stripComment(raw).trim
      if (line.nonEmpty) {
        if (line.startsWith("[")) {
          val depth = line.takeWhile(_ == '[').length
          require(line.endsWith("]" * depth) && depth <= stack.length,
            s"malformed section header at line ${i + 1}: $raw")
          val name = line.drop(depth).dropRight(depth).trim
          val parent = stack(stack.length - depth)
          stack = parent.subsection(name) :: stack.takeRight(depth)
          // takeRight keeps root..parent; head is the new section
        } else {
          val eq = line.indexOf('=')
          require(eq > 0, s"expected key = value at line ${i + 1}: $raw")
          val key = line.take(eq).trim
          val value = line.drop(eq + 1).trim
          val (vs, sawComma) = splitList(value)
          stack.head.values(key) = vs
          if (sawComma && vs.length == 1) stack.head.listKeys += key
          else stack.head.listKeys -= key
        }
      }
    }
    root
  }

  /** Render with ConfigObj's conventions: 4-space indent per depth,
    * scalars before subsections, list elements joined with ", " and
    * quoted only when they contain a comma, quote, or hash. */
  def writeConfigObj(root: Section): String = {
    val sb = new StringBuilder
    def emit(s: Section, depth: Int): Unit = {
      val pad = "    " * depth
      s.values.foreach { case (k, vs) =>
        sb.append(pad).append(k).append(" = ")
          .append(vs.map(quoteIfNeeded).mkString(", "))
        // ConfigObj's 1-element-list marker survives the round trip.
        if (vs.length == 1 && s.listKeys(k)) sb.append(',')
        sb.append('\n')
      }
      s.sections.foreach { case (name, sub) =>
        sb.append(pad).append("[" * (depth + 1)).append(name)
          .append("]" * (depth + 1)).append('\n')
        emit(sub, depth + 1)
      }
    }
    emit(root, 0)
    sb.toString
  }

  private def stripComment(line: String): String = {
    // honour '#' only outside quotes. The ConfigObj dialect has NO
    // escape syntax (real ConfigObj switches quote chars or refuses):
    // a quoted segment ends at the next matching quote char, so a
    // backslash before it is plain content ('C:\data\' parses whole).
    var inQ: Char = 0
    val out = new StringBuilder
    var done = false
    line.foreach { c =>
      if (!done) {
        if (inQ != 0) { if (c == inQ) inQ = 0; out.append(c) }
        else if (c == '\'' || c == '"') { inQ = c; out.append(c) }
        else if (c == '#') done = true
        else out.append(c)
      }
    }
    out.toString
  }

  /** Split a ConfigObj value into its elements: respects quoting; a
    * value with no top-level comma is a scalar (1-element Vector). A
    * trailing comma marks a 1-element list (ConfigObj convention) —
    * the elements Vector is the same, but the second member of the
    * result reports whether a top-level comma was seen, so the caller
    * can preserve the scalar-vs-singleton-list distinction.
    * Whitespace is trimmed only OUTSIDE quotes: `' padded '`
    * round-trips with its spaces intact. No escape handling anywhere
    * (see [[stripComment]]), so backslash content — including a
    * trailing backslash — passes through verbatim. */
  private def splitList(value: String): (Vector[String], Boolean) = {
    // Pass 1: split on top-level commas, keeping quotes raw.
    val raw = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQ: Char = 0
    var sawComma = false
    value.foreach { c =>
      if (inQ != 0) { if (c == inQ) inQ = 0; cur.append(c) }
      else if (c == '\'' || c == '"') { inQ = c; cur.append(c) }
      else if (c == ',') { sawComma = true; raw += cur.toString; cur.clear() }
      else cur.append(c)
    }
    val last = cur.toString
    if (last.trim.nonEmpty || raw.isEmpty) raw += last
    (raw.map(unquoteElem).toVector, sawComma)
  }

  /** Pass 2 of [[splitList]]: trim the unquoted surround, then strip a
    * matching quote pair — the exact inverse of [[quoteIfNeeded]]. */
  private def unquoteElem(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && (t.head == '\'' || t.head == '"') && t.last == t.head)
      t.drop(1).dropRight(1)
    else t
  }

  /** Quote with the char the value does NOT contain (ConfigObj's own
    * convention — the dialect has no escape syntax, so the quote char
    * must be absent from the content). A value containing BOTH quote
    * chars cannot be represented round-trip-safely; refuse loudly
    * (real ConfigObj raises likewise) rather than corrupt the user's
    * config on its next load. */
  private def quoteIfNeeded(v: String): String =
    if (!(v.isEmpty || v.exists(c => c == ',' || c == '\'' || c == '"' || c == '#')
      || v != v.trim)) v
    else if (!v.contains('\'')) "'" + v + "'"
    else if (!v.contains('"')) "\"" + v + "\""
    else throw new IllegalArgumentException(
      "value contains both quote characters and cannot round-trip " +
        s"in the ConfigObj dialect: $v")

  // -------------------------------------------------------------------- YAML

  /** A YAML-subset node: either a scalar string or an ordered map. */
  sealed trait Yaml
  final case class YScalar(value: String) extends Yaml
  final case class YMap(entries: Vector[(String, Yaml)]) extends Yaml {
    def apply(key: String): Yaml = entries.find(_._1 == key).map(_._2)
      .getOrElse(throw new NoSuchElementException(key))
    def get(key: String): Option[Yaml] = entries.find(_._1 == key).map(_._2)
    def keys: Vector[String] = entries.map(_._1)
  }

  /** Render an ordered string-map tree the way `yaml.dump(...,
    * sort_keys=False)` does for this shape: two-space indent, scalars
    * inline, quoting only when the scalar would be ambiguous. */
  def writeYaml(root: YMap): String = {
    val sb = new StringBuilder
    def emit(m: YMap, indent: Int): Unit =
      m.entries.foreach { case (k, v) =>
        sb.append("  " * indent).append(quoteYaml(k)).append(":")
        v match {
          case YScalar(s) => sb.append(' ').append(quoteYaml(s)).append('\n')
          case sub: YMap => sb.append('\n'); emit(sub, indent + 1)
        }
      }
    emit(root, 0)
    sb.toString
  }

  private def quoteYaml(s: String): String = {
    val needs = s.isEmpty || s.exists(c => ":#'\"{}[],&*?|>%@`!".contains(c)) ||
      s != s.trim || s.headOption.exists(_ == '-')
    if (needs) "'" + s.replace("'", "''") + "'" else s
  }

  /** Parse the subset [[writeYaml]] emits (plus `#` comments): nested
    * maps of string scalars, indentation-scoped. */
  def parseYamlTree(text: String): YMap = {
    // (indent, key, scalarOrNull) per significant line
    val lines = text.linesIterator.zipWithIndex.flatMap { case (raw, i) =>
      val noComment = stripComment(raw)
      if (noComment.trim.isEmpty) None
      else {
        val indent = noComment.takeWhile(_ == ' ').length
        val body = noComment.trim
        val colon = colonSplit(body, i + 1)
        Some((indent, colon._1, colon._2))
      }
    }.toVector

    def build(from: Int, until: Int, indent: Int): YMap = {
      val entries = Vector.newBuilder[(String, Yaml)]
      var i = from
      while (i < until) {
        val (ind, key, value) = lines(i)
        require(ind == indent,
          s"inconsistent indentation at entry '$key' ($ind vs $indent)")
        var j = i + 1
        while (j < until && lines(j)._1 > indent) j += 1
        if (j > i + 1) entries += key -> build(i + 1, j, lines(i + 1)._1)
        else entries += key -> YScalar(Option(value).getOrElse(""))
        i = j
      }
      YMap(entries.result())
    }
    if (lines.isEmpty) YMap(Vector.empty) else build(0, lines.length, lines(0)._1)
  }

  /** Split `key: value` / `key:` with optional quoting of either side.
    * Returns (key, valueOrNull — null means "opens a nested map"). */
  private def colonSplit(body: String, lineNo: Int): (String, String) = {
    def unquote(s: String): String = {
      val t = s.trim
      if (t.length >= 2 && (t.head == '\'' && t.last == '\''))
        t.drop(1).dropRight(1).replace("''", "'")
      else if (t.length >= 2 && t.head == '"' && t.last == '"')
        t.drop(1).dropRight(1)
      else t
    }
    var inQ: Char = 0
    var idx = -1
    var i = 0
    while (idx < 0 && i < body.length) {
      val c = body(i)
      if (inQ != 0) { if (c == inQ) inQ = 0 }
      else if (c == '\'' || c == '"') inQ = c
      else if (c == ':') idx = i
      i += 1
    }
    require(idx > 0, s"expected 'key:' or 'key: value' at line $lineNo: $body")
    val key = unquote(body.take(idx))
    val rest = body.drop(idx + 1).trim
    (key, if (rest.isEmpty) null else unquote(rest))
  }
}
