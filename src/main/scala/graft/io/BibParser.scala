package graft.io

/** Minimal BibTeX parser (SURVEY.md §2.1 S4), semantics modeled on the
  * reference's `parse_bib_file` (preprocessing/bib_parser.py:4-19): split on
  * `@type{key, ...}` entries, lower-case field keys, tolerate `{...}` and
  * `"..."` delimited values spanning multiple lines. Pure Scala — used from
  * a `flatMap` over `wholeTextFiles`-style input so parsing distributes.
  */
object BibParser {

  final case class BibEntry(entryType: String, citeKey: String, fields: Map[String, String])

  private val EntryStart = "(?s)@([A-Za-z]+)\\s*\\{\\s*([^,\\s]+)\\s*,".r

  /** Parse a whole .bib file's text into entries. */
  def parse(text: String): Seq[BibEntry] = {
    val starts = EntryStart.findAllMatchIn(text).toVector
    starts.zipWithIndex.map { case (m, i) =>
      val end = if (i + 1 < starts.length) starts(i + 1).start else text.length
      val body = text.substring(m.end, end)
      BibEntry(m.group(1).toLowerCase, m.group(2), parseFields(body))
    }
  }

  /** Parse `field = value,` pairs; value may be brace-balanced `{...}`,
    * quoted `"..."`, or a bare token. */
  private def parseFields(body: String): Map[String, String] = {
    val fields = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var i = 0
    val n = body.length
    def skipWs(): Unit = while (i < n && (body(i).isWhitespace || body(i) == ',')) i += 1
    while (i < n) {
      skipWs()
      val ks = i
      while (i < n && (body(i).isLetterOrDigit || body(i) == '_' || body(i) == '-')) i += 1
      val key = body.substring(ks, i).toLowerCase
      skipWs()
      if (key.nonEmpty && i < n && body(i) == '=') {
        i += 1; skipWs()
        if (i < n) body(i) match {
          case '{' =>
            var depth = 1; i += 1; val vs = i
            while (i < n && depth > 0) {
              if (body(i) == '{') depth += 1
              else if (body(i) == '}') depth -= 1
              i += 1
            }
            fields(key) = body.substring(vs, math.max(vs, i - 1))
          case '"' =>
            i += 1; val vs = i
            while (i < n && body(i) != '"') i += 1
            fields(key) = body.substring(vs, i)
            if (i < n) i += 1
          case _ =>
            val vs = i
            while (i < n && body(i) != ',' && body(i) != '}' && body(i) != '\n') i += 1
            fields(key) = body.substring(vs, i).trim
        }
      } else if (key.isEmpty) {
        // closing brace of the entry or junk — stop at entry terminator
        if (i < n && body(i) == '}') i = n else i += 1
      }
    }
    fields.toMap
  }
}
