package graft.norm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-function library for the reference's normalization funnel
  * (SURVEY.md §2.3 P1-P9). All pure `org.apache.spark.sql.functions`
  * compositions — codegen'd, pushdown-friendly, no UDFs.
  *
  * Reference semantics (file:line of /root/reference/src/ingestion_pipeline):
  *  - P1 normalizeDoi      — preprocessing/doi_utils.py:11-17
  *  - P2 stripBraces       — preprocessing/doi_utils.py:19-23
  *  - P3 doiExtract        — preprocessing/doi_utils.py:9,25-28
  *  - P4 coalesceArticle   — preprocessing/normalize.py:36-49
  *  - P5 docId             — pipelines/ingest_and_embed.py:20-26
  *  - P7 minFulltextChars  — preprocessing/fulltext_enricher.py:67-68,211
  *  - P8 blankToNull       — preprocessing/fulltext_enricher.py:76
  *  - P9 pmcidCanonical    — sources/pmc.py:162,245-251
  */
object Norm {

  /** Case-insensitive `https?://(dx.)?doi.org/` prefix, as in doi_utils.py:15. */
  val DoiPrefixRe = "(?i)^https?://(dx\\.)?doi\\.org/"

  /** First DOI-shaped substring, as in doi_utils.py:9. */
  val DoiRe = "(?i)10\\.\\d{4,9}/\\S+"

  private def emptyToNull(c: Column): Column = when(c === "", lit(null)).otherwise(c)

  /** P1: trim, strip doi.org URL prefix, drop zero-width spaces, trim,
    * lowercase, ""→null — in the reference's exact order (doi_utils.py:11-17):
    * the pre-trim matters because the prefix regex is anchored. */
  def normalizeDoi(c: Column): Column = {
    val stripped = regexp_replace(regexp_replace(wsTrim(c), DoiPrefixRe, ""), "\u200B", "")
    emptyToNull(lower(wsTrim(stripped)))
  }

  /** The full `str.isspace()` character set Python's str.strip() removes:
    * ASCII whitespace, the C0 separators (0x1c-0x1f), NEL, NBSP, and the
    * Unicode space separators. Shared with the DuckDB oracle fragments
    * (as chr() concatenations, see [[duckWsSet]]) so both engines trim
    * identically. */
  val PythonWhitespace: String =
    "\u0009\u000a\u000b\u000c\u000d\u001c\u001d\u001e\u001f\u0020\u0085\u00a0\u1680" +
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a" +
    "\u2028\u2029\u202f\u205f\u3000"

  /** DuckDB expression producing [[PythonWhitespace]] without raw control
    * characters in the SQL text (DuckDB chr() is codepoint-based). */
  def duckWsSet: String = PythonWhitespace.map(c => s"chr(${c.toInt})").mkString(" || ")

  /** Python str.strip() equivalent: plain `trim` removes only 0x20; this
    * removes the full Unicode whitespace set (both Spark's and DuckDB's
    * trim are codepoint-aware over the trim-character string). */
  private def wsTrim(c: Column): Column = trim(c, PythonWhitespace)

  /** P2: remove braces, collapse whitespace runs, trim, ""→null. */
  def stripBraces(c: Column): Column = {
    val noBraces = regexp_replace(c, "[{}]", "")
    emptyToNull(trim(regexp_replace(noBraces, "\\s+", " ")))
  }

  /** P3: first `10.NNNN/...` match anywhere in the string, else null. */
  def doiExtract(c: Column): Column = emptyToNull(regexp_extract(c, DoiRe, 0))

  /** P8: non-blank string or null. */
  def blankToNull(c: Column): Column = emptyToNull(trim(c))

  /** P9: digits-only PMCID re-prefixed with "PMC". */
  def pmcidCanonical(c: Column): Column =
    concat(lit("PMC"), regexp_replace(c, "[^0-9]", ""))

  /** P5: doc id = normalized DOI, else "hash:" + first 16 hex of
    * sha256(title + "|" + journal). `concat_ws` treats nulls as "" like the
    * reference's f-string over possibly-empty fields. */
  def docId(doiNorm: Column, title: Column, journal: Column): Column =
    when(doiNorm.isNotNull, doiNorm)
      .otherwise(concat(lit("hash:"),
        substring(sha2(concat_ws("|", coalesce(title, lit("")), coalesce(journal, lit(""))), 256), 1, 16)))

  /** P4: lenient Article projection — id/pmcid/pmid and full_text/text/body
    * coalescing funnels; keeps the whole raw record as a `meta` struct.
    * Missing source columns are treated as null (normalize.py:40-46). */
  def coalesceArticle(df: DataFrame): DataFrame = {
    def colOrNull(n: String): Column =
      if (df.columns.contains(n)) col(n).cast("string") else lit(null).cast("string")
    df.select(
      coalesce(colOrNull("id"), colOrNull("pmcid"), colOrNull("pmid")).as("id"),
      colOrNull("title").as("title"),
      colOrNull("journal").as("journal"),
      colOrNull("doi").as("doi"),
      coalesce(colOrNull("full_text"), colOrNull("text"), colOrNull("body")).as("full_text"),
      struct(df.columns.map(col).toIndexedSeq: _*).as("meta"))
  }

  /** P7: full-text length gate (fulltext_enricher.py:67-68, default 200). */
  def minFulltextChars(bodyText: Column, minChars: Int = 200): Column =
    length(bodyText) >= lit(minChars)

  /** P10: HTML entity multi-unescape to fixpoint, ≤3 rounds
    * (sources/springer.py:108-116 — double/triple-escaped XML payloads).
    * Pure Scala, used inside partition functions on the (dormant) Springer
    * path; covers the named XML/HTML core set plus numeric references. */
  private val NamedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'", "nbsp" -> " ")
  private val EntityRe = "&(#x?[0-9a-fA-F]+|[a-zA-Z]+);".r

  def htmlUnescapeOnce(s: String): String =
    EntityRe.replaceAllIn(s, m => {
      val body = m.group(1)
      val repl =
        if (body.startsWith("#x") || body.startsWith("#X"))
          scala.util.Try(new String(Character.toChars(Integer.parseInt(body.drop(2), 16)))).getOrElse(m.matched)
        else if (body.startsWith("#"))
          scala.util.Try(new String(Character.toChars(body.drop(1).toInt))).getOrElse(m.matched)
        else NamedEntities.getOrElse(body, m.matched)
      java.util.regex.Matcher.quoteReplacement(repl)
    })

  def htmlMultiUnescape(s: String, maxRounds: Int = 3): String = {
    var cur = s
    var i = 0
    while (i < maxRounds) {
      val next = htmlUnescapeOnce(cur)
      if (next == cur) return cur
      cur = next
      i += 1
    }
    cur
  }
}
