package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII / URL scrubbing for corpus pipelines: detect and redact email
  * addresses, URLs, and IPv4 literals before training-data export.
  *
  * Patterns are deliberately conservative ASCII regexes with no
  * lookarounds or escapes beyond `\.` — the same pattern text means
  * the same thing to Java regex (Spark) and RE2 (DuckDB/most
  * scanners), so redaction is engine-portable and oracle-checkable.
  * Everything is a narrow `regexp_replace`/`regexp_extract_all`
  * expression: no shuffle, rides the scan, stays in codegen.
  *
  * Redaction order matters and is fixed: emails, then URLs, then
  * IPs — the replacement tokens contain no characters the later
  * patterns can match, so a URL containing an IP redacts as one
  * `<URL>` and a dotted version string inside an already-redacted
  * span can't leak. The email case is the OPPOSITE: an email-shaped
  * credential inside a URL authority (`http://user@host.tld/`)
  * redacts email-first, leaving `http://<EMAIL>/` — a mangled URL
  * remnant, NOT one `<URL>`. That is deliberate: the email is the
  * more sensitive span, and an URL-first order would bury it inside
  * `<URL>` where a later relaxation of the URL pattern could leak
  * it. Counts are taken on the RAW text, before any replacement.
  * Known limitation (documented, standard for regex scrubbers): an
  * IPv4-shaped substring inside a longer dotted run (e.g. a
  * `1.2.3.4.5` version) matches its first four octets.
  *
  * Reference scope: no counterpart in the reference; part of the
  * training-data extension surface of the build brief.
  */
object ScrubOps {

  /** `local@domain.tld` — alnum/dot/underscore/percent/plus/hyphen
    * local part, alnum/dot/hyphen domain, alpha TLD of 2+. */
  val EmailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** `http(s)://` then an explicit URL-safe character class (NOT
    * `\\S+`, so the match can't swallow trailing punctuation-only
    * tokens differently across engines). */
  val UrlPattern: String =
    "https?://[A-Za-z0-9._~:/?#@!$&*+,;=%-]+"

  /** Four dot-separated 1–3 digit runs. */
  val Ipv4Pattern: String =
    "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Occurrences of `pattern` in `text` (0 for no match). */
  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  def countEmails(text: Column): Column = countMatches(text, EmailPattern)
  def countUrls(text: Column): Column = countMatches(text, UrlPattern)
  def countIpv4(text: Column): Column = countMatches(text, Ipv4Pattern)

  /** Redact all three PII classes in the fixed order described above. */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noUrl = regexp_replace(noEmail, UrlPattern, "<URL>")
    regexp_replace(noUrl, Ipv4Pattern, "<IP>")
  }
}
