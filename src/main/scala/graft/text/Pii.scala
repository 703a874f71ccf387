package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training corpora: emails, phone numbers, IPv4
  * addresses, and chain addresses are replaced by type tokens before
  * text reaches a model (the standard C4/RefinedWeb-style hygiene
  * pass).
  *
  * Pure map-side Column transforms — no shuffle, no state; the pass
  * composes with any scan and keeps whole-stage codegen (built-in
  * `regexp_replace`/`regexp_extract_all`, no UDFs).
  *
  * The patterns stay inside the regex subset that Java (Spark) and
  * RE2-style engines interpret identically — char classes, bounded
  * repetition, `\b` — so a DuckDB/ClickHouse oracle reproduces the
  * redaction byte-for-byte.
  */
object Pii {

  /** (pattern, replacement token), applied in order. `(?i)` keeps the
    * email rule case-insensitive in both Java and RE2 — real PII is
    * not lowercase-normalized.
    */
  val rules: Seq[(String, String)] = Seq(
    ("(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
    ("\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b", "<PHONE>"),
    ("\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("0x[0-9a-fA-F]{40}", "<ADDR>"))

  /** Text with every rule's matches replaced by its token. */
  def redact(text: Column): Column =
    rules.foldLeft(text) { case (c, (pat, tok)) => regexp_replace(c, pat, tok) }

  /** Count of matches for one rule class (0-based index into [[rules]]). */
  def matchCount(text: Column, rule: Int): Column =
    size(regexp_extract_all(text, lit(rules(rule)._1), lit(0))).cast("long")
}
