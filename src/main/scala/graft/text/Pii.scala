package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing — the redaction pass a training-data pipeline runs before
  * any text leaves the ingest boundary (reference scope: document prep
  * before indexing, `kfp/redhat-product-documentation-ingestor/
  * ingestion-pipeline.py` cleans documents before embedding; redaction is
  * the corpus-scale sibling of that cleanup).
  *
  * All patterns are restricted to the syntax subset that Java's
  * `java.util.regex` (Spark's `regexp_replace`/`regexp_extract_all`) and
  * RE2 (the DuckDB oracle's engine) interpret identically: character
  * classes, bounded repetition and `\b` ASCII word boundaries — no
  * backreferences, no lookaround. That keeps the scrub oracle-comparable
  * and (on the Spark side) fully codegen'd: `scrub` is three chained
  * `regexp_replace` projections, row-local, no UDF, no shuffle — at
  * 100 TB it rides the scan.
  *
  * Replacement tokens contain no digits or `@`/`.`-digit runs, so `scrub`
  * is idempotent (scrubbing scrubbed text is a no-op; pinned by PiiSpec).
  */
object Pii {

  /** Practical email shape (lowercased corpora): local@domain.tld. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** Dotted-quad IPv4 (no range check — redaction favors recall). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Phone-like digit groups: 555-0042 or 555-867-5309 shapes. */
  val PhoneRe = "\\b\\d{3}-(\\d{3}-)?\\d{4}\\b"

  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"
  val PhoneToken = "<PHONE>"

  /** Redact all three classes. Email first (its domain would otherwise
    * leave dotted fragments the IP rule could half-match), then IPs,
    * then phones.
    */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, EmailToken),
        Ipv4Re, IpToken),
      PhoneRe, PhoneToken)

  /** Occurrences of `pattern` in the ORIGINAL text (audit counters). */
  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Luhn (mod-10) checksum validity of a fixed-length digit string —
    * the CHECKSUM-gated PII class: a 16-digit run is only a payment
    * card if its check digit verifies, and redacting every 16-digit
    * number would destroy order ids and hashes that merely look like
    * cards. Pattern-only redaction (d34's classes) cannot make that
    * distinction; this can, with zero false redactions on random
    * digit runs in 9 of 10 cases. Spelled as a pure higher-order
    * expression (aggregate over transform — row-local, codegen-free
    * but shuffle-free), with the identical arithmetic replayable in
    * any engine's list primitives: double every second digit from the
    * right, subtract 9 when the double exceeds 9, sum ≡ 0 (mod 10).
    * The column is named (not a Column) because the digit positions
    * are read inside a lambda, where only a resolvable name composes;
    * the value must be exactly `len` digits (the caller's extractor
    * guarantees shape). The name is spliced backtick-quoted, so dots,
    * spaces, and hyphens resolve as the literal TOP-LEVEL column (not
    * a struct path); a name containing a backtick is rejected rather
    * than escaped.
    */
  def luhnValid(colName: String, len: Int): Column = {
    require(!colName.contains("`"),
      s"luhnValid cannot reference a column name containing a backtick: $colName")
    val d = s"CAST(substring(`$colName`, i, 1) AS INT)"
    val sum = expr(
      s"""aggregate(transform(sequence(1, $len), i ->
         | CASE WHEN ($len - i) % 2 = 1
         |  THEN IF($d * 2 > 9, $d * 2 - 9, $d * 2)
         |  ELSE $d END),
         | 0, (acc, x) -> acc + x)""".stripMargin.replaceAll("\n", " "))
    sum % 10 === 0
  }
}
