package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by dedup / fingerprint / analysis
  * queries. Everything here composes built-in codegen'd functions — no
  * UDFs — so the expressions run inside the scan's whole-stage codegen
  * and the only shuffles are the ones the calling query asks for.
  *
  * Cross-engine hash contract: [[hash32]] is the first 8 hex digits of
  * MD5 read as an unsigned 32-bit value in a long. MD5 is standard, so
  * any engine reproduces it (DuckDB: `CAST(('0x' || substr(md5(s),1,8))
  * AS BIGINT)`), which keeps minhash/fingerprint results oracle-checkable
  * — unlike engine-private hashes (Spark's murmur3 `hash()` seeds differ
  * from other engines').
  */
object TextFunctions {

  /** Deterministic 32-bit-range hash of a string column (see class doc).
    * Delegates to the native [[graft.functions.Hash32]] expression —
    * bit-identical to the declarative
    * `conv(substring(md5(c), 1, 8), 16, 10).cast("long")` (the first 8
    * hex digits ARE the first 4 digest bytes), but one digest + byte
    * fold per call instead of hex-formatting a 32-char string and
    * string-parsing the slice back through `conv` (~3× on hash-dense
    * projections, e.g. q26's four cents-hash columns; pinned ≡ the
    * declarative form in TextContractSpec).
    */
  def hash32(c: Column): Column = graft.functions.text.hash32(c)

  /** The declarative spelling of [[hash32]] — the cross-engine contract
    * the oracles replay. Kept callable so the equivalence is testable
    * against the native expression.
    */
  def hash32Declarative(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Single-space tokenization (the documents table is single-spaced). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles: m tokens → m-n+1 shingles joined by spaces;
    * empty when m < n (short documents MUST yield an empty list, matching
    * the DuckDB `range` oracle — `sequence(0, negative)` counts DOWN in
    * Spark, which is how the old declarative form crashed on them).
    * Delegates to the native [[graft.functions.Shingles]] expression: one
    * tight codegen'd loop per row instead of an interpreted higher-order
    * lambda doing n element probes per shingle — this projection runs
    * twice per near-dup pass, so it is the scan-side cost floor of
    * d05/d06/d19.
    */
  def shingles(toks: Column, n: Int): Column =
    // coalesce preserves the declarative form's null contract: a null
    // token array (null text) yields an EMPTY shingle list, not null —
    // size()/posexplode callers rely on the empty-array behavior.
    coalesce(graft.functions.text.shingles(toks, n),
      typedLit(Seq.empty[String]))

  /** MinHash value for hash family member `band` (0..3): min over
    * shingles of the band's hash, where the 4 band hashes are the four
    * disjoint 8-hex-digit slices of ONE md5 digest — 4 independent
    * 32-bit hash functions for the price of a single digest per shingle
    * (md5 dominates minhash cost; one digest instead of four is the
    * difference between the signature stage being scan-bound or
    * hash-bound at corpus scale). DuckDB mirror:
    * `CAST(('0x'||substr(md5(s), 1+8*band, 8)) AS BIGINT)`.
    */
  def minhash(shinglesCol: Column, band: Int): Column = {
    require(band >= 0 && band < 4, "md5 yields 4 independent 32-bit slices")
    array_min(transform(shinglesCol, s =>
      conv(substring(md5(s), 1 + 8 * band, 8), 16, 10).cast("long")))
  }

  /** Exact Jaccard similarity of two *distinct-element* array columns.
    * NOTE for hot paths: this inlines array_intersect twice (numerator +
    * union denominator); when scoring many pairs, materialize
    * `size(array_intersect(a, b))` as its own projection step and derive
    * jaccard from it (see d06) so the intersection runs once per row.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b)))
  }

  /** Count of tokens that are stopwords (tiny inline list; real pipelines
    * would broadcast a language-specific set).
    */
  def stopwordCount(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => stopwords.map(t === _).reduce(_ || _))).cast("long")

  /** Sum of per-token character lengths (exact integer arithmetic). */
  def tokenCharSum(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t))
}
