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

  /** Deterministic 32-bit-range hash of a string column (see class doc). */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Single-space tokenization (the documents table is single-spaced). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles: m tokens → m-n+1 shingles joined by spaces. */
  def shingles(toks: Column, n: Int): Column =
    transform(sequence(lit(0), size(toks) - n), i =>
      concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))

  /** MinHash value for hash family member `band`: min over shingles of
    * hash32("<band>:" + shingle). Distinct band ids give independent-ish
    * hash functions from the one MD5 core.
    */
  def minhash(shinglesCol: Column, band: Int): Column =
    array_min(transform(shinglesCol, s => hash32(concat(lit(s"$band:"), s))))

  /** Exact Jaccard similarity of two *distinct-element* array columns. */
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
