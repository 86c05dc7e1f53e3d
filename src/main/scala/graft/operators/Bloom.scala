package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions.hash32

/** Declarative Bloom filter — the approximate-membership primitive
  * behind q38's semi-join prefilter, as a reusable operator: [[buildRow]]
  * folds a key frame into ONE row holding the bit array (bit_or
  * aggregation, so the build partial-aggregates map-side and shuffles
  * ≤ mBits/32 words, never keys), and [[mightContain]] is a pure
  * row-local probe expression over that broadcast row — a forall of J
  * bit tests riding the scan.
  *
  * Hashing is md5 double hashing (Kirsch–Mitzenmacher: pos_i =
  * h1 + i·h2 mod m) over [[hashes]]-derived columns, which both engines
  * replay exactly — a DuckDB oracle reproduces every bit (q38 does).
  * Words pack 32 usable bits per BIGINT because DuckDB's `<<` overflows
  * at bit 63, and parity beats density here.
  *
  * Contract: NO false negatives ever (a key folded into the build is
  * always reported present — BloomSpec fuzzes this across layouts and
  * (m, j) shapes); false positives at the standard (1 − e^(−jn/m))^j
  * rate — callers keep answers exact with a residual join over the
  * candidates, as q38 does. Size m at ~10–16 bits per expected key.
  */
object Bloom {

  /** The double-hashing pair for `key`, as columns. The same pair must
    * feed [[buildRow]]'s internals and the caller's [[mightContain]]
    * probe — both derive from the key's STRING form via md5, so any
    * key type with a stable string rendering works.
    */
  def hashes(key: Column): (Column, Column) =
    (hash32(key.cast("string")),
      hash32(concat(key.cast("string"), lit("#b"))))

  /** Fold `keys(keyCol)` into a single-row frame with column `bloom`:
    * an array of mBits/32 BIGINT words (32 bits used per word), ready
    * to `broadcast(...)`-crossJoin into the probing scan.
    */
  def buildRow(keys: DataFrame, keyCol: String, mBits: Int,
      j: Int = 3): DataFrame = {
    require(mBits > 0 && mBits % 32 == 0,
      s"mBits must be a positive multiple of 32, got $mBits")
    require(j >= 1, s"need at least one hash function, got $j")
    val (kh1, kh2) = hashes(col(keyCol))
    val w = mBits / 32
    keys
      .select(explode(sequence(lit(0), lit(j - 1))).as("i"),
        kh1.as("h1"), kh2.as("h2"))
      .select(((col("h1") + col("i") * col("h2")) % mBits).as("p"))
      .select(expr("p div 32").as("w"),
        expr("shiftleft(cast(1 as bigint), cast(p % 32 as int))").as("m"))
      .groupBy(col("w")).agg(expr("bit_or(m)").as("word"))
      .agg(map_from_entries(collect_list(struct(col("w"), col("word"))))
        .as("wm"))
      .select(transform(sequence(lit(0L), lit((w - 1).toLong)),
        wi => coalesce(element_at(col("wm"), wi), lit(0L))).as("bloom"))
  }

  /** Row-local membership probe. `h1Col`/`h2Col` name columns the
    * caller derived with [[hashes]] from the probe key; `bloomCol`
    * names the broadcast [[buildRow]] array. True = candidate (possible
    * false positive); false = DEFINITELY absent. Spelled as SQL text
    * because the shift amount is per-row and the Column-API
    * shiftright takes only literal shifts.
    *
    * `j` is a compile-time constant, so the J bit tests UNROLL into a
    * plain AND chain instead of a `forall` lambda — value-identical
    * (same Kirsch–Mitzenmacher positions, same bit reads; the q38/d64
    * oracles replay either spelling), but decisively different in the
    * engine: a higher-order function blocks whole-stage codegen and
    * runs INTERPRETED, and when the caller's probe sits directly over
    * the projection that derives fp/h1/h2 (no exchange between them —
    * exactly the d65 serving shape), the collapsed interpreted tree
    * re-evaluates the md5 chain per probe term, per row. Measured on
    * d65 at sf0.1: 3.4 s forall → ~1 s unrolled.
    */
  def mightContain(h1Col: String, h2Col: String, bloomCol: String,
      mBits: Int, j: Int = 3): Column = {
    require(mBits > 0 && mBits % 32 == 0,
      s"mBits must be a positive multiple of 32, got $mBits")
    require(j >= 1, s"need at least one hash function, got $j")
    Seq(h1Col, h2Col, bloomCol).foreach(c =>
      require(!c.contains("`") && c.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"mightContain needs simple column identifiers, got: $c"))
    (0 until j).map { i =>
      expr(s"""((shiftright(element_at($bloomCol,
              |   cast(((($h1Col + $i * $h2Col) % $mBits) div 32) as int) + 1),
              | cast((($h1Col + $i * $h2Col) % $mBits) % 32 as int)) & 1) = 1)"""
        .stripMargin)
    }.reduce(_ && _)
  }

  /** Standard Bloom sizing for `n` expected keys at false-positive rate
    * `fpp`: m = ⌈−n·ln(fpp)/ln²2⌉ rounded up to a multiple of 32 (the
    * word-packing contract), j = max(1, round(m/n·ln 2)).
    */
  def sizeFor(n: Long, fpp: Double): (Int, Int) = {
    require(n > 0, s"need n > 0 keys, got $n")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val ln2 = math.log(2)
    val raw = math.ceil(-n * math.log(fpp) / (ln2 * ln2)).toLong
    val m = (((raw + 31) / 32) * 32).toInt
    val j = math.max(1, math.round(m.toDouble / n * ln2).toInt)
    (m, j)
  }

  /** A stored filter: the 1-row bloom frame plus the (mBits, j, nKeys)
    * shape it was built with — probing with a different shape would be
    * silent garbage, so the shape persists WITH the bits and [[read]]
    * hands both back together.
    */
  final case class StoredBloom(row: DataFrame, mBits: Int, j: Int,
      nKeys: Long)

  /** Persist a [[buildRow]] result (the KmvState/q27 pattern applied to
    * the Bloom state): one parquet row carrying the word array and its
    * shape. The nightly-decontamination use case — a static eval set's
    * filter is folded ONCE, stored, and every later run [[read]]s the
    * row instead of re-aggregating the eval set.
    */
  def write(bloomRow: DataFrame, path: String, mBits: Int, j: Int,
      nKeys: Long): Unit =
    bloomRow.select(col("bloom"), lit(mBits).as("m_bits"), lit(j).as("j"),
        lit(nKeys).as("n_keys"))
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)

  /** Load a [[write]]-stored filter; fails loudly on a malformed row. */
  def read(spark: SparkSession, path: String): StoredBloom = {
    val df = spark.read.parquet(path)
    val meta = df.select(col("m_bits"), col("j"), col("n_keys")).head()
    StoredBloom(df.select(col("bloom")),
      meta.getInt(0), meta.getInt(1), meta.getLong(2))
  }

  /** Union two filters of IDENTICAL shape: bit_or word by word — a
    * bloom over keys(A) ∪ keys(B), exactly what folding the union
    * would build (bit_or is associative/commutative/idempotent, so
    * merge trees and re-merges are all equivalent; BloomSpec pins
    * merged ≡ direct). Shape mismatch raises at execution — merging
    * filters with different (m, j) has no meaning.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("bloom").as("_ba"))
      .crossJoin(b.select(col("bloom").as("_bb")))
      .select(when(size(col("_ba")) =!= size(col("_bb")),
          raise_error(concat(lit("cannot merge bloom filters of widths "),
            size(col("_ba")).cast("string"), lit(" and "),
            size(col("_bb")).cast("string"))))
        .otherwise(zip_with(col("_ba"), col("_bb"), (x, y) => x.bitwiseOR(y)))
        .as("bloom"))
}
