package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.vectors

/** Binary (1-bit) embedding quantization with Hamming-distance coarse
  * ranking — the most aggressive point on the storage/recall curve
  * ([[ScalarQuant]] is the 8-bit point, [[ProductQuantizer]] the
  * codebook one): keep only each component's SIGN, packed 32 per long
  * word, and rank candidates by popcount of the XOR. For unit-norm-ish
  * embedding spaces sign agreement tracks angular closeness (the
  * random-hyperplane bound behind [[Similarity.lshBuckets]], here with
  * the coordinate axes as the hyperplanes), so a Hamming top-C coarse
  * pass followed by an exact rescore of C candidates recovers most of
  * the exact top-k at a fraction of the scan bytes.
  *
  * 100-TB shape: the signature column is 1 bit/dim of information (64
  * dims → two long words vs 64 floats — 16 bytes vs 256 on disk), the
  * coarse pass reads ONLY it (column pruning keeps the float vectors
  * unread until rescore), and the distance is two codegen'd integer
  * ops per word — no UDF, no floating point, SIMD-friendly. The
  * rescore reads full vectors for just C rows. Bits are packed 32 per
  * 64-bit word deliberately: bit 31 stays off every word's sign
  * position, so the identical arithmetic is expressible in engines
  * whose left-shift refuses to reach the BIGINT sign bit (DuckDB) —
  * the signature, the distance, and the two-stage result are all
  * oracle-checkable (v15).
  */
object BinaryQuant {

  /** Bits packed per 64-bit word — 32, not 64, so no shift ever lands
    * on a sign bit in any engine (see class doc).
    */
  val BitsPerWord = 32

  /** Adds `bsig` (array<bigint>, ⌈dim/32⌉ words): bit i of word w is
    * set iff component 32w+i is strictly positive (zero and negative
    * pack to 0 — ties at exactly 0.0 are sign-ambiguous and must fold
    * the same way in every engine). Fixed output name, loud collision
    * (the quantize/IntervalJoin rule).
    */
  def quantize(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    require(!df.columns.contains("bsig"),
      "quantize emits a 'bsig' column but the input already has one — " +
        "rename it first")
    val words = (dim + BitsPerWord - 1) / BitsPerWord
    val sig = array((0 until words).map { w =>
      val hi = math.min(BitsPerWord, dim - w * BitsPerWord)
      (0 until hi).map { i =>
        when(element_at(col(vecCol), w * BitsPerWord + i + 1) > lit(0.0f),
          lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ bitwiseOR _)
    }: _*)
    df.withColumn("bsig", sig)
  }

  /** Driver-side packing of a probe vector — same bit layout as
    * [[quantize]], for the query literal.
    */
  def pack(v: Array[Float]): Array[Long] = {
    require(v.nonEmpty)
    val words = (v.length + BitsPerWord - 1) / BitsPerWord
    val out = new Array[Long](words)
    var i = 0
    while (i < v.length) {
      if (v(i) > 0.0f) out(i / BitsPerWord) |= 1L << (i % BitsPerWord)
      i += 1
    }
    out
  }

  /** Hamming distance between two packed signatures: Σ popcount(xor)
    * over aligned words. Pure integer codegen (bit_count is a JVM
    * Long.bitCount intrinsic under whole-stage codegen).
    */
  def hamming(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, h) => acc + h)

  /** Two-stage search: Hamming top-`candidates` on the packed
    * signatures (ties to the smaller id), exact cosine rescore of the
    * candidate set, top-k. Returns (id, hamming, score). Recall rises
    * with `candidates` and is exact in the limit candidates = |corpus|
    * (spec-pinned, [[Similarity.knnQuantizedRescore]]'s contract).
    */
  def knnRescore(corpus: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, candidates: Int): DataFrame = {
    require(k >= 1 && candidates >= k,
      s"need candidates >= k >= 1, got k=$k candidates=$candidates")
    quantize(corpus, vecCol, query.length)
      .withColumn("hamming", hamming(col("bsig"), lit(pack(query))))
      .orderBy(col("hamming"), col(idCol))
      .limit(candidates)
      .withColumn("score", vectors.cosineSimilarity(col(vecCol), lit(query)))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("hamming"), col("score"))
  }
}
