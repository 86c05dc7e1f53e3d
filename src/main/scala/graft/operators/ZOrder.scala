package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — multi-dimensional scan pruning for the
  * box predicates no single sort order can serve. Sorting a table by
  * one column makes parquet row-group min/max stats tight on THAT
  * column only; interleaving the bits of two columns into one sort key
  * makes a z-ordered run of rows cover a small RECTANGLE of the
  * (a, b) domain, so the stats are tight on BOTH columns at once and a
  * pushed two-sided box filter lets the parquet reader skip almost
  * every row group — no partitioning by either column, no index
  * structure, just layout. This is the clustering scheme behind
  * Delta/Iceberg OPTIMIZE ZORDER, expressed here as a pure projection
  * plus a range repartition, both engine-native.
  *
  * 100-TB shape: the one-time clustering write is a range exchange on
  * the z-key (sampled split points, so skew in either column cannot
  * hot-spot a writer task) followed by a within-partition sort —
  * exactly the shuffle a single-column sort would pay. Every
  * subsequent box query reads its selectivity's worth of row groups
  * instead of the full table; the win compounds with column pruning
  * and rides entirely on `PushedFilters` (ZOrderSpec pins the decoded
  * row count against a hash-scattered layout of the same rows).
  *
  * The key itself is 2·`bits` codegen'd long ops per row — no UDF —
  * and the identical arithmetic is expressible in ANSI SQL, so the key
  * column is cross-engine reproducible and oracle-checkable (q28).
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative integer columns
    * into a Morton key: bit i of `a` lands at position 2i, bit i of `b`
    * at 2i+1. Monotone along each axis when the other is fixed, and
    * contiguous key ranges cover aligned rectangles — the property the
    * layout win rests on. Inputs outside [0, 2^bits) would silently
    * alias distant points into the same rectangle (a clustering
    * corruption no result would ever flag, since the key is "just" a
    * sort key), so out-of-range values fail loudly instead.
    */
  def zkey(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"zkey bits must lie in [1, 31], got $bits")
    val lim = 1L << bits
    def spread(c: Column, offset: Int): Seq[Column] =
      (0 until bits).map { i =>
        shiftleft(shiftrightunsigned(c, i).bitwiseAND(lit(1L)), 2 * i + offset)
      }
    val z = (spread(a.cast("long"), 0) ++ spread(b.cast("long"), 1))
      .reduce(_ bitwiseOR _)
    when(a.cast("long").between(0L, lim - 1) &&
        b.cast("long").between(0L, lim - 1), z)
      .otherwise(raise_error(concat(
        lit(s"zkey input outside [0, $lim): ("), a, lit(", "), b, lit(")"))))
  }

  /** Write `df` z-order-clustered on (`a`, `b`): stamp the Morton key,
    * range-repartition on it (sampled split points — skew-proof), sort
    * within partitions, write parquet. `outPartitions` sizes the file
    * count; at cluster scale pick total bytes / target file size. The
    * key is persisted as column `zkey` — it costs 8 bytes/row and lets
    * incremental appends and later re-clustering reuse it.
    */
  def writeZOrdered(df: DataFrame, a: String, b: String, path: String,
      bits: Int = 16, outPartitions: Int = 0): Unit = {
    require(!df.columns.contains("zkey"),
      "input already carries a 'zkey' column — drop or rename it first")
    val keyed = df.withColumn("zkey", zkey(col(a), col(b), bits))
    val ranged =
      if (outPartitions > 0) keyed.repartitionByRange(outPartitions, col("zkey"))
      else keyed.repartitionByRange(col("zkey"))
    ranged.sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(path)
  }
}
