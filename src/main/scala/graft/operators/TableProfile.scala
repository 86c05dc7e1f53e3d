package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.text.{TextFunctions => TF}

/** Incremental per-column table profile — the statistics-catalog
  * maintenance primitive behind q36 and the streaming profile sink:
  * each data slice (ingest batch, shard, micro-batch) reduces to ONE
  * partial-profile row (row count + per-column null count, exact
  * DECIMAL sum, min/max, and a mergeable KMV distinct state), and any
  * set of partial rows folds to the exact global profile WITHOUT
  * rescanning data — counts and decimal sums add, min/max fold,
  * KMV states merge ([[Sketches.KmvMerge]], a set function, so the
  * folded estimate equals the direct one under ANY slicing).
  *
  * 100-TB shape: the partial is one partial+final aggregate over the
  * slice (every statistic map-side combines); the fold runs over
  * #slices rows — catalog-sized, not data-sized. The oracle for q36
  * computes only the DIRECT profile; hash-equality proves fold ∘
  * partial ≡ direct for every statistic.
  */
object TableProfile {

  /** One partial-profile row for `df` over numeric `cols` (double
    * columns; values hashed at cent precision for the distinct
    * sketch, matching q22/q26's canonical cents-hash).
    */
  def partial(df: DataFrame, cols: Seq[String], k: Int): DataFrame = {
    val a = partialAggs(cols, k)
    df.agg(a.head, a.tail: _*)
  }

  /** [[partial]] per slice: one partial row per distinct value of
    * `sliceCol` (q36's shard key). The slice column itself is dropped
    * — [[fold]] needs only the statistics.
    */
  def partialBy(df: DataFrame, sliceCol: org.apache.spark.sql.Column,
      cols: Seq[String], k: Int): DataFrame = {
    val a = partialAggs(cols, k)
    df.groupBy(sliceCol.as("_tp_slice")).agg(a.head, a.tail: _*)
      .drop("_tp_slice")
  }

  private def partialAggs(cols: Seq[String], k: Int) = {
    require(cols.nonEmpty, "profile needs at least one column")
    val st = udaf(new Sketches.KmvState(k),
      org.apache.spark.sql.Encoders.scalaLong)
    def centsHash(c: String) = Sketches.kmvInput(
      TF.hash32(floor(col(c) * lit(100.0) + lit(0.5))
        .cast("long").cast("string")))
    count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nn"),
        st(centsHash(c)).as(s"${c}_st"),
        min(col(c)).cast("double").as(s"${c}_min"),
        max(col(c)).cast("double").as(s"${c}_max"),
        sum(col(c).cast(DecimalType(12, 2))).as(s"${c}_sumd"))
    }
  }

  /** Folds partial rows into the presentation profile: one row per
    * column — (column_name, n_shards, n_rows, n_null, n_distinct_est,
    * min_v, max_v, sum_v). Decimal sums stay decimal until this final
    * fold, so re-summing loses nothing.
    */
  def fold(partials: DataFrame, cols: Seq[String], k: Int): DataFrame = {
    val mg = udaf(new Sketches.KmvMerge(k),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[java.lang.Long]]())
    val aggs = Seq(count(lit(1)).as("n_shards"),
      sum(col("n_rows")).cast("long").as("n_rows")) ++ cols.flatMap { c =>
      Seq(sum(col(s"${c}_nn")).cast("long").as(s"${c}_nn"),
        mg(col(s"${c}_st")).as(s"${c}_nd"),
        min(col(s"${c}_min")).as(s"${c}_min"),
        max(col(s"${c}_max")).as(s"${c}_max"),
        sum(col(s"${c}_sumd")).cast("double").as(s"${c}_sum"))
    }
    val stackExpr = cols.map(c =>
      s"'$c', ${c}_nn, ${c}_nd, ${c}_min, ${c}_max, ${c}_sum")
      .mkString(s"stack(${cols.length}, ", ", ", ")")
    partials
      .agg(aggs.head, aggs.tail: _*)
      .select(col("n_shards"), col("n_rows"), expr(s"$stackExpr AS " +
        "(column_name, n_null, n_distinct_est, min_v, max_v, sum_v)"))
      .select(col("column_name"), col("n_shards"), col("n_rows"),
        col("n_null"), col("n_distinct_est"), col("min_v"), col("max_v"),
        col("sum_v"))
      .orderBy(col("column_name"))
  }
}
