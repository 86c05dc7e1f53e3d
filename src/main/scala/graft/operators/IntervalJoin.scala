package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Interval join: every (left, right) pair in the same key group with
  * `right.time` in `(left.time, left.time + window]` — the bounded
  * look-ahead join of event pipelines (view → clicks it triggered,
  * impression → conversions inside the attribution window). The batch
  * face of the streaming interval join in
  * [[graft.streaming.EventStreams]].
  *
  * Spark's own planner turns the naive formulation — an equi-join on the
  * keys plus range predicates — into a sort-merge join on the keys ONLY,
  * then filters the full per-key cross product: a hot key with m lefts
  * and n rights materializes m×n rows no matter how narrow the window.
  * This operator instead buckets time at the window width: a right row
  * at t lives in bucket ⌊t/w⌋; every left row probes its own bucket and
  * the next one (any match satisfying t_r ∈ (t_l, t_l+w] lies in one of
  * the two — t_r − t_l ≤ w means ⌊t_r/w⌋ ∈ {⌊t_l/w⌋, ⌊t_l/w⌋+1}).
  * Joining on (keys, bucket) bounds each join group to one window-width
  * of data per key, so the worst case is events-per-window² per key,
  * not events-per-key². Left rows are exploded into exactly 2 bucket
  * probes (constant fan-out, shuffle ≤ 2×|L| + |R|), and the exact
  * range predicate filters inside the join.
  */
object IntervalJoin {

  /** @param rightPayload right columns carried onto each matched pair,
    *                     emitted as `prefix+name`.
    * @param windowUs     look-ahead width in the time column's unit
    *                     (exclusive at t, inclusive at t+windowUs).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, windowUs: Long, rightPayload: Seq[String],
      prefix: String = "iv_"): DataFrame = {
    require(keys.nonEmpty && windowUs > 0 && rightPayload.nonEmpty)
    // timeCol is already carried as prefix+timeCol; a payload copy would
    // emit a second identically-named column and break every downstream
    // reference to it.
    require(!rightPayload.contains(timeCol),
      s"rightPayload must not repeat timeCol '$timeCol' — it is emitted as " +
        s"'$prefix$timeCol' already")
    val bucket = "_iv_bucket"
    val rTime = prefix + timeCol
    // Floor-div without the double-precision trap: Column./ on longs is
    // IEEE division, and a raw cast of t/w can truncate an x.9999…
    // artifact. Subtracting the remainder first makes the numerator an
    // exact multiple of w (both < 2^53), so the division is exact and
    // the long cast is the true floor for nonneg epoch values. Negative
    // (pre-epoch) times are ALSO correct: `%` is sign-of-dividend, so
    // this truncates toward zero there instead of flooring — but both
    // sides bucket through this same function, and trunc-bucketing is
    // still a monotone step function whose boundaries are >= w apart
    // (the zero-straddling bucket is simply 2w−1 wide), so an interval
    // of width w still spans at most two consecutive bucket ids and the
    // two-probe containment argument above is unchanged.
    def bucketOf(t: Column): Column =
      ((t - t % windowUs) / windowUs).cast("long")
    val probes = left.withColumn(bucket,
      explode(array(bucketOf(col(timeCol)), bucketOf(col(timeCol)) + 1)))
    val build = right.select(
      (keys.map(col) :+ col(timeCol).as(rTime)) ++
        rightPayload.map(c => col(c).as(prefix + c)): _*)
      .withColumn(bucket, bucketOf(col(rTime)))
    probes
      .join(build, keys :+ bucket)
      .filter(col(rTime) > col(timeCol) &&
        col(rTime) <= col(timeCol) + windowUs)
      .drop(bucket)
  }
}
