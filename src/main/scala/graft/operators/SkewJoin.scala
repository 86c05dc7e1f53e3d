package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual scale tool for the case
  * AQE's skew-join split cannot fix: AQE can split an oversized SHUFFLE
  * partition of the probe side, but every row of a hot key still meets
  * every matching build row in one task when the build side is also
  * large, and a single hot key that is >> one partition's worth of rows
  * serializes the stage on one straggler task.
  *
  * Shape: the probe (large, skewed) side gets a random salt in
  * `[0, buckets)`; the build side is replicated `buckets` times with
  * every salt value; the join key becomes (key, salt), so one hot key's
  * rows spread across `buckets` tasks. Row counts: probe unchanged,
  * build × buckets — so `buckets` stays small (8–32) and the build side
  * should be the smaller input. Inner and left_outer joins are
  * semantics-preserving under salting (each probe row still matches
  * exactly the same build rows, just in a salted task).
  *
  * The default salt is `rand(seed = 42)` — uniform, and deterministic
  * for a given partition layout (seeded per-partition), so reruns over
  * the same partitioning salt identically; it never reaches the output
  * either way. Pass a `saltExpr` (e.g.
  * `pmod(hash(col("other_col")), lit(buckets))`) to make the spread a
  * pure row function, reproducible across any partitioning.
  */
object SkewJoin {

  private val SaltCol = "_sj_salt"

  /** Join `probe` (large, skewed on `key`) with `build` (replicated).
    * Output columns: probe columns then build columns minus its key
    * (standard equi-join projection, no salt columns).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      buckets: Int, joinType: String = "inner",
      saltExpr: Option[Column] = None): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(joinType == "inner" || joinType == "left_outer" || joinType == "left",
      s"salting preserves inner/left_outer semantics only, got $joinType")
    val salted = probe.withColumn(SaltCol,
      saltExpr.getOrElse((rand(seed = 42) * buckets).cast("int")))
    val replicated = build
      .withColumn(SaltCol, explode(lit((0 until buckets).toArray)))
      .withColumnRenamed(key, s"_sj_$key")
    salted
      .join(replicated,
        col(key) === col(s"_sj_$key") && salted(SaltCol) === replicated(SaltCol),
        joinType)
      .drop(SaltCol).drop(s"_sj_$key")
  }

  /** Hot-key statistics for deciding WHETHER to salt: top-n keys by row
    * count plus each key's share of the total — a key owning more than a
    * few partitions' worth of rows is the straggler signal. One
    * aggregation pass; run it on a sample for a quick look at a huge
    * input.
    */
  def keySkew(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    // Total as a broadcast 1-row frame, NOT an unpartitioned window —
    // an empty over() would funnel every distinct key through a single
    // partition, which is exactly the pathology this helper diagnoses.
    val total = counts.agg(sum(col("n")).as("_sj_total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", col("n").cast("double") / col("_sj_total"))
      .drop("_sj_total")
      .orderBy(col("n").desc, col(key)) // top-n: TakeOrderedAndProject
      .limit(topN)
  }
}
