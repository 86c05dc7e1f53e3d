package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructType}

/** Exact global row numbers without the banished single-partition
  * Window.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY moves the
  * whole frame to ONE task — the shape Spark itself warns about and the
  * first thing that dies at 100 TB. The distributed form is the
  * classic two-pass rank:
  *
  *   1. range-repartition on the sort keys and sort within partitions
  *      (a real distributed sort: each partition holds a contiguous
  *      key range);
  *   2. count rows per partition — a partition-count-sized result
  *      (the only driver-side data in the operator);
  *   3. broadcast the prefix-sum offsets and stream each partition,
  *      assigning rank = partition offset + local index.
  *
  * The sorted frame is locally checkpointed before the two passes so
  * both jobs read the SAME materialized partitions — without the
  * barrier the count pass and the rank pass would each re-execute the
  * upstream plan, and range-boundary sampling would have to be assumed
  * deterministic across executions for ranks to be consistent.
  *
  * The rank-assignment pass runs row-at-a-time over `df.rdd` (no
  * codegen): callers rank AGGREGATED frames (per-customer revenue,
  * per-document scores), never the raw corpus, so the deserialization
  * cost is bounded by the entity count, and everything downstream of
  * the returned frame plans declaratively again.
  *
  * Sort keys must be a TOTAL order (break ties with a unique key) or
  * ranks within a tie group depend on partition-internal order.
  */
object Ranks {

  /** `df` plus a 1-based `rankCol` long column ordered by `sortKeys`.
    *
    * `partitions` defaults to the session's shuffle parallelism; pass
    * an explicit count to match a known downstream partitioning.
    */
  def globalRowNumber(df: DataFrame, sortKeys: Seq[Column],
      rankCol: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    require(sortKeys.nonEmpty, "globalRowNumber needs at least one sort key")
    val n =
      if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(n, sortKeys: _*)
      .sortWithinPartitions(sortKeys: _*)
      .localCheckpoint()
    val rdd = sorted.rdd
    val parts = rdd.getNumPartitions
    // (partitionId -> count): one long per partition on the driver.
    val counts = rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)),
        preservesPartitioning = true)
      .collect().toMap
    val offsets = new Array[Long](parts)
    var acc = 0L
    var i = 0
    while (i < parts) {
      offsets(i) = acc
      acc += counts.getOrElse(i, 0L)
      i += 1
    }
    val bOffsets = spark.sparkContext.broadcast(offsets)
    val schema: StructType = sorted.schema.add(rankCol, LongType,
      nullable = false)
    val ranked = rdd.mapPartitionsWithIndex { (pid, it) =>
      var rank = bOffsets.value(pid)
      it.map { row =>
        rank += 1L
        Row.fromSeq(row.toSeq :+ rank)
      }
    }
    spark.createDataFrame(ranked, schema)
  }
}
