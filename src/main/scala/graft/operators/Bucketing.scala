package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins — the storage-layout scale tool for
  * fact-to-fact joins that recur on the same key (orders ⋈ lineitem on
  * the order key, events ⋈ events on user, chunks ⋈ embeddings on doc):
  * write both tables bucketed by that key ONCE, and every subsequent
  * join reads bucket-aligned files with NO exchange on either side —
  * the shuffle is paid at write time, once, instead of per query.
  *
  * Mechanics: `bucketBy(n, key)` hashes rows into n files per write
  * task; the catalog records the layout, and the planner treats each
  * table as already hash-partitioned on (key, n) — matching bucket
  * counts on both sides remove both exchanges (and `sortBy` removes the
  * per-task sort for sort-merge). This is Spark's answer to co-located
  * storage; at cluster scale n is sized so one bucket ≈ one task's
  * memory (e.g. 100 TB / 2 GiB ≈ 50k buckets).
  *
  * Bucketed tables must live in the session catalog (the layout is
  * catalog metadata); `path` keeps the data external so nothing lands in
  * a default warehouse.
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sorted) external table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, path: String, sorted: Boolean = true): Unit = {
    require(buckets > 0)
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Read a bucketed table back (a plain catalog scan — the bucket
    * layout rides along as the scan's output partitioning).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
