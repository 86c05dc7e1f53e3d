package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.text.{TextFunctions => TF}

/** Deterministic training-shard layout — the last step of a corpus
  * pipeline (filtered/deduped/rebalanced docs → fixed set of shard
  * files a trainer streams).
  *
  * Design rules, all scale-motivated:
  *   - **Shard assignment is a pure hash of the stable id** (plus an
  *     optional epoch column from d29-style upsampling, so repeats of a
  *     doc land in DIFFERENT shards): re-running the pipeline rebuilds
  *     byte-identical shard membership — no `rand()`, no dependence on
  *     input partitioning. The hash also decorrelates adjacent doc ids,
  *     which is the shuffle a trainer needs (sequential reads of one
  *     shard see a pseudo-random document mix).
  *   - **One exchange**: `repartition(nShards, shard)` is the only
  *     shuffle, and each output task writes exactly its shard.
  *   - **Bounded files**: `maxRecordsPerFile` caps file size inside a
  *     shard so one hot shard cannot produce an unsplittable giant file.
  *   - Rows inside a shard are sorted by (id, epoch) before writing, so
  *     file contents are deterministic too, not just membership.
  */
object ShardWriter {

  /** Shard id column: `hash32(id · epoch) mod nShards`. Exposed so
    * tests and audits can re-derive membership without writing.
    */
  def shardCol(idCol: String, epochCol: Option[String], nShards: Int) = {
    val key = epochCol match {
      case Some(e) => concat_ws("", col(idCol).cast("string"),
        col(e).cast("string"))
      case None => col(idCol).cast("string")
    }
    pmod(TF.hash32(key), lit(nShards.toLong))
  }

  /** The `(shard, pos)` address map [[writeShards]] lays out, derived
    * WITHOUT writing anything: `shard` = [[shardCol]] membership, `pos`
    * = the dense 0-based rank of the row inside its shard under the
    * write sort order (`idCol`, then the epoch column when present).
    * This is the audit face of the writer — a resumable trainer or a
    * shard-manifest builder gets every row's final address from the
    * corpus frame alone, and oracle row d45 pins the whole map
    * cross-engine (the hash is the md5-slice contract of
    * [[graft.text.TextFunctions.hash32]]).
    *
    * Scale shape: ONE hash exchange, on the shard key the writer
    * shuffles on anyway, then a per-shard sort bounded by shard size
    * (the caller sizes shards via `nShards`). No global sort.
    *
    * Determinism contract: (`idCol`, epoch when present) must uniquely
    * identify rows — `pos` between rows with EQUAL sort keys is
    * partition-order-dependent, the same way any row_number over a
    * non-total order is. The writer shares this precondition (equal
    * keys make file CONTENTS order nondeterministic between reruns,
    * though membership stays fixed).
    */
  def addressMap(df: DataFrame, idCol: String, nShards: Int,
      epochCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nShards > 0, "nShards must be positive")
    Seq("shard", "pos").foreach(c => require(!df.columns.contains(c),
      s"addressMap emits a '$c' column but the input already has one — " +
        "rename it first"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col(idCol) +: epochCol.map(col).toSeq: _*)
    df.withColumn("shard", shardCol(idCol, epochCol, nShards))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
  }

  /** Write `df` into `nShards` shard directories (`shard=K/`) under
    * `path`. Returns the shard ids written (0 until nShards, minus any
    * empty ones).
    */
  def writeShards(df: DataFrame, path: String, idCol: String,
      nShards: Int, epochCol: Option[String] = None,
      maxRecordsPerFile: Long = 1000000L): Unit = {
    require(nShards > 0, "nShards must be positive")
    val sharded = df
      .withColumn("shard", shardCol(idCol, epochCol, nShards))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(
        (col("shard") +: col(idCol) +: epochCol.map(col).toSeq): _*)
    sharded.write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .parquet(path)
  }
}
