package graft.store

import org.apache.spark.sql.{DataFrame, Row}

/** External bulk-store sink shape (E4; reference: the Elasticsearch
  * `ElasticsearchStore.add_documents` path, RHPD-ES
  * ingestion-pipeline-elastic.py:330–359 with `request_timeout=30`
  * batching, and the Weaviate `db.add_documents` at
  * ingestion-pipeline.py:341–353).
  *
  * The engine's native store is parquet ([[ParquetVectorStore]]); an
  * external Weaviate/ES/vector-DB sink is a `foreachPartition` bulk
  * writer: one client per partition (connections are not serializable
  * and must not cross task boundaries), rows buffered into fixed-size
  * bulk requests, client closed even on failure. This class owns that
  * lifecycle; deployments supply a [[BulkWriter]] over their client.
  */
trait BulkWriter {
  /** Send one batch; called with 1..batchSize rows. */
  def writeBatch(rows: Seq[Row]): Unit
  def close(): Unit
}

object BulkSink {

  /** Write every partition through a fresh writer in `batchSize` bulks.
    * The writer factory runs ON THE EXECUTOR (once per partition) — the
    * driver never opens a connection, and a 1000-partition write is 1000
    * concurrent bulk streams, vs the reference's single sequential
    * client loop.
    */
  def write(df: DataFrame, batchSize: Int)(writerFactory: () => BulkWriter): Unit = {
    require(batchSize > 0)
    df.foreachPartition { (rows: Iterator[Row]) =>
      val w = writerFactory()
      try rows.grouped(batchSize).foreach(g => w.writeBatch(g.toSeq))
      finally w.close()
    }
  }
}
