package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.embed.Embedder
import graft.store.ParquetVectorStore
import graft.text.Splitters

/** Structured Streaming faces of the engine (SURVEY.md §7.2 step 5).
  * The reference has no streaming (§2.9) — this is the driver-table
  * (`events`) extension: the SAME aggregations as
  * [[graft.queries.EventQueries]] run incrementally with watermarks, and
  * the ingest chain runs as a foreachBatch sink so late-arriving
  * documents flow through chunk→embed→store continuously.
  *
  * All transforms are expressed on a generic streaming DataFrame with an
  * event-time `ts` timestamp column, so any source (file, Kafka, memory)
  * plugs in. State stores scale with (window × type) and open-session
  * cardinality — bounded by the watermark, which is what makes these
  * safe on an unbounded 100 TB/day stream.
  */
object EventStreams {

  private def dsum(c: Column) = sum(c.cast(DecimalType(12, 2))).cast("double")

  /** e01's streaming face: tumbling 1-hour windows per event type.
    * Watermark bounds state: windows older than it are finalized and
    * evicted. Append output mode emits each window exactly once.
    */
  def hourlyRollup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("total_value"))

  /** e02's streaming face: session windows (30-minute gap) per user via
    * the built-in session_window — Spark merges/extends window state and
    * the watermark closes sessions. Works identically on batch frames.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** Streaming document ingest: each micro-batch of (doc_id, text) runs
    * the batch chunk→embed path and appends to the store — foreachBatch
    * reuses the exact batch operators (the reference's artifact-handoff
    * restartability maps to checkpointed micro-batches).
    */
  def documentIngestSink(docs: DataFrame, embedder: Embedder,
      store: ParquetVectorStore, index: String,
      chunkSize: Int = 2048, overlap: Int = 256)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      import batch.sparkSession.implicits._
      val chunks = batch.select(col("doc_id").cast("long"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          Splitters.recursiveCharSplit(text, chunkSize, overlap)
            .zipWithIndex.map { case (piece, i) =>
              (id, piece, Map("doc_id" -> id.toString, "chunk" -> i.toString),
                Map.empty[String, String], embedder.embed(piece))
            }
        }
        .toDF("doc_id", "page_content", "metadata", "headers", "embedding")
      store.append(index, chunks)
    }
}
