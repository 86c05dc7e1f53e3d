package graft.embed

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Cross-task-visible probes (local master runs executors in-process, so
  * statics are shared — same pattern as BulkSinkProbe).
  */
object BatchedEmbedProbe {
  val instantiations = new AtomicInteger(0)
  val batches = new AtomicInteger(0)
  val maxBatch = new AtomicInteger(0)
  def reset(): Unit = { instantiations.set(0); batches.set(0); maxBatch.set(0) }
}

/** A counting wrapper over the deterministic hashing batch embedder. */
final case class ProbeBatchEmbedder(dim: Int) extends BatchEmbedder {
  BatchedEmbedProbe.instantiations.incrementAndGet()
  private val inner = HashingBatchEmbedder(dim)
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    BatchedEmbedProbe.batches.incrementAndGet()
    BatchedEmbedProbe.maxBatch.getAndUpdate(m => math.max(m, texts.size))
    inner.embedBatch(texts)
  }
}

class BatchedEmbedSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  test("one model instantiation per partition, batched calls, same vectors") {
    BatchedEmbedProbe.reset()
    val texts = (1 to 50).map(i => s"document number $i about topic ${i % 5}")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").repartition(4)

    val out = BatchedEmbed.embedAll(df, "text", "embedding",
      () => ProbeBatchEmbedder(64), batchSize = 8).cache()
    try {
      val rows = out.collect()
      assert(rows.length == 50)

      // One model per PARTITION — not per row, not per batch.
      assert(BatchedEmbedProbe.instantiations.get() == 4)
      // Batches respect batchSize and cover all rows in few calls.
      assert(BatchedEmbedProbe.maxBatch.get() <= 8)
      assert(BatchedEmbedProbe.batches.get() < 50,
        "embedBatch was called per row, not per batch")

      // Vectors identical to the per-row embedder (the batch adapter must
      // not change the math).
      val perRow = HashingEmbedder(64)
      rows.foreach { r =>
        val t = r.getString(r.fieldIndex("text"))
        assert(r.getSeq[Float](r.fieldIndex("embedding")).toSeq ==
          perRow.embed(t).toSeq)
      }
      // Input columns pass through unchanged.
      assert(out.columns.toSeq == Seq("id", "text", "embedding"))
    } finally out.unpersist()
  }

  test("empty partitions are fine; null text embeds to null") {
    BatchedEmbedProbe.reset()
    val df = Seq((1L, "alpha beta"), (2L, null))
      .toDF("id", "text").repartition(8) // 6 empty partitions
    val rows = BatchedEmbed.embedAll(df, "text", "embedding",
      () => ProbeBatchEmbedder(16), batchSize = 4)
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 2)
    assert(rows(0).getSeq[Float](2).nonEmpty)
    assert(rows(1).isNullAt(2))
    // mapPartitions still runs once per partition; models may be built
    // for empty partitions too — the contract is AT MOST one per
    // partition, and never per row.
    assert(BatchedEmbedProbe.instantiations.get() <= 8)
  }
}
