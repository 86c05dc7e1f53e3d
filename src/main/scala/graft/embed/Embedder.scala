package graft.embed

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, udf}

/** Text-embedding contract (SURVEY.md E1/E2; reference:
  * kfp/redhat-product-documentation-ingestor/ingestion-pipeline.py:331–339
  * batch-embeds chunks, ingestion-pipeline-website-local.py:169–170 embeds
  * a single query string with the same model).
  *
  * The engine's correctness core uses [[HashingEmbedder]] — a seeded
  * hashing vectorizer that is deterministic across JVMs and partitionings,
  * so kNN results are oracle-checkable without a model. A real model
  * (e.g. an ONNX sentence encoder) plugs in behind the same trait; model
  * inference is outside engine scope (SURVEY.md §7.3).
  */
trait Embedder extends Serializable {
  def dim: Int
  /** Embed one string (the E2 `embed_query` contract). */
  def embed(text: String): Array[Float]
}

/** Feature-hashing vectorizer: each lowercase whitespace token hashes to
  * one dimension with a ±1 sign (hash bit decides), accumulated then
  * L2-normalized. Deterministic: the token hash is the first 8 hex digits
  * of MD5 — the same [[graft.text.TextFunctions.hash32]] contract, so the
  * vectorizer is reproducible in SQL if an oracle ever needs it.
  */
final case class HashingEmbedder(dim: Int = 64) extends Embedder {

  override def embed(text: String): Array[Float] = {
    val acc = new Array[Double](dim)
    for (tok <- text.toLowerCase.split("\\s+") if tok.nonEmpty) {
      val h = HashingEmbedder.hash32(tok)
      val idx = (h % dim).toInt
      val sign = if ((h / dim) % 2 == 0) 1.0 else -1.0
      acc(idx) += sign
    }
    var norm = 0.0
    var i = 0
    while (i < dim) { norm += acc(i) * acc(i); i += 1 }
    val out = new Array[Float](dim)
    if (norm > 0) {
      val inv = 1.0 / math.sqrt(norm)
      i = 0
      while (i < dim) { out(i) = (acc(i) * inv).toFloat; i += 1 }
    }
    out
  }

  /** Column form for batch embedding (E1). A UDF is appropriate here: the
    * per-row work (MD5 per token) dwarfs the row-boxing cost. A real
    * model goes through [[BatchedEmbed.embedAll]] instead — one model
    * instance per partition, batched forward passes.
    */
  def embedCol: Column => Column = {
    val self = this
    val f = udf((s: String) => if (s == null) null else self.embed(s))
    c => f(c)
  }

  /** Add an embedding column to a DataFrame (batch-embed, E1 shape). */
  def embedAll(df: DataFrame, textCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, embedCol(col(textCol)))
}

/** Batch-embedding contract (E1, the scale form): one MODEL instance
  * embeds a whole batch of strings in one call. This is the shape a real
  * sentence-encoder needs — model load is seconds, a forward pass over a
  * batch amortizes it; per-row `Embedder.embed` cannot express that.
  * The factory (not the model) crosses the closure boundary: models hold
  * native state that must never be serialized or shared across tasks.
  */
trait BatchEmbedder extends Serializable {
  def dim: Int
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]
}

/** [[HashingEmbedder]] behind the batch contract — the deterministic test
  * stand-in for a real model (same vectors as the per-row path).
  */
final case class HashingBatchEmbedder(dim: Int = 64) extends BatchEmbedder {
  private val inner = HashingEmbedder(dim)
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    texts.map(t => if (t == null) null else inner.embed(t))
}

/** mapPartitions-batched embedding (E1 at scale; reference:
  * ingestion-pipeline.py:331–339 re-instantiates the model per INDEX —
  * the engine's contract is one instance per PARTITION, amortized over
  * every row in it).
  *
  * Shape: `mapPartitions` constructs the model once via `factory`, then
  * feeds it `batchSize`-row slices; each output row is the input row plus
  * the embedding column. Rows stream through — only one batch of texts
  * and vectors is resident at a time, so executor memory is bounded by
  * `batchSize × (doc + vector)`, independent of partition size.
  */
object BatchedEmbed {
  import org.apache.spark.sql.{Encoders, Row}
  import org.apache.spark.sql.types.{ArrayType, FloatType}

  def embedAll(df: DataFrame, textCol: String, outCol: String,
      factory: () => BatchEmbedder, batchSize: Int = 64): DataFrame = {
    require(batchSize > 0)
    val schema = df.schema.add(outCol, ArrayType(FloatType), nullable = true)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val model = factory() // ONE instantiation per (non-empty) partition
        rows.grouped(batchSize).flatMap { batch =>
          val vecs = model.embedBatch(batch.map(_.getString(idx)))
          batch.iterator.zip(vecs.iterator).map { case (r, v) =>
            Row.fromSeq(r.toSeq :+ v)
          }
        }
      }
    }(Encoders.row(schema))
  }
}

object HashingEmbedder {
  /** First 8 hex digits of MD5 as an unsigned-32-bit value in a long —
    * identical to TextFunctions.hash32 / DuckDB
    * `CAST(('0x'||substr(md5(s),1,8)) AS BIGINT)`.
    */
  def hash32(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}
