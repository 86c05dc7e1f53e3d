package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.embed.Embedder
import graft.functions.vectors
import graft.store.ParquetVectorStore

/** LLM completion contract for the RAG tail (Q5; reference:
  * ingestion-pipeline-website-local.py:178–200 prompts a vLLM endpoint).
  * Model inference is outside engine scope — the engine's job ends at
  * the assembled prompt; the default stub is deterministic for tests.
  */
trait LlmClient extends Serializable {
  def complete(prompt: String): String
}

/** Deterministic stub: echoes a digest of the prompt (tests pin the
  * prompt content through it without a model).
  */
object StubLlm extends LlmClient {
  override def complete(prompt: String): String =
    s"[stub:${prompt.length}] " + prompt.linesIterator.take(1).mkString
}

object RagQuery {

  /** Q3/E2: embed the query string, exact top-k over the index. The plan
    * is a single scan + TakeOrderedAndProject (per-partition heap); the
    * query vector is a broadcast literal.
    */
  def search(store: ParquetVectorStore, index: String, query: String,
      embedder: Embedder, k: Int = 4): DataFrame =
    store.read(index)
      .withColumn("score",
        vectors.cosineSimilarity(col("embedding"), lit(embedder.embed(query))))
      .orderBy(col("score").desc, col("page_content"))
      .limit(k)

  /** Q5 (WEB-LOCAL:178–200): retrieve → fold "Title: …\nContent: …" in
    * rank order → prompt → LLM. The fold is one 4-row aggregate; the
    * heavy lifting (the scan) happened in [[search]].
    */
  def ragQuery(store: ParquetVectorStore, index: String, question: String,
      embedder: Embedder, llm: LlmClient, k: Int = 5): String = {
    val context = search(store, index, question, embedder, k)
      .select(
        concat(lit("Title: "), coalesce(element_at(col("metadata"), "title"), lit("")),
          lit("\nContent: "), col("page_content")).as("piece"),
        col("score"), col("page_content"))
      .agg(array_join(
        transform(
          array_sort(collect_list(
            struct((-col("score")).as("ns"), col("page_content"), col("piece")))),
          x => x.getField("piece")), "\n\n").as("context"))
      .head().getString(0)
    llm.complete(s"Query: $question\n\nContext:\n$context")
  }
}
