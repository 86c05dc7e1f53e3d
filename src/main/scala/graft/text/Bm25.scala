package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.{TextFunctions => TF}

/** BM25 lexical scoring for a CONSTANT query over a tokenized corpus —
  * the lexical half of hybrid retrieval (the reference's store is
  * vector-only; production RAG pairs dense kNN with BM25 and fuses the
  * two rankings — see the d24/d25 query rows).
  *
  * Scale shape: ONE aggregate pass computes every global the formula
  * needs — corpus size N, average document length, and one
  * document-frequency counter per query term — as a single row (driver
  * state bounded by |query terms|, never corpus-sized). Scoring is then
  * a pure projection over the scan: per-term tf via `size(filter(...))`
  * on the token array, the BM25 sum folded left-to-right in term order.
  * No shuffle, no join, no inverted index needed for a constant query
  * (the full inverted-index build is d18's term-stats shape).
  *
  * Determinism / oracle parity: IDF uses `ln`, the one transcendental —
  * JVM `Math.log` and DuckDB `ln` may differ in the last ulp, so scores
  * are rounded to 9 dp ON BOTH SIDES; everything else is IEEE +,*,/ in
  * an operation order the oracle SQL mirrors token for token (constants
  * as DOUBLE e-notation literals there — plain decimals are DECIMAL in
  * DuckDB and would change the arithmetic).
  */
object Bm25 {

  val DefaultK1 = 1.2
  val DefaultB = 0.75
  /** Rounding applied to scores on both engines (absorbs ln's last ulp). */
  val ScoreScale = 9

  /** (doc_id, score) for every document; `query` is a token list (apply
    * the same tokenization the documents use).
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String], k1: Double = DefaultK1, b: Double = DefaultB): DataFrame = {
    require(query.nonEmpty, "empty query")
    val terms = query.distinct
    val base = docs.select(col(idCol).as("_bm_id"),
      TF.tokens(col(textCol)).as("_bm_toks"))
      .withColumn("_bm_len", size(col("_bm_toks")))

    // One aggregate row: N, avgdl, df per term (bounded by |terms|).
    val statCols = count(lit(1)).as("n") +:
      avg(col("_bm_len")).as("avgdl") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("_bm_toks"), t), 1L).otherwise(0L)).as(s"df$i")
      }
    val stats = base.agg(statCols.head, statCols.tail: _*).head()
    val n = stats.getAs[Long]("n")
    // Empty corpus: the avg/sum aggregates are null — return the empty
    // (id, score) frame instead of unboxing them (a freshly created
    // index must score as empty, not throw).
    if (n == 0)
      return base.select(col("_bm_id").as(idCol), lit(0.0).as("score"))
    val avgdl = stats.getAs[Double]("avgdl")

    val dl = col("_bm_len").cast("double")
    val perTerm: Seq[Column] = terms.zipWithIndex.map { case (t, i) =>
      val df = stats.getAs[Long](s"df$i")
      // (n - df + 0.5) in exact integer-then-double arithmetic, like the
      // SQL mirror's BIGINT ± DOUBLE promotion.
      val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
      val tf = size(filter(col("_bm_toks"), x => x === t)).cast("double")
      val denom = tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(avgdl))
      lit(idf) * (tf * lit(k1 + 1.0)) / denom
    }
    base.select(col("_bm_id").as(idCol),
      round(perTerm.reduce(_ + _), ScoreScale).as("score"))
  }
}
