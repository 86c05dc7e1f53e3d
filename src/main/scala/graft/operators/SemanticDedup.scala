package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.vectors

/** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
  * Data-efficient learning at web-scale through semantic deduplication"):
  * cluster the corpus with a trained k-means codebook, then look for
  * near-duplicate pairs ONLY within each cluster cell — semantically
  * redundant documents land in the same cell, so the all-pairs O(n²)
  * cosine problem collapses to Σ_c n_c² with k a free lever.
  *
  * Composition of parts that each exist (and are each oracle-pinned)
  * elsewhere in the library: [[KMeans.lloyd]] trains the codebook (v08
  * pins one step), [[Similarity.ivfAssign]] assigns cells shuffle-free
  * (v05), and the within-cell pair scoring is the cell-keyed analogue of
  * [[Similarity.nearDupPairs]]'s bucket join (v03). The composed pass is
  * oracle-pinned end-to-end as v09.
  *
  * Scale shape: codebook training is `iters` corpus scans with
  * codebook-sized driver state; assignment is one row-local projection
  * (no shuffle); the pair join shuffles on `cell` only. Parallelism and
  * worst-case pair volume are both governed by k — at 100 TB pick k so
  * cells hold ~10⁴–10⁵ vectors (SemDeDup used 11k cells for web scale),
  * which also gives the join k-way parallelism; this library's
  * [[Similarity.nearDupPairs]]-style `maxBucket`-window guard is not
  * needed here because Lloyd training actively balances cell populations
  * (an LSH bucket has no such pressure).
  *
  * Within-cell-ONLY is the documented recall trade (identical to the
  * paper): a true near-dup pair split across a cell boundary is missed.
  * Raising `iters` tightens cells; a safety net for boundary pairs is an
  * additional pass with a perturbed codebook (k+1 seeds), same cost.
  */
object SemanticDedup {

  /** Near-duplicate pairs (a_id < b_id, cosine >= threshold) among
    * vectors sharing a k-means cell. Returns (cell, a_id, b_id, score).
    *
    * The codebook is trained fresh with [[KMeans.lloyd]] (k seeds = the
    * k smallest-id vectors, `iters` Lloyd refinements); a corpus
    * smaller than k clamps to one cell per vector rather than failing —
    * this stage's input size is data-dependent (it typically runs after
    * other dedup gates), so a shrunken shard must degrade, not abort.
    * To reuse a pre-trained codebook, call [[withinCellPairs]] on an
    * [[Similarity.ivfAssign]]-ed frame directly.
    */
  def semanticDupPairs(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, threshold: Double): DataFrame = {
    // A shard fully EMPTIED by the earlier gates is the degenerate case
    // of the same data-dependence: no codebook is trainable on zero
    // rows and none is needed — there are no pairs. Short-circuit to
    // the empty pair frame (same schema) instead of letting lloyd's
    // empty-corpus require abort the pipeline; the fail-fast stays for
    // the default allowFewerSeeds=false path callers use directly.
    if (df.isEmpty)
      withinCellPairs(df.withColumn("cell", lit(0L)), idCol, vecCol, threshold)
    else {
      val codebook = KMeans.lloyd(df, idCol, vecCol, k, iters,
        allowFewerSeeds = true)
      val assigned = Similarity.ivfAssign(df, idCol, vecCol,
        codebook, "seed_id", "seed_vec")
      withinCellPairs(assigned, idCol, vecCol, threshold)
    }
  }

  /** The pair stage alone: `assigned` must carry a `cell` column
    * ([[Similarity.ivfAssign]]'s output). Self-join keyed by cell —
    * the shuffle moves each vector once per side, and only same-cell
    * pairs are ever scored.
    */
  def withinCellPairs(assigned: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = assigned.select(col("cell"), col(idCol).as("a_id"),
      col(vecCol).as("_sd_av"))
    val b = assigned.select(col("cell").as("_sd_cb"), col(idCol).as("b_id"),
      col(vecCol).as("_sd_bv"))
    a.join(b, col("cell") === col("_sd_cb") && col("a_id") < col("b_id"))
      .withColumn("score", vectors.cosineSimilarity(col("_sd_av"), col("_sd_bv")))
      .filter(col("score") >= threshold)
      .select(col("cell"), col("a_id"), col("b_id"), col("score"))
  }

  /** Keeper policy over [[semanticDupPairs]]: drop every vector that has
    * a SMALLER-id semantic duplicate in its cell (greedy keep-first, the
    * same contract as [[graft.text.Dedup.dropNearDuplicates]] — each dup
    * group's minimum always survives).
    */
  def dropSemanticDuplicates(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, threshold: Double): DataFrame = {
    val doomed = semanticDupPairs(df, idCol, vecCol, k, iters, threshold)
      .select(col("b_id")).distinct()
    df.join(doomed, col(idCol) === col("b_id"), "left_anti")
  }

  /** Cross-corpus SEMANTIC leak detection — the embedding-space half of
    * train/eval decontamination. [[graft.text.Dedup.crossNearDupPairs]]
    * (d37) catches eval rows that leaked into training with token-level
    * edits; this catches the leaks n-grams cannot see — paraphrases,
    * translations, templated rewrites — by cosine against the eval
    * set's embeddings. One decision record per flagged train doc: the
    * worst-offending eval doc and its score (ties to the smaller eval
    * id), ready for a drop join or an audit table.
    *
    * Scale shape (d30's): the eval side is benchmark-sized →
    * BROADCAST; the train side scores row-locally inside the scan, so
    * the only exchange is the per-train-doc argmax window over the
    * (rare) pairs that cleared the threshold — the 100-TB train corpus
    * never shuffles. A full-corpus × full-corpus semantic sweep is
    * [[semanticDupPairs]]'s cell-bucketed job instead; this face is for
    * eval sets small enough to ship to every executor.
    */
  def crossSemanticLeaks(train: DataFrame, eval: DataFrame, idCol: String,
      vecCol: String, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = train.select(col(idCol).as("train_id"), col(vecCol).as("_sl_tv"))
    val e = eval.select(col(idCol).as("eval_id"), col(vecCol).as("_sl_ev"))
    val w = Window.partitionBy(col("train_id"))
      .orderBy(col("score").desc, col("eval_id"))
    t.join(broadcast(e))
      .withColumn("score", vectors.cosineSimilarity(col("_sl_tv"), col("_sl_ev")))
      .filter(col("score") >= threshold)
      .withColumn("_sl_rn", row_number().over(w))
      .filter(col("_sl_rn") === 1)
      .select(col("train_id"), col("eval_id"), col("score"))
  }
}
