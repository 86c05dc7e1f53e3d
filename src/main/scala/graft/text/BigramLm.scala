package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.{TextFunctions => TF}

/** Bigram language-model scoring — [[UnigramLm]]'s context-sensitive
  * sibling, the shape of CCNet's KenLM quality gate: train add-one-
  * smoothed bigram probabilities on a TRUSTED slice of the corpus
  * (a curated language, a vetted source), then score EVERY document by
  * its mean per-bigram log probability under that model. Where the
  * unigram gate prices each token in isolation, the bigram gate prices
  * each token GIVEN its predecessor — scrambled or off-domain text that
  * reuses in-vocabulary words (and therefore sails through d40) pays
  * for its unfamiliar transitions here. On the test corpus the trusted
  * slice is English and every other language scores visibly lower —
  * the language-separation signal CCNet's wikipedia-trained models
  * show.
  *
  * Model: lp(w1, w2) = ln((c2(w1,w2) + 1) / (c1(w1) + V)) with c2 the
  * trusted-slice bigram count, c1 the trusted-slice unigram count of
  * the CONTEXT token (all its occurrences, including document-final
  * ones — the denominator is the context's total exposure, not its
  * bigram-position count), and V the trusted vocabulary size. Unseen
  * bigrams price at the add-one floor for their context; unseen
  * CONTEXTS degrade to ln(1/V)-ish — defined for every pair, no
  * fallback hashing.
  *
  * Scale shape: the two model tables are one explode + keyed count
  * each over the trusted slice only; both are vocabulary-bounded
  * (unigrams ≤ V rows, bigrams ≤ observed transitions — at 100 TB cap
  * the bigram table to the top-B transitions before the join, the d41
  * serving pattern, which turns dropped transitions into their
  * context's add-one floor) and join BROADCAST, so the corpus side
  * pays no term-keyed shuffle: the only data-scale exchange is the
  * per-document sum. Documents too short to have a bigram survive with
  * n_bigrams = 0 and a null mean via the final id-keyed left join.
  *
  * Determinism / oracle parity: per-bigram log-probs floor-quantize to
  * 1e-6 BIGINTs before summing (the d40 rule — sums are exact integer
  * arithmetic, order-independent under any partitioning; the ln
  * operand is the same (c2+1)/(c1+V) double division in any engine).
  */
object BigramLm {

  /** Micro-units per log-prob unit (1e-6 quantization). */
  val LpScale = 1000000L

  /** STUPID-BACKOFF scoring (Brants et al. 2007, "Large Language
    * Models in Machine Translation") — the production large-corpus
    * variant of [[scoreDocs]]: a SEEN transition prices at its raw
    * bigram MLE ln(c2/c1) (no smoothing tax on the common case), and
    * an unseen one backs off to the discounted unigram,
    * ln(α·(c(w2)+1)/(N+V)) with α = 0.4 — the non-normalized score
    * Brants showed works as well as Kneser-Ney at web scale for a
    * fraction of the cost. Same model tables, same broadcast-join
    * shape, same micro-quantized exact integer sums as [[scoreDocs]];
    * `n_backoff` counts the fallback branch per document (a high
    * backoff share is itself a quality signal — text whose
    * transitions the trusted slice has never seen).
    */
  def scoreDocsBackoff(docs: DataFrame, idCol: String, textCol: String,
      trainCol: Column, alpha: Double = 0.4): DataFrame = {
    val t = TF.tokens(col(textCol))
    val pairs = zip_with(
      slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val bg = docs
      .select(col(idCol).as("_lm_id"), trainCol.as("_lm_tr"),
        explode(pairs).as("_lm_p"))
      .select(col("_lm_id"), col("_lm_tr"),
        col("_lm_p.w1").as("_lm_w1"), col("_lm_p.w2").as("_lm_w2"))
    val uni = docs.filter(trainCol)
      .select(explode(TF.tokens(col(textCol))).as("_lm_w1"))
      .groupBy(col("_lm_w1")).agg(count(lit(1)).as("_lm_c1"))
    val totals = uni.agg(sum(col("_lm_c1")).as("_lm_n"),
      count(lit(1)).as("_lm_v"))
    val bi = bg.filter(col("_lm_tr"))
      .groupBy(col("_lm_w1"), col("_lm_w2"))
      .agg(count(lit(1)).as("_lm_c2"))
    // seen: c2 present implies c1 present (a seen bigram's context was
    // seen); unseen: the discounted add-one unigram of w2.
    val lp = floor(
      when(col("_lm_c2").isNotNull,
        log(col("_lm_c2").cast("double") / col("_lm_c1").cast("double")))
        .otherwise(log(lit(alpha)
          * (coalesce(col("_lm_cw2"), lit(0L)) + 1).cast("double")
          / (col("_lm_n") + col("_lm_v")).cast("double")))
        * lit(LpScale.toDouble)).cast("long")
    val perDoc = bg
      .join(broadcast(bi), Seq("_lm_w1", "_lm_w2"), "left")
      .join(broadcast(uni), Seq("_lm_w1"), "left")
      .join(broadcast(uni.select(col("_lm_w1").as("_lm_w2"),
        col("_lm_c1").as("_lm_cw2"))), Seq("_lm_w2"), "left")
      .crossJoin(broadcast(totals))
      .select(col("_lm_id"), lp.as("_lm_lp"),
        col("_lm_c2").isNull.cast("long").as("_lm_bo"))
      .groupBy(col("_lm_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("_lm_bo")).as("n_backoff"),
        sum(col("_lm_lp")).as("lp_sum"))
    docs.select(col(idCol).as("_lm_id"))
      .join(perDoc, Seq("_lm_id"), "left")
      .select(col("_lm_id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_backoff"), lit(0L)).as("n_backoff"),
        coalesce(col("lp_sum"), lit(0L)).as("lp_sum"),
        (col("lp_sum").cast("double") / col("n_bigrams")
          / lit(LpScale.toDouble)).as("avg_lp"))
  }

  /** (id, n_bigrams, lp_sum, avg_lp): `lp_sum` the exact integer sum of
    * quantized per-bigram log-probs (micro-units), `avg_lp` the mean in
    * natural units (null when the document has no bigram). `trainCol`
    * marks the trusted rows the model trains on.
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      trainCol: Column): DataFrame = {
    val t = TF.tokens(col(textCol))
    val pairs = zip_with(
      slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val bg = docs
      .select(col(idCol).as("_lm_id"), trainCol.as("_lm_tr"),
        explode(pairs).as("_lm_p"))
      .select(col("_lm_id"), col("_lm_tr"),
        col("_lm_p.w1").as("_lm_w1"), col("_lm_p.w2").as("_lm_w2"))
    // Context counts come from a token explode of the trusted slice —
    // NOT from the bigram frame — so a context's denominator includes
    // its document-final occurrences (see class doc).
    val uni = docs.filter(trainCol)
      .select(explode(TF.tokens(col(textCol))).as("_lm_w1"))
      .groupBy(col("_lm_w1")).agg(count(lit(1)).as("_lm_c1"))
    val vocab = uni.agg(count(lit(1)).as("_lm_v"))
    val bi = bg.filter(col("_lm_tr"))
      .groupBy(col("_lm_w1"), col("_lm_w2"))
      .agg(count(lit(1)).as("_lm_c2"))
    val lp = floor(log(
      (coalesce(col("_lm_c2"), lit(0L)) + 1).cast("double")
        / (coalesce(col("_lm_c1"), lit(0L)) + col("_lm_v")).cast("double"))
      * lit(LpScale.toDouble)).cast("long")
    val perDoc = bg
      .join(broadcast(bi), Seq("_lm_w1", "_lm_w2"), "left")
      .join(broadcast(uni), Seq("_lm_w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("_lm_id"), lp.as("_lm_lp"))
      .groupBy(col("_lm_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("_lm_lp")).as("lp_sum"))
    docs.select(col(idCol).as("_lm_id"))
      .join(perDoc, Seq("_lm_id"), "left")
      .select(col("_lm_id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lp_sum"), lit(0L)).as("lp_sum"),
        (col("lp_sum").cast("double") / col("n_bigrams")
          / lit(LpScale.toDouble)).as("avg_lp"))
  }
}
