package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.{TextFunctions => TF}

/** Unigram language-model scoring — the CCNet/Gopher-style perplexity
  * quality gate: train add-one-smoothed unigram probabilities on the
  * corpus itself, score every document by its mean per-token log
  * probability, and filter the tails (gibberish scores far below the
  * mean; boilerplate far above it). d08/d32 gate on surface shape
  * (lengths, ratios, repetition); this gates on token LIKELIHOOD.
  *
  * Scale shape: the model is one term-keyed count aggregate (d18's
  * shape); scoring is one explode + term-keyed join + doc-keyed sum —
  * the exchanges a 100-TB corpus pays anyway for term stats. At scale
  * pass `vocabCap > 0`: the vocabulary is capped to the top-V terms
  * BEFORE the scoring join (top-V by count, ties by term — a
  * TakeOrderedAndProject, per-partition heaps, never a full sort), the
  * capped model is BROADCAST so scoring pays no shuffle on the token
  * side beyond the doc-keyed sum, and out-of-vocab tokens fall back to
  * the smoothing floor — the same probability the add-one model gives
  * an unseen term, ln(1/(total+vocab)) with total/vocab still from the
  * FULL training counts (the cap changes serving, not the model).
  * Since the floor is one constant, the per-doc sum needs only the
  * in-vocab sum and the OOV count: lp_sum = iv_sum + n_oov · floor.
  *
  * Determinism / oracle parity: `ln` is transcendental, and unlike
  * BM25's few query terms its values cannot be inlined driver-side, so
  * each term's log-probability is FLOOR-QUANTIZED to 1e-6 into a BIGINT
  * — per-doc sums become exact integer arithmetic, order-independent
  * under any partitioning (the d24 rounding rule, moved per-term so the
  * SUM itself is parity-safe). The quantization makes the SUM exact;
  * the per-term floor is parity-safe to the extent the two engines'
  * `ln` agree within the distance to the nearest 1e-6 boundary — a
  * ≤1-ulp disagreement (~1e-16 relative; empirically ZERO on the test
  * vocabularies, where libm and the JVM agree bit-for-bit and the
  * closest boundary sits ~10⁶ ulps away) would need to land within
  * ~1e-10 of a boundary to flip a single term. The quantum bounds the
  * induced score error at 1e-6 per token — noise against the gate's
  * thresholds.
  */
object UnigramLm {

  /** Micro-units per log-prob unit (1e-6 quantization). */
  val LpScale = 1000000L

  /** (id, n_tokens, lp_sum, avg_lp) — plus `n_oov` when `vocabCap > 0`:
    * `lp_sum` is the exact integer sum of quantized per-token log-probs
    * (micro-units); `avg_lp` the mean per-token log-prob in natural
    * units. `vocabCap = 0` scores against the full vocabulary (every
    * token hits the model, an inner term join); `vocabCap = V > 0`
    * serves only the top-V terms by (count DESC, term ASC), broadcast,
    * with OOV tokens priced at the unseen-term smoothing floor.
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      vocabCap: Int = 0): DataFrame = {
    val toks = docs.select(col(idCol).as("_lm_id"),
      explode(TF.tokens(col(textCol))).as("_lm_t"))
    val counts = toks.groupBy(col("_lm_t")).agg(count(lit(1)).as("_lm_c"))
    val totals = counts.agg(sum(col("_lm_c")).as("_lm_total"),
      count(lit(1)).as("_lm_vocab"))
    // lp(t) = floor(ln((c+1)/(total+vocab)) * 1e6): BIGINT → DOUBLE
    // promotions and the quantization mirror the oracle token for token.
    def lpOf(c: org.apache.spark.sql.Column) =
      floor(log(c.cast("double")
        / (col("_lm_total") + col("_lm_vocab")).cast("double"))
        * lit(LpScale.toDouble)).cast("long")
    if (vocabCap <= 0) {
      val probs = counts.crossJoin(totals)
        .select(col("_lm_t"), lpOf(col("_lm_c") + 1).as("_lm_lp"))
      toks.join(probs, "_lm_t")
        .groupBy(col("_lm_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("_lm_lp")).as("lp_sum"))
        .select(col("_lm_id").as(idCol), col("n_tokens"), col("lp_sum"),
          (col("lp_sum").cast("double") / col("n_tokens")
            / lit(LpScale.toDouble)).as("avg_lp"))
    } else {
      // Serving cap: top-V terms (TakeOrderedAndProject — k rows per
      // partition cross to the driver-side take, no full sort), model
      // arithmetic unchanged. The scoring join is FORCED broadcast:
      // ≤ V rows by construction, so the token side never shuffles on
      // the term key. OOV tokens need only a count — the constant
      // floor multiplies in after the doc aggregate.
      val capped = counts.sort(col("_lm_c").desc, col("_lm_t"))
        .limit(vocabCap)
      val probs = capped.crossJoin(totals)
        .select(col("_lm_t"), lpOf(col("_lm_c") + 1).as("_lm_lp"))
      val floorRow = totals.select(lpOf(lit(1)).as("_lm_floor"))
      toks.join(broadcast(probs), Seq("_lm_t"), "left")
        .groupBy(col("_lm_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(coalesce(col("_lm_lp"), lit(0L))).as("_lm_iv"),
          sum(when(col("_lm_lp").isNull, 1L).otherwise(0L)).as("n_oov"))
        .crossJoin(floorRow)
        .select(col("_lm_id").as(idCol), col("n_tokens"),
          (col("_lm_iv") + col("n_oov") * col("_lm_floor")).as("lp_sum"),
          col("n_oov"))
        .withColumn("avg_lp", col("lp_sum").cast("double")
          / col("n_tokens") / lit(LpScale.toDouble))
    }
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by Σ_token (ln p_target − ln p_source), the log
    * importance ratio between a TARGET-domain unigram model and the
    * model of the full corpus. Documents whose token distribution
    * looks like the target domain score positive; the ratio is the
    * principled replacement for hand-tuned quality thresholds when
    * "quality" means "resembles this reference corpus".
    *
    * `targetCol` is a boolean marking the target-domain rows (a
    * language, a curated subset, a trusted source). Both models are
    * add-one smoothed over the SHARED corpus vocabulary — the target
    * model prices tokens it never saw as (0+1)/(total_T + V), so the
    * ratio is defined for every corpus token and needs no fallback
    * hashing. An EMPTY target degrades to total_T = 0 (every target
    * probability the same 1/V-ish floor) rather than aborting — this
    * stage, like semantic dedup, may legitimately see its target
    * emptied by upstream gates.
    *
    * Returns (id, n_tokens, lr_sum, avg_lr): `lr_sum` the exact
    * integer sum of per-token quantized log-ratios (micro-units),
    * `avg_lr` the mean in natural units.
    *
    * Scale shape: d40's exactly — two term-keyed count aggregates off
    * one token explode (the target counts are a filtered second
    * aggregate of the same frame, not a second scan), 1/2-row totals
    * broadcast by construction, one term-keyed scoring join, one
    * doc-keyed sum. At 100 TB the ratio table caps/broadcasts the
    * same way scoreDocs' vocabCap path does. Parity: BOTH ln's are
    * floor-quantized to 1e-6 BIGINTs before the subtraction (the d40
    * rule applied per side — quantizing the ratio instead would let
    * the two engines' ln disagreements cancel differently).
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      targetCol: org.apache.spark.sql.Column): DataFrame = {
    val toks = docs.select(col(idCol).as("_lm_id"), targetCol.as("_lm_tgt"),
      explode(TF.tokens(col(textCol))).as("_lm_t"))
    val ratios = termLogRatios(toks).select(col("_lm_t"), col("_lm_lr"))
    toks.join(ratios, "_lm_t")
      .groupBy(col("_lm_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("_lm_lr")).as("lr_sum"))
      .select(col("_lm_id").as(idCol), col("n_tokens"), col("lr_sum"),
        (col("lr_sum").cast("double") / col("n_tokens")
          / lit(LpScale.toDouble)).as("avg_lr"))
  }

  /** Per-TERM drift report between the target slice and the full
    * corpus — the vocabulary-drift face of [[importanceWeights]]
    * (same two LMs, same quantized ratios, aggregated per term
    * instead of per document): which tokens drive the divergence
    * between two corpus slices (crawl snapshots, domains, time
    * windows). `contrib_micro = c_target(t) · lr(t)` is term t's
    * exact integer contribution to the (scaled, unnormalized)
    * KL(target ‖ source) sum — positive for tokens over-represented
    * in the target, negative for under-represented; the report is
    * the |contribution| ranking. Returns (term, c_target, c_source,
    * lr_micro, contrib_micro) — all exact integers, so any
    * downstream top-k or sum replays in an oracle.
    */
  def termDrift(docs: DataFrame, idCol: String, textCol: String,
      targetCol: org.apache.spark.sql.Column): DataFrame = {
    val toks = docs.select(col(idCol).as("_lm_id"), targetCol.as("_lm_tgt"),
      explode(TF.tokens(col(textCol))).as("_lm_t"))
    termLogRatios(toks)
      .select(col("_lm_t").as("term"), col("_lm_ct").as("c_target"),
        col("_lm_cs").as("c_source"), col("_lm_lr").as("lr_micro"),
        (col("_lm_ct") * col("_lm_lr")).as("contrib_micro"))
  }

  /** Shared ratio table for the DSIR faces: per term, source count,
    * target count, and the quantized log importance ratio (both ln's
    * floor-quantized to 1e-6 BIGINTs BEFORE the subtraction — the
    * d40 parity rule per side).
    */
  private def termLogRatios(toks: DataFrame): DataFrame = {
    val counts = toks.groupBy(col("_lm_t"))
      .agg(count(lit(1)).as("_lm_cs"),
        sum(when(col("_lm_tgt"), 1L).otherwise(0L)).as("_lm_ct"))
    val totals = counts.agg(sum(col("_lm_cs")).as("_lm_ts"),
      coalesce(sum(col("_lm_ct")), lit(0L)).as("_lm_tt"),
      count(lit(1)).as("_lm_v"))
    def lp(c: org.apache.spark.sql.Column,
        total: org.apache.spark.sql.Column) =
      floor(log(c.cast("double") / (total + col("_lm_v")).cast("double"))
        * lit(LpScale.toDouble)).cast("long")
    counts.crossJoin(totals)
      .select(col("_lm_t"), col("_lm_cs"), col("_lm_ct"),
        (lp(col("_lm_ct") + 1, col("_lm_tt"))
          - lp(col("_lm_cs") + 1, col("_lm_ts"))).as("_lm_lr"))
  }
}
