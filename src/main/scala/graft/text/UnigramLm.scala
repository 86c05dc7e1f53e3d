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
  * the exchanges a 100-TB corpus pays anyway for term stats. At that
  * scale the vocabulary is capped to the top-V terms BEFORE the scoring
  * join (cap → broadcast join), with out-of-vocab tokens falling back
  * to the smoothing floor — same probability the add-one model gives an
  * unseen term; uncapped here where the whole vocab fits.
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

  /** (id, n_tokens, lp_sum, avg_lp): `lp_sum` is the exact integer sum
    * of quantized per-token log-probs (micro-units); `avg_lp` the mean
    * per-token log-prob in natural units.
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("_lm_id"),
      explode(TF.tokens(col(textCol))).as("_lm_t"))
    val counts = toks.groupBy(col("_lm_t")).agg(count(lit(1)).as("_lm_c"))
    val totals = counts.agg(sum(col("_lm_c")).as("_lm_total"),
      count(lit(1)).as("_lm_vocab"))
    // lp(t) = floor(ln((c+1)/(total+vocab)) * 1e6): BIGINT → DOUBLE
    // promotions and the quantization mirror the oracle token for token.
    val probs = counts.crossJoin(totals)
      .select(col("_lm_t"),
        floor(log((col("_lm_c") + 1).cast("double")
          / (col("_lm_total") + col("_lm_vocab")).cast("double"))
          * lit(LpScale.toDouble)).cast("long").as("_lm_lp"))
    toks.join(probs, "_lm_t")
      .groupBy(col("_lm_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("_lm_lp")).as("lp_sum"))
      .select(col("_lm_id").as(idCol), col("n_tokens"), col("lp_sum"),
        (col("lp_sum").cast("double") / col("n_tokens")
          / lit(LpScale.toDouble)).as("avg_lp"))
  }
}
