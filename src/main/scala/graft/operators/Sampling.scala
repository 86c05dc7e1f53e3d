package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling for corpus mixing.
  *
  * [[ppsSystematic]] is systematic probability-proportional-to-size
  * sampling: per group, lay `budget` equally-spaced selection points
  * over the cumulative weight axis (offset by half a step — no RNG
  * anywhere) and select every row whose weight interval contains a
  * point. A row's expected hit count is exactly `budget · w / W`, rows
  * heavier than one step select multiply (`n_hits` > 1 — the caller
  * repeats or upweights them), and the whole decision is INTEGER
  * arithmetic on (2·budget·cum) vs (2·W), so the sample is
  * bit-reproducible in any engine (oracle d39) — unlike
  * Efraimidis–Spirakis keys, whose pow() differs across libm builds.
  *
  * The deterministic-hash samplers (d28's stratified rates, d38's
  * budget smallest hashes) pick UNIFORMLY within a group; this is the
  * weighted complement — sample documents proportional to token count
  * (or any quality weight) so the mixed corpus hits a token budget,
  * not a document budget.
  *
  * Scale shape: one group-keyed exchange; the running-sum window and
  * the group-total window share its partitioning (same single-exchange
  * contract as sessionization, spillable sort). Weights must be
  * nonneg integers with 2·budget·W < 2⁶³ — at 10¹² tokens per group
  * and budget 10⁶ that bound still holds with 2⁹ to spare.
  */
object Sampling {

  /** Returns the selected rows: input columns plus `n_hits` (>= 1).
    *
    * Preconditions, enforced or handled: a NEGATIVE weight fails the
    * job loudly (truncating div is only floor on nonnegative operands —
    * a signed weight would corrupt the sample silently otherwise); a
    * group whose total weight is ZERO simply selects nothing (no
    * selection axis to lay points on — and no ANSI divide-by-zero).
    * `idCol` must be unique within each group: the cumulative axis is
    * ordered by it, so tied ids would make the running sum — and
    * therefore the selection — partition-order dependent.
    */
  def ppsSystematic(df: DataFrame, groupCols: Seq[String], idCol: String,
      weightCol: String, budget: Int): DataFrame = {
    require(budget >= 1, s"budget must be positive, got $budget")
    val wOrder = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    // The guard rides the cum computation itself so no optimizer phase
    // can prune it (a bare assert_true column would be dead code).
    val checkedW = when(col(weightCol) < 0,
      raise_error(concat(lit("ppsSystematic: negative weight in "),
        col(weightCol).cast("string"))).cast("long"))
      .otherwise(col(weightCol).cast("long"))
    // f(x) = #selection points at or below x = ((2m·x div W) + 1) div 2
    // (points sit at odd multiples of W/(2m)); hits = f(cum) − f(prev).
    // Operands stay nonnegative, so div's truncation IS floor in every
    // engine. 2·budget is emitted as a LONG literal (computed in Scala,
    // where Int.MaxValue-range budgets can't wrap): spelled `2 * budget`
    // in SQL text it would fold in 32-bit int arithmetic and a budget
    // past 2³⁰ would silently corrupt every selection point.
    def f(x: String) =
      s"(((${2L * budget} * $x) div _pps_w) + 1) div 2"
    df
      .withColumn("_pps_cum", sum(checkedW).over(wOrder).cast("long"))
      .withColumn("_pps_w", sum(col(weightCol)).over(wAll).cast("long"))
      .filter(col("_pps_w") > 0) // zero-total group: nothing to select
      .withColumn("n_hits",
        expr(s"${f("_pps_cum")} - ${f(s"(_pps_cum - $weightCol)")}"))
      .filter(col("n_hits") > 0)
      .drop("_pps_cum", "_pps_w")
  }
}
