package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Systematic PPS invariants: every group lands EXACTLY its budget of
  * selection points (Σ n_hits = budget — the property uniform samplers
  * cannot give you on skewed weights), heavier-than-step rows select
  * multiply, zero-weight rows never select, and any partition layout
  * produces the identical sample. Arithmetic parity is oracle-pinned
  * (d39).
  */
class SamplingSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(13)
  private val rows = (0 until 300).map { i =>
    (s"g${i % 3}", i.toLong,
      if (i % 37 == 0) 0L // zero-weight rows
      else if (i == 17) 5000L // one dominating row in g2
      else rnd.nextInt(50) + 1L)
  }

  test("each group receives exactly its budget of hits; zero weights never select") {
    val budget = 12
    val out = Sampling.ppsSystematic(
      rows.toDF("g", "id", "w"), Seq("g"), "id", "w", budget)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val perGroup = out.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(perGroup == Map("g0" -> budget.toLong, "g1" -> budget.toLong,
      "g2" -> budget.toLong), s"budgets off: $perGroup")
    assert(out.forall(_._3 > 0), "a zero-weight row was selected")
    // the dominating row (5000 of g2's ~7500 total) must take several
    // of g2's 12 points — weight-proportional, not one-row-one-vote
    val dom = out.find(_._2 == 17L)
    assert(dom.exists(_._4 >= 4), s"heavy row under-sampled: $dom")
  }

  test("a zero-total group selects nothing; a negative weight fails loudly") {
    val mixed = Seq(("live", 1L, 10L), ("live", 2L, 10L),
      ("dead", 3L, 0L), ("dead", 4L, 0L)).toDF("g", "id", "w")
    val out = Sampling.ppsSystematic(mixed, Seq("g"), "id", "w", 4)
      .collect().map(r => (r.getString(0), r.getLong(3)))
    assert(out.forall(_._1 == "live"), s"zero-total group selected rows: ${out.toSeq}")
    assert(out.map(_._2).sum == 4L)
    val bad = Seq(("g", 1L, 5L), ("g", 2L, -3L)).toDF("g", "id", "w")
    val e = intercept[Exception] {
      Sampling.ppsSystematic(bad, Seq("g"), "id", "w", 2).collect()
    }
    assert(e.getMessage != null)
  }

  test("sample is identical under any input partitioning") {
    def run(parts: Int) = Sampling.ppsSystematic(
      rows.toDF("g", "id", "w").repartition(parts), Seq("g"), "id", "w", 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(run(1) == run(13) && run(13) == run(32))
  }

  test("budgets past 2^30 do not wrap: 2*budget is long arithmetic") {
    // Spelled `2 * budget` in SQL text the doubling folds in 32-bit int
    // arithmetic: budget = 2^30 makes it -2^31 and corrupts every
    // selection point. The documented bound is 2·budget·W < 2^63, which
    // comfortably admits budgets above 2^30 when W is small.
    val big = 1 << 30
    val out = Sampling.ppsSystematic(
      Seq(("g", 1L, 1L), ("g", 2L, 1L)).toDF("g", "id", "w"),
      Seq("g"), "id", "w", big)
      .collect().map(r => (r.getLong(1), r.getLong(3))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, big / 2L), (2L, big / 2L)),
      s"expected each unit-weight row to take budget/2 points: ${out.toSeq}")
  }
}
