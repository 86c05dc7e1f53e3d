package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** e37's nested sweep-line contract: the two-level (hour ⊂ day)
  * (total, maxPrefix) fold equals a flat driver replay of the sweep —
  * the algebra is associative, so nesting changes NOTHING about the
  * answer — while no collected array ever exceeds ONE HOUR's deltas,
  * even on a day that is hot enough to dwarf its siblings (the bound
  * the single-level fold could not give: its arrays were day-sized).
  */
class SweepSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val hourUs = 3600L * 1000 * 1000
  private val dayUs = 24L * hourUs

  // A HOT day 0 (60 sessions in hour 0, 40 in hour 5, heavily
  // overlapped) next to a quiet day 1, plus a session straddling the
  // day boundary so the cross-bucket carry is exercised.
  private lazy val deltaRows: Seq[(Long, Long, Long)] = {
    val hot0 = (0L until 60L).flatMap { i =>
      val s = i * 1000L; val e = hourUs / 2 + i * 1000L
      Seq((0L, s, 1L), (0L, e, -1L))
    }
    val hot5 = (0L until 40L).flatMap { i =>
      val s = 5L * hourUs + i * 7000L; val e = 5L * hourUs + hourUs / 3 + i * 7000L
      Seq((0L, s, 1L), (0L, e, -1L))
    }
    val straddle = Seq((0L, 23L * hourUs + 100L, 1L), (1L, dayUs + 5000L, -1L))
    val quiet = (0L until 3L).flatMap { i =>
      val s = dayUs + 2L * hourUs + i * 500L; val e = s + 900L
      Seq((1L, s, 1L), (1L, e, -1L))
    }
    hot0 ++ hot5 ++ straddle ++ quiet
  }

  private lazy val deltas =
    deltaRows.toDF("day_idx", "t", "delta")

  /** Flat driver replay: one global sort of each day's deltas by
    * (t, starts-before-ends), a running sum, per-day (tot, maxp) —
    * the single-level truth the nested fold must reproduce.
    */
  private def flatReplay(): Seq[(Long, Long, Long, Long)] = {
    val byDay = deltaRows.groupBy(_._1).toSeq.sortBy(_._1)
    var carry = 0L
    byDay.map { case (day, rows) =>
      val sorted = rows.map { case (_, t, d) => (t, -d, d) }.sorted
      var run = 0L; var maxp = 0L; var starts = 0L
      sorted.foreach { case (_, _, d) =>
        run += d
        if (run > maxp) maxp = run
        if (d == 1L) starts += 1
      }
      val out = (day, starts, carry, carry + maxp)
      carry += run
      out
    }
  }

  test("nested day summaries ≡ the flat sweep replay (associativity, including a day-straddling session)") {
    val days = EventQueries.sweepDaySummaries(deltas)
    import org.apache.spark.sql.expressions.Window
    val wd = Window.orderBy(col("day_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val got = days
      .withColumn("carry_in", coalesce(sum(col("tot")).over(wd), lit(0L)))
      .select(col("day_idx"), col("n_sessions_start"), col("carry_in"),
        (col("carry_in") + col("maxp")).as("peak"))
      .orderBy(col("day_idx"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == flatReplay(), s"\n got: $got\nwant: ${flatReplay()}")
    // sanity: the fixture's hot hour really overlaps (peak ≫ 1)
    assert(got.head._4 >= 30L, s"fixture must be hot: $got")
  }

  test("no collected array exceeds one HOUR's deltas on a hot day") {
    val hours = EventQueries.sweepHourSummaries(deltas)
      .select(col("day_idx"), col("hour_idx"), size(col("ds")).as("n"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2)))
    // array size per (day, hour) == that hour's delta count…
    // (hour_idx is the GLOBAL t div HourUs, mirroring the query)
    val byKey = deltaRows.groupBy(r => (r._1, r._2 / hourUs))
      .view.mapValues(_.size.toLong).toMap
    assert(hours.nonEmpty)
    hours.foreach { case ((d, h), n) =>
      assert(n.toLong == byKey((d, h)),
        s"hour ($d,$h) array must hold exactly its own deltas")
    }
    // …and the hot DAY's total never lands in one array: the max
    // array is strictly smaller than day 0's delta count.
    val day0 = deltaRows.count(_._1 == 0L).toLong
    val maxArr = hours.map(_._2).max.toLong
    assert(maxArr < day0,
      s"hot-day deltas ($day0) must split across hour arrays (max $maxArr)")
  }
}
