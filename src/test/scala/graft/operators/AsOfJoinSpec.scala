package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

class AsOfJoinSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val trades = Seq( // (id, sym, t)
    (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "b", 15L))
    .toDF("id", "sym", "t")
  private val quotes = Seq( // (qid, sym, t)
    (100L, "a", 5L), (101L, "a", 20L), (102L, "a", 25L), (103L, "c", 1L))
    .toDF("qid", "sym", "t")

  private def run() = AsOfJoin.asofJoin(trades, quotes,
    keys = Seq("sym"), timeCol = "t", rightPayload = Seq("qid", "t"),
    prefix = "q_", tieBreak = Seq(col("q_qid")))
    .select("id", "q_qid", "q_t").collect()
    .map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getLong(1)),
      if (r.isNullAt(2)) None else Some(r.getLong(2))))
    .sortBy(_._1).toSeq

  test("latest right row at or before each left time, per key") {
    assert(run() == Seq(
      (1L, Some(100L), Some(5L)), // t=10 → quote at 5
      (2L, Some(101L), Some(20L)), // equal time matches (<= semantics)
      (3L, Some(102L), Some(25L)), // t=30 → quote at 25
      (4L, None, None))) // sym b has no quotes
  }

  test("property: matches brute-force max-time-at-or-before on random data") {
    val rnd = new scala.util.Random(7)
    val syms = Seq("a", "b", "c")
    val l = Seq.tabulate(120)(i =>
      (i.toLong, syms(rnd.nextInt(3)), rnd.nextInt(50).toLong))
    val r = Seq.tabulate(80)(i =>
      (1000L + i, syms(rnd.nextInt(3)), rnd.nextInt(50).toLong))
    val got = AsOfJoin.asofJoin(l.toDF("id", "sym", "t"),
      r.toDF("qid", "sym", "t"), Seq("sym"), "t", Seq("qid"), "q_",
      tieBreak = Seq(col("q_qid")))
      .select("id", "q_qid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap
    for ((id, sym, t) <- l) {
      val cands = r.filter(q => q._2 == sym && q._3 <= t)
      // expected: max time, then max qid among ties (tieBreak asc → last)
      val exp = if (cands.isEmpty) -1L
        else cands.maxBy(q => (q._3, q._1))._1
      assert(got(id) == exp, s"left row $id ($sym, $t)")
    }
  }

  test("a null payload value never tears the match across right rows") {
    // Latest quote (102) has px=null; per-column backfill would pair
    // qid=102 with px=9.0 from the OLDER quote 101 — a row that never
    // existed. The struct fill must take quote 102 whole: (102, null).
    val q = Seq((101L, "a", 5L, Some(9.0)), (102L, "a", 8L, None))
      .toDF("qid", "sym", "t", "px")
    val out = AsOfJoin.asofJoin(trades, q, Seq("sym"), "t",
      rightPayload = Seq("qid", "px"), prefix = "q_")
      .filter(col("id") === 1L) // trade at t=10 → quote 102
      .select("q_qid", "q_px").head()
    assert(out.getLong(0) == 102L)
    assert(out.isNullAt(1), "px must be quote 102's null, not quote 101's 9.0")
  }

  test("an all-null payload row still counts as a match") {
    val q = Seq((201L, "a", 5L))
      .toDF("qid", "sym", "t")
      .select(col("sym"), col("t"),
        org.apache.spark.sql.functions.lit(null).cast("double").as("px"))
    val out = AsOfJoin.asofJoin(
      trades.filter(col("id") === 1L), q, Seq("sym"), "t",
      rightPayload = Seq("px"), prefix = "q_")
    assert(out.count() == 1) // matched (null px), not dropped or mis-tagged
  }

  test("left columns and row count are preserved") {
    val out = AsOfJoin.asofJoin(trades, quotes, Seq("sym"), "t",
      Seq("qid"), "q_")
    assert(out.count() == trades.count())
    assert(Seq("id", "sym", "t", "q_qid").forall(out.columns.contains))
  }

  test("forward direction: earliest right at-or-after, ties to tieBreak, trailing nulls") {
    val orders = Seq((1L, "a", 10L), (2L, "a", 15L), (3L, "a", 40L),
      (4L, "b", 5L)).toDF("id", "sym", "t")
    val fills = Seq((900L, "a", 10L), (901L, "a", 10L), (902L, "a", 30L))
      .toDF("fid", "sym", "t")
    val got = AsOfJoin.asofJoin(orders, fills, Seq("sym"), "t",
      rightPayload = Seq("fid"), prefix = "f_",
      tieBreak = Seq(col("f_fid")), direction = "forward")
      .select(col("id"), col("f_fid"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    // order 1 (t=10): fills 900/901 tie at t=10 (>= is inclusive) —
    // tieBreak picks 900; order 2 (t=15): next fill is 902 at t=30;
    // order 3 (t=40): nothing follows → null; order 4: other key → null
    assert(got == Map(1L -> Some(900L), 2L -> Some(902L),
      3L -> None, 4L -> None), s"got $got")
    // backward on the same data stays the mirrored contract
    val back = AsOfJoin.asofJoin(orders, fills, Seq("sym"), "t",
      rightPayload = Seq("fid"), prefix = "f_",
      tieBreak = Seq(col("f_fid").desc))
      .select(col("id"), col("f_fid"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    // last() takes the LATEST frame row, so the desc tieBreak puts the
    // smallest fid last among the t=10 ties → 900 wins there too
    assert(back == Map(1L -> Some(900L), 2L -> Some(900L),
      3L -> Some(902L), 4L -> None), s"got $back")
  }

  test("tolerance nulls matches beyond the bound, keeps those within, both directions") {
    def run(tol: Long, dir: String) = AsOfJoin.asofJoin(trades, quotes,
      keys = Seq("sym"), timeCol = "t", rightPayload = Seq("qid"),
      prefix = "q_", tieBreak = Seq(col("q_qid")), direction = dir,
      tolerance = tol)
      .select("id", "q_qid").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sortBy(_._1).toSeq
    // Backward, tol=5: trade t=10 → quote t=5 (gap 5, kept); t=20 →
    // t=20 (gap 0); t=30 → t=25 (gap 5). Same as unbounded here.
    assert(run(5L, "backward") == Seq(
      (1L, Some(100L)), (2L, Some(101L)), (3L, Some(102L)), (4L, None)))
    // Backward, tol=4: the two gap-5 matches null out; the exact-time
    // match survives.
    assert(run(4L, "backward") == Seq(
      (1L, None), (2L, Some(101L)), (3L, None), (4L, None)))
    // Forward, tol=4: t=10 → next quote t=20 (gap 10) nulls; t=20 →
    // t=20 (gap 0) kept; t=30 has no following quote either way.
    assert(run(4L, "forward") == Seq(
      (1L, None), (2L, Some(101L)), (3L, None), (4L, None)))
    // tolerance = 0 means unbounded (the default contract).
    assert(run(0L, "backward") == Seq(
      (1L, Some(100L)), (2L, Some(101L)), (3L, Some(102L)), (4L, None)))
  }

  test("a left column colliding with an emitted name fails loudly") {
    // Without the guard the union-based fill would silently overwrite
    // the pre-existing q_qid (e.g. the output of a previous asofJoin
    // run with the same prefix).
    val chained = trades.withColumn("q_qid",
      org.apache.spark.sql.functions.lit(999L))
    val ex = intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(chained, quotes, Seq("sym"), "t",
        rightPayload = Seq("qid"), prefix = "q_")
    }
    assert(ex.getMessage.contains("q_qid"))
  }

  test("a right payload column named _asof_t is rejected, not silently shadowed") {
    // The matched row's own time rides in the payload struct as _asof_t
    // for the tolerance check; a payload field with the same name would
    // duplicate the struct field and getField would read the wrong one.
    val poisoned = quotes.withColumn("_asof_t",
      org.apache.spark.sql.functions.lit(-1L))
    val ex = intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(trades, poisoned, Seq("sym"), "t",
        rightPayload = Seq("qid", "_asof_t"))
    }
    assert(ex.getMessage.contains("_asof_t"))
  }
}
