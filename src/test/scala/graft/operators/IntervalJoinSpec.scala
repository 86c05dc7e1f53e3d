package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

class IntervalJoinSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val W = 100L

  // (id, user, t); window (t, t+100]
  private val views = Seq(
    (1L, "u1", 0L), (2L, "u1", 95L), (3L, "u1", 250L), (4L, "u2", 10L))
    .toDF("id", "user", "t")
  private val clicks = Seq(
    (100L, "u1", 0L), (101L, "u1", 50L), (102L, "u1", 100L),
    (103L, "u1", 101L), (104L, "u1", 195L), (105L, "u1", 350L),
    (106L, "u3", 20L))
    .toDF("cid", "user", "t")

  private def pairs() = IntervalJoin.intervalJoin(
    views, clicks, keys = Seq("user"), timeCol = "t", windowUs = W,
    rightPayload = Seq("cid"))
    .select(col("id"), col("iv_cid"))
    .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("boundaries: exclusive at t, inclusive at t+w; cross-bucket matches found") {
    assert(pairs() == Set(
      (1L, 101L), (1L, 102L), // t=0: click 0 excluded (t_r > t_l), 100 = t+w kept
      (2L, 102L), (2L, 103L), (2L, 104L), // 195 = 95+100 inclusive, next bucket
      (3L, 105L))) // 350 = 250+100, bucket 3 vs view bucket 2
  }

  test("fuzz: bucketed join ≡ naive per-key range join") {
    val rnd = new scala.util.Random(7)
    val l = Seq.tabulate(200)(i =>
      (i.toLong, s"u${rnd.nextInt(3)}", rnd.nextInt(1000).toLong))
      .toDF("id", "user", "t")
    val r = Seq.tabulate(300)(i =>
      (1000L + i, s"u${rnd.nextInt(3)}", rnd.nextInt(1000).toLong))
      .toDF("cid", "user", "t")
    val w = 37L
    val got = IntervalJoin.intervalJoin(l, r, Seq("user"), "t", w, Seq("cid"))
      .select(col("id"), col("iv_cid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val want = l.as("l").join(r.as("r"),
      col("l.user") === col("r.user") &&
        col("r.t") > col("l.t") && col("r.t") <= col("l.t") + w)
      .select(col("l.id"), col("r.cid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == want)
    assert(want.nonEmpty, "fuzz degenerated to an empty comparison")
  }

  test("payload repeating timeCol is rejected (would emit duplicate column)") {
    intercept[IllegalArgumentException] {
      IntervalJoin.intervalJoin(
        views, clicks, Seq("user"), "t", W, rightPayload = Seq("cid", "t"))
    }
  }

  test("negative (pre-epoch) times: bucketed join ≡ naive range join") {
    val rnd = new scala.util.Random(11)
    val l = Seq.tabulate(150)(i =>
      (i.toLong, s"u${rnd.nextInt(3)}", rnd.nextInt(1000) - 500L))
      .toDF("id", "user", "t")
    val r = Seq.tabulate(250)(i =>
      (1000L + i, s"u${rnd.nextInt(3)}", rnd.nextInt(1000) - 500L))
      .toDF("cid", "user", "t")
    val w = 37L
    val got = IntervalJoin.intervalJoin(l, r, Seq("user"), "t", w, Seq("cid"))
      .select(col("id"), col("iv_cid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val want = l.as("l").join(r.as("r"),
      col("l.user") === col("r.user") &&
        col("r.t") > col("l.t") && col("r.t") <= col("l.t") + w)
      .select(col("l.id"), col("r.cid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == want)
    assert(want.nonEmpty, "fuzz degenerated to an empty comparison")
  }

  test("each matching pair is emitted exactly once (no probe double-count)") {
    val out = IntervalJoin.intervalJoin(
      views, clicks, Seq("user"), "t", W, Seq("cid"))
      .select(col("id"), col("iv_cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.size == out.toSet.size, s"duplicated pairs in: $out")
  }
}
