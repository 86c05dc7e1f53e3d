package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Contracts of the native text expressions against their built-in
  * compositions — the two must be interchangeable wherever the inputs
  * satisfy the documented invariants. Property cases use a seeded
  * generator (deterministic across runs), like SplittersSpec.
  */
class TextContractSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  test("sortedIntersectCount == size(array_intersect) on sorted-distinct arrays") {
    val rnd = new scala.util.Random(7)
    val vocab = ('a' to 'p').map(_.toString)
    val cases = Seq.fill(60) {
      def set() = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        .distinct.sorted
      (set(), set())
    }
    val rows = cases.toDF("a", "b")
      .select(
        text.sortedIntersectCount(col("a"), col("b")).as("native"),
        size(array_intersect(col("a"), col("b"))).as("builtin"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("hash32 native ≡ declarative conv(substring(md5)) — ascii, unicode, empty, null") {
    // The r21 native expression must be bit-identical to the
    // cross-engine md5-hex contract every oracle replays (the first 8
    // hex digits ARE the first 4 digest bytes, read unsigned).
    val rnd = new scala.util.Random(21)
    val samples = Seq("", " ", "a", "The quick brown fox", "é©漢字🚀",
      "line\nbreak\ttab", "0", "-1", "a" * 500) ++
      Seq.fill(200)(rnd.alphanumeric.take(rnd.nextInt(40)).mkString) :+
      (null: String)
    val rows = samples.toDF("s")
      .select(
        graft.text.TextFunctions.hash32(col("s")).as("native"),
        graft.text.TextFunctions.hash32Declarative(col("s")).as("decl"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) {
        assert(r.getLong(0) == r.getLong(1))
        assert(r.getLong(0) >= 0L && r.getLong(0) < 4294967296L)
      }
    }
  }

  test("ahoCounts: overlapping, nested, and absent patterns against a brute scan") {
    val pats = Seq("aba", "ba", "a", "never here")
    // "ababa": "aba" overlaps itself at 0 and 2; "ba" at 1 and 3;
    // "a" at 0, 2, 4 — the full overlap + suffix-output matrix.
    val texts = Seq("ababa", "", "xyz", "aba", "ba" * 50, "ab")
    def brute(t: String, p: String): Long =
      (0 to t.length - p.length).count(i => t.regionMatches(i, p, 0, p.length))
        .toLong
    val rows = texts.toDF("t")
      .select(col("t"), text.ahoCounts(col("t"), pats).as("c"))
      .collect()
    rows.foreach { r =>
      val t = r.getString(0)
      val got = r.getSeq[Long](1)
      pats.zipWithIndex.foreach { case (p, i) =>
        assert(got(i) == brute(t, p), s"text='$t' pattern='$p'")
      }
    }
  }

  test("ahoCounts: multi-byte UTF-8 patterns never match mid-codepoint") {
    // 'é' is 0xC3 0xA9; 'é'+'©' share the 0xC2/0xC3 lead-byte space —
    // byte-level matching must still be exact character matching.
    val pats = Seq("é", "éé", "e")
    val rows = Seq("ééé", "eée", "©").toDF("t")
      .select(text.ahoCounts(col("t"), pats).as("c"))
      .collect().map(_.getSeq[Long](0))
    assert(rows(0) == Seq(3L, 2L, 0L)) // éé overlaps: positions 0 and 1
    assert(rows(1) == Seq(1L, 0L, 2L))
    assert(rows(2) == Seq(0L, 0L, 0L))
  }

  test("ahoCounts survives serialization and matches under wholestage codegen off") {
    val pats = Seq("scan", "table scan")
    val df = Seq.tabulate(40)(i => s"a table scan number $i scan scan")
      .toDF("t")
    val expr = text.ahoCounts(col("t"), pats)
    val on = df.select(expr.as("c")).collect().map(_.getSeq[Long](0)).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = df.select(expr.as("c")).collect().map(_.getSeq[Long](0)).toSeq
      assert(on == off, "codegen and interpreted paths disagree")
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(on.forall(_ == Seq(3L, 1L)))
  }

  test("shingles native expression matches the documented contract") {
    val r = Seq(Seq("w1", "w2", "w3", "w4", "w5")).toDF("toks")
      .select(text.shingles(col("toks"), 3).as("sh"))
      .head().getSeq[String](0)
    assert(r == Seq("w1 w2 w3", "w2 w3 w4", "w3 w4 w5"))
  }

  test("empty-side intersections are zero") {
    val r = Seq((Seq.empty[String], Seq("a", "b"))).toDF("a", "b")
      .select(text.sortedIntersectCount(col("a"), col("b")),
        text.sortedIntersectCount(col("b"), col("a")),
        text.sortedIntersectCount(col("a"), col("a")))
      .head()
    assert(r.getInt(0) == 0 && r.getInt(1) == 0 && r.getInt(2) == 0)
  }
}
