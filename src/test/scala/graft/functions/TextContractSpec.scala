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
