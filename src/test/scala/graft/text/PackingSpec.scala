package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

class PackingSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def pack(docs: Seq[(Long, String)], budget: Int, groups: Int = 1) =
    Packing.packGreedy(docs.toDF("doc_id", "text"), "doc_id", "text",
      budget, groups)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  test("greedy fill in id order; exact fit stays in the pack") {
    // budgets in tokens: docs of 3, 2, 5, 4 tokens, budget 5:
    // [3+2 = 5 exact fit] [5] [4]
    val out = pack(Seq(
      (1L, "a b c"), (2L, "d e"), (3L, "f g h i j"), (4L, "k l m n")),
      budget = 5)
    assert(out == Seq((1L, 0L, 0L), (2L, 0L, 0L), (3L, 0L, 1L), (4L, 0L, 2L)))
  }

  test("an oversized document gets its own pack and closes it") {
    // 7-token doc > budget 5: own pack; following doc starts fresh
    val out = pack(Seq(
      (1L, "a b"), (2L, "c d e f g h i"), (3L, "j k")), budget = 5)
    assert(out == Seq((1L, 0L, 0L), (2L, 0L, 1L), (3L, 0L, 2L)))
  }

  test("groups pack independently with local pack ids") {
    val out = pack(Seq(
      (0L, "a b c"), (1L, "d e f"), (2L, "g h i"), (3L, "j k l")),
      budget = 4, groups = 2)
    // grp 0: docs 0,2 → packs 0,1; grp 1: docs 1,3 → packs 0,1
    assert(out == Seq((0L, 0L, 0L), (1L, 1L, 0L), (2L, 0L, 1L), (3L, 1L, 1L)))
  }

  test("one huge group streams through the fold (no per-group materialization)") {
    // 200k tiny docs all landing in ONE group exercise the iterator fold
    // path: with groupByKey+toSeq this group would materialize wholesale;
    // the secondary-sort fold keeps O(1) state. Every doc is 1 token and
    // budget is 4, so pack_id is exactly doc_id/4 within the single group
    // — pinned on a sample plus aggregate invariants over the whole run.
    val n = 200000L
    val docs = TestSession.spark.range(n)
      .select(col("id").as("doc_id"), lit("w").as("text"))
    val out = Packing.packGreedy(docs, "doc_id", "text",
      budget = 4, groups = 1)
    val stats = out.agg(
      count(lit(1)), countDistinct(col("pack_id")), max(col("pack_id")),
      sum(when(col("pack_id") === floor(col("doc_id") / 4), 0L).otherwise(1L)))
      .head()
    assert(stats.getLong(0) == n)
    assert(stats.getLong(1) == n / 4)
    assert(stats.getLong(2) == n / 4 - 1)
    assert(stats.getLong(3) == 0L, "pack assignment must be doc_id/4")
  }

  test("pack token sums never exceed the budget except single-doc packs") {
    val rnd = new scala.util.Random(11)
    val docs = (1L to 60L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(9))("w").mkString(" ")))
    val budget = 10
    val toks = docs.toMap.view.mapValues(_.split(" ").length).toMap
    pack(docs, budget, groups = 3)
      .groupBy(x => (x._2, x._3)) // (grp, pack)
      .foreach { case (_, members) =>
        val total = members.map(m => toks(m._1)).sum
        assert(total <= budget || members.length == 1,
          s"overfull multi-doc pack: $members")
      }
  }
}
