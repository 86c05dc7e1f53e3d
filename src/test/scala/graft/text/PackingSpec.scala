package graft.text

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
