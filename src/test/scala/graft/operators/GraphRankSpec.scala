package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

class GraphRankSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int,
      parts: Int = 1): Map[Long, Long] =
    GraphRank.pageRank(
        edges.toDF("src", "dst").repartition(parts), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Driver-side replay of the exact integer recurrence. */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val contrib = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => rank(s) / deg(s) }.sum
      }
      rank = nodes.map(n =>
        n -> (150000L + 85L * contrib.getOrElse(n, 0L) / 100L)).toMap
    }
    rank
  }

  test("hand-computed two-iteration fixture, dangling node included") {
    // 1 -> {2,3}, 2 -> 1; node 3 is dangling (receives, never emits).
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L))
    // iter 1: contrib(1)=1000000/1, contrib(2)=contrib(3)=1000000/2
    //   r1 = (1000000, 575000, 575000)
    // iter 2: contrib(1)=575000, contrib(2)=contrib(3)=1000000/2
    //   r2(1) = 150000 + 85*575000/100 = 638750
    assert(ranksOf(edges, iters = 1) ===
      Map(1L -> 1000000L, 2L -> 575000L, 3L -> 575000L))
    assert(ranksOf(edges, iters = 2) ===
      Map(1L -> 638750L, 2L -> 575000L, 3L -> 575000L))
  }

  test("matches the driver-side replay on a random graph, any layout") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(400)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val want = reference(edges, iters = 3)
    assert(ranksOf(edges, iters = 3, parts = 1) === want)
    assert(ranksOf(edges, iters = 3, parts = 13) === want,
      "partition layout changed the fixed-point ranks")
  }

  test("duplicate input edges collapse before degree counting") {
    // Same edge listed three times must not triple the out-degree.
    val dup = Seq((1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L))
    assert(ranksOf(dup, iters = 1) === ranksOf(Seq((1L, 2L), (2L, 1L)), 1))
  }

  test("rejects nonsensical parameters loudly") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](GraphRank.pageRank(e, "src", "dst", 0))
    intercept[IllegalArgumentException](
      GraphRank.pageRank(e, "src", "dst", 1, dampNum = 101L))
  }
}
