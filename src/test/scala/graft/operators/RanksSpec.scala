package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

class RanksSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  // Duplicate scores force the tie-break key to matter; ids are shuffled
  // so input order never accidentally equals rank order.
  private lazy val scored = (0 until 1000)
    .map(i => ((i * 613) % 1000L, (i % 37).toLong))
    .toDF("id", "score")

  test("globalRowNumber equals the single-partition window row_number") {
    val got = Ranks.globalRowNumber(
        scored, Seq(col("score"), col("id")), "rk", partitions = 7)
      .select(col("id"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = scored
      .withColumn("rk",
        row_number().over(Window.orderBy(col("score"), col("id"))).cast("long"))
      .select(col("id"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("ranks are dense 1..n and ordered by the sort keys") {
    val rows = Ranks.globalRowNumber(
        scored, Seq(col("score"), col("id")), "rk", partitions = 5)
      .collect().map(r => (r.getAs[Long]("rk"), r.getAs[Long]("score"),
        r.getAs[Long]("id")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 1000L))
    val keyOrder = rows.map(t => (t._2, t._3))
    assert(keyOrder.toSeq == keyOrder.sortBy(identity).toSeq)
  }

  test("more partitions than rows (empty partitions) still rank densely") {
    val tiny = Seq((3L, 30L), (1L, 10L), (2L, 20L)).toDF("id", "v")
    val rows = Ranks.globalRowNumber(tiny, Seq(col("v")), "rk",
        partitions = 16)
      .select(col("id"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
    assert(rows.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("empty input yields an empty ranked frame with the rank column") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    val out = Ranks.globalRowNumber(empty, Seq(col("v")), "rk")
    assert(out.columns.toSeq == Seq("id", "v", "rk"))
    assert(out.count() == 0L)
  }
}
