package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

class ZOrderSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  /** Reference interleave, independent of the Column arithmetic. */
  private def ref(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (z, i) =>
      z | ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
    }

  test("zkey matches the reference interleave, including domain corners") {
    val bits = 16
    val lim = 1L << bits
    val rnd = new scala.util.Random(11)
    val pts = Seq((0L, 0L), (lim - 1, lim - 1), (0L, lim - 1), (lim - 1, 0L)) ++
      Seq.fill(500)((rnd.nextInt(1 << bits).toLong, rnd.nextInt(1 << bits).toLong))
    val got = pts.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zkey(col("a"), col("b"), bits).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (a, b) =>
      assert(got((a, b)) == ref(a, b, bits), s"zkey($a, $b)")
    }
  }

  test("zkey fails loudly outside [0, 2^bits)") {
    def z(a: Long, b: Long) =
      Seq((a, b)).toDF("a", "b")
        .select(ZOrder.zkey(col("a"), col("b"), 8)).collect()
    intercept[Exception](z(256L, 0L))
    intercept[Exception](z(0L, -1L))
    intercept[IllegalArgumentException](ZOrder.zkey(lit(0L), lit(0L), 0))
  }

  test("z-ordered layout decodes far fewer rows than a scattered one for a box") {
    // 200k points uniform over [0,1024)^2, written (a) z-ordered into 64
    // range partitions and (b) hash-scattered into 64 files. Every file
    // is one parquet row group here, so the scan's numOutputRows metric
    // counts rows DECODED after row-group stat pruning by the pushed box
    // filter — the quantity the clustering claim is about. The box is
    // (1/16)^2 of the domain; z-order confines it to the few files whose
    // rectangles touch it, scatter forces every file to decode.
    val n = 200000
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(n)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
    val df = pts.toDF("id", "x", "y")
    val zdir = Files.createTempDirectory("graft-zorder").toString
    val sdir = Files.createTempDirectory("graft-scatter").toString
    ZOrder.writeZOrdered(df, "x", "y", zdir, bits = 10, outPartitions = 64)
    df.repartition(64, col("id")).write.mode("overwrite").parquet(sdir)

    def decoded(path: String): (Long, Set[Long]) = {
      val q = spark.read.parquet(path)
        .filter(col("x").between(256, 319) && col("y").between(512, 575))
        .select(col("id"))
      val ids = q.collect().map(_.getLong(0)).toSet
      val scanRows = q.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numOutputRows").value
      }.sum
      (scanRows, ids)
    }
    val (zRows, zIds) = decoded(zdir)
    val (sRows, sIds) = decoded(sdir)
    assert(zIds == sIds, "layout changed the query answer")
    assert(zIds.nonEmpty)
    assert(sRows >= n * 9L / 10,
      s"scattered layout should decode ~everything, decoded $sRows of $n")
    assert(zRows * 10 < sRows,
      s"z-order should prune >=10x vs scatter: decoded $zRows vs $sRows")
  }
}
