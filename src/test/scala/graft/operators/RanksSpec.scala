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

  // Heavy duplication (v % 97) so in-bucket rank-k lands on tied values;
  // group sizes differ so per-group k differs.
  private lazy val grouped = (0 until 900)
    .map(i => (s"g${i % 3}", ((i * 613) % 900 % 97).toLong))
    .filter { case (g, _) => g != "g2" || true }
    .toDF("grp", "v")

  test("groupedKthSmallest equals the per-group window selection for every k") {
    val n = grouped.groupBy($"grp").agg(count(lit(1)).as("n"))
    for (kExpr <- Seq("(n + 1) div 2", "1", "n")) {
      val ks = n.select($"grp", expr(kExpr).as("k"))
      val got = Ranks.groupedKthSmallest(grouped, "grp", "v", ks, 8L)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val want = grouped
        .withColumn("rn",
          row_number().over(Window.partitionBy($"grp").orderBy($"v")))
        .join(ks, Seq("grp")).filter($"rn" === $"k")
        .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("v")))
        .toMap
      assert(got == want, s"selection disagrees with the window at k = $kExpr")
    }
  }

  test("groupedKthSmallest: width 1 (exact histogram) and huge width (one bucket) agree") {
    val ks = grouped.groupBy($"grp").agg(count(lit(1)).as("n"))
      .select($"grp", expr("(n + 1) div 2").as("k"))
    val narrow = Ranks.groupedKthSmallest(grouped, "grp", "v", ks, 1L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val wide = Ranks.groupedKthSmallest(grouped, "grp", "v", ks, 1000000L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(narrow == wide)
  }

  test("groupedKthSmallest: k outside the group yields no row; absent groups drop") {
    val ks = Seq(("g0", 100000L), ("g1", 5L)).toDF("grp", "k")
    val got = Ranks.groupedKthSmallest(grouped, "grp", "v", ks, 8L)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.map(_._1).toSeq == Seq("g1"), s"got: ${got.toSeq}")
  }

  test("groupedKthSmallestMulti ≡ one groupedKthSmallest per rank; shared buckets, widths, out-of-range") {
    val n = grouped.groupBy($"grp").agg(count(lit(1)).as("n"))
    // five ranks per group, including adjacent ones that land in the
    // SAME histogram bucket (the shared-work case) and duplicates.
    val ks = n.select($"grp", explode(array(
        expr("(n + 9) div 10"), expr("(n + 3) div 4"),
        expr("(n + 1) div 2"), expr("(n + 1) div 2 + 1"),
        expr("(9 * n + 9) div 10"))).as("k"))
    for (width <- Seq(1L, 8L, 1000000L)) {
      val got = Ranks.groupedKthSmallestMulti(grouped, "grp", "v", ks, width)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      val want = ks.collect().map(r => (r.getString(0), r.getLong(1)))
        .distinct.map { case (g, k) =>
          val kth = Ranks.groupedKthSmallest(grouped.filter($"grp" === g),
              "grp", "v", Seq((g, k)).toDF("grp", "k"), width)
            .collect()
          (g, k) -> kth.head.getLong(1)
        }.toMap
      assert(got == want, s"width $width: multi disagrees with " +
        s"per-rank selection\n got: $got\nwant: $want")
    }
    // out-of-range ranks yield no row, in-range siblings survive
    val mixed = Seq(("g0", 100000L), ("g0", 5L)).toDF("grp", "k")
    val got = Ranks.groupedKthSmallestMulti(grouped, "grp", "v", mixed, 8L)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("g0", 5L)), s"got: ${got.toSeq}")
  }

  test("groupedWeightedMedian equals the brute weighted selection, ties and widths included") {
    // Heavy value ties + varied positive weights.
    val wdf = (0 until 600)
      .map(i => (s"g${i % 3}", ((i * 613) % 600 % 31).toLong, (i % 7 + 1).toLong))
      .toDF("grp", "v", "w")
    val rows = wdf.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def brute(g: String): (Long, Long) = {
      val vs = rows.filter(_._1 == g).sortBy(_._2)
      val total = vs.map(_._3).sum
      val half = (total + 1) / 2
      var acc = 0L
      val med = vs.find { case (_, _, w) => acc += w; acc >= half }.get._2
      (med, total)
    }
    for (width <- Seq(1L, 4L, 1000000L)) {
      val got = Ranks.groupedWeightedMedian(wdf, "grp", "v", "w", width)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(got == Seq("g0", "g1", "g2").map(g => g -> brute(g)).toMap,
        s"weighted median disagrees with the brute fold at width $width")
    }
  }

  test("groupedWeightedMedian: unit weights reduce to the low median") {
    val unit = grouped.withColumn("w", lit(1L))
    val ks = grouped.groupBy($"grp").agg(count(lit(1)).as("n"))
      .select($"grp", expr("(n + 1) div 2").as("k"))
    val want = Ranks.groupedKthSmallest(grouped, "grp", "v", ks, 8L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val got = Ranks.groupedWeightedMedian(unit, "grp", "v", "w", 8L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("groupedKthSmallest plan: every window is group-partitioned; the tiny frames broadcast") {
    val ks = grouped.groupBy($"grp").agg(count(lit(1)).as("n"))
      .select($"grp", expr("(n + 1) div 2").as("k"))
    val p = Ranks.groupedKthSmallest(grouped, "grp", "v", ks, 8L)
      .queryExecution.executedPlan.toString
    val windows = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("grp")),
      s"a selection window without the group partition key buffers " +
        s"data-scale rows in one task:\n${windows.mkString("\n")}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"the ks/target frames are group-sized — they must broadcast:\n${p.take(800)}")
  }
}
