package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSession}
import graft.functions.vectors

/** The IVF index must actually prune partitions (visible in the physical
  * plan), and its in-cell results must be exact.
  */
class IvfIndexSpec extends AnyFunSuite {
  import TestSession.{sf, spark}

  private lazy val path = {
    val p = Files.createTempDirectory("graft-ivf").toString
    val e = Tables.embeddings(spark, sf)
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("seed_id"), col("embedding").as("seed_vec"))
    IvfIndex.build(e, "vec_id", "embedding", seeds, "seed_id", "seed_vec", p)
    p
  }

  private lazy val query: Array[Float] =
    Tables.embeddings(spark, sf).filter(col("vec_id") === 42)
      .head().getSeq[Float](1).toArray

  test("search plan prunes to the probed cell's partition") {
    val df = IvfIndex.search(spark, path, "vec_id", "embedding", query, k = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(400))
    assert("cell#\\d+L? IN|cell#\\d+L? =".r.findFirstIn(plan).isDefined,
      "expected a cell partition filter in:\n" + plan.take(800))
    assert(df.count() == 5)
  }

  test("in-cell results are exact (match brute force over that cell)") {
    val rows = IvfIndex.search(spark, path, "vec_id", "embedding", query, k = 5)
      .collect()
    val probedCell = rows.head.getAs[Number]("cell").longValue
    val got = rows.map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val brute = spark.read.parquet(s"$path/vectors")
      .filter(col("cell") === probedCell)
      .withColumn("score", vectors.cosineSimilarity(col("embedding"), lit(query)))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(5).collect()
      .map(r => (r.getLong(r.fieldIndex("vec_id")),
        r.getDouble(r.fieldIndex("score")))).toSeq
    assert(got == brute)
  }

  test("nProbe widens the searched cells monotonically") {
    def ids(nProbe: Int) =
      IvfIndex.search(spark, path, "vec_id", "embedding", query, 50, nProbe)
        .collect().map(_.getLong(1)).toSet
    val one = ids(1)
    val two = ids(2)
    assert(one.subsetOf(two) || two.size >= one.size)
  }
}
