package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSession}

/** The bucketed-join contract: matching bucket layouts on both sides
  * remove BOTH exchanges from the join — asserted on the physical plan,
  * not just claimed. Auto-broadcast is disabled inside the test so the
  * planner cannot sidestep the shuffle question by broadcasting the
  * small sf0.001 tables.
  */
class BucketingSpec extends AnyFunSuite {
  import TestSession.{sf, spark}

  private def withConf(k: String, v: String)(f: => Unit): Unit = {
    val old = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try f finally old.fold(spark.conf.unset(k))(spark.conf.set(k, _))
  }

  test("orders ⋈ lineitem on bucketed tables plans with zero exchanges") {
    val base = Files.createTempDirectory("graft-buckets")
    Bucketing.writeBucketed(Tables.orders(spark, sf),
      "b_orders", "o_orderkey", buckets = 8, s"$base/orders")
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", buckets = 8, s"$base/lineitem")
    try {
      withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
        val joined = Bucketing.readBucketed(spark, "b_orders")
          .join(Bucketing.readBucketed(spark, "b_lineitem"), "o_orderkey")
          .select(col("o_orderkey"), col("o_totalprice"), col("l_quantity"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucketed join must not shuffle:\n${plan.take(800)}")
        // and it is still a correct join
        val n = joined.count()
        val m = Tables.orders(spark, sf).join(
          Tables.lineitem(spark, sf),
          col("o_orderkey") === col("l_orderkey")).count()
        assert(n == m)
      }

      // Control: the same join over plain parquet DOES shuffle — the
      // difference is the bucket layout, not the data size.
      withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
        val plain = Tables.orders(spark, sf).join(
          Tables.lineitem(spark, sf),
          col("o_orderkey") === col("l_orderkey"))
        assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
