package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

class SkewJoinSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  // 2000 probe rows, 90% on key 1 (the straggler key), plus keys with no
  // build match (7) to exercise outer semantics.
  private lazy val probe = (0 until 2000).map { i =>
    val k = if (i % 10 != 0) 1L else (i / 10 % 8).toLong
    (k, i.toLong)
  }.toDF("k", "payload")

  private lazy val build =
    Seq((0L, "zero"), (1L, "one"), (2L, "two"), (3L, "three"), (5L, "five"))
      .toDF("k", "name")

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      Option(r.getString(2)))).sortBy(x => (x._1, x._2)).toSeq

  test("salted inner join equals the plain join") {
    val plain = probe.join(build, "k")
    val salted = SkewJoin.saltedJoin(probe, build, "k", buckets = 8)
    assert(salted.columns.toSeq == Seq("k", "payload", "name"))
    assert(sortedRows(salted) == sortedRows(plain))
  }

  test("salted left_outer join equals the plain join (unmatched keys kept)") {
    val plain = probe.join(build, Seq("k"), "left_outer")
    val salted = SkewJoin.saltedJoin(probe, build, "k", buckets = 8,
      joinType = "left_outer")
    assert(sortedRows(salted) == sortedRows(plain))
    // keys 4/6/7 have no build row and must survive with null name
    assert(salted.filter(col("name").isNull).select("k").distinct()
      .as[Long].collect().sorted.toSeq == Seq(4L, 6L, 7L))
  }

  test("the exchange actually partitions on (key, salt)") {
    val p = SkewJoin.saltedJoin(probe, build, "k", buckets = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("_sj_salt"),
      s"salt must be part of the join keys/partitioning:\n${p.take(600)}")
  }

  test("deterministic saltExpr spreads the hot key across buckets") {
    val salted = SkewJoin.saltedJoin(probe, build, "k", buckets = 8,
      saltExpr = Some(pmod(hash(col("payload")), lit(8))))
    assert(sortedRows(salted) == sortedRows(probe.join(build, "k")))
  }

  test("keySkew surfaces the hot key with its share") {
    val top = SkewJoin.keySkew(probe, "k", topN = 3).collect()
    assert(top.head.getLong(0) == 1L)
    val share = top.head.getAs[Double]("share")
    assert(share > 0.85 && share < 0.95, s"hot-key share was $share")
    // top-n is a per-partition heap, not a global sort
    val plan = SkewJoin.keySkew(probe, "k", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }
}
