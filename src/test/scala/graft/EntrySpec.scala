package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide session, lazy). */
object TestSession {
  lazy val spark: SparkSession = GraftSession.local(cores = 8, "graft-test")
  val sf = "/root/testdata/sf0.001"
}

class EntrySpec extends AnyFunSuite {
  import TestSession._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has a matching oracle key and runs non-empty") {
    val qs = SparkEntry.queries
    SparkEntry.oracleSql.keys.foreach(k => assert(qs.contains(k), s"oracle $k has no query"))
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() > 0, s"$name returned no rows at sf0.001")
    }
  }

  test("flagship aggregates match hand-computed invariants") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf)
    val rows = df.collect()
    assert(rows.length == 6) // 3 returnflags x 2 linestatus
    assert(rows.map(_.getLong(rows.head.fieldIndex("count_order"))).sum <= 6000)
  }
}
