package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Loader contracts — above all the `events.ts` encoding shim: the
  * driver's testdata generator has shipped event time both as
  * TIMESTAMP(NANOS) (readable only as a plain long) and as
  * TIMESTAMP(MICROS) (a normal TimestampNTZ/Timestamp column). The
  * engine's whole event surface keys integer arithmetic off `ts_ns`,
  * so both encodings must normalize to the SAME epoch-nanos axis —
  * the round-12 e-series outage was exactly this shim missing the
  * micros case.
  */
class TablesSpec extends AnyFunSuite {
  import TestSession.spark

  private val micros = Seq(0L, 1692000000000000L, 1692000000000001L)

  /** Writes an events.parquet carrying `ts` in the given schema under a
    * fresh dir and returns the dir. Rows share ids 1..n so the two
    * encodings are comparable row-by-row.
    */
  private def writeEvents(tsType: DataType, tsValue: Long => Any): String = {
    val dir = Files.createTempDirectory("graft-events").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType)))
    val rows = micros.zipWithIndex.map { case (us, i) =>
      Row(i.toLong, tsValue(us), 7L)
    }
    spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("ts as TIMESTAMP_NTZ micros normalizes to epoch-nanos longs") {
    val dir = writeEvents(TimestampNTZType,
      us => java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))
    val got = Tables.events(spark, dir)
    assert(got.schema("ts_ns").dataType == LongType)
    val ns = got.orderBy("event_id").select("ts_ns")
      .collect().map(_.getLong(0)).toSeq
    assert(ns == micros.map(_ * 1000L),
      s"micros must widen exactly x1000, got $ns")
  }

  test("ts as plain epoch-nanos long passes through unchanged") {
    val dir = writeEvents(LongType, us => us * 1000L)
    val got = Tables.events(spark, dir)
    assert(got.schema("ts_ns").dataType == LongType)
    val ns = got.orderBy("event_id").select("ts_ns")
      .collect().map(_.getLong(0)).toSeq
    assert(ns == micros.map(_ * 1000L))
  }

  test("both encodings agree on the canonical micros axis") {
    val ntz = writeEvents(TimestampNTZType,
      us => java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))
    val lng = writeEvents(LongType, us => us * 1000L)
    val a = Tables.events(spark, ntz)
      .select(expr("ts_ns div 1000").as("us")).collect().map(_.getLong(0)).toSet
    val b = Tables.events(spark, lng)
      .select(expr("ts_ns div 1000").as("us")).collect().map(_.getLong(0)).toSet
    assert(a == b && a == micros.toSet)
  }
}
