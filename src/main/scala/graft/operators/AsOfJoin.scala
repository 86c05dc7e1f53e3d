package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * `right.time <= left.time` in the same key group (the standard
  * event-to-most-recent-context join of training pipelines — click to
  * last view, trade to last quote, log line to last deploy).
  *
  * Spark has no native as-of join; rather than a custom physical node,
  * this composes existing operators (preference (a) of the extension
  * ladder): tag both sides, union, and take a running `last(_,
  * ignoreNulls)` of the right payload over one (keys, time) window.
  * ONE shuffle on the keys — same cost as the sessionization window;
  * both sides stream through a single sort, so at 100 TB this is a
  * sort-merge pass, not an n×m range probe.
  *
  * Ties: right rows sort before left rows at equal time (<= semantics,
  * matching DuckDB's ASOF), with `tieBreak` ordering rows beyond that.
  */
object AsOfJoin {

  /** @param rightPayload right columns carried to the matched left row,
    *                     emitted as `prefix+name` (null when no match).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, rightPayload: Seq[String], prefix: String = "asof_",
      tieBreak: Seq[Column] = Nil): DataFrame = {
    require(keys.nonEmpty && rightPayload.nonEmpty)
    val side = "_asof_side"
    val payload = "_asof_payload"
    val l = left.withColumn(side, lit(1))
    val r = right.select(
      (keys :+ timeCol).map(col) ++
        rightPayload.map(c => col(c).as(prefix + c)): _*)
      .withColumn(side, lit(0))
    // The payload travels as ONE struct (null on left rows) so the window
    // fill picks a right row atomically: per-column last() would mix
    // columns from different right rows whenever a payload value is null,
    // and an all-null payload row would be indistinguishable from no match.
    val u = l.unionByName(r, allowMissingColumns = true)
      .withColumn(payload,
        when(col(side) === 0,
          struct(rightPayload.map(c => col(prefix + c).as(c)): _*)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol) +: col(side) +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = u
      .withColumn(payload, last(col(payload), ignoreNulls = true).over(w))
      .filter(col(side) === 1)
    rightPayload.foldLeft(filled) { (df, c) =>
      df.withColumn(prefix + c, col(payload).getField(c))
    }
      .drop(side, payload)
  }
}
