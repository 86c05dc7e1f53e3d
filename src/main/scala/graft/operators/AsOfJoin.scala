package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * `right.time <= left.time` in the same key group (the standard
  * event-to-most-recent-context join of training pipelines — click to
  * last view, trade to last quote, log line to last deploy).
  * `direction = "forward"` flips the relationship: the EARLIEST right
  * row with `right.time >= left.time` — the time-to-next-event join
  * (view to first click after, campaign to first purchase after).
  *
  * Spark has no native as-of join; rather than a custom physical node,
  * this composes existing operators (preference (a) of the extension
  * ladder): tag both sides, union, and take a running `last(_,
  * ignoreNulls)` (forward: `first` over the mirrored frame) of the
  * right payload over one (keys, time) window.
  * ONE shuffle on the keys — same cost as the sessionization window;
  * both sides stream through a single sort, so at 100 TB this is a
  * sort-merge pass, not an n×m range probe.
  *
  * Ties: the qualifying right row must be frame-visible to the left row
  * at equal time, so right rows sort before left rows backward
  * (<= semantics) and after them forward (>= semantics) — both matching
  * DuckDB's ASOF — with `tieBreak` ordering rows beyond that.
  */
object AsOfJoin {

  /** @param rightPayload right columns carried to the matched left row,
    *                     emitted as `prefix+name` (null when no match).
    * @param tolerance    maximum allowed |left.time − right.time| in the
    *                     time column's own units; a match further away
    *                     nulls out exactly like no-match (the staleness
    *                     guard: a click should not attribute to a view
    *                     from last month). 0 = unbounded. Applied AFTER
    *                     the window fill, so it adds no exchange — the
    *                     nearest-in-direction row either qualifies or
    *                     nothing does (any other candidate is farther).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, rightPayload: Seq[String], prefix: String = "asof_",
      tieBreak: Seq[Column] = Nil, direction: String = "backward",
      tolerance: Long = 0L): DataFrame = {
    require(keys.nonEmpty && rightPayload.nonEmpty)
    require(Set("backward", "forward").contains(direction),
      s"as-of direction must be backward/forward, got $direction")
    require(tolerance >= 0L, s"tolerance must be >= 0, got $tolerance")
    val side = "_asof_side"
    val payload = "_asof_payload"
    // The matched row's time rides inside the payload struct under this
    // name (see below); a payload column with the same literal name would
    // duplicate the struct field and getField would read the wrong one.
    require(!rightPayload.contains("_asof_t"),
      "asofJoin reserves the payload field name _asof_t for the matched " +
        "row's own time — rename that right column before joining")
    // The union-based fill would SILENTLY overwrite a left column that
    // already carries an emitted name (e.g. the output of a previous
    // asofJoin with the same prefix) — unionByName merges it and the
    // final fill replaces it. Fail loudly instead (the ScalarQuant /
    // IntervalJoin collision rule).
    val clashes =
      (rightPayload.map(prefix + _) :+ side :+ payload)
        .filter(left.columns.contains)
    require(clashes.isEmpty,
      s"asofJoin emits ${clashes.mkString(", ")} but the left frame " +
        "already has a column of that name — rename or drop it first, " +
        "or use a different prefix")
    val l = left.withColumn(side, lit(1))
    val r = right.select(
      (keys :+ timeCol).map(col) ++
        rightPayload.map(c => col(c).as(prefix + c)): _*)
      .withColumn(side, lit(0))
    // The payload travels as ONE struct (null on left rows) so the window
    // fill picks a right row atomically: per-column last() would mix
    // columns from different right rows whenever a payload value is null,
    // and an all-null payload row would be indistinguishable from no match.
    // The right row's own time rides inside the payload struct so the
    // tolerance check reads the MATCHED row's time, not a column that
    // may be absent from the payload list.
    val u = l.unionByName(r, allowMissingColumns = true)
      .withColumn(payload,
        when(col(side) === 0,
          struct((rightPayload.map(c => col(prefix + c).as(c)) :+
            col(timeCol).as("_asof_t")): _*)))
    // Lexicographic order makes side the deciding key at equal time, so
    // tieBreak can never reorder left ahead of/behind right across the
    // frame boundary — it only breaks ties among right rows.
    val forward = direction == "forward"
    val sideOrder = if (forward) col(side).desc else col(side).asc
    val w0 = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol) +: sideOrder +: tieBreak: _*)
    val w =
      if (forward) w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fill =
      if (forward) first(col(payload), ignoreNulls = true)
      else last(col(payload), ignoreNulls = true)
    val filled = u
      .withColumn(payload, fill.over(w))
      .withColumn(payload,
        if (tolerance <= 0L) col(payload)
        else when(abs(col(timeCol) - col(payload).getField("_asof_t"))
          <= tolerance, col(payload)))
      .filter(col(side) === 1)
    rightPayload.foldLeft(filled) { (df, c) =>
      df.withColumn(prefix + c, col(payload).getField(c))
    }
      .drop(side, payload)
  }
}
