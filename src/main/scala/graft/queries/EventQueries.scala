package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Event-stream analytics over the `events` table (event_id, ts, user_id,
  * event_type, value, props-JSON) — the batch faces of the streaming
  * surface (graft.streaming runs the same aggregations incrementally).
  *
  * Scale shapes:
  *   - e01 tumbling-window rollup: one partial+final aggregate keyed by
  *     (hour, type); at 100 TB the scan prunes on a date partition column.
  *   - e02 sessionization: ONE shuffle on user_id; the lag + running-sum
  *     windows and the session aggregate all share that partitioning, so
  *     Catalyst plans a single exchange.
  *   - e03 per-type stats incl. JSON extraction pushed into the scan
  *     projection.
  *
  * Event time: the parquet stores nanos ([[graft.Tables.events]] reads
  * them losslessly as long), but the cross-engine canonical axis is epoch
  * MICROseconds because DuckDB's TIMESTAMP floors to micros on read. All
  * bucket/gap math is exact integer `%` / `div` — an epoch-ns value
  * (>2^53) doesn't even fit a double. Value sums go through
  * DECIMAL(12,2) (the module-wide double-sum rule).
  */
object EventQueries {

  private val SessionGapUs = 30L * 60 * 1000 * 1000 // 30 min
  private val HourUs = 3600L * 1000 * 1000
  private val AttributionUs = 60L * 60 * 1000 * 1000 // e06 look-ahead
  private val DayUs = 24L * 3600 * 1000 * 1000 // e08 cohort bucket
  private val HourlyKmvK = 16 // e11 sketch size (bites: busiest hours reach 28 users)
  private val GapQuantK = 128 // e18 rank-sketch size (≪ per-type gap counts at sf0.01)
  private val DriftCutUs = 1705363200000000L // e28 baseline cut: 2024-01-16 UTC
  private val OverlapKmvK = 32 // e41 sketch size (bites: audiences 64-75 at sf0.01)
  private val GapBucket = 1L << 24 // e42 selection bucket (~16.8 s of gap per cell)

  private def dsum(c: Column) = sum(c.cast(DecimalType(12, 2))).cast("double")

  /** Canonical event time: epoch MICROseconds. The parquet carries true
    * nanos, but DuckDB's TIMESTAMP floors them to micros on read, so the
    * cross-engine time axis is floor(ns/1000) — `div` floors for the
    * positive epoch values here, matching DuckDB's truncation exactly.
    */
  private def tsUs: Column = expr("ts_ns div 1000")

  /** Start of the UTC hour containing the event, as a timestamp. */
  private def hourStart(us: Column): Column =
    timestamp_micros(us - us % HourUs)

  /** Start of the UTC day containing the event, as a timestamp. */
  private def dayStart(us: Column): Column =
    timestamp_micros(us - us % DayUs)

  /** Level 1 of e37's nested sweep-line: fold each (day, HOUR)'s
    * sorted ±1 deltas into the associative (total, maxPrefix) summary.
    * The collected array is bounded by ONE HOUR's deltas — the hot-day
    * defense (a single-level sweep collects whole days; SweepSpec pins
    * the bound on a hot-day fixture). Input: (day_idx, t, delta);
    * sort key (t, −delta) puts starts before ends on ties.
    */
  private[graft] def sweepHourSummaries(deltas: DataFrame): DataFrame = {
    val hourSum = deltas
      .groupBy(col("day_idx"), expr(s"t div $HourUs").as("hour_idx"))
      .agg(
        array_sort(collect_list(struct(col("t"),
          (-col("delta")).as("ord"), col("delta")))).as("ds"),
        sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_start"))
    val zero = struct(lit(0L).as("run"), lit(0L).as("maxp"))
    val folded = aggregate(col("ds"), zero, (st, x) => {
      val run = st.getField("run") + x.getField("delta")
      struct(run.as("run"),
        greatest(st.getField("maxp"), run).as("maxp"))
    })
    hourSum.select(col("day_idx"), col("hour_idx"), col("n_start"),
      col("ds"),
      folded.getField("run").as("tot"), folded.getField("maxp").as("maxp"))
  }

  /** Level 2: fold each day's ≤ 24 hour summaries (sorted by hour) —
    * same algebra one level up: the day's peak seen from its start is
    * max over hours of (run-in to the hour + the hour's maxPrefix),
    * and totals chain by addition. Returns the days frame the single
    * carry window consumes: (day_idx, n_sessions_start, tot, maxp).
    * maxp stays floored at 0 (both levels' folds start at 0), so a
    * drain-only day still peaks at its carry-in.
    */
  private[graft] def sweepDaySummaries(deltas: DataFrame): DataFrame = {
    val hours = sweepHourSummaries(deltas)
    val daySum = hours.groupBy(col("day_idx"))
      .agg(
        array_sort(collect_list(struct(col("hour_idx"),
          col("tot"), col("maxp")))).as("hs"),
        sum(col("n_start")).as("n_sessions_start"))
    val zero = struct(lit(0L).as("run"), lit(0L).as("maxp"))
    val folded = aggregate(col("hs"), zero, (st, x) => {
      struct((st.getField("run") + x.getField("tot")).as("run"),
        greatest(st.getField("maxp"),
          st.getField("run") + x.getField("maxp")).as("maxp"))
    })
    daySum.select(col("day_idx"), col("n_sessions_start"),
      folded.getField("run").as("tot"), folded.getField("maxp").as("maxp"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 1-hour windows per event type.
    "e01_hourly_rollup" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(hourStart(tsUs).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .orderBy(col("hour"), col("event_type"))
    },

    // Windowed cardinality, exact AND sketched: distinct users per
    // hour with the KMV estimate next to the exact count. The sketch
    // column is the one that survives scale — O(k) state per window
    // through partial aggregation where exact distinct expands every
    // key through the exchange — and k=16 < the busiest hours' 28
    // users, so the ESTIMATOR path (not below-k exactness) is what
    // the oracle replays here. [[graft.streaming.EventStreams
    // .hourlyDistinctUsers]] is this aggregate's streaming face;
    // StreamingSpec pins that closed windows agree exactly.
    "e11_hourly_users" -> { (s, d) =>
      val kmv = udaf(new graft.operators.Sketches.KmvDistinct(HourlyKmvK),
        org.apache.spark.sql.Encoders.scalaLong)
      Tables.events(s, d)
        .select(hourStart(tsUs).as("hour"), col("user_id"))
        .groupBy(col("hour"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          kmv(graft.operators.Sketches.kmvInput(
            graft.text.TextFunctions.hash32(col("user_id").cast("string"))))
            .as("est_users"))
        .orderBy(col("hour"))
    },

    // e11's sketch composed with a ROLLUP lattice: distinct users at
    // hour, day, and global granularity from ONE scan — the OLAP-cube
    // maintenance shape. The point being pinned: KMV partial states
    // ride Spark's Expand like any algebraic aggregate, so one pass
    // serves every granularity with O(k) state per group where three
    // separate exact-distinct passes would each ship their key space.
    // The exact count stays as the per-row accuracy witness; k=16 is
    // below the daily and global cardinalities, so the estimator path
    // is exercised at the coarser levels, below-k exactness at quiet
    // hours.
    "e12_rollup_users" -> { (s, d) =>
      val kmv = udaf(new graft.operators.Sketches.KmvDistinct(HourlyKmvK),
        org.apache.spark.sql.Encoders.scalaLong)
      // The user hash is projected BEFORE the rollup: the lattice
      // Expand replays each input row once per grouping set (×3 here,
      // ×6 after the distinct-aggregate rewrite), and an md5 over a
      // casted string is the one expression in this plan worth paying
      // exactly once per row instead of once per expanded copy.
      Tables.events(s, d)
        .select(dayStart(tsUs).as("day"), hourStart(tsUs).as("hour"),
          col("user_id"),
          graft.text.TextFunctions.hash32(col("user_id").cast("string"))
            .as("uh"))
        .rollup(col("day"), col("hour"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          kmv(graft.operators.Sketches.kmvInput(col("uh")))
            .as("est_users"))
        .select(coalesce(col("day").cast("string"), lit("ALL")).as("day"),
          coalesce(col("hour").cast("string"), lit("ALL")).as("hour"),
          col("n_events"), col("n_users"), col("est_users"))
        .orderBy(col("day"), col("hour"))
    },

    // RANGE-frame moving aggregates: trailing 1-hour event count and
    // value sum AT EVERY EVENT — rate limiting, burst detection,
    // rolling spend. The frame is bounded by the TIME AXIS
    // (rangeBetween on exact epoch micros), not a row count, so
    // events sharing a timestamp enter the frame together and the
    // result is deterministic under any within-tie order. One
    // user-keyed exchange carries the sort and every frame (e02's
    // single-shuffle claim, applied to sliding windows); the decimal
    // cast keeps the windowed sums exact on both engines.
    "e13_moving_window" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-HourUs, 0)
      Tables.events(s, d)
        .withColumn("ts_us", tsUs)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          count(lit(1)).over(w).as("n_trailing_1h"),
          // .over must bind the SUM itself; dsum's outer double-cast
          // would orphan the aggregate from the window spec.
          sum(col("value").cast(DecimalType(12, 2))).over(w)
            .cast("double").as("v_trailing_1h"))
        .orderBy(col("event_id"))
    },

    // Gap-based sessionization: a session breaks after >30 min idle.
    "e02_sessionization" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prevTs = lag(col("ts_us"), 1).over(w)
      Tables.events(s, d)
        .withColumn("ts_us", tsUs)
        .withColumn("is_new",
          when(prevTs.isNull || col("ts_us") - prevTs > SessionGapUs, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("is_new")).over(wRun))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_us")).as("start_us"),
          max(col("ts_us")).as("end_us"),
          dsum(col("value")).as("total_value"))
        .orderBy(col("user_id"), col("session_id"))
    },

    // As-of join: each click matched to the user's most recent view at
    // or before it (left join: clicks with no prior view keep nulls).
    "e04_asof_click_view" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), tsUs.as("ts_us"),
          col("event_type"))
      val clicks = ev.filter(col("event_type") === "click")
        .drop("event_type")
      val views = ev.filter(col("event_type") === "view")
        .drop("event_type")
      graft.operators.AsOfJoin.asofJoin(
        clicks, views, keys = Seq("user_id"), timeCol = "ts_us",
        rightPayload = Seq("event_id", "ts_us"), prefix = "view_",
        tieBreak = Seq(col("view_event_id")))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("view_event_id"), col("view_ts_us"),
          (col("ts_us") - col("view_ts_us")).as("gap_us"))
        .orderBy(col("event_id"))
    },

    // e04 with a TOLERANCE: a click only attributes to a view at most
    // 30 minutes older — the staleness guard every attribution model
    // carries (an hours-old view is not the cause of this click).
    // Matches beyond the bound null out exactly like no-match; the
    // check runs AFTER the window fill (no extra exchange), which is
    // sufficient because the nearest-in-direction row either
    // qualifies or nothing does. The bound bites at sf0.01: most
    // nearest views sit hours back, so this row pins both the
    // kept-within-bound and nulled-beyond-bound paths.
    "e15_asof_tolerance" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), tsUs.as("ts_us"),
          col("event_type"))
      val clicks = ev.filter(col("event_type") === "click")
        .drop("event_type")
      val views = ev.filter(col("event_type") === "view")
        .drop("event_type")
      graft.operators.AsOfJoin.asofJoin(
        clicks, views, keys = Seq("user_id"), timeCol = "ts_us",
        rightPayload = Seq("event_id", "ts_us"), prefix = "view_",
        tieBreak = Seq(col("view_event_id")), tolerance = SessionGapUs)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("view_event_id"), col("view_ts_us"),
          (col("ts_us") - col("view_ts_us")).as("gap_us"))
        .orderBy(col("event_id"))
    },

    // The FORWARD as-of join (e04's mirror): each view matched to the
    // user's first click at or after it — the time-to-next-event
    // primitive (time-to-conversion, campaign-to-first-purchase).
    // Views that never convert keep nulls; gap_us is the conversion
    // latency the outer streaming interval join surfaces continuously.
    "e10_asof_view_click" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), tsUs.as("ts_us"),
          col("event_type"))
      val views = ev.filter(col("event_type") === "view")
        .drop("event_type")
      val clicks = ev.filter(col("event_type") === "click")
        .drop("event_type")
      graft.operators.AsOfJoin.asofJoin(
        views, clicks, keys = Seq("user_id"), timeCol = "ts_us",
        rightPayload = Seq("event_id", "ts_us"), prefix = "click_",
        tieBreak = Seq(col("click_event_id")), direction = "forward")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("click_event_id"), col("click_ts_us"),
          (col("click_ts_us") - col("ts_us")).as("gap_us"))
        .orderBy(col("event_id"))
    },

    // ROLLING ACTIVE USERS (DAU/WAU/MAU) FROM STORED SKETCH STATES —
    // the dashboard triple every product ships, computed the way 100 TB
    // pipelines actually compute it: each day pays its aggregation
    // ONCE, emitting an exact DAU and one KMV state row (q27's
    // storable-state contract); every trailing window then MERGES the
    // member days' k-hash states — mergeable, so WAU/MAU never rescan
    // events, and the window join runs over the catalog-sized
    // (day, state) table (days × window rows, a 1-row-per-day range
    // self-join — never the event log). K = 64 < every DAU here
    // (125–141), so the (k−1)·2³²/h(k) estimator path bites on all
    // three measures; the oracle re-derives each day's trailing-window
    // estimate from raw hashes, proving merge-of-states ≡
    // state-of-union day for day.
    "e29_rolling_actives" -> { (s, d) =>
      val K = 64
      val st = udaf(new graft.operators.Sketches.KmvState(K),
        org.apache.spark.sql.Encoders.scalaLong)
      val mg = udaf(new graft.operators.Sketches.KmvMerge(K),
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[Seq[java.lang.Long]]())
      val daily = Tables.events(s, d)
        .select(tsUs.as("ts_us"), col("user_id"))
        .withColumn("day_idx", expr(s"ts_us div $DayUs"))
      // Materialized (the LineageCheckpoint pattern): the (day, dau,
      // state) frame is read FIVE times below (output + both sides of
      // each rolling self-join) — without the checkpoint each branch
      // would re-aggregate the event log, and "each day pays its
      // aggregation once" would be a comment, not a plan property
      // (PlanSpec pins no parquet scan survives).
      val dau = new graft.operators.LineageCheckpoint(s, None)(
        daily.groupBy(col("day_idx"))
          .agg(countDistinct(col("user_id")).as("dau"),
            st(graft.operators.Sketches.kmvInput(
              graft.text.TextFunctions.hash32(col("user_id").cast("string"))))
              .as("state")))
      def rolling(w: Int, name: String) =
        dau.select(col("day_idx").as("a_day"))
          .join(dau.select(col("day_idx").as("b_day"), col("state")),
            col("b_day") > col("a_day") - w &&
              col("b_day") <= col("a_day"))
          .groupBy(col("a_day").as("day_idx"))
          .agg(mg(col("state")).as(name))
      dau.select(col("day_idx"), col("dau"))
        .join(rolling(7, "wau_est"), "day_idx")
        .join(rolling(30, "mau_est"), "day_idx")
        .orderBy(col("day_idx"))
    },

    // ORDER-2 SESSION CONTEXT MODEL — the training table a
    // next-event-prediction model consumes, and e22's sequence-model
    // big sibling: transitions count WITHIN e02's 30-minute sessions
    // (a transition across a session boundary is noise, not behavior
    // — both lags reset per session), with a two-event context
    // (prev2, prev1 → next) instead of order-1's single predecessor;
    // '_start' padding makes session openings first-class contexts.
    // One user-keyed window pass (per-user partitions, bounded) feeds
    // a context-keyed count to an alphabet³-sized table; `p` is the
    // per-context conditional — the catalog-sized normalize e22
    // pinned. At 100 TB the only corpus cost is the session window
    // e02 already pays.
    "e31_markov_contexts" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prevTs = lag(col("ts_us"), 1).over(w)
      val ws = Window.partitionBy(col("user_id"), col("session_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val wCtx = Window.partitionBy(col("prev2"), col("prev1"))
      Tables.events(s, d)
        .withColumn("ts_us", tsUs)
        .withColumn("is_new",
          when(prevTs.isNull || col("ts_us") - prevTs > SessionGapUs, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("is_new")).over(wRun))
        .withColumn("prev1",
          coalesce(lag(col("event_type"), 1).over(ws), lit("_start")))
        .withColumn("prev2",
          coalesce(lag(col("event_type"), 2).over(ws), lit("_start")))
        .groupBy(col("prev2"), col("prev1"),
          col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p", col("n").cast("double")
          / sum(col("n")).over(wCtx).cast("double"))
        .orderBy(col("prev2"), col("prev1"), col("next_type"))
    },

    // EXACT ROLLING ACTIVES VIA BITMAP STATES — e29's question with
    // the EXACT answer: when the id domain is dense and bounded
    // (user_id is a dictionary surrogate key, 0..N), per-day
    // [[graft.operators.Sketches.BitmapState]] rows (capacity/64
    // longs each, independent of traffic) replace the KMV estimate,
    // and trailing windows OR-merge the member days' bitmaps —
    // merge-of-states ≡ state-of-union EXACTLY, no estimator error
    // at all (the groupBitmap pattern). Same scale shape as e29:
    // each day pays its aggregation once into the checkpointed
    // (day, bitmap) frame; windows self-join the days table, never
    // the event log. Capacity derives from a 1-row max(user_id)
    // lookup (the codebook pattern), so the same query serves every
    // SF; the oracle is plain COUNT(DISTINCT) per window — bit
    // equality IS the exactness proof. When the id domain is NOT
    // dense (UUID/hash surrogates — max+1 capacity would allocate
    // dead bits for the whole key space), the named remediation is
    // e45's paved path: dictionary-encode first ([[graft.operators
    // .Sketches.dictEncode]]'s exact two-pass codebook), then run
    // this query verbatim over the dense codes — bitmaps sized by the
    // live audience, not the key space.
    "e33_bitmap_actives" -> { (s, d) =>
      val cap = (Tables.events(s, d).agg(max(col("user_id"))).head()
        .getLong(0) + 1).toInt
      val st = udaf(new graft.operators.Sketches.BitmapState(cap),
        org.apache.spark.sql.Encoders.scalaLong)
      val mg = udaf(new graft.operators.Sketches.BitmapMergeCount(cap),
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[Seq[java.lang.Long]]())
      val daily = new graft.operators.LineageCheckpoint(s, None)(
        Tables.events(s, d)
          .select(expr(s"ts_ns div 1000 div $DayUs").as("day_idx"),
            col("user_id"))
          .groupBy(col("day_idx"))
          .agg(st(col("user_id")).as("bm")))
      def rolling(w: Int, name: String) =
        daily.select(col("day_idx").as("a_day"))
          .join(daily.select(col("day_idx").as("b_day"), col("bm")),
            col("b_day") > col("a_day") - w && col("b_day") <= col("a_day"))
          .groupBy(col("a_day").as("day_idx"))
          .agg(mg(col("bm")).as(name))
      daily
        .select(col("day_idx"),
          expr("aggregate(transform(bm, w -> bit_count(w)), 0, " +
            "(a, x) -> a + x)").cast("long").as("dau_exact"))
        .join(rolling(7, "wau_exact"), "day_idx")
        .join(rolling(30, "mau_exact"), "day_idx")
        .orderBy(col("day_idx"))
    },

    // CUSUM CHANGEPOINT ALARMS — e23's complement on the same hourly
    // reduce: z-scores catch single-hour SPIKES, CUSUM accumulates
    // small SUSTAINED shifts (Page 1954 — the level change a
    // trailing-window z never reaches 2σ on). The recursion
    // S = max(0, S + x − μ − slack), alarm-and-reset past h, is
    // inherently sequential — the engine's shape for that is: the
    // corpus pays ONE (type, hour) aggregate, each type's hour series
    // collects to a catalog-bounded sorted array (720 hours/month —
    // driver-free, but small enough to fold row-locally), and the
    // CUSUM runs as an `aggregate` array fold per type row. All
    // arithmetic is exact integer micro-units (μ by integer DIV,
    // slack = μ/10, h = 2μ), so alarms replay bit-for-bit in the
    // oracle's recursive CTE — including the post-alarm reset, which
    // fires 11–14 times per type at sf0.01 (the synthetic load
    // genuinely drifts), each alarm a full accumulate-reset cycle.
    "e32_cusum_alarms" -> { (s, d) =>
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr(s"ts_ns div 1000 div ${3600L * 1000 * 1000}").as("hour_idx"))
        .agg(count(lit(1)).as("n"))
      val typed = hourly.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"), sum(col("n")).as("tot"),
          array_sort(collect_list(struct(col("hour_idx"), col("n"))))
            .as("hs"))
        .withColumn("mu_micro", expr("(tot * 1000000) DIV n_hours"))
        .withColumn("k_micro", expr("mu_micro DIV 10"))
        .withColumn("h_micro", expr("mu_micro * 2"))
      val zero = struct(lit(0L).as("s"), lit(0L).as("n_alarms"),
        lit(null).cast("long").as("first_alarm"), lit(0L).as("max_s"))
      val folded = aggregate(col("hs"), zero, (st, x) => {
        val sNew = greatest(lit(0L),
          st.getField("s") + x.getField("n") * lit(1000000L)
            - col("mu_micro") - col("k_micro"))
        val alarm = sNew > col("h_micro")
        struct(
          when(alarm, lit(0L)).otherwise(sNew).as("s"),
          (st.getField("n_alarms") + when(alarm, 1L).otherwise(0L))
            .as("n_alarms"),
          when(st.getField("first_alarm").isNull && alarm,
            x.getField("hour_idx"))
            .otherwise(st.getField("first_alarm")).as("first_alarm"),
          greatest(st.getField("max_s"), sNew).as("max_s"))
      })
      typed.select(col("event_type"), col("n_hours"), col("mu_micro"),
        folded.getField("n_alarms").as("n_alarms"),
        folded.getField("first_alarm").as("first_alarm_hour"),
        folded.getField("max_s").as("max_s_micro"))
        .orderBy(col("event_type"))
    },

    // AUDIENCE OVERLAP VIA BITMAP SET ALGEBRA — e33's machinery
    // answering the segmentation question ("how many users are
    // high-value clickers AND high-value purchasers?" — value ≥ 150
    // scopes each type's audience to its engaged tail, or every cell
    // would saturate at 1.0 on this always-active fixture) the way
    // bitmap-native engines answer it: one
    // pass builds a per-type user bitmap (types × capacity/64 longs —
    // codebook-sized, collected driver-side like k-means centroids),
    // and every pairwise intersection/union is wordwise AND/OR +
    // popcount on the driver — the event log is NEVER rescanned per
    // pair, where the COUNT-DISTINCT formulation pays a self-join per
    // cell. Exact by construction; the oracle's per-pair distinct
    // counts are the proof. Jaccard in exact integer micro-units.
    // Zero-overlap pairs are DROPPED, matching the oracle's inner
    // join on shared user_id by construction (not by fixture): a
    // fixture where two types share no qualifying user must omit the
    // pair on both arms, and either = 0 must never reach the divide.
    // Sparse/surrogate id domains take e45's paved path first
    // (dictEncode → dense codes), then this query verbatim — the
    // named remediation for the dense-domain contract assumed here.
    "e35_audience_overlap" -> { (s, d) =>
      val cap = (Tables.events(s, d).agg(max(col("user_id"))).head()
        .getLong(0) + 1).toInt
      val st = udaf(new graft.operators.Sketches.BitmapState(cap),
        org.apache.spark.sql.Encoders.scalaLong)
      val states = Tables.events(s, d)
        .filter(col("value") >= 150)
        .groupBy(col("event_type")).agg(st(col("user_id")).as("bm"))
        .collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toArray)
        .sortBy(_._1)
      def pop(a: Array[Long]) = a.map(java.lang.Long.bitCount(_).toLong).sum
      val rows = (for {
        i <- states.indices
        j <- (i + 1) until states.length
      } yield {
        val (ta, ba) = states(i)
        val (tb, bb) = states(j)
        val both = pop(ba.zip(bb).map { case (x, y) => x & y })
        val either = pop(ba.zip(bb).map { case (x, y) => x | y })
        (ta, tb, pop(ba), pop(bb), both, either)
      }).filter(_._5 > 0).map { case (ta, tb, na, nb, both, either) =>
        (ta, tb, na, nb, both, both * 1000000L / either)
      }
      import s.implicits._
      rows.toSeq.toDF("type_a", "type_b", "n_a", "n_b", "n_both",
        "jaccard_micro")
        .orderBy(col("type_a"), col("type_b"))
    },

    // MULTI-TOUCH REVENUE ATTRIBUTION — linear and last-touch credit
    // side by side, the marketing-analytics complement of e16's
    // conversion funnel (the funnel counts WHO converts; attribution
    // decides which touch type gets PAID for it). Each purchase finds
    // the user's view/click touches in the PRECEDING 24 h via
    // [[graft.operators.IntervalJoin.intervalJoin]] (touch → purchase
    // look-ahead: time-bucketed by the window width, each row probes
    // two buckets — never a raw range join); linear credit splits the
    // purchase's exact cents as cents·1e6 div n_touches per touch,
    // last-touch gives full cents to max (t, event_id) — unique ids
    // make the order total. Per-purchase arithmetic runs in a window
    // PARTITIONED BY purchase id (touch-bounded groups, the doc-keyed
    // window rule), purchases reached by no touch land in the
    // '(direct)' bucket via an anti-join, and the pair frame is
    // checkpointed for its two consumers (the d86 rule). Everything
    // is exact integer micro-cents.
    "e47_attribution" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d).select(col("user_id"), col("event_id"),
        tsUs.as("t"), col("event_type"),
        (col("value").cast(DecimalType(12, 2)) * 100).cast("long")
          .as("cents"))
      val touches = ev.filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("event_id"), col("t"),
          col("event_type"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("t"), col("event_id").as("p_id"),
          col("cents"))
      val pairs = new graft.operators.LineageCheckpoint(s, None)(
        graft.operators.IntervalJoin.intervalJoin(touches,
          purchases.select(col("user_id"), col("t"), col("p_id"),
            col("cents")),
          Seq("user_id"), "t", DayUs, Seq("p_id", "cents")))
      val wP = Window.partitionBy(col("iv_p_id"))
      val credited = pairs
        .withColumn("n_touches", count(lit(1)).over(wP))
        .withColumn("last_key",
          max(struct(col("t"), col("event_id"))).over(wP))
        .select(col("event_type"), col("iv_p_id"),
          expr("iv_cents * 1000000 div n_touches").as("credit_micro"),
          when(struct(col("t"), col("event_id")) === col("last_key"),
            col("iv_cents")).otherwise(lit(0L)).as("last_cents"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("iv_p_id")).as("n_purchases"),
          sum(col("credit_micro")).as("linear_micro_cents"),
          sum(col("last_cents")).as("last_touch_cents"))
      val direct = purchases
        .join(pairs.select(col("iv_p_id").as("p_id")).distinct(),
          Seq("p_id"), "left_anti")
        .agg(count(lit(1)).as("n_purchases"),
          coalesce(sum(col("cents")), lit(0L)).as("c"))
        .select(lit("(direct)").as("event_type"), lit(0L).as("n_pairs"),
          col("n_purchases"), (col("c") * 1000000).as("linear_micro_cents"),
          col("c").as("last_touch_cents"))
      credited.unionAll(direct).orderBy(col("event_type"))
    },

    // BENFORD FIRST-DIGIT FORENSIC PROFILE — the data-quality face for
    // FABRICATED numbers (Benford 1938; Hill, Statistical Science 1995;
    // the standard forensic-accounting screen): naturally-occurring
    // multi-scale amounts lead with digit d at share log10(1 + 1/d),
    // while synthetic, copied, or fat-fingered columns drift from it —
    // at 100 TB this is THE cheap screen run over every numeric column
    // of a new source before it enters the corpus mix. Exactness rules:
    // amounts go through exact cents (DECIMAL(12,2) · 100, e47's
    // idiom); the first significant digit is the first character of
    // the integer's decimal string (multiplying by 10² preserves it,
    // and string heads are engine-identical where log10-based digit
    // extraction is not — the d40 no-transcendental rule); the nine
    // Benford shares are floor-quantized micro literals computed ON
    // THE DRIVER and inlined into both engines (the BM25 literal
    // rule). Shape: ONE value-only scan into a 9-key aggregate
    // (map-side partial, nothing row-keyed crosses), checkpointed for
    // its two consumers (the d86 rule: the total and the join must not
    // re-run the scan), then broadcast-only joins onto the 9-row
    // frame. Output: per digit the count, observed micro-share,
    // Benford micro-share, and absolute deviation.
    "e48_benford_profile" -> { (s, d) =>
      import s.implicits._
      val cents = Tables.events(s, d)
        .select((col("value").cast(DecimalType(12, 2)) * 100).cast("long")
          .as("cents"))
        .filter(col("cents") > 0) // first char of a positive long is 1-9
      val counts = new graft.operators.LineageCheckpoint(s, None)(
        cents.select(substring(col("cents").cast("string"), 1, 1)
            .as("digit"))
          .groupBy(col("digit")).agg(count(lit(1)).as("n")))
      val total = counts.agg(sum(col("n")).as("total"))
      val benford = Seq("1" -> 301029L, "2" -> 176091L, "3" -> 124938L,
        "4" -> 96910L, "5" -> 79181L, "6" -> 66946L, "7" -> 57991L,
        "8" -> 51152L, "9" -> 45757L).toDF("digit", "benford_micro")
      counts.join(broadcast(benford), Seq("digit"))
        .crossJoin(broadcast(total))
        .select(col("digit"), col("n"),
          expr("n * 1000000 div total").as("share_micro"),
          col("benford_micro"),
          expr("abs(n * 1000000 div total - benford_micro)")
            .as("dev_micro"))
        .orderBy(col("digit"))
    },

    // TIME-DECAYED ENGAGEMENT SCORES — recency-weighted activity, the
    // ranking signal behind re-engagement targeting and churn-risk
    // ordering (e24's RFM flags recency as a bucket; this weights
    // EVERY event continuously by age). The decay is an EXACT INTEGER
    // staircase — weight_micro = 1e6 >> (age_weeks), zero past 20
    // weeks — i.e. exponential half-life-per-week decay discretized
    // to the week, chosen over exp(−λΔt) deliberately: the d40 rule
    // (no transcendental may enter a cross-engine sum) applied to
    // decay, since both engines replay `1000000 div (1 << weeks)`
    // bit-for-bit where their libm exp()s differ in the last ulp.
    // Shape: the anchor (corpus max timestamp) is a 1-row broadcast
    // (e24's recency-anchor pattern), the weight is a row-local
    // projection in the scan, and the per-user fold is ONE keyed
    // exchange of exact integer partials — mergeable, so a streaming
    // ledger maintains (user, week-bucket) partials and re-weights at
    // read. Output is the user-entity frame (150 rows at sf0.01;
    // entity-catalog-sized, ordering is presentation).
    "e46_decayed_engagement" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), tsUs.as("us"),
          (col("value").cast(DecimalType(12, 2)) * 100).cast("long")
            .as("cents"))
      val anchor = ev.agg(max(col("us")).as("anchor_us"))
      // age in CLOCK-HOUR index terms (hour_idx = us div HourUs), not
      // raw-microsecond differences: every event in a calendar hour
      // shares one age, which is what lets the STREAMING face fold
      // closed hourly (user, hour) increments to the identical result
      // (EventStreams.hourlyUserEngagement — an event-level age would
      // split a closed hour across two weights when the anchor is not
      // hour-aligned).
      ev.crossJoin(broadcast(anchor))
        .withColumn("weeks",
          expr(s"((anchor_us div $HourUs) - (us div $HourUs)) div 168"))
        .withColumn("w_micro", when(col("weeks") >= 20, lit(0L))
          .otherwise(expr("1000000L div shiftleft(1L, cast(weeks as int))")))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("w_micro")).as("hits_decayed_micro"),
          sum(col("w_micro") * col("cents"))
            .as("value_decayed_micro_cents"))
        .orderBy(col("value_decayed_micro_cents").desc, col("user_id"))
    },

    // NET REVENUE RETENTION COHORT MATRIX — e08's dollar-based
    // sibling and the metric a revenue team actually tracks: cohort =
    // first-ACTIVITY day (any event), revenue = purchase value only,
    // and each (cohort, day-offset) cell reports its purchase revenue
    // as a micro-ratio of the cohort's day-0 purchase revenue (NDR;
    // cells of a cohort with zero day-0 revenue report 0 rather than
    // divide — the branch bites at sf0.01). Values go through
    // DECIMAL(12,2)→cents BIGINTs at the row level so every sum and
    // ratio is exact integer arithmetic. Shape: one user-keyed min
    // (cohort assignment), one user-keyed join back, one
    // (cohort, offset)-keyed sum — then the day-0 base is recovered
    // with a window over `cohort_day` on the CELLS frame rather than a
    // self-join: cells is (cohorts × offsets)-sized, so each window
    // partition is calendar-bounded (≤ #days rows), while the join
    // form would replay the whole scan+join+agg subtree a second time
    // (the d86/e37 branch-replay lesson). events pays exactly the two
    // scans the cohort assignment inherently needs (e08's shape).
    "e38_revenue_retention" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          expr(s"(ts_ns div 1000) div $DayUs").as("day"),
          (col("value").cast("decimal(12,2)") * 100).cast("long")
            .as("cents"))
      val cohort = ev.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      val cells = ev.filter(col("event_type") === "purchase")
        .join(cohort, "user_id")
        .groupBy(col("cohort_day"),
          (col("day") - col("cohort_day")).as("day_offset"))
        .agg(sum(col("cents")).as("rev_cents"))
      val wb = Window.partitionBy(col("cohort_day"))
      cells
        .withColumn("base_cents",
          coalesce(
            max(when(col("day_offset") === 0, col("rev_cents"))).over(wb),
            lit(0L)))
        .withColumn("ndr_micro",
          when(col("base_cents") > 0,
            expr("(rev_cents * 1000000) DIV base_cents")).otherwise(0L))
        .orderBy(col("cohort_day"), col("day_offset"))
    },

    // PEAK CONCURRENT SESSIONS VIA DISTRIBUTED SWEEP-LINE — the
    // interval-stabbing max ("how many sessions were open at once")
    // computed the only way it parallelizes: a naive sweep needs ONE
    // globally ordered prefix sum (the banished single-partition
    // sort), but (total, maxPrefix) summaries of delta buckets are
    // ASSOCIATIVE — a bucket's peak seen from outside is
    // carry + maxPrefix, and carries chain by summing totals — so the
    // algebra NESTS: ±1 deltas (e02's sessions: +1 at start, −1 after
    // end, starts before ends on ties) fold per (day, HOUR) first, the
    // per-day fold then consumes ≤ 24 hour-summary structs, and ONE
    // window runs over the days-sized summary frame (e34's life-table
    // license). The two-level fold is the hot-day defense: no
    // collect_list array ever exceeds one HOUR's deltas (pinned in
    // SweepSpec), where the single-level version collected whole days.
    // peak = carry_in + maxPrefix with maxPrefix floored at 0, so a
    // drain-only day correctly peaks at its carry-in. Exact integers
    // end to end; output identical to the flat sweep by associativity.
    "e37_peak_concurrency" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prevTs = lag(col("ts_us"), 1).over(w)
      val sess = Tables.events(s, d)
        .withColumn("ts_us", tsUs)
        .withColumn("is_new",
          when(prevTs.isNull || col("ts_us") - prevTs > SessionGapUs, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("is_new")).over(wRun))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
      // ±1 deltas via a 1→2 row-local explode, NOT a union — a union
      // would consume `sess` twice and replay the whole session
      // window subtree per branch.
      val deltas = sess.select(explode(array(
          struct(col("start_us").as("t"), lit(1L).as("delta")),
          struct(col("end_us").as("t"), lit(-1L).as("delta")))).as("x"))
        .select(expr(s"x.t div $DayUs").as("day_idx"),
          col("x.t").as("t"), col("x.delta").as("delta"))
      val days = sweepDaySummaries(deltas)
      val wd = Window.orderBy(col("day_idx"))
        .rowsBetween(Window.unboundedPreceding, -1)
      days
        .withColumn("carry_in", coalesce(sum(col("tot")).over(wd), lit(0L)))
        .select(col("day_idx"), col("n_sessions_start"), col("carry_in"),
          (col("carry_in") + col("maxp")).as("peak_concurrency"))
        .orderBy(col("day_idx"))
    },

    // HOLT DOUBLE-SMOOTHING FORECAST — the trend-aware counterpart to
    // e32's CUSUM: per event type, Holt's linear method over the
    // hourly count series (level alpha = 1/5, trend beta = 1/10, both
    // exact integer DIVs in micro units; init l_1 = y_1, b_1 = 0),
    // one-step-ahead errors accumulated as exact |e| sums, and the
    // next-hour forecast = level + trend. An inherently SEQUENTIAL
    // recurrence, so it follows the e32/e34 scale contract: ONE
    // aggregation pass over the event log (the hourly rollup — the
    // only corpus-sized exchange), then the recurrence folds over the
    // catalog-sized (type, sorted hour array) rows via the aggregate()
    // HOF — hours-per-type elements each, never a Window over the
    // log, never a per-step rescan. Divisions are truncate-toward-zero
    // on BOTH engines (Spark div ≡ DuckDB integer // — pinned by the
    // negative trend values this fixture produces), via the
    // remainder-subtract form inside the lambda where the DIV operator
    // cannot reach.
    "e36_holt_forecast" -> { (s, d) =>
      def tdiv(a: Column, b: Long): Column =
        ((a - (a % lit(b))) / lit(b)).cast("long")
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr(s"ts_ns div 1000 div $HourUs").as("hour_idx"))
        .agg(count(lit(1)).as("n"))
      val typed = hourly.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"),
          array_sort(collect_list(struct(col("hour_idx"), col("n"))))
            .as("hs"))
      val zero = struct(lit(0L).as("i"), lit(0L).as("l"), lit(0L).as("b"),
        lit(0L).as("sae"), lit(0L).as("maxae"))
      val folded = aggregate(col("hs"), zero, (st, x) => {
        val y = x.getField("n") * lit(1000000L)
        val first = st.getField("i") === 0L
        val pred = st.getField("l") + st.getField("b")
        val ae = abs(y - pred)
        val lNew = tdiv(y + lit(4L) * pred, 5L)
        val bNew = tdiv(lNew - st.getField("l")
          + lit(9L) * st.getField("b"), 10L)
        struct(
          (st.getField("i") + 1L).as("i"),
          when(first, y).otherwise(lNew).as("l"),
          when(first, 0L).otherwise(bNew).as("b"),
          when(first, lit(0L))
            .otherwise(st.getField("sae") + ae).as("sae"),
          when(first, lit(0L))
            .otherwise(greatest(st.getField("maxae"), ae)).as("maxae"))
      })
      typed.select(col("event_type"), col("n_hours"),
          folded.getField("l").as("level_micro"),
          folded.getField("b").as("trend_micro"),
          (folded.getField("l") + folded.getField("b"))
            .as("forecast_micro"),
          folded.getField("sae").as("sae"),
          folded.getField("maxae").as("max_abs_err_micro"))
        .select(col("event_type"), col("n_hours"), col("level_micro"),
          col("trend_micro"), col("forecast_micro"),
          when(col("n_hours") > 1, expr("sae div (n_hours - 1)"))
            .otherwise(0L).as("mae_micro"),
          col("max_abs_err_micro"))
        .orderBy(col("event_type"))
    },

    // HOLT-WINTERS ADDITIVE SEASONAL FORECAST — e36's Holt recurrence
    // plus a 24-slot hour-of-day seasonal vector (alpha=1/5, beta=1/10,
    // gamma=1/10, all exact integer micro DIVs): l' = (y − s[h%24] +
    // 4(l+b)) div 5, b' = (l' − l + 9b) div 10, s'[h%24] = (y − l' +
    // 9s[h%24]) div 10; init l=y₁, b=0, s=0⃗ — fully deterministic, no
    // first-cycle averaging. Same scale contract as e36: ONE hourly
    // rollup over the log, then the fold runs over catalog-sized
    // (type, hours) rows; the seasonal vector is a 24-long array
    // updated via an indexed transform INSIDE the fold (row-local,
    // never a shuffle). The next-hour forecast adds the upcoming
    // hour-of-day's seasonal. Truncate-toward-zero div on both
    // engines, pinned by this fixture's negative trends.
    "e39_holt_winters" -> { (s, d) =>
      def tdiv(a: Column, b: Long): Column =
        ((a - (a % lit(b))) / lit(b)).cast("long")
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr(s"ts_ns div 1000 div $HourUs").as("hour_idx"))
        .agg(count(lit(1)).as("n"))
      val typed = hourly.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"),
          array_sort(collect_list(struct(col("hour_idx"), col("n"))))
            .as("hs"))
      val zero = struct(lit(0L).as("i"), lit(0L).as("l"), lit(0L).as("b"),
        array_repeat(lit(0L), 24).as("s"), lit(0L).as("lasth"),
        lit(0L).as("sae"))
      val folded = aggregate(col("hs"), zero, (st, x) => {
        val y = x.getField("n") * lit(1000000L)
        val idx = (x.getField("hour_idx") % 24L).cast("int")
        val first = st.getField("i") === 0L
        val so = element_at(st.getField("s"), idx + 1)
        val lb = st.getField("l") + st.getField("b")
        val ae = abs(y - lb - so)
        val lNew = tdiv(y - so + lit(4L) * lb, 5L)
        val bNew = tdiv(lNew - st.getField("l")
          + lit(9L) * st.getField("b"), 10L)
        val sNew = tdiv(y - lNew + lit(9L) * so, 10L)
        struct(
          (st.getField("i") + 1L).as("i"),
          when(first, y).otherwise(lNew).as("l"),
          when(first, lit(0L)).otherwise(bNew).as("b"),
          when(first, st.getField("s"))
            .otherwise(transform(st.getField("s"), (v, j) =>
              when(j === idx, sNew).otherwise(v))).as("s"),
          x.getField("hour_idx").as("lasth"),
          when(first, lit(0L))
            .otherwise(st.getField("sae") + ae).as("sae"))
      })
      typed.select(col("event_type"), col("n_hours"),
          folded.getField("l").as("level_micro"),
          folded.getField("b").as("trend_micro"),
          (folded.getField("l") + folded.getField("b")
            + element_at(folded.getField("s"),
              ((folded.getField("lasth") + 1L) % 24L).cast("int") + 1))
            .as("forecast_micro"),
          folded.getField("sae").as("sae"))
        .select(col("event_type"), col("n_hours"), col("level_micro"),
          col("trend_micro"), col("forecast_micro"),
          when(col("n_hours") > 1, expr("sae div (n_hours - 1)"))
            .otherwise(0L).as("mae_micro"))
        .orderBy(col("event_type"))
    },

    // SEASONAL RESIDUAL ANOMALIES — e39's Holt-Winters fold re-run
    // with every one-step-ahead prediction EMITTED: per (type, hour)
    // the observed count, the seasonal forecast made before seeing it,
    // the residual, and the 3×MAE anomaly flag — "which hours were
    // unusual GIVEN the hour-of-day cycle", where e23's z-scores would
    // flag every rush hour. The fold state carries three parallel
    // long arrays (hour, observed, predicted) — bounded by the
    // CALENDAR (hours observed), never by events — exploded after the
    // fold via arrays_zip; the recurrence is e39's exact integer
    // arithmetic, so every emitted prediction is the state e39 passed
    // through. First observation per type initializes and emits
    // nothing (exactly the step e39's MAE skips).
    "e44_seasonal_residuals" -> { (s, d) =>
      def tdiv(a: Column, b: Long): Column =
        ((a - (a % lit(b))) / lit(b)).cast("long")
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr(s"ts_ns div 1000 div $HourUs").as("hour_idx"))
        .agg(count(lit(1)).as("n"))
      val typed = hourly.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"),
          array_sort(collect_list(struct(col("hour_idx"), col("n"))))
            .as("hs"))
      val emptyL = array_repeat(lit(0L), 0)
      val zero = struct(lit(0L).as("i"), lit(0L).as("l"), lit(0L).as("b"),
        array_repeat(lit(0L), 24).as("s"),
        emptyL.as("hrs"), emptyL.as("ys"), emptyL.as("ps"),
        lit(0L).as("sae"))
      val folded = aggregate(col("hs"), zero, (st, x) => {
        val y = x.getField("n") * lit(1000000L)
        val idx = (x.getField("hour_idx") % 24L).cast("int")
        val first = st.getField("i") === 0L
        val so = element_at(st.getField("s"), idx + 1)
        val lb = st.getField("l") + st.getField("b")
        val pred = lb + so
        val ae = abs(y - pred)
        val lNew = tdiv(y - so + lit(4L) * lb, 5L)
        val bNew = tdiv(lNew - st.getField("l")
          + lit(9L) * st.getField("b"), 10L)
        val sNew = tdiv(y - lNew + lit(9L) * so, 10L)
        struct(
          (st.getField("i") + 1L).as("i"),
          when(first, y).otherwise(lNew).as("l"),
          when(first, lit(0L)).otherwise(bNew).as("b"),
          when(first, st.getField("s"))
            .otherwise(transform(st.getField("s"), (v, j) =>
              when(j === idx, sNew).otherwise(v))).as("s"),
          when(first, st.getField("hrs"))
            .otherwise(concat(st.getField("hrs"),
              array(x.getField("hour_idx")))).as("hrs"),
          when(first, st.getField("ys"))
            .otherwise(concat(st.getField("ys"), array(y))).as("ys"),
          when(first, st.getField("ps"))
            .otherwise(concat(st.getField("ps"), array(pred))).as("ps"),
          when(first, lit(0L))
            .otherwise(st.getField("sae") + ae).as("sae"))
      })
      typed
        .withColumn("f", folded)
        .withColumn("mae_micro",
          when(col("n_hours") > 1, expr("f.sae div (n_hours - 1)"))
            .otherwise(0L))
        .select(col("event_type"), col("mae_micro"),
          explode(arrays_zip(col("f.hrs"), col("f.ys"), col("f.ps")))
            .as("z"))
        .select(col("event_type"), col("z.hrs").as("hour_idx"),
          col("z.ys").as("y_micro"), col("z.ps").as("pred_micro"),
          (col("z.ys") - col("z.ps")).as("resid_micro"),
          (abs(col("z.ys") - col("z.ps")) > lit(3L) * col("mae_micro"))
            .as("is_anomaly"))
        .orderBy(col("event_type"), col("hour_idx"))
    },

    // AUDIENCE OVERLAP ON A SPARSE ID DOMAIN — e35's bitmap set
    // algebra with the dense-id contract EARNED instead of assumed:
    // the audience key here is a 32-bit hash surrogate (the UUID-ish
    // shape whose max+1 capacity the BitmapState guard rejects —
    // ~2^32 bits of dead state), so the paved path runs first:
    // [[graft.operators.Sketches.dictEncode]] builds the exact
    // distinct-key → [0, n) codebook through the two-pass global row
    // number (only partition counts touch the driver), the events
    // join it like any dimension, and the bitmaps are n BITS — sized
    // by the live audience, not the key space. Everything after the
    // encode is e35 verbatim (types × n/64-long states collected
    // driver-side, pairwise AND/OR + popcount, exact integer
    // micro-Jaccard, zero-overlap pairs dropped by construction).
    // 100-TB: the codebook is entity-sized and the encode is one
    // range-repartition of the DISTINCT keys; the event log still
    // pays exactly one bitmap aggregate. Collisions in the surrogate
    // hash define the audience key on BOTH arms (the oracle computes
    // the same md5 surrogate), so the comparison is exact, not
    // approximate.
    "e45_bitmap_dict" -> { (s, d) =>
      val ev = new graft.operators.LineageCheckpoint(s, None)(
        Tables.events(s, d)
          .filter(col("value") >= 150)
          .select(col("event_type"),
            graft.text.TextFunctions.hash32(col("user_id").cast("string"))
              .as("suid")))
      val dict = new graft.operators.LineageCheckpoint(s, None)(
        graft.operators.Sketches.dictEncode(ev, "suid"))
      val cap = dict.count().toInt
      val st = udaf(new graft.operators.Sketches.BitmapState(cap),
        org.apache.spark.sql.Encoders.scalaLong)
      val states = ev.join(dict, "suid")
        .groupBy(col("event_type")).agg(st(col("dense_id")).as("bm"))
        .collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toArray)
        .sortBy(_._1)
      def pop(a: Array[Long]) = a.map(java.lang.Long.bitCount(_).toLong).sum
      val rows = (for {
        i <- states.indices
        j <- (i + 1) until states.length
      } yield {
        val (ta, ba) = states(i)
        val (tb, bb) = states(j)
        val both = pop(ba.zip(bb).map { case (x, y) => x & y })
        val either = pop(ba.zip(bb).map { case (x, y) => x | y })
        (ta, tb, pop(ba), pop(bb), both, either)
      }).filter(_._5 > 0).map { case (ta, tb, na, nb, both, either) =>
        (ta, tb, na, nb, both, both * 1000000L / either)
      }
      import s.implicits._
      rows.toSeq.toDF("type_a", "type_b", "n_a", "n_b", "n_both",
        "jaccard_micro")
        .orderBy(col("type_a"), col("type_b"))
    },

    // A/B COMPARISON VIA WELCH'S T — the unequal-variance two-sample
    // test an experimentation platform runs per metric: does purchase
    // value differ from click value, with the evidence quantified
    // (t statistic + Welch–Satterthwaite degrees of freedom), not
    // eyeballed from two means. Shape: ONE scan with a pushed-down
    // two-type predicate folding into a single conditional aggregate
    // row (per-arm n / Σx / Σx² — the mergeable moment state, exact:
    // values floor-quantized to micros, sums in DECIMAL(38,0) ↔
    // HUGEINT); the t/df arithmetic is a 1-row projection of +‑*‑/‑√ —
    // every one correctly rounded IEEE, so the doubles are
    // bit-identical cross-engine with NO rounding step as long as both
    // arms state the identical expression tree (the formulas below
    // mirror the oracle token for token). Means are exact integer
    // micro-ratios. 100-TB: the scan is the whole cost; the moment
    // state partial-aggregates map-side.
    "e40_ab_welch" -> { (s, d) =>
      val m = Tables.events(s, d)
        .filter(col("event_type") === "purchase" ||
          col("event_type") === "click")
        .select(col("event_type"),
          floor(col("value") * 1000000).cast("long").as("m"))
      val isA = col("event_type") === "purchase"
      val row = m.agg(
        sum(when(isA, 1L)).as("na"),
        sum(when(isA, col("m")).cast("decimal(38,0)")).as("sa"),
        sum(when(isA, col("m") * col("m")).cast("decimal(38,0)")).as("qa"),
        sum(when(!isA, 1L)).as("nb"),
        sum(when(!isA, col("m")).cast("decimal(38,0)")).as("sb"),
        sum(when(!isA, col("m") * col("m")).cast("decimal(38,0)")).as("qb"))
      row
        .withColumn("va", expr("(CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE)" +
          " * CAST(sa AS DOUBLE) / na) / (na - 1)"))
        .withColumn("vb", expr("(CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE)" +
          " * CAST(sb AS DOUBLE) / nb) / (nb - 1)"))
        .select(col("na").cast("long").as("n_a"),
          col("nb").cast("long").as("n_b"),
          expr("CAST(sa DIV na AS BIGINT)").as("mean_a_micro"),
          expr("CAST(sb DIV nb AS BIGINT)").as("mean_b_micro"),
          expr("(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)" +
            " / SQRT(va / na + vb / nb)").as("t_stat"),
          expr("((va / na + vb / nb) * (va / na + vb / nb))" +
            " / ((va / na) * (va / na) / (na - 1)" +
            " + (vb / nb) * (vb / nb) / (nb - 1))").as("df_welch"))
    },

    // EXACT ROBUST GAP PROFILE VIA DISTRIBUTED SELECTION — the third
    // face of the inter-arrival family and the one that is BOTH exact
    // AND scale-honest: e17's exact quantiles sort each type's whole
    // gap column in one window task (the banished shape, kept as the
    // exact contrast); e18's sketch is mergeable but approximate; this
    // runs [[graft.operators.Ranks.groupedKthSmallest]] twice (median,
    // then MAD) so the only data-scale windows are the (user, type)
    // lag — paid ONCE into a checkpointed gap frame that all selection
    // passes fold — and the bucket-sized refines. The >3-MAD count is
    // the robust outlier gate (q47's rule) over the same frame; gaps
    // are exact micros end to end.
    "e42_gap_mad" -> { (s, d) =>
      import graft.operators.{LineageCheckpoint, Ranks}
      def pin(df: DataFrame) = new LineageCheckpoint(s, None)(df)
      val wSeq = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts_us"), col("event_id"))
      val gaps = pin(Tables.events(s, d)
        .select(col("user_id"), col("event_type"), tsUs.as("ts_us"),
          col("event_id"))
        .withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(wSeq))
        .filter(col("gap").isNotNull)
        .select(col("event_type"), col("gap")))
      val ks = pin(gaps.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), col("n"), expr("(n + 1) div 2").as("k")))
      val med = pin(Ranks.groupedKthSmallest(
          gaps, "event_type", "gap", ks, GapBucket)
        .select(col("event_type"), col("kth").as("med")))
      val dev = gaps.join(broadcast(med), Seq("event_type"))
        .select(col("event_type"), abs(col("gap") - col("med")).as("dv"))
      val mad = pin(Ranks.groupedKthSmallest(
          dev, "event_type", "dv", ks, GapBucket)
        .select(col("event_type"), col("kth").as("mad")))
      gaps.join(broadcast(med), Seq("event_type"))
        .join(broadcast(mad), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_gaps"),
          max(col("med")).as("median_gap_us"),
          max(col("mad")).as("mad_gap_us"),
          sum(when(abs(col("gap") - col("med")) > lit(3L) * col("mad"), 1L)
            .otherwise(0L)).as("n_outliers"))
        .orderBy(col("event_type"))
    },

    // ENGAGEMENT RATE WITH WILSON INTERVALS — the uncertainty-honest
    // version of a rate dashboard: per type, the share of high-value
    // events (the e35/e41 ≥150 gate) with its Wilson 95% score
    // interval, the CI that stays inside [0,1] and behaves at small n
    // where the naive ±z√(p̂q̂/n) does not. One conditional aggregate
    // per type (pushed-down scan, map-side partial); the interval is
    // a per-row projection of +−*/√ — correctly-rounded IEEE ops
    // stated token-for-token in both engines (the e40 discipline), so
    // the bounds are bit-identical with no rounding step. The point
    // rate is an exact integer micro-ratio.
    "e43_engagement_ci" -> { (s, d) =>
      val row = Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") >= 150, 1L).otherwise(0L)).as("k"))
      row
        .withColumn("p", expr("CAST(k AS DOUBLE) / n"))
        .withColumn("z2n", expr("1.96e0 * 1.96e0 / n"))
        .select(col("event_type"), col("n"), col("k"),
          expr("(k * 1000000) DIV n").as("rate_micro"),
          expr("(p + z2n / 2 - 1.96e0 * SQRT(p * (1 - p) / n" +
            " + z2n / (4 * n))) / (1 + z2n)").as("wilson_lo"),
          expr("(p + z2n / 2 + 1.96e0 * SQRT(p * (1 - p) / n" +
            " + z2n / (4 * n))) / (1 + z2n)").as("wilson_hi"))
        .orderBy(col("event_type"))
    },

    // PAIRWISE AUDIENCE OVERLAP FROM KMV STATES — e35's sketch face
    // (the d75→d80-style exact/sketch pairing): the same engaged-tail
    // audience matrix, but from one O(k) KMV state per type instead
    // of user-capacity bitmaps, so it scales to audiences that don't
    // fit a bitmap and to states persisted by earlier jobs (q27's
    // rule: the expensive scan is paid once; pair arithmetic touches
    // only states). Everything after the one scan is DECLARATIVE over
    // the 5-row state frame: union state = bottom-k of the merged
    // sorted arrays (array_union/array_sort/slice — exact set
    // semantics of KMV), estimates are the (k−1)·2³²/kth density
    // formula, intersection by inclusion–exclusion clamped at 0 —
    // d46's arithmetic, generalized to the full pairwise matrix with
    // NO driver collect and no UDF in the pair step. The estimator
    // path bites: every audience (64–75 users at sf0.01) exceeds
    // k = 32. Estimates are doubles from exact integer state — one
    // division each, cross-engine safe.
    "e41_overlap_kmv" -> { (s, d) =>
      val k = OverlapKmvK
      val st = udaf(new graft.operators.Sketches.KmvState(k),
        org.apache.spark.sql.Encoders.scalaLong)
      val states = Tables.events(s, d)
        .filter(col("value") >= 150)
        .select(col("event_type"),
          graft.operators.Sketches.kmvInput(
            graft.text.TextFunctions.hash32(col("user_id").cast("string")))
            .as("h"))
        .groupBy(col("event_type")).agg(st(col("h")).as("st"))
      def est(arr: Column): Column =
        when(size(arr) < k, size(arr).cast("double"))
          .otherwise(lit((k - 1).toDouble * 4294967296.0) /
            element_at(arr, k))
      val a = states.select(col("event_type").as("type_a"),
        col("st").as("sa"))
      val b = states.select(col("event_type").as("type_b"),
        col("st").as("sb"))
      a.join(broadcast(b), col("type_a") < col("type_b"))
        .withColumn("su",
          slice(array_sort(array_union(col("sa"), col("sb"))), 1, k))
        .select(col("type_a"), col("type_b"),
          est(col("sa")).as("est_a"), est(col("sb")).as("est_b"),
          est(col("su")).as("est_union"))
        .withColumn("est_inter",
          greatest(lit(0.0), col("est_a") + col("est_b")
            - col("est_union")))
        .withColumn("jaccard",
          when(col("est_union") > lit(0.0),
            col("est_inter") / col("est_union")).otherwise(lit(0.0)))
        .orderBy(col("type_a"), col("type_b"))
    },

    // KAPLAN-MEIER TIME-TO-CONVERSION SURVIVAL — the estimator that
    // handles CENSORING honestly, on the question a growth team
    // actually asks: how long from first activity to the first
    // HIGH-VALUE purchase (value ≥ 150 — 67 of 150 users convert at
    // sf0.01, over 25 distinct conversion times)? A user who never
    // converted is not a datapoint at infinity — they are censored at
    // the end of their observation window, and a naive conversion
    // curve that drops them (or calls them converted-never) biases
    // the rate. The life table runs over t = conversion day − first
    // activity day (censor time = horizon − first): events d_t,
    // censorings c_t, at-risk n_t = N − Σ_{t'<t}(d+c) by prefix sums,
    // and S(t) = Π(1 − d/n) via micro-quantized ln terms summed
    // exactly and exponentiated once (a bare double product would be
    // merge-order noise; a d = n step pins a −100 ln-unit sentinel so
    // S collapses to 0 deterministically). Scale shape: two user-keyed
    // aggregates over the event log (first-activity, first-conversion
    // — the second on a pushed-down type+value predicate); everything
    // after is windows over the observation-days-sized life table
    // with 1-row broadcasts.
    "e34_survival_retention" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("value"),
          expr(s"ts_ns div 1000 div $DayUs").as("day"))
      val users = ev.groupBy(col("user_id")).agg(min(col("day")).as("f"))
      val conv = ev.filter(col("event_type") === "purchase" &&
          col("value") >= 150)
        .groupBy(col("user_id")).agg(min(col("day")).as("cd"))
      val bounds = ev.agg(max(col("day")).as("horizon"))
      val perUser = users.join(conv, Seq("user_id"), "left")
        .crossJoin(broadcast(bounds))
        .select(
          when(col("cd").isNotNull, col("cd") - col("f"))
            .otherwise(col("horizon") - col("f")).as("t"),
          col("cd").isNotNull.as("event"))
      val nUsers = broadcast(users.agg(count(lit(1)).as("n_users")))
      val lt = perUser
        .groupBy(col("t"))
        .agg(sum(when(col("event"), 1L).otherwise(0L)).as("n_events"),
          sum(when(col("event"), 0L).otherwise(1L)).as("n_censored"))
      val wPrev = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wCum = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      lt.crossJoin(nUsers)
        .withColumn("n_risk", col("n_users")
          - coalesce(sum(col("n_events") + col("n_censored")).over(wPrev),
            lit(0L)))
        .withColumn("term",
          when(col("n_events") === 0, lit(0L))
            .when(col("n_risk") > col("n_events"),
              floor(log((col("n_risk") - col("n_events")).cast("double")
                / col("n_risk").cast("double")) * lit(1000000.0))
                .cast("long"))
            .otherwise(lit(-100000000L)))
        .withColumn("s_micro",
          floor(exp(sum(col("term")).over(wCum).cast("double")
            / lit(1000000.0)) * lit(1000000.0)).cast("long"))
        .select(col("t").as("t_days"), col("n_risk"), col("n_events"),
          col("n_censored"), col("s_micro"))
        .orderBy(col("t_days"))
    },

    // GAP-REGULARITY BOT SCREEN — the abuse-detection profile every
    // event pipeline runs before its data feeds anything downstream:
    // humans arrive with bursty inter-event gaps, schedulers and
    // scripts with metronomic ones, so the coefficient of variation
    // of a user's gap sequence is the classic first-pass bot signal
    // (low cv = suspiciously regular). Gaps quantize to exact integer
    // SECONDS (`div`, the e17 ordering convention), the per-user sums
    // (n, Σg, Σg²) are exact longs, and cv derives in one fixed
    // double sequence — cv = √(n·Σg² − (Σg)²)/Σg, the n-cancelling
    // form — floor-quantized to micro units (the e23 z-score
    // discipline; at 100 TB spans the integer sums move to DECIMAL).
    // The report is the 10 most-regular users via the mergeable
    // tagged heap — per-user state is one (n, Σ, Σ²) triple behind a
    // user-keyed window whose partitions are per-user event counts
    // (bounded), and the ranking never windows over the user table.
    "e30_bot_regularity" -> { (s, d) =>
      val topk = udaf(new graft.operators.Sketches.TopKByScoreTagged(10),
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[(java.lang.Long, String, java.lang.Long)]())
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val stats = Tables.events(s, d)
        .select(col("user_id"), tsUs.as("ts_us"), col("event_id"))
        .withColumn("prev", lag(col("ts_us"), 1).over(w))
        .filter(col("prev").isNotNull)
        .withColumn("gap_s", expr("(ts_us - prev) div 1000000"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("gap_s")).as("s"),
          sum(col("gap_s") * col("gap_s")).as("ss"))
        .filter(col("n_gaps") >= 30 && col("s") > 0)
        .withColumn("cv_micro",
          floor(sqrt((col("n_gaps") * col("ss") - col("s") * col("s"))
            .cast("double")) / col("s").cast("double") * lit(1000000.0))
            .cast("long"))
      stats
        .agg(topk(-col("cv_micro"),
          lpad(col("user_id").cast("string"), 20, "0"),
          col("n_gaps")).as("top"))
        .select(posexplode(col("top")).as(Seq("r0", "p")))
        .select((col("r0") + 1).cast("long").as("rank"),
          col("p._2").cast("bigint").as("user_id"),
          col("p._3").as("n_gaps"),
          (-col("p._1")).as("cv_micro"))
        .orderBy(col("rank"))
    },

    // PER-DAY VALUE-DISTRIBUTION DRIFT — q41's PSI arithmetic turned
    // into the monitoring report a serving pipeline runs continuously:
    // for every event type, each day's `value` distribution is scored
    // against the first-15-days baseline (8 fixed-width bins from the
    // type's global bounds, add-one smoothing, terms floor-quantized
    // to micro-BIGINTs so the per-day sum is exact). Baseline days
    // score themselves too — their near-zero PSI is the calibration
    // floor a drifted day must clear. Scale shape: bounds and baseline
    // bins are catalog-sized broadcasts; the corpus pays one
    // (type, day, bin) aggregate; the bin grid (day rows × baseline
    // bins, full-outer with the day's own bins) enumerates exactly the
    // cells q41's union-of-observed convention scores, so absent-from-
    // both bins contribute nothing. The [[graft.streaming.EventStreams
    // .DriftLedger]] streaming face replays this arithmetic
    // incrementally on closed windows.
    "e28_value_drift" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_type"), tsUs.as("ts_us"),
          col("value").cast("double").as("v"))
      val bounds = ev.groupBy(col("event_type"))
        .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      val bucketed = ev.join(broadcast(bounds), "event_type")
        .select(col("event_type"), dayStart(col("ts_us")).as("day"),
          (col("ts_us") < lit(DriftCutUs)).as("is_base"),
          when(col("hi") === col("lo"), lit(0L))
            .otherwise(least(lit(7L),
              floor((col("v") - col("lo")) * lit(8.0) /
                (col("hi") - col("lo"))).cast("long"))).as("bucket"))
      val base = bucketed.filter(col("is_base"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("cb"))
      val nb = base.groupBy(col("event_type")).agg(sum(col("cb")).as("nb"))
      val dcnt = bucketed
        .groupBy(col("event_type"), col("day"), col("bucket"))
        .agg(count(lit(1)).as("cd"))
      val nd = dcnt.groupBy(col("event_type"), col("day"))
        .agg(sum(col("cd")).as("nd"))
      val grid = nd.select(col("event_type"), col("day"))
        .join(broadcast(base), "event_type")
      // The cell union is a FULL OUTER in spirit (oracle spells it so),
      // but Spark cannot broadcast a full outer — spelled as left join
      // ∪ anti join, both broadcastable, value-identical.
      val cells = grid
        .join(dcnt, Seq("event_type", "day", "bucket"), "left")
        .select(col("event_type"), col("day"), col("bucket"), col("cb"),
          coalesce(col("cd"), lit(0L)).as("cd"))
        .unionByName(dcnt
          .join(broadcast(grid.select(col("event_type"), col("day"),
            col("bucket"))), Seq("event_type", "day", "bucket"),
            "left_anti")
          .select(col("event_type"), col("day"), col("bucket"),
            lit(0L).as("cb"), col("cd")))
      def share(c: Column, n: Column) =
        (c + lit(1)).cast("double") / (n + lit(8)).cast("double")
      cells.join(broadcast(nb), "event_type")
        .join(broadcast(nd), Seq("event_type", "day"))
        .select(col("event_type"), col("day"), col("nd"),
          floor((share(col("cb"), col("nb")) - share(col("cd"), col("nd")))
            * log(share(col("cb"), col("nb"))
              / share(col("cd"), col("nd")))
            * lit(1000000.0)).cast("long").as("term_micro"))
        .groupBy(col("event_type"), col("day"), col("nd").as("n_day"))
        .agg(sum(col("term_micro")).as("psi_micro"))
        .orderBy(col("event_type"), col("day"))
    },

    // LAST-TOUCH ATTRIBUTION REPORT — the channel rollup a marketing
    // pipeline ships: every purchase attributes to the user's most
    // recent marketing touch (view / click / signup) within the
    // session-gap staleness window, through the same one-shuffle
    // as-of machinery as e04/e15 but with a MIXED right side whose
    // event TYPE rides in the payload — the as-of fill picks channel
    // and latency atomically from one touch row. Purchases with no
    // fresh touch roll up as 'organic'. Per channel: purchase count,
    // DECIMAL-exact revenue, latency sum (exact integer micros —
    // every attributed row has a lag by construction, organic's stays
    // null) and mean latency. One (user, time) sort pass + a
    // catalog-sized (≤ 4-row) rollup.
    "e27_attribution" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), tsUs.as("ts_us"),
          col("event_type"), col("value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .drop("event_type")
      val touches = ev
        .filter(col("event_type").isin("view", "click", "signup"))
        .select(col("user_id"), col("ts_us"), col("event_type"),
          col("event_id"))
      graft.operators.AsOfJoin.asofJoin(
        purchases, touches, keys = Seq("user_id"), timeCol = "ts_us",
        rightPayload = Seq("event_type", "event_id", "ts_us"),
        prefix = "touch_", tieBreak = Seq(col("touch_event_id")),
        tolerance = SessionGapUs)
        .select(
          coalesce(col("touch_event_type"), lit("organic")).as("channel"),
          col("value"),
          (col("ts_us") - col("touch_ts_us")).as("lag_us"))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          dsum(col("value")).as("revenue"),
          sum(col("lag_us")).as("lag_sum_us"))
        .withColumn("avg_lag_us",
          col("lag_sum_us").cast("double") / col("n_purchases"))
        .orderBy(col("channel"))
    },

    // Conversion funnel view → click → purchase: per user, the first
    // view, the first click strictly after it, the first purchase
    // strictly after that — stage counts plus end-to-end conversion.
    // Three aggregates all keyed on user_id (co-partitioned at scale:
    // one logical exchange feeds every stage); the final row is three
    // scalar counts cross-joined.
    "e05_funnel" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), tsUs.as("ts_us"), col("event_type"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t1"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts_us") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t2"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts_us") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t3"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_view_click_purchase")))
        .select(col("n_view"), col("n_view_click"),
          col("n_view_click_purchase"),
          (col("n_view_click_purchase").cast("double") / col("n_view"))
            .as("conversion"))
    },

    // Inter-event gap quantiles — the behavioral-latency profile
    // (how often do users click? what's the p90 lull between
    // purchases?): per-user-and-type gaps from ONE lag window, then
    // q20's exact interpolated quantiles per type over the derived
    // gaps. Two keyed exchanges total ((user,type) for the lag,
    // type for the rank); gaps are exact integer micros, and equal
    // gap values make the rank-tie order irrelevant to the
    // interpolation, so the result is deterministic under any
    // layout — hash-checked against quantile_cont.
    //
    // EXACT face of a pinned pair (the q25/q26 contrast): the per-type
    // rank window sorts each type's ENTIRE gap column in one task —
    // the oracle-checkable contract, fine at test SF, a straggler at
    // 100 TB with ~5 types. e18 is the serving face: the same gaps
    // through the mergeable bottom-k rank sketch, no single-task sort
    // (PlanSpec pins both shapes).
    "e17_gap_quantiles" -> { (s, d) =>
      val wSeq = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts_us"), col("event_id"))
      val gaps = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), tsUs.as("ts_us"),
          col("event_id"))
        .withColumn("gap", (col("ts_us") - lag(col("ts_us"), 1).over(wSeq))
          .cast("double"))
        .filter(col("gap").isNotNull)
        .select(col("event_type"), col("gap"))
      val wRank = Window.partitionBy(col("event_type")).orderBy(col("gap"))
      val ranked = gaps.withColumn("rn", row_number().over(wRank).cast("long"))
      val counts = ranked.groupBy(col("event_type")).agg(max(col("rn")).as("n"))
      def contrib(p: Double): Column = {
        val h = (col("n") - 1).cast("double") * lit(p)
        val loRank = floor(h).cast("long") + 1
        when(col("rn") === loRank, (loRank.cast("double") - h) * col("gap"))
          .when(col("rn") === loRank + 1, (h - floor(h)) * col("gap"))
          .otherwise(lit(0.0))
      }
      ranked.join(broadcast(counts), "event_type")
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n"),
          sum(contrib(0.5)).as("p50_gap_us"),
          sum(contrib(0.9)).as("p90_gap_us"))
        .orderBy(col("event_type"))
    },

    // e17's SERVING face: the same per-(user,type) lag gaps, but the
    // per-type quantiles come from the mergeable bottom-k rank sketch
    // ([[graft.operators.Sketches.BottomKQuantile]], q23's machinery)
    // instead of a per-type rank window. The window form sorts each
    // type's entire gap column in ONE task (~5 types ⇒ ~5 tasks own
    // the whole table's gaps — the NTILE shape d47 banished); the
    // sketch keeps O(k) state per type through map-side partial
    // aggregation, so the only exchanges are the (user,type) lag
    // shuffle and a k-bounded final-aggregate exchange. Hashing the
    // unique event_id makes the bottom-k a uniform row sample the
    // oracle re-derives identically (the q23 derivation over a lag
    // CTE), so even the approximate face stays hash-exact. n is the
    // exact per-type gap count — the witness that sampling (k=128 ≪ n
    // at sf0.01) is what the estimate path exercised.
    "e18_gap_quantiles_sketch" -> { (s, d) =>
      val bq = udaf(
        new graft.operators.Sketches.BottomKQuantile(GapQuantK, Seq(0.5, 0.9)),
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[(java.lang.Long, java.lang.Double)]())
      val wSeq = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), tsUs.as("ts_us"),
          col("event_id"))
        .withColumn("gap", (col("ts_us") - lag(col("ts_us"), 1).over(wSeq))
          .cast("double"))
        .filter(col("gap").isNotNull)
        .select(col("event_type"),
          graft.text.TextFunctions.hash32(col("event_id").cast("string"))
            .as("h"),
          col("gap"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), bq(col("h"), col("gap")).as("q"))
        .select(col("event_type"), col("n"),
          element_at(col("q"), 1).as("p50_gap_est"),
          element_at(col("q"), 2).as("p90_gap_est"))
        .orderBy(col("event_type"))
    },

    // Behavioral ARCHETYPE segmentation: each user-day reduces to the
    // sorted set of event types performed (the day's behavioral
    // signature — browse-only, view>click, full-funnel, …), then
    // user-days count per signature — the session-intent distribution
    // a lifetime signature can't show (at sf0.01 every user does
    // every type EVENTUALLY, but 31 distinct daily signatures
    // partition 4006 user-days). The signature is array_sort over
    // collect_set, which makes a nondeterministically-ordered
    // aggregation state canonical and hash-checkable; one
    // (user, day)-keyed exchange (the set state partial-aggregates
    // map-side, bounded by #types) and a catalog-sized signature
    // count. avg_events from exact integers.
    "e21_type_archetypes" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), expr(s"(ts_ns div 1000) div $DayUs").as("day"))
        .agg(array_join(array_sort(collect_set(col("event_type"))), ">")
            .as("signature"),
          count(lit(1)).as("n_events"))
        .groupBy(col("signature"))
        .agg(count(lit(1)).as("n_user_days"),
          sum(col("n_events")).cast("long").as("n_events"),
          (sum(col("n_events")).cast("double") /
            count(lit(1)).cast("double")).as("avg_events"))
        .orderBy(col("signature"))
    },

    // Top session ENTRY PATHS: the first three event types of every
    // session (e02's lag/cumsum sessionization — same single
    // user-keyed exchange), canonicalized by an array_sort over
    // (ts, event_id, type) structs so the collected order is
    // deterministic under any partitioning, then the 10 most common
    // paths — the how-do-journeys-start report behind onboarding and
    // landing-flow design. The path aggregate is bounded per session
    // (collect then slice 3), the path rollup is catalog-sized, and
    // the top-10 plans as a per-partition heap.
    "e26_entry_paths" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prevTs = lag(col("ts_us"), 1).over(w)
      Tables.events(s, d)
        .select(col("user_id"), tsUs.as("ts_us"), col("event_id"),
          col("event_type"))
        .withColumn("is_new",
          when(prevTs.isNull || col("ts_us") - prevTs > SessionGapUs, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("is_new")).over(wRun))
        .groupBy(col("user_id"), col("session_id"))
        .agg(array_join(slice(transform(
          array_sort(collect_list(struct(col("ts_us"), col("event_id"),
            col("event_type")))),
          x => x.getField("event_type")), 1, 3), ">").as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(10)
    },

    // TOMBSTONE-aware CDC compaction — e07's latest-state merge with
    // DELETE semantics: the changelog's last record per user decides,
    // and when that record is a tombstone ('error' here plays the
    // delete op) the user is ABSENT from the compacted state, exactly
    // as MERGE ... WHEN MATCHED AND op = 'D' THEN DELETE. Same
    // mergeable max_by shape (one user-keyed exchange, no window
    // sort); the deletes bite at sf0.01 — 30 of 150 users' final
    // record is a tombstone, so the state table has 120 rows and the
    // missing users are the witness.
    "e25_tombstone_compaction" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("user_id"), tsUs.as("ts_us"), col("event_id"),
          col("event_type"), col("value"))
        .groupBy(col("user_id"))
        .agg(max_by(
          struct(col("ts_us"), col("event_id"), col("event_type"),
            col("value")),
          struct(col("ts_us"), col("event_id"))).as("last"))
        .filter(col("last.event_type") =!= "error")
        .select(col("user_id"), col("last.ts_us").as("last_ts_us"),
          col("last.event_id").as("last_event_id"),
          col("last.event_type").as("last_type"),
          col("last.value").as("last_value"))
        .orderBy(col("user_id"))
    },

    // RFM SEGMENTATION: every user scored on Recency (days since last
    // event vs the corpus max — a broadcast 1-row anchor, so the
    // segmentation is reproducible from the data alone), Frequency
    // (event count) and Monetary (exact DECIMAL spend), folded into an
    // 8-cell R/F/M flag segment — the lifecycle-marketing crosstab.
    // One user-keyed aggregate holds all three stats (count, max ts,
    // decimal sum share the partial-agg pass), then a catalog-sized
    // segment rollup; thresholds are integers/decimals so every flag
    // is exact on both engines; all 8 segments occur at sf0.01.
    "e24_rfm_segments" -> { (s, d) =>
      val anchor = Tables.events(s, d).agg(max(tsUs).as("mts"))
      Tables.events(s, d)
        .select(col("user_id"), tsUs.as("ts_us"), col("value"))
        .crossJoin(broadcast(anchor))
        .groupBy(col("user_id"))
        .agg(expr(s"(max(mts) - max(ts_us)) div $DayUs").as("recency_d"),
          count(lit(1)).as("freq"),
          sum(col("value").cast(DecimalType(12, 2))).as("monetary"))
        .select(concat(
          when(col("recency_d") <= 0, lit("R")).otherwise(lit("r")),
          when(col("freq") >= 66, lit("F")).otherwise(lit("f")),
          when(col("monetary") > 3300, lit("M")).otherwise(lit("m")))
          .as("segment"),
          col("freq"), col("monetary"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_users"),
          (sum(col("freq")).cast("double") /
            count(lit(1)).cast("double")).as("avg_freq"),
          sum(col("monetary")).cast("double").as("total_monetary"))
        .orderBy(col("segment"))
    },

    // Hourly volume ANOMALY detection: each (type, hour)'s event count
    // z-scored against its own trailing 24-hour RANGE window — the
    // ops-monitoring query behind traffic-spike and outage alerts.
    // Scale shape: the raw table reduces to catalog-sized (type, hour)
    // counts in ONE keyed partial+final aggregate; the window then
    // runs over ≤ 8,760 rows per type-year, so the per-type sort costs
    // nothing at any corpus size (the e17 single-task concern does not
    // apply post-aggregation). Parity shape (q34's rule): mean and
    // variance derive from EXACT integer window sums (n, Σn, Σn²) in
    // one fixed double-expression sequence, so z is bit-identical on
    // both engines; a zero-variance window z-scores to 0 rather than
    // NaN. cnt24 ≥ 12 suppresses the cold-start hours; 213 of 3,325
    // hours flag at sf0.01.
    "e23_hourly_anomaly" -> { (s, d) =>
      val w = Window.partitionBy(col("event_type")).orderBy(col("hour_idx"))
        .rangeBetween(-24, -1)
      Tables.events(s, d)
        .groupBy(col("event_type"), expr(s"(ts_ns div 1000) div $HourUs")
          .as("hour_idx"))
        .agg(count(lit(1)).as("n"))
        // explicit n² projection so all three window aggregates
        // reference plain attributes — one Window node, one frame pass
        .withColumn("n2", col("n") * col("n"))
        .withColumn("cnt24", count(col("n")).over(w))
        .withColumn("sum24", sum(col("n")).over(w))
        .withColumn("sumsq24", sum(col("n2")).over(w))
        .filter(col("cnt24") >= 12)
        .withColumn("mean24",
          col("sum24").cast("double") / col("cnt24").cast("double"))
        .withColumn("vnum",
          (col("cnt24") * col("sumsq24") - col("sum24") * col("sum24"))
            .cast("double"))
        .withColumn("z", when(col("vnum") <= 0, lit(0.0))
          .otherwise((col("n").cast("double") - col("mean24")) /
            sqrt(col("vnum") / (col("cnt24") * col("cnt24")).cast("double"))))
        .select(col("event_type"),
          timestamp_micros(col("hour_idx") * HourUs).as("hour"),
          col("n"), col("mean24"), col("z"),
          (abs(col("z")) > 2.0).as("is_anomaly"))
        .orderBy(col("event_type"), col("hour"))
    },

    // Behavioral MARKOV CHAIN: (from → to) transition counts and
    // probabilities between each user's consecutive events — the
    // next-action model behind session prediction and funnel design.
    // The predecessor label is one lag over e02's (ts, event_id)
    // user-keyed window, so raw events cross exactly ONE wire; a
    // user's first event transitions from the synthetic '_start'
    // state, which makes the matrix's first rows the entry
    // distribution for free. The grouped matrix is catalog-sized
    // (≤ (|types|+1) × |types| rows), so the per-from normalizing
    // window costs nothing at any scale; p = exact integer count /
    // exact integer row total — one double division, deterministic
    // on both engines.
    "e22_type_transitions" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val wFrom = Window.partitionBy(col("from_type"))
      Tables.events(s, d)
        .select(col("user_id"), tsUs.as("ts_us"), col("event_id"),
          col("event_type"))
        .withColumn("from_type",
          coalesce(lag(col("event_type"), 1).over(w), lit("_start")))
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p", col("n").cast("double") /
          sum(col("n")).over(wFrom).cast("double"))
        .orderBy(col("from_type"), col("to_type"))
    },

    // Session ENTRY-TYPE attribution over e02's sessionization: which
    // event type opens a session, and what that entry is worth —
    // sessions per entry type, average session length, total session
    // value (the landing-page/campaign-entry analysis). The entry
    // label is first_value over (user, session) ordered by (ts,
    // event_id) — session_id is itself time-ordered within a user, so
    // the label window rides the SAME user-keyed exchange as the
    // lag/cumsum that built it (one shuffle end to end before the
    // final catalog-sized entry-type aggregate). avg_events derives
    // from exact integer counts; value sums through DECIMAL.
    "e20_session_entry_stats" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prevTs = lag(col("ts_us"), 1).over(w)
      val wSess = Window.partitionBy(col("user_id"), col("session_id"))
        .orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, d)
        .withColumn("ts_us", tsUs)
        .withColumn("is_new",
          when(prevTs.isNull || col("ts_us") - prevTs > SessionGapUs, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("is_new")).over(wRun))
        .withColumn("entry_type", first(col("event_type")).over(wSess))
        .groupBy(col("user_id"), col("session_id"), col("entry_type"))
        // value stays DECIMAL through BOTH aggregation levels — a
        // session-level double would make the entry-level re-sum
        // merge-order-dependent (the module-wide double-sum rule).
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(12, 2))).as("v"))
        .groupBy(col("entry_type"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).cast("long").as("n_events"),
          (sum(col("n_events")).cast("double") /
            count(lit(1)).cast("double")).as("avg_events"),
          sum(col("v")).cast("double").as("total_value"))
        .orderBy(col("entry_type"))
    },

    // Windowed top-k "trending": the 3 highest-spending users per hour
    // — the leaderboard/trending-items serving shape. Two keyed
    // exchanges: (hour, user) for the exact DECIMAL spend sums, hour
    // for the ranking — and the ranking is the MERGEABLE top-k
    // aggregate (q24's machinery applied per window), so only k rows
    // per hour per task cross the second wire where the window idiom
    // would sort every user-hour row through it. Ties break (spend
    // DESC, user_id ASC) on both engines, making the board total-
    // ordered and hash-checkable.
    "e19_hourly_top_users" -> { (s, d) =>
      val topk = udaf(new graft.operators.Sketches.TopKByScore(3),
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[(java.lang.Double, java.lang.Long)]())
      Tables.events(s, d)
        .groupBy(hourStart(tsUs).as("hour"), col("user_id"))
        .agg(dsum(col("value")).as("v"))
        .groupBy(col("hour"))
        .agg(topk(col("v"), col("user_id")).as("top"))
        .select(col("hour"), posexplode(col("top")).as(Seq("r0", "p")))
        .select(col("hour"), (col("r0") + 1).cast("long").as("rank"),
          col("p._2").as("user_id"), col("p._1").as("total_value"))
        .orderBy(col("hour"), col("rank"))
    },

    // e05's funnel TIME-BOXED: each step must land within 24 hours of
    // the previous one — the realistic attribution form (a purchase a
    // week after the click is not this funnel's conversion). Same
    // min-per-step shape and exchanges as e05; only the step filter
    // gains the upper bound, and the bound BITES at sf0.01 (fewer
    // users clear each boxed step than e05's unbounded ones), so the
    // row pins the windowed semantics, not just a re-run.
    "e16_funnel_windowed" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), tsUs.as("ts_us"), col("event_type"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t1"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("ts_us") > col("t1") &&
          col("ts_us") <= col("t1") + lit(DayUs))
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t2"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("ts_us") > col("t2") &&
          col("ts_us") <= col("t2") + lit(DayUs))
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t3"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_view_click_purchase")))
        .select(col("n_view"), col("n_view_click"),
          col("n_view_click_purchase"),
          (col("n_view_click_purchase").cast("double") / col("n_view"))
            .as("conversion"))
    },

    // Bounded look-ahead interval join ([[graft.operators.IntervalJoin]]):
    // every (view, click) pair where the click lands within one hour
    // AFTER the view, per user — the attribution-window join. The naive
    // per-key join materializes views×clicks per user before filtering;
    // the operator's window-width time-bucketing bounds each join group
    // to ~one window of data per key (see IntervalJoin's scaladoc), so
    // hot users cost events-per-window², not events-per-key².
    "e06_interval_join" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), tsUs.as("ts_us"),
          col("event_type"))
      val views = ev.filter(col("event_type") === "view").drop("event_type")
      val clicks = ev.filter(col("event_type") === "click").drop("event_type")
      graft.operators.IntervalJoin.intervalJoin(
        views, clicks, keys = Seq("user_id"), timeCol = "ts_us",
        windowUs = AttributionUs, rightPayload = Seq("event_id"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("iv_event_id"), col("iv_ts_us"),
          (col("iv_ts_us") - col("ts_us")).as("gap_us"))
        .orderBy(col("event_id"), col("iv_event_id"))
    },

    // CDC-style latest-state compaction: the current (user, event_type)
    // state table — last event wins by (ts, event_id). Deliberately
    // max_by over a struct, NOT a row_number window: max_by partial-
    // aggregates map-side, so the exchange carries one row per (user,
    // type) per input partition instead of every raw event through a
    // per-key sort — the shape that lets a 100-TB changelog compact into
    // a state snapshot in one pass.
    "e07_last_state" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), tsUs.as("ts_us"),
          col("event_id"), col("value"))
        .groupBy(col("user_id"), col("event_type"))
        .agg(max_by(
          struct(col("ts_us"), col("event_id"), col("value")),
          struct(col("ts_us"), col("event_id"))).as("last"))
        .select(col("user_id"), col("event_type"),
          col("last.ts_us").as("last_ts_us"),
          col("last.event_id").as("last_event_id"),
          col("last.value").as("last_value"))
        .orderBy(col("user_id"), col("event_type"))
    },

    // INCREMENTAL state maintenance — e07's compaction maintained the
    // way a 100-TB table actually is: a persisted SNAPSHOT (the
    // compacted state of all history before a cutoff) plus ONLY the
    // changelog tail since, folded by the same max_by. The oracle
    // computes the full-history compaction and never sees the
    // incremental path (q36's merge≡direct argument, applied to state
    // maintenance): hash-equality proves applying the tail to the
    // snapshot reproduces the full recompute exactly, because max_by
    // over (snapshot ∪ tail) = max_by over all events — the snapshot
    // row IS the pre-cutoff maximum. The cutoff derives from the data
    // (day 20 after the first event's day) with exact integer
    // arithmetic in both engines.
    "e14_incremental_state" -> { (s, d) =>
      val ev = Tables.events(s, d).select(col("user_id"), col("event_type"),
        tsUs.as("ts_us"), col("event_id"), col("value"))
      val t0 = ev.agg(
        ((floor(min(col("ts_us")).cast("double") / lit(DayUs.toDouble))
          .cast("long")) * lit(DayUs) + lit(20L * DayUs)).as("t0"))
      val stamped = ev.crossJoin(broadcast(t0))
      def compact(df: DataFrame) = df
        .groupBy(col("user_id"), col("event_type"))
        .agg(max_by(struct(col("ts_us"), col("event_id"), col("value")),
          struct(col("ts_us"), col("event_id"))).as("last"))
      val snapshot = compact(stamped.filter(col("ts_us") < col("t0")))
        .select(col("user_id"), col("event_type"),
          col("last.ts_us").as("ts_us"), col("last.event_id").as("event_id"),
          col("last.value").as("value"))
      val tail = stamped.filter(col("ts_us") >= col("t0"))
        .select(col("user_id"), col("event_type"), col("ts_us"),
          col("event_id"), col("value"))
      compact(snapshot.unionByName(tail))
        .select(col("user_id"), col("event_type"),
          col("last.ts_us").as("last_ts_us"),
          col("last.event_id").as("last_event_id"),
          col("last.value").as("last_value"))
        .orderBy(col("user_id"), col("event_type"))
    },

    // Daily retention cohorts — the classic activity-analytics matrix:
    // users grouped by first-seen day, then for each later day the
    // fraction of the cohort still active. Shapes for 100 TB: distinct
    // (user, day) is ONE exchange keyed by user (the per-user min and
    // the activity join reuse it); the cohort-size and cell aggregates
    // are countDistinct over already-deduped pairs — partial+final, no
    // row-level state. Days are exact epoch-micros integer buckets.
    "e08_retention_cohorts" -> { (s, d) =>
      val ud = Tables.events(s, d)
        .select(col("user_id"),
          expr(s"(ts_ns div 1000) div $DayUs").as("day"))
        .distinct()
      val cohort = ud.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      val sizes = cohort.groupBy(col("cohort_day"))
        .agg(countDistinct(col("user_id")).as("cohort_size"))
      ud.join(cohort, "user_id")
        .groupBy(col("cohort_day"),
          (col("day") - col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .join(sizes, "cohort_day")
        .select(col("cohort_day"), col("day_offset"), col("cohort_size"),
          col("n_active"),
          (col("n_active").cast("double") / col("cohort_size"))
            .as("retention"))
        .orderBy(col("cohort_day"), col("day_offset"))
    },

    // SCD2 dimension build from the changelog: every (user, type) event
    // becomes a validity interval [valid_from, valid_to) closed by the
    // NEXT change (null = current row) — e07 compacts to the latest
    // state, this keeps full history queryable by as-of time. One
    // (user, type)-keyed exchange; the lead window rides the same
    // spillable sort the sessionization uses.
    "e09_scd2_intervals" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("valid_from"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), tsUs.as("valid_from"),
          col("event_id"), col("value"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
        .withColumn("is_current", col("valid_to").isNull)
        .orderBy(col("user_id"), col("event_type"), col("valid_from"),
          col("event_id"))
    },

    // Per-type stats with JSON props extraction in the scan projection.
    "e03_type_stats" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"), col("user_id"), col("value"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          dsum(col("value")).as("total_value"),
          (dsum(col("value")) / count(lit(1))).as("avg_value"),
          sum(col("k")).as("sum_k"))
        .orderBy(col("event_type"))
    }
  )

  def oracle: Map[String, String] = Map(
    "e01_hourly_rollup" ->
      """SELECT make_timestamp((epoch_us(ts)//3600000000)*3600000000) AS hour,
        | event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    // q22's KMV re-derivation partitioned by hour: the k-th smallest
    // md5-based hash per window, the same (k−1)·2³²/h(k) estimator,
    // below-k hours degrading to the exact count.
    "e11_hourly_users" ->
      s"""WITH b AS (SELECT
         |  make_timestamp((epoch_us(ts)//3600000000)*3600000000) AS hour,
         |  user_id FROM events),
         |ex AS (SELECT hour, COUNT(*) AS n_events,
         |        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         |       FROM b GROUP BY hour),
         |h AS (SELECT DISTINCT hour,
         |       CAST(('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,8)) AS BIGINT) AS h
         |      FROM b),
         |r AS (SELECT hour, h,
         |       ROW_NUMBER() OVER (PARTITION BY hour ORDER BY h) AS rn,
         |       COUNT(*) OVER (PARTITION BY hour) AS nd
         |      FROM h),
         |e AS (SELECT hour,
         |       CASE WHEN MAX(nd) < $HourlyKmvK THEN CAST(MAX(nd) AS DOUBLE)
         |            ELSE ${HourlyKmvK - 1}e0 * 4294967296e0
         |                 / MAX(CASE WHEN rn = $HourlyKmvK THEN h END) END
         |        AS est_users
         |      FROM r GROUP BY hour)
         |SELECT ex.hour, ex.n_events, ex.n_users, e.est_users
         |FROM ex JOIN e ON ex.hour = e.hour
         |ORDER BY ex.hour""".stripMargin,

    // The rollup expansion spelled as a UNION ALL of the three
    // granularities, each estimated with the q22 KMV re-derivation
    // partitioned by the (label, label) pair.
    "e12_rollup_users" ->
      s"""WITH b AS (SELECT
         |  CAST(make_timestamp((epoch_us(ts)//86400000000)*86400000000)
         |    AS VARCHAR) AS day,
         |  CAST(make_timestamp((epoch_us(ts)//3600000000)*3600000000)
         |    AS VARCHAR) AS hour,
         |  user_id FROM events),
         |u AS (
         | SELECT day, hour, user_id FROM b
         | UNION ALL SELECT day, 'ALL', user_id FROM b
         | UNION ALL SELECT 'ALL', 'ALL', user_id FROM b),
         |ex AS (SELECT day, hour, COUNT(*) AS n_events,
         |        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         |       FROM u GROUP BY day, hour),
         |h AS (SELECT DISTINCT day, hour,
         |       CAST(('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,8)) AS BIGINT) AS h
         |      FROM u),
         |r AS (SELECT day, hour, h,
         |       ROW_NUMBER() OVER (PARTITION BY day, hour ORDER BY h) AS rn,
         |       COUNT(*) OVER (PARTITION BY day, hour) AS nd
         |      FROM h),
         |e AS (SELECT day, hour,
         |       CASE WHEN MAX(nd) < $HourlyKmvK THEN CAST(MAX(nd) AS DOUBLE)
         |            ELSE ${HourlyKmvK - 1}e0 * 4294967296e0
         |                 / MAX(CASE WHEN rn = $HourlyKmvK THEN h END) END
         |        AS est_users
         |      FROM r GROUP BY day, hour)
         |SELECT ex.day, ex.hour, ex.n_events, ex.n_users, e.est_users
         |FROM ex JOIN e ON ex.day = e.day AND ex.hour = e.hour
         |ORDER BY ex.day, ex.hour""".stripMargin,

    "e13_moving_window" ->
      s"""SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         | COUNT(*) OVER w AS n_trailing_1h,
         | CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
         |   AS v_trailing_1h
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
         | RANGE BETWEEN $HourUs PRECEDING AND CURRENT ROW)
         |ORDER BY event_id""".stripMargin,

    "e02_sessionization" ->
      """WITH o AS (
        | SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |       THEN 1 ELSE 0 END AS is_new
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        | SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        | FROM o)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        | MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
        | CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "e04_asof_click_view" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
        |           FROM events),
        |c AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type='click'),
        |v AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type='view')
        |SELECT c.event_id, c.user_id, c.ts_us,
        | v.event_id AS view_event_id, v.ts_us AS view_ts_us,
        | c.ts_us - v.ts_us AS gap_us
        |FROM c ASOF LEFT JOIN v
        | ON c.user_id = v.user_id AND v.ts_us <= c.ts_us
        |ORDER BY c.event_id""".stripMargin,

    // e04's ASOF with the tolerance as post-join CASE-nulls: DuckDB
    // still picks the nearest prior view; the CASE nulls it (and the
    // derived columns) when it is too old — a no-match row's NULL
    // ts_us makes every CASE condition NULL → NULL, the same output.
    "e15_asof_tolerance" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
         |           FROM events),
         |c AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type='click'),
         |v AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type='view')
         |SELECT c.event_id, c.user_id, c.ts_us,
         | CASE WHEN c.ts_us - v.ts_us <= $SessionGapUs
         |      THEN v.event_id END AS view_event_id,
         | CASE WHEN c.ts_us - v.ts_us <= $SessionGapUs
         |      THEN v.ts_us END AS view_ts_us,
         | CASE WHEN c.ts_us - v.ts_us <= $SessionGapUs
         |      THEN c.ts_us - v.ts_us END AS gap_us
         |FROM c ASOF LEFT JOIN v
         | ON c.user_id = v.user_id AND v.ts_us <= c.ts_us
         |ORDER BY c.event_id""".stripMargin,

    // e29: each trailing window's estimate re-derived from raw
    // per-day distinct hashes (e11's k-th-smallest spelling over the
    // window join) — equality proves the engine's merged STORED
    // states answer as the union would.
    "e29_rolling_actives" ->
      """WITH b AS (SELECT epoch_us(ts)//86400000000 AS d, user_id,
        |        CAST(('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,8))
        |         AS BIGINT) AS h
        |       FROM events),
        |dau AS (SELECT d, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
        |        FROM b GROUP BY 1),
        |days AS (SELECT DISTINCT d FROM b),
        |w7 AS (SELECT a.d AS d, b.h FROM days a
        |       JOIN b ON b.d > a.d - 7 AND b.d <= a.d GROUP BY 1, 2),
        |r7 AS (SELECT d, h, ROW_NUMBER() OVER (PARTITION BY d ORDER BY h)
        |        AS rn, COUNT(*) OVER (PARTITION BY d) AS nd FROM w7),
        |e7 AS (SELECT d, CASE WHEN MAX(nd) < 64 THEN CAST(MAX(nd) AS DOUBLE)
        |            ELSE 63e0 * 4294967296e0
        |                 / MAX(CASE WHEN rn = 64 THEN h END) END AS wau_est
        |       FROM r7 GROUP BY d),
        |w30 AS (SELECT a.d AS d, b.h FROM days a
        |        JOIN b ON b.d > a.d - 30 AND b.d <= a.d GROUP BY 1, 2),
        |r30 AS (SELECT d, h, ROW_NUMBER() OVER (PARTITION BY d ORDER BY h)
        |         AS rn, COUNT(*) OVER (PARTITION BY d) AS nd FROM w30),
        |e30 AS (SELECT d, CASE WHEN MAX(nd) < 64 THEN CAST(MAX(nd) AS DOUBLE)
        |             ELSE 63e0 * 4294967296e0
        |                  / MAX(CASE WHEN rn = 64 THEN h END) END AS mau_est
        |        FROM r30 GROUP BY d)
        |SELECT dau.d AS day_idx, dau.dau, e7.wau_est, e30.mau_est
        |FROM dau JOIN e7 ON dau.d = e7.d JOIN e30 ON dau.d = e30.d
        |ORDER BY day_idx""".stripMargin,

    // e33: the oracle needs no bitmaps — COUNT(DISTINCT) per day and
    // per trailing window IS the exact answer the bitmaps must hit.
    "e33_bitmap_actives" ->
      """WITH b AS (SELECT epoch_us(ts)//86400000000 AS d, user_id
        |           FROM events),
        |dau AS (SELECT d, CAST(COUNT(DISTINCT user_id) AS BIGINT)
        |         AS dau_exact FROM b GROUP BY 1),
        |days AS (SELECT DISTINCT d FROM b),
        |w7 AS (SELECT a.d, CAST(COUNT(DISTINCT b.user_id) AS BIGINT)
        |        AS wau_exact
        |       FROM days a JOIN b ON b.d > a.d - 7 AND b.d <= a.d
        |       GROUP BY 1),
        |w30 AS (SELECT a.d, CAST(COUNT(DISTINCT b.user_id) AS BIGINT)
        |         AS mau_exact
        |        FROM days a JOIN b ON b.d > a.d - 30 AND b.d <= a.d
        |        GROUP BY 1)
        |SELECT dau.d AS day_idx, dau.dau_exact, w7.wau_exact, w30.mau_exact
        |FROM dau JOIN w7 ON dau.d = w7.d JOIN w30 ON dau.d = w30.d
        |ORDER BY day_idx""".stripMargin,

    // e32: the fold as a recursive CTE over per-type hour indexes —
    // identical integer state transitions, terminal row per type.
    "e32_cusum_alarms" ->
      """WITH RECURSIVE
        |h AS (SELECT event_type, epoch_us(ts)//3600000000 AS hour_idx,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |      FROM events GROUP BY 1, 2),
        |i AS (SELECT event_type, hour_idx, n,
        |       ROW_NUMBER() OVER (PARTITION BY event_type
        |        ORDER BY hour_idx) AS i
        |      FROM h),
        |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
        |       (CAST(SUM(n) AS BIGINT) * 1000000) // COUNT(*) AS mu
        |      FROM i GROUP BY 1),
        |r(event_type, i, s, n_alarms, first_alarm, max_s) AS (
        |  SELECT event_type, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |   CAST(0 AS BIGINT), CAST(NULL AS BIGINT), CAST(0 AS BIGINT)
        |  FROM m
        |  UNION ALL
        |  SELECT r.event_type, r.i + 1,
        |   CASE WHEN GREATEST(0, r.s + i.n*1000000 - m.mu - m.mu//10)
        |          > m.mu * 2
        |        THEN 0
        |        ELSE GREATEST(0, r.s + i.n*1000000 - m.mu - m.mu//10) END,
        |   r.n_alarms + CASE
        |     WHEN GREATEST(0, r.s + i.n*1000000 - m.mu - m.mu//10)
        |       > m.mu * 2 THEN 1 ELSE 0 END,
        |   CASE WHEN r.first_alarm IS NULL AND
        |          GREATEST(0, r.s + i.n*1000000 - m.mu - m.mu//10)
        |           > m.mu * 2
        |        THEN i.hour_idx ELSE r.first_alarm END,
        |   GREATEST(r.max_s,
        |    GREATEST(0, r.s + i.n*1000000 - m.mu - m.mu//10))
        |  FROM r JOIN i ON i.event_type = r.event_type AND i.i = r.i + 1
        |  JOIN m ON m.event_type = r.event_type)
        |SELECT m.event_type, m.n_hours, m.mu AS mu_micro,
        | r.n_alarms, r.first_alarm AS first_alarm_hour,
        | r.max_s AS max_s_micro
        |FROM r JOIN m ON r.event_type = m.event_type AND r.i = m.n_hours
        |ORDER BY m.event_type""".stripMargin,

    // e31: e02's session CTEs + two per-session lags with '_start'
    // padding + the per-context normalize.
    "e31_markov_contexts" ->
      """WITH o AS (
        | SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |       THEN 1 ELSE 0 END AS is_new
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        | SELECT *, SUM(is_new) OVER (PARTITION BY user_id
        |   ORDER BY ts_us, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        | FROM o),
        |c AS (
        | SELECT COALESCE(lag(event_type, 2) OVER ws, '_start') AS prev2,
        |  COALESCE(lag(event_type, 1) OVER ws, '_start') AS prev1,
        |  event_type AS next_type
        | FROM s WINDOW ws AS (PARTITION BY user_id, session_id
        |   ORDER BY ts_us, event_id)),
        |g AS (SELECT prev2, prev1, next_type,
        |       CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY 1, 2, 3)
        |SELECT prev2, prev1, next_type, n,
        | CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY prev2, prev1)
        |   AS DOUBLE) AS p
        |FROM g ORDER BY prev2, prev1, next_type""".stripMargin,

    // e35: plain per-pair distinct intersections — the exactness
    // proof the bitmaps must hit; jaccard from the same integers.
    "e35_audience_overlap" ->
      """WITH ua AS (SELECT DISTINCT event_type, user_id FROM events
        |            WHERE value >= 150),
        |n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM ua GROUP BY 1),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |       CAST(COUNT(*) AS BIGINT) AS n_both
        |      FROM ua a JOIN ua b ON a.user_id = b.user_id
        |       AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b, na.n AS n_a, nb.n AS n_b, p.n_both,
        | (p.n_both * 1000000) // (na.n + nb.n - p.n_both) AS jaccard_micro
        |FROM p JOIN n na ON p.type_a = na.event_type
        |JOIN n nb ON p.type_b = nb.event_type
        |ORDER BY type_a, type_b""".stripMargin,

    // e45: e35's per-pair distinct counts computed on the SAME md5
    // surrogate key the Spark side dictionary-encodes — the dense
    // encoding is a bijection on the live keys, so set algebra on
    // dense ids ≡ set algebra on surrogates, and bit equality here is
    // the proof the codebook lost nothing.
    "e45_bitmap_dict" ->
      """WITH ua AS (SELECT DISTINCT event_type,
        |  CAST(('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,8)) AS BIGINT)
        |   AS suid
        | FROM events WHERE value >= 150),
        |n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM ua GROUP BY 1),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |       CAST(COUNT(*) AS BIGINT) AS n_both
        |      FROM ua a JOIN ua b ON a.suid = b.suid
        |       AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b, na.n AS n_a, nb.n AS n_b, p.n_both,
        | (p.n_both * 1000000) // (na.n + nb.n - p.n_both) AS jaccard_micro
        |FROM p JOIN n na ON p.type_a = na.event_type
        |JOIN n nb ON p.type_b = nb.event_type
        |ORDER BY type_a, type_b""".stripMargin,

    // e47: the pair set as a declarative range join, per-purchase
    // counts and the last touch as windows, division exact integer.
    "e47_attribution" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS t, event_type,
        |        CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |       FROM events),
        |tch AS (SELECT user_id, event_id, t, event_type FROM ev
        |        WHERE event_type IN ('view', 'click')),
        |pur AS (SELECT user_id, event_id AS p_id, t AS pt, cents FROM ev
        |        WHERE event_type = 'purchase'),
        |pairs AS (SELECT tch.event_type, tch.t, tch.event_id,
        |           pur.p_id, pur.cents
        |          FROM tch JOIN pur ON tch.user_id = pur.user_id
        |           AND pur.pt > tch.t AND pur.pt <= tch.t + 86400000000),
        |c AS (SELECT event_type, p_id, cents,
        |       COUNT(*) OVER (PARTITION BY p_id) AS n_touches,
        |       ROW_NUMBER() OVER (PARTITION BY p_id
        |        ORDER BY t DESC, event_id DESC) AS rn
        |      FROM pairs),
        |att AS (SELECT event_type,
        |         CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |         CAST(COUNT(DISTINCT p_id) AS BIGINT) AS n_purchases,
        |         CAST(SUM(cents * 1000000 // n_touches) AS BIGINT)
        |          AS linear_micro_cents,
        |         CAST(SUM(CASE WHEN rn = 1 THEN cents ELSE 0 END) AS BIGINT)
        |          AS last_touch_cents
        |        FROM c GROUP BY 1),
        |direct AS (SELECT '(direct)' AS event_type,
        |            CAST(0 AS BIGINT) AS n_pairs,
        |            CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |            CAST(COALESCE(SUM(cents), 0) * 1000000 AS BIGINT)
        |             AS linear_micro_cents,
        |            CAST(COALESCE(SUM(cents), 0) AS BIGINT)
        |             AS last_touch_cents
        |           FROM pur WHERE p_id NOT IN
        |            (SELECT DISTINCT p_id FROM pairs))
        |SELECT * FROM att UNION ALL SELECT * FROM direct
        |ORDER BY event_type""".stripMargin,

    // e48: first digit re-derived as the head character of the exact
    // cents integer's decimal string; the nine Benford micro shares
    // are the same driver-inlined literals both engines consume.
    "e48_benford_profile" ->
      """WITH c AS (SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
        |            AS cents FROM events),
        |p AS (SELECT cents FROM c WHERE cents > 0),
        |g AS (SELECT substr(CAST(cents AS VARCHAR), 1, 1) AS digit,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |      FROM p GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM g),
        |b(digit, m) AS (VALUES
        | ('1', 301029), ('2', 176091), ('3', 124938), ('4', 96910),
        | ('5', 79181), ('6', 66946), ('7', 57991), ('8', 51152),
        | ('9', 45757))
        |SELECT g.digit, g.n,
        | g.n * 1000000 // t.total AS share_micro,
        | CAST(b.m AS BIGINT) AS benford_micro,
        | abs(g.n * 1000000 // t.total - CAST(b.m AS BIGINT)) AS dev_micro
        |FROM g JOIN b USING (digit), t
        |ORDER BY g.digit""".stripMargin,

    // e46: the integer decay staircase replayed — weight = 1e6
    // right-shifted by whole age-weeks from the corpus max timestamp,
    // every sum exact integer arithmetic.
    "e46_decayed_engagement" ->
      """WITH a AS (SELECT MAX(epoch_us(ts)) AS anchor FROM events),
        |e AS (SELECT user_id,
        |       ((a.anchor // 3600000000)
        |        - (epoch_us(ts) // 3600000000)) // 168 AS weeks,
        |       CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |      FROM events, a),
        |w AS (SELECT user_id, cents,
        |       CASE WHEN weeks >= 20 THEN 0
        |        ELSE 1000000 // (CAST(1 AS BIGINT) << weeks) END AS w_micro
        |      FROM e)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        | CAST(SUM(w_micro) AS BIGINT) AS hits_decayed_micro,
        | CAST(SUM(w_micro * cents) AS BIGINT) AS value_decayed_micro_cents
        |FROM w GROUP BY 1
        |ORDER BY value_decayed_micro_cents DESC, user_id""".stripMargin,

    // e38: cohort CTE over all events, purchase-only cents cells, the
    // day-0 base left-joined back; ratios in integer micro.
    "e38_revenue_retention" ->
      """WITH ev AS (SELECT user_id, event_type,
        |        epoch_us(ts) // 86400000000 AS day,
        |        CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
        |          AS cents
        |       FROM events),
        |c AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY 1),
        |cells AS (SELECT c.cohort_day, e.day - c.cohort_day AS day_offset,
        |        CAST(SUM(e.cents) AS BIGINT) AS rev_cents
        |       FROM ev e JOIN c ON e.user_id = c.user_id
        |       WHERE e.event_type = 'purchase'
        |       GROUP BY 1, 2),
        |b AS (SELECT cohort_day, rev_cents AS base_cents FROM cells
        |      WHERE day_offset = 0)
        |SELECT cells.cohort_day, cells.day_offset, cells.rev_cents,
        | COALESCE(b.base_cents, 0) AS base_cents,
        | CASE WHEN COALESCE(b.base_cents, 0) > 0
        |      THEN (cells.rev_cents * 1000000) // b.base_cents
        |      ELSE CAST(0 AS BIGINT) END AS ndr_micro
        |FROM cells LEFT JOIN b ON cells.cohort_day = b.cohort_day
        |ORDER BY cells.cohort_day, cells.day_offset""".stripMargin,

    // e37: e02's session CTEs, the ±1 delta union, a per-day running
    // sum (ties: starts before ends via delta DESC — intermediate tie
    // orderings differ but the day MAX is invariant), and the same
    // days-frame carry window.
    "e37_peak_concurrency" ->
      """WITH o AS (
        | SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |       THEN 1 ELSE 0 END AS is_new
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        | SELECT *, SUM(is_new) OVER (PARTITION BY user_id
        |   ORDER BY ts_us, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        | FROM o),
        |sess AS (SELECT user_id, session_id, MIN(ts_us) AS start_us,
        |          MAX(ts_us) AS end_us
        |         FROM s GROUP BY 1, 2),
        |d AS (SELECT start_us AS t, CAST(1 AS BIGINT) AS delta FROM sess
        |      UNION ALL
        |      SELECT end_us AS t, CAST(-1 AS BIGINT) AS delta FROM sess),
        |run AS (SELECT t // 86400000000 AS day_idx, delta,
        |         SUM(delta) OVER (PARTITION BY t // 86400000000
        |           ORDER BY t, delta DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r
        |        FROM d),
        |ds AS (SELECT day_idx,
        |        CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_sessions_start,
        |        CAST(SUM(delta) AS BIGINT) AS tot,
        |        GREATEST(CAST(0 AS BIGINT), CAST(MAX(r) AS BIGINT)) AS maxp
        |       FROM run GROUP BY 1),
        |fin AS (SELECT day_idx, n_sessions_start,
        |         CAST(COALESCE(SUM(tot) OVER (ORDER BY day_idx
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS BIGINT) AS carry_in,
        |         maxp
        |        FROM ds)
        |SELECT day_idx, n_sessions_start, carry_in,
        | carry_in + maxp AS peak_concurrency
        |FROM fin ORDER BY day_idx""".stripMargin,

    // e36: the same recurrence unrolled as a recursive CTE over the
    // indexed hourly series — step i+1 consumes state i; DuckDB's
    // integer // truncates toward zero exactly like Spark's div.
    "e36_holt_forecast" ->
      """WITH RECURSIVE
        |h AS (SELECT event_type, epoch_us(ts)//3600000000 AS hour_idx,
        |       CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |i AS (SELECT event_type, n,
        |       ROW_NUMBER() OVER (PARTITION BY event_type
        |        ORDER BY hour_idx) AS i
        |      FROM h),
        |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours
        |      FROM i GROUP BY 1),
        |r(event_type, i, l, b, sae, maxae) AS (
        |  SELECT i.event_type, CAST(1 AS BIGINT), i.n*1000000,
        |   CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |  FROM i WHERE i.i = 1
        |  UNION ALL
        |  SELECT r.event_type, r.i + 1,
        |   (i.n*1000000 + 4*(r.l + r.b)) // 5,
        |   (((i.n*1000000 + 4*(r.l + r.b)) // 5) - r.l + 9*r.b) // 10,
        |   r.sae + ABS(i.n*1000000 - r.l - r.b),
        |   GREATEST(r.maxae, ABS(i.n*1000000 - r.l - r.b))
        |  FROM r JOIN i ON i.event_type = r.event_type AND i.i = r.i + 1
        |)
        |SELECT r.event_type AS event_type, m.n_hours,
        | r.l AS level_micro, r.b AS trend_micro,
        | r.l + r.b AS forecast_micro,
        | CASE WHEN m.n_hours > 1
        |      THEN CAST(r.sae // (m.n_hours - 1) AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS mae_micro,
        | r.maxae AS max_abs_err_micro
        |FROM r JOIN m ON r.event_type = m.event_type AND r.i = m.n_hours
        |ORDER BY event_type""".stripMargin,

    // e39: e36's recursive CTE with the 24-slot seasonal list carried
    // as recursion state (list_transform with index = the indexed
    // transform in the Spark fold).
    "e39_holt_winters" ->
      """WITH RECURSIVE
        |h AS (SELECT event_type, epoch_us(ts)//3600000000 AS hour_idx,
        |       CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |i AS (SELECT event_type, hour_idx, n,
        |       ROW_NUMBER() OVER (PARTITION BY event_type
        |        ORDER BY hour_idx) AS i
        |      FROM h),
        |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours
        |      FROM i GROUP BY 1),
        |r(event_type, i, l, b, s, lasth, sae) AS (
        |  SELECT i.event_type, CAST(1 AS BIGINT), i.n*1000000,
        |   CAST(0 AS BIGINT),
        |   list_transform(range(24), x -> CAST(0 AS BIGINT)),
        |   i.hour_idx, CAST(0 AS BIGINT)
        |  FROM i WHERE i.i = 1
        |  UNION ALL
        |  SELECT r.event_type, r.i + 1,
        |   (i.n*1000000 - r.s[CAST(i.hour_idx % 24 AS INT) + 1]
        |    + 4*(r.l + r.b)) // 5,
        |   (((i.n*1000000 - r.s[CAST(i.hour_idx % 24 AS INT) + 1]
        |      + 4*(r.l + r.b)) // 5) - r.l + 9*r.b) // 10,
        |   list_transform(r.s, (x, j) ->
        |     CASE WHEN j = CAST(i.hour_idx % 24 AS INT) + 1
        |     THEN (i.n*1000000
        |           - ((i.n*1000000 - r.s[CAST(i.hour_idx % 24 AS INT) + 1]
        |              + 4*(r.l + r.b)) // 5)
        |           + 9*x) // 10
        |     ELSE x END),
        |   i.hour_idx,
        |   r.sae + ABS(i.n*1000000 - r.l - r.b
        |               - r.s[CAST(i.hour_idx % 24 AS INT) + 1])
        |  FROM r JOIN i ON i.event_type = r.event_type AND i.i = r.i + 1
        |)
        |SELECT r.event_type AS event_type, m.n_hours,
        | r.l AS level_micro, r.b AS trend_micro,
        | r.l + r.b + r.s[CAST((r.lasth + 1) % 24 AS INT) + 1]
        |  AS forecast_micro,
        | CASE WHEN m.n_hours > 1
        |      THEN CAST(r.sae // (m.n_hours - 1) AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS mae_micro
        |FROM r JOIN m ON r.event_type = m.event_type AND r.i = m.n_hours
        |ORDER BY event_type""".stripMargin,

    // e44: e39's recursive state rows joined one step FORWARD — the
    // prediction for step i+1 is a pure projection of row i's state —
    // with the final row's MAE as the 3x gate.
    "e44_seasonal_residuals" ->
      """WITH RECURSIVE
        |h AS (SELECT event_type, epoch_us(ts)//3600000000 AS hour_idx,
        |       CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |i AS (SELECT event_type, hour_idx, n,
        |       ROW_NUMBER() OVER (PARTITION BY event_type
        |        ORDER BY hour_idx) AS i
        |      FROM h),
        |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours
        |      FROM i GROUP BY 1),
        |r(event_type, i, l, b, s, lasth, sae) AS (
        |  SELECT i.event_type, CAST(1 AS BIGINT), i.n*1000000,
        |   CAST(0 AS BIGINT),
        |   list_transform(range(24), x -> CAST(0 AS BIGINT)),
        |   i.hour_idx, CAST(0 AS BIGINT)
        |  FROM i WHERE i.i = 1
        |  UNION ALL
        |  SELECT r.event_type, r.i + 1,
        |   (i.n*1000000 - r.s[CAST(i.hour_idx % 24 AS INT) + 1]
        |    + 4*(r.l + r.b)) // 5,
        |   (((i.n*1000000 - r.s[CAST(i.hour_idx % 24 AS INT) + 1]
        |      + 4*(r.l + r.b)) // 5) - r.l + 9*r.b) // 10,
        |   list_transform(r.s, (x, j) ->
        |     CASE WHEN j = CAST(i.hour_idx % 24 AS INT) + 1
        |     THEN (i.n*1000000
        |           - ((i.n*1000000 - r.s[CAST(i.hour_idx % 24 AS INT) + 1]
        |              + 4*(r.l + r.b)) // 5)
        |           + 9*x) // 10
        |     ELSE x END),
        |   i.hour_idx,
        |   r.sae + ABS(i.n*1000000 - r.l - r.b
        |               - r.s[CAST(i.hour_idx % 24 AS INT) + 1])
        |  FROM r JOIN i ON i.event_type = r.event_type AND i.i = r.i + 1
        |),
        |mae AS (SELECT r.event_type,
        |        CASE WHEN m.n_hours > 1
        |             THEN CAST(r.sae // (m.n_hours - 1) AS BIGINT)
        |             ELSE CAST(0 AS BIGINT) END AS mae_micro
        |       FROM r JOIN m ON r.event_type = m.event_type
        |        AND r.i = m.n_hours),
        |rows_ AS (SELECT r.event_type, i.hour_idx,
        |        CAST(i.n * 1000000 AS BIGINT) AS y_micro,
        |        CAST(r.l + r.b + r.s[CAST(i.hour_idx % 24 AS INT) + 1]
        |          AS BIGINT) AS pred_micro
        |       FROM r JOIN i ON i.event_type = r.event_type
        |        AND i.i = r.i + 1)
        |SELECT w.event_type, CAST(w.hour_idx AS BIGINT) AS hour_idx,
        | w.y_micro, w.pred_micro,
        | w.y_micro - w.pred_micro AS resid_micro,
        | ABS(w.y_micro - w.pred_micro) > 3 * mae.mae_micro AS is_anomaly
        |FROM rows_ w JOIN mae ON mae.event_type = w.event_type
        |ORDER BY w.event_type, hour_idx""".stripMargin,

    // e40: moment sums stated naively per arm; the t/df projection is
    // the IDENTICAL double expression tree as the Spark arm — every op
    // correctly-rounded IEEE, so no rounding step is needed.
    "e40_ab_welch" ->
      """WITH m AS (SELECT event_type,
        |        CAST(FLOOR(value * 1000000) AS BIGINT) AS m
        |       FROM events
        |       WHERE event_type IN ('purchase', 'click')),
        |g AS (SELECT
        |   COUNT(*) FILTER (WHERE event_type = 'purchase') AS na,
        |   SUM(CAST(m AS HUGEINT)) FILTER (WHERE event_type = 'purchase') AS sa,
        |   SUM(CAST(m * m AS HUGEINT)) FILTER (WHERE event_type = 'purchase') AS qa,
        |   COUNT(*) FILTER (WHERE event_type = 'click') AS nb,
        |   SUM(CAST(m AS HUGEINT)) FILTER (WHERE event_type = 'click') AS sb,
        |   SUM(CAST(m * m AS HUGEINT)) FILTER (WHERE event_type = 'click') AS qb
        |  FROM m),
        |v AS (SELECT *,
        |   (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE)
        |      * CAST(sa AS DOUBLE) / na) / (na - 1) AS va,
        |   (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE)
        |      * CAST(sb AS DOUBLE) / nb) / (nb - 1) AS vb
        |  FROM g)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        | CAST(sa // na AS BIGINT) AS mean_a_micro,
        | CAST(sb // nb AS BIGINT) AS mean_b_micro,
        | (CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
        |   / SQRT(va / na + vb / nb) AS t_stat,
        | ((va / na + vb / nb) * (va / na + vb / nb))
        |   / ((va / na) * (va / na) / (na - 1)
        |      + (vb / nb) * (vb / nb) / (nb - 1)) AS df_welch
        |FROM v""".stripMargin,

    // e43: the identical double expression tree (the e40 discipline);
    // 1.96e0 keeps the z literal DOUBLE on both engines.
    "e43_engagement_ci" ->
      """WITH g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(CASE WHEN value >= 150 THEN 1 ELSE 0 END)
        |          AS BIGINT) AS k
        |       FROM events GROUP BY 1),
        |v AS (SELECT *, CAST(k AS DOUBLE) / n AS p,
        |       1.96e0 * 1.96e0 / n AS z2n FROM g)
        |SELECT event_type, n, k,
        | CAST((k * 1000000) // n AS BIGINT) AS rate_micro,
        | (p + z2n / 2 - 1.96e0 * SQRT(p * (1 - p) / n
        |    + z2n / (4 * n))) / (1 + z2n) AS wilson_lo,
        | (p + z2n / 2 + 1.96e0 * SQRT(p * (1 - p) / n
        |    + z2n / (4 * n))) / (1 + z2n) AS wilson_hi
        |FROM v ORDER BY event_type""".stripMargin,

    // e42: the same lag-gap CTE as e17, then both selections stated as
    // plain ranked windows (q47's mirror) and the 3-MAD gate.
    "e42_gap_mad" ->
      """WITH g AS (
        | SELECT event_type,
        |  CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |   PARTITION BY user_id, event_type ORDER BY ts, event_id)
        |   AS BIGINT) AS gap
        | FROM events),
        |o AS (SELECT event_type, gap FROM g WHERE gap IS NOT NULL),
        |n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM o GROUP BY 1),
        |r AS (SELECT event_type, gap, ROW_NUMBER() OVER (
        |       PARTITION BY event_type ORDER BY gap) AS rn FROM o),
        |med AS (SELECT r.event_type, r.gap AS med FROM r
        |        JOIN n ON n.event_type = r.event_type
        |        WHERE r.rn = (n.n + 1) // 2),
        |d AS (SELECT o.event_type, ABS(o.gap - med.med) AS dv
        |      FROM o JOIN med ON med.event_type = o.event_type),
        |rd AS (SELECT event_type, dv, ROW_NUMBER() OVER (
        |        PARTITION BY event_type ORDER BY dv) AS rn FROM d),
        |mad AS (SELECT rd.event_type, rd.dv AS mad FROM rd
        |        JOIN n ON n.event_type = rd.event_type
        |        WHERE rd.rn = (n.n + 1) // 2)
        |SELECT o.event_type AS event_type,
        | CAST(COUNT(*) AS BIGINT) AS n_gaps,
        | CAST(MAX(med.med) AS BIGINT) AS median_gap_us,
        | CAST(MAX(mad.mad) AS BIGINT) AS mad_gap_us,
        | CAST(SUM(CASE WHEN ABS(o.gap - med.med) > 3 * mad.mad
        |          THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM o JOIN med ON med.event_type = o.event_type
        | JOIN mad ON mad.event_type = o.event_type
        |GROUP BY 1 ORDER BY event_type""".stripMargin,

    // e41: per-type bottom-k replayed with ranked windows over the
    // distinct hash sets; pair unions from the shared distinct-hash
    // frame; the same density/inclusion-exclusion arithmetic as d46.
    "e41_overlap_kmv" ->
      s"""WITH dh AS (SELECT DISTINCT event_type,
         |        CAST(('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,8))
         |          AS BIGINT) AS h
         |       FROM events WHERE value >= 150),
         |r AS (SELECT event_type, h,
         |       ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         |       COUNT(*) OVER (PARTITION BY event_type) AS nd
         |      FROM dh),
         |est AS (SELECT event_type,
         |        CASE WHEN MAX(nd) < $OverlapKmvK THEN CAST(MAX(nd) AS DOUBLE)
         |        ELSE ${OverlapKmvK - 1}e0 * 4294967296e0
         |             / MAX(CASE WHEN rn = $OverlapKmvK THEN h END) END AS est
         |       FROM r GROUP BY 1),
         |pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b
         |          FROM est a JOIN est b ON a.event_type < b.event_type),
         |uh AS (SELECT DISTINCT p.type_a, p.type_b, dh.h
         |       FROM pairs p JOIN dh
         |        ON dh.event_type IN (p.type_a, p.type_b)),
         |ur AS (SELECT type_a, type_b, h,
         |        ROW_NUMBER() OVER (PARTITION BY type_a, type_b
         |                           ORDER BY h) AS rn,
         |        COUNT(*) OVER (PARTITION BY type_a, type_b) AS nd
         |       FROM uh),
         |uest AS (SELECT type_a, type_b,
         |        CASE WHEN MAX(nd) < $OverlapKmvK THEN CAST(MAX(nd) AS DOUBLE)
         |        ELSE ${OverlapKmvK - 1}e0 * 4294967296e0
         |             / MAX(CASE WHEN rn = $OverlapKmvK THEN h END) END AS est
         |       FROM ur GROUP BY 1, 2)
         |SELECT p.type_a AS type_a, p.type_b AS type_b,
         | a.est AS est_a, b.est AS est_b,
         | u.est AS est_union,
         | greatest(0.0e0, a.est + b.est - u.est) AS est_inter,
         | CASE WHEN u.est > 0.0e0
         |      THEN greatest(0.0e0, a.est + b.est - u.est) / u.est
         |      ELSE 0.0e0 END AS jaccard
         |FROM pairs p
         | JOIN est a ON a.event_type = p.type_a
         | JOIN est b ON b.event_type = p.type_b
         | JOIN uest u ON u.type_a = p.type_a AND u.type_b = p.type_b
         |ORDER BY p.type_a, p.type_b""".stripMargin,

    // e34: the life table — per-user first activity and first
    // qualifying conversion, the horizon and N as scalars, prefix-sum
    // at-risk counts, the two-branch term CASE with the d = n
    // sentinel, and the single exp.
    "e34_survival_retention" ->
      """WITH u AS (SELECT user_id,
        |        MIN(epoch_us(ts)//86400000000) AS f
        |       FROM events GROUP BY 1),
        |cv AS (SELECT user_id, MIN(epoch_us(ts)//86400000000) AS cd
        |       FROM events
        |       WHERE event_type = 'purchase' AND value >= 150
        |       GROUP BY 1),
        |b AS (SELECT MAX(epoch_us(ts)//86400000000) AS horizon FROM events),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM u),
        |lt AS (SELECT CASE WHEN c.cd IS NOT NULL THEN c.cd - u.f
        |              ELSE b.horizon - u.f END AS t,
        |        CAST(SUM(CASE WHEN c.cd IS NOT NULL THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_events,
        |        CAST(SUM(CASE WHEN c.cd IS NOT NULL THEN 0 ELSE 1 END)
        |          AS BIGINT) AS n_censored
        |       FROM u LEFT JOIN cv c USING (user_id) CROSS JOIN b
        |       GROUP BY 1),
        |r AS (SELECT t, n_events, n_censored,
        |       (SELECT n_users FROM nn)
        |        - CAST(COALESCE(SUM(n_events + n_censored) OVER (
        |            ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |            AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
        |      FROM lt),
        |tm AS (SELECT t, n_risk, n_events, n_censored,
        |        CASE WHEN n_events = 0 THEN CAST(0 AS BIGINT)
        |             WHEN n_risk > n_events THEN
        |               CAST(FLOOR(LN(CAST(n_risk - n_events AS DOUBLE)
        |                 / CAST(n_risk AS DOUBLE)) * 1000000e0) AS BIGINT)
        |             ELSE CAST(-100000000 AS BIGINT) END AS term
        |       FROM r)
        |SELECT t AS t_days, n_risk, n_events, n_censored,
        | CAST(FLOOR(EXP(CAST(SUM(term) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |   / 1000000e0) * 1000000e0) AS BIGINT) AS s_micro
        |FROM tm ORDER BY t_days""".stripMargin,

    // e30: gaps by the e17 lag convention, exact integer second sums,
    // the same n-cancelling cv formula floor-quantized, rank by
    // (cv ASC, user ASC) — the heap's (score DESC, tag ASC) mirror.
    "e30_bot_regularity" ->
      """WITH g AS (
        | SELECT user_id,
        |  (epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id)) // 1000000 AS gap_s
        | FROM events),
        |st AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |        CAST(SUM(gap_s) AS BIGINT) AS s,
        |        CAST(SUM(gap_s * gap_s) AS BIGINT) AS ss
        |       FROM g WHERE gap_s IS NOT NULL GROUP BY 1
        |       HAVING COUNT(*) >= 30 AND SUM(gap_s) > 0),
        |cv AS (SELECT user_id, n_gaps,
        |        CAST(FLOOR(SQRT(CAST(n_gaps * ss - s * s AS DOUBLE))
        |          / CAST(s AS DOUBLE) * 1000000e0) AS BIGINT) AS cv_micro
        |       FROM st)
        |SELECT CAST(rn AS BIGINT) AS rank, user_id, n_gaps, cv_micro
        |FROM (SELECT user_id, n_gaps, cv_micro,
        |       ROW_NUMBER() OVER (ORDER BY cv_micro, user_id) AS rn
        |      FROM cv) x
        |WHERE rn <= 10 ORDER BY rank""".stripMargin,

    // e28: q41's PSI oracle spelling re-keyed to (type, day) with the
    // baseline-bin grid FULL JOINed to each day's own bins.
    "e28_value_drift" ->
      s"""WITH ev AS (SELECT event_type, epoch_us(ts) AS ts_us,
         |            CAST(value AS DOUBLE) AS v FROM events),
         |b AS (SELECT event_type, MIN(v) AS lo, MAX(v) AS hi
         |      FROM ev GROUP BY 1),
         |bk AS (SELECT e.event_type,
         |        make_timestamp((e.ts_us//86400000000)*86400000000) AS day,
         |        e.ts_us < $DriftCutUs AS is_base,
         |        CASE WHEN b.hi = b.lo THEN CAST(0 AS BIGINT)
         |             ELSE LEAST(7, CAST(FLOOR((e.v - b.lo) * 8e0
         |               / (b.hi - b.lo)) AS BIGINT)) END AS bucket
         |       FROM ev e JOIN b USING (event_type)),
         |base AS (SELECT event_type, bucket, COUNT(*) AS cb
         |         FROM bk WHERE is_base GROUP BY 1, 2),
         |nb AS (SELECT event_type, CAST(SUM(cb) AS BIGINT) AS nb
         |       FROM base GROUP BY 1),
         |d AS (SELECT event_type, day, bucket, COUNT(*) AS cd
         |      FROM bk GROUP BY 1, 2, 3),
         |nd AS (SELECT event_type, day, CAST(SUM(cd) AS BIGINT) AS nd
         |       FROM d GROUP BY 1, 2),
         |grid AS (SELECT n.event_type, n.day, b2.bucket, b2.cb
         |         FROM nd n JOIN base b2 USING (event_type)),
         |cells AS (SELECT event_type, day, bucket,
         |           COALESCE(g.cb, 0) AS cb, COALESCE(d.cd, 0) AS cd
         |          FROM grid g FULL JOIN d USING (event_type, day, bucket)),
         |terms AS (SELECT c.event_type, c.day, nd.nd,
         |  CAST(FLOOR(
         |    ((CAST(c.cb + 1 AS DOUBLE) / CAST(nb.nb + 8 AS DOUBLE))
         |     - (CAST(c.cd + 1 AS DOUBLE) / CAST(nd.nd + 8 AS DOUBLE)))
         |    * ln((CAST(c.cb + 1 AS DOUBLE) / CAST(nb.nb + 8 AS DOUBLE))
         |         / (CAST(c.cd + 1 AS DOUBLE) / CAST(nd.nd + 8 AS DOUBLE)))
         |    * 1000000.0e0) AS BIGINT) AS term_micro
         |  FROM cells c JOIN nb USING (event_type)
         |  JOIN nd USING (event_type, day))
         |SELECT event_type, day, nd AS n_day,
         | CAST(SUM(term_micro) AS BIGINT) AS psi_micro
         |FROM terms GROUP BY 1, 2, 3
         |ORDER BY event_type, day""".stripMargin,

    // e27: e15's ASOF + CASE-tolerance pattern with the mixed touch
    // side; the all-null lag group (organic) sums to NULL in both
    // engines.
    "e27_attribution" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         |            event_type, value FROM events),
         |p AS (SELECT event_id, user_id, ts_us, value FROM e
         |      WHERE event_type = 'purchase'),
         |t AS (SELECT event_id, user_id, ts_us, event_type FROM e
         |      WHERE event_type IN ('view', 'click', 'signup')),
         |m AS (SELECT p.value,
         |       CASE WHEN p.ts_us - t.ts_us <= $SessionGapUs
         |            THEN t.event_type END AS mtype,
         |       CASE WHEN p.ts_us - t.ts_us <= $SessionGapUs
         |            THEN p.ts_us - t.ts_us END AS lag_us
         |      FROM p ASOF LEFT JOIN t
         |       ON p.user_id = t.user_id AND t.ts_us <= p.ts_us)
         |SELECT COALESCE(mtype, 'organic') AS channel,
         | COUNT(*) AS n_purchases,
         | CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
         | CAST(SUM(lag_us) AS BIGINT) AS lag_sum_us,
         | CAST(SUM(lag_us) AS DOUBLE) / COUNT(*) AS avg_lag_us
         |FROM m GROUP BY 1 ORDER BY channel""".stripMargin,

    // DuckDB's ASOF takes >= for the nearest-following match directly.
    "e10_asof_view_click" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
        |           FROM events),
        |v AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type='view'),
        |c AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type='click')
        |SELECT v.event_id, v.user_id, v.ts_us,
        | c.event_id AS click_event_id, c.ts_us AS click_ts_us,
        | c.ts_us - v.ts_us AS gap_us
        |FROM v ASOF LEFT JOIN c
        | ON v.user_id = c.user_id AND c.ts_us >= v.ts_us
        |ORDER BY v.event_id""".stripMargin,

    "e05_funnel" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |v AS (SELECT user_id, MIN(ts_us) AS t1 FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts_us) AS t2 FROM e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts_us > v.t1
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts_us) AS t3 FROM e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts_us > c.t2
        |      GROUP BY e.user_id)
        |SELECT (SELECT COUNT(*) FROM v) AS n_view,
        | (SELECT COUNT(*) FROM c) AS n_view_click,
        | (SELECT COUNT(*) FROM p) AS n_view_click_purchase,
        | CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
        |  / (SELECT COUNT(*) FROM v) AS conversion""".stripMargin,

    // The lag gaps re-derived, then DuckDB's own quantile_cont — the
    // q20-proved interpolation parity applied to a derived column.
    "e17_gap_quantiles" ->
      """WITH g AS (
        | SELECT event_type,
        |  CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |   PARTITION BY user_id, event_type ORDER BY ts, event_id)
        |   AS DOUBLE) AS gap
        | FROM events)
        |SELECT event_type, COUNT(*) AS n,
        | quantile_cont(gap, 0.5) AS p50_gap_us,
        | quantile_cont(gap, 0.9) AS p90_gap_us
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // e18: the bottom-k sample re-derived over the lag-gap CTE (q23's
    // derivation): distinct (hash of the gap row's unique event_id,
    // gap) pairs per type, window-ranked by (h, v), rn <= k, then
    // quantile_cont over the sampled values — the q20-proved
    // interpolation parity on the sketch's sample.
    "e18_gap_quantiles_sketch" ->
      """WITH g AS (
        | SELECT event_type, event_id,
        |  CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |   PARTITION BY user_id, event_type ORDER BY ts, event_id)
        |   AS DOUBLE) AS gap
        | FROM events),
        |h AS (SELECT DISTINCT event_type AS grp,
        |       CAST(('0x'||substr(md5(CAST(event_id AS VARCHAR)),1,8)) AS BIGINT) AS h,
        |       gap AS v
        |      FROM g WHERE gap IS NOT NULL),
        |r AS (SELECT grp, v,
        |       ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h, v) AS rn
        |      FROM h),
        |s AS (SELECT grp, quantile_cont(v, 0.5) AS p50, quantile_cont(v, 0.9) AS p90
        |      FROM r WHERE rn <= 128 GROUP BY grp),
        |n AS (SELECT event_type AS grp, COUNT(*) AS n FROM g
        |      WHERE gap IS NOT NULL GROUP BY 1)
        |SELECT n.grp AS event_type, n.n,
        | s.p50 AS p50_gap_est, s.p90 AS p90_gap_est
        |FROM n JOIN s ON n.grp = s.grp ORDER BY event_type""".stripMargin,

    // e21: DISTINCT + ordered string_agg builds the same canonical
    // signature declaratively.
    "e21_type_archetypes" ->
      """WITH u AS (SELECT user_id, epoch_us(ts)//86400000000 AS day,
        |  string_agg(DISTINCT event_type, '>' ORDER BY event_type) AS signature,
        |  COUNT(*) AS n_events
        | FROM events GROUP BY 1, 2)
        |SELECT signature, COUNT(*) AS n_user_days,
        | CAST(SUM(n_events) AS BIGINT) AS n_events,
        | CAST(SUM(n_events) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_events
        |FROM u GROUP BY signature ORDER BY signature""".stripMargin,

    // e26: e02's session CTEs + an ordered list aggregate sliced to 3.
    "e26_entry_paths" ->
      """WITH o AS (
        | SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |       THEN 1 ELSE 0 END AS is_new
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        | SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        | FROM o),
        |p AS (
        | SELECT user_id, session_id,
        |  array_to_string(list(event_type ORDER BY ts_us, event_id)[1:3], '>') AS path
        | FROM s GROUP BY user_id, session_id)
        |SELECT path, COUNT(*) AS n_sessions
        |FROM p GROUP BY path
        |ORDER BY n_sessions DESC, path LIMIT 10""".stripMargin,

    // e25: last record per user via the window spelling, tombstones
    // filtered after the pick — delete semantics, not a type filter.
    "e25_tombstone_compaction" ->
      """WITH r AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |            event_type, value,
        |            ROW_NUMBER() OVER (PARTITION BY user_id
        |             ORDER BY ts DESC, event_id DESC) AS rn
        |           FROM events)
        |SELECT user_id, ts_us AS last_ts_us, event_id AS last_event_id,
        | event_type AS last_type, value AS last_value
        |FROM r WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,

    // e24: the same anchored user aggregate + flag concat; monetary
    // stays DECIMAL through both levels, avg from exact integers.
    "e24_rfm_segments" ->
      """WITH mx AS (SELECT MAX(epoch_us(ts)) AS mts FROM events),
        |u AS (SELECT user_id,
        |   (mx.mts - MAX(epoch_us(ts))) // 86400000000 AS recency_d,
        |   COUNT(*) AS freq,
        |   SUM(CAST(value AS DECIMAL(12,2))) AS monetary
        |  FROM events, mx GROUP BY user_id, mx.mts),
        |seg AS (SELECT
        |   (CASE WHEN recency_d <= 0 THEN 'R' ELSE 'r' END)
        |   || (CASE WHEN freq >= 66 THEN 'F' ELSE 'f' END)
        |   || (CASE WHEN monetary > 3300 THEN 'M' ELSE 'm' END) AS segment,
        |   freq, monetary
        |  FROM u)
        |SELECT segment, COUNT(*) AS n_users,
        | CAST(SUM(freq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_freq,
        | CAST(SUM(monetary) AS DOUBLE) AS total_monetary
        |FROM seg GROUP BY segment ORDER BY segment""".stripMargin,

    // e23: the same hourly reduce + trailing RANGE window; every
    // statistic derives from BIGINT-cast window sums and the z
    // expression sequence matches Spark's term for term.
    "e23_hourly_anomaly" ->
      """WITH h AS (SELECT event_type, epoch_us(ts)//3600000000 AS hour_idx,
        |  COUNT(*) AS n
        | FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, hour_idx, CAST(n AS BIGINT) AS n,
        |  CAST(COUNT(n) OVER win AS BIGINT) AS cnt24,
        |  CAST(SUM(n) OVER win AS BIGINT) AS sum24,
        |  CAST(SUM(n*n) OVER win AS BIGINT) AS sumsq24
        | FROM h WINDOW win AS (PARTITION BY event_type ORDER BY hour_idx
        |   RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT event_type, hour_idx, n,
        |  CAST(sum24 AS DOUBLE)/CAST(cnt24 AS DOUBLE) AS mean24,
        |  CASE WHEN CAST(cnt24*sumsq24 - sum24*sum24 AS DOUBLE) <= 0e0 THEN 0e0
        |   ELSE (CAST(n AS DOUBLE) - CAST(sum24 AS DOUBLE)/CAST(cnt24 AS DOUBLE))
        |        / sqrt(CAST(cnt24*sumsq24 - sum24*sum24 AS DOUBLE)
        |               / CAST(cnt24*cnt24 AS DOUBLE)) END AS z
        | FROM w WHERE cnt24 >= 12)
        |SELECT event_type, make_timestamp(hour_idx*3600000000) AS hour, n,
        | mean24, z, abs(z) > 2.0e0 AS is_anomaly
        |FROM z ORDER BY event_type, hour""".stripMargin,

    // e22: the same lag CTE; DuckDB's SUM(BIGINT) is HUGEINT, so n
    // casts back to BIGINT and the normalizer goes straight to DOUBLE.
    "e22_type_transitions" ->
      """WITH o AS (SELECT user_id, event_id, event_type,
        |  COALESCE(lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id),
        |           '_start') AS from_type
        | FROM events),
        |g AS (SELECT from_type, event_type AS to_type, COUNT(*) AS n
        |      FROM o GROUP BY 1, 2)
        |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
        | CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
        |FROM g ORDER BY from_type, to_type""".stripMargin,

    // e20: e02's session CTEs + the entry-label window + the same
    // two-level aggregation; DECIMAL until the final cast on both
    // engines, counts exact.
    "e20_session_entry_stats" ->
      """WITH o AS (
        | SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |       THEN 1 ELSE 0 END AS is_new
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        | SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        | FROM o),
        |l AS (
        | SELECT *, FIRST_VALUE(event_type) OVER (
        |   PARTITION BY user_id, session_id ORDER BY ts_us, event_id) AS entry_type
        | FROM s),
        |g AS (
        | SELECT user_id, session_id, entry_type, COUNT(*) AS n_events,
        |  SUM(CAST(value AS DECIMAL(12,2))) AS v
        | FROM l GROUP BY 1, 2, 3)
        |SELECT entry_type, COUNT(*) AS n_sessions,
        | CAST(SUM(n_events) AS BIGINT) AS n_events,
        | CAST(SUM(n_events) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_events,
        | CAST(SUM(v) AS DOUBLE) AS total_value
        |FROM g GROUP BY entry_type ORDER BY entry_type""".stripMargin,

    // e19: q24's window-form oracle per hour — the aggregate must
    // reproduce the ranked board exactly, rank for rank.
    "e19_hourly_top_users" ->
      """WITH h AS (SELECT
        |  make_timestamp((epoch_us(ts)//3600000000)*3600000000) AS hour,
        |  user_id, CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v
        | FROM events GROUP BY 1, 2),
        |r AS (SELECT hour, user_id, v,
        |       ROW_NUMBER() OVER (PARTITION BY hour ORDER BY v DESC, user_id) AS rn
        |      FROM h)
        |SELECT hour, CAST(rn AS BIGINT) AS rank, user_id, v AS total_value
        |FROM r WHERE rn <= 3 ORDER BY hour, rank""".stripMargin,

    // e05's oracle with the per-step upper bound inline.
    "e16_funnel_windowed" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
         |v AS (SELECT user_id, MIN(ts_us) AS t1 FROM e
         |      WHERE event_type = 'view' GROUP BY user_id),
         |c AS (SELECT e.user_id, MIN(e.ts_us) AS t2 FROM e
         |      JOIN v ON e.user_id = v.user_id
         |      WHERE e.event_type = 'click' AND e.ts_us > v.t1
         |       AND e.ts_us <= v.t1 + $DayUs
         |      GROUP BY e.user_id),
         |p AS (SELECT e.user_id, MIN(e.ts_us) AS t3 FROM e
         |      JOIN c ON e.user_id = c.user_id
         |      WHERE e.event_type = 'purchase' AND e.ts_us > c.t2
         |       AND e.ts_us <= c.t2 + $DayUs
         |      GROUP BY e.user_id)
         |SELECT (SELECT COUNT(*) FROM v) AS n_view,
         | (SELECT COUNT(*) FROM c) AS n_view_click,
         | (SELECT COUNT(*) FROM p) AS n_view_click_purchase,
         | CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
         |  / (SELECT COUNT(*) FROM v) AS conversion""".stripMargin,

    "e06_interval_join" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
         |           FROM events),
         |v AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type='view'),
         |c AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type='click')
         |SELECT v.event_id, v.user_id, v.ts_us,
         | c.event_id AS iv_event_id, c.ts_us AS iv_ts_us,
         | c.ts_us - v.ts_us AS gap_us
         |FROM v JOIN c ON v.user_id = c.user_id
         | AND c.ts_us > v.ts_us AND c.ts_us <= v.ts_us + $AttributionUs
         |ORDER BY v.event_id, iv_event_id""".stripMargin,

    // Identical winner to max_by((ts_us, event_id)): event_id is unique,
    // so the DESC row_number has no ties to break differently.
    "e07_last_state" ->
      """SELECT user_id, event_type, ts_us AS last_ts_us,
        | event_id AS last_event_id, value AS last_value
        |FROM (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value,
        |       ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |        ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    // The FULL-history compaction only (e07's oracle verbatim): the
    // incremental snapshot+tail path must hash-match it exactly.
    "e14_incremental_state" ->
      """SELECT user_id, event_type, ts_us AS last_ts_us,
        | event_id AS last_event_id, value AS last_value
        |FROM (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value,
        |       ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |        ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "e08_retention_cohorts" ->
      s"""WITH ud AS (SELECT DISTINCT user_id,
         |             epoch_us(ts) // $DayUs AS day FROM events),
         |c AS (SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY 1),
         |sz AS (SELECT cohort_day,
         |        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS cohort_size
         |       FROM c GROUP BY 1),
         |cell AS (SELECT c.cohort_day, ud.day - c.cohort_day AS day_offset,
         |          CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS n_active
         |         FROM ud JOIN c ON ud.user_id = c.user_id
         |         GROUP BY 1, 2)
         |SELECT cell.cohort_day, cell.day_offset, sz.cohort_size,
         | cell.n_active,
         | CAST(cell.n_active AS DOUBLE) / sz.cohort_size AS retention
         |FROM cell JOIN sz ON cell.cohort_day = sz.cohort_day
         |ORDER BY 1, 2""".stripMargin,

    "e09_scd2_intervals" ->
      """SELECT user_id, event_type, epoch_us(ts) AS valid_from, event_id, value,
        | LEAD(epoch_us(ts), 1) OVER (PARTITION BY user_id, event_type
        |  ORDER BY epoch_us(ts), event_id) AS valid_to,
        | LEAD(epoch_us(ts), 1) OVER (PARTITION BY user_id, event_type
        |  ORDER BY epoch_us(ts), event_id) IS NULL AS is_current
        |FROM events
        |ORDER BY user_id, event_type, valid_from, event_id""".stripMargin,

    "e03_type_stats" ->
      """SELECT event_type, COUNT(*) AS n,
        | CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        | CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
        | CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_value,
        | CAST(SUM(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
