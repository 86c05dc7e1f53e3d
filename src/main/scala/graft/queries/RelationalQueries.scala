package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational query surface over the TPC-H-ish test tables.
  *
  * The reference (see SURVEY.md §2.9) has no relational operators; this is
  * the §7.2-step-4 extension surface the duckdb oracle checks. Design rules
  * for oracle parity:
  *
  *   - Sums of double columns go through exact DECIMAL arithmetic and are
  *     cast to double only at the end. Double summation order differs
  *     across partitions/engines; decimal arithmetic is exact and
  *     associative, so Spark and DuckDB produce bit-identical doubles.
  *   - Per-row double arithmetic (projections) is IEEE-deterministic and
  *     needs no special handling.
  *   - Every query has a total deterministic ORDER BY (ties broken by key).
  *
  * Scale notes (100 TB): every query below is a declarative plan — filters
  * and projections push into the parquet scan, aggregates run
  * partial+final, small dimension tables (region/nation/supplier/customer
  * at TPC-H proportions) are broadcast, and top-k queries plan as
  * TakeOrderedAndProject (per-partition heap, no global sort).
  */
object RelationalQueries {

  /** double -> exact decimal with 2-digit scale (money-ish columns). */
  private def m(c: Column): Column = c.cast(DecimalType(12, 2))
  /** double -> exact decimal for small rates (discount / tax). */
  private def r(c: Column): Column = c.cast(DecimalType(4, 2))
  /** Exact decimal sum of a money column, surfaced as double. */
  private def msum(c: Column): Column = sum(m(c)).cast("double")

  // Mirrors of the helpers in DuckDB SQL text.
  private val M = "DECIMAL(12,2)"
  private val R = "DECIMAL(4,2)"
  private def msumSql(x: String) = s"CAST(SUM(CAST($x AS $M)) AS DOUBLE)"

  // q47 selection bucket width in cents: totalprice spans ~[900, 56k]
  // dollars, so ~$655 buckets keep the histogram ≈90 rows/group while
  // the densest bucket stays small enough to refine-sort.
  private val MadBucket = 65536L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1-style pricing summary: full-scan partial+final aggregation.
    "q01_pricing_summary" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(m(col("l_quantity"))).cast("double").as("sum_qty"),
          msum(col("l_extendedprice")).as("sum_base_price"),
          sum(m(col("l_extendedprice")) * (lit(1) - r(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          sum(m(col("l_extendedprice")) * (lit(1) - r(col("l_discount")))
            * (lit(1) + r(col("l_tax")))).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Filter + projection: predicate pushdown / column pruning showcase.
    // Per-row double arithmetic is deterministic — no decimal needed.
    "q02_filter_project" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-07-01").cast("timestamp") &&
          col("l_quantity") > lit(45.0))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("net_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // Q3-style shipping priority: 3-way join + agg + top-k.
    "q03_shipping_priority" -> { (s, d) =>
      val c = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      // No broadcast hints: orders/customer are fact-proportional tables, so
      // a forced broadcast OOMs at cluster scale. AQE picks broadcast when a
      // filtered side is genuinely small at runtime.
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(m(col("l_extendedprice")) * (lit(1) - r(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // Q4-style: EXISTS as a left-semi join.
    "q04_order_priority" -> { (s, d) =>
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      // Semi join dedups its build side itself — no .distinct() (that would
      // add a full shuffle+hash-agg over every lineitem key).
      val l = Tables.lineitem(s, d).select(col("l_orderkey"))
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },

    // Q5-style: 6-table star join, dims broadcast, one shuffle for the agg.
    "q05_local_supplier" -> { (s, d) =>
      val r5 = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      val sup = Tables.supplier(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, d)
      // Broadcast only the constant-cardinality dims (region=5, nation=25).
      // orders/supplier/customer all scale with SF; hinting them broadcast
      // would OOM at 100 TB — AQE decides those joins at runtime.
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(c, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r5), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(m(col("l_extendedprice")) * (lit(1) - r(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // Q6-style forecast: pure scan-filter-sum, fully pushed down.
    "q06_revenue_delta" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") >= lit(0.03) && col("l_discount") <= lit(0.07) &&
          col("l_quantity") < lit(24.0))
        .agg(sum(m(col("l_extendedprice")) * r(col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n"))
    },

    // Top-k without a global sort: plans as TakeOrderedAndProject.
    "q07_topk_orders" -> { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },

    // Window function: top-3 orders per customer by price.
    "q08_window_rank" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
          col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    },

    // Distinct aggregates (expand + two-phase agg).
    "q09_distinct_parts" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    },

    // ROLLUP grouping sets; NULL markers coalesced for oracle stability.
    "q10_rollup" -> { (s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(m(col("l_quantity"))).cast("double").as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("qty"))
        .orderBy(col("rf"), col("ls"))
    },

    // CUBE grouping sets (all 4 combinations in one expand+agg pass).
    "q19_cube" -> { (s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), msum(col("o_totalprice")).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          col("n"), col("total"))
        .orderBy(col("st"), col("prio"))
    },

    // Exact interpolated quantiles via a TWO-PASS rank-based plan.
    // Spark's `percentile` aggregate buffers every group value in one
    // aggregation buffer — at 100 TB a single o_orderstatus group holds
    // ~1e8 values in executor memory. Instead: row_number over
    // (group, value) — a disk-spillable external sort — then each
    // quantile is the sum of exactly two selected contributions,
    // mirroring DuckDB's quantile_cont interpolation literally
    // (RN = (n-1)·p, FRN = floor(RN): (CRN-RN)·v[FRN] + (RN-FRN)·v[CRN],
    // same IEEE ops → bit-identical doubles).
    "q20_quantiles" -> { (s, d) =>
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"))
      val ranked = Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w).cast("long"))
      // max(rn) == per-group count; the groupBy reuses the window's
      // hash partitioning, so no second exchange of the big table.
      val counts = ranked.groupBy(col("o_orderstatus"))
        .agg(max(col("rn")).as("n"))
      // Contribution of this row to quantile p: nonzero only at the two
      // bracketing ranks. d == 0 degenerates to 1.0·v[FRN] + 0.0·v[CRN]
      // (both multiplications exact), matching DuckDB's FRN==CRN branch.
      def contrib(p: Double): Column = {
        val h = (col("n") - 1).cast("double") * lit(p)
        val loRank = floor(h).cast("long") + 1
        when(col("rn") === loRank,
            (loRank.cast("double") - h) * col("o_totalprice"))
          .when(col("rn") === loRank + 1,
            (h - floor(h)) * col("o_totalprice"))
          .otherwise(lit(0.0))
      }
      ranked.join(broadcast(counts), "o_orderstatus")
        .groupBy(col("o_orderstatus"))
        .agg(max(col("n")).as("n"),
          sum(contrib(0.5)).as("p50"),
          sum(contrib(0.9)).as("p90"))
        .orderBy(col("o_orderstatus"))
    },

    // Set operations: customers active in both years / only first year.
    "q11_set_ops" -> { (s, d) =>
      val o = Tables.orders(s, d)
      def custsIn(year: Int) = o
        .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
          col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      val both = custsIn(1996).intersect(custsIn(1997))
        .withColumn("bucket", lit("both"))
      val only96 = custsIn(1996).except(custsIn(1997))
        .withColumn("bucket", lit("only_1996"))
      both.unionByName(only96)
        .orderBy(col("bucket"), col("o_custkey"))
    },

    // Conditional aggregation (Q12-style case/when inside agg).
    "q12_priority_mix" -> { (s, d) =>
      val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate"))
        .groupBy(col("o_orderstatus"))
        .agg(
          sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!isHigh, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy(col("o_orderstatus"))
    },

    // Q13-style distribution: left outer join preserving zero-order custs.
    "q13_order_dist" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val perCust = c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Scalar string/date expression surface.
    "q14_scalar_fns" -> { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 100)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("o_year"),
          month(col("o_orderdate")).cast("long").as("o_month"),
          dayofmonth(col("o_orderdate")).cast("long").as("o_day"),
          date_format(col("o_orderdate"), "yyyy-MM").as("o_ym"),
          upper(col("o_orderstatus")).as("status_u"),
          length(col("o_orderpriority")).cast("long").as("prio_len"),
          substring(col("o_orderpriority"), 1, 1).as("prio_code"),
          concat_ws("#", col("o_orderstatus"), col("o_orderpriority"))
            .as("status_prio"))
        .orderBy(col("o_orderkey"))
    },

    // GROUP BY ... HAVING.
    "q15_having" -> { (s, d) =>
      Tables.customer(s, d)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          msum(col("c_acctbal")).as("sum_bal"))
        .filter(col("n_cust") >= 3)
        .orderBy(col("c_nationkey"))
    },

    // Correlated-style aggregate filter: lines above the avg qty of their
    // part (Q17 flavor) — join against a pre-aggregated subquery.
    "q17_small_qty" -> { (s, d) =>
      val l = Tables.lineitem(s, d)
      val avgQ = l.groupBy(col("l_partkey").as("p_key"))
        .agg((sum(m(col("l_quantity"))).cast("double") / count(lit(1)))
          .as("avg_qty"))
      // avgQ is keyed by l_partkey — cardinality grows linearly with data,
      // so no broadcast hint: this is a co-partitioned shuffle join on the
      // part key (both sides hash on the same key; AQE handles skew).
      l.join(avgQ, col("l_partkey") === col("p_key"))
        .filter(col("l_quantity") < col("avg_qty") * 0.5)
        .agg((sum(m(col("l_extendedprice"))).cast("double") / lit(7.0))
          .as("avg_yearly"), count(lit(1)).as("n"))
    },

    // Q16-flavor: distinct suppliers per part brand/type bucket (the
    // part dimension joined to fact activity; co-partitioned shuffle
    // join on the part key, then distinct agg).
    "q16_brand_suppliers" -> { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_size").isin(1, 5, 9, 13))
        .join(Tables.lineitem(s, d), col("p_partkey") === col("l_partkey"))
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
    },

    // Anti join: customers with no urgent orders.
    "q18_no_urgent_orders" -> { (s, d) =>
      Tables.customer(s, d)
        .join(
          Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // The salted skew join under the oracle: salting is pure execution
    // strategy (spread a hot key over `buckets` tasks), so its output
    // must be EXACTLY the plain join's — which is what the oracle's
    // ordinary SQL join checks. Probe = lineitem (the skewed fact),
    // build = high-priority orders (the replicated side).
    "q21_salted_join" -> { (s, d) =>
      val build = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
      graft.operators.SkewJoin.saltedJoin(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_quantity")),
        build, key = "l_orderkey", buckets = 8)
        .orderBy(col("l_orderkey"), col("l_quantity"), col("o_totalprice"))
    },

    // KMV distinct-count sketch ([[graft.operators.Sketches.KmvDistinct]])
    // vs the exact count, per group. The sketch is the 100-TB cardinality
    // path: O(k) state per group through partial aggregation where exact
    // countDistinct expands every distinct value through the exchange.
    // KMV's state is a function of the input SET (not order/partitioning/
    // merge shape), so unlike HLL the estimate is oracle-reproducible:
    // DuckDB re-derives the k-th smallest md5-based hash and applies the
    // same (k−1)·2³²/h(k) estimator. The exact column doubles as the
    // sketch's accuracy witness in CORRECTNESS, not just a comparison.
    "q22_kmv_distinct" -> { (s, d) =>
      val kmv = udaf(new graft.operators.Sketches.KmvDistinct(KmvK),
        org.apache.spark.sql.Encoders.scalaLong)
      Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          graft.operators.Sketches.kmvInput(
            graft.text.TextFunctions.hash32(col("l_partkey").cast("string")))
            .as("h"),
          col("l_partkey"))
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_exact"),
          kmv(col("h")).as("est_distinct"))
        .orderBy(col("l_returnflag"))
    },

    // Mergeable rank sketch ([[graft.operators.Sketches.BottomKQuantile]])
    // vs q20's exact two-pass quantiles: ONE pass, O(k) state per group
    // through partial aggregation — the 100-TB percentile path when a
    // second pass over the data is too expensive. Like q22, the sketch
    // is chosen for oracle-reproducibility: its state (the k smallest
    // (hash, value) pairs, hash of the UNIQUE o_orderkey) is a function
    // of the input set, so DuckDB re-derives the identical sample with
    // a window rank and applies quantile_cont — whose interpolation
    // arithmetic q20 already proved bit-compatible with the finish()
    // formula. n_rows is the exact-count witness.
    "q23_bottomk_quantiles" -> { (s, d) =>
      val bq = udaf(
        new graft.operators.Sketches.BottomKQuantile(QuantK, Seq(0.5, 0.9)),
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[(java.lang.Long, java.lang.Double)]())
      Tables.orders(s, d)
        .select(col("o_orderstatus"),
          graft.text.TextFunctions.hash32(col("o_orderkey").cast("string"))
            .as("h"),
          col("o_totalprice"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"), bq(col("h"), col("o_totalprice")).as("q"))
        .select(col("o_orderstatus"), col("n_rows"),
          element_at(col("q"), 1).as("p50_est"),
          element_at(col("q"), 2).as("p90_est"))
        .orderBy(col("o_orderstatus"))
    },

    // One-pass data-quality profile of the fact table's measure columns
    // — the validation step every ingest pipeline runs before training
    // jobs trust a drop: per column, row/null/distinct counts and
    // min/max/sum. ONE scan computes all four columns' stats (the
    // distinct counts share a single expand+aggregate pair); the wide
    // result row unpivots to one row per column via stack(). Sums go
    // through DECIMAL per the module rule.
    "q25_table_profile" -> { (s, d) =>
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nn"),
          countDistinct(col(c)).as(s"${c}_nd"),
          min(col(c)).cast("double").as(s"${c}_min"),
          max(col(c)).cast("double").as(s"${c}_max"),
          msum(col(c)).as(s"${c}_sum"))
      }
      val stackExpr = cols.map(c =>
        s"'$c', ${c}_nn, ${c}_nd, ${c}_min, ${c}_max, ${c}_sum")
        .mkString(s"stack(${cols.length}, ", ", ", ")")
      Tables.lineitem(s, d)
        .agg(aggs.head, aggs.tail: _*)
        .select(col("n_rows"), expr(
          s"$stackExpr AS (column_name, n_null, n_distinct, min_v, max_v, sum_v)"))
        .select(col("column_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_v"), col("max_v"), col("sum_v"))
        .orderBy(col("column_name"))
    },

    // q25's serving shape at 100 TB: the same one-pass profile with the
    // KMV sketch in place of exact countDistinct — q25's 4 distinct
    // columns share one Expand that multiplies every scan row 5× into
    // the first aggregate, while the sketch keeps the plan a plain
    // partial+final agg with O(k) state per column (no Expand — pinned
    // by PlanSpec). Values are quantized to cents BEFORE hashing
    // (floor(x·100 + 0.5) — round-half-up, the v10 rule): the measure
    // columns are 2-decimal by domain so the mapping is injective, and
    // hashing an exact BIGINT sidesteps cross-engine double→string
    // formatting, which is NOT portable. est exact below k (3 of the 4
    // columns here), ~6% RSE above it (l_extendedprice).
    "q26_profile_sketch" -> { (s, d) =>
      val kmv = udaf(new graft.operators.Sketches.KmvDistinct(KmvK),
        org.apache.spark.sql.Encoders.scalaLong)
      def centsHash(c: String) = graft.operators.Sketches.kmvInput(
        graft.text.TextFunctions.hash32(
          floor(col(c) * lit(100.0) + lit(0.5)).cast("long").cast("string")))
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nn"),
          kmv(centsHash(c)).as(s"${c}_nd"),
          min(col(c)).cast("double").as(s"${c}_min"),
          max(col(c)).cast("double").as(s"${c}_max"),
          msum(col(c)).as(s"${c}_sum"))
      }
      val stackExpr = cols.map(c =>
        s"'$c', ${c}_nn, ${c}_nd, ${c}_min, ${c}_max, ${c}_sum")
        .mkString(s"stack(${cols.length}, ", ", ", ")")
      Tables.lineitem(s, d)
        .agg(aggs.head, aggs.tail: _*)
        .select(col("n_rows"), expr(s"$stackExpr AS " +
          "(column_name, n_null, n_distinct_est, min_v, max_v, sum_v)"))
        .select(col("column_name"), col("n_rows"), col("n_null"),
          col("n_distinct_est"), col("min_v"), col("max_v"), col("sum_v"))
        .orderBy(col("column_name"))
    },

    // The sketch-SHARDING contract under the oracle: per-group KMV
    // STATES materialized as storable columns ([[Sketches.KmvState]]),
    // then folded to a global estimate ([[Sketches.KmvMerge]]) — the
    // incremental pattern where each ingested shard persists one
    // state row and later jobs estimate over any shard union WITHOUT
    // rescanning data. est_merged must equal est_direct (the one-pass
    // global sketch) because KMV's state is a set function: the oracle
    // computes the global bottom-k ONCE and expects both columns to be
    // that value, so a merge-path bug on either side hash-mismatches.
    "q27_kmv_mergeable" -> { (s, d) =>
      val st = udaf(new graft.operators.Sketches.KmvState(KmvK),
        org.apache.spark.sql.Encoders.scalaLong)
      val mg = udaf(new graft.operators.Sketches.KmvMerge(KmvK),
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[Seq[java.lang.Long]]())
      val kmv = udaf(new graft.operators.Sketches.KmvDistinct(KmvK),
        org.apache.spark.sql.Encoders.scalaLong)
      val hashed = Tables.lineitem(s, d).select(col("l_returnflag"),
        graft.operators.Sketches.kmvInput(
          graft.text.TextFunctions.hash32(col("l_partkey").cast("string")))
          .as("h"))
      val states = hashed.groupBy(col("l_returnflag")).agg(st(col("h")).as("state"))
      states
        .agg(count(lit(1)).as("n_shards"), mg(col("state")).as("est_merged"))
        .crossJoin(hashed.agg(kmv(col("h")).as("est_direct")))
    },

    // q27's sharding contract applied to the WHOLE q26 profile — the
    // statistics-catalog maintenance shape at 100 TB: each ingest
    // batch computes one partial-profile row (counts, null counts,
    // exact DECIMAL sums, min/max, one KMV state per column) and the
    // catalog folds shard rows WITHOUT rescanning data — counts and
    // decimal sums add, min/max fold, states merge via KmvMerge. The
    // oracle computes the DIRECT global profile once; hash-equality
    // proves merge-path == direct-path for every statistic (the
    // decimal sums stay decimal until the final fold, so re-summing
    // loses nothing). Shards here are l_orderkey mod 4 — four
    // simulated ingest batches.
    "q36_profile_merge" -> { (s, d) =>
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      graft.operators.TableProfile.fold(
        graft.operators.TableProfile.partialBy(
          Tables.lineitem(s, d), pmod(col("l_orderkey"), lit(4)),
          cols, KmvK),
        cols, KmvK)
    },

    // Z-order clustering key + the box query it serves
    // ([[graft.operators.ZOrder]]): the Morton key interleaves
    // (l_partkey, l_suppkey) bits so one sort order makes parquet
    // row-group stats tight on BOTH columns — the multi-dimensional
    // scan-pruning layout behind Delta/Iceberg ZORDER. The key is pure
    // codegen'd bit arithmetic (no UDF) and the oracle recomputes it
    // bit-for-bit in SQL, so the clustering key a 100-TB table would
    // be laid out by is itself hash-checked; the decoded-row pruning
    // win of the on-disk layout is pinned by ZOrderSpec against a
    // hash-scattered copy of the same rows.
    "q28_zorder_box" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"))
        .withColumn("zkey",
          graft.operators.ZOrder.zkey(col("l_partkey"), col("l_suppkey")))
        // bounds inside every SF's key domain (sf0.001 tops out at
        // partkey 199 / suppkey 9), so the row is non-empty at all scales
        .filter(col("l_partkey").between(20, 130) &&
          col("l_suppkey").between(2, 7))
        .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))
    },

    // Fixed-point deterministic PageRank over the part co-purchase
    // graph ([[graft.operators.GraphRank]]): edges are distinct
    // same-order part pairs (bounded per order by lines², never
    // all-pairs over the catalog), three exact-integer iterations, so
    // an ITERATIVE graph computation — the class d19's connected
    // components opened — is hash-checked end to end: the oracle
    // unrolls all three rounds declaratively and every redistribution
    // is BIGINT floor division on both engines.
    "q29_copurchase_rank" -> { (s, d) =>
      // Edge build (r22, guide §2.3/§2.4): the lineitem SELF-JOIN on
      // l_orderkey scanned lineitem twice and shuffled/broadcast-built
      // a full copy before the pair distinct; one groupBy(l_orderkey)
      // collect_set + a row-local pair explosion produces the SAME
      // distinct pair set (all ordered pairs of distinct parts
      // co-occurring in an order — per-order sets are line-count
      // bounded, never catalog-scale) from ONE scan and one exchange.
      // Interleaved A/B at sf0.1: edge stage 0.63, full query 0.72;
      // pair-set equality checked by construction and by the oracle.
      val edges = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_partkey")).as("ps"))
        .select(explode(expr(
          "flatten(transform(ps, a -> " +
            "transform(filter(ps, b -> b != a), b -> struct(a, b))))"))
          .as("p"))
        .select(col("p.a").as("src"), col("p.b").as("dst"))
        .distinct()
      graft.operators.GraphRank.pageRank(edges, "src", "dst", iters = 3,
          assumeDistinct = true)
        .select(col("node").as("l_partkey"), col("rank"))
        .orderBy(col("rank").desc, col("l_partkey"))
    },

    // PERSONALIZED PageRank over the same co-purchase graph: teleport
    // mass restricted to one brand's parts, so rank measures
    // authority as seen from that brand's neighborhood — "what sells
    // WITH Brand#1" rather than "what sells" (topic-sensitive
    // PageRank; the corpus-curation use is source authority seeded by
    // a trusted list). Parts the seeds never reach stay at exactly 0
    // — meaningful output, not noise. Same exact-integer iterations,
    // same persisted/checkpointed loop, one extra long column of
    // seed indicators riding the node frame; the oracle unrolls all
    // three rounds with the seed CASE inline.
    "q35_personalized_rank" -> { (s, d) =>
      // Same one-scan edge build as q29 (r22) — the self-join shape it
      // replaces is documented there.
      val edges = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_partkey")).as("ps"))
        .select(explode(expr(
          "flatten(transform(ps, a -> " +
            "transform(filter(ps, b -> b != a), b -> struct(a, b))))"))
          .as("p"))
        .select(col("p.a").as("src"), col("p.b").as("dst"))
        .distinct()
      val seeds = Tables.part(s, d)
        .filter(col("p_brand") === "Brand#1")
        .select(col("p_partkey").as("node"))
      graft.operators.GraphRank.pageRank(edges, "src", "dst", iters = 3,
          assumeDistinct = true, teleport = Some(seeds))
        .select(col("node").as("l_partkey"), col("rank"))
        .orderBy(col("rank").desc, col("l_partkey"))
    },

    // Pivot — wide-form reshaping with EXPLICIT pivot values, so the
    // output schema is static (no pre-pass distinct scan over the pivot
    // column, the two-job trap of values-less pivot) and Catalyst plans
    // ONE partial+final aggregate keyed by l_linestatus with the
    // per-flag cells as conditional aggregates. Empty cells are
    // coalesced to 0 on both engines (Spark's PivotFirst yields null,
    // DuckDB's COUNT FILTER yields 0 — parity demands the coalesce).
    // Each pivot aggregate must be a BARE AggregateExpression (the
    // analyzer rejects wrappers like Cast around multi-agg pivot
    // cells), so the decimal sum stays exact inside the pivot and the
    // double surface cast happens in the post-select.
    "q30_pivot" -> { (s, d) =>
      val flags = Seq("A", "N", "R")
      val p = Tables.lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", flags)
        .agg(count(lit(1)).as("n"), sum(m(col("l_quantity"))).as("qty"))
      p.select(col("l_linestatus") +: flags.flatMap(v => Seq(
          coalesce(col(s"${v}_n"), lit(0L)).as(s"${v}_n"),
          coalesce(col(s"${v}_qty").cast("double"), lit(0.0)).as(s"${v}_qty"))): _*)
        .orderBy(col("l_linestatus"))
    },

    // Values-less pivot — the DYNAMIC-schema path q30 deliberately
    // avoids: with no explicit value list, Spark runs a pre-pass
    // distinct job over the pivot column (capped by
    // spark.sql.pivotMaxValues) and derives the output columns from
    // the DATA. Two jobs instead of one is the documented price; the
    // right call when the category set is not known at authoring time
    // and small (here: the 5 order priorities). The presentation
    // select is derived from the pivoted schema, not a hardcoded
    // list — the dynamic path end to end. The oracle can enumerate the
    // cells because the driver's generator draws from a fixed
    // priority vocabulary at every sf.
    "q31_pivot_dynamic" -> { (s, d) =>
      val p = Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum(m(col("o_totalprice"))).as("total"))
      val cells = p.columns.filter(_ != "o_orderstatus").sorted.toSeq.map { c =>
        if (c.endsWith("_n")) coalesce(col(s"`$c`"), lit(0L)).as(c)
        else coalesce(col(s"`$c`").cast("double"), lit(0.0)).as(c)
      }
      p.select(col("o_orderstatus") +: cells: _*)
        .orderBy(col("o_orderstatus"))
    },

    // GROUPING SETS proper — aggregation lattices rollup (q10) and
    // cube (q19) cannot spell: exactly {(l_returnflag),
    // (l_linestatus), ()} — the two one-dimension margins plus the
    // grand total, WITHOUT the (rf, ls) pair cube would force. Plans
    // as the same single Expand + partial/final aggregate as
    // rollup/cube (one scan, rows multiplied only 3× instead of 4×),
    // so the lattice choice is purely declarative.
    "q32_grouping_sets" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(m(col("l_quantity"))).cast("double").as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("qty"))
        .orderBy(col("rf"), col("ls"))
    },

    // Unpivot/melt — the inverse reshaping of q30/q31: four wide
    // measure columns become (measure, value) long rows. Spark's
    // native unpivot is a row-local Expand (4 output rows per scan
    // row, no shuffle, no UNION-ALL re-scan of the table — the naive
    // spelling reads the parquet once per measure); the aggregate
    // downstream is the usual partial+final pair. The melt itself is
    // what's exercised; the per-measure totals keep the oracle row
    // count fixed while hash-checking every melted cell.
    "q33_unpivot" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "value")
        .groupBy(col("measure"))
        .agg(count(lit(1)).as("n"), msum(col("value")).as("total"))
        .orderBy(col("measure"))
    },

    // Second-moment statistics (variance / covariance / correlation)
    // the PARITY-SAFE way: Spark's corr/stddev/covar_samp accumulate
    // doubles in partition order — merge-order-dependent, so never
    // hash-checkable and subtly nondeterministic under AQE / retries
    // even in production. Here the five raw moments (Σx, Σy, Σx²,
    // Σy², Σxy) are EXACT decimal sums (one partial+final aggregate,
    // same cost shape as q01) and the statistics derive from them in
    // double with the identical expression sequence on both engines —
    // deterministic under any partitioning, at any scale, because the
    // only order-sensitive step was made exact. The same five-moment
    // frame also serves mean/stddev/z-score normalization downstream
    // (one scan, reusable).
    "q34_moments_profile" -> { (s, d) =>
      val x = m(col("l_quantity"))
      val y = m(col("l_extendedprice"))
      val a = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(x).as("sx"), sum(y).as("sy"),
          sum(x * x).as("sxx"), sum(y * y).as("syy"),
          sum(x * y).as("sxy"))
      val nD = col("n").cast("double")
      def dbl(c: String) = col(c).cast("double")
      // One rounding caveat survives the exact sums: a scaled decimal
      // past 2^53 (Σ price² here) converts to double with engine-
      // dependent last-ulp rounding (one correctly-rounded conversion
      // from the rational vs convert-the-integer-then-divide). The
      // derived statistics therefore present ROUNDED to 9 digits —
      // 1e-9 is ~1e8 ulps wide for corr ∈ [-1,1], so a last-ulp input
      // wobble cannot move the rounded value.
      def r9(c: Column) = round(c, 9)
      a.select(col("l_returnflag"), col("n"),
          r9(dbl("sx") / nD).as("mean_qty"),
          r9(dbl("sy") / nD).as("mean_price"),
          r9((dbl("sxy") - dbl("sx") * dbl("sy") / nD) / (nD - 1))
            .as("covar_qty_price"),
          r9((nD * dbl("sxy") - dbl("sx") * dbl("sy"))
            / (sqrt(nD * dbl("sxx") - dbl("sx") * dbl("sx"))
              * sqrt(nD * dbl("syy") - dbl("sy") * dbl("sy"))))
            .as("corr_qty_price"),
          r9(sqrt((dbl("sxx") - dbl("sx") * dbl("sx") / nD) / (nD - 1)))
            .as("stddev_qty"))
        .orderBy(col("l_returnflag"))
    },

    // Equi-width histogram — the optimizer-statistics face q25/q26
    // don't cover: 16 buckets over the price domain with counts and
    // mass shares, the input to selectivity estimation and skew
    // diagnosis. Two passes by necessity (the domain is data-derived):
    // a 1-row min/max/count aggregate broadcasts (d47's threshold
    // pattern), then bucketing is row-local arithmetic inside the
    // scan and ONE bucket-keyed aggregate. The bucket expression is
    // the identical double sequence on both engines; the top edge
    // folds into the last bucket via least(), and a degenerate
    // single-valued domain (hi = lo, 0/0 → NaN, whose long-cast
    // diverges between engines) collapses to bucket 0 explicitly.
    "q37_histogram" -> { (s, d) =>
      val B = 16
      val bounds = Tables.lineitem(s, d).agg(
        min(col("l_extendedprice")).cast("double").as("lo"),
        max(col("l_extendedprice")).cast("double").as("hi"),
        count(lit(1)).as("cnt"))
      Tables.lineitem(s, d).crossJoin(broadcast(bounds))
        .select(when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(lit((B - 1).toLong),
            floor((col("l_extendedprice") - col("lo")) * lit(B.toDouble)
              / (col("hi") - col("lo"))).cast("long"))).as("bucket"),
          col("cnt"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          (count(lit(1)).cast("double") / max(col("cnt"))).as("share"))
        .orderBy(col("bucket"))
    },

    // Full CORRELATION MATRIX over the four lineitem measures in ONE
    // scan — q34's parity-safe machinery widened to all 6 pairs: a
    // single partial+final aggregate carries n + 4 exact DECIMAL sums
    // + 4 squares + 6 cross-products (15 states), then each pair's
    // Pearson r derives in q34's fixed double sequence and presents
    // rounded to 9 digits (same last-ulp argument). The melt to 6
    // rows is a stack over the single aggregate row — free. This is
    // the feature-selection / multicollinearity profile; Spark's own
    // corr() would be merge-order-dependent and never hash-checkable.
    // BUCKETIZED PRICE-BAND SELF-JOIN — the non-equi join class
    // (|price_a − price_b| ≤ band, same priority) executed the way a
    // cluster must: NOT as a nested-loop over the theta predicate but
    // as an EQUI join on (priority, price-bucket), with the probe side
    // exploded to its 3 adjacent buckets — a pair within the band
    // always lands within one bucket of width = band, so bucket
    // adjacency is a complete candidate generator (no recall loss) and
    // the band predicate filters exactly inside the join. Cost model:
    // 3× probe duplication + one keyed exchange, vs the O(n²/priority)
    // BNLJ Spark would otherwise pick for a pure theta join; a hot
    // price point degenerates that bucket toward quadratic — the e06
    // maxBucket/df-cap family lever if it ever matters. Prices go
    // through DECIMAL(12,2)→cents BIGINT so the band arithmetic is
    // exact on both engines. Output: each order with at least one
    // same-priority near-price neighbor, its neighbor count and the
    // nearest gap — duplicate-pricing / price-collision audit shape.
    "q44_price_band" -> { (s, d) =>
      val W = 1000L // band = $10.00 in cents; also the bucket width
      val o = Tables.orders(s, d).select(
        col("o_orderkey").as("k"), col("o_orderpriority").as("pr"),
        (col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long").as("c"))
      val probe = o.select(col("k"), col("pr"), col("c"),
        explode(array(expr(s"c div $W") - 1, expr(s"c div $W"),
          expr(s"c div $W") + 1)).as("bucket"))
      val build = o.select(col("k").as("k2"), col("pr"), col("c").as("c2"),
        expr(s"c div $W").as("bucket"))
      probe.join(build, Seq("pr", "bucket"))
        .filter(col("k") =!= col("k2") && abs(col("c") - col("c2")) <= W)
        .groupBy(col("k"), col("pr"))
        .agg(count(lit(1)).as("n_neighbors"),
          min(abs(col("c") - col("c2"))).as("min_gap_cents"))
        .select(col("k").as("o_orderkey"), col("pr").as("o_orderpriority"),
          col("n_neighbors"), col("min_gap_cents"))
        .orderBy(col("o_orderkey"))
    },

    // DISTRIBUTED 2-D SKYLINE (Pareto frontier: minimize price AND
    // order date) — the preference-query operator, built on e37's
    // associative-prefix algebra instead of the single global sort
    // every textbook skyline pass assumes: bucket by price range
    // (price div W — deterministic, and the RESULT is provably
    // independent of W), compute in-bucket strict-smaller-price
    // running MINs with bucket-keyed windows (bounded partitions),
    // then chain a carry MIN over the ~50-row bucket summary frame
    // (e34's small-frame license) and broadcast it back. A row
    // survives iff its date equals its price group's min AND beats
    // both the in-bucket and carried cross-bucket minima strictly —
    // exactly the NOT EXISTS dominance definition, which the oracle
    // states via the independent one-window formulation. Ties:
    // identical (price, date) points do not dominate each other, so
    // duplicates co-survive. Cents via DECIMAL for exactness.
    "q45_skyline" -> { (s, d) =>
      val W = 1000000L // $10k price buckets
      val o = Tables.orders(s, d).select(
        col("o_orderkey").as("k"),
        (col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long").as("c"),
        // NTZ → session-UTC timestamp, then exact epoch-day (the
        // Tables.events convention)
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("day"))
      val b = o.withColumn("bucket", expr(s"c div $W"))
      val wSm = Window.partitionBy(col("bucket")).orderBy(col("c"))
        .rangeBetween(Window.unboundedPreceding, -1)
      val wSame = Window.partitionBy(col("bucket"), col("c"))
      val scored = b
        .withColumn("m_sm_local", min(col("day")).over(wSm))
        .withColumn("m_same", min(col("day")).over(wSame))
      val wc = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val carry = o.groupBy(expr(s"c div $W").as("bucket"))
        .agg(min(col("day")).as("bmin"))
        .withColumn("carry", min(col("bmin")).over(wc))
        .select(col("bucket"), col("carry"))
      scored.join(broadcast(carry), Seq("bucket"))
        .filter(col("day") === col("m_same") &&
          (col("m_sm_local").isNull || col("day") < col("m_sm_local")) &&
          (col("carry").isNull || col("day") < col("carry")))
        .select(col("k").as("o_orderkey"), col("c").as("price_cents"),
          col("day").as("order_day"))
        .orderBy(col("price_cents"), col("o_orderkey"))
    },

    // LORENZ CURVE + GINI over customer revenue — the concentration
    // profile ("what share of revenue do the bottom k deciles hold")
    // that needs EXACT global ranks, i.e. the textbook
    // `row_number() OVER (ORDER BY revenue)` whose no-PARTITION window
    // is the banished move-everything-to-one-task shape. Ranks come
    // from [[graft.operators.Ranks.globalRowNumber]] instead: range
    // repartition + per-partition counts (one long per partition on
    // the driver) + broadcast prefix offsets. Everything is exact
    // integer arithmetic: revenue in cents, cumulative shares and the
    // Gini coefficient as micro-ratios, the Gini numerator
    // 2·Σrk·cents − (n+1)·tot (nonnegative for ascending ranks by
    // Chebyshev's sum inequality) widened to DECIMAL(38,0) before the
    // ×1e6 so it cannot overflow a long at large SF. The only Window
    // is the 10-row decile cumulative (e34's small-frame license);
    // the totals frame is one broadcast row.
    "q46_lorenz_gini" -> { (s, d) =>
      val rev = Tables.orders(s, d)
        .select(col("o_custkey"),
          (col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long").as("cents"))
        .groupBy(col("o_custkey")).agg(sum(col("cents")).as("cents"))
      val ranked = graft.operators.Ranks.globalRowNumber(
        rev, Seq(col("cents"), col("o_custkey")), "rk")
      val tot = ranked.agg(
        count(lit(1)).as("n"),
        sum(col("cents")).as("tot"),
        sum(col("rk") * col("cents")).as("w"))
      val dec = ranked.crossJoin(broadcast(tot))
        .groupBy(expr("((rk - 1) * 10) div n").as("decile"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("cents")).as("rev_cents"))
      val wc = Window.orderBy(col("decile"))
      dec.withColumn("cum", sum(col("rev_cents")).over(wc))
        .crossJoin(broadcast(tot))
        .select(col("decile"), col("n_cust"), col("rev_cents"),
          expr("(CAST(cum AS DECIMAL(38,0)) * 1000000) div tot")
            .as("cum_share_micro"),
          expr("""((CAST(2 AS DECIMAL(38,0)) * w
                   - CAST(n + 1 AS DECIMAL(38,0)) * tot) * 1000000)
                  div (CAST(n AS DECIMAL(38,0)) * tot)""")
            .as("gini_micro"))
        .orderBy(col("decile"))
    },

    // EXACT INTERDECILE (TRIMMED) MEAN — the robust center estimate a
    // pricing team trusts over the raw mean (one fat-finger order
    // moves a mean; it cannot move a decile cut): per priority, the
    // exact P10/P90 cut VALUES come from two
    // [[graft.operators.Ranks.groupedKthSmallest]] selections (rank
    // ⌈n/10⌉ and ⌈9n/10⌉ — never a per-group sort), and the mean of
    // the in-range rows is exact integer micro arithmetic over one
    // more pruned scan against the broadcast 5-row cut frame.
    // Trimming by VALUE RANGE (all rows within [p10, p90], ties
    // included) rather than by row count keeps the definition total
    // and engine-independent under duplicate prices.
    "q49_trimmed_mean" -> { (s, d) =>
      import graft.operators.{LineageCheckpoint, Ranks}
      def pin(df: DataFrame) = new LineageCheckpoint(s, None)(df)
      val o = Tables.orders(s, d).select(
        col("o_orderpriority").as("pr"),
        (col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long").as("c"))
      val n = pin(o.groupBy(col("pr")).agg(count(lit(1)).as("n")))
      val kLo = n.select(col("pr"), col("n"), expr("(n + 9) div 10").as("k"))
      val kHi = n.select(col("pr"), col("n"),
        expr("(9 * n + 9) div 10").as("k"))
      val lo = pin(Ranks.groupedKthSmallest(o, "pr", "c", kLo, MadBucket)
        .select(col("pr"), col("kth").as("lo")))
      val hi = pin(Ranks.groupedKthSmallest(o, "pr", "c", kHi, MadBucket)
        .select(col("pr"), col("kth").as("hi")))
      o.join(broadcast(lo), Seq("pr")).join(broadcast(hi), Seq("pr"))
        .groupBy(col("pr"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("c") >= col("lo") && col("c") <= col("hi"), 1L)
            .otherwise(0L)).as("n_kept"),
          sum(when(col("c") >= col("lo") && col("c") <= col("hi"),
            col("c")).otherwise(0L)).cast("decimal(38,0)").as("kept_sum"),
          max(col("lo")).as("p10_cents"), max(col("hi")).as("p90_cents"))
        .select(col("pr").as("o_orderpriority"), col("n_total"),
          col("n_kept"), col("p10_cents"), col("p90_cents"),
          expr("CAST((kept_sum * 1000000) DIV n_kept AS BIGINT)")
            .as("trimmed_mean_micro_cents"))
        .orderBy(col("o_orderpriority"))
    },

    // PER-NODE TRIANGLE COUNTS + LOCAL CLUSTERING COEFFICIENT over
    // the weight-≥2 co-purchase graph (q40's edge list) via
    // [[graft.operators.GraphRank.triangleCounts]] — d78 computes the
    // GLOBAL transitivity of the dedup candidate graph with this
    // orientation inlined; q50 promotes it to a reusable operator and
    // emits the per-node face (which node's neighborhood is
    // clique-like — the recommender/community-cohesion signal the
    // global ratio can't localize). DEGREE-ORDERED
    // wedge counting (Suri & Vassilvitskii WWW'11): edges orient from
    // the (degree, id)-smaller endpoint, wedges come only from
    // oriented out-neighbor pairs, and each triangle closes exactly
    // once at its smallest corner. The orientation is the 100-TB
    // claim: naive node-iteration puts C(d,2) wedges on a degree-d
    // hub's key (the "last reducer"), while oriented out-degrees are
    // O(√m) on ANY graph — wedge volume ≤ m^{3/2} with no quadratic
    // key. All stages are node- or pair-keyed joins/aggregates; no
    // window, nothing driver-side. lcc_micro = 2·T·1e6 div
    // (deg·(deg−1)) in exact integers; the oracle replays the
    // orientation with an explicit (deg, id) lexicographic compare.
    "q50_triangle_lcc" -> { (s, d) =>
      // One-scan weighted edge build (r22) — see q40 for the multiset
      // equality argument (collect_list keeps per-order multiplicity,
      // so w matches the self-join's row count exactly).
      val edges = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(collect_list(col("l_partkey")).as("ps"))
        .select(explode(expr(
          "flatten(transform(ps, a -> " +
            "transform(filter(ps, b -> b != a), b -> struct(a, b))))"))
          .as("p"))
        .groupBy(col("p.a").as("src"), col("p.b").as("dst"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
        .select(col("src"), col("dst"))
      graft.operators.GraphRank.triangleCounts(edges, "src", "dst")
        .withColumn("lcc_micro",
          expr("triangles * 2000000 div (degree * (degree - 1))"))
        .orderBy(col("triangles").desc, col("node"))
    },

    // EXACT PERCENTILE BANDS in ONE selection pass — q49's two cuts
    // generalized: P10/P25/P50/P75/P90 of order value per priority
    // via [[graft.operators.Ranks.groupedKthSmallestMulti]], which
    // answers ALL five ranks from one histogram walk + one refine
    // rescan (five groupedKthSmallest calls would pay 10 scans; at
    // 100 TB the scan count IS the cost). Ranks are exact integer
    // formulas (ceil(p·n) spelled div-style, the q49 idiom); windows
    // run only over the catalog-sized histogram and the bucket-bounded
    // refine partitions; the target frame is group×5 rows, broadcast.
    // The oracle picks the same five ranks from one ranked window.
    "q51_percentile_bands" -> { (s, d) =>
      import graft.operators.{LineageCheckpoint, Ranks}
      val o = Tables.orders(s, d).select(
        col("o_orderpriority").as("pr"),
        (col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long").as("c"))
      val n = new LineageCheckpoint(s, None)(
        o.groupBy(col("pr")).agg(count(lit(1)).as("n")))
      val ks = n.select(col("pr"), explode(array(
          struct(lit(10L).as("pct"), expr("(n + 9) div 10").as("k")),
          struct(lit(25L).as("pct"), expr("(n + 3) div 4").as("k")),
          struct(lit(50L).as("pct"), expr("(n + 1) div 2").as("k")),
          struct(lit(75L).as("pct"), expr("(3 * n + 3) div 4").as("k")),
          struct(lit(90L).as("pct"), expr("(9 * n + 9) div 10").as("k"))))
          .as("t"))
        .select(col("pr"), col("t.pct").as("pct"), col("t.k").as("k"))
      Ranks.groupedKthSmallestMulti(o, "pr", "c", ks, MadBucket)
        .join(broadcast(ks), Seq("pr", "k"))
        .select(col("pr").as("o_orderpriority"), col("pct"),
          col("kth").as("band_cents"))
        .orderBy(col("o_orderpriority"), col("pct"))
    },

    // QUANTITY-WEIGHTED MEDIAN PRICE — the "typical price per unit
    // SOLD" statistic (a plain median over rows answers a different
    // question: typical price per ORDER LINE), exact and distributed
    // via [[graft.operators.Ranks.groupedWeightedMedian]]: the weight
    // histogram and its running sum walk to the half-mass bucket, one
    // bucket-bounded refine picks the crossing value — the q47
    // selection shape with integer weight mass in place of row counts,
    // so no per-group sort of data-scale rows exists anywhere. Exact
    // cents, exact integer weights.
    "q48_weighted_median" -> { (s, d) =>
      import graft.operators.Ranks
      val li = Tables.lineitem(s, d).select(
        col("l_returnflag").as("rf"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100)
          .cast("long").as("c"),
        col("l_quantity").cast("long").as("w"))
      Ranks.groupedWeightedMedian(li, "rf", "c", "w", MadBucket)
        .select(col("rf").as("l_returnflag"),
          col("w_total").as("qty_total"),
          col("wmedian").as("wmedian_cents"))
        .orderBy(col("l_returnflag"))
    },

    // ROBUST OUTLIER PROFILE VIA EXACT MAD — median absolute deviation
    // is the robust-statistics spread measure (unlike stddev, one
    // fat-finger price can't move it), and computing it EXACTLY at
    // scale is a selection problem, not a sort problem:
    // [[graft.operators.Ranks.groupedKthSmallest]] finds each group's
    // low median in two passes (bucket histogram + one-bucket refine —
    // the only windows run over the HISTOGRAM and over one bucket's
    // rows, never over the data-scale frame a per-group sort window
    // would buffer), then the same primitive selects the median of
    // |x − median|. The final outlier count (> 3 MAD, the standard
    // robust z-gate) is one more scan against the broadcast 5-row
    // (median, mad) frame. Prices as exact cents; every output column
    // an integer.
    "q47_mad_outliers" -> { (s, d) =>
      import graft.operators.{LineageCheckpoint, Ranks}
      // The ks/median/mad frames are GROUP-sized (5 rows) but their
      // subtrees each embed corpus scans — checkpoint them so every
      // downstream reference reads 5 materialized rows instead of
      // re-running a selection pass (13 scans collapse to the honest 6).
      def pin(df: DataFrame) = new LineageCheckpoint(s, None)(df)
      val o = Tables.orders(s, d).select(
        col("o_orderpriority").as("pr"),
        (col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long").as("c"))
      val ks = pin(o.groupBy(col("pr")).agg(count(lit(1)).as("n"))
        .select(col("pr"), col("n"), expr("(n + 1) div 2").as("k")))
      val med = pin(Ranks.groupedKthSmallest(o, "pr", "c", ks, MadBucket)
        .select(col("pr"), col("kth").as("med")))
      val dev = o.join(broadcast(med), Seq("pr"))
        .select(col("pr"), abs(col("c") - col("med")).as("dv"))
      val mad = pin(Ranks.groupedKthSmallest(dev, "pr", "dv", ks, MadBucket)
        .select(col("pr"), col("kth").as("mad")))
      o.join(broadcast(med), Seq("pr")).join(broadcast(mad), Seq("pr"))
        .groupBy(col("pr"))
        .agg(count(lit(1)).as("n_orders"),
          max(col("med")).as("median_cents"),
          max(col("mad")).as("mad_cents"),
          sum(when(abs(col("c") - col("med")) > lit(3L) * col("mad"), 1L)
            .otherwise(0L)).as("n_outliers"))
        .select(col("pr").as("o_orderpriority"), col("n_orders"),
          col("median_cents"), col("mad_cents"), col("n_outliers"))
        .orderBy(col("o_orderpriority"))
    },

    // REFERENTIAL ACTIVITY PROFILE — the FK-health / coverage check a
    // warehouse runs per reporting window: customer→orders fan-out
    // inside 1995 (how many customers ordered, how many went dark, the
    // max and mean orders per active customer) plus the orphan-order
    // witness (window orders whose customer key resolves nowhere —
    // exactly 0 here, and the row PROVES it rather than assumes it;
    // the inactive branch bites at 326/1500). One window-pruned
    // customer-keyed aggregate + one keyed left join; the orphan
    // anti-join rides the same fan frame. avg fan-out is the exact
    // integer micro-ratio (d40's rule — a double mean would be
    // merge-order noise).
    "q43_activity_profile" -> { (s, d) =>
      val lo = lit("1995-01-01").cast("timestamp")
      val hi = lit("1996-01-01").cast("timestamp")
      val fan = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      val cust = Tables.customer(s, d).select(col("c_custkey"))
      val orphans = fan
        .join(cust, col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(coalesce(sum(col("n")), lit(0L)).as("n_orphan_orders"))
      cust.join(fan, col("c_custkey") === col("o_custkey"), "left")
        .agg(count(lit(1)).as("n_customers"),
          sum(when(col("n").isNotNull, 1L).otherwise(0L)).as("n_active"),
          sum(when(col("n").isNull, 1L).otherwise(0L)).as("n_inactive"),
          max(col("n")).as("max_fanout"),
          sum(coalesce(col("n"), lit(0L))).as("n_window_orders"))
        .crossJoin(broadcast(orphans))
        .withColumn("avg_fanout_micro",
          expr("(n_window_orders * 1000000) DIV n_active"))
    },

    "q42_corr_matrix" -> { (s, d) =>
      val ms = Seq("l_quantity" -> "q", "l_extendedprice" -> "p",
        "l_discount" -> "dd", "l_tax" -> "t")
      val pairs = for {
        (i, (c1, a1)) <- ms.zipWithIndex.map(_.swap)
        (j, (c2, a2)) <- ms.zipWithIndex.map(_.swap) if j > i
      } yield ((c1, a1), (c2, a2))
      val aggs =
        ms.map { case (c, a) => sum(m(col(c))).as(s"s_$a") } ++
        ms.map { case (c, a) => sum(m(col(c)) * m(col(c))).as(s"s_$a$a") } ++
        pairs.map { case ((c1, a1), (c2, a2)) =>
          sum(m(col(c1)) * m(col(c2))).as(s"s_$a1$a2") }
      val one = Tables.lineitem(s, d)
        .agg(count(lit(1)).as("n"), aggs: _*)
      val nD = col("n").cast("double")
      def dbl(c: String) = col(c).cast("double")
      val withCorr = one.select(col("n") +: pairs.map {
        case ((c1, a1), (c2, a2)) =>
          round((nD * dbl(s"s_$a1$a2") - dbl(s"s_$a1") * dbl(s"s_$a2"))
            / (sqrt(nD * dbl(s"s_$a1$a1") - dbl(s"s_$a1") * dbl(s"s_$a1"))
              * sqrt(nD * dbl(s"s_$a2$a2") - dbl(s"s_$a2") * dbl(s"s_$a2"))),
            9).as(s"corr_$a1$a2")
      }: _*)
      val stackArgs = pairs.map { case ((c1, a1), (c2, a2)) =>
        s"'${c1.stripPrefix("l_")}_${c2.stripPrefix("l_")}', corr_$a1$a2"
      }.mkString(", ")
      withCorr.select(col("n"),
        expr(s"stack(${pairs.size}, $stackArgs) AS (pair, corr)"))
        .select(col("pair"), col("n"), col("corr"))
        .orderBy(col("pair"))
    },

    // COLUMN-DRIFT report between two time slices — the
    // data-quality monitor a stats catalog runs on every ingest:
    // per measure column, both slices' counts and exact-DECIMAL
    // means plus the Population Stability Index over a shared
    // 8-bucket equi-width histogram (global bounds broadcast, q37's
    // machinery; Laplace-smoothed shares so empty buckets can't
    // produce ln(0)). Parity shape: counts and sums are exact
    // integers/decimals; each PSI term floor-quantizes to micro-units
    // BEFORE summation (the d40 ln rule — the sum is then exact
    // integer arithmetic, order-independent). One stacked row-local
    // melt (q33's no-rescan unpivot) feeds bounds, buckets, and
    // moments.
    "q41_profile_drift" -> { (s, d) =>
      val cut = lit("1998-01-01").cast("timestamp")
      val u = Tables.lineitem(s, d)
        .withColumn("slice", when(col("l_shipdate") < cut, 0L).otherwise(1L))
        .select(expr("stack(3, 'l_quantity', l_quantity, " +
          "'l_extendedprice', l_extendedprice, 'l_discount', l_discount) " +
          "AS (colname, v)"), col("slice"))
      val b = u.groupBy(col("colname"))
        .agg(min(col("v")).cast("double").as("lo"),
          max(col("v")).cast("double").as("hi"))
      val c = u.join(broadcast(b), "colname")
        .select(col("colname"), col("slice"),
          when(col("hi") === col("lo"), lit(0L))
            .otherwise(least(lit(7L),
              floor((col("v") - col("lo")) * lit(8.0) /
                (col("hi") - col("lo"))).cast("long"))).as("bucket"))
        .groupBy(col("colname"), col("bucket"))
        .agg(sum(when(col("slice") === 0, 1L).otherwise(0L)).as("ca"),
          sum(when(col("slice") === 1, 1L).otherwise(0L)).as("cb"))
      val t = c.groupBy(col("colname"))
        .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      def share(cnt: Column, n: Column) =
        (cnt + lit(1)).cast("double") / (n + lit(8)).cast("double")
      val terms = c.join(broadcast(t), "colname")
        .select(col("colname"),
          floor((share(col("ca"), col("na")) - share(col("cb"), col("nb")))
            * log(share(col("ca"), col("na")) / share(col("cb"), col("nb")))
            * lit(1000000.0)).cast("long").as("term_micro"))
      val mom = u.groupBy(col("colname"))
        .agg(sum(when(col("slice") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("slice") === 1, 1L).otherwise(0L)).as("n_b"),
          sum(when(col("slice") === 0, m(col("v")))).cast("double")
            .as("sum_a"),
          sum(when(col("slice") === 1, m(col("v")))).cast("double")
            .as("sum_b"))
      mom.join(terms, "colname")
        .groupBy(col("colname"), col("n_a"), col("n_b"),
          (col("sum_a") / col("n_a").cast("double")).as("mean_a"),
          (col("sum_b") / col("n_b").cast("double")).as("mean_b"))
        .agg(sum(col("term_micro")).as("psi_micro"))
        .orderBy(col("colname"))
    },

    // LABEL-PROPAGATION COMMUNITIES over the weighted co-purchase
    // graph ([[graft.operators.GraphRank.labelPropagation]]): parts
    // that repeatedly sell together (pair co-occurs in ≥ 2 orders —
    // the weight floor that leaves real cluster structure instead of
    // one dense blob) cluster into 576 communities over 1,892 nodes at
    // sf0.01 after two synchronous rounds. Deterministic by
    // construction — sync updates + smallest-label tie-break — which
    // is what lets the oracle unroll the vote rounds; the vote itself
    // is a mergeable max_by, never a per-node window sort.
    "q40_communities" -> { (s, d) =>
      // One-scan weighted edge build (r22, the q29 rewrite with
      // collect_LIST): the self-join's per-(src,dst) row count is
      // Σ_orders cnt_a·cnt_b, and exploding ordered pairs from the
      // per-order part LIST (duplicates kept, partner copies equal by
      // VALUE excluded — exactly the a.partkey ≠ b.partkey condition)
      // reproduces that multiset term for term, so the weights and the
      // w ≥ 2 gate are unchanged.
      val edges = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(collect_list(col("l_partkey")).as("ps"))
        .select(explode(expr(
          "flatten(transform(ps, a -> " +
            "transform(filter(ps, b -> b != a), b -> struct(a, b))))"))
          .as("p"))
        .groupBy(col("p.a").as("src"), col("p.b").as("dst"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
        .select(col("src"), col("dst"))
      graft.operators.GraphRank.labelPropagation(edges, "src", "dst",
          iters = 2, assumeDistinct = true)
        .select(col("node").as("l_partkey"), col("label").as("community"))
        .orderBy(col("l_partkey"))
    },

    // HITS authorities over the bipartite customer→part purchase graph
    // ([[graft.operators.GraphRank.hits]]): auth(part) = how much
    // broad-basket customers buy it, hub(customer) = how much they buy
    // authoritative parts — co-HITS, the recommender bootstrap, and
    // the second classic link-analysis recurrence next to q29's
    // PageRank. Customer nodes ride the shared node space as
    // -(custkey+1) (the two key domains overlap); the output is the
    // part-authority ranking after 2 full rounds. Integer max-
    // normalized half-steps (best node = exactly 1e6) keep every score
    // a BIGINT the oracle unrolls round by round — float HITS with L2
    // norms could never hash-match.
    "q39_basket_hits" -> { (s, d) =>
      val edges = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(s, d).select(col("l_orderkey"),
          col("l_partkey")), col("o_orderkey") === col("l_orderkey"))
        .select((lit(-1L) * col("o_custkey") - 1).as("src"),
          col("l_partkey").as("dst"))
        .distinct()
      graft.operators.GraphRank.hits(edges, "src", "dst", iters = 2,
          assumeDistinct = true)
        .filter(col("node") >= 0)
        .select(col("node").as("l_partkey"), col("auth"))
        .orderBy(col("auth").desc, col("l_partkey"))
    },

    // BLOOM-FILTER SEMI-JOIN pre-filter: the selective-dimension join
    // (lineitem ⋉ parts with p_size = 1) with a declaratively-BUILT
    // Bloom filter applied row-locally in the fact scan BEFORE any
    // join. Build: each dim key explodes into J=3 bit positions
    // (md5 double hashing, h1 + i·h2 mod M — all exact integer
    // arithmetic both engines replay), bit_or-folded into ≤ M/32
    // words, packed into ONE array row and broadcast like q37's
    // bounds. Probe: a forall over the J positions — pure row-local
    // bit math riding the scan, so at 100 TB only candidate rows
    // (46× fewer at sf0.01) reach the exact semi join that removes
    // the false positives. That residual join is what keeps the
    // answer EXACT; n_candidates > n_matched in the output is the
    // witness that the filter really is approximate (114 false-
    // positive rows at sf0.01) and no-false-negative is what the
    // oracle's hash equality proves. M=1024 is sized to the sf0.01
    // dim (38 keys ⇒ ~11% fill); production sizing is ~10–16
    // bits/key — the mechanism (bit array as an aggregate, 1-row
    // broadcast, forall probe) is M-independent.
    "q38_bloom_semi_join" -> { (s, d) =>
      val Mb = 1024; val J = 3
      import graft.operators.Bloom
      val dim = Tables.part(s, d).filter(col("p_size") === 1)
        .select(col("p_partkey").as("key"))
      val packed = Bloom.buildRow(dim, "key", mBits = Mb, j = J)
      val (kh1, kh2) = Bloom.hashes(col("l_partkey"))
      val tagged = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_extendedprice"), col("l_returnflag"))
        .crossJoin(broadcast(packed))
        .withColumn("h1", kh1)
        .withColumn("h2", kh2)
        .withColumn("is_cand",
          Bloom.mightContain("h1", "h2", "bloom", mBits = Mb, j = J))
      val witness = tagged.agg(count(lit(1)).as("n_total"),
        sum(col("is_cand").cast("long")).as("n_candidates"))
      tagged.filter(col("is_cand"))
        .join(broadcast(dim), col("l_partkey") === col("key"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_matched"),
          msum(col("l_extendedprice")).as("revenue"))
        .crossJoin(broadcast(witness))
        .select(col("l_returnflag"), col("n_matched"), col("revenue"),
          col("n_candidates"), col("n_total"))
        .orderBy(col("l_returnflag"))
    },

    // Exact per-group top-k WITHOUT the window sort
    // ([[graft.operators.Sketches.TopKByScore]]): q08's row_number idiom
    // sorts every group row through the exchange; the mergeable top-k
    // state moves only k rows per group per task (map-side combined,
    // pinned by PlanSpec). The oracle is the window form itself — the
    // aggregate must reproduce it exactly, rank for rank.
    "q24_group_topk" -> { (s, d) =>
      val topk = udaf(new graft.operators.Sketches.TopKByScore(5),
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[(java.lang.Double, java.lang.Long)]())
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
        .select(col("o_orderstatus"), posexplode(col("top")).as(Seq("r0", "p")))
        .select(col("o_orderstatus"), (col("r0") + 1).cast("long").as("rank"),
          col("p._2").as("o_orderkey"), col("p._1").as("o_totalprice"))
        .orderBy(col("o_orderstatus"), col("rank"))
    }
  )

  private val KmvK = 256
  private val QuantK = 128

  def oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         | CAST(SUM(CAST(l_quantity AS $M)) AS DOUBLE) AS sum_qty,
         | ${msumSql("l_extendedprice")} AS sum_base_price,
         | CAST(SUM(CAST(l_extendedprice AS $M) * (1 - CAST(l_discount AS $R))) AS DOUBLE) AS sum_disc_price,
         | CAST(SUM(CAST(l_extendedprice AS $M) * (1 - CAST(l_discount AS $R)) * (1 + CAST(l_tax AS $R))) AS DOUBLE) AS sum_charge,
         | COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        | l_extendedprice * (1.0 - l_discount) AS net_price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-07-01' AND l_quantity > 45.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate,
         | CAST(SUM(CAST(l_extendedprice AS $M) * (1 - CAST(l_discount AS $R))) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate > TIMESTAMP '1998-01-01'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q04_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q05_local_supplier" ->
      s"""SELECT n_name,
         | CAST(SUM(CAST(l_extendedprice AS $M) * (1 - CAST(l_discount AS $R))) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q06_revenue_delta" ->
      s"""SELECT CAST(SUM(CAST(l_extendedprice AS $M) * CAST(l_discount AS $R)) AS DOUBLE) AS revenue,
         | COUNT(*) AS n
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND l_discount >= 0.03 AND l_discount <= 0.07
         |  AND l_quantity < 24.0""".stripMargin,

    "q07_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q08_window_rank" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q09_distinct_parts" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        | COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q10_rollup" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
         | COALESCE(l_linestatus, 'ALL') AS ls, COUNT(*) AS n,
         | CAST(SUM(CAST(l_quantity AS $M)) AS DOUBLE) AS qty
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY rf, ls""".stripMargin,

    "q19_cube" ->
      s"""SELECT COALESCE(o_orderstatus, 'ALL') AS st,
         | COALESCE(o_orderpriority, 'ALL') AS prio, COUNT(*) AS n,
         | ${msumSql("o_totalprice")} AS total
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY st, prio""".stripMargin,

    "q20_quantiles" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        | quantile_cont(o_totalprice, 0.5) AS p50,
        | quantile_cont(o_totalprice, 0.9) AS p90
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q11_set_ops" ->
      """WITH y96 AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01'),
        | y97 AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01')
        |SELECT o_custkey, 'both' AS bucket
        |  FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97)
        |UNION ALL
        |SELECT o_custkey, 'only_1996' AS bucket
        |  FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97)
        |ORDER BY bucket, o_custkey""".stripMargin,

    "q12_priority_mix" ->
      """SELECT o_orderstatus,
        | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q13_order_dist" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        | SELECT c_custkey, COUNT(o_orderkey) AS c_count
        | FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        | GROUP BY c_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q14_scalar_fns" ->
      """SELECT o_orderkey,
        | CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
        | CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS o_month,
        | CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS o_day,
        | STRFTIME(o_orderdate, '%Y-%m') AS o_ym,
        | UPPER(o_orderstatus) AS status_u,
        | CAST(LENGTH(o_orderpriority) AS BIGINT) AS prio_len,
        | SUBSTRING(o_orderpriority, 1, 1) AS prio_code,
        | o_orderstatus || '#' || o_orderpriority AS status_prio
        |FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin,

    "q15_having" ->
      s"""SELECT c_nationkey, COUNT(*) AS n_cust,
         | ${msumSql("c_acctbal")} AS sum_bal
         |FROM customer GROUP BY c_nationkey
         |HAVING COUNT(*) >= 3 ORDER BY c_nationkey""".stripMargin,

    "q17_small_qty" ->
      s"""SELECT CAST(SUM(CAST(l_extendedprice AS $M)) AS DOUBLE) / 7.0 AS avg_yearly,
         | COUNT(*) AS n
         |FROM lineitem l
         |JOIN (SELECT l_partkey AS p_key,
         |       CAST(SUM(CAST(l_quantity AS $M)) AS DOUBLE) / COUNT(*) AS avg_qty
         |      FROM lineitem GROUP BY l_partkey) a
         | ON l.l_partkey = a.p_key
         |WHERE l.l_quantity < a.avg_qty * 0.5""".stripMargin,

    "q16_brand_suppliers" ->
      """SELECT p_brand, p_size,
        | CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt,
        | COUNT(*) AS n_lines
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_size IN (1, 5, 9, 13)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,

    "q18_no_urgent_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    // The salt must never change results: the oracle is the PLAIN join.
    "q21_salted_join" ->
      """SELECT l_orderkey, l_quantity, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |ORDER BY l_orderkey, l_quantity, o_totalprice""".stripMargin,

    // KMV re-derived declaratively: k-th smallest distinct hash per group
    // (MAX over CASE rn=k), same estimator arithmetic left-to-right.
    "q22_kmv_distinct" ->
      s"""WITH h AS (SELECT DISTINCT l_returnflag AS g,
         |        CAST(('0x'||substr(md5(CAST(l_partkey AS VARCHAR)),1,8)) AS BIGINT) AS h
         |       FROM lineitem),
         |r AS (SELECT g, h,
         |       ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rn,
         |       COUNT(*) OVER (PARTITION BY g) AS nd
         |      FROM h),
         |e AS (SELECT g,
         |       CASE WHEN MAX(nd) < $KmvK THEN CAST(MAX(nd) AS DOUBLE)
         |            ELSE ${KmvK - 1}e0 * 4294967296e0
         |                 / MAX(CASE WHEN rn = $KmvK THEN h END) END AS est
         |      FROM r GROUP BY g),
         |ex AS (SELECT l_returnflag AS g,
         |        CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact
         |       FROM lineitem GROUP BY 1)
         |SELECT ex.g AS l_returnflag, ex.n_exact, e.est AS est_distinct
         |FROM ex JOIN e ON ex.g = e.g
         |ORDER BY l_returnflag""".stripMargin,

    // The bottom-k sample re-derived declaratively: distinct (hash,
    // value) pairs per group, window-ranked by (h, v), rn <= k, then
    // quantile_cont over the sampled values (bit-compatible with
    // finish()'s interpolation — the q20-proved arithmetic).
    "q23_bottomk_quantiles" ->
      s"""WITH h AS (SELECT DISTINCT o_orderstatus AS g,
         |        CAST(('0x'||substr(md5(CAST(o_orderkey AS VARCHAR)),1,8)) AS BIGINT) AS h,
         |        o_totalprice AS v
         |       FROM orders),
         |r AS (SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h, v) AS rn
         |      FROM h),
         |s AS (SELECT g, quantile_cont(v, 0.5) AS p50, quantile_cont(v, 0.9) AS p90
         |      FROM r WHERE rn <= $QuantK GROUP BY g),
         |n AS (SELECT o_orderstatus AS g, COUNT(*) AS n_rows FROM orders GROUP BY 1)
         |SELECT n.g AS o_orderstatus, n.n_rows, s.p50 AS p50_est, s.p90 AS p90_est
         |FROM n JOIN s ON n.g = s.g ORDER BY o_orderstatus""".stripMargin,

    // Per-column stats re-derived as a UNION of per-column aggregates
    // (DuckDB has no stack; row content is what is compared).
    "q25_table_profile" -> Seq("l_quantity", "l_extendedprice",
      "l_discount", "l_tax").map { c =>
      s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
         | CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         | CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         | CAST(MIN($c) AS DOUBLE) AS min_v, CAST(MAX($c) AS DOUBLE) AS max_v,
         | ${msumSql(c)} AS sum_v
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name"),

    // The sketch profile's oracle: unpivot the four columns, re-derive
    // each column's KMV estimate with q22's window-rank derivation over
    // distinct hashes of the cents-quantized values (injective on the
    // 2-decimal domain; BIGINT→VARCHAR is portable where double→VARCHAR
    // is not), and join back the plain per-column stats.
    "q26_profile_sketch" -> {
      val u = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .map(c => s"SELECT '$c' AS g, $c AS x FROM lineitem")
        .mkString("\nUNION ALL ")
      s"""WITH u AS ($u),
         |h AS (SELECT DISTINCT g,
         |       CAST(('0x'||substr(md5(CAST(CAST(FLOOR(x * 100 + 0.5e0)
         |         AS BIGINT) AS VARCHAR)),1,8)) AS BIGINT) AS h
         |      FROM u WHERE x IS NOT NULL),
         |r AS (SELECT g, h,
         |       ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rn,
         |       COUNT(*) OVER (PARTITION BY g) AS nd
         |      FROM h),
         |e AS (SELECT g,
         |       CASE WHEN MAX(nd) < $KmvK THEN CAST(MAX(nd) AS DOUBLE)
         |            ELSE ${KmvK - 1}e0 * 4294967296e0
         |                 / MAX(CASE WHEN rn = $KmvK THEN h END) END AS est
         |      FROM r GROUP BY g),
         |s AS (SELECT g AS column_name, COUNT(*) AS n_rows,
         |       CAST(SUM(CASE WHEN x IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_null,
         |       CAST(MIN(x) AS DOUBLE) AS min_v, CAST(MAX(x) AS DOUBLE) AS max_v,
         |       ${msumSql("x")} AS sum_v
         |      FROM u GROUP BY g)
         |SELECT s.column_name, s.n_rows, s.n_null, e.est AS n_distinct_est,
         | s.min_v, s.max_v, s.sum_v
         |FROM s JOIN e ON s.column_name = e.g
         |ORDER BY column_name""".stripMargin
    },

    // The DIRECT global profile (q26's oracle shape) with the shard
    // count alongside: the merged path must reproduce it exactly —
    // the oracle never computes a "merged" path at all (the q27
    // set-function argument, per column).
    "q36_profile_merge" -> {
      val u = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .map(c => s"SELECT '$c' AS g, $c AS x FROM lineitem")
        .mkString("\nUNION ALL ")
      s"""WITH u AS ($u),
         |h AS (SELECT DISTINCT g,
         |       CAST(('0x'||substr(md5(CAST(CAST(FLOOR(x * 100 + 0.5e0)
         |         AS BIGINT) AS VARCHAR)),1,8)) AS BIGINT) AS h
         |      FROM u WHERE x IS NOT NULL),
         |r AS (SELECT g, h,
         |       ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rn,
         |       COUNT(*) OVER (PARTITION BY g) AS nd
         |      FROM h),
         |e AS (SELECT g,
         |       CASE WHEN MAX(nd) < $KmvK THEN CAST(MAX(nd) AS DOUBLE)
         |            ELSE ${KmvK - 1}e0 * 4294967296e0
         |                 / MAX(CASE WHEN rn = $KmvK THEN h END) END AS est
         |      FROM r GROUP BY g),
         |ns AS (SELECT CAST(COUNT(DISTINCT l_orderkey % 4) AS BIGINT)
         |        AS n_shards FROM lineitem),
         |s AS (SELECT g AS column_name, COUNT(*) AS n_rows,
         |       CAST(SUM(CASE WHEN x IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_null,
         |       CAST(MIN(x) AS DOUBLE) AS min_v, CAST(MAX(x) AS DOUBLE) AS max_v,
         |       ${msumSql("x")} AS sum_v
         |      FROM u GROUP BY g)
         |SELECT s.column_name, ns.n_shards, s.n_rows, s.n_null,
         | e.est AS n_distinct_est, s.min_v, s.max_v, s.sum_v
         |FROM s JOIN e ON s.column_name = e.g CROSS JOIN ns
         |ORDER BY column_name""".stripMargin
    },

    // ONE global bottom-k estimate, expected in BOTH columns: merging
    // the per-group states must reproduce it exactly (set-function
    // property), so the oracle never computes a "merged" path at all.
    "q27_kmv_mergeable" ->
      s"""WITH h AS (SELECT DISTINCT
         |        CAST(('0x'||substr(md5(CAST(l_partkey AS VARCHAR)),1,8)) AS BIGINT) AS h
         |       FROM lineitem),
         |r AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn,
         |       COUNT(*) OVER () AS nd FROM h),
         |e AS (SELECT CASE WHEN MAX(nd) < $KmvK THEN CAST(MAX(nd) AS DOUBLE)
         |             ELSE ${KmvK - 1}e0 * 4294967296e0
         |                  / MAX(CASE WHEN rn = $KmvK THEN h END) END AS est
         |      FROM r),
         |s AS (SELECT CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS n_shards
         |      FROM lineitem)
         |SELECT s.n_shards, e.est AS est_merged, e.est AS est_direct
         |FROM s, e""".stripMargin,

    // The Morton interleave spelled as 32 explicit bit terms — the
    // exact arithmetic ZOrder.zkey generates, so the clustering key is
    // cross-engine bit-reproducible, not an engine-private layout.
    "q28_zorder_box" -> {
      val terms = (0 until 16).flatMap(i => Seq(
        s"(((l_partkey >> $i) & 1) << ${2 * i})",
        s"(((l_suppkey >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")
      s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         | CAST($terms AS BIGINT) AS zkey
         |FROM lineitem
         |WHERE l_partkey BETWEEN 20 AND 130 AND l_suppkey BETWEEN 2 AND 7
         |ORDER BY zkey, l_orderkey, l_linenumber""".stripMargin
    },

    // All three PageRank iterations unrolled as CTEs — every
    // redistribution is integer floor division on positive BIGINTs, so
    // DuckDB replays graft.operators.GraphRank's arithmetic exactly
    // (micro-unit ranks; DuckDB's `//` = Spark's `div` for positive
    // operands). SUM over BIGINT is HUGEINT in DuckDB, so each
    // iteration casts the damped rank back to BIGINT.
    "q29_copurchase_rank" -> {
      val iterCtes = (1 to 3).map { i =>
        val prev = s"r${i - 1}"
        s"""c$i AS (SELECT e.dst AS node, SUM($prev.rank // deg.deg) AS s
           |  FROM e JOIN $prev ON e.src = $prev.node
           |  JOIN deg ON e.src = deg.src GROUP BY e.dst),
           |r$i AS (SELECT n.node,
           |  CAST(150000 + (85 * COALESCE(c$i.s, 0)) // 100 AS BIGINT) AS rank
           |  FROM n LEFT JOIN c$i ON n.node = c$i.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
         |e AS (SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS src,
         |       CAST(b.l_partkey AS BIGINT) AS dst
         |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
         |       AND a.l_partkey <> b.l_partkey),
         |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
         |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM n),
         |$iterCtes
         |SELECT node AS l_partkey, rank
         |FROM r3 ORDER BY rank DESC, l_partkey""".stripMargin
    },

    // q29's unrolled replay with the teleport indicator inline: seed
    // nodes get init + per-round base, everything else starts (and
    // teleports) at 0.
    "q35_personalized_rank" -> {
      val iterCtes = (1 to 3).map { i =>
        val prev = s"r${i - 1}"
        s"""c$i AS (SELECT e.dst AS node, SUM($prev.rank // deg.deg) AS s
           |  FROM e JOIN $prev ON e.src = $prev.node
           |  JOIN deg ON e.src = deg.src GROUP BY e.dst),
           |r$i AS (SELECT n.node,
           |  CAST(150000 * n.seed + (85 * COALESCE(c$i.s, 0)) // 100 AS BIGINT)
           |    AS rank
           |  FROM n LEFT JOIN c$i ON n.node = c$i.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
         |e AS (SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS src,
         |       CAST(b.l_partkey AS BIGINT) AS dst
         |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
         |       AND a.l_partkey <> b.l_partkey),
         |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
         |sd AS (SELECT CAST(p_partkey AS BIGINT) AS node FROM part
         |       WHERE p_brand = 'Brand#1'),
         |n AS (SELECT nn.node,
         |       CASE WHEN sd.node IS NULL THEN 0 ELSE 1 END AS seed
         |      FROM (SELECT src AS node FROM e UNION SELECT dst FROM e) nn
         |      LEFT JOIN sd ON nn.node = sd.node),
         |r0 AS (SELECT node, CAST(1000000 * seed AS BIGINT) AS rank FROM n),
         |$iterCtes
         |SELECT node AS l_partkey, rank
         |FROM r3 ORDER BY rank DESC, l_partkey""".stripMargin
    },

    // The pivot unrolled as conditional aggregates — exactly the plan
    // Spark's explicit-values pivot lowers to. COUNT FILTER is never
    // null; SUM FILTER is, hence the one-sided COALESCE.
    "q30_pivot" -> {
      val cells = Seq("A", "N", "R").map { v =>
        s"""CAST(COUNT(*) FILTER (WHERE l_returnflag = '$v') AS BIGINT)
           |  AS "${v}_n",
           | COALESCE(CAST(SUM(CAST(l_quantity AS $M))
           |   FILTER (WHERE l_returnflag = '$v') AS DOUBLE), 0.0e0)
           |  AS "${v}_qty"""".stripMargin
      }.mkString(",\n ")
      s"""SELECT l_linestatus,
         | $cells
         |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin
    },

    // The dynamic pivot's discovered value set, enumerated: the
    // driver's generator draws o_orderpriority from this fixed
    // 5-value vocabulary at every sf, so the data-derived schema is
    // reproducible here. COUNT FILTER yields 0 (not NULL) in DuckDB,
    // matching the Spark side's coalesce.
    "q31_pivot_dynamic" -> {
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")
      val cells = prios.map { v =>
        s"""CAST(COUNT(*) FILTER (WHERE o_orderpriority = '$v') AS BIGINT)
           |  AS "${v}_n",
           | COALESCE(CAST(SUM(CAST(o_totalprice AS $M))
           |   FILTER (WHERE o_orderpriority = '$v') AS DOUBLE), 0.0e0)
           |  AS "${v}_total"""".stripMargin
      }.mkString(",\n ")
      s"""SELECT o_orderstatus,
         | $cells
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    },

    "q32_grouping_sets" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
         | COALESCE(l_linestatus, 'ALL') AS ls,
         | COUNT(*) AS n,
         | CAST(SUM(CAST(l_quantity AS $M)) AS DOUBLE) AS qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY rf, ls""".stripMargin,

    // The five exact decimal moments, then the SAME double expression
    // sequence — determinism comes from making the only
    // order-sensitive step (the sums) exact; the double arithmetic
    // after it is a fixed sequence of IEEE-754 ops on identical
    // inputs. DuckDB's own corr() would NOT be a valid oracle here
    // (same merge-order caveat as Spark's).
    "q34_moments_profile" ->
      s"""WITH a AS (
         | SELECT l_returnflag, COUNT(*) AS n,
         |  SUM(CAST(l_quantity AS $M)) AS sx,
         |  SUM(CAST(l_extendedprice AS $M)) AS sy,
         |  SUM(CAST(l_quantity AS $M) * CAST(l_quantity AS $M)) AS sxx,
         |  SUM(CAST(l_extendedprice AS $M) * CAST(l_extendedprice AS $M)) AS syy,
         |  SUM(CAST(l_quantity AS $M) * CAST(l_extendedprice AS $M)) AS sxy
         | FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, n,
         | ROUND(CAST(sx AS DOUBLE) / n, 9) AS mean_qty,
         | ROUND(CAST(sy AS DOUBLE) / n, 9) AS mean_price,
         | ROUND((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
         |   / (n - 1), 9) AS covar_qty_price,
         | ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |   / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         |     * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
         |   9) AS corr_qty_price,
         | ROUND(sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
         |   / (n - 1)), 9) AS stddev_qty
         |FROM a ORDER BY l_returnflag""".stripMargin,

    "q37_histogram" ->
      """WITH b AS (SELECT CAST(MIN(l_extendedprice) AS DOUBLE) AS lo,
        |            CAST(MAX(l_extendedprice) AS DOUBLE) AS hi,
        |            COUNT(*) AS cnt
        |           FROM lineitem)
        |SELECT CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
        |        ELSE LEAST(15, CAST(FLOOR((l_extendedprice - lo) * 16e0 / (hi - lo))
        |         AS BIGINT)) END AS bucket,
        | COUNT(*) AS n,
        | CAST(COUNT(*) AS DOUBLE) / MAX(cnt) AS share
        |FROM lineitem, b
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q45: the independent one-window dominance formulation — min day
    // over strictly-smaller prices (RANGE frame) + per-price min.
    "q45_skyline" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        |          AS BIGINT) AS c,
        |        epoch_us(o_orderdate) // 86400000000 AS day
        |       FROM orders),
        |w AS (SELECT k, c, day,
        |       MIN(day) OVER (ORDER BY c RANGE BETWEEN UNBOUNDED
        |         PRECEDING AND 1 PRECEDING) AS m_smaller,
        |       MIN(day) OVER (PARTITION BY c) AS m_same
        |      FROM o)
        |SELECT k AS o_orderkey, c AS price_cents, day AS order_day
        |FROM w
        |WHERE day = m_same AND (m_smaller IS NULL OR day < m_smaller)
        |ORDER BY price_cents, o_orderkey""".stripMargin,

    // q46: the oracle uses the window row_number the engine avoids;
    // HUGEINT widenings mirror the Spark DECIMAL(38,0) ones, sums cast
    // back to BIGINT (HUGEINT→float64 dtype trap).
    "q46_lorenz_gini" ->
      """WITH rev AS (SELECT o_custkey,
        |        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        |          AS BIGINT)) AS BIGINT) AS cents
        |       FROM orders GROUP BY 1),
        |r AS (SELECT o_custkey, cents,
        |       ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS rk
        |      FROM rev),
        |t AS (SELECT COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS tot,
        |       CAST(SUM(rk * cents) AS BIGINT) AS w FROM r),
        |d AS (SELECT ((r.rk - 1) * 10) // t.n AS decile,
        |       CAST(COUNT(*) AS BIGINT) AS n_cust,
        |       CAST(SUM(r.cents) AS BIGINT) AS rev_cents
        |      FROM r CROSS JOIN t GROUP BY 1),
        |c AS (SELECT decile, n_cust, rev_cents,
        |       CAST(SUM(rev_cents) OVER (ORDER BY decile) AS BIGINT) AS cum
        |      FROM d)
        |SELECT c.decile, c.n_cust, c.rev_cents,
        | CAST((CAST(c.cum AS HUGEINT) * 1000000) // t.tot AS BIGINT)
        |  AS cum_share_micro,
        | CAST(((CAST(2 AS HUGEINT) * t.w - CAST(t.n + 1 AS HUGEINT) * t.tot)
        |       * 1000000) // (CAST(t.n AS HUGEINT) * t.tot) AS BIGINT)
        |  AS gini_micro
        |FROM c CROSS JOIN t ORDER BY c.decile""".stripMargin,

    // q49: both decile cuts as ranked windows, then the value-range
    // trim and the exact micro mean.
    "q49_trimmed_mean" ->
      """WITH o AS (SELECT o_orderpriority AS pr,
        |        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        |          AS BIGINT) AS c
        |       FROM orders),
        |n AS (SELECT pr, CAST(COUNT(*) AS BIGINT) AS n FROM o GROUP BY 1),
        |r AS (SELECT pr, c,
        |       ROW_NUMBER() OVER (PARTITION BY pr ORDER BY c) AS rn FROM o),
        |lo AS (SELECT r.pr, r.c AS lo FROM r JOIN n ON n.pr = r.pr
        |       WHERE r.rn = (n.n + 9) // 10),
        |hi AS (SELECT r.pr, r.c AS hi FROM r JOIN n ON n.pr = r.pr
        |       WHERE r.rn = (9 * n.n + 9) // 10)
        |SELECT o.pr AS o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_total,
        | CAST(SUM(CASE WHEN o.c >= lo.lo AND o.c <= hi.hi
        |          THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        | CAST(MAX(lo.lo) AS BIGINT) AS p10_cents,
        | CAST(MAX(hi.hi) AS BIGINT) AS p90_cents,
        | CAST((SUM(CASE WHEN o.c >= lo.lo AND o.c <= hi.hi
        |        THEN CAST(o.c AS HUGEINT) ELSE 0 END) * 1000000)
        |   // SUM(CASE WHEN o.c >= lo.lo AND o.c <= hi.hi
        |        THEN 1 ELSE 0 END) AS BIGINT)
        |   AS trimmed_mean_micro_cents
        |FROM o JOIN lo ON lo.pr = o.pr JOIN hi ON hi.pr = o.pr
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    // q50: the degree orientation replayed with an explicit (deg, id)
    // lexicographic compare; each triangle closes once at its
    // smallest corner, then explodes to its 3 corners for the
    // per-node fold.
    "q50_triangle_lcc" ->
      """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT CAST(a.l_partkey AS BIGINT) AS src,
        |       CAST(b.l_partkey AS BIGINT) AS dst
        |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |       AND a.l_partkey <> b.l_partkey
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        |        FROM e),
        |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        |         SELECT a AS node FROM und UNION ALL SELECT b FROM und)
        |        GROUP BY 1),
        |o AS (SELECT CASE WHEN da.deg < db.deg
        |               OR (da.deg = db.deg AND und.a < und.b)
        |              THEN und.a ELSE und.b END AS u,
        |             CASE WHEN da.deg < db.deg
        |               OR (da.deg = db.deg AND und.a < und.b)
        |              THEN und.b ELSE und.a END AS v
        |      FROM und JOIN deg da ON und.a = da.node
        |       JOIN deg db ON und.b = db.node),
        |ok AS (SELECT o.u, o.v, deg.deg AS vdeg
        |       FROM o JOIN deg ON o.v = deg.node),
        |w AS (SELECT e1.u, e1.v AS x, e2.v AS y
        |      FROM ok e1 JOIN ok e2 ON e1.u = e2.u
        |      WHERE e1.vdeg < e2.vdeg
        |       OR (e1.vdeg = e2.vdeg AND e1.v < e2.v)),
        |t AS (SELECT w.u, w.x, w.y
        |      FROM w JOIN o ON w.x = o.u AND w.y = o.v),
        |pn AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM (
        |        SELECT u AS node FROM t
        |        UNION ALL SELECT x FROM t
        |        UNION ALL SELECT y FROM t) GROUP BY 1)
        |SELECT pn.node, deg.deg AS degree, pn.triangles,
        | pn.triangles * 2000000 // (deg.deg * (deg.deg - 1)) AS lcc_micro
        |FROM pn JOIN deg ON pn.node = deg.node
        |ORDER BY triangles DESC, pn.node""".stripMargin,

    // q51: the five ranks picked from one ranked window — the same
    // exact integer rank formulas, band = the rank-k value.
    "q51_percentile_bands" ->
      """WITH o AS (SELECT o_orderpriority AS pr,
        |        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        |          AS BIGINT) AS c
        |       FROM orders),
        |n AS (SELECT pr, CAST(COUNT(*) AS BIGINT) AS n FROM o GROUP BY 1),
        |r AS (SELECT pr, c,
        |       ROW_NUMBER() OVER (PARTITION BY pr ORDER BY c) AS rn FROM o),
        |ks AS (SELECT pr, 10 AS pct, (n + 9) // 10 AS k FROM n
        |       UNION ALL SELECT pr, 25, (n + 3) // 4 FROM n
        |       UNION ALL SELECT pr, 50, (n + 1) // 2 FROM n
        |       UNION ALL SELECT pr, 75, (3 * n + 3) // 4 FROM n
        |       UNION ALL SELECT pr, 90, (9 * n + 9) // 10 FROM n)
        |SELECT r.pr AS o_orderpriority, CAST(ks.pct AS BIGINT) AS pct,
        | CAST(r.c AS BIGINT) AS band_cents
        |FROM ks JOIN r ON r.pr = ks.pr AND r.rn = ks.k
        |ORDER BY o_orderpriority, pct""".stripMargin,

    // q48: the oracle states the weighted selection as one running-sum
    // window — smallest value whose cumulative weight reaches half.
    "q48_weighted_median" ->
      """WITH o AS (SELECT l_returnflag AS rf,
        |        CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
        |          AS BIGINT) AS c,
        |        CAST(l_quantity AS BIGINT) AS w
        |       FROM lineitem),
        |t AS (SELECT rf, CAST(SUM(w) AS BIGINT) AS wt FROM o GROUP BY 1),
        |r AS (SELECT rf, c,
        |       SUM(w) OVER (PARTITION BY rf ORDER BY c
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runw
        |      FROM o)
        |SELECT r.rf AS l_returnflag, CAST(MAX(t.wt) AS BIGINT) AS qty_total,
        | CAST(MIN(r.c) AS BIGINT) AS wmedian_cents
        |FROM r JOIN t ON t.rf = r.rf
        |WHERE r.runw >= (t.wt + 1) // 2
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    // q47: the oracle states both selections as plain ranked windows —
    // the two-pass histogram selection must reproduce them exactly.
    "q47_mad_outliers" ->
      """WITH o AS (SELECT o_orderpriority AS pr,
        |        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        |          AS BIGINT) AS c
        |       FROM orders),
        |n AS (SELECT pr, CAST(COUNT(*) AS BIGINT) AS n FROM o GROUP BY 1),
        |r AS (SELECT pr, c,
        |       ROW_NUMBER() OVER (PARTITION BY pr ORDER BY c) AS rn FROM o),
        |med AS (SELECT r.pr, r.c AS med FROM r JOIN n ON n.pr = r.pr
        |        WHERE r.rn = (n.n + 1) // 2),
        |d AS (SELECT o.pr, ABS(o.c - med.med) AS dv
        |      FROM o JOIN med ON med.pr = o.pr),
        |rd AS (SELECT pr, dv,
        |       ROW_NUMBER() OVER (PARTITION BY pr ORDER BY dv) AS rn FROM d),
        |mad AS (SELECT rd.pr, rd.dv AS mad FROM rd JOIN n ON n.pr = rd.pr
        |        WHERE rd.rn = (n.n + 1) // 2)
        |SELECT o.pr AS o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
        | CAST(MAX(med.med) AS BIGINT) AS median_cents,
        | CAST(MAX(mad.mad) AS BIGINT) AS mad_cents,
        | CAST(SUM(CASE WHEN ABS(o.c - med.med) > 3 * mad.mad
        |          THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM o JOIN med ON med.pr = o.pr JOIN mad ON mad.pr = o.pr
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    // q44: the oracle states the THETA join directly — the bucketized
    // plan must reproduce the naive band semantics exactly.
    "q44_price_band" ->
      """WITH o AS (SELECT o_orderkey AS k, o_orderpriority AS pr,
        |        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        |          AS BIGINT) AS c
        |       FROM orders)
        |SELECT a.k AS o_orderkey, a.pr AS o_orderpriority,
        | CAST(COUNT(*) AS BIGINT) AS n_neighbors,
        | CAST(MIN(ABS(a.c - b.c)) AS BIGINT) AS min_gap_cents
        |FROM o a JOIN o b
        | ON a.pr = b.pr AND a.k <> b.k AND ABS(a.c - b.c) <= 1000
        |GROUP BY 1, 2 ORDER BY o_orderkey""".stripMargin,

    "q43_activity_profile" ->
      """WITH fan AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
        |             FROM orders
        |             WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |               AND o_orderdate < TIMESTAMP '1996-01-01'
        |             GROUP BY 1),
        |orph AS (SELECT CAST(COALESCE(SUM(f.n), 0) AS BIGINT)
        |          AS n_orphan_orders
        |         FROM fan f LEFT JOIN customer c
        |          ON f.o_custkey = c.c_custkey
        |         WHERE c.c_custkey IS NULL)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
        | CAST(SUM(CASE WHEN f.n IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_active,
        | CAST(SUM(CASE WHEN f.n IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_inactive,
        | MAX(f.n) AS max_fanout,
        | CAST(SUM(COALESCE(f.n, 0)) AS BIGINT) AS n_window_orders,
        | MAX(o.n_orphan_orders) AS n_orphan_orders,
        | (CAST(SUM(COALESCE(f.n, 0)) AS BIGINT) * 1000000)
        |  // CAST(SUM(CASE WHEN f.n IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  AS avg_fanout_micro
        |FROM customer c
        |LEFT JOIN fan f ON c.c_custkey = f.o_custkey
        |CROSS JOIN orph o""".stripMargin,

    // q42: one 15-sum aggregate CTE + a generated 6-row UNION, the
    // pair expression q34's corr formula verbatim.
    "q42_corr_matrix" -> {
      val ms = Seq("l_quantity" -> "q", "l_extendedprice" -> "p",
        "l_discount" -> "dd", "l_tax" -> "t")
      val pairs = for {
        (i, (c1, a1)) <- ms.zipWithIndex.map(_.swap)
        (j, (c2, a2)) <- ms.zipWithIndex.map(_.swap) if j > i
      } yield ((c1, a1), (c2, a2))
      val sums =
        ms.map { case (c, a) => s"SUM(CAST($c AS $M)) AS s_$a" } ++
        ms.map { case (c, a) =>
          s"SUM(CAST($c AS $M) * CAST($c AS $M)) AS s_$a$a" } ++
        pairs.map { case ((c1, a1), (c2, a2)) =>
          s"SUM(CAST($c1 AS $M) * CAST($c2 AS $M)) AS s_$a1$a2" }
      val rows = pairs.map { case ((c1, a1), (c2, a2)) =>
        s"""SELECT '${c1.stripPrefix("l_")}_${c2.stripPrefix("l_")}' AS pair, n,
           | ROUND((n * CAST(s_$a1$a2 AS DOUBLE) - CAST(s_$a1 AS DOUBLE) * CAST(s_$a2 AS DOUBLE))
           |  / (sqrt(n * CAST(s_$a1$a1 AS DOUBLE) - CAST(s_$a1 AS DOUBLE) * CAST(s_$a1 AS DOUBLE))
           |   * sqrt(n * CAST(s_$a2$a2 AS DOUBLE) - CAST(s_$a2 AS DOUBLE) * CAST(s_$a2 AS DOUBLE))),
           |  9) AS corr
           |FROM a""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH a AS (SELECT COUNT(*) AS n, ${sums.mkString(",\n  ")}
         | FROM lineitem)
         |$rows
         |ORDER BY pair""".stripMargin
    },

    // q41: the same melt/bounds/bucket/term chain; every PSI term
    // floor-quantizes before the sum, divisions in Spark's sequence.
    "q41_profile_drift" ->
      s"""WITH u AS (
         |  SELECT 'l_quantity' AS colname, l_quantity AS v,
         |    CASE WHEN l_shipdate < TIMESTAMP '1998-01-01' THEN 0 ELSE 1 END AS slice
         |  FROM lineitem
         |  UNION ALL SELECT 'l_extendedprice', l_extendedprice,
         |    CASE WHEN l_shipdate < TIMESTAMP '1998-01-01' THEN 0 ELSE 1 END
         |  FROM lineitem
         |  UNION ALL SELECT 'l_discount', l_discount,
         |    CASE WHEN l_shipdate < TIMESTAMP '1998-01-01' THEN 0 ELSE 1 END
         |  FROM lineitem),
         |b AS (SELECT colname, CAST(MIN(v) AS DOUBLE) AS lo,
         |       CAST(MAX(v) AS DOUBLE) AS hi FROM u GROUP BY colname),
         |h AS (SELECT u.colname, u.slice,
         |       CASE WHEN b.hi = b.lo THEN CAST(0 AS BIGINT)
         |            ELSE LEAST(7, CAST(FLOOR((u.v - b.lo) * 8e0 / (b.hi - b.lo))
         |              AS BIGINT)) END AS bucket
         |      FROM u JOIN b ON u.colname = b.colname),
         |c AS (SELECT colname, bucket,
         |       CAST(COUNT(*) FILTER (WHERE slice = 0) AS BIGINT) AS ca,
         |       CAST(COUNT(*) FILTER (WHERE slice = 1) AS BIGINT) AS cb
         |      FROM h GROUP BY 1, 2),
         |t AS (SELECT colname, CAST(SUM(ca) AS BIGINT) AS na,
         |       CAST(SUM(cb) AS BIGINT) AS nb FROM c GROUP BY colname),
         |terms AS (SELECT c.colname AS tc,
         |  CAST(FLOOR(
         |    ((CAST(c.ca + 1 AS DOUBLE) / CAST(t.na + 8 AS DOUBLE))
         |     - (CAST(c.cb + 1 AS DOUBLE) / CAST(t.nb + 8 AS DOUBLE)))
         |    * ln((CAST(c.ca + 1 AS DOUBLE) / CAST(t.na + 8 AS DOUBLE))
         |         / (CAST(c.cb + 1 AS DOUBLE) / CAST(t.nb + 8 AS DOUBLE)))
         |    * 1000000.0e0) AS BIGINT) AS term_micro
         |  FROM c JOIN t ON c.colname = t.colname),
         |mo AS (SELECT colname,
         |       CAST(SUM(CASE WHEN slice = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |       CAST(SUM(CASE WHEN slice = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |       CAST(SUM(CASE WHEN slice = 0 THEN CAST(v AS $M) END) AS DOUBLE) AS sum_a,
         |       CAST(SUM(CASE WHEN slice = 1 THEN CAST(v AS $M) END) AS DOUBLE) AS sum_b
         |      FROM u GROUP BY colname)
         |SELECT mo.colname, mo.n_a, mo.n_b,
         | mo.sum_a / CAST(mo.n_a AS DOUBLE) AS mean_a,
         | mo.sum_b / CAST(mo.n_b AS DOUBLE) AS mean_b,
         | CAST(SUM(terms.term_micro) AS BIGINT) AS psi_micro
         |FROM mo JOIN terms ON mo.colname = terms.tc
         |GROUP BY 1, 2, 3, 4, 5 ORDER BY mo.colname""".stripMargin,

    // q40: the two vote rounds unrolled; the ROW_NUMBER pick is the
    // oracle spelling of the engine's max_by(lbl, (cnt, -lbl)).
    "q40_communities" ->
      """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT CAST(a.l_partkey AS BIGINT) AS src,
        |       CAST(b.l_partkey AS BIGINT) AS dst
        |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |       AND a.l_partkey <> b.l_partkey
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |l0 AS (SELECT node, node AS lbl FROM n),
        |c1 AS (SELECT e.dst AS node, l0.lbl, COUNT(*) AS cnt
        |       FROM e JOIN l0 ON e.src = l0.node GROUP BY 1, 2),
        |l1 AS (SELECT node, lbl FROM (SELECT node, lbl,
        |        ROW_NUMBER() OVER (PARTITION BY node ORDER BY cnt DESC, lbl) AS rn
        |       FROM c1) x WHERE rn = 1),
        |c2 AS (SELECT e.dst AS node, l1.lbl, COUNT(*) AS cnt
        |       FROM e JOIN l1 ON e.src = l1.node GROUP BY 1, 2),
        |l2 AS (SELECT node, lbl FROM (SELECT node, lbl,
        |        ROW_NUMBER() OVER (PARTITION BY node ORDER BY cnt DESC, lbl) AS rn
        |       FROM c2) x WHERE rn = 1)
        |SELECT node AS l_partkey, lbl AS community FROM l2
        |ORDER BY l_partkey""".stripMargin,

    // q39: the HITS half-steps unrolled — each a join-sum plus a 1-row
    // MAX and a floor division; only a2 feeds the part ranking.
    "q39_basket_hits" ->
      """WITH e AS (SELECT DISTINCT -o.o_custkey - 1 AS src,
        |        CAST(l.l_partkey AS BIGINT) AS dst
        |       FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS hub FROM n),
        |a1r AS (SELECT e.dst AS node, SUM(h0.hub) AS ar
        |        FROM e JOIN h0 ON e.src = h0.node GROUP BY e.dst),
        |a1m AS (SELECT MAX(ar) AS am FROM a1r),
        |a1 AS (SELECT n.node,
        |        CAST((1000000 * COALESCE(a1r.ar, 0)) // a1m.am AS BIGINT) AS auth
        |       FROM n LEFT JOIN a1r ON n.node = a1r.node, a1m),
        |h1r AS (SELECT e.src AS node, SUM(a1.auth) AS hr
        |        FROM e JOIN a1 ON e.dst = a1.node GROUP BY e.src),
        |h1m AS (SELECT MAX(hr) AS hm FROM h1r),
        |h1 AS (SELECT n.node,
        |        CAST((1000000 * COALESCE(h1r.hr, 0)) // h1m.hm AS BIGINT) AS hub
        |       FROM n LEFT JOIN h1r ON n.node = h1r.node, h1m),
        |a2r AS (SELECT e.dst AS node, SUM(h1.hub) AS ar
        |        FROM e JOIN h1 ON e.src = h1.node GROUP BY e.dst),
        |a2m AS (SELECT MAX(ar) AS am FROM a2r),
        |a2 AS (SELECT n.node,
        |        CAST((1000000 * COALESCE(a2r.ar, 0)) // a2m.am AS BIGINT) AS auth
        |       FROM n LEFT JOIN a2r ON n.node = a2r.node, a2m)
        |SELECT node AS l_partkey, auth FROM a2 WHERE node >= 0
        |ORDER BY auth DESC, l_partkey""".stripMargin,

    // q38: the bloom build/probe replayed with the same md5 double
    // hashing and 32-bit-block words (DuckDB's << overflows at bit 63,
    // so both engines pack 32 usable bits per BIGINT word); the HAVING
    // COUNT(*) = 3 is the forall. Revenue through DECIMAL as always.
    "q38_bloom_semi_join" ->
      s"""WITH dim AS (SELECT p_partkey AS key FROM part WHERE p_size = 1),
         |hx AS (SELECT key,
         |        CAST(('0x'||substr(md5(CAST(key AS VARCHAR)),1,8)) AS BIGINT) AS h1,
         |        CAST(('0x'||substr(md5(CAST(key AS VARCHAR)||'#b'),1,8)) AS BIGINT) AS h2
         |       FROM dim),
         |pos AS (SELECT DISTINCT ((h1 + i.i*h2) % 1024) AS p
         |        FROM hx CROSS JOIN (SELECT unnest(range(3)) AS i) i),
         |words AS (SELECT p//32 AS w,
         |           bit_or(CAST(1 AS BIGINT) << CAST(p%32 AS INTEGER)) AS word
         |          FROM pos GROUP BY 1),
         |ph AS (SELECT l_partkey AS key, l_extendedprice, l_returnflag,
         |        CAST(('0x'||substr(md5(CAST(l_partkey AS VARCHAR)),1,8)) AS BIGINT) AS h1,
         |        CAST(('0x'||substr(md5(CAST(l_partkey AS VARCHAR)||'#b'),1,8)) AS BIGINT) AS h2,
         |        ROW_NUMBER() OVER () AS rid
         |       FROM lineitem),
         |cand AS (SELECT ph.rid, ANY_VALUE(ph.key) AS key,
         |          ANY_VALUE(ph.l_extendedprice) AS l_extendedprice,
         |          ANY_VALUE(ph.l_returnflag) AS l_returnflag
         |         FROM ph CROSS JOIN (SELECT unnest(range(3)) AS i) i
         |         JOIN words ON words.w = ((ph.h1 + i.i*ph.h2) % 1024)//32
         |         WHERE ((words.word >> CAST(((ph.h1 + i.i*ph.h2) % 1024)%32 AS INTEGER)) & 1) = 1
         |         GROUP BY ph.rid HAVING COUNT(*) = 3),
         |wit AS (SELECT (SELECT COUNT(*) FROM lineitem) AS n_total,
         |               (SELECT COUNT(*) FROM cand) AS n_candidates)
         |SELECT l_returnflag, COUNT(*) AS n_matched,
         | ${msumSql("l_extendedprice")} AS revenue,
         | MAX(wit.n_candidates) AS n_candidates, MAX(wit.n_total) AS n_total
         |FROM cand SEMI JOIN dim ON cand.key = dim.key, wit
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q33_unpivot" ->
      s"""WITH u AS (
         | SELECT l_orderkey, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
         | UNION ALL SELECT l_orderkey, 'l_extendedprice', l_extendedprice FROM lineitem
         | UNION ALL SELECT l_orderkey, 'l_discount', l_discount FROM lineitem
         | UNION ALL SELECT l_orderkey, 'l_tax', l_tax FROM lineitem)
         |SELECT measure, COUNT(*) AS n,
         | CAST(SUM(CAST(value AS $M)) AS DOUBLE) AS total
         |FROM u GROUP BY measure ORDER BY measure""".stripMargin,

    // The window idiom the aggregate replaces IS its oracle.
    "q24_group_topk" ->
      """SELECT o_orderstatus, CAST(rn AS BIGINT) AS rank, o_orderkey, o_totalprice
        |FROM (SELECT o_orderstatus, o_orderkey, o_totalprice,
        |       ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |        ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders) t
        |WHERE rn <= 5 ORDER BY o_orderstatus, rank""".stripMargin
  )
}
