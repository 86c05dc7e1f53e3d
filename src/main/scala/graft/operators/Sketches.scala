package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-memory mergeable sketches, as typed [[Aggregator]]s: partial
  * aggregation runs map-side, each task holds O(k) state no matter how
  * many rows flow through it, and partials merge associatively on the
  * way up — the only aggregation shape that survives a 100-TB group-by
  * where exact distinct/top-k state would be gigabytes per group.
  *
  * [[KmvDistinct]] is chosen over HyperLogLog deliberately: KMV's state
  * (the k smallest distinct hash values) is a pure FUNCTION OF THE INPUT
  * SET — independent of row order, partitioning, and merge tree shape —
  * so its estimate is bit-for-bit reproducible and oracle-checkable
  * (q22), while engine HLLs (Spark's approx_count_distinct, DuckDB's)
  * use private register layouts that never match across engines.
  * [[HeavyHitters]] (Misra-Gries) is merge-order dependent by nature;
  * its contract is the deterministic ERROR BOUND (≤ n/(k+1) per item),
  * pinned by SketchesSpec rather than an oracle row.
  */
object Sketches {

  /** DENSE-ID CODEBOOK for a sparse key domain — the paved path the
    * [[BitmapState]] capacity guard points at ("dictionary-encode the
    * key"): the frame's distinct keys get contiguous dense ids [0, n)
    * via the exact distributed global row number
    * ([[graft.operators.Ranks.globalRowNumber]] — only per-partition
    * counts reach the driver), so bitmap set algebra costs n BITS of
    * state however sparse the raw domain is (UUIDs, 64-bit hashes,
    * the id shapes whose max+1 capacity the guard rejects).
    * Deterministic: dense ids follow key order, so the encoding — and
    * everything built on it — is reproducible run to run. Returns
    * (keyCol, dense_id); the codebook is entity-sized, joined back to
    * the data like any dimension.
    */
  def dictEncode(keys: org.apache.spark.sql.DataFrame,
      keyCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    Ranks.globalRowNumber(keys.select(col(keyCol)).distinct(),
      Seq(col(keyCol)), "dense_rk")
      .select(col(keyCol), (col("dense_rk") - 1L).as("dense_id"))
  }

  /** SQL-surface registration (the UDAF path — typed Aggregators enter
    * the function registry through `spark.udf.register`, not the
    * expression-injection path GraftExtensions uses):
    * `kmv_distinct(hash)`, `heavy_hitters(term)`,
    * `bottomk_quantiles(hash, value)` and `topk_by_score(score, id)`
    * become callable from SQL text, each with its OWN size knob —
    * registered function names carry fixed parameters, so tuning one
    * aggregate's k must never silently resize another's.
    */
  def registerSql(spark: org.apache.spark.sql.SparkSession,
      kmvK: Int = 256, hhK: Int = 32, quantileK: Int = 128,
      quantilePs: Seq[Double] = Seq(0.5, 0.9), topK: Int = 16): Unit = {
    spark.udf.register("kmv_distinct",
      org.apache.spark.sql.functions.udaf(new KmvDistinctBoxed(kmvK), Encoders.LONG))
    spark.udf.register("heavy_hitters",
      org.apache.spark.sql.functions.udaf(new HeavyHitters(hhK)))
    spark.udf.register("bottomk_quantiles",
      org.apache.spark.sql.functions.udaf(
        new BottomKQuantile(quantileK, quantilePs),
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[(java.lang.Long, java.lang.Double)]()))
    spark.udf.register("topk_by_score",
      org.apache.spark.sql.functions.udaf(
        new TopKByScore(topK),
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[(java.lang.Double, java.lang.Long)]()))
  }

  /** K-minimum-values distinct-count sketch over 32-bit-range hashes
    * (feed it [[graft.text.TextFunctions.hash32]] values). State: the k
    * smallest DISTINCT hashes, sorted ascending. Estimate: exact count
    * while fewer than k distinct hashes were seen; otherwise the k-th
    * smallest hash h(k) estimates the set density in [0, 2³²) as
    * (k−1) · 2³² / h(k) — relative standard error ≈ 1/√(k−2) (~6% at
    * k=256). Estimates DISTINCT HASHES: hash collisions fold values
    * together, identically in every engine that shares the hash.
    *
    * Input contract, ENFORCED: hashes must lie in [0, 2³²) — anything
    * else (a full-64-bit or negative hash) would corrupt the density
    * estimator silently, so reduce throws instead. NULL inputs carry as
    * [[Sketches.KmvNull]] (= Long.MinValue, unreachable by any 32-bit
    * hash) and are ignored: the input type is PRIMITIVE Long so the
    * per-row path stays unboxed through codegen, and null visibility —
    * e.g. hash32 of a null text, which a primitive encoder would decode
    * as a spurious 0 — is preserved by the caller's `coalesce(h,
    * KmvNull)` projection instead (see [[Sketches.kmvInput]]). The
    * SQL-registered face wraps this class in [[KmvDistinctBoxed]], which
    * keeps the original null-in = no-element semantics for SQL callers
    * who can't add the projection.
    */
  class KmvDistinct(k: Int)
      extends Aggregator[Long, Array[Long], Double]
      with Serializable {
    require(k >= 2, s"KMV needs k >= 2, got $k")

    def zero: Array[Long] = Array.emptyLongArray

    /** Sorted-insert keeping the k smallest distinct values. O(log k)
      * reject for the common full-buffer case (h >= current max).
      */
    def reduce(buf: Array[Long], h: Long): Array[Long] = {
      if (h == Sketches.KmvNull) return buf // null-sentinel input: no element
      require(h >= 0L && h < 4294967296L,
        s"KMV input hash $h outside [0, 2^32) — feed it 32-bit-range hashes")
      if (buf.length == k && h >= buf(buf.length - 1)) return buf
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) return buf // already present
      val ins = -pos - 1
      val outLen = math.min(buf.length + 1, k)
      val out = new Array[Long](outLen)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(buf, ins, out, ins + 1, outLen - ins - 1)
      out
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // merge two sorted distinct arrays, keep the k smallest distinct
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < a.length || j < b.length)) {
        val fromA = j >= b.length || (i < a.length && a(i) <= b(j))
        val v = if (fromA) a(i) else b(j)
        if (fromA) { if (j < b.length && b(j) == v) j += 1; i += 1 }
        else j += 1
        out(n) = v; n += 1
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    def finish(buf: Array[Long]): Double =
      if (buf.length < k) buf.length.toDouble
      else (k - 1).toDouble * 4294967296.0 / buf(k - 1)

    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Null-sentinel for [[KmvDistinct]]'s primitive input: Long.MinValue
    * is unreachable by any hash in [0, 2³²), so `coalesce(h, KmvNull)`
    * keeps null inputs visible (skipped, not counted) without boxing
    * the hot path.
    */
  val KmvNull: Long = Long.MinValue

  /** The caller-side null guard for [[KmvDistinct]]: a primitive input
    * encoder decodes SQL NULL as 0 — a valid hash — so every Scala-side
    * caller must route the column through this projection.
    */
  def kmvInput(h: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.coalesce(
      h, org.apache.spark.sql.functions.lit(KmvNull))

  /** [[KmvDistinct]] with the STATE as the output: the k smallest
    * distinct hashes, sorted ascending — a storable column. This is
    * what makes the sketch incremental across RUNS, not just across
    * partitions: persist one state row per shard/day/source as it is
    * ingested, and any later job folds the states through [[KmvMerge]]
    * for the estimate over any union of shards — no rescan of data
    * that already paid its aggregation. Sound because KMV's state is a
    * pure function of the input set (merge-of-states ≡
    * state-of-union), and oracle-checkable for the same reason (q27
    * re-derives the stored states and the merged estimate
    * declaratively).
    */
  class KmvState(k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]]
      with Serializable {
    private val inner = new KmvDistinct(k)
    def zero: Array[Long] = inner.zero
    def reduce(buf: Array[Long], h: Long): Array[Long] = inner.reduce(buf, h)
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: Encoder[Array[Long]] = inner.bufferEncoder
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Fold stored [[KmvState]] columns into the distinct-count estimate:
    * each input row IS a state (k smallest distinct hashes of its
    * shard), reduce is the state merge, finish is [[KmvDistinct]]'s
    * estimator — so `merge(states of shards)` is bit-identical to the
    * sketch over the shards' union. NULL states (e.g. an outer join's
    * missing shard) contribute nothing. Both classes delegate every
    * transition to one [[KmvDistinct]] instance, so the three faces
    * cannot drift.
    */
  class KmvMerge(k: Int)
      extends Aggregator[Seq[java.lang.Long], Array[Long], Double]
      with Serializable {
    private val inner = new KmvDistinct(k)
    def zero: Array[Long] = inner.zero
    def reduce(buf: Array[Long], state: Seq[java.lang.Long]): Array[Long] =
      if (state == null) buf
      else inner.merge(buf, state.map(_.longValue()).toArray)
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
    def finish(buf: Array[Long]): Double = inner.finish(buf)
    def bufferEncoder: Encoder[Array[Long]] = inner.bufferEncoder
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** EXACT distinct counting over a BOUNDED dense id domain via a
    * fixed-size bitmap — the groupBitmap pattern (ClickHouse /
    * Doris): state is `capacity/64` longs regardless of how many ids
    * land, reduce sets a bit, merge is wordwise OR, and the count is
    * a popcount — so, like KMV, the state is a pure set function
    * (merge-of-states ≡ state-of-union) and storable per shard/day,
    * but the answer is EXACT. This is the right tool when ids are
    * dictionary-encoded into a dense range (user dims, vocab ids —
    * at 100 TB the dictionary is the dimension table's surrogate
    * key); KMV remains the tool for unbounded/sparse domains. An id
    * outside [0, capacity) fails LOUDLY — a silently dropped id
    * would be an undercount masquerading as exact.
    */
  class BitmapState(capacity: Int)
      extends Aggregator[Long, Array[Long], Array[Long]]
      with Serializable {
    require(capacity >= 1, s"bitmap capacity must be >= 1, got $capacity")
    private val words = (capacity + 63) >>> 6

    def zero: Array[Long] = new Array[Long](words)

    def reduce(buf: Array[Long], id: Long): Array[Long] = {
      require(id >= 0L && id < capacity,
        s"bitmap id $id outside [0, $capacity) — widen the capacity or " +
          "dictionary-encode the key")
      buf((id >>> 6).toInt) |= 1L << (id & 63)
      buf
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = bufferEncoder
  }

  /** Fold stored [[BitmapState]] columns into the EXACT distinct
    * count: reduce ORs each state in, finish popcounts. NULL states
    * (an outer join's missing shard) contribute nothing; a state of
    * the wrong width fails loudly (two different capacities are two
    * different dictionaries — ORing them would be silent corruption).
    */
  class BitmapMergeCount(capacity: Int)
      extends Aggregator[Seq[java.lang.Long], Array[Long], Long]
      with Serializable {
    private val inner = new BitmapState(capacity)
    def zero: Array[Long] = inner.zero
    def reduce(buf: Array[Long], state: Seq[java.lang.Long]): Array[Long] =
      if (state == null) buf
      else {
        require(state.length == buf.length,
          s"bitmap state width ${state.length} != ${buf.length} — " +
            "states from a different capacity/dictionary")
        var i = 0
        while (i < buf.length) { buf(i) |= state(i).longValue(); i += 1 }
        buf
      }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
    def finish(buf: Array[Long]): Long = {
      var n = 0L
      var i = 0
      while (i < buf.length) { n += java.lang.Long.bitCount(buf(i)); i += 1 }
      n
    }
    def bufferEncoder: Encoder[Array[Long]] = inner.bufferEncoder
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Boxed adapter for the SQL registry, where callers can't add the
    * [[kmvInput]] projection: SQL NULL arrives as a null box and is
    * skipped, matching `kmv_distinct`'s documented null-in = no-element
    * contract. Delegates every state transition to the primitive
    * [[KmvDistinct]] so the two faces cannot drift.
    */
  class KmvDistinctBoxed(k: Int)
      extends Aggregator[java.lang.Long, Array[Long], Double]
      with Serializable {
    private val inner = new KmvDistinct(k)
    def zero: Array[Long] = inner.zero
    def reduce(buf: Array[Long], boxed: java.lang.Long): Array[Long] =
      if (boxed == null) buf else inner.reduce(buf, boxed.longValue())
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
    def finish(buf: Array[Long]): Double = inner.finish(buf)
    def bufferEncoder: Encoder[Array[Long]] = inner.bufferEncoder
    def outputEncoder: Encoder[Double] = inner.outputEncoder
  }

  /** Mergeable quantile sketch via bounded uniform-hash bottom-k
    * sampling: state is the k lexicographically-smallest DISTINCT
    * (hash, value) pairs — like [[KmvDistinct]], a pure function of the
    * input SET, independent of row order, partitioning, and merge-tree
    * shape, so the estimate is bit-for-bit reproducible and
    * oracle-checkable (q23) where engine-native quantile sketches
    * (t-digest, KLL) carry layout-dependent internal state that never
    * matches across engines.
    *
    * Feed it (hash of a UNIQUE row key, value): hashing a unique key
    * makes the bottom-k a uniform random sample of the rows (any hash
    * range works for determinism; uniformity is what makes the sample
    * unbiased), and makes pair-distinctness coincide with row identity.
    * The value rides second in the pair so even colliding hashes keep
    * the state a set function. NULL hash or value = no element.
    *
    * Estimate: the SQL-standard continuous-quantile interpolation over
    * the sampled values (RN = (n−1)·p, FRN = floor(RN):
    * (FRN+1−RN)·v[FRN] + (RN−FRN)·v[FRN+1] — q20's oracle-matched
    * arithmetic, bit-identical to DuckDB's quantile_cont over the same
    * sample). Sampling error ~ O(1/√k) on the rank, exact while the
    * group holds ≤ k rows. The 100-TB shape is the same as KMV: O(k)
    * state per group through partial aggregation, where exact
    * percentile aggregates buffer every group value (q20's two-pass
    * rank plan is the exact alternative; this is the one-pass
    * approximate one).
    */
  class BottomKQuantile(k: Int, ps: Seq[Double])
      extends Aggregator[(java.lang.Long, java.lang.Double),
        Seq[(Long, Double)], Seq[Double]]
      with Serializable {
    require(k >= 2, s"bottom-k sampling needs k >= 2, got $k")
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantiles must lie in [0, 1]: $ps")

    private def lt(a: (Long, Double), b: (Long, Double)): Boolean =
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

    def zero: Seq[(Long, Double)] = Vector.empty

    def reduce(buf: Seq[(Long, Double)],
        in: (java.lang.Long, java.lang.Double)): Seq[(Long, Double)] = {
      if (in._1 == null || in._2 == null) return buf
      val pair = (in._1.longValue(), in._2.doubleValue())
      // common full-buffer case: reject without rebuilding the state
      if (buf.length == k && !lt(pair, buf.last)) return buf
      val (smaller, rest) = buf.span(lt(_, pair))
      if (rest.headOption.contains(pair)) buf // already present
      else ((smaller :+ pair) ++ rest).take(k)
    }

    def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] = {
      // sorted distinct merge of two sorted distinct states, truncated
      val out = Vector.newBuilder[(Long, Double)]
      var i = 0; var j = 0; var n = 0
      val lim = math.min(a.length + b.length, k)
      while (n < lim && (i < a.length || j < b.length)) {
        val fromA = j >= b.length || (i < a.length && !lt(b(j), a(i)))
        val v = if (fromA) a(i) else b(j)
        if (fromA) { if (j < b.length && b(j) == v) j += 1; i += 1 }
        else j += 1
        out += v; n += 1
      }
      out.result()
    }

    def finish(buf: Seq[(Long, Double)]): Seq[Double] = {
      if (buf.isEmpty) return ps.map(_ => Double.NaN)
      val vs = buf.map(_._2).sorted.toIndexedSeq
      val n = vs.length
      ps.map { p =>
        val rn = (n - 1).toDouble * p
        val frn = math.floor(rn)
        val lo = frn.toInt
        if (lo + 1 >= n) vs(n - 1)
        else (frn + 1.0 - rn) * vs(lo) + (rn - frn) * vs(lo + 1)
      }
    }

    def bufferEncoder: Encoder[Seq[(Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
    def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** EXACT per-group top-k as a mergeable aggregate — the 100-TB
    * replacement for the `row_number() <= k` window idiom. The window
    * form sorts EVERY group row through the exchange (rank needs the
    * whole group ordered); this state is the top-k (score DESC, id ASC)
    * DISTINCT pairs — a pure function of the input set, so it
    * partial-aggregates map-side and only k rows per group per task
    * cross the wire, layout- and merge-shape-independent like the
    * sketches above (but exact, not approximate: top-k of a union IS
    * the merge of top-ks).
    *
    * Ties break to the smaller id; feed unique ids to make the order
    * total. NULL score or id = no element; NaN scores are rejected
    * loudly (they have no total order and would corrupt the state
    * silently).
    */
  class TopKByScore(k: Int)
      extends Aggregator[(java.lang.Double, java.lang.Long),
        Seq[(Double, Long)], Seq[(Double, Long)]]
      with Serializable {
    require(k >= 1, s"top-k needs k >= 1, got $k")

    /** Strict "ranks ahead of": score DESC then id ASC. */
    private def ahead(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    def zero: Seq[(Double, Long)] = Vector.empty

    def reduce(buf: Seq[(Double, Long)],
        in: (java.lang.Double, java.lang.Long)): Seq[(Double, Long)] = {
      if (in._1 == null || in._2 == null) return buf
      val pair = (in._1.doubleValue(), in._2.longValue())
      require(!pair._1.isNaN, "TopKByScore: NaN score has no rank")
      if (buf.length == k && !ahead(pair, buf.last)) return buf
      val (better, rest) = buf.span(ahead(_, pair))
      if (rest.headOption.contains(pair)) buf // already present
      else ((better :+ pair) ++ rest).take(k)
    }

    def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
      val out = Vector.newBuilder[(Double, Long)]
      var i = 0; var j = 0; var n = 0
      val lim = math.min(a.length + b.length, k)
      while (n < lim && (i < a.length || j < b.length)) {
        val fromA = j >= b.length || (i < a.length && !ahead(b(j), a(i)))
        val v = if (fromA) a(i) else b(j)
        if (fromA) { if (j < b.length && b(j) == v) j += 1; i += 1 }
        else j += 1
        out += v; n += 1
      }
      out.result()
    }

    def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

    def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** The string-keyed sibling of [[TopKByScore]]: exact per-group top-k
    * over (integer score, string tag) with an extra payload column
    * carried along un-ordered — the shape a vocabulary ranking needs
    * (score = tf·idf_micro, tag = term, payload = tf). Order is
    * (score DESC, tag ASC); tags must be unique within a group for the
    * order to be total (a (cell, term) aggregate guarantees it). Same
    * mergeability argument as TopKByScore: the state is a pure
    * function of the input SET, so it partial-aggregates map-side and
    * only k rows per group per task cross the wire — the 100-TB
    * replacement for a rank window whose partitions are
    * vocabulary-sized. Integer scores sidestep the NaN guard entirely.
    * NULL score or tag = no element.
    */
  class TopKByScoreTagged(k: Int)
      extends Aggregator[(java.lang.Long, String, java.lang.Long),
        Seq[(Long, String, Long)], Seq[(Long, String, Long)]]
      with Serializable {
    require(k >= 1, s"top-k needs k >= 1, got $k")

    /** Strict "ranks ahead of": score DESC then tag ASC. */
    private def ahead(a: (Long, String, Long), b: (Long, String, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    def zero: Seq[(Long, String, Long)] = Vector.empty

    def reduce(buf: Seq[(Long, String, Long)],
        in: (java.lang.Long, String, java.lang.Long)): Seq[(Long, String, Long)] = {
      if (in._1 == null || in._2 == null) return buf
      val t = (in._1.longValue(), in._2,
        if (in._3 == null) 0L else in._3.longValue())
      if (buf.length == k && !ahead(t, buf.last)) return buf
      val (better, rest) = buf.span(ahead(_, t))
      if (rest.headOption.exists(r => r._1 == t._1 && r._2 == t._2)) buf
      else ((better :+ t) ++ rest).take(k)
    }

    def merge(a: Seq[(Long, String, Long)],
        b: Seq[(Long, String, Long)]): Seq[(Long, String, Long)] = {
      val out = Vector.newBuilder[(Long, String, Long)]
      var i = 0; var j = 0; var n = 0
      val lim = math.min(a.length + b.length, k)
      while (n < lim && (i < a.length || j < b.length)) {
        val fromA = j >= b.length || (i < a.length && !ahead(b(j), a(i)))
        val v = if (fromA) a(i) else b(j)
        if (fromA) {
          if (j < b.length && b(j)._1 == v._1 && b(j)._2 == v._2) j += 1
          i += 1
        } else j += 1
        out += v; n += 1
      }
      out.result()
    }

    def finish(buf: Seq[(Long, String, Long)]): Seq[(Long, String, Long)] = buf

    def bufferEncoder: Encoder[Seq[(Long, String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, String, Long)]]()
    def outputEncoder: Encoder[Seq[(Long, String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, String, Long)]]()
  }

  /** Misra-Gries heavy-hitters sketch: k counters; a miss on a full
    * summary decrements every counter (dropping zeros), so any item with
    * true frequency > n/(k+1) is GUARANTEED to survive, and every
    * reported count sits in [true − n/(k+1), true]. Merge (Agarwal et
    * al., "Mergeable Summaries"): sum counters, then subtract the
    * (k+1)-th largest count and drop non-positives — the bound holds
    * across any merge tree. Counter VALUES depend on encounter order
    * (inherent to MG); the deterministic contract is the bound, pinned
    * by SketchesSpec across partition layouts.
    *
    * Buffers are immutable maps (the typed-Aggregator API contract);
    * the per-row persistent-map update is O(log k). If a profile ever
    * shows this aggregate hash-bound, the upgrade path is a
    * TypedImperativeAggregate over an open-addressing map — same
    * algorithm, engine-internal API.
    */
  class HeavyHitters(k: Int)
      extends Aggregator[String, Map[String, Long], Seq[(String, Long)]]
      with Serializable {
    require(k >= 1, s"MG needs k >= 1, got $k")

    def zero: Map[String, Long] = Map.empty

    def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
      buf.get(item) match {
        case Some(c) => buf.updated(item, c + 1)
        case None if buf.size < k => buf.updated(item, 1L)
        case None => // decrement-all, drop zeros
          buf.view.mapValues(_ - 1).filter(_._2 > 0).toMap
      }

    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-th largest count from everything
        val kth = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
        sum.view.mapValues(_ - kth).filter(_._2 > 0).toMap
      }
    }

    def finish(buf: Map[String, Long]): Seq[(String, Long)] =
      buf.toSeq.sortBy { case (t, c) => (-c, t) }

    def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** Cross-corpus overlap estimate from per-corpus [[KmvState]] rows —
    * the contamination screen that answers "how much of corpus B's
    * vocabulary/shingle set is already in corpus A" WITHOUT shuffling
    * either set: one O(k) state per corpus, then pure arithmetic.
    * Returns one row: `est_a`, `est_b` (per-corpus distinct
    * estimates), `est_union` (estimate over the merged state — exact
    * set semantics: the k smallest of two bottom-k states ARE the
    * bottom-k of the union), `est_inter` = est_a + est_b − est_union
    * clamped at 0 (inclusion–exclusion), and `jaccard` =
    * est_inter / est_union.
    *
    * The inclusion–exclusion form is chosen over the lower-variance
    * ρ·D estimator of Beyer et al. 2007 ("On synopses for
    * distinct-value estimation under multiset operations", SIGMOD)
    * because it reuses the three oracle-pinned KMV faces unchanged —
    * every output is a deterministic function of the two states, so
    * the whole row is cross-engine reproducible (d46). Error grows as
    * the true overlap shrinks relative to 1/√k; raise k for
    * fine-grained contamination ratios.
    *
    * `states` holds one [[KmvState]] row per corpus label; rows whose
    * label is neither `a` nor `b` are ignored. 100-TB shape: the
    * expensive part (one bottom-k aggregation per corpus) was already
    * paid map-side upstream; this step folds corpus-count rows.
    */
  def kmvOverlap(states: org.apache.spark.sql.DataFrame, corpusCol: String,
      stateCol: String, k: Int, a: Any, b: Any): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val mg = udaf(new KmvMerge(k),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[java.lang.Long]]())
    states
      .filter(col(corpusCol) === lit(a) || col(corpusCol) === lit(b))
      .agg(
        mg(when(col(corpusCol) === lit(a), col(stateCol))).as("est_a"),
        mg(when(col(corpusCol) === lit(b), col(stateCol))).as("est_b"),
        mg(col(stateCol)).as("est_union"))
      .withColumn("est_inter",
        greatest(lit(0.0), col("est_a") + col("est_b") - col("est_union")))
      // Two empty corpora estimate union 0; report overlap 0, not 0/0
      // = NaN (data-dependent inputs degrade, they don't poison).
      .withColumn("jaccard",
        when(col("est_union") > lit(0.0),
          col("est_inter") / col("est_union")).otherwise(lit(0.0)))
  }

  /** Count-Min frequency sketch as a DECLARATIVE aggregation — the
    * mergeable point-frequency summary (estimate any item's count from
    * O(d·w) state, never undercounting) built without a UDAF: the
    * matrix cell M[r][b] is just "how many items hash to bucket b
    * under hash r", i.e. a grouped COUNT over (r = posexplode of the
    * d=4 md5 slices, b = slice mod w). Pure sums ⇒ the state is
    * layout- and merge-order-independent (unlike [[HeavyHitters]],
    * whose counters depend on encounter order), shard-mergeable by
    * adding matrices, streaming-capable, and oracle-checkable (d49) —
    * the same determinism argument as KMV, for point frequencies.
    *
    * d is fixed at 4: the four independent 32-bit hashes are the four
    * disjoint slices of ONE md5 digest per item
    * ([[graft.functions.text.MinhashSlices]]'s trick — one digest, not
    * four), with the DuckDB mirror
    * `CAST(('0x'||substr(md5(s), 1+8r, 8)) AS BIGINT) % w`.
    * Error bound: overcount ≤ 2n/w with probability ≥ 1 − (1/2)⁴ per
    * probe; width w is the accuracy lever.
    *
    * 100-TB shape: the 4× posexplode feeds a map-side partial COUNT,
    * so each task sends 4·w partial rows up the exchange no matter how
    * many items flow through it; estimates join any probe set against
    * the broadcast 4·w-row matrix.
    */
  def countMin(items: org.apache.spark.sql.DataFrame, itemCol: String,
      w: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(w >= 1, s"count-min width must be >= 1, got $w")
    items.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
      .select(posexplode(array((0 until 4).map(r =>
        cmBucket(col("item"), r, w)): _*)).as(Seq("r", "b")))
      .groupBy(col("r"), col("b")).agg(count(lit(1)).as("c"))
  }

  /** Bucket of `item` under hash row `r`: md5 slice r, mod `w`. */
  private def cmBucket(item: org.apache.spark.sql.Column, r: Int,
      w: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    conv(substring(md5(item), 1 + 8 * r, 8), 16, 10).cast("long") % w
  }

  /** Point estimates from a [[countMin]] matrix: for each probe item,
    * `cm_est` = min over the 4 rows of the item's bucket count —
    * ≥ the true count always (CM never undercounts), within the class
    * doc's bound above it. Probes join the matrix through 4 broadcast
    * hash lookups (the matrix is 4·w rows — driver-safe at any corpus
    * size); an empty bucket coalesces to 0, which is the exact answer
    * for an item the corpus never hashed there.
    */
  def countMinEstimate(matrix: org.apache.spark.sql.DataFrame,
      probes: org.apache.spark.sql.DataFrame, itemCol: String,
      w: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(w >= 1, s"count-min width must be >= 1, got $w")
    val withBuckets = (0 until 4).foldLeft(probes)((acc, r) =>
      acc.withColumn(s"_cm_b$r", cmBucket(col(itemCol), r, w)))
    val joined = (0 until 4).foldLeft(withBuckets)((acc, r) =>
      acc.join(
        broadcast(matrix.filter(col("r") === r)
          .select(col("b").as(s"_cm_b$r"), col("c").as(s"_cm_c$r"))),
        Seq(s"_cm_b$r"), "left"))
    (0 until 4).foldLeft(
      joined.withColumn("cm_est",
        least((0 until 4).map(r => coalesce(col(s"_cm_c$r"), lit(0L))): _*)))(
      (acc, r) => acc.drop(s"_cm_b$r", s"_cm_c$r"))
  }

  /** EXACT relative-threshold heavy hitters in two passes — every item
    * whose frequency is ≥ `phi`·n, with its exact count, without ever
    * shuffling the full key space. Pass 1 is one aggregate over the
    * scan: a [[HeavyHitters]] (Misra-Gries) sketch sized k = ⌈1/phi⌉
    * plus the total row count n. MG's bound makes the sketch's survivor
    * set a GUARANTEED superset of the answer (any item with true
    * frequency > n/(k+1) survives, and phi·n > n/(k+1) by the choice of
    * k), so pass 2 — an exact recount of the scan restricted to the
    * ≤ k broadcast candidates, filtered to ≥ ⌈phi·n⌉ — is exact.
    *
    * This is why MG's merge-order-dependent counter VALUES (the reason
    * it has no oracle row of its own — class doc above) don't matter
    * here: only the survivor SET is used, and the bound that protects
    * it holds across any merge tree, so the composed result is
    * deterministic and oracle-checkable (d48).
    *
    * 100-TB shape vs the naive `GROUP BY item HAVING count >= phi*n`:
    * the naive plan's exchange carries one partial count per DISTINCT
    * key per task (the key space — for n-gram phrases, roughly the
    * corpus itself); here pass 1 moves O(k) state per task, pass 2's
    * exchange carries only keys that survive the broadcast semi-join —
    * at most k = ⌈1/phi⌉ of them, a constant wired to the question
    * rather than the data. Two scans instead of one is the price, the
    * same trade d36 makes for the df cap.
    */
  def exactHeavyHitters(items: org.apache.spark.sql.DataFrame,
      itemCol: String, phi: Double): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(phi > 0.0 && phi <= 1.0, s"phi must lie in (0, 1], got $phi")
    val k = math.ceil(1.0 / phi).toInt // k+1 > 1/phi => n/(k+1) < phi*n
    val mg = udaf(new HeavyHitters(k), Encoders.STRING)
    val it = items.select(col(itemCol).as("item"))
      .filter(col("item").isNotNull)
    // One shared scan for sketch + n: the threshold is data-derived, so
    // it rides the same aggregate instead of a second count pass.
    val cands = it.agg(mg(col("item")).as("hh"), count(lit(1)).as("n"))
      .select(explode(col("hh")).as("c"),
        ceil(lit(phi) * col("n")).cast("long").as("min_freq"))
      .select(col("c._1").as("item"), col("min_freq"))
    it.join(broadcast(cands), "item")
      .groupBy(col("item"), col("min_freq"))
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= col("min_freq"))
      .select(col("item"), col("freq"))
  }
}
