package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

class SketchesSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def kmvEst(values: Seq[Long], k: Int, parts: Int): Double = {
    val f = udaf(new Sketches.KmvDistinct(k),
      org.apache.spark.sql.Encoders.scalaLong)
    values.toDF("h").repartition(parts)
      .agg(f(col("h")))
      .head().getDouble(0)
  }

  test("dictEncode assigns contiguous key-ordered dense ids, partition-invariant") {
    // sparse 64-bit-ish keys with duplicates across partitions
    val keys = Seq(9999999999L, 17L, 8888888888L, 17L, 42L, 9999999999L,
      1234567890123L)
    val enc = Sketches.dictEncode(
      keys.toDF("k").repartition(5), "k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._2)
    val want = keys.distinct.sorted.zipWithIndex
      .map { case (k, i) => (k, i.toLong) }
    assert(enc == want,
      s"dense ids must be [0, n) in key order:\n got: $enc\nwant: $want")
    // the paved path composes with BitmapState: capacity = n, not
    // max(key)+1 — the exact contract the guard's message points at.
    val n = enc.length
    val st = udaf(new Sketches.BitmapState(n),
      org.apache.spark.sql.Encoders.scalaLong)
    val bits = enc.map(_._2).toDF("dense_id").repartition(3)
      .agg(st(col("dense_id"))).head().getSeq[Long](0)
    assert(bits.map(java.lang.Long.bitCount(_)).sum == n)
  }

  test("KMV is exact below k and partition-invariant always") {
    val small = (1 to 100).map(i => (i % 40) * 104729L) // 40 distinct
    assert(kmvEst(small, k = 256, parts = 1) == 40.0)
    assert(kmvEst(small, k = 256, parts = 7) == 40.0)
    // 20k rows over 10k distinct uniform 32-bit hashes: the k smallest
    // distinct hashes are a function of the SET, so any layout gives the
    // bit-identical estimate.
    // Fibonacci-constant multiply is a 64-bit bijection whose top 32
    // bits are uniform over sequential inputs — a stand-in for hash32
    // without paying 20k md5s in a unit test (java.util.Random(seed)'s
    // first draw is NOT uniform across sequential seeds and skews the
    // order statistics the estimator reads).
    val rnd = new scala.util.Random(42)
    val big = Seq.fill(20000)(rnd.nextInt(10000))
      .map(i => (i * 0x9E3779B97F4A7C15L) >>> 32)
    val e1 = kmvEst(big, k = 256, parts = 1)
    val e13 = kmvEst(big, k = 256, parts = 13)
    assert(e1 == e13, s"layout changed the KMV estimate: $e1 vs $e13")
    val exact = big.distinct.size
    assert(math.abs(e1 - exact) / exact < 0.2,
      s"KMV off by ${math.abs(e1 - exact) / exact} (est $e1, exact $exact)")
  }

  test("KMV merge == sorted distinct union truncated to k (fuzz)") {
    val agg = new Sketches.KmvDistinct(16)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val a = Seq.fill(rnd.nextInt(20))(rnd.nextInt(60).toLong)
        .foldLeft(agg.zero)((b, h) => agg.reduce(b, h))
      val b = Seq.fill(rnd.nextInt(20))(rnd.nextInt(60).toLong)
        .foldLeft(agg.zero)((buf, h) => agg.reduce(buf, h))
      val want = (a ++ b).distinct.sorted.take(16).toSeq
      assert(agg.merge(a, b).toSeq == want)
      assert(agg.merge(b, a).toSeq == want, "merge must be commutative")
    }
  }

  test("KMV ignores nulls and rejects out-of-range hashes") {
    val agg = new Sketches.KmvDistinct(16)
    // null = no element: sentinel inputs leave the state untouched, and
    // the boxed SQL face maps a null box to the same no-op.
    val state = Seq(5L, Sketches.KmvNull, 9L, Sketches.KmvNull, 5L)
      .foldLeft(agg.zero)(agg.reduce)
    assert(state.toSeq == Seq(5L, 9L))
    assert(agg.finish(state) == 2.0)
    val boxed = new Sketches.KmvDistinctBoxed(16)
    val boxedState = Seq[java.lang.Long](5L, null, 9L, null, 5L)
      .foldLeft(boxed.zero)(boxed.reduce)
    assert(boxedState.toSeq == Seq(5L, 9L))
    assert(boxed.finish(boxedState) == 2.0)
    // out-of-contract hashes fail loudly instead of corrupting the
    // estimator: negative and >= 2^32 both throw, on both faces.
    intercept[IllegalArgumentException](agg.reduce(agg.zero, -1L))
    intercept[IllegalArgumentException](agg.reduce(agg.zero, 1L << 32))
    intercept[IllegalArgumentException](boxed.reduce(boxed.zero, -1L))
    // end-to-end: a null-producing hash (hash32 of NULL text) is skipped —
    // the primitive path needs the kmvInput coalesce (a bare primitive
    // encoder would decode NULL as hash 0 and count it).
    val f = udaf(new Sketches.KmvDistinct(16),
      org.apache.spark.sql.Encoders.scalaLong)
    val est = Seq(Some("a"), None, Some("b"), Some("a")).toDF("t")
      .agg(f(Sketches.kmvInput(graft.text.TextFunctions.hash32(col("t")))))
      .head().getDouble(0)
    assert(est == 2.0, s"null text must not count as a distinct hash: $est")
  }

  test("KMV states are storable and mergeable: merge-of-shards == sketch-of-union") {
    // the incremental-corpus pattern: each shard persists its KmvState
    // row; KmvMerge over any subset must equal the direct sketch over
    // that subset's union — fuzz over random shardings.
    val rnd = new scala.util.Random(11)
    val values = Seq.fill(5000)((rnd.nextInt(2000) * 0x9E3779B97F4A7C15L) >>> 32)
    val st = new Sketches.KmvState(64)
    val mg = new Sketches.KmvMerge(64)
    val direct = values.foldLeft(st.zero)(st.reduce)
    for (_ <- 1 to 20) {
      val nShards = 1 + rnd.nextInt(7)
      val states = values.groupBy(_ => rnd.nextInt(nShards)).values
        .map(vs => vs.foldLeft(st.zero)(st.reduce))
      val merged = states.foldLeft(mg.zero)((b, s) =>
        mg.reduce(b, s.toSeq.map(Long.box)))
      assert(merged.toSeq == direct.toSeq,
        s"merge of $nShards shard states drifted from the union sketch")
      assert(mg.finish(merged) == new Sketches.KmvDistinct(64).finish(direct),
        "merged estimate must be the union sketch's estimate")
    }
    // a null state (outer join's missing shard) contributes nothing
    assert(mg.reduce(direct.clone(), null).toSeq == direct.toSeq)
    // end-to-end through Spark: per-group states -> merged estimate ==
    // the one-pass estimate, under a multi-partition layout
    val df = values.zipWithIndex
      .map { case (h, i) => (s"g${i % 5}", h) }.toDF("g", "h")
      .repartition(13)
    val stU = udaf(new Sketches.KmvState(64),
      org.apache.spark.sql.Encoders.scalaLong)
    val mgU = udaf(new Sketches.KmvMerge(64),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[java.lang.Long]]())
    val kmvU = udaf(new Sketches.KmvDistinct(64),
      org.apache.spark.sql.Encoders.scalaLong)
    val est = df.groupBy(col("g")).agg(stU(col("h")).as("state"))
      .agg(mgU(col("state"))).head().getDouble(0)
    val one = df.agg(kmvU(col("h"))).head().getDouble(0)
    assert(est == one, s"sharded $est != one-pass $one")
  }

  test("kmvOverlap: exact inclusion-exclusion below k, layout-invariant, extra labels ignored") {
    // below k the KMV estimates are exact counts, so the overlap row
    // must be exactly right: |A|=60, |B|=50, |A∩B|=30, |A∪B|=80.
    def h(x: Int): Long = (x * 0x9E3779B97F4A7C15L) >>> 32
    val a = (0 until 60).map(x => (0L, h(x)))
    val b = (30 until 80).map(x => (1L, h(x)))
    val noise = (0 until 40).map(x => (2L, h(1000 + x))) // ignored label
    val stU = udaf(new Sketches.KmvState(128),
      org.apache.spark.sql.Encoders.scalaLong)
    def run(df: org.apache.spark.sql.DataFrame) = {
      val states = df.toDF("corpus", "h")
        .groupBy(col("corpus")).agg(stU(col("h")).as("state"))
      Sketches.kmvOverlap(states, "corpus", "state", 128, 0L, 1L)
        .head()
    }
    val row = run((a ++ b ++ noise).toDF("corpus", "h"))
    assert(row.getDouble(0) == 60.0 && row.getDouble(1) == 50.0 &&
      row.getDouble(2) == 80.0 && row.getDouble(3) == 30.0,
      s"exact overlap wrong: $row")
    assert(math.abs(row.getDouble(4) - 30.0 / 80.0) < 1e-12)
    // layout invariance: any partitioning yields the identical row
    val relaid = run((a ++ b ++ noise).toDF("corpus", "h").repartition(17))
    assert(relaid == row, s"layout changed the overlap row: $relaid vs $row")
    // two empty corpora: every estimate 0 and jaccard 0.0, not 0/0=NaN
    // (data-dependent inputs degrade, they don't poison downstream math)
    val empty = run(Seq.empty[(Long, Long)].toDF("corpus", "h"))
    assert(empty.getDouble(2) == 0.0 && empty.getDouble(4) == 0.0,
      s"empty corpora must report zero overlap, got $empty")
  }

  test("SQL surface: kmv_distinct / heavy_hitters / bottomk_quantiles callable from SQL text") {
    Sketches.registerSql(spark, kmvK = 64, hhK = 4, quantileK = 128)
    // the None row carries a SQL NULL hash: the boxed registry face must
    // skip it (null-in = no-element), not decode it as hash 0
    ((1 to 500).map(i =>
      (Some((i % 30) * 7919L), s"t${i % 3}", (i % 100).toDouble))
      :+ ((Option.empty[Long], "t0", 0.0)))
      .toDF("h", "term", "v").createOrReplaceTempView("sketch_in")
    val row = spark.sql(
      "SELECT kmv_distinct(h) AS nd, heavy_hitters(term) AS hh, " +
        "bottomk_quantiles(h, v) AS q FROM sketch_in")
      .head()
    assert(row.getDouble(0) == 30.0) // below k → exact
    val hh = row.getSeq[org.apache.spark.sql.Row](1)
      .map(r => r.getString(0)).toSet
    assert(hh == Set("t0", "t1", "t2"))
    // 30 distinct (h, v) pairs fit inside k=128 → exact interpolation
    // over the distinct pair values {0,3,...,87} ∪ {19,22,...} — just pin
    // shape and bounds here; exactness is the dedicated test's job.
    val q = row.getSeq[Double](2)
    assert(q.length == 2 && q(0) >= 0 && q(0) <= q(1) && q(1) <= 99.0, s"$q")
  }

  private def bqEst(rows: Seq[(Long, Double)], k: Int, parts: Int): Seq[Double] = {
    val f = udaf(new Sketches.BottomKQuantile(k, Seq(0.25, 0.5, 0.9)),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(java.lang.Long, java.lang.Double)]())
    rows.toDF("h", "v").repartition(parts)
      .agg(f(col("h"), col("v")))
      .head().getSeq[Double](0).toSeq
  }

  test("BottomKQuantile: exact below k, layout-invariant always (fuzz)") {
    // 60 rows with unique hashes: sample == population → the estimate is
    // the exact quantile_cont interpolation over all 60 values.
    val rnd = new scala.util.Random(3)
    val small = Seq.tabulate(60)(i =>
      ((i * 0x9E3779B97F4A7C15L) >>> 32, rnd.nextDouble() * 1000))
    val exact = {
      val vs = small.map(_._2).sorted.toIndexedSeq
      Seq(0.25, 0.5, 0.9).map { p =>
        val rn = (vs.size - 1) * p; val frn = math.floor(rn); val lo = frn.toInt
        if (lo + 1 >= vs.size) vs.last
        else (frn + 1.0 - rn) * vs(lo) + (rn - frn) * vs(lo + 1)
      }
    }
    assert(bqEst(small, k = 128, parts = 1) == exact)
    assert(bqEst(small, k = 128, parts = 7) == exact)
    // 5k rows through a k=64 sketch: any partition layout produces the
    // bit-identical estimate (state is a function of the input set), and
    // the sampled rank error stays within ~O(1/sqrt(k)) of the truth.
    val big = Seq.tabulate(5000)(i =>
      ((i * 0x9E3779B97F4A7C15L) >>> 32, rnd.nextDouble() * 1000))
    val layouts = Seq(1, 7, 32).map(p => bqEst(big, k = 64, parts = p))
    assert(layouts.distinct.size == 1,
      s"layout changed the bottom-k estimate: $layouts")
    val truth = big.map(_._2).sorted.toIndexedSeq
    Seq(0.25, 0.5, 0.9).zip(layouts.head).foreach { case (p, est) =>
      val rank = truth.search(est).insertionPoint.toDouble / truth.size
      assert(math.abs(rank - p) < 0.2,
        s"p=$p estimate $est sits at rank $rank — sample is biased")
    }
  }

  test("BottomKQuantile merge is shape-independent and ignores nulls") {
    val agg = new Sketches.BottomKQuantile(16, Seq(0.5))
    val rnd = new scala.util.Random(9)
    def boxed(p: (Long, Double)): (java.lang.Long, java.lang.Double) =
      (Long.box(p._1), Double.box(p._2))
    for (_ <- 1 to 200) {
      val items = Seq.fill(40)((rnd.nextInt(30).toLong, rnd.nextInt(5).toDouble))
      val (x, y) = items.splitAt(rnd.nextInt(items.size))
      val whole = items.foldLeft(agg.zero)((b, p) => agg.reduce(b, boxed(p)))
      val merged = agg.merge(
        x.foldLeft(agg.zero)((b, p) => agg.reduce(b, boxed(p))),
        y.foldLeft(agg.zero)((b, p) => agg.reduce(b, boxed(p))))
      val want = items.distinct.sorted.take(16)
      assert(whole.toList == want, s"fold state drifted: $whole vs $want")
      assert(merged.toList == want, s"merge state drifted: $merged vs $want")
    }
    val withNull = agg.reduce(
      agg.reduce(agg.zero, (null, Double.box(1.0))),
      (Long.box(1L), null))
    assert(withNull.isEmpty, "null hash or value must contribute nothing")
  }

  test("TopKByScore ≡ window row_number under every layout; guards hold") {
    val rnd = new scala.util.Random(21)
    val rows = Seq.tabulate(3000)(i =>
      (s"g${i % 4}", rnd.nextInt(500).toDouble, i.toLong))
    val want = rows.groupBy(_._1).view.mapValues(
      _.map(t => (t._2, t._3)).sortBy(p => (-p._1, p._2)).take(7)).toMap
    for (parts <- Seq(1, 5, 32)) {
      val f = udaf(new Sketches.TopKByScore(7),
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[(java.lang.Double, java.lang.Long)]())
      val got = rows.toDF("g", "score", "id").repartition(parts)
        .groupBy(col("g")).agg(f(col("score"), col("id")).as("top"))
        .collect()
        .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(p => (p.getDouble(0), p.getLong(1))).toSeq)
        .toMap
      assert(got == want, s"parts=$parts top-k drifted from the window form")
    }
    val agg = new Sketches.TopKByScore(4)
    intercept[IllegalArgumentException](
      agg.reduce(agg.zero, (Double.box(Double.NaN), Long.box(1L))))
    assert(agg.reduce(agg.zero, (null, Long.box(1L))).isEmpty)
    assert(agg.reduce(agg.zero, (Double.box(1.0), null)).isEmpty)
  }

  test("TopKByScoreTagged ≡ window row_number under every layout; payload rides along") {
    val rnd = new scala.util.Random(22)
    // Unique (group, tag) pairs — the contract's totality precondition —
    // with colliding scores so the tag tie-break actually bites.
    val rows = Seq.tabulate(2400)(i =>
      (s"g${i % 4}", rnd.nextInt(40).toLong, f"t${i / 4}%04d", (i * 7).toLong))
    val want = rows.groupBy(_._1).view.mapValues(
      _.map(t => (t._2, t._3, t._4)).sortBy(p => (-p._1, p._2)).take(5)).toMap
    for (parts <- Seq(1, 5, 32)) {
      val f = udaf(new Sketches.TopKByScoreTagged(5),
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[(java.lang.Long, String, java.lang.Long)]())
      val got = rows.toDF("g", "score", "tag", "payload").repartition(parts)
        .groupBy(col("g")).agg(f(col("score"), col("tag"), col("payload")).as("top"))
        .collect()
        .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(p => (p.getLong(0), p.getString(1), p.getLong(2))).toSeq)
        .toMap
      assert(got == want, s"parts=$parts tagged top-k drifted from the window form")
    }
    val agg = new Sketches.TopKByScoreTagged(3)
    assert(agg.reduce(agg.zero, (null, "t", Long.box(1L))).isEmpty)
    assert(agg.reduce(agg.zero, (Long.box(1L), null, Long.box(1L))).isEmpty)
    // null payload is kept (as 0) — the element still ranks
    assert(agg.reduce(agg.zero, (Long.box(1L), "t", null)) ==
      Vector((1L, "t", 0L)))
  }

  test("Misra-Gries: guaranteed hitters survive, counts within n/(k+1), any layout") {
    val k = 20
    // 3 heavy terms (1200/800/500 of n=4000) over a 400-term tail.
    val corpus = Seq.fill(1200)("hot_a") ++ Seq.fill(800)("hot_b") ++
      Seq.fill(500)("hot_c") ++ (0 until 1500).map(i => s"tail_${i % 400}")
    val truth = corpus.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = corpus.size
    val bound = n.toDouble / (k + 1)
    for (parts <- Seq(1, 7, 32)) {
      val f = udaf(new Sketches.HeavyHitters(k))
      val got = scala.util.Random.shuffle(corpus).toDF("term")
        .repartition(parts)
        .agg(f(col("term")))
        .head().getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.size <= k)
      Seq("hot_a", "hot_b", "hot_c").foreach { t =>
        assert(got.contains(t), s"parts=$parts lost guaranteed hitter $t: $got")
      }
      got.foreach { case (t, c) =>
        assert(c <= truth(t), s"parts=$parts overcounted $t: $c > ${truth(t)}")
        assert(c >= truth(t) - bound,
          s"parts=$parts undercounted $t past the bound: $c < ${truth(t)} - $bound")
      }
    }
  }

  /** Reference count-min: md5-slice hashes, d=4 rows, width w. */
  private def cmRef(items: Seq[String], w: Int): Map[(Int, Long), Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    items.flatMap { s =>
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (0 until 4).map(r =>
        (r, java.lang.Long.parseLong(hex.substring(8 * r, 8 * r + 8), 16) % w))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  test("count-min matrix is layout-invariant, pure sums, reference-exact") {
    val rnd = new scala.util.Random(5)
    val items = Seq.fill(3000)(s"item_${rnd.nextInt(200)}")
    val w = 16
    val want = cmRef(items, w)
    def matrix(parts: Int) =
      Sketches.countMin(items.toDF("item").repartition(parts), "item", w)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val m1 = matrix(1)
    assert(m1 == want, "matrix must equal the reference sketch cell for cell")
    assert(matrix(13) == m1, "layout changed the matrix")
    // mergeable: matrix of a union is the cellwise sum of the halves
    val (a, b) = items.splitAt(1300)
    val (ma, mb) = (cmRef(a, w), cmRef(b, w))
    val summed = (ma.keySet ++ mb.keySet).map(k =>
      k -> (ma.getOrElse(k, 0L) + mb.getOrElse(k, 0L))).toMap
    assert(summed == want)
  }

  test("count-min estimates never undercount and match the reference min") {
    val rnd = new scala.util.Random(9)
    val items = Seq.fill(5000)(s"t${rnd.nextInt(60)}")
    val w = 16
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ref = cmRef(items, w)
    val df = items.toDF("item")
    val matrix = Sketches.countMin(df, "item", w)
    val probes = df.groupBy(col("item")).agg(count(lit(1)).as("tf"))
    val got = Sketches.countMinEstimate(matrix, probes, "item", w)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == truth.keySet)
    got.foreach { case (t, (tf, est)) =>
      assert(tf == truth(t))
      assert(est >= tf, s"CM undercounted $t: $est < $tf")
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val want = (0 until 4).map(r => ref(
        (r, java.lang.Long.parseLong(hex.substring(8 * r, 8 * r + 8), 16) % w))).min
      assert(est == want, s"estimate for $t: $est != reference $want")
    }
    // w < distinct count guarantees at least one real overcount here
    assert(got.exists { case (t, (tf, est)) => est > tf },
      "fixture degenerated: no collision bit")
    // unknown probe: buckets may be empty -> estimate coalesces to >= 0
    val unknown = Sketches.countMinEstimate(matrix,
      Seq("never_seen_item").toDF("item"), "item", w)
      .select(col("cm_est")).collect().head.getLong(0)
    assert(unknown >= 0L)
    intercept[IllegalArgumentException](Sketches.countMin(df, "item", 0))
  }

  test("exactHeavyHitters == naive group-by HAVING, any layout (d48's contract)") {
    // Zipf-ish corpus: rank-r term appears ~3000/r times over a long
    // tail, so a relative threshold separates a handful of survivors
    // from hundreds of tail terms the candidate pass must compress away.
    val corpus = (1 to 30).flatMap(r => Seq.fill(3000 / r)(s"term_$r")) ++
      (0 until 2000).map(i => s"tail_$i")
    val n = corpus.size
    val phi = 0.02 // threshold ceil(phi*n) ≈ 250 → ranks 1..~12 qualify
    val want = corpus.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= math.ceil(phi * n).toLong).toMap
    assert(want.size >= 5 && want.size < 30, s"fixture degenerated: $want")
    for (parts <- Seq(1, 7, 32)) {
      val items = scala.util.Random.shuffle(corpus).toDF("term")
        .repartition(parts)
      val got = Sketches.exactHeavyHitters(items, "term", phi)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, s"parts=$parts: got $got want $want")
    }
    // nulls are no-elements, not keys and not threshold mass
    val withNulls = (corpus.map(Option(_)) ++ Seq.fill(500)(Option.empty[String]))
      .toDF("term")
    val gotN = Sketches.exactHeavyHitters(withNulls, "term", phi)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotN == want)
    intercept[IllegalArgumentException](
      Sketches.exactHeavyHitters(corpus.toDF("term"), "term", 0.0))
  }

  test("bitmap distinct: merge-of-day-states equals direct, exact against countDistinct") {
    import org.apache.spark.sql.functions.{col, countDistinct, udaf}
    val cap = 200
    val st = udaf(new Sketches.BitmapState(cap),
      org.apache.spark.sql.Encoders.scalaLong)
    val mg = udaf(new Sketches.BitmapMergeCount(cap),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[java.lang.Long]]())
    val rows = (for (d <- 0 until 5; i <- 0 until 80)
      yield (d.toLong, ((d * 37 + i * 13) % 180).toLong)).toDF("d", "id")
    val want = rows.agg(countDistinct(col("id"))).head().getLong(0)
    val states = rows.groupBy(col("d")).agg(st(col("id")).as("bm"))
    val merged = states.agg(mg(col("bm"))).head().getLong(0)
    assert(merged == want, s"bitmap merge $merged != exact $want")
    // per-day states popcount to per-day exact distincts
    val perDay = states.select(col("d"),
      org.apache.spark.sql.functions.expr(
        "aggregate(transform(bm, w -> bit_count(w)), 0, (a, x) -> a + x)")
        .cast("long").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wantDay = rows.groupBy(col("d")).agg(countDistinct(col("id")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDay == wantDay)
    // out-of-capacity ids fail loudly, never undercount
    val e = intercept[org.apache.spark.SparkException] {
      Seq((1L, 500L)).toDF("d", "id").groupBy(col("d"))
        .agg(st(col("id"))).collect()
    }
    assert(e.getMessage.contains("outside") ||
      e.getCause != null && e.getCause.getMessage.contains("outside"))
    // width mismatch between dictionaries fails loudly
    val other = udaf(new Sketches.BitmapMergeCount(cap * 64),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[java.lang.Long]]())
    val e2 = intercept[org.apache.spark.SparkException] {
      states.agg(other(col("bm"))).collect()
    }
    assert(e2.getMessage.contains("width") ||
      e2.getCause != null && e2.getCause.getMessage.contains("width"))
  }
}
