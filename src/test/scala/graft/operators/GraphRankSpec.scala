package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

class GraphRankSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int,
      parts: Int = 1): Map[Long, Long] =
    GraphRank.pageRank(
        edges.toDF("src", "dst").repartition(parts), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Driver-side replay of the exact integer recurrence. */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val contrib = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => rank(s) / deg(s) }.sum
      }
      rank = nodes.map(n =>
        n -> (150000L + 85L * contrib.getOrElse(n, 0L) / 100L)).toMap
    }
    rank
  }

  test("hand-computed two-iteration fixture, dangling node included") {
    // 1 -> {2,3}, 2 -> 1; node 3 is dangling (receives, never emits).
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L))
    // iter 1: contrib(1)=1000000/1, contrib(2)=contrib(3)=1000000/2
    //   r1 = (1000000, 575000, 575000)
    // iter 2: contrib(1)=575000, contrib(2)=contrib(3)=1000000/2
    //   r2(1) = 150000 + 85*575000/100 = 638750
    assert(ranksOf(edges, iters = 1) ===
      Map(1L -> 1000000L, 2L -> 575000L, 3L -> 575000L))
    assert(ranksOf(edges, iters = 2) ===
      Map(1L -> 638750L, 2L -> 575000L, 3L -> 575000L))
  }

  test("matches the driver-side replay on a random graph, any layout") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(400)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val want = reference(edges, iters = 3)
    assert(ranksOf(edges, iters = 3, parts = 1) === want)
    assert(ranksOf(edges, iters = 3, parts = 13) === want,
      "partition layout changed the fixed-point ranks")
  }

  test("personalized replay: matches the driver-side recurrence with seeds, any layout") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(400)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val seedSet = (0L until 40L).filter(_ % 5 == 0).toSet
    // Driver replay of the seeded recurrence: r0 = seed·init,
    // rank' = seed·base + damp·Σ(rank_u div deg_u).
    val e = edges.distinct
    val deg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var want = nodes.map(n =>
      n -> (if (seedSet(n)) 1000000L else 0L)).toMap
    for (_ <- 1 to 3) {
      val contrib = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => want(s) / deg(s) }.sum
      }
      want = nodes.map(n =>
        n -> ((if (seedSet(n)) 150000L else 0L) +
          85L * contrib.getOrElse(n, 0L) / 100L)).toMap
    }
    def got(parts: Int) = GraphRank.pageRank(
        edges.toDF("src", "dst").repartition(parts), "src", "dst", 3,
        teleport = Some(seedSet.toSeq.toDF("node")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1) === want)
    assert(got(13) === want, "partition layout changed the seeded ranks")
  }

  test("duplicate input edges collapse before degree counting") {
    // Same edge listed three times must not triple the out-degree.
    val dup = Seq((1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L))
    assert(ranksOf(dup, iters = 1) === ranksOf(Seq((1L, 2L), (2L, 1L)), 1))
  }

  test("personalized teleport: unreachable nodes stay exactly 0; seeds carry base") {
    // Two disconnected components: {1,2} (seeded via 1) and {10,11}.
    // Mass can only flow from seeds, so the whole second component
    // must sit at EXACTLY 0 after any number of rounds, and the seed
    // keeps its per-round base.
    val edges = Seq((1L, 2L), (2L, 1L), (10L, 11L), (11L, 10L))
    val seeds = Seq(1L).toDF("node")
    val got = GraphRank.pageRank(edges.toDF("src", "dst"), "src", "dst",
        iters = 3, assumeDistinct = true, teleport = Some(seeds))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(10L) == 0L && got(11L) == 0L,
      s"unreached component must be exactly 0: $got")
    // Replay: r0 = (1e6, 0); deg = 1 for both.
    // i1: c(2)=1e6, c(1)=0   → r1 = (150000, 850000)
    // i2: c(2)=150000, c(1)=850000 → r2 = (150000+722500, 127500)
    // i3: c(2)=872500, c(1)=127500 → r3 = (150000+108375, 741625)
    assert(got(1L) == 258375L && got(2L) == 741625L, s"got $got")
    // teleport = None stays bit-identical to the unpersonalized form.
    assert(ranksOf(edges, 3) == GraphRank.pageRank(edges.toDF("src", "dst"),
      "src", "dst", 3, teleport = None)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("reliable-checkpoint mode: identical ranks, previous rounds GC'd") {
    // checkpointDir switches the per-iteration truncation to reliable
    // checkpoint() (the fault-tolerant cluster mode). Ranks must be
    // bit-identical to the localCheckpoint form, and the rotation must
    // leave exactly the FINAL iteration's rdd-* dir on storage —
    // iters-1 superseded checkpoints deleted as the loop advanced.
    // Set the context dir explicitly: setCheckpointDir is application-
    // global and another suite may have claimed it already (the helper
    // only adopts the param when none is set).
    val tmp = java.nio.file.Files.createTempDirectory("graft-gr-ckpt").toString
    spark.sparkContext.setCheckpointDir(tmp)
    val rnd = new scala.util.Random(23)
    val edges = Seq.fill(300)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    val got = GraphRank.pageRank(edges.toDF("src", "dst"), "src", "dst",
        iters = 3, checkpointDir = Some(tmp))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === reference(edges, iters = 3))
    assert(got === ranksOf(edges, iters = 3),
      "reliable and local checkpoint modes must agree exactly")
    val ckptRoot = new java.io.File(
      new java.net.URI(spark.sparkContext.getCheckpointDir.get).getPath)
    val rddDirs = Option(ckptRoot.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("rdd-"))
    assert(rddDirs.length == 1,
      s"expected only the final iteration's checkpoint, got: ${rddDirs.map(_.getName)}")
  }

  test("skew-salted contribution join: ranks bit-identical for any salt") {
    // A hub source with out-degree 60 plus a random tail — the shape
    // whose src-keyed join partition the salt exists to spread. The
    // salt must be purely physical: any S gives the same exact ranks.
    val rnd = new scala.util.Random(31)
    val hub = (1L to 60L).map(d => (0L, d))
    val tail = Seq.fill(200)((rnd.nextInt(60).toLong + 1L,
      rnd.nextInt(60).toLong + 1L)).filter { case (a, b) => a != b }
    val edges = hub ++ tail
    val want = reference(edges, iters = 3)
    def salted(s: Int) = GraphRank.pageRank(edges.toDF("src", "dst"),
        "src", "dst", iters = 3, skewSalt = s)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted(0) === want)
    assert(salted(4) === want, "salt 4 changed the exact ranks")
    assert(salted(7) === want, "salt 7 changed the exact ranks")
  }

  test("superseded local checkpoints are unpersisted as the loop advances") {
    // The loop must leave exactly ONE new persisted RDD behind (the
    // final rank frame): the edge/degree/node persists are released in
    // the finally, and each superseded iteration's localCheckpoint
    // blocks are freed by the LineageCheckpoint rotation — not left
    // for the ContextCleaner (the round-13 mid-sweep-inflation suspect).
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    GraphRank.pageRank(edges.toDF("src", "dst"), "src", "dst", iters = 4)
      .collect()
    val leftover = sc.getPersistentRDDs.keySet -- before
    assert(leftover.size == 1,
      s"expected only the final rank frame persisted, found ${leftover.size}")
  }

  test("convergence mode stops at the fixed point and matches deep fixed-iteration runs") {
    val rnd = new scala.util.Random(19)
    val edges = Seq.fill(300)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }
    def fixed(n: Int) = ranksOf(edges, iters = n)
    // The integer dynamics settle well before 40 rounds on this graph:
    // deep fixed-iteration runs agree with each other...
    assert(fixed(40) === fixed(45), "fixture did not reach a fixed point")
    // ...and the converged run must land on the same point while being
    // allowed far more rounds than it needs.
    val conv = GraphRank.pageRank(edges.toDF("src", "dst"), "src", "dst",
        iters = 200, convergeTol = Some(100L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val deep = fixed(40)
    assert(conv.keySet == deep.keySet)
    conv.foreach { case (n, r) =>
      assert(math.abs(r - deep(n)) <= 100L,
        s"node $n: converged $r vs fixed-point ${deep(n)}")
    }
    // An impossible budget fails loudly instead of returning a
    // truncated walk.
    val ex = intercept[IllegalArgumentException] {
      GraphRank.pageRank(edges.toDF("src", "dst"), "src", "dst",
        iters = 1, convergeTol = Some(0L))
    }
    assert(ex.getMessage.contains("converge"))
  }

  /** Driver-side replay of the integer max-normalized HITS rounds. */
  private def hitsReference(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, (Long, Long)] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var hub = nodes.map(_ -> 1000000L).toMap
    var auth = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      val ar = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => hub(s) }.sum }
      val am = ar.values.max
      auth = nodes.map(n =>
        n -> 1000000L * ar.getOrElse(n, 0L) / am).toMap
      val hr = e.groupBy(_._1).map { case (s, es) =>
        s -> es.map { case (_, d) => auth(d) }.sum }
      val hm = hr.values.max
      hub = nodes.map(n => n -> 1000000L * hr.getOrElse(n, 0L) / hm).toMap
    }
    nodes.map(n => n -> (hub(n), auth(n))).toMap
  }

  test("hits: matches the driver-side replay on a random bipartite graph, any layout") {
    val rnd = new scala.util.Random(13)
    // customers -1..-20, parts 0..29 — bipartite, so hub and auth
    // populations separate and dangling sides exercise the coalesces
    val edges = Seq.fill(300)(
      (-(rnd.nextInt(20) + 1).toLong, rnd.nextInt(30).toLong)).distinct
    val want = hitsReference(edges, iters = 2)
    def got(parts: Int) = GraphRank.hits(
        edges.toDF("src", "dst").repartition(parts), "src", "dst", iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1) === want)
    assert(got(13) === want, "partition layout changed the HITS scores")
    // max-normalization contract: the best hub and best auth sit at
    // exactly one unit, everything in [0, unit]
    val g = got(1)
    assert(g.values.map(_._1).max == 1000000L)
    assert(g.values.map(_._2).max == 1000000L)
    assert(g.values.forall { case (h, a) =>
      h >= 0 && h <= 1000000L && a >= 0 && a <= 1000000L })
    // bipartite: parts (dst side) never emit, customers never receive
    assert(g.filter(_._1 >= 0).values.forall(_._1 == 0L),
      "a pure destination must have hub 0")
    assert(g.filter(_._1 < 0).values.forall(_._2 == 0L),
      "a pure source must have auth 0")
  }

  test("hits: hand-computed one-round fixture") {
    // customers -1, -2; parts 1, 2, 3.
    // -1 -> {1, 2}; -2 -> {2, 3}
    // a1 raw: part1 = 1e6, part2 = 2e6, part3 = 1e6; max 2e6
    //   auth: part1 = 500000, part2 = 1000000, part3 = 500000
    // h1 raw: c-1 = 1500000, c-2 = 1500000; max 1.5e6 -> both 1e6
    val edges = Seq((-1L, 1L), (-1L, 2L), (-2L, 2L), (-2L, 3L))
    val got = GraphRank.hits(edges.toDF("src", "dst"), "src", "dst", 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map(
      -1L -> (1000000L, 0L), -2L -> (1000000L, 0L),
      1L -> (0L, 500000L), 2L -> (0L, 1000000L), 3L -> (0L, 500000L)))
  }

  test("hits: convergence mode stops at the fixed point; fails loudly when it can't") {
    // The hand fixture reaches its integer fixed point after round 2
    // (round 2 recomputes round 1's scores exactly), so a converged
    // run must equal a deep fixed-iteration run on both chains.
    val edges = Seq((-1L, 1L), (-1L, 2L), (-2L, 2L), (-2L, 3L))
    val deep = GraphRank.hits(edges.toDF("src", "dst"), "src", "dst",
        iters = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val conv = GraphRank.hits(edges.toDF("src", "dst"), "src", "dst",
        iters = 50, convergeTol = Some(0L))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(conv === deep,
      "converged HITS must land on the fixed-iteration fixed point")
    // one round cannot settle from the uniform start (auths move from
    // the uniform base to the computed scores) — must fail loudly, not
    // hand back a half-iterated ranking
    val ex = intercept[IllegalArgumentException] {
      GraphRank.hits(edges.toDF("src", "dst"), "src", "dst",
        iters = 1, convergeTol = Some(0L))
    }
    assert(ex.getMessage.contains("converge"))
  }

  /** Driver-side replay of the synchronous min-tie-break LPA vote. */
  private def lpaReference(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var lbl = nodes.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      val byDst = e.groupBy(_._2)
      lbl = nodes.map { n =>
        n -> byDst.get(n).fold(lbl(n)) { es =>
          es.groupBy { case (s, _) => lbl(s) }.toSeq
            .map { case (l, g) => (g.size, l) }
            .maxBy { case (c, l) => (c, -l) }._2
        }
      }.toMap
    }
    lbl
  }

  test("lpa: matches the driver-side replay on a random symmetric graph, any layout") {
    val rnd = new scala.util.Random(17)
    val base = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    val edges = (base ++ base.map(_.swap)).distinct
    val want = lpaReference(edges, iters = 3)
    def got(parts: Int) = GraphRank.labelPropagation(
        edges.toDF("src", "dst").repartition(parts), "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1) === want)
    assert(got(13) === want, "partition layout changed the LPA labels")
  }

  test("lpa: hand-computed rounds on a 3-node path") {
    // sym path 1—2—3. Round 1 (all votes are single, min tie-break):
    //   1 sees {2} → 2; 2 sees {1,3} → 1; 3 sees {2} → 2.
    // Round 2: 1 sees {lbl(2)=1} → 1; 2 sees {2,2} → 2; 3 sees {1} → 1.
    val base = Seq((1L, 2L), (2L, 3L))
    val edges = (base ++ base.map(_.swap)).distinct
    def run(iters: Int) = GraphRank.labelPropagation(
        edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) === Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
    assert(run(2) === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("lpa: convergence mode reaches the fixed point and fails loudly when it can't") {
    // two disjoint sym triangles reach a fixed point (each collapses
    // to its own min label, then nothing moves)
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L))
    val edges = (tri ++ tri.map(_.swap)).distinct
    val got = GraphRank.labelPropagation(
        edges.toDF("src", "dst"), "src", "dst", iters = 20, converge = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.filterKeys(_ < 10).values.toSet.size == 1)
    assert(got.filterKeys(_ >= 10).values.toSet.size == 1)
    assert(got(1L) != got(10L), "disjoint components must keep distinct labels")
    // a 2-node sym edge 2-cycles forever under sync updates: the
    // convergence contract must fail loudly, not return the oscillation
    val cyc = Seq((1L, 2L), (2L, 1L))
    val err = intercept[IllegalArgumentException] {
      GraphRank.labelPropagation(
        cyc.toDF("src", "dst"), "src", "dst", iters = 5, converge = true)
    }
    assert(err.getMessage.contains("fixed point"))
  }

  test("triangles: hand fixture — K4, a triangle-free square, a pendant, noise edges") {
    // K4 on {1..4}: every node sits in C(3,2) = 3 triangles, degree 3.
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    // square 5-6-7-8-5 without diagonals: degree 2, no triangles.
    val square = Seq((5L, 6L), (6L, 7L), (7L, 8L), (8L, 5L))
    // pendant node 9 on the K4; duplicate/reversed/self edges must
    // collapse before any counting.
    val noise = Seq((9L, 1L), (1L, 9L), (2L, 1L), (3L, 3L), (1L, 2L))
    val got = GraphRank.triangleCounts(
        (k4 ++ square ++ noise).toDF("src", "dst"), "src", "dst")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == Map(1L -> (4L, 3L), 2L -> (3L, 3L), 3L -> (3L, 3L),
      4L -> (3L, 3L)),
      s"only the K4 corners triangulate (node 1 carries the pendant " +
        s"degree): $got")
  }

  test("triangles: ≡ naive triple enumeration on a random graph, any layout") {
    // deterministic pseudo-random graph on 40 nodes, ~20% density
    val n = 40L
    val edges = for {
      i <- 0L until n; j <- (i + 1) until n
      if (i * 31 + j * 17 + i * j) % 5 == 0
    } yield (i, j)
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      .withDefaultValue(Set.empty[Long])
    val naive = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for {
      i <- 0L until n; j <- (i + 1) until n if adj(i)(j)
      k <- (j + 1) until n if adj(i)(k) && adj(j)(k)
      v <- Seq(i, j, k)
    } naive(v) += 1L
    val degree = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val want = naive.toMap.map { case (v, t) => v -> (degree(v), t) }
    for (parts <- Seq(1, 7)) {
      val got = GraphRank.triangleCounts(
          edges.toDF("src", "dst").repartition(parts), "src", "dst")
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .toMap
      assert(got == want, s"parts=$parts: $got vs $want")
    }
  }

  test("rejects nonsensical parameters loudly") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](GraphRank.pageRank(e, "src", "dst", 0))
    intercept[IllegalArgumentException](
      GraphRank.pageRank(e, "src", "dst", 1, dampNum = 101L))
  }
}
