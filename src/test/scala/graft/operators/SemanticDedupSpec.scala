package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.functions.vectors

/** SemDeDup composition contract: the within-cell pair set is exactly
  * the all-pairs set restricted to cell-sharing pairs (⊆ exact pairs,
  * with scores bit-identical), and the keeper policy always preserves
  * each dup group's minimum. The end-to-end arithmetic is oracle-pinned
  * (v09_semantic_dedup).
  */
class SemanticDedupSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  /** 90 vectors around 3 axis-aligned clusters with seeded noise, plus
    * planted near-identical twins inside each cluster (ids 60+i is a
    * tiny perturbation of id i) so pairs exist at a high threshold.
    */
  private def vec(i: Int): Array[Float] = {
    if (i >= 60) {
      val base = vec(i - 60)
      base.zipWithIndex.map { case (x, j) => x + (if (j == 7) 0.01f else 0f) }
    } else {
      val rnd = new scala.util.Random(i)
      val v = Array.fill(8)((rnd.nextDouble() * 0.2 - 0.1).toFloat)
      v((i % 3) * 2) = 1.0f
      v
    }
  }

  private lazy val corpus =
    (0 until 90).map(i => (i.toLong, vec(i))).toDF("id", "vec")

  private val T = 0.98

  private def exactPairs(): Set[(Long, Long)] =
    corpus.as("a").join(corpus.as("b"), col("a.id") < col("b.id"))
      .withColumn("score",
        vectors.cosineSimilarity(col("a.vec"), col("b.vec")))
      .filter(col("score") >= T)
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("within-cell pairs ⊆ exact all-pairs, and equal restricted to shared cells") {
    val codebook = KMeans.lloyd(corpus, "id", "vec", k = 3, iters = 3)
    val assigned = Similarity.ivfAssign(corpus, "id", "vec",
      codebook, "seed_id", "seed_vec")
    val got = SemanticDedup.withinCellPairs(assigned, "id", "vec", T)
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = exactPairs()
    assert(got.subsetOf(exact),
      s"semantic pairs must be a subset of exact pairs: extra = ${got -- exact}")
    // and it is EXACTLY the cell-sharing restriction — nothing inside a
    // cell is missed (completeness within the composition's contract).
    val cellOf = assigned.select(col("id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = exact.filter { case (a, b) => cellOf(a) == cellOf(b) }
    assert(got == want,
      s"within-cell pairs must equal cell-restricted exact pairs: " +
        s"missing = ${want -- got}, extra = ${got -- want}")
    assert(got.nonEmpty, "fixture degenerated: no within-cell pairs found")
  }

  test("scores are bit-identical to direct cosine (no composition drift)") {
    val pairs = SemanticDedup.semanticDupPairs(
      corpus, "id", "vec", k = 3, iters = 2, threshold = T)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    val byId = (0 until 90).map(i => i.toLong -> vec(i)).toMap
    pairs.foreach { case ((a, b), s) =>
      val direct = corpus.sparkSession.range(1)
        .select(vectors.cosineSimilarity(lit(byId(a)), lit(byId(b))))
        .head().getDouble(0)
      assert(s == direct, s"pair ($a,$b) score drifted: $s vs $direct")
    }
  }

  test("keeper policy: every dup group's minimum survives, drops have a smaller kept partner") {
    val kept = SemanticDedup.dropSemanticDuplicates(
      corpus, "id", "vec", k = 3, iters = 3, threshold = T)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val pairs = SemanticDedup.semanticDupPairs(
      corpus, "id", "vec", k = 3, iters = 3, threshold = T)
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture degenerated: no pairs to dedup")
    // dropped = exactly the b-side ids; the a-side minimum of any pair
    // chain is never a b_id, so it survives.
    val doomed = pairs.map(_._2).toSet
    assert(kept == (0L until 90L).toSet -- doomed)
    pairs.foreach { case (a, b) =>
      assert(kept.contains(a) || doomed.contains(a)) // a dropped only via some smaller partner
    }
    val minId = pairs.map(_._1).min
    assert(kept.contains(minId), "the global minimum of all pairs must be kept")
  }

  test("cross-corpus leaks: flagged set matches brute force, argmax ties to smaller eval id") {
    // eval = ids 0–29, train = 30–89; the planted twins (60+i ~ i) put
    // train ids 60–89 semantically on top of eval ids 0–29.
    val eval = corpus.filter(col("id") < 30)
    val train = corpus.filter(col("id") >= 30)
    val got = SemanticDedup.crossSemanticLeaks(train, eval, "id", "vec", T)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    // brute-force reference: per train id, the max-score eval partner
    val ref = train.select(col("id").as("tid"), col("vec").as("tv"))
      .crossJoin(eval.select(col("id").as("eid"), col("vec").as("ev")))
      .withColumn("score", vectors.cosineSimilarity(col("tv"), col("ev")))
      .filter(col("score") >= T)
      .collect().map(r => (r.getAs[Long]("tid"), r.getAs[Long]("eid"),
        r.getAs[Double]("score")))
      .groupBy(_._1).view.mapValues { rows =>
        val best = rows.map(_._3).max
        (rows.filter(_._3 == best).map(_._2).min, best)
      }.toMap
    assert(got == ref, s"got $got\nref $ref")
    // the fixture's clusters are axis-aligned, so every flagged train
    // doc's worst offender must come from its OWN cluster (id % 3)
    assert(got.nonEmpty, "fixture degenerated: nothing flagged")
    got.foreach { case (tid, (eid, score)) =>
      assert(tid % 3 == eid % 3,
        s"train $tid argmax eval $eid crosses clusters")
      assert(score >= T)
    }
  }

  test("an input emptied by earlier gates degrades to a no-op, not an abort") {
    // The semantic stage runs AFTER the quality/dedup gates, so an empty
    // shard is a reachable input — it must yield zero pairs / the input
    // unchanged rather than tripping lloyd's empty-corpus require.
    val empty = corpus.filter(col("id") < 0)
    val pairs = SemanticDedup.semanticDupPairs(
      empty, "id", "vec", k = 3, iters = 3, threshold = T)
    assert(pairs.columns.toSeq == Seq("cell", "a_id", "b_id", "score"))
    assert(pairs.isEmpty)
    assert(SemanticDedup.dropSemanticDuplicates(
      empty, "id", "vec", k = 3, iters = 3, threshold = T).isEmpty)
  }
}
