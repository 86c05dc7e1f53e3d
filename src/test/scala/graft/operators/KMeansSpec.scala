package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Lloyd contract: codebook shape, byte-identical determinism, monotone
  * cosine inertia, emptied-cluster stability, and composition with
  * ivfAssign. The single-step arithmetic itself is oracle-pinned
  * (v08_kmeans_step).
  */
class KMeansSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  /** 120 vectors in 8 dims around 3 axis-aligned clusters plus seeded
    * noise — far enough apart that Lloyd must converge to them.
    */
  private def vec(i: Int): Array[Float] = {
    val rnd = new scala.util.Random(i)
    val v = Array.fill(8)((rnd.nextDouble() * 0.2 - 0.1).toFloat)
    v((i % 3) * 2) = 1.0f
    v
  }

  private lazy val corpus =
    (0 until 120).map(i => (i.toLong, vec(i))).toDF("id", "vec")

  test("returns k centroids with members summing to the corpus") {
    val cb = KMeans.lloyd(corpus, "id", "vec", k = 3, iters = 4)
    val rows = cb.orderBy(col("seed_id")).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(2)).sum == 120L)
    assert(rows.forall(_.getSeq[Float](1).length == 8))
  }

  test("deterministic: two runs produce byte-identical codebooks") {
    def run() = KMeans.lloyd(corpus, "id", "vec", k = 3, iters = 3)
      .orderBy(col("seed_id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toList, r.getLong(2)))
      .toList
    assert(run() == run())
  }

  test("cosine inertia is non-decreasing with more iterations") {
    def inertia(iters: Int): Double = {
      val cb = KMeans.lloyd(corpus, "id", "vec", k = 3, iters = iters)
      KMeans.meanAssignedSimilarity(corpus, "vec", cb)
        .head().getDouble(0)
    }
    val i1 = inertia(1)
    val i4 = inertia(4)
    assert(i4 >= i1 - 1e-12, s"mean similarity regressed: $i1 -> $i4")
    assert(i4 > 0.5, s"converged clusters should be tight, got $i4")
  }

  test("an emptied cluster keeps its previous centroid") {
    // 20 IDENTICAL vectors: both seeds score cosine 1.0 for every row,
    // the first-max tie-break sends all rows to cluster 0, and cluster 1
    // is empty from iteration 1 — it must keep its seed centroid instead
    // of NaN-ing out.
    val same = (0 until 20)
      .map(i => (i.toLong, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("id", "vec")
    val cb = KMeans.lloyd(same, "id", "vec", k = 2, iters = 3)
      .orderBy(col("seed_id")).collect()
    assert(cb.length == 2)
    assert(cb.forall(r => r.getSeq[Float](1).forall(x => !x.isNaN)))
    assert(cb.map(_.getLong(2)).toList == List(20L, 0L))
    assert(cb(1).getSeq[Float](1).toList == List(1.0f, 0.0f, 0.0f, 0.0f))
  }

  test("trained codebook feeds ivfAssign: every row lands in a cell") {
    val cb = KMeans.lloyd(corpus, "id", "vec", k = 3, iters = 3)
    val assigned = Similarity.ivfAssign(corpus, "id", "vec",
      cb, "seed_id", "seed_vec")
    assert(assigned.filter(col("cell").isNull).count() == 0)
    assert(assigned.select(col("cell")).distinct().count() == 3)
  }

  test("rejects k larger than the corpus") {
    val tiny = Seq((1L, Array(1.0f, 0.0f))).toDF("id", "vec")
    intercept[IllegalArgumentException] {
      KMeans.lloyd(tiny, "id", "vec", k = 5, iters = 1)
    }
  }
}
