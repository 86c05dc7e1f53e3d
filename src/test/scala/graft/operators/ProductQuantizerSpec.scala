package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.functions.vectors

/** PQ contract: bounded codes, deterministic encode, and ADC recall
  * against exact inner-product search on a clustered fixture.
  */
class ProductQuantizerSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  /** 160 vectors in 16 dims, 4 clusters on two-axis combos plus seeded
    * deterministic noise.
    */
  private def vec(i: Int): Array[Float] = {
    val rnd = new scala.util.Random(i)
    val v = Array.fill(16)((rnd.nextDouble() * 0.2 - 0.1).toFloat)
    val c = i % 4
    v(c) = 1.0f
    v(8 + c) = 0.8f
    v
  }

  private lazy val corpus = (0 until 160).map(i => (i.toLong, vec(i))).toDF("id", "vec")

  private lazy val cb = ProductQuantizer.train(corpus, "id", "vec",
    blocks = 4, codes = 16, iters = 3)

  test("codebook shape and encode bounds") {
    assert(cb.blocks == 4 && cb.blockDim == 4 && cb.codes == 16)
    val enc = ProductQuantizer.encode(corpus, "id", "vec", cb)
    val rows = enc.collect()
    assert(rows.length == 160)
    rows.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length == 4)
      assert(codes.forall(c => c >= 0 && c < 16))
    }
    // deterministic: re-encode is identical
    val again = ProductQuantizer.encode(corpus, "id", "vec", cb).collect()
    assert(again.map(_.toString).toSeq == rows.map(_.toString).toSeq)
  }

  test("ADC search recall vs exact inner-product top-10") {
    val enc = ProductQuantizer.encode(corpus, "id", "vec", cb).cache()
    try {
      val hits = (0 until 8).map { probe =>
        val q = vec(probe * 17)
        val exact = corpus
          .withColumn("s", vectors.dotProduct(col("vec"), lit(q)))
          .orderBy(col("s").desc, col("id")).limit(10)
          .collect().map(_.getLong(0)).toSet
        val pq = ProductQuantizer.search(enc, cb, q, k = 10)
          .collect().map(_.getLong(0)).toSet
        (exact & pq).size
      }
      val recall = hits.sum.toDouble / (8 * 10)
      assert(recall >= 0.6, s"ADC recall@10 too low: $recall (hits=$hits)")
    } finally enc.unpersist()
  }

  test("IVF-PQ: cell pruning composes with ADC search") {
    import graft.store.IvfIndex
    // Train 4 IVF cells, assign, then PQ-encode; a probe searches ONLY
    // its cell's codes — the standard two-level index: partition prune
    // by centroid, then compressed rescoring inside the cell.
    val seeds = IvfIndex.trainSeeds(corpus, "id", "vec", k = 4, iters = 3)
    val assigned = Similarity.ivfAssign(corpus, "id", "vec",
      seeds, "cell_id", "seed_vec")
    val enc = ProductQuantizer.encode(assigned, "id", "vec", cb)
      .join(assigned.select(col("id"), col("cell")), "id")
      .cache()
    try {
      val q = vec(34)
      // probe cell = argmax over the trained seeds, driver-side
      val seedRows = seeds.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      def dot(a: Array[Float], b: Array[Float]) =
        a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val probeCell = seedRows.maxBy { case (id, v) => (dot(v, q), -id) }._1

      val inCell = ProductQuantizer.search(
        enc.filter(col("cell") === probeCell).drop("cell"), cb, q, k = 5)
        .collect().map(_.getLong(0))
      assert(inCell.length == 5)
      // Every hit must come from the probed cell…
      val cellIds = assigned.filter(col("cell") === probeCell)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(inCell.forall(cellIds.contains))
      // …and in-cell ADC agrees with in-cell full-corpus ADC restricted
      // to the cell (pruning must not change in-cell ranking).
      val full = ProductQuantizer.search(enc.drop("cell"), cb, q, k = 160)
        .collect().map(_.getLong(0)).filter(cellIds.contains).take(5)
      assert(inCell.toSeq == full.toSeq)
    } finally enc.unpersist()
  }

  test("search plan reads only the codes column (vectors never touched)") {
    val enc = ProductQuantizer.encode(corpus, "id", "vec", cb)
    val plan = ProductQuantizer.search(enc, cb, vec(0), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("vec#") && !plan.contains("dot_product"),
      "ADC search must not read or rescore raw vectors")
  }

  test("residual ADC at a tiny code budget beats raw ADC on recall") {
    // Fixture where coarse and fine structure land in the SAME block:
    // cluster c puts mass on dims (c, 8+c), sub-pattern s on dims
    // (s, 12+s) — block 0 carries c×s = 16 combined patterns, so a
    // 4-codeword raw codebook cannot cover it, while the residual
    // (sub-pattern + noise, 4 patterns per block) fits exactly — the
    // Jégou IVF-PQ argument, observable as a recall gap.
    def vec2(i: Int): Array[Float] = {
      val rnd = new scala.util.Random(1000 + i)
      val v = Array.fill(16)((rnd.nextDouble() * 0.1 - 0.05).toFloat)
      val c = i % 4
      val s = (i / 4) % 4
      v(c) += 1.0f
      v(8 + c) += 0.8f
      v(s) += 0.5f
      v(12 + s) += 0.4f
      v
    }
    val corpus2 = (0 until 160).map(i => (i.toLong, vec2(i)))
      .toDF("id", "vec")
    val coarse = Array.tabulate(4) { c =>
      val v = Array.fill(16)(0.0f)
      v(c) = 1.0f
      v(8 + c) = 0.8f
      v
    }
    val dots = array(coarse.toIndexedSeq.map(cv =>
      vectors.dotProduct(col("vec"), lit(cv))): _*)
    val withRes = corpus2
      .select(col("id"), col("vec"),
        (array_position(dots, array_max(dots)) - 1).cast("int").as("cell"))
      .select(col("id"), col("cell"),
        ProductQuantizer.residualCol(col("vec"), col("cell"), coarse)
          .as("rv"))
      .cache()
    try {
      val cbRes = ProductQuantizer.train(withRes, "id", "rv",
        blocks = 4, codes = 4, iters = 3)
      val cbRaw = ProductQuantizer.train(corpus2, "id", "vec",
        blocks = 4, codes = 4, iters = 3)
      val encRes = withRes.select(col("id"), col("cell"),
        ProductQuantizer.codesCol(col("rv"), cbRes).as("codes")).cache()
      val encRaw = ProductQuantizer.encode(corpus2, "id", "vec", cbRaw)
        .cache()
      try {
        val (resHits, rawHits) = (0 until 8).map { probe =>
          val q = vec2(probe * 17)
          val exact = corpus2
            .withColumn("s", vectors.dotProduct(col("vec"), lit(q)))
            .orderBy(col("s").desc, col("id")).limit(10)
            .collect().map(_.getLong(0)).toSet
          val res = encRes
            .withColumn("score", ProductQuantizer.adcResidualScoreCol(
              col("cell"), col("codes"), cbRes, coarse, q))
            .orderBy(col("score").desc, col("id")).limit(10)
            .collect().map(_.getLong(0)).toSet
          val raw = ProductQuantizer.search(encRaw, cbRaw, q, k = 10)
            .collect().map(_.getLong(0)).toSet
          ((exact & res).size, (exact & raw).size)
        }.unzip
        assert(resHits.sum >= rawHits.sum,
          s"residual recall must not lose to raw at the same budget: " +
            s"res=$resHits raw=$rawHits")
        assert(resHits.sum.toDouble / 80 >= 0.5,
          s"residual ADC recall@10 floor: ${resHits.sum / 80.0}")
      } finally { encRes.unpersist(); encRaw.unpersist() }
    } finally withRes.unpersist()
  }
}
