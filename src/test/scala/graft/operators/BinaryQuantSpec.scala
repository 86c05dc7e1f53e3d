package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

class BinaryQuantSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def randVecs(n: Int, dim: Int, seed: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong,
      Seq.fill(dim)(rnd.nextFloat() * 2f - 1f)))
  }

  test("quantize packs exactly like the driver-side pack, ragged dims included") {
    for (dim <- Seq(32, 40, 64, 65)) {
      val vecs = randVecs(50, dim, seed = dim) ++
        // sign corners: all-zero, all-negative, single positive at the tail
        Seq((100L, Seq.fill(dim)(0f)), (101L, Seq.fill(dim)(-1f)),
          (102L, Seq.fill(dim - 1)(0f) :+ 1f))
      val got = BinaryQuant.quantize(
        vecs.toDF("vec_id", "embedding"), "embedding", dim)
        .select(col("vec_id"), col("bsig"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
      vecs.foreach { case (id, v) =>
        assert(got(id).sameElements(BinaryQuant.pack(v.toArray)),
          s"dim=$dim id=$id")
      }
      assert(got(100L).forall(_ == 0L), "zero components must pack to 0 bits")
    }
  }

  test("hamming equals reference popcount over the packed words") {
    val dim = 64
    val vecs = randVecs(80, dim, seed = 3)
    val q = vecs(7)._2.toArray
    val qp = BinaryQuant.pack(q)
    val got = BinaryQuant.quantize(vecs.toDF("vec_id", "embedding"), "embedding", dim)
      .select(col("vec_id"),
        BinaryQuant.hamming(col("bsig"), lit(qp)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.foreach { case (id, v) =>
      val want = BinaryQuant.pack(v.toArray).zip(qp)
        .map { case (a, b) => java.lang.Long.bitCount(a ^ b).toLong }.sum
      assert(got(id) == want, s"id=$id")
    }
    assert(got(7L) == 0L, "self-distance must be 0")
  }

  test("knnRescore is exact when candidates = |corpus|, and guards hold") {
    val sf = TestSession.sf
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val n = e.count().toInt
    val q = e.filter(col("vec_id") === 42).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val exact = Similarity.knn(e, "vec_id", "embedding", q, k = 10)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    val viaBinary = BinaryQuant.knnRescore(e, "vec_id", "embedding", q,
      k = 10, candidates = n)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    assert(viaBinary == exact,
      "with candidates = |corpus| the rescore must reproduce exact knn")
    // the working point keeps useful recall on the real corpus
    val at50 = BinaryQuant.knnRescore(e, "vec_id", "embedding", q,
      k = 10, candidates = 50)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(at50.intersect(exact.toSet).size >= 5,
      s"recall@50 collapsed: ${at50.intersect(exact.toSet).size}/10")
    intercept[IllegalArgumentException](
      BinaryQuant.knnRescore(e, "vec_id", "embedding", q, k = 5, candidates = 4))
    intercept[IllegalArgumentException](
      BinaryQuant.quantize(e.withColumn("bsig", lit(1L)), "embedding", 64))
  }
}
