package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Quantize/dequantize contract: per-component error <= scale/2 (the
  * round-half-up bound), codes span the full int8 range symmetrically,
  * zero vectors survive untouched, and the whole thing is a row-local
  * projection. Per-value arithmetic parity is oracle-pinned (v10).
  */
class ScalarQuantSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def vec(i: Int): Array[Float] = {
    val rnd = new scala.util.Random(i)
    Array.fill(16)((rnd.nextDouble() * 4 - 2).toFloat)
  }

  private lazy val corpus =
    ((0 until 50).map(i => (i.toLong, vec(i))) :+
      (99L, Array.fill(16)(0.0f))) // all-zero vector
      .toDF("id", "vec")

  test("round-trip error is bounded by scale/2 per component; zeros exact") {
    val out = ScalarQuant.dequantize(
      ScalarQuant.quantize(corpus, "vec"), "codes", "scale", "deq")
      .select(col("id"), col("vec"), col("scale"), col("codes"), col("deq"))
      .collect()
    out.foreach { r =>
      val v = r.getSeq[Float](1)
      val scale = r.getDouble(2)
      val codes = r.getSeq[Byte](3)
      val deq = r.getSeq[Double](4)
      assert(codes.length == v.length && deq.length == v.length)
      if (v.forall(_ == 0f)) {
        assert(scale == 0.0 && codes.forall(_ == 0) && deq.forall(_ == 0.0))
      } else {
        assert(scale > 0)
        codes.foreach(c => assert(c >= -127 && c <= 127, s"code $c out of range"))
        v.zip(deq).foreach { case (x, d) =>
          assert(math.abs(d - x.toDouble) <= scale / 2 + 1e-12,
            s"component error ${math.abs(d - x.toDouble)} > scale/2 ${scale / 2}")
        }
        // the max-magnitude component quantizes to exactly +-127
        assert(codes.map(c => math.abs(c.toInt)).max == 127,
          "symmetric scaling must use the full code range")
      }
    }
  }

  test("knnQuantizedRescore == exact knn when candidates cover the corpus") {
    val query = vec(7)
    val exact = Similarity.knn(corpus, "id", "vec", query, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val rescored = Similarity.knnQuantizedRescore(
      corpus, "id", "vec", query, k = 10, candidates = 51)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(rescored == exact,
      "with candidates = |corpus| the rescore must reproduce exact knn")
    // a narrow candidate set still returns k rows, scored exactly
    val narrow = Similarity.knnQuantizedRescore(
      corpus, "id", "vec", query, k = 5, candidates = 5)
      .collect()
    assert(narrow.length == 5)
    val exactScores = exact.toMap
    narrow.foreach { r =>
      // every returned exact score matches the true cosine when the id
      // is also in the exact top-10 (quantization may reorder ranks,
      // never alter the exact rescore arithmetic)
      exactScores.get(r.getLong(0)).foreach(s => assert(r.getDouble(2) == s))
    }
  }

  test("quantize rejects input frames already carrying scale/codes columns") {
    // withColumn replaces silently — an existing column of either name
    // would be destroyed, and knnQuantizedRescore inherits the hazard on
    // arbitrary corpus frames.
    Seq("scale", "codes").foreach { c =>
      val e = intercept[IllegalArgumentException](
        ScalarQuant.quantize(corpus.withColumn(c, lit(1.0)), "vec"))
      assert(e.getMessage.contains(c))
    }
  }

  test("quantization is a row-local projection — no shuffle, no UDF in the plan") {
    val p = ScalarQuant.quantize(corpus, "vec")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"quantize must not shuffle:\n${p.take(400)}")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      "quantize must stay inside codegen'd expressions")
  }
}
