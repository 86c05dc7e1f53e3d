package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

class BigramLmSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  // Trusted rows 1–2 train the model; 3 shares their vocabulary but
  // scrambles the transitions; 4 is out-of-vocabulary entirely.
  private val docs = Seq(
    (1L, "the cat sat on the mat", true),
    (2L, "the cat ran on the mat", true),
    (3L, "mat the on cat the sat", false),
    (4L, "zebra quark flux boson", false),
    (5L, "x", false)) // single token: no bigram
    .toDF("doc_id", "text", "trusted")

  private def scored = BigramLm.scoreDocs(docs, "doc_id", "text",
    col("trusted")).collect().map(r =>
    r.getLong(0) -> ((r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap

  test("hand-computed log-probs: seen bigram vs unseen vs unseen context") {
    // Trusted counts: c1(the)=4, c1(cat)=2, c1(sat)=1, c1(on)=2,
    // c1(mat)=2, c1(ran)=1 -> V=6. lp(the,cat) = ln((2+1)/(4+6)).
    val m = scored
    val lpTheCat = math.floor(math.log(3.0 / 10.0) * 1e6).toLong
    val lpCatSat = math.floor(math.log(2.0 / 8.0) * 1e6).toLong
    val lpSatOn = math.floor(math.log(2.0 / 7.0) * 1e6).toLong
    val lpOnThe = math.floor(math.log(3.0 / 8.0) * 1e6).toLong
    val lpTheMat = math.floor(math.log(3.0 / 10.0) * 1e6).toLong
    val (n1, sum1, _) = m(1L)
    assert(n1 == 5L)
    assert(sum1 == lpTheCat + lpCatSat + lpSatOn + lpOnThe + lpTheMat)
  }

  test("scrambled transitions score below the in-model documents") {
    val m = scored
    assert(m(3L)._3 < m(1L)._3 && m(3L)._3 < m(2L)._3,
      s"doc 3 reuses the vocabulary but not the transitions: $m")
  }

  test("out-of-vocabulary text scores at the unseen-context floor") {
    // Every doc-4 bigram prices at ln(1/(0+6)): unseen context, V=6.
    val m = scored
    val floor = math.floor(math.log(1.0 / 6.0) * 1e6).toLong
    assert(m(4L)._1 == 3L && m(4L)._2 == 3L * floor)
    // Add-one artifact worth pinning: the unseen-CONTEXT price 1/V sits
    // ABOVE an in-vocab context's unseen-transition price 1/(c1+V), so
    // OOV text lands below the trusted docs but not necessarily below
    // in-vocab scrambles — the gate pairs with d40's unigram score,
    // which catches pure-OOV text unambiguously.
    assert(m(4L)._3 < m(1L)._3 && m(4L)._3 < m(2L)._3)
  }

  test("a bigram-less document survives with zero counts and a null mean") {
    val m = scored
    assert(m(5L)._1 == 0L && m(5L)._2 == 0L && m(5L)._3.isNaN)
  }
}
