package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

class Bm25Spec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark spark engine core"), // tf-heavy on "spark" only
    (2L, "spark query"), // short, both terms
    (3L, "a completely unrelated document about gardening and soil"),
    (4L, "query query query query query query query query query query"))
    .toDF("doc_id", "text")

  test("docs containing the query terms outscore docs that do not") {
    val scores = Bm25.score(docs, "doc_id", "text", Seq("spark", "query"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(3L) == 0.0)
    assert(scores(1L) > 0 && scores(2L) > 0 && scores(4L) > 0)
    // Doc 2 hits BOTH terms in a short doc — it must beat the
    // single-term docs despite their higher raw tf (saturation + length
    // normalization, the two properties that make BM25 BM25).
    assert(scores(2L) > scores(1L))
    assert(scores(2L) > scores(4L))
  }

  test("tf saturation: 10x repetition does not give 10x score") {
    val scores = Bm25.score(docs, "doc_id", "text", Seq("query"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(4L) < scores(2L) * 3,
      s"k1 saturation should bound repetition gains: ${scores(4L)} vs ${scores(2L)}")
  }

  test("duplicate query terms are counted once") {
    val a = Bm25.score(docs, "doc_id", "text", Seq("spark", "spark", "query"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val b = Bm25.score(docs, "doc_id", "text", Seq("spark", "query"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(a == b)
  }
}
