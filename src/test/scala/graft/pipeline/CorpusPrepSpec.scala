package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSession}

class CorpusPrepSpec extends AnyFunSuite {
  import TestSession.{sf, spark}
  import spark.implicits._

  test("prepare on synthetic rows: filter, dedup, stamp, split") {
    val base = "spark table scan query join filter agg window sort merge"
    val docs = Seq(
      (1L, base),
      (2L, base), // exact dup → dropped
      (3L, base + " tail"), // near dup of 1 → dropped at 0.8
      (4L, "tiny doc"), // < 5 tokens → dropped
      (5L, "the the the the the the the the the a"), // all stopwords → dropped
      (6L, "a completely different corpus document with many fresh words inside"))
      .toDF("doc_id", "text")
    val out = CorpusPrep.prepare(docs, "doc_id", "text").collect()
    assert(out.map(_.getLong(0)).sorted.toSeq == Seq(1L, 6L))
    out.foreach { r =>
      assert(Set("train", "val", "test").contains(r.getAs[String]("split")))
      assert(r.getAs[String]("detected_lang").nonEmpty)
    }
  }

  test("prepare runs on the real documents table and keeps most docs") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val out = CorpusPrep.prepare(docs, "doc_id", "text")
    val kept = out.count()
    // near-dups exist in the corpus, so some rows must drop — but the
    // pass must not decimate it.
    assert(kept < n && kept > n / 2, s"kept $kept of $n")
    // split is deterministic: same result on a second run
    assert(out.select("doc_id", "split").collect().toSet ==
      CorpusPrep.prepare(docs, "doc_id", "text")
        .select("doc_id", "split").collect().toSet)
  }
}
