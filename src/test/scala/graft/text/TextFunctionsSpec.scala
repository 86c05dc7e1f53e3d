package graft.text

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.text.{TextFunctions => TF}

class TextFunctionsSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def shingleRows(texts: String*): Seq[Seq[String]] =
    texts.toDF("text")
      .select(TF.shingles(TF.tokens(col("text")), 3).as("sh"))
      .collect().toSeq.map(r => r.getSeq[String](0))

  test("shingles of a document with >= n tokens") {
    assert(shingleRows("a b c d") == Seq(Seq("a b c", "b c d")))
  }

  test("shingles of a document with < n tokens is empty, not a crash") {
    // Regression: sequence(0, size-n) counts DOWN for short docs, indexing
    // position 0 / out of bounds (ANSI throw). Oracle yields empty lists.
    assert(shingleRows("a b", "a", "") == Seq(Nil, Nil, Nil))
  }

  test("shingles boundary: exactly n tokens yields one shingle") {
    assert(shingleRows("a b c") == Seq(Seq("a b c")))
  }

  test("fixedWindowChunkCol: empty text yields zero chunk rows") {
    // Regression: sequence(0, floor(-1/stride)) = [0, -1] emitted two
    // spurious chunks for an empty document (index -1 reads from the end).
    import org.apache.spark.sql.functions.posexplode
    val got = Seq(("e", ""), ("x", "abcdef"))
      .toDF("id", "text")
      .select(col("id"),
        posexplode(Splitters.fixedWindowChunkCol(col("text"), 4, 3))
          .as(Seq("i", "chunk")))
      .collect().toSeq.map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(got == Seq(("x", 0, "abcd"), ("x", 1, "def")))
  }

  test("shingles of a NULL token array is empty, not null (size contract)") {
    import spark.implicits._
    val r = Seq((1L, null: String)).toDF("id", "text")
      .select(org.apache.spark.sql.functions.size(
        TF.shingles(TF.tokens(org.apache.spark.sql.functions.col("text")), 3))
        .as("n"))
      .head()
    assert(!r.isNullAt(0) && r.getInt(0) == 0)
  }

  test("nearDupPairs survives a corpus containing short and NULL documents") {
    val docs = Seq((1L, "x y"), (2L, "spark table scan query join"),
      (3L, "spark table scan query join"), (4L, null: String))
      .toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((2L, 3L)))
  }
}
