package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSession}
import graft.text.{Bm25, TextFunctions => TF}

/** On-disk inverted-index contract: term-bucket partition pruning
  * visible in the plan, the driver-side bucket hash pinned to the
  * column expression, and search ≡ the scan-scoring path BIT FOR BIT
  * on the candidate set.
  */
class TextIndexSpec extends AnyFunSuite {
  import TestSession.{sf, spark}
  import spark.implicits._

  private val query = Seq("table", "scan", "query")

  private lazy val path = {
    val p = Files.createTempDirectory("graft-textindex").toString
    TextIndex.build(Tables.documents(spark, sf), "doc_id", "text", p,
      nBuckets = 16)
    p
  }

  test("hash32Of mirrors the TF.hash32 column expression") {
    val terms = Seq("table", "scan", "query", "a", "zz never", "spark")
    val want = terms.toDF("t").select(TF.hash32(col("t")))
      .collect().map(_.getLong(0)).toSeq
    assert(terms.map(TextIndex.hash32Of) == want)
  }

  test("search equals Bm25.score's top-k exactly — scores bit for bit") {
    val got = TextIndex.search(spark, path, query, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = Bm25.score(Tables.documents(spark, sf), "doc_id", "text",
        query)
      .orderBy(col("score").desc, col("doc_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want, s"\n got: $got\nwant: $want")
  }

  test("search plan prunes to the query terms' bucket partitions") {
    val df = TextIndex.search(spark, path, query, k = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(400))
    assert("bucket#\\d+ IN|bucket#\\d+ =".r.findFirstIn(plan).isDefined,
      "expected a bucket partition filter in:\n" + plan.take(800))
    // No corpus-scale join: dl rides the posting row.
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
  }

  test("append ≡ one-shot rebuild bit for bit; delete ≡ rebuild without the doc; compact folds files") {
    val docs = Tables.documents(spark, sf)
    def searchAll(p: String) = TextIndex.search(spark, p, query, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // append: base(first 80%) + delta(rest) must equal one-shot.
    val pInc = Files.createTempDirectory("graft-ti-inc").toString
    val cut = 400L
    TextIndex.build(docs.filter(col("doc_id") < cut), "doc_id", "text",
      pInc, nBuckets = 16)
    TextIndex.append(docs.filter(col("doc_id") >= cut), "doc_id", "text",
      pInc)
    val oneShot = searchAll(path)
    assert(searchAll(pInc) == oneShot,
      "append must reproduce the one-shot index bit for bit")
    // delete: scores must equal a REBUILD without the docs (df, n and
    // avgdl all corrected), not just hide the rows.
    val dead = oneShot.take(2).map(_._1)
    TextIndex.delete(spark, pInc, dead)
    TextIndex.delete(spark, pInc, dead) // double delete: no double-correction
    val pWithout = Files.createTempDirectory("graft-ti-wo").toString
    TextIndex.build(docs.filter(!col("doc_id").isin(dead: _*)),
      "doc_id", "text", pWithout, nBuckets = 16)
    assert(searchAll(pInc) == searchAll(pWithout),
      "a tombstoned index must score exactly like a rebuild without the docs")
    // compact: files fold, tombstoned postings reclaimed, search unchanged.
    val want = searchAll(pInc)
    val (before, after) = TextIndex.compact(spark, pInc)
    assert(after < before, s"compact must fold files: $before -> $after")
    assert(spark.read.parquet(s"$pInc/postings")
      .filter(col("doc_id").isin(dead: _*)).count() == 0L,
      "tombstoned postings must be physically gone")
    assert(searchAll(pInc) == want,
      "post-compact search must equal the tombstone-filtered search")
  }

  test("only candidate documents appear; absent terms contribute df 0 without poisoning idf") {
    // 'zz' appears in no document: the query must still score the
    // other term's candidates (df 0 term folds in as part 0).
    val got = TextIndex.search(spark, path, Seq("table", "zz"), k = 5)
      .collect().map(_.getLong(0)).toSeq
    val want = Bm25.score(Tables.documents(spark, sf), "doc_id", "text",
        Seq("table", "zz"))
      .orderBy(col("score").desc, col("doc_id")).limit(5)
      .collect().map(_.getLong(0)).toSeq
    assert(got == want)
    val hits = TextIndex.search(spark, path, Seq("zz"), k = 5).count()
    assert(hits == 0L, "a query of absent terms must return no rows")
  }
}
