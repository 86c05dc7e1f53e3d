package graft

import org.scalatest.funsuite.AnyFunSuite

/** The native expressions must be reachable from plain SQL. Uses the
  * live-session register path (the shared TestSession already exists, so
  * the config-based `spark.sql.extensions` route — same builders — can't
  * be re-applied in this JVM).
  */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSession.spark
    GraftExtensions.register(s)
    s
  }

  test("cosine_similarity and dot_product are SQL-callable") {
    val r = spark.sql(
      """SELECT
        | cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                   array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
        | dot_product(array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)),
        |             array(CAST(4.0 AS FLOAT), CAST(5.0 AS FLOAT))) AS d
        |""".stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 23.0)
  }

  test("minhash_slices is SQL-callable and matches the column API") {
    val sql = spark.sql(
      "SELECT minhash_slices(array('alpha beta', 'beta gamma'))")
      .head().getSeq[Long](0)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val api = Seq(Seq("alpha beta", "beta gamma")).toDF("sh")
      .select(graft.functions.text.minhashSlices(col("sh"), 4))
      .head().getSeq[Long](0)
    assert(sql == api)
  }

  test("minhash_slices accepts a BIGINT band count and empty arrays") {
    // Regression: asInstanceOf[Int] on a BIGINT literal threw CCE; and an
    // empty (non-nullable) array child must yield null, which requires the
    // expression to declare itself nullable for codegen to compile.
    val r = spark.sql(
      """SELECT minhash_slices(array('a b'), CAST(2 AS BIGINT)) AS m2,
        |       minhash_slices(CAST(array() AS ARRAY<STRING>)) AS me
        |""".stripMargin).head()
    assert(r.getSeq[Long](0).length == 2)
    assert(r.isNullAt(1))
  }

  test("shingles is SQL-callable; short arrays yield empty, not a crash") {
    val r = spark.sql(
      """SELECT shingles(array('a','b','c','d'), 3) AS sh3,
        |       shingles(array('a','b'), 3) AS short,
        |       shingles(CAST(array() AS ARRAY<STRING>), 3) AS empty
        |""".stripMargin).head()
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r.getSeq[String](1) == Seq.empty)
    assert(r.getSeq[String](2) == Seq.empty)
  }

  test("split_recursive generator matches the flatMap splitter from SQL") {
    import spark.implicits._
    val texts = Seq("aa bb cc dd", ("word " * 80).trim, "solo")
    texts.toDF("text").createOrReplaceTempView("split_in")
    val sql = spark.sql(
      """SELECT text, chunk_idx, chunk FROM split_in
        |LATERAL VIEW split_recursive(text, 100, 30) t AS chunk_idx, chunk
        |""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val expected = texts.flatMap(t =>
      graft.text.Splitters.recursiveCharSplit(t, 100, 30)
        .zipWithIndex.map { case (c, i) => (t, i.toLong, c) })
    assert(sql.sortBy(x => (x._1, x._2)).toSeq ==
      expected.sortBy(x => (x._1, x._2)))
    assert(sql.length > texts.length) // the long text actually split
  }

  test("extensions class wires the same catalog (constructor path)") {
    // The class applies the same builders through injectFunction; verify
    // it is constructible and iterates the full catalog.
    assert(GraftExtensions.functions.map(_._1.funcName) ==
      Seq("cosine_similarity", "dot_product", "minhash_slices",
        "shingles", "bpe_segment", "split_recursive"))
    new GraftExtensions() // must not throw
  }

  test("bpe_segment is SQL-callable and matches the column API; bad specs fail loudly") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq("hugs", "pug", "bun", "").toDF("w")
    df.createOrReplaceTempView("bpe_words")
    val viaSql = spark.sql(
      "SELECT w, bpe_segment(w, 'u g,h ug') AS s FROM bpe_words")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val viaCol = df.select(col("w"),
      graft.functions.text.bpeSegment(col("w"),
        Seq(("u", "g"), ("h", "ug"))).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(viaSql == viaCol)
    assert(viaSql("hugs") == Seq("hug", "s"))
    assert(viaSql("") == Seq.empty[String])
    // empty merge spec = character segmentation
    val chars = spark.sql(
      "SELECT bpe_segment('abc', '') AS s").head().getSeq[String](0)
    assert(chars == Seq("a", "b", "c"))
    val e = intercept[Exception] {
      spark.sql("SELECT bpe_segment('x', 'nopair') ").collect()
    }
    assert(e.getMessage.contains("not 'left right'"))
  }
}
