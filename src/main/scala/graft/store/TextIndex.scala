package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.{Bm25, TextFunctions => TF}

/** On-disk inverted text index with PARTITION-PRUNED term lookup — the
  * lexical twin of [[IvfIndex]] (reference: the store the reference
  * queries by text, ingestion-pipeline.py:341–353 / query paths; the
  * reference's engine owns the inverted index — here it is an explicit
  * Spark-native layout). [[graft.text.Bm25.score]] is the right shape
  * for a constant query over a corpus you were scanning anyway; this is
  * the right shape when the corpus is 100 TB and a query must NOT scan
  * it: postings live bucketed by `hash(term) % nBuckets` and
  * partitioned by bucket on disk, so a q-term query reads at most q
  * partitions (`PartitionFilters` on `bucket` — the IvfIndex cell-prune
  * contract, applied to terms), each posting row carrying the doc
  * length so scoring needs NO join back to a corpus-scale table.
  *
  * Layout under `path`:
  *   - `postings/bucket=<b>/` — (term, doc_id, dl, tf): one row per
  *     (term, doc) with the term frequency and the document's length;
  *   - `stats/` — one row (n_docs, avgdl): the corpus-level BM25
  *     globals, paid once at build;
  *   - `meta/` — one row (n_buckets): the modulus is part of the
  *     layout; reading it back beats trusting the caller to remember.
  *
  * Determinism: [[search]] reproduces [[Bm25.score]] BIT FOR BIT on the
  * candidate set — per-term score parts are identical IEEE expressions
  * (tf and dl are exact integers in both paths; n/avgdl/df/idf come out
  * to the same doubles), and the per-document sum is assembled in TERM
  * ORDER as a fixed chain of column additions rather than a SUM over
  * rows, because a row-order SUM of doubles would drift in the last ulp
  * against the scan path's left-to-right fold. The TextIndexSpec pins
  * the equality exactly, not approximately.
  */
object TextIndex {

  /** Driver-side mirror of [[TF.hash32]] (first 8 md5 hex chars as a
    * long) — needed to compute a query term's bucket without a Spark
    * job. Pinned ≡ the column expression in TextIndexSpec.
    */
  def hash32Of(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).take(4)
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  /** One corpus scan → bucketed postings + corpus stats. Tokenization
    * is [[TF.tokens]] (the corpus contract); re-building overwrites.
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      TF.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    base.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket", TF.hash32(col("term")) % nBuckets)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(s"$path/postings")
    base.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/stats")
    Seq(nBuckets).toDF("n_buckets").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
  }

  /** BM25 top-k for a token-list query, reading ONLY the query terms'
    * bucket partitions. Returns (doc_id, score) — candidates are the
    * documents holding at least one query term (a doc outside every
    * posting scores 0 by definition and cannot enter a positive-idf
    * top-k). Ties break on doc_id.
    */
  def search(spark: SparkSession, path: String, query: Seq[String],
      k: Int, k1: Double = Bm25.DefaultK1,
      b: Double = Bm25.DefaultB): DataFrame = {
    require(query.nonEmpty, "empty query")
    val terms = query.distinct
    val nBuckets = spark.read.parquet(s"$path/meta").head().getInt(0)
    val stats = spark.read.parquet(s"$path/stats").head()
    val n = stats.getAs[Long]("n_docs")
    val avgdl = stats.getAs[Double]("avgdl")
    val buckets = terms.map(t => hash32Of(t) % nBuckets).distinct
    val pruned = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(buckets: _*)) // partition pruning
      .filter(col("term").isin(terms: _*))
    // df per term from the pruned postings — driver state bounded by
    // |terms|, exactly like Bm25.score's single stats row.
    val dfs = pruned.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dl = col("dl").cast("double")
    val tf = col("tf").cast("double")
    val part = tf * lit(k1 + 1.0) /
      (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(avgdl)))
    // Per-term part columns, then a FIXED-ORDER addition chain — the
    // bit-exact mirror of Bm25.score's left-to-right term fold.
    val perTerm = terms.zipWithIndex.map { case (t, i) =>
      val idf = math.log((n - dfs.getOrElse(t, 0L) + 0.5) /
        (dfs.getOrElse(t, 0L) + 0.5) + 1.0)
      coalesce(max(when(col("term") === t, lit(idf) * part)), lit(0.0))
        .as(s"p$i")
    }
    pruned
      .groupBy(col("doc_id"))
      .agg(perTerm.head, perTerm.tail: _*)
      .select(col("doc_id"),
        round((0 until terms.length).map(i => col(s"p$i"))
          .reduce(_ + _), Bm25.ScoreScale).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
