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
  *   - `doclens/` — (doc_id, dl): the per-doc lengths, read only by
  *     [[delete]]'s one-time stats correction and [[compact]];
  *   - `stats/` — one row (n_docs, sum_dl): the corpus-level BM25
  *     globals as a MERGEABLE integer pair (appends fold by addition);
  *   - `meta/` — one row (n_buckets): the modulus is part of the
  *     layout; reading it back beats trusting the caller to remember;
  *   - `tombstones/` + `tombstone_stats/` — deleted ids and their
  *     (count, length) corrections, cleared by [[compact]].
  *
  * Maintenance parity with [[IvfIndex]]: [[append]] (delta batches fold
  * into the existing buckets, append ≡ one-shot rebuild bit for bit),
  * [[delete]] (tombstones — invisible immediately, df/n/avgdl corrected
  * so the scores equal a rebuild without the doc), [[compact]] (one
  * file per bucket, tombstoned rows reclaimed physically,
  * rename-aside→rename-in→delete-old swap).
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

  /** One corpus scan → bucketed postings + doc lengths + corpus stats.
    * Tokenization is [[TF.tokens]] (the corpus contract); re-building
    * overwrites. Stats persist as the MERGEABLE pair (n_docs, sum_dl)
    * — integer sums, so [[append]] folds a delta batch exactly and
    * avgdl = sum/n reproduces the scan path's `avg` bit for bit (both
    * are an exact-integer-valued double divided by the count).
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    writeParts(docs, idCol, textCol, path, nBuckets, SaveMode.Overwrite)
    val spark = docs.sparkSession
    import spark.implicits._
    Seq(nBuckets).toDF("n_buckets").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
  }

  /** INCREMENTAL maintenance: index a delta batch into the existing
    * layout (the [[IvfIndex.append]] shape — postings land inside
    * existing `bucket=N` directories, doclens and the stats pair fold
    * by addition). Append ≡ one-shot rebuild BIT FOR BIT, pinned in
    * TextIndexSpec: n/avgdl/df/tf all come out to the same numbers, so
    * every score matches. (BM25 scores legitimately SHIFT as the
    * corpus grows — idf and avgdl are corpus globals; that is index
    * freshness, not drift.)
    */
  def append(docs: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val spark = docs.sparkSession
    val nBuckets = spark.read.parquet(s"$path/meta").head().getInt(0)
    // Fold the old stats pair with the delta's — collected BEFORE the
    // overwrite, a 1-row read.
    val old = spark.read.parquet(s"$path/stats").head()
    val (oldN, oldSum) = (old.getAs[Long]("n_docs"), old.getAs[Long]("sum_dl"))
    writeParts(docs, idCol, textCol, path, nBuckets, SaveMode.Append,
      statsBase = (oldN, oldSum))
  }

  private def writeParts(docs: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int, mode: SaveMode,
      statsBase: (Long, Long) = (0L, 0L)): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      TF.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    base.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket", TF.hash32(col("term")) % nBuckets)
      .write.mode(mode)
      .partitionBy("bucket")
      .parquet(s"$path/postings")
    base.select(col("doc_id"), col("dl"))
      .write.mode(mode).parquet(s"$path/doclens")
    val delta = base
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("s"))
      .head()
    Seq((statsBase._1 + delta.getLong(0),
      statsBase._2 + delta.getAs[Long]("s")))
      .toDF("n_docs", "sum_dl").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/stats")
  }

  /** Micro-batch ingest step — [[graft.streaming.EventStreams
    * .textIndexSink]]'s body, REPLAY-IDEMPOTENT by construction:
    * foreachBatch re-delivers a batch after a failure, and a blind
    * [[append]] would then double-count postings INTO df (wrong
    * scores, not dead bytes), so the batch is first anti-joined
    * against `doclens` — a document already indexed is skipped
    * entirely. Requires the ingest contract every store face here
    * shares: doc ids are unique across the stream. The first batch
    * creates the index. (The per-batch doclens lookup is the price of
    * disk-level idempotence; at corpus scales where it hurts, front
    * it with the ingest gates' Bloom snapshot pattern.)
    */
  def appendBatch(batch: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int = 64): Unit = {
    val spark = batch.sparkSession
    val metaP = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = metaP.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(metaP)) {
      build(batch, idCol, textCol, path, nBuckets)
    } else {
      val seen = spark.read.parquet(s"$path/doclens")
        .select(col("doc_id"))
      val fresh = batch.join(broadcast(batch.select(col(idCol)).distinct()
          .join(seen, batch(idCol) === seen("doc_id"), "left_anti")),
        Seq(idCol))
        .localCheckpoint() // the append overwrites stats it also reads
      if (fresh.head(1).nonEmpty) append(fresh, idCol, textCol, path)
    }
  }

  /** Per-document DELETE as a tombstone write ([[IvfIndex.delete]]'s
    * contract): one tiny parquet append, immediately invisible to
    * [[search]] — candidates anti-join the set out BEFORE document
    * frequencies are counted, and the stored stats pair is corrected
    * by the tombstoned docs' (count, length) from `doclens`, so a
    * post-delete search equals a rebuild WITHOUT those docs bit for
    * bit (TextIndexSpec pins it). Physical reclamation is
    * [[compact]]'s job.
    */
  def delete(spark: SparkSession, path: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    val fresh0 = ids.distinct.toDF("id")
    // Ignore ids already tombstoned — a double delete must not
    // double-subtract from the stats correction.
    val fresh = IvfIndex.tombstones(spark, path)
      .fold(fresh0)(t =>
        fresh0.join(broadcast(t.select(col("id"))), Seq("id"), "left_anti"))
      .localCheckpoint() // we append to the directory it was read from
    // The stats correction is paid ONCE here (one doclens lookup per
    // bulk delete), so search never scans doclens: it reads the tiny
    // correction rows instead. Ids absent from the index contribute 0.
    val doclens = spark.read.parquet(s"$path/doclens")
    val c = doclens
      .join(broadcast(fresh), doclens("doc_id") === fresh("id"))
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("s"))
      .head()
    fresh.write.mode(SaveMode.Append).parquet(s"$path/tombstones")
    Seq((c.getLong(0), c.getAs[Long]("s")))
      .toDF("n_docs", "sum_dl")
      .write.mode(SaveMode.Append).parquet(s"$path/tombstone_stats")
  }

  /** Fold appended small files back to one per bucket and drop
    * tombstoned postings physically — [[IvfIndex.compactLayout]]'s
    * core applied to the `postings` directory, then the doclens and
    * stats are refreshed to exclude the reclaimed docs. The stats
    * refresh is the LAST step: a crash between the swap (which clears
    * tombstones) and the refresh leaves n/avgdl including the
    * reclaimed docs until the next compact — per-term df and tf are
    * always live, only the two corpus globals can lag, and the window
    * is one small write.
    */
  def compact(spark: SparkSession, path: String): (Long, Long) = {
    val dead = IvfIndex.tombstones(spark, path)
      .map(_.select(col("id")).distinct().localCheckpoint())
    val counts = IvfIndex.compactLayout(spark, path, "postings", "doc_id",
      partCol = "bucket")
    dead.foreach { t =>
      val doclens = spark.read.parquet(s"$path/doclens")
      val kept = doclens
        .join(broadcast(t), doclens("doc_id") === t("id"), "left_anti")
        .localCheckpoint() // the source dir is about to be overwritten
      kept.write.mode(SaveMode.Overwrite).parquet(s"$path/doclens")
      import spark.implicits._
      val s = kept.agg(count(lit(1)).as("n"),
        coalesce(sum(col("dl")), lit(0L)).as("s")).head()
      Seq((s.getLong(0), s.getAs[Long]("s")))
        .toDF("n_docs", "sum_dl").coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/stats")
      // The corrections are baked into the refreshed stats now.
      val p = new org.apache.hadoop.fs.Path(s"$path/tombstone_stats")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
    }
    counts
  }

  /** The summed live-stats pair after tombstone corrections. */
  private def liveStats(spark: SparkSession, path: String): (Long, Long) = {
    val stats = spark.read.parquet(s"$path/stats").head()
    val (n0, s0) = (stats.getAs[Long]("n_docs"), stats.getAs[Long]("sum_dl"))
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstone_stats")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) (n0, s0)
    else {
      val c = spark.read.parquet(p.toString)
        .agg(coalesce(sum(col("n_docs")), lit(0L)),
          coalesce(sum(col("sum_dl")), lit(0L))).head()
      (n0 - c.getLong(0), s0 - c.getLong(1))
    }
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
    val (n, sumDl) = liveStats(spark, path)
    val avgdl = sumDl.toDouble / n
    val buckets = terms.map(t => hash32Of(t) % nBuckets).distinct
    val pruned = IvfIndex.dropTombstoned(
      spark.read.parquet(s"$path/postings")
        .filter(col("bucket").isin(buckets: _*)) // partition pruning
        .filter(col("term").isin(terms: _*)),
      "doc_id", spark, path)
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
