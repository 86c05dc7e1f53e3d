package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
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
  *   - `stats/` — APPEND-ONLY (n_docs, sum_dl) delta rows summed at
  *     read: the corpus-level BM25 globals as a MERGEABLE integer pair.
  *     Append-only is what makes incremental ingest crash-safe — a
  *     delta row lands (or not) as one file rename, never a
  *     read-modify-write of a single row;
  *   - `meta/` — one row (n_buckets): the modulus is part of the
  *     layout; reading it back beats trusting the caller to remember;
  *   - `tombstones/` + `tombstone_stats/` — deleted ids and their
  *     (count, length) corrections, cleared by [[compact]];
  *   - `postings_top/bucket=<b>/` — OPTIONAL impact-ordered serving
  *     tier, see [[buildTopTier]];
  *   - `postings_pos/bucket=<b>/` — OPTIONAL positional tier for
  *     phrase queries, see [[buildPositions]];
  *   - `staging/<token>/` + `batch_markers/<token>` — the streaming
  *     batch commit protocol, see [[appendBatch]].
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

  private[store] def fsOf(spark: SparkSession, path: String)
      : org.apache.hadoop.fs.FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

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
    * existing `bucket=N` directories, doclens fold by append, and the
    * stats pair folds by APPENDING a delta row summed at read — no
    * read-modify-write anywhere). Append ≡ one-shot rebuild BIT FOR
    * BIT, pinned in TextIndexSpec: n/avgdl/df/tf all come out to the
    * same numbers, so every score matches. (BM25 scores legitimately
    * SHIFT as the corpus grows — idf and avgdl are corpus globals;
    * that is index freshness, not drift.)
    */
  def append(docs: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val spark = docs.sparkSession
    val nBuckets = spark.read.parquet(s"$path/meta").head().getInt(0)
    writeParts(docs, idCol, textCol, path, nBuckets, SaveMode.Append)
  }

  /** The three layout writes for one doc frame: bucketed postings,
    * doclens, and ONE stats delta row holding exactly this frame's
    * (count, summed length) — Overwrite replaces the layout (build /
    * staging), Append folds into it.
    */
  private[store] def writeParts(docs: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int, mode: SaveMode): Unit = {
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
    Seq((delta.getLong(0), delta.getAs[Long]("s")))
      .toDF("n_docs", "sum_dl").coalesce(1)
      .write.mode(mode).parquet(s"$path/stats")
  }

  // --------------------------------------------------------------------
  // Streaming batch commit protocol (stage → STAGED marker → publish by
  // per-file rename → batch marker → clean), shared by [[appendBatch]]
  // and [[deleteBatch]]. foreachBatch re-delivers a failed batch with
  // the SAME batchId, so every crash point replays safely:
  //   - no STAGED marker  → the main layout is untouched; wipe the
  //     partial staging dir and redo the whole batch;
  //   - STAGED, no batch marker → the staged files are final; RESUME
  //     the publish (a file is either still in staging or already at
  //     its destination — dest names are deterministic, so the move is
  //     idempotent) without recomputing anything;
  //   - batch marker present → fully published; drop any staging
  //     leftovers and skip wholesale (the ProfileLedger discipline).
  // This closes the replay double-count hole a bare append has: a crash
  // BETWEEN the postings append and the doclens write would otherwise
  // make the replay's anti-join re-append those postings (df counted
  // twice — permanently wrong scores).
  // --------------------------------------------------------------------

  private[store] def marker(path: String, token: String): Path =
    new Path(s"$path/batch_markers/$token")

  private[store] def touch(fs: org.apache.hadoop.fs.FileSystem, p: Path): Unit = {
    fs.mkdirs(p.getParent)
    fs.create(p, true).close()
  }

  /** Move every staged `.parquet` file to its mirrored location under
    * `path`, prefixing the deterministic `<token>-` so a resumed
    * publish recognizes already-moved files (dest exists → drop the
    * source). `_SUCCESS`/checksum droppings stay behind and die with
    * the staging dir.
    */
  private[store] def publishStaged(spark: SparkSession, path: String,
      token: String): Unit = {
    val fs = fsOf(spark, path)
    val stg = new Path(s"$path/staging/$token")
    // listFiles returns fully-QUALIFIED paths (scheme + authority);
    // qualify the prefix the same way or the strip silently no-ops.
    val stgQ = fs.makeQualified(stg).toString
    val files = {
      val it = fs.listFiles(stg, true)
      val b = Vector.newBuilder[Path]
      while (it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet")) b += f
      }
      b.result()
    }
    files.foreach { f =>
      val rel = fs.makeQualified(f).toString.stripPrefix(stgQ)
        .stripPrefix("/")
      val cut = rel.lastIndexOf('/')
      val destDir =
        if (cut < 0) new Path(path) else new Path(s"$path/${rel.take(cut)}")
      fs.mkdirs(destDir)
      val dest = new Path(destDir, s"$token-${f.getName}")
      if (fs.exists(dest)) fs.delete(f, false)
      else require(fs.rename(f, dest), s"publish failed: $f -> $dest")
    }
  }

  /** Micro-batch ingest step — [[graft.streaming.EventStreams
    * .textIndexSink]]'s body, REPLAY-IDEMPOTENT at two levels: the
    * batchId marker skips a fully-processed batch wholesale, and the
    * staged commit (protocol above) makes a PARTIALLY-written batch
    * replayable — the main layout only ever changes by publishing a
    * complete staged set. Cross-batch duplicate docs are additionally
    * anti-joined against `doclens` (a document already indexed is
    * skipped), the ingest contract every store face here shares. The
    * first batch creates the index ([[build]] overwrites, so its
    * replay is trivially safe); an EMPTY first batch creates nothing —
    * an index with n = 0 must not exist. (The per-batch doclens lookup
    * is the price of disk-level idempotence; at corpus scales where it
    * hurts, front it with the ingest gates' Bloom snapshot pattern.)
    */
  def appendBatch(batch: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val token = s"a$batchId"
    val fs = fsOf(spark, path)
    val stg = new Path(s"$path/staging/$token")
    if (fs.exists(marker(path, token))) {
      if (fs.exists(stg)) fs.delete(stg, true)
      return
    }
    if (!fs.exists(new Path(s"$path/meta"))) {
      // Empty first batch: no index (ADVICE r17 — n = 0 poisons avgdl).
      if (batch.head(1).nonEmpty) build(batch, idCol, textCol, path, nBuckets)
      touch(fs, marker(path, token))
      return
    }
    val staged = new Path(s"$path/staging/$token/STAGED")
    if (!fs.exists(staged)) {
      if (fs.exists(stg)) fs.delete(stg, true) // partial stage: redo
      val seen = spark.read.parquet(s"$path/doclens")
        .select(col("doc_id"))
      // checkpoint: writeParts consumes `fresh` three times (the
      // multi-consumer rule), and the anti-join must be evaluated once.
      val fresh = batch.join(broadcast(batch.select(col(idCol)).distinct()
          .join(seen, batch(idCol) === seen("doc_id"), "left_anti")),
        Seq(idCol))
        .localCheckpoint()
      if (fresh.head(1).isEmpty) {
        touch(fs, marker(path, token))
        return
      }
      writeParts(fresh, idCol, textCol, stg.toString, nBuckets,
        SaveMode.Overwrite)
      touch(fs, staged)
    }
    publishStaged(spark, path, token)
    touch(fs, marker(path, token))
    fs.delete(stg, true)
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

  /** Streaming DELETE — [[delete]]'s micro-batch face under the staged
    * commit protocol, the asymmetry [[appendBatch]] left open (an
    * IvfIndex-parity streaming story needs both halves). A bare
    * [[delete]] replay would break on a crash BETWEEN its two appends:
    * tombstones land but the stats correction doesn't, and the replay's
    * already-tombstoned anti-join then skips the ids — permanently
    * stale-high n/avgdl. Staging both files and publishing by rename
    * (marker-last) makes every crash point a clean redo or a resumed
    * publish, exactly the [[appendBatch]] analysis. Ids deleted by an
    * EARLIER batch are anti-joined out (cross-batch double delete must
    * not double-subtract); ids absent from the index contribute 0.
    */
  def deleteBatch(idsBatch: DataFrame, idCol: String, path: String,
      batchId: Long): Unit = {
    val spark = idsBatch.sparkSession
    import spark.implicits._
    val token = s"d$batchId"
    val fs = fsOf(spark, path)
    val stg = new Path(s"$path/staging/$token")
    if (fs.exists(marker(path, token))) {
      if (fs.exists(stg)) fs.delete(stg, true)
      return
    }
    if (!fs.exists(new Path(s"$path/meta"))) { // nothing to delete from
      touch(fs, marker(path, token))
      return
    }
    val staged = new Path(s"$path/staging/$token/STAGED")
    if (!fs.exists(staged)) {
      if (fs.exists(stg)) fs.delete(stg, true) // partial stage: redo
      val fresh0 = idsBatch.select(col(idCol).cast("long").as("id"))
        .distinct()
      val fresh = IvfIndex.tombstones(spark, path)
        .fold(fresh0)(t => fresh0.join(broadcast(t.select(col("id"))),
          Seq("id"), "left_anti"))
        .localCheckpoint() // consumed twice below (the correction + write)
      if (fresh.head(1).isEmpty) {
        touch(fs, marker(path, token))
        return
      }
      val doclens = spark.read.parquet(s"$path/doclens")
      val c = doclens
        .join(broadcast(fresh), doclens("doc_id") === fresh("id"))
        .agg(count(lit(1)).as("n"),
          coalesce(sum(col("dl")), lit(0L)).as("s"))
        .head()
      fresh.coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$stg/tombstones")
      Seq((c.getLong(0), c.getAs[Long]("s")))
        .toDF("n_docs", "sum_dl").coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$stg/tombstone_stats")
      touch(fs, staged)
    }
    publishStaged(spark, path, token)
    touch(fs, marker(path, token))
    fs.delete(stg, true)
  }

  /** Fold appended small files back to one per bucket and drop
    * tombstoned postings physically — [[IvfIndex.compactLayout]]'s
    * core applied to the `postings` directory, with the doclens purge
    * and stats refresh ORDERED so no crash point can double-correct
    * (ADVICE r17): (1) purge doclens of the tombstoned docs (redo-safe
    * — tombstones still exist), (2) delete `tombstone_stats` FIRST,
    * (3) rewrite `stats` from the purged doclens — a crash between (2)
    * and (3) leaves stats stale-HIGH with the tombstones intact, the
    * documented lag, healed because this refresh is UNCONDITIONAL on
    * every compact — then (4) reclaim the posting layout (which clears
    * the tombstones last). At every intermediate point [[liveStats]]
    * is exact or loudly absent, never silently double-subtracted.
    */
  def compact(spark: SparkSession, path: String): (Long, Long) = {
    import spark.implicits._
    val fs = fsOf(spark, path)
    val dead = IvfIndex.tombstones(spark, path)
      .map(_.select(col("id")).distinct().localCheckpoint())
    // (1) purge doclens of reclaimed docs while the tombstones that
    // name them still exist (a redo re-runs this as a no-op).
    dead.foreach { t =>
      val doclens = spark.read.parquet(s"$path/doclens")
      val kept = doclens
        .join(broadcast(t), doclens("doc_id") === t("id"), "left_anti")
        .localCheckpoint() // the source dir is about to be overwritten
      kept.write.mode(SaveMode.Overwrite).parquet(s"$path/doclens")
    }
    // (2) + (3): corrections die BEFORE the refreshed stats land, and
    // the refresh runs even with no tombstones so any stale-high lag
    // from a crashed predecessor heals here.
    val tsP = new Path(s"$path/tombstone_stats")
    if (fs.exists(tsP)) fs.delete(tsP, true)
    val s = spark.read.parquet(s"$path/doclens")
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("dl")), lit(0L)).as("s")).head()
    Seq((s.getLong(0), s.getAs[Long]("s")))
      .toDF("n_docs", "sum_dl").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/stats")
    // (3b) the POSITIONAL tier reclaims its tombstoned rows BEFORE the
    // posting compaction clears the tombstone set — positions cannot
    // be rebuilt from postings (unlike the impact tier, the
    // corpus-side ordering lives only here), so this tier compacts
    // against the same tombstones instead of rebuilding.
    if (fs.exists(new Path(s"$path/postings_pos")))
      IvfIndex.compactLayout(spark, path, "postings_pos", "doc_id",
        partCol = "bucket", clearTombstones = false)
    // (4) physical reclamation; clears tombstones/ as its last step.
    val counts = IvfIndex.compactLayout(spark, path, "postings", "doc_id",
      partCol = "bucket")
    // (5) a serving tier built BEFORE the deletes still carries the
    // reclaimed docs' rows and their stale df — and with the
    // tombstones now cleared, [[searchTop]]'s anti-join would no
    // longer hide them. Rebuilding from the compacted postings (one
    // pass, the tier's own build cost) restores the tier contract;
    // crash-safe because buildTopTier overwrites.
    val topMeta = new Path(s"$path/top_meta")
    if (fs.exists(topMeta)) {
      val tm = spark.read.parquet(topMeta.toString)
        .select(col("top_n"), col("k1"), col("b")).head()
      buildTopTier(spark, path, tm.getInt(0), tm.getDouble(1),
        tm.getDouble(2))
    }
    counts
  }

  /** The summed live-stats pair after tombstone corrections — `stats`
    * is append-only delta rows (build/compact collapse it back to
    * one), so the read is a sum either way.
    */
  private def liveStats(spark: SparkSession, path: String): (Long, Long) = {
    val st = spark.read.parquet(s"$path/stats")
      .agg(coalesce(sum(col("n_docs")), lit(0L)),
        coalesce(sum(col("sum_dl")), lit(0L))).head()
    val (n0, s0) = (st.getLong(0), st.getLong(1))
    val p = new Path(s"$path/tombstone_stats")
    val fs = fsOf(spark, path)
    if (!fs.exists(p)) (n0, s0)
    else {
      val c = spark.read.parquet(p.toString)
        .agg(coalesce(sum(col("n_docs")), lit(0L)),
          coalesce(sum(col("sum_dl")), lit(0L))).head()
      (n0 - c.getLong(0), s0 - c.getLong(1))
    }
  }

  /** The empty result frame — [[search]]'s shape when the index holds
    * no live documents (everything tombstoned): scoring against
    * n = 0 would poison avgdl into NaN silently (ADVICE r17), and "no
    * documents" has a perfectly good exact answer.
    */
  private def emptyResult(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Double)].toDF("doc_id", "score")
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
    if (n <= 0L) return emptyResult(spark)
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
    scoreCandidates(pruned, terms, dfs, n, sumDl.toDouble / n, k1, b, k)
  }

  /** BATCH SERVING: answer a whole query batch from ONE pruned posting
    * read — the [[graft.operators.Similarity.ivfSearchBatch]] shape
    * applied to the lexical index (production retrieval serves query
    * BATCHES; paying a disk read per query wastes the bucket layout
    * when queries share hot terms). The union of the batch's terms
    * prunes the read to ≤ |terms| bucket partitions, the candidate
    * rows are locally checkpointed ONCE, and each query then scores
    * its own candidate subset through the same fixed-order chain as
    * [[search]] — so per query the rows are BIT-IDENTICAL to a solo
    * search (TextIndexSpec pins it): n/avgdl/df are frame-independent
    * numbers, and a term's part column ignores rows carrying other
    * queries' terms. The batch itself is driver-held — a query batch
    * is codebook-sized by nature, never data-scale. Output:
    * (query_id, rank, doc_id, score); the per-query rank window runs
    * over ≤ k rows (ties on doc_id).
    */
  def searchBatch(spark: SparkSession, path: String,
      queries: Seq[(Long, Seq[String])], k: Int,
      k1: Double = Bm25.DefaultK1, b: Double = Bm25.DefaultB): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "empty batch or empty query")
    require(queries.map(_._1).distinct.length == queries.length,
      "query ids must be unique")
    import org.apache.spark.sql.expressions.Window
    val allTerms = queries.flatMap(_._2).distinct
    val nBuckets = spark.read.parquet(s"$path/meta").head().getInt(0)
    val (n, sumDl) = liveStats(spark, path)
    if (n <= 0L) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Long, Double)]
        .toDF("query_id", "rank", "doc_id", "score")
    }
    val avgdl = sumDl.toDouble / n
    val buckets = allTerms.map(t => hash32Of(t) % nBuckets).distinct
    // one disk read for the whole batch, materialized for Q consumers
    // (the multi-consumer rule): every per-query aggregate below reads
    // these candidate rows, never the parquet again.
    val pruned = IvfIndex.dropTombstoned(
      spark.read.parquet(s"$path/postings")
        .filter(col("bucket").isin(buckets: _*))
        .filter(col("term").isin(allTerms: _*)),
      "doc_id", spark, path)
      .localCheckpoint()
    val dfs = pruned.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    queries.map { case (qid, qterms0) =>
      val qterms = qterms0.distinct
      scoreCandidates(pruned.filter(col("term").isin(qterms: _*)),
        qterms, dfs, n, avgdl, k1, b, k)
        .select(lit(qid).as("query_id"),
          row_number()
            .over(Window.orderBy(col("score").desc, col("doc_id")))
            .cast("long").as("rank"),
          col("doc_id"), col("score"))
    }.reduce(_ union _)
      .orderBy(col("query_id"), col("rank"))
  }

  /** The shared scoring tail: per-term part columns assembled in TERM
    * ORDER as a fixed addition chain — the bit-exact mirror of
    * [[Bm25.score]]'s left-to-right term fold (a row-order SUM of
    * doubles would drift in the last ulp).
    */
  private def scoreCandidates(pruned: DataFrame, terms: Seq[String],
      dfs: Map[String, Long], n: Long, avgdl: Double, k1: Double,
      b: Double, k: Int): DataFrame = {
    val dl = col("dl").cast("double")
    val tf = col("tf").cast("double")
    val part = tf * lit(k1 + 1.0) /
      (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(avgdl)))
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

  /** Per-term top-k postings by (impact DESC, doc_id ASC) with the
    * (dl, tf) payload carried along — the
    * [[graft.operators.Sketches.TopKByScore]] discipline over posting
    * rows. Mergeable (top-k of a union IS the merge of top-ks), so it
    * partial-aggregates map-side and only k rows per term per task
    * cross the wire — the 100-TB replacement for a per-term rank
    * window whose hot partitions are corpus-sized. Doc ids are unique
    * within a term, so the order is total; impacts are plain doubles
    * computed by one Column expression (never NaN — tf ≥ 1).
    */
  private[store] class TopKPostings(k: Int)
      extends Aggregator[(Double, Long, Long, Long),
        Seq[(Double, Long, Long, Long)], Seq[(Double, Long, Long, Long)]]
      with Serializable {
    require(k >= 1, s"top-k needs k >= 1, got $k")

    private def ahead(a: (Double, Long, Long, Long),
        b: (Double, Long, Long, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    def zero: Seq[(Double, Long, Long, Long)] = Vector.empty

    def reduce(buf: Seq[(Double, Long, Long, Long)],
        in: (Double, Long, Long, Long)): Seq[(Double, Long, Long, Long)] = {
      if (buf.length == k && !ahead(in, buf.last)) return buf
      val (better, rest) = buf.span(ahead(_, in))
      ((better :+ in) ++ rest).take(k)
    }

    def merge(a: Seq[(Double, Long, Long, Long)],
        b: Seq[(Double, Long, Long, Long)]): Seq[(Double, Long, Long, Long)] = {
      val out = Vector.newBuilder[(Double, Long, Long, Long)]
      var i = 0; var j = 0; var n = 0
      val lim = math.min(a.length + b.length, k)
      while (n < lim && (i < a.length || j < b.length)) {
        val fromA = j >= b.length || (i < a.length && !ahead(b(j), a(i)))
        if (fromA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
        n += 1
      }
      out.result()
    }

    def finish(buf: Seq[(Double, Long, Long, Long)]): Seq[(Double, Long, Long, Long)] = buf

    def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long, Long, Long)]] =
      ExpressionEncoder[Seq[(Double, Long, Long, Long)]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long, Long, Long)]] =
      ExpressionEncoder[Seq[(Double, Long, Long, Long)]]()
  }

  /** IMPACT-ORDERED SERVING TIER — the hot-term defense. Partition
    * pruning bounds a query to q buckets, but a bucket holding a
    * stopword's posting list is DATA-scale: one query term like "the"
    * reads a posting list proportional to the corpus. Production
    * inverted indexes cap this with impact ordering (Anh & Moffat's
    * impact-sorted lists; block-max WAND is the same bound per block):
    * per term, keep only the top `topN` postings ranked by the BM25
    * tf-part tf·(k1+1)/(tf + k1·((1−b) + b·dl/avgdl)) — rank-monotone
    * per term since idf is a per-term CONSTANT — alongside the term's
    * TRUE document frequency, so [[searchTop]] scores with exact idf
    * and only candidate RECALL is bounded. The tier is a SNAPSHOT
    * (avgdl and df frozen at build; rebuild on the compaction cadence)
    * with the contract pinned in TextIndexSpec:
    *   - every query term's df ≤ topN → [[searchTop]] ≡ [[search]] bit
    *     for bit (a tier holding the WHOLE posting list loses nothing);
    *   - some term's df > topN → documented under-recall: a doc ranked
    *     below the cut in every matching term's tier can miss the
    *     top-k even when its summed score belongs there.
    * Layout: `postings_top/bucket=<b>/` (term, df_full, doc_id, dl,
    * tf) + `top_meta/` (top_n) — same bucket modulus, so a q-term
    * query reads ≤ q partitions of ≤ topN·terms-per-bucket rows: the
    * read bound is CONFIGURED, not data-dependent.
    */
  def buildTopTier(spark: SparkSession, path: String, topN: Int,
      k1: Double = Bm25.DefaultK1, b: Double = Bm25.DefaultB): Unit = {
    import spark.implicits._
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val (n, sumDl) = liveStats(spark, path)
    require(n > 0L, "cannot build a serving tier over an empty index")
    val avgdl = sumDl.toDouble / n
    val nBuckets = spark.read.parquet(s"$path/meta").head().getInt(0)
    val posts = IvfIndex.dropTombstoned(
      spark.read.parquet(s"$path/postings"), "doc_id", spark, path)
    val dl = col("dl").cast("double")
    val tf = col("tf").cast("double")
    val impact = tf * lit(k1 + 1.0) /
      (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(avgdl)))
    val topk = udaf(new TopKPostings(topN),
      ExpressionEncoder[(Double, Long, Long, Long)]())
    posts
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df_full"),
        topk(impact, col("doc_id"), col("dl"), col("tf")).as("top"))
      .select(col("term"), col("df_full"), explode(col("top")).as("p"))
      .select(col("term"), col("df_full"), col("p._2").as("doc_id"),
        col("p._3").as("dl"), col("p._4").as("tf"))
      .withColumn("bucket", TF.hash32(col("term")) % nBuckets)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(s"$path/postings_top")
    // the impact parameters are part of the tier's identity: compact's
    // rebuild must rank with the same (k1, b) this build did.
    Seq((topN, k1, b)).toDF("top_n", "k1", "b").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/top_meta")
  }

  /** POSITIONAL tier — phrase queries are the one lookup the bag-of-
    * words postings cannot answer (tf says "hash" and "join" both
    * occur; only positions say "hash join" does). Production inverted
    * indexes store within-document term positions alongside the
    * postings exactly for this (Zobel & Moffat, "Inverted files for
    * text search engines", ACM Computing Surveys 2006, §5 — Lucene's
    * `IndexOptions.DOCS_AND_FREQS_AND_POSITIONS` is the same switch),
    * and keep it a SEPARATE opt-in layout because positions roughly
    * double the index bytes — a cost a pure-ranking deployment must
    * not pay. Layout: `postings_pos/bucket=<b>/` — (term, doc_id,
    * positions: sorted array of 0-based token offsets), same bucket
    * modulus as `postings/`, so a phrase query is partition-pruned to
    * its distinct terms' buckets; the positions array is doc-bounded
    * (≤ that document's dl), never corpus-scale. Build AFTER [[build]]
    * (the modulus is read from `meta`); [[appendPositions]] folds a
    * delta batch in ([[append]]'s contract — append ≡ rebuild, pinned
    * in TextIndexSpec); [[delete]] needs nothing here (tombstones are
    * anti-joined at query time) and [[compact]] reclaims tombstoned
    * rows physically. The streaming sink does not maintain this tier
    * (positions cannot be derived from postings after the fact) —
    * streaming deployments call [[appendPositions]] from the same
    * foreachBatch that calls [[appendBatch]].
    */
  def buildPositions(docs: DataFrame, idCol: String, textCol: String,
      path: String): Unit =
    writePositions(docs, idCol, textCol, path, SaveMode.Overwrite)

  /** Incremental positional maintenance — delta batches land inside
    * existing `bucket=<b>` directories, append ≡ one-shot rebuild
    * (the [[append]] contract; rows are (term, doc) keyed and a doc
    * arrives once, so no fold is needed — pure append suffices).
    */
  def appendPositions(docs: DataFrame, idCol: String, textCol: String,
      path: String): Unit =
    writePositions(docs, idCol, textCol, path, SaveMode.Append)

  private def writePositions(docs: DataFrame, idCol: String,
      textCol: String, path: String, mode: SaveMode): Unit = {
    val spark = docs.sparkSession
    val nBuckets = spark.read.parquet(s"$path/meta").head().getInt(0)
    docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(TF.tokens(col(textCol))).as(Seq("pos", "term")))
      .groupBy(col("term"), col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"))
      .withColumn("bucket", TF.hash32(col("term")) % nBuckets)
      .write.mode(mode)
      .partitionBy("bucket")
      .parquet(s"$path/postings_pos")
  }

  /** Exact PHRASE search: documents containing the query tokens
    * CONSECUTIVELY, with the occurrence count — served entirely from
    * the positional tier ([[buildPositions]]), never the corpus. Read
    * shape: the phrase's distinct terms prune the scan to ≤ that many
    * bucket partitions, one doc_id-keyed aggregate assembles each
    * candidate's term→positions map, and the adjacency check is a
    * row-local array fold (`filter`/`array_contains` over doc-bounded
    * arrays — codegen'd builtins, no UDF): an occurrence is a position
    * p of the first token with token i sitting at p+i for every i.
    * Overlapping occurrences count separately and repeated phrase
    * tokens ("window window") resolve against the SAME positions
    * array, both pinned in TextIndexSpec. Row volume is Σ df(term)
    * over the phrase's terms — the same bound as [[search]] over the
    * identical terms, paid in ONE exchange (the candidate groupBy);
    * a stopword inside a phrase is the documented hot-term caveat
    * ([[buildTopTier]]'s analysis; impact ordering cannot pre-rank
    * adjacency, so production engines pay the full positional read or
    * gate on the rarest term's df first). Output: (doc_id, n_occ),
    * n_occ DESC then doc_id.
    */
  def phraseSearch(spark: SparkSession, path: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val fs = fsOf(spark, path)
    require(fs.exists(new Path(s"$path/postings_pos")),
      s"no positional tier at $path — buildPositions first")
    val terms = phrase.distinct
    val nBuckets = spark.read.parquet(s"$path/meta").head().getInt(0)
    val buckets = terms.map(t => hash32Of(t) % nBuckets).distinct
    val pruned = IvfIndex.dropTombstoned(
      spark.read.parquet(s"$path/postings_pos")
        .filter(col("bucket").isin(buckets: _*)) // partition pruning
        .filter(col("term").isin(terms: _*)),
      "doc_id", spark, path)
    val m = col("m")
    val first = element_at(m, lit(phrase.head))
    val occs =
      if (phrase.length == 1) first
      else filter(first, p =>
        phrase.tail.zipWithIndex.map { case (t, i) =>
          array_contains(element_at(m, lit(t)), p + lit(i + 1))
        }.reduce(_ && _))
    pruned
      .groupBy(col("doc_id"))
      .agg(map_from_entries(
        collect_list(struct(col("term"), col("positions")))).as("m"))
      .filter(size(m) === terms.length) // every distinct token present
      .select(col("doc_id"), size(occs).cast("long").as("n_occ"))
      .filter(col("n_occ") > 0)
      .orderBy(col("n_occ").desc, col("doc_id"))
  }

  /** BM25 top-k served from the impact-ordered tier — [[search]]'s
    * shape with the posting read bounded by `topN` per term instead of
    * df (see [[buildTopTier]] for the exactness contract). idf uses
    * the stored TRUE df (`df_full`), n/avgdl the live stats, and the
    * scoring tail is the same fixed-order chain, so whenever every
    * query term's full list fits the tier the result is bit-identical
    * to the exact path.
    */
  def searchTop(spark: SparkSession, path: String, query: Seq[String],
      k: Int, k1: Double = Bm25.DefaultK1,
      b: Double = Bm25.DefaultB): DataFrame = {
    require(query.nonEmpty, "empty query")
    val terms = query.distinct
    val nBuckets = spark.read.parquet(s"$path/meta").head().getInt(0)
    val (n, sumDl) = liveStats(spark, path)
    if (n <= 0L) return emptyResult(spark)
    val buckets = terms.map(t => hash32Of(t) % nBuckets).distinct
    val pruned = IvfIndex.dropTombstoned(
      spark.read.parquet(s"$path/postings_top")
        .filter(col("bucket").isin(buckets: _*)) // partition pruning
        .filter(col("term").isin(terms: _*)),
      "doc_id", spark, path)
    val dfs = pruned.groupBy(col("term"))
      .agg(max(col("df_full")).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    scoreCandidates(pruned.drop("df_full"), terms, dfs, n,
      sumDl.toDouble / n, k1, b, k)
  }
}
