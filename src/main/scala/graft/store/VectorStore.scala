package graft.store

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** Parquet-backed vector index catalog — the engine's counterpart of the
  * reference's Weaviate/Elasticsearch stores (SURVEY.md D1–D4, E3;
  * reference: kfp/website-ingestor/website-ingestion-pipeline.py:102–138
  * idempotent create, ingestion-pipeline-website-local.py:74–136
  * list/delete, ingestion-pipeline.py:341–353 bulk add).
  *
  * One index = one parquet directory under `root`. Reads are ordinary
  * Spark scans (S6), so every query over an index gets pushdown, pruning
  * and codegen for free; at cluster scale `root` is an object-store
  * prefix and appends are atomic directory-level commits by Spark's
  * parquet committer. Index names are catalog-normalized by
  * [[graft.pipeline.Product.indexName]]-style callers; this class treats
  * names as opaque (validated against path traversal).
  */
final class ParquetVectorStore(spark: SparkSession, root: String) {

  /** The store's canonical chunk schema (FIXTURES.md §1.5). */
  val chunkSchema: StructType = StructType(Seq(
    StructField("page_content", StringType),
    StructField("metadata", MapType(StringType, StringType)),
    StructField("headers", MapType(StringType, StringType)),
    StructField("embedding", ArrayType(FloatType))))

  /** Legal index names: must START with [a-z0-9] so a name can never
    * collide with the hidden `.`/`_` prefixes that [[listIndexes]]
    * excludes (a `_foo` index would be creatable yet catalog-invisible).
    */
  private val namePattern = "[a-z0-9][a-z0-9_]*"

  private def dir(index: String): Path = {
    require(index.nonEmpty && index.matches(namePattern),
      s"illegal index name: $index")
    Paths.get(root, index)
  }

  def exists(index: String): Boolean = Files.isDirectory(dir(index))

  /** D1/D2: create iff absent (idempotent), with the canonical schema. */
  def createIndex(index: String): Unit = if (!exists(index)) {
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], chunkSchema)
      .write.mode(SaveMode.ErrorIfExists).parquet(dir(index).toString)
  }

  /** D3: enumerate indexes (the store IS the catalog). Hidden entries
    * (`.`/`_` prefixes — appendAll staging dirs, committer metadata) are
    * never indexes: they are skipped so an in-flight or crash-orphaned
    * staging directory cannot surface in the catalog.
    */
  def listIndexes(): Seq[String] =
    if (!Files.isDirectory(Paths.get(root))) Seq.empty
    else Files.list(Paths.get(root)).iterator().asScala
      .filter(Files.isDirectory(_))
      .map(_.getFileName.toString)
      .filterNot(n => n.startsWith(".") || n.startsWith("_"))
      .toSeq.sorted

  /** D4: drop if exists. */
  def deleteIndex(index: String): Unit = if (exists(index)) rm(dir(index))

  private def rm(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toSeq.foreach(rm)
    Files.delete(p)
  }

  /** E3/E4: bulk append chunks (creates the index if needed). Columns are
    * aligned to the canonical schema by name.
    */
  def append(index: String, chunks: DataFrame): Unit = {
    createIndex(index)
    chunks
      .select(chunkSchema.fieldNames.toIndexedSeq.map(org.apache.spark.sql.functions.col): _*)
      .write.mode(SaveMode.Append).parquet(dir(index).toString)
  }

  /** E3 bulk form: append chunks for MANY indexes in ONE Spark job.
    * The frame is written once with `partitionBy(indexCol)` into a
    * staging directory (so Spark splits rows by index inside the shuffle-
    * free writer, not via one filter-pass per index), then each
    * `index_name=X` partition directory is moved into its index — a
    * directory-level commit, the same pattern Spark's own committer uses.
    * partitionBy drops the partition column from the data files, so the
    * staged files already match [[chunkSchema]] exactly.
    *
    * Returns the distinct indexes written, sorted.
    */
  def appendAll(chunks: DataFrame, indexCol: String = "index_name"): Seq[String] = {
    val staging = Paths.get(root, s".staging-${java.util.UUID.randomUUID()}")
    try {
      chunks
        .select((indexCol +: chunkSchema.fieldNames.toIndexedSeq)
          .map(org.apache.spark.sql.functions.col): _*)
        .write.mode(SaveMode.Overwrite)
        .partitionBy(indexCol)
        .parquet(staging.toString)
      val parts = Files.list(staging).iterator().asScala.toSeq
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith(s"$indexCol="))
        .map(p => p -> p.getFileName.toString.stripPrefix(s"$indexCol="))
      // Validate every STAGED partition name after the single write but
      // BEFORE the first move: the move loop is not atomic, so a name
      // dir() would reject (null → __HIVE_DEFAULT_PARTITION__, uppercase,
      // dash) must fail the whole job while nothing is committed yet.
      // Legal names never get Hive path-escaping, so matching the raw
      // directory suffix is exact — and unlike a pre-write validation
      // pass over the frame, this costs no second Spark job and cannot
      // diverge from what was actually written when the input frame is
      // nondeterministic (no TOCTOU).
      val bad = parts.map(_._2).filterNot(n => n.nonEmpty && n.matches(namePattern))
      require(bad.isEmpty,
        s"illegal index names in $indexCol: ${bad.mkString(", ")}")
      parts.map { case (p, idx) =>
        createIndex(idx)
        Files.list(p).iterator().asScala.toSeq
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .zipWithIndex.foreach { case (f, i) =>
            Files.move(f, dir(idx).resolve(
              s"part-${java.util.UUID.randomUUID()}-$i.parquet"))
          }
        idx
      }.sorted
    } finally if (Files.isDirectory(staging)) rm(staging)
  }

  /** Scan-open metric: number of [[read]] calls this store instance has
    * served. At corpus scale a stray per-micro-batch `read` is a silent
    * O(corpus) cost, so the streaming ingest gates' caching contract —
    * at most one corpus read per novelty-rebuild window — is pinned
    * against this counter (StreamingSpec).
    */
  val readCount = new java.util.concurrent.atomic.AtomicLong(0)

  /** S6: read an index back as a table scan, minus any tombstoned
    * documents. With no deletes pending the plan is byte-identical to
    * a bare scan (the [[IvfIndex]] None discipline — no join node
    * appears at all); with deletes, one broadcast anti-join per
    * distinct tombstone metadata key, on a COMPUTED equi key
    * (`element_at(metadata, k)` left vs the literal value right — a
    * BroadcastHashJoin, never a nested-loop filter).
    */
  def read(index: String): DataFrame = {
    readCount.incrementAndGet()
    val base = spark.read.schema(chunkSchema).parquet(dir(index).toString)
    tombstones(index).fold(base) { t =>
      import org.apache.spark.sql.functions.{broadcast, col, element_at}
      val keys = t.select(col("k")).distinct().collect().map(_.getString(0))
      keys.sorted.foldLeft(base) { (df, k) =>
        df.join(
          broadcast(t.filter(col("k") === k).select(col("v"))),
          element_at(col("metadata"), k) === col("v"), "left_anti")
      }
    }
  }

  /** Per-document DELETE as a tombstone write — the [[IvfIndex.delete]]
    * discipline at the RAG store layer, which is what gives the store
    * GDPR semantics: a delete is one tiny parquet append, immediately
    * visible to every read face (read/count/topRecords all route
    * through [[read]]'s anti-join), and physical reclamation rides
    * [[compactIndex]]. Documents are addressed by a metadata field
    * (default `source`, P15's stamp): deleting a source URL removes
    * every chunk of that document — the unit a right-to-be-forgotten
    * request names. The tombstone directory is `_`-prefixed, so the
    * index's own parquet scan never sees it as data.
    */
  def deleteDocuments(index: String, values: Seq[String],
      metaKey: String = "source"): Unit = {
    import spark.implicits._
    deleteDocumentsFrame(index, values.toDF("v"), metaKey)
  }

  /** [[deleteDocuments]] for a value FRAME — the bulk form ("every
    * source the compliance query matched"), one distributed write.
    */
  def deleteDocumentsFrame(index: String, values: DataFrame,
      metaKey: String = "source"): Unit = {
    require(exists(index), s"no such index: $index")
    import org.apache.spark.sql.functions.{col, lit}
    values
      .select(lit(metaKey).as("k"),
        col(values.columns.head).cast("string").as("v"))
      .write.mode(SaveMode.Append)
      .parquet(dir(index).resolve("_tombstones").toString)
  }

  /** The live tombstone set, or None when nothing was ever deleted. */
  private def tombstones(index: String): Option[DataFrame] = {
    val p = dir(index).resolve("_tombstones")
    if (Files.isDirectory(p)) Some(spark.read.parquet(p.toString))
    else None
  }

  /** Compact an index: fold the append-accumulated small files and
    * drop tombstoned documents PHYSICALLY, clearing the tombstones —
    * [[IvfIndex.compact]]'s crash-safety story on the store layout.
    * The swap is rename-aside → rename-in → delete-old, so the data is
    * always present under some name: a crash between the renames
    * leaves `.old-<index>` (healed by the next compact, which restores
    * it); a crash before the delete leaves both (healed by dropping
    * the superseded copy). Tombstones vanish WITH the swap — the
    * compacted directory is written without them — so a crash before
    * the swap re-drops the same rows next time (idempotent). Returns
    * (dataFilesBefore, dataFilesAfter).
    */
  def compactIndex(index: String, targetFiles: Int = 1): (Long, Long) = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    val d = dir(index)
    val tmp = Paths.get(root, s".compacting-$index")
    val old = Paths.get(root, s".old-$index")
    // Heal a crashed predecessor before measuring anything.
    if (!Files.isDirectory(d) && Files.isDirectory(old))
      Files.move(old, d)
    if (Files.isDirectory(old)) rm(old)
    if (Files.isDirectory(tmp)) rm(tmp)
    require(exists(index), s"no such index: $index")
    def countFiles(p: Path): Long =
      Files.list(p).iterator().asScala
        .count(_.getFileName.toString.endsWith(".parquet"))
    val before = countFiles(d)
    read(index) // tombstone anti-join applied here
      .coalesce(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    Files.move(d, old)   // rename-aside (tombstones ride along, out)
    Files.move(tmp, d)   // rename-in: clean data, no tombstone dir
    rm(old)              // delete-old commits the swap
    (before, countFiles(d))
  }

  /** Q2: record count (Spark plans a partial+final count aggregate —
    * unlike the reference, which fetched every row to count them,
    * ingestion-pipeline-website-local.py:94–118).
    */
  def count(index: String): Long = read(index).count()

  /** Q1 (ingestion-pipeline-website-local.py:32–71): sample records —
    * project (page_content, metadata), take n. Plans as CollectLimit:
    * only n rows leave the executors.
    */
  def topRecords(index: String, n: Int = 10): DataFrame =
    read(index).select("page_content", "metadata").limit(n)
}
