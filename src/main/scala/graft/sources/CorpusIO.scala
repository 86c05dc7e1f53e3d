package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** JSONL corpus interchange — the lingua franca of LLM training data
  * (one JSON document per line; gzip-friendly; streamable). Parquet is
  * the engine's native format (`Tables`); this is the boundary format
  * for corpora arriving from or leaving for other toolchains.
  *
  * Scale rules encoded here:
  *   - reads take an EXPLICIT schema — schema inference is a full extra
  *     pass over 100 TB and type-drifts on dirty data; unparseable lines
  *     land in `_corrupt_record` (PERMISSIVE) instead of killing the
  *     job, and [[readJsonl]] surfaces them via `corruptCol` so a
  *     pipeline can count/quarantine them explicitly;
  *   - writes partition by nothing by default (line files) but accept a
  *     compression codec — gzip for interchange, none for splittable
  *     local debugging. JSON escaping is the writer's problem, not the
  *     caller's: multiline/quoted text round-trips.
  */
object CorpusIO {

  /** The engine's canonical document-corpus schema (TESTDATA.md). */
  val DocumentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("lang", StringType),
    StructField("n_chars", LongType),
    StructField("text", StringType)))

  /** Read a JSONL corpus with the given schema; malformed lines are kept
    * in `corruptCol` (added to the schema) rather than dropped silently
    * or failing the job.
    */
  def readJsonl(spark: SparkSession, path: String,
      schema: StructType = DocumentSchema,
      corruptCol: String = "_corrupt_record"): DataFrame =
    spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  /** Count of unparseable lines — run this as the ingest health check
    * before trusting a foreign corpus drop. Spark refuses scans whose
    * only referenced column is the internal corrupt-record column, so
    * the count runs over a cached parse (Spark's documented workaround);
    * at corpus scale run it on a sample, or reuse a frame you are about
    * to materialize anyway.
    */
  def corruptCount(df: DataFrame, corruptCol: String = "_corrupt_record"): Long = {
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try cached.filter(cached.col(corruptCol).isNotNull).count()
    finally cached.unpersist()
  }

  /** Write a corpus as JSONL; `codec` = "gzip" | "none" (interchange
    * vs splittable-debug).
    */
  def writeJsonl(df: DataFrame, path: String, codec: String = "gzip"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", codec)
      .json(path)
}
