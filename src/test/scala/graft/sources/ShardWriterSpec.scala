package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Shard-layout contract: deterministic membership (rebuildable without
  * the written output), epoch decorrelation, per-file record caps, and
  * full round-trip.
  */
class ShardWriterSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def corpus = (0L until 1000L).map(i => (i, s"doc $i"))
    .toDF("doc_id", "text")

  test("membership is a pure function of the id — rewrite is identical") {
    val p1 = Files.createTempDirectory("graft-shards").toString
    val p2 = Files.createTempDirectory("graft-shards").toString
    // different input partitioning must not change assignment
    ShardWriter.writeShards(corpus.repartition(7), p1, "doc_id", nShards = 8)
    ShardWriter.writeShards(corpus.repartition(3), p2, "doc_id", nShards = 8)
    def membership(p: String) = spark.read.parquet(p)
      .select(col("doc_id"), col("shard").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m1 = membership(p1)
    assert(m1 == membership(p2))
    assert(m1.size == 1000)
    // and matches the exposed shardCol derivation
    val derived = corpus
      .select(col("doc_id"),
        ShardWriter.shardCol("doc_id", None, 8).cast("long").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m1 == derived)
    // hash-sharding spreads: every shard non-empty, no shard dominates
    val sizes = m1.values.groupBy(identity).map(_._2.size)
    assert(sizes.size == 8 && sizes.min > 50, s"skewed shards: $sizes")
  }

  test("epoch repeats of one doc land in different shards") {
    val p = Files.createTempDirectory("graft-shards").toString
    val repeated = corpus.limit(200)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1L), lit(4L))).as("epoch"))
    ShardWriter.writeShards(repeated, p, "doc_id", nShards = 8,
      epochCol = Some("epoch"))
    val spread = spark.read.parquet(p)
      .groupBy("doc_id")
      .agg(countDistinct(col("shard")).as("n_shards"))
      .agg(avg(col("n_shards"))).head().getDouble(0)
    // 4 epochs over 8 shards: expected distinct ≈ 8·(1-(7/8)^4) ≈ 3.3;
    // anything near 1 would mean repeats are colocated.
    assert(spread > 2.5, s"epoch repeats colocated: avg distinct shards $spread")
  }

  test("addressMap is dense, layout-invariant, and matches the written layout") {
    val out = ShardWriter.addressMap(corpus, "doc_id", nShards = 8)
      .select(col("doc_id"), col("shard"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 1000, "addressMap must keep every row")
    // pos is dense 0..n_s-1 within each shard, in id order (the write
    // sort order)
    out.groupBy(_._2).foreach { case (s, rows) =>
      val byPos = rows.sortBy(_._3)
      assert(byPos.map(_._3).toSeq == (0L until rows.length).toSeq,
        s"shard $s positions not dense")
      assert(byPos.map(_._1).toSeq == rows.map(_._1).sorted.toSeq,
        s"shard $s pos order must be the id write order")
    }
    // the map is a pure function of ids — input layout moves nothing
    val relaid = ShardWriter.addressMap(corpus.repartition(7), "doc_id", 8)
      .select(col("doc_id"), col("shard"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(relaid.toSet == out.toSet, "addressMap must be layout-invariant")
    // and it is the WRITTEN layout: membership identical to the files
    val p = Files.createTempDirectory("graft-shards").toString
    ShardWriter.writeShards(corpus, p, "doc_id", nShards = 8)
    val written = spark.read.parquet(p)
      .select(col("doc_id"), col("shard").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.map(t => t._1 -> t._2).toMap == written)
    // output-column collision fails loudly, not by silent overwrite
    val e = intercept[IllegalArgumentException](ShardWriter.addressMap(
      corpus.withColumn("shard", col("doc_id")), "doc_id", 8))
    assert(e.getMessage.contains("shard"))
  }

  test("maxRecordsPerFile bounds every data file") {
    val p = Files.createTempDirectory("graft-shards").toString
    ShardWriter.writeShards(corpus, p, "doc_id", nShards = 4,
      maxRecordsPerFile = 50L)
    import scala.jdk.CollectionConverters._
    val parquetFiles = Files.walk(java.nio.file.Paths.get(p)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    assert(parquetFiles.nonEmpty)
    parquetFiles.foreach { f =>
      val n = spark.read.parquet(f.toString).count()
      assert(n <= 50, s"file $f has $n rows > cap 50")
    }
    // nothing lost or duplicated
    assert(spark.read.parquet(p).count() == 1000)
  }
}
