package graft.store

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSession}
import graft.functions.vectors

/** The IVF index must actually prune partitions (visible in the physical
  * plan), and its in-cell results must be exact.
  */
class IvfIndexSpec extends AnyFunSuite {
  import TestSession.{sf, spark}

  private lazy val path = {
    val p = Files.createTempDirectory("graft-ivf").toString
    val e = Tables.embeddings(spark, sf)
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("seed_id"), col("embedding").as("seed_vec"))
    IvfIndex.build(e, "vec_id", "embedding", seeds, "seed_id", "seed_vec", p)
    p
  }

  private lazy val query: Array[Float] =
    Tables.embeddings(spark, sf).filter(col("vec_id") === 42)
      .head().getSeq[Float](1).toArray

  test("search plan prunes to the probed cell's partition") {
    val df = IvfIndex.search(spark, path, "vec_id", "embedding", query, k = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(400))
    assert("cell#\\d+L? IN|cell#\\d+L? =".r.findFirstIn(plan).isDefined,
      "expected a cell partition filter in:\n" + plan.take(800))
    assert(df.count() == 5)
  }

  test("in-cell results are exact (match brute force over that cell)") {
    val rows = IvfIndex.search(spark, path, "vec_id", "embedding", query, k = 5)
      .collect()
    val probedCell = rows.head.getAs[Number]("cell").longValue
    val got = rows.map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val brute = spark.read.parquet(s"$path/vectors")
      .filter(col("cell") === probedCell)
      .withColumn("score", vectors.cosineSimilarity(col("embedding"), lit(query)))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(5).collect()
      .map(r => (r.getLong(r.fieldIndex("vec_id")),
        r.getDouble(r.fieldIndex("score")))).toSeq
    assert(got == brute)
  }

  test("searchBatch matches per-probe search and prunes partitions dynamically") {
    val probes = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 100 === 0 && col("vec_id") < 300)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val batch = IvfIndex.searchBatch(spark, path, "vec_id", "embedding",
      probes, "probe_id", "embedding", k = 5)
    // Equality per probe against the single-query face (same cells,
    // same arithmetic, same ties).
    val got = batch.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = probes.collect().flatMap { p =>
      val q = p.getSeq[Float](1).toArray
      IvfIndex.search(spark, path, "vec_id", "embedding", q, k = 5)
        .collect().zipWithIndex
        .map { case (r, i) => (p.getLong(0), (i + 1).toLong, r.getLong(1)) }
    }.toSet
    assert(got == expected)
    // The scale pin: the cell filter must reach the partitioned scan
    // as a DYNAMIC pruning subquery (derived from the broadcast
    // probe-cell pairs at runtime), so unprobed cells' files are
    // skipped before IO for the whole batch at once.
    val plan = batch.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      "expected dynamic partition pruning on cell in:\n" + plan.take(1200))
  }

  test("nProbe widens the searched cells monotonically") {
    def ids(nProbe: Int) =
      IvfIndex.search(spark, path, "vec_id", "embedding", query, 50, nProbe)
        .collect().map(_.getLong(1)).toSet
    val one = ids(1)
    val two = ids(2)
    assert(one.subsetOf(two) || two.size >= one.size)
  }

  private lazy val qpath = {
    val p = Files.createTempDirectory("graft-ivfq").toString
    val e = Tables.embeddings(spark, sf)
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("seed_id"), col("embedding").as("seed_vec"))
    IvfIndex.buildQuantized(e, "vec_id", "embedding", seeds,
      "seed_id", "seed_vec", p)
    p
  }

  private def dirBytes(dir: String): Long = {
    val root = java.nio.file.Paths.get(dir)
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .map(java.nio.file.Files.size)
      .sum
  }

  test("quantized index: no float column on disk, scan reads only (id, codes, scale)") {
    val schema = spark.read.parquet(s"$qpath/vectors").schema
    assert(!schema.fieldNames.contains("embedding"),
      s"float32 vectors must not persist in the quantized index: $schema")
    assert(schema("codes").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType),
      s"codes must store as array<tinyint>: ${schema("codes").dataType}")
    val probe = IvfIndex.searchQuantized(spark, qpath, "vec_id", query, k = 5)
    val Seq(scan) = probe.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.requiredSchema.fieldNames.sorted.toSeq ==
      Seq("codes", "scale", "vec_id"),
      s"probe must read exactly (codes, scale, vec_id): ${scan.requiredSchema}")
    assert(scan.metadata.getOrElse("PartitionFilters", "").contains("cell"),
      "quantized probe must keep the cell partition pruning")
    // the scan-bytes claim, measured not asserted-by-doc: the quantized
    // cells hold well under half the float index's bytes (codes are
    // 1 byte/dim vs 4, minus parquet framing overhead)
    val ratio = dirBytes(s"$qpath/vectors").toDouble / dirBytes(s"$path/vectors")
    assert(ratio < 0.5, f"quantized/float on-disk ratio $ratio%.2f >= 0.5")
  }

  test("quantized probe: scores match v11's dequantized arithmetic; recall holds") {
    val got = IvfIndex.searchQuantized(spark, qpath, "vec_id", query, k = 10)
      .collect()
    assert(got.length == 10)
    val probedCell = got.head.getAs[Number]("cell").longValue
    // brute-force the same cell on the QUANTIZED data with v11's exact
    // dequantize-then-cosine arithmetic — must match bit for bit
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val deq = transform(col("codes"), c => c.cast("double") * col("scale"))
      .cast(ArrayType(FloatType))
    val brute = spark.read.parquet(s"$qpath/vectors")
      .filter(col("cell") === probedCell)
      .withColumn("score", vectors.cosineSimilarity(deq, lit(query)))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(10).collect()
      .map(r => (r.getLong(r.fieldIndex("vec_id")),
        r.getDouble(r.fieldIndex("score")))).toSeq
    assert(got.map(r => (r.getLong(1), r.getDouble(2))).toSeq == brute)
    // recall floor vs the float index over the same cell layout: SQ8
    // perturbs near-boundary ranks only, so the top-10 sets must agree
    // on at least 8 of 10 (deterministic fixture; observed 10/10)
    val floatTop = IvfIndex.search(spark, path, "vec_id", "embedding",
      query, k = 10).collect().map(_.getLong(1)).toSet
    val overlap = got.map(_.getLong(1)).count(floatTop.contains)
    assert(overlap >= 8, s"quantized top-10 recall $overlap/10 vs float index")
  }

  test("append: build(base) + append(delta) ≡ one-shot build; pruning intact") {
    val e = Tables.embeddings(spark, sf)
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("seed_id"), col("embedding").as("seed_vec"))
    val p2 = Files.createTempDirectory("graft-ivf-append").toString
    IvfIndex.build(e.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
      seeds, "seed_id", "seed_vec", p2)
    IvfIndex.append(e.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
      p2)
    // on-disk contents: (cell, vec_id) multiset identical to the
    // one-shot index built in this suite's shared fixture
    def cells(p: String) = spark.read.parquet(s"$p/vectors")
      .select(col("cell"), col("vec_id")).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1))).toSet
    assert(cells(p2) == cells(path),
      "appended layout must equal the rebuilt layout cell for cell")
    // the search face over the appended index is bit-identical and
    // still prunes partitions before IO
    val a = IvfIndex.search(spark, p2, "vec_id", "embedding", query, k = 5)
    assert(a.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    val got = a.collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val ref = IvfIndex.search(spark, path, "vec_id", "embedding", query, k = 5)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(got == ref)
  }

  test("compact: appended small files fold to one per cell; rows, search, pruning intact") {
    val e = Tables.embeddings(spark, sf)
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("seed_id"), col("embedding").as("seed_vec"))
    val p2 = Files.createTempDirectory("graft-ivf-compact").toString
    IvfIndex.build(e.filter(col("vec_id") % 4 === 0), "vec_id", "embedding",
      seeds, "seed_id", "seed_vec", p2)
    for (r <- 1L to 3L)
      IvfIndex.append(e.filter(col("vec_id") % 4 === r), "vec_id",
        "embedding", p2)
    def rows(p: String) = spark.read.parquet(s"$p/vectors")
      .select(col("cell"), col("vec_id")).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1))).toSet
    val preRows = rows(p2)
    val preSearch = IvfIndex.search(spark, p2, "vec_id", "embedding",
      query, k = 5).collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val (before, after) = IvfIndex.compact(spark, p2)
    val nCells = spark.read.parquet(s"$p2/vectors")
      .select(col("cell")).distinct().count()
    assert(before > nCells,
      s"fixture must start fragmented: $before files over $nCells cells")
    assert(after == nCells,
      s"compaction must leave exactly one file per cell: $after vs $nCells")
    assert(rows(p2) == preRows, "compaction must not change contents")
    val post = IvfIndex.search(spark, p2, "vec_id", "embedding", query, k = 5)
    assert(post.queryExecution.executedPlan.toString
      .contains("PartitionFilters"), "pruning must survive compaction")
    assert(post.collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
      == preSearch)
  }

  test("delete: tombstones hide ids from every face; compact drops them physically") {
    val e = Tables.embeddings(spark, sf)
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("seed_id"), col("embedding").as("seed_vec"))
    val p2 = Files.createTempDirectory("graft-ivf-del").toString
    IvfIndex.build(e, "vec_id", "embedding", seeds, "seed_id", "seed_vec", p2)
    // delete the current top-2 so the tombstones demonstrably bite
    val top = IvfIndex.search(spark, p2, "vec_id", "embedding", query, k = 5)
      .collect().map(_.getLong(1)).toSeq
    val dead = top.take(2)
    IvfIndex.delete(spark, p2, dead)
    // reference: an index REBUILT without the deleted rows
    val p3 = Files.createTempDirectory("graft-ivf-del-ref").toString
    IvfIndex.build(e.filter(!col("vec_id").isin(dead: _*)), "vec_id",
      "embedding", seeds, "seed_id", "seed_vec", p3)
    def res(p: String) =
      IvfIndex.search(spark, p, "vec_id", "embedding", query, k = 5)
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(res(p2) == res(p3),
      "post-delete search must equal rebuild-without-deleted")
    assert(res(p2).map(_._1).intersect(dead).isEmpty)
    // the batch face filters too
    val probes = e.filter(col("vec_id") === 42)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val batchIds = IvfIndex.searchBatch(spark, p2, "vec_id", "embedding",
      probes, "probe_id", "embedding", k = 5)
      .collect().map(_.getLong(2)).toSet
    assert(batchIds.intersect(dead.toSet).isEmpty,
      "searchBatch must not surface tombstoned ids")
    // compact: rows physically drop, tombstones clear, search unchanged
    val preRows = spark.read.parquet(s"$p2/vectors").count()
    val preSearch = res(p2)
    IvfIndex.compact(spark, p2)
    assert(spark.read.parquet(s"$p2/vectors").count() == preRows - dead.length,
      "compaction must physically drop the tombstoned rows")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$p2/tombstones")),
      "a committed compact must clear the tombstone set")
    assert(res(p2) == preSearch, "search must be unchanged by the compact")
    // second delete round after compact still works (fresh tombstone dir)
    IvfIndex.delete(spark, p2, Seq(top(2)))
    assert(!res(p2).map(_._1).contains(top(2)))
  }

  test("delete on a quantized index: searchQuantized hides tombstoned ids") {
    val e = Tables.embeddings(spark, sf)
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("seed_id"), col("embedding").as("seed_vec"))
    val p2 = Files.createTempDirectory("graft-ivfq-del").toString
    IvfIndex.buildQuantized(e, "vec_id", "embedding", seeds,
      "seed_id", "seed_vec", p2)
    val top = IvfIndex.searchQuantized(spark, p2, "vec_id", query, k = 5)
      .collect().map(_.getLong(1)).toSeq
    IvfIndex.delete(spark, p2, top.take(2))
    val after = IvfIndex.searchQuantized(spark, p2, "vec_id", query, k = 5)
      .collect().map(_.getLong(1)).toSeq
    assert(after.intersect(top.take(2)).isEmpty)
    assert(after.length == 5, "the heap must backfill past tombstones")
    // quantized compact drops them physically (idColOf resolves vec_id
    // among (codes, scale, cell))
    val preRows = spark.read.parquet(s"$p2/vectors").count()
    IvfIndex.compact(spark, p2)
    assert(spark.read.parquet(s"$p2/vectors").count() == preRows - 2)
  }

  test("compact heals a crashed predecessor's swap states") {
    val e = Tables.embeddings(spark, sf)
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("seed_id"), col("embedding").as("seed_vec"))
    val p2 = Files.createTempDirectory("graft-ivf-heal").toString
    IvfIndex.build(e, "vec_id", "embedding", seeds, "seed_id", "seed_vec", p2)
    val want = spark.read.parquet(s"$p2/vectors").count()
    val fs = new org.apache.hadoop.fs.Path(p2).getFileSystem(
      spark.sessionState.newHadoopConf())
    // crash between the renames: vectors moved aside, replacement never
    // landed — the data exists only under vectors_old
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$p2/vectors"),
      new org.apache.hadoop.fs.Path(s"$p2/vectors_old")))
    val (before, after) = IvfIndex.compact(spark, p2)
    assert(before > 0 && after > 0)
    assert(spark.read.parquet(s"$p2/vectors").count() == want,
      "heal must restore the moved-aside data before compacting")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$p2/vectors_old")))
    // crash after the swap, before cleanup: a superseded vectors_old
    // lingers next to a live vectors — the next compact removes it
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$p2/vectors_old"))
    IvfIndex.compact(spark, p2)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$p2/vectors_old")))
    assert(spark.read.parquet(s"$p2/vectors").count() == want)
  }

  test("appendQuantized: delta codes indistinguishable from built ones") {
    val e = Tables.embeddings(spark, sf)
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("seed_id"), col("embedding").as("seed_vec"))
    val p2 = Files.createTempDirectory("graft-ivfq-append").toString
    IvfIndex.buildQuantized(e.filter(col("vec_id") % 2 === 0), "vec_id",
      "embedding", seeds, "seed_id", "seed_vec", p2)
    IvfIndex.appendQuantized(e.filter(col("vec_id") % 2 === 1), "vec_id",
      "embedding", p2)
    val schema = spark.read.parquet(s"$p2/vectors").schema
    assert(!schema.fieldNames.contains("embedding"),
      "appended rows must not reintroduce the float column")
    val got = IvfIndex.searchQuantized(spark, p2, "vec_id", query, k = 5)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val ref = IvfIndex.searchQuantized(spark, qpath, "vec_id", query, k = 5)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(got == ref, "quantized search over appended ≡ over rebuilt")
  }

  test("splitCell: hot cell rebalances locally; content exact; crash leftovers reclaimed by compact") {
    val p2 = Files.createTempDirectory("graft-ivf-split").toString
    val e = Tables.embeddings(spark, sf)
    val seeds = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("seed_id"), col("embedding").as("seed_vec"))
    IvfIndex.build(e, "vec_id", "embedding", seeds, "seed_id", "seed_vec", p2)
    def profile(pp: String) = spark.read.parquet(s"$pp/vectors")
      .groupBy(col("cell")).count().collect()
      .map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    def allRows(pp: String) = spark.read.parquet(s"$pp/vectors")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val before = profile(p2)
    val hot = before.maxBy(_._2)._1
    val contentBefore = allRows(p2)

    val (a, b) = IvfIndex.splitCell(spark, p2, "vec_id", "embedding", hot)
    val after = profile(p2)
    // the hot cell is gone; its rows landed wholly in the two halves
    assert(!after.contains(hot) && after.contains(a) && after.contains(b))
    assert(after(a) + after(b) == before(hot),
      s"split must conserve the cell's rows: $before -> $after")
    assert(after(a).max(after(b)) < before(hot),
      "both halves must be strictly smaller than the hot cell")
    // every other cell untouched, total content exact
    (before - hot).foreach { case (c, n) => assert(after(c) == n) }
    assert(allRows(p2) == contentBefore, "no vector may change or vanish")
    // the codebook flipped: hot seed replaced by the two sub-seeds
    val cells = spark.read.parquet(s"$p2/seeds").select(col("cell"))
      .collect().map(_.getLong(0)).toSet
    assert(!cells.contains(hot) && cells.contains(a) && cells.contains(b))
    // pruning still works against a new half
    val q = spark.read.parquet(s"$p2/vectors").filter(col("cell") === a)
      .head().getSeq[Float](1).toArray
    val plan = IvfIndex.search(spark, p2, "vec_id", "embedding", q, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(400))

    // crash-leftover invariant: a cell dir the seeds do not list is
    // dead — searches never probe it, and compact reclaims it
    spark.read.parquet(s"$p2/vectors").filter(col("cell") === a)
      .withColumn("cell", lit(9999L))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("cell").parquet(s"$p2/vectors")
    assert(profile(p2).contains(9999L)) // bytes exist on disk...
    IvfIndex.compact(spark, p2)
    assert(!profile(p2).contains(9999L),
      "compact must reclaim unreferenced cells")
    assert(allRows(p2) == contentBefore,
      "reclamation must not touch live rows")
  }

  test("mergeCells: two cold cells consolidate; content exact; split round-trips") {
    val p2 = Files.createTempDirectory("graft-ivf-merge").toString
    val e = Tables.embeddings(spark, sf)
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("seed_id"), col("embedding").as("seed_vec"))
    IvfIndex.build(e, "vec_id", "embedding", seeds, "seed_id", "seed_vec", p2)
    def profile(pp: String) = spark.read.parquet(s"$pp/vectors")
      .groupBy(col("cell")).count().collect()
      .map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    def allRows(pp: String) = spark.read.parquet(s"$pp/vectors")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val before = profile(p2)
    val contentBefore = allRows(p2)
    // the two coldest cells — the pair the v18 profile would flag
    val Seq(a, b) = before.toSeq.sortBy { case (c, n) => (n, c) }
      .take(2).map(_._1).sorted
    val merged = IvfIndex.mergeCells(spark, p2, a, b)
    val after = profile(p2)
    assert(!after.contains(a) && !after.contains(b) && after.contains(merged))
    assert(after(merged) == before(a) + before(b),
      s"merge must conserve both cells' rows: $before -> $after")
    (before - a - b).foreach { case (c, n) => assert(after(c) == n) }
    assert(allRows(p2) == contentBefore, "no vector may change or vanish")
    // the codebook flipped: one mean seed replaces the two retired ones
    val seedRows = spark.read.parquet(s"$p2/seeds")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(!seedRows.contains(a) && !seedRows.contains(b)
      && seedRows.contains(merged))
    // pruning still works against the merged cell
    val q = spark.read.parquet(s"$p2/vectors")
      .filter(col("cell") === merged).head().getSeq[Float](1).toArray
    val plan = IvfIndex.search(spark, p2, "vec_id", "embedding", q, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(400))
    // splitCell round-trips the merged cell (ids keep advancing — the
    // shared collision-proof floor)
    val (s1, s2) = IvfIndex.splitCell(spark, p2, "vec_id", "embedding", merged)
    assert(s1 > merged && s2 > merged)
    val post = profile(p2)
    assert(post(s1) + post(s2) == before(a) + before(b))
    assert(allRows(p2) == contentBefore)
  }

  test("splitCell: staged leftovers from a crashed split never collide with new ids") {
    val p2 = Files.createTempDirectory("graft-ivf-split-crash").toString
    val e = Tables.embeddings(spark, sf)
    val seeds = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("seed_id"), col("embedding").as("seed_vec"))
    IvfIndex.build(e, "vec_id", "embedding", seeds, "seed_id", "seed_vec", p2)
    def profile(pp: String) = spark.read.parquet(s"$pp/vectors")
      .groupBy(col("cell")).count().collect()
      .map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    def allRows(pp: String) = spark.read.parquet(s"$pp/vectors")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val contentBefore = allRows(p2)
    val before = profile(p2)
    val hot = before.maxBy(_._2)._1
    val seedsMax = spark.read.parquet(s"$p2/seeds").select(col("cell"))
      .collect().map(_.getLong(0)).max
    // Simulate a split that crashed between append (step 1) and the
    // seeds flip (step 2): staged halves sit at the exact ids a
    // codebook-only nextId would hand out again.
    val staged = Seq(seedsMax + 1, seedsMax + 2)
    staged.foreach { c =>
      spark.read.parquet(s"$p2/vectors").filter(col("cell") === hot)
        .withColumn("cell", lit(c))
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .partitionBy("cell").parquet(s"$p2/vectors")
    }
    val stagedCount = profile(p2)(staged.head)
    // The retry (no compact in between — the dangerous window).
    val (a, b) = IvfIndex.splitCell(spark, p2, "vec_id", "embedding", hot)
    assert(!staged.contains(a) && !staged.contains(b),
      s"new ids $a/$b must skip the staged dirs $staged")
    val after = profile(p2)
    assert(after(a) + after(b) == before(hot),
      "the retry's halves must hold exactly the hot cell's rows")
    staged.foreach(c => assert(after(c) == stagedCount,
      "staged dead bytes are untouched, not resurrected"))
    // Live content (codebook-listed cells only) is exact: dead staged
    // rows are invisible to every search face, and compact drops them.
    val live = spark.read.parquet(s"$p2/seeds").select(col("cell"))
      .collect().map(_.getLong(0)).toSet
    assert(staged.forall(c => !live.contains(c)))
    IvfIndex.compact(spark, p2)
    assert(allRows(p2) == contentBefore,
      "post-compact content ≡ pre-crash content, duplicates gone")
    staged.foreach(c => assert(!profile(p2).contains(c)))
  }
}
