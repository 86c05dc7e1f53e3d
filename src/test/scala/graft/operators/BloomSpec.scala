package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** The Bloom operator's contracts: no false negative EVER (the one
  * guarantee callers build exactness on), layout-independent builds,
  * a sane false-positive rate, and loud parameter validation.
  */
class BloomSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def probeHits(keys: Seq[Long], probes: Seq[Long], mBits: Int,
      j: Int, parts: Int = 1): Set[Long] = {
    val row = Bloom.buildRow(
      keys.toDF("key").repartition(parts), "key", mBits, j)
    val (h1, h2) = Bloom.hashes(col("key"))
    probes.toDF("key")
      .crossJoin(broadcast(row))
      .withColumn("h1", h1).withColumn("h2", h2)
      .filter(Bloom.mightContain("h1", "h2", "bloom", mBits, j))
      .collect().map(_.getLong(0)).toSet
  }

  test("no false negatives, fuzzed across sizes, hash counts, and layouts") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 5) {
      val keys = Seq.fill(50)(rnd.nextLong().abs % 100000).distinct
      val others = Seq.fill(200)(rnd.nextLong().abs % 100000)
        .filterNot(keys.contains).distinct
      val mBits = Seq(256, 512, 1024)(trial % 3)
      val j = 2 + trial % 3
      val hits = probeHits(keys, keys ++ others, mBits, j)
      assert(keys.toSet.subsetOf(hits),
        s"trial $trial: false negative — missing ${keys.toSet -- hits}")
      // build is layout-independent: same bits from any partitioning
      assert(probeHits(keys, keys ++ others, mBits, j, parts = 7) == hits,
        s"trial $trial: partitioning changed the filter")
    }
  }

  test("false-positive rate stays near theory at 16 bits/key") {
    val keys = (1L to 64L).toSeq // 64 keys in 1024 bits, j=3
    val probes = (1000L to 5999L).toSeq // 5000 guaranteed non-members
    val fp = probeHits(keys, probes, mBits = 1024, j = 3).size
    // theory: (1 - e^(-3*64/1024))^3 ≈ 0.5%; allow generous slack
    assert(fp < 100, s"fp rate ${fp / 5000.0} implausibly high")
  }

  test("empty key set builds an all-zero filter that rejects everything") {
    val row = Bloom.buildRow(
      Seq.empty[Long].toDF("key"), "key", mBits = 256)
    val words = row.collect().head.getSeq[Long](0)
    assert(words.length == 8 && words.forall(_ == 0L),
      s"empty build must still be a full zero array, got $words")
    assert(probeHits(Seq.empty, (1L to 50L).toSeq, 256, 3).isEmpty,
      "nothing may pass an empty filter")
  }

  test("stored row round-trips bit-for-bit with its shape; probes identically") {
    val keys = (1L to 80L).toSeq
    val built = Bloom.buildRow(keys.toDF("key"), "key", mBits = 512, j = 3)
    val path = java.nio.file.Files
      .createTempDirectory("graft-bloom").toString + "/row"
    Bloom.write(built, path, mBits = 512, j = 3, nKeys = keys.length.toLong)
    val back = Bloom.read(spark, path)
    assert(back.mBits == 512 && back.j == 3 && back.nKeys == 80L)
    assert(back.row.head().getSeq[Long](0) == built.head().getSeq[Long](0),
      "stored words drifted through disk")
    // a probe through the stored row equals a probe through the build
    val (h1, h2) = Bloom.hashes(col("key"))
    def hits(row: org.apache.spark.sql.DataFrame) =
      (1L to 400L).toDF("key").crossJoin(broadcast(row))
        .withColumn("h1", h1).withColumn("h2", h2)
        .filter(Bloom.mightContain("h1", "h2", "bloom", 512, 3))
        .collect().map(_.getLong(0)).toSet
    assert(hits(back.row) == hits(built))
  }

  test("merge of equal-shape filters ≡ building over the union; mismatch is loud") {
    val a = (1L to 60L).toSeq
    val b = (40L to 120L).toSeq // overlapping — idempotence exercised
    val merged = Bloom.merge(
      Bloom.buildRow(a.toDF("key"), "key", 512, 3),
      Bloom.buildRow(b.toDF("key"), "key", 512, 3))
    val direct = Bloom.buildRow((a ++ b).toDF("key"), "key", 512, 3)
    assert(merged.head().getSeq[Long](0) == direct.head().getSeq[Long](0),
      "bit_or merge must equal the one-shot union build")
    val ex = intercept[Exception] {
      Bloom.merge(
        Bloom.buildRow(a.toDF("key"), "key", 512, 3),
        Bloom.buildRow(b.toDF("key"), "key", 256, 3)).collect()
    }
    assert(ex.getMessage.contains("cannot merge"),
      s"shape mismatch must raise the documented error, got: ${ex.getMessage}")
  }

  test("sizeFor lands near the theoretical optimum and respects word packing") {
    val (m, j) = Bloom.sizeFor(1000, 0.01)
    assert(m % 32 == 0)
    assert(m >= 9580 && m <= 9620, s"m=$m for n=1000 fpp=1% (theory 9586)")
    assert(j == 7, s"j=$j (theory ln2·m/n ≈ 6.6)")
    intercept[IllegalArgumentException](Bloom.sizeFor(0, 0.01))
    intercept[IllegalArgumentException](Bloom.sizeFor(10, 1.5))
  }

  test("rejects nonsensical parameters loudly") {
    intercept[IllegalArgumentException] {
      Bloom.buildRow(Seq(1L).toDF("key"), "key", mBits = 100) // not /32
    }
    intercept[IllegalArgumentException] {
      Bloom.buildRow(Seq(1L).toDF("key"), "key", mBits = 0)
    }
    intercept[IllegalArgumentException] {
      Bloom.mightContain("h1", "h2", "bloom", mBits = 512, j = 0)
    }
    intercept[IllegalArgumentException] {
      Bloom.mightContain("h;1", "h2", "bloom", mBits = 512)
    }
  }
}
