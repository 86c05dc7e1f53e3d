package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

class MultimodalSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def randBytes(seed: Int, n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    new scala.util.Random(seed).nextBytes(b)
    b
  }
  private val media = Seq(
    (1L, randBytes(1, 256)),
    (2L, randBytes(2, 512)),
    (3L, randBytes(1, 256))) // dup of 1

  test("decodeAll: per-partition codec, deterministic meta + features") {
    val out = Multimodal.decodeAll(media.toDS(), () => StubCodec)
      .orderBy("media_id").collect()
    assert(out.length == 3)
    val m1 = out(0).getStruct(1)
    assert(m1.getAs[Long]("sizeBytes") == 256L)
    assert(m1.getAs[Int]("width") % 16 == 0 && m1.getAs[Int]("height") % 16 == 0)
    // deterministic: same bytes → same meta + features (rows 1 and 3)
    assert(out(0).getStruct(1) == out(2).getStruct(1))
    assert(out(0).getSeq[Float](2) == out(2).getSeq[Float](2))
    assert(out(0).getSeq[Float](2).length == 64)
    // features normalized
    val norm = math.sqrt(out(0).getSeq[Float](2).map(x => x * x.toDouble).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("exactDupGroups finds byte-identical media") {
    val groups = Multimodal.exactDupGroups(media.toDS())
      .orderBy("keeper_media_id").collect()
    assert(groups.length == 2)
    assert(groups(0).getLong(1) == 2L && groups(0).getLong(2) == 1L) // ids 1,3
    assert(groups(1).getLong(1) == 1L && groups(1).getLong(2) == 2L)
  }
}
