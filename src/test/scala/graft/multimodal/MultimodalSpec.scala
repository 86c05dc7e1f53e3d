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

  test("resizeAll is deterministic and respects the target box") {
    val out = Multimodal.resizeAll(media.toDS(), () => StubCodec, 32, 32)
      .orderBy("media_id").collect()
    assert(out.length == 3)
    out.foreach(r => assert(r.getAs[Array[Byte]](1).length == 32 * 32))
    // same input bytes → same resized payload (ids 1 and 3)
    assert(out(0).getAs[Array[Byte]](1).toSeq == out(2).getAs[Array[Byte]](1).toSeq)
    // different target box → different payload
    val small = Multimodal.resizeAll(media.toDS(), () => StubCodec, 16, 16)
      .orderBy("media_id").collect()
    assert(small(0).getAs[Array[Byte]](1).length == 256)
    assert(small(0).getAs[Array[Byte]](1).toSeq !=
      out(0).getAs[Array[Byte]](1).take(256).toSeq)
  }

  test("sampleFramesAll fans out up to n evenly-spaced frames per medium") {
    val n = 4
    val out = Multimodal.sampleFramesAll(media.toDS(), () => StubCodec, n)
      .orderBy("media_id", "frame_idx").collect()
    val byId = out.groupBy(_.getLong(0))
    byId.foreach { case (id, rows) =>
      val total = StubCodec.decode(media.find(_._1 == id).get._2).nFrames
      assert(rows.length == math.min(n, total))
      assert(rows.map(_.getLong(1)).toSeq == (0 until rows.length).map(_.toLong))
      // frames are distinct (different frame indices → different digests)
      assert(rows.map(_.getAs[Array[Byte]](2).toSeq).distinct.length == rows.length)
    }
    // dup media (1 and 3) sample identical frames
    assert(byId(1L).map(_.getAs[Array[Byte]](2).toSeq).toSeq ==
      byId(3L).map(_.getAs[Array[Byte]](2).toSeq).toSeq)
  }

  test("exactDupGroups finds byte-identical media") {
    val groups = Multimodal.exactDupGroups(media.toDS())
      .orderBy("keeper_media_id").collect()
    assert(groups.length == 2)
    assert(groups(0).getLong(1) == 2L && groups(0).getLong(2) == 1L) // ids 1,3
    assert(groups(1).getLong(1) == 1L && groups(1).getLong(2) == 2L)
  }

  test("nearDupMedia: perceptual pairs via codec features, exact hashing blind to them") {
    // 11 and 13 share a first byte (perceptually identical under the
    // locality codec) but differ in every other byte — exactDupGroups
    // must NOT group them; nearDupMedia must pair them.
    val a = randBytes(7, 256)
    val b = randBytes(8, 256); b(0) = a(0)
    val c = randBytes(9, 256)
    assert(a.drop(1).toSeq != b.drop(1).toSeq)
    val dups = Seq((11L, a), (13L, b), (14L, c))
    val planes = Seq.tabulate(4) { i =>
      val r = new scala.util.Random(100 + i)
      Array.fill(64)(r.nextFloat() - 0.5f)
    }
    val exact = Multimodal.exactDupGroups(dups.toDS()).collect()
    assert(exact.forall(_.getLong(1) == 1L),
      "no byte-identical copies in this fixture")
    val pairs = Multimodal.nearDupMedia(dups.toDS(), () => FirstByteCodec,
        planes, threshold = 0.99)
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(pairs == Set((11L, 13L)),
      s"expected exactly the perceptual pair, got $pairs")
  }
}

/** A codec whose features have LOCALITY: determined entirely by the
  * first byte, so media sharing it are perceptually identical — the
  * behavior a real pHash/embedding codec supplies and StubCodec
  * (pure hashing) deliberately lacks.
  */
private[multimodal] object FirstByteCodec extends MediaCodec {
  override def decode(bytes: Array[Byte]) = StubCodec.decode(bytes)
  override def resize(bytes: Array[Byte], w: Int, h: Int) =
    StubCodec.resize(bytes, w, h)
  override def sampleFrames(bytes: Array[Byte], n: Int) =
    StubCodec.sampleFrames(bytes, n)
  override def features(bytes: Array[Byte], dim: Int): Array[Float] = {
    val r = new scala.util.Random(bytes.headOption.getOrElse(0: Byte).toInt)
    Array.fill(dim)(r.nextFloat() - 0.5f)
  }
}

