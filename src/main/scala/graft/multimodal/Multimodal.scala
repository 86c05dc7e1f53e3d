package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata (beyond the reference's text-only scope; part of the
  * training-data-pipeline surface).
  *
  * The Spark-side plumbing is real — schema, per-partition decoder
  * lifecycle, batch shape, deterministic outputs; the codec itself is a
  * clearly-marked STUB (this container has no image/audio libraries):
  * [[StubCodec]] derives plausible fields from the bytes' md5, so tests
  * pin the pipeline end-to-end. A real deployment swaps in an actual
  * decoder behind the same [[MediaCodec]] trait; everything else —
  * partitioning, mapPartitions batching, store layout — is unchanged.
  */
final case class MediaMeta(
    format: String,
    width: Int,
    height: Int,
    nFrames: Int,
    sizeBytes: Long)

/** Decoder contract. One instance is created PER PARTITION (like the
  * embedding model in E1): codecs hold native state that must not cross
  * task boundaries or be serialized per row.
  */
trait MediaCodec extends Serializable {
  def decode(bytes: Array[Byte]): MediaMeta
  /** Fixed-dim feature vector (the multimodal analog of an embedding). */
  def features(bytes: Array[Byte], dim: Int): Array[Float]
  /** Re-encode at the given size (image resize / audio downsample). */
  def resize(bytes: Array[Byte], width: Int, height: Int): Array[Byte]
  /** Sample up to `n` frames, evenly spaced over the medium's frames. */
  def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]]
}

/** STUB codec — deterministic fake decode (no media libs available).
  * Fields derive from md5(bytes): stable across JVMs and partitionings.
  */
object StubCodec extends MediaCodec {
  override def decode(bytes: Array[Byte]): MediaMeta = {
    val h = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    def u(i: Int) = h(i) & 0xff
    MediaMeta(
      format = Seq("png", "jpeg", "wav", "mp4")(u(0) % 4),
      width = 16 * (1 + u(1) % 64),
      height = 16 * (1 + u(2) % 64),
      nFrames = 1 + u(3) % 30,
      sizeBytes = bytes.length.toLong)
  }

  /** STUB resize: deterministic re-digest sized to width×height bytes
    * (cycled md5 of the input + target box) — stands in for a real
    * scaler; stable across JVMs like every other stub field.
    */
  override def resize(bytes: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val seed = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes ++ s":$width:$height".getBytes("UTF-8"))
    val n = math.min(width * height, 4096) // stub payload, capped
    Array.tabulate[Byte](n)(i => seed(i % seed.length))
  }

  /** STUB frame sampling: frame i = md5(bytes ++ ":frame:" ++ i) for n
    * evenly-spaced indices in [0, nFrames) — deterministic, one entry
    * per sampled frame, like a real keyframe extractor's output shape.
    */
  override def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
    require(n > 0)
    val total = decode(bytes).nFrames
    val idxs =
      if (total <= n) 0 until total
      else (0 until n).map(i => (i.toLong * total / n).toInt)
    idxs.map { i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(bytes ++ s":frame:$i".getBytes("UTF-8"))
    }
  }

  override def features(bytes: Array[Byte], dim: Int): Array[Float] = {
    // Hashing features over byte 4-grams — same scheme as the text
    // HashingEmbedder, so downstream kNN works unchanged on media.
    val acc = new Array[Double](dim)
    var i = 0
    while (i + 4 <= bytes.length) {
      val h = ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
      acc((h % dim).toInt) += (if ((h / dim) % 2 == 0) 1.0 else -1.0)
      i += 4
    }
    var norm = 0.0
    acc.foreach(x => norm += x * x)
    val out = new Array[Float](dim)
    if (norm > 0) {
      val inv = 1.0 / math.sqrt(norm)
      for (j <- 0 until dim) out(j) = (acc(j) * inv).toFloat
    }
    out
  }
}

object Multimodal {

  /** Decode + feature-extract a binary media column. mapPartitions: the
    * codec is constructed once per partition and amortized over its rows
    * (NOT per row, NOT broadcast-serialized per task closure beyond the
    * factory). Output schema: (id, meta struct, features array<float>).
    */
  def decodeAll(media: Dataset[(Long, Array[Byte])],
      codecFactory: () => MediaCodec, featureDim: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = codecFactory() // one decoder per partition (E1 shape)
      rows.map { case (id, bytes) =>
        (id, codec.decode(bytes), codec.features(bytes, featureDim))
      }
    }.toDF("media_id", "meta", "features")
  }

  /** Resize every medium (one codec per partition, like [[decodeAll]]).
    * Output: (media_id, resized binary) — the thumbnail/downsample pass
    * of a training-data pipeline, run as a row-local projection.
    */
  def resizeAll(media: Dataset[(Long, Array[Byte])],
      codecFactory: () => MediaCodec, width: Int, height: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = codecFactory()
      rows.map { case (id, bytes) => (id, codec.resize(bytes, width, height)) }
    }.toDF("media_id", "resized")
  }

  /** Sample frames from every medium: 1 row → up to `n` rows
    * (media_id, frame_idx, frame) — the keyframe-extraction fan-out,
    * row-local like the splitters, so it runs map-side at input
    * parallelism with no shuffle.
    */
  def sampleFramesAll(media: Dataset[(Long, Array[Byte])],
      codecFactory: () => MediaCodec, n: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = codecFactory()
      rows.flatMap { case (id, bytes) =>
        codec.sampleFrames(bytes, n).iterator.zipWithIndex
          .map { case (f, i) => (id, i.toLong, f) }
      }
    }.toDF("media_id", "frame_idx", "frame")
  }

  /** Near-dup media detection: exact via md5 over raw bytes; perceptual
    * near-dup reuses the vector LSH path over [[MediaCodec.features]].
    */
  def exactDupGroups(media: Dataset[(Long, Array[Byte])]): DataFrame = {
    import media.sparkSession.implicits._
    media.toDF("media_id", "bytes")
      .select(col("media_id"), md5(col("bytes")).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("n_copies"),
        min(col("media_id")).as("keeper_media_id"))
  }

  /** PERCEPTUAL near-dup media pairs — the image/video dedup pass
    * exact byte hashing cannot do (a re-encoded or resized copy shares
    * no bytes): per-partition codec features ([[decodeAll]]'s E1
    * shape), then cosine pairs through the LSH-bucketed vector path
    * ([[graft.operators.Similarity.nearDupPairs]]) so candidates are
    * bucket-bounded, never all-pairs — at 100 TB of media the shuffle
    * carries (bucket, feature) rows, not media bytes, because the
    * binary column is DROPPED before the exchange (only id + the
    * `featureDim`-float vector cross the wire). With [[StubCodec]]
    * (hash features, no locality) only identical bytes pair up — the
    * contract a real perceptual codec (pHash, CLIP embedding) plugs
    * into is pinned in MultimodalSpec with a locality-aware test
    * codec.
    *
    * `planes` are the LSH hyperplanes (seed vectors); pairs below
    * `threshold` cosine are dropped. Returns (a_id, b_id, score).
    */
  def nearDupMedia(media: Dataset[(Long, Array[Byte])],
      codecFactory: () => MediaCodec,
      planes: Seq[Array[Float]],
      featureDim: Int = 64,
      threshold: Double = 0.9): DataFrame = {
    val feats = decodeAll(media, codecFactory, featureDim)
      .select(col("media_id"), col("features"))
    graft.operators.Similarity.nearDupPairs(
      feats, "media_id", "features", planes, threshold)
  }
}
