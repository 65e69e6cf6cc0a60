package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque binary
  * columns with typed metadata, processed by partition-mapped batch
  * operators.
  *
  * The decode step itself is STUBBED (no media libraries in this
  * container — see [[StubDecoder]], clearly deterministic-fake); the
  * Spark-side contract is real: schema, batch shape (one decoder per
  * partition, streamed record iterator — never materialize a partition),
  * and the metadata/feature column layout a 100 TB media pipeline needs.
  * On a real cluster only [[MediaDecoder]] changes.
  */
object Multimodal {

  /** Typed media row: opaque payload + metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("codec", StringType))))))

  /** Decode seam. Implementations must be cheap to construct per
    * partition and safe to reuse across records.
    */
  trait MediaDecoder extends Serializable {
    /** payload → fixed-size feature vector (e.g. embedding / histogram). */
    def features(mime: String, content: Array[Byte]): Array[Float]
    /** payload → (width, height) for images, (-1,-1) otherwise. */
    def dimensions(mime: String, content: Array[Byte]): (Int, Int)
  }

  /** Deterministic fake: features are a seeded hash-derived vector, so
    * tests are reproducible and the pipeline shape is exercised
    * end-to-end without media libs.
    */
  final class StubDecoder(dim: Int = 16) extends MediaDecoder {
    override def features(mime: String, content: Array[Byte]): Array[Float] = {
      val h = java.util.Arrays.hashCode(content)
      val rnd = new java.util.Random(h.toLong)
      Array.fill(dim)(rnd.nextFloat() - 0.5f)
    }
    override def dimensions(mime: String, content: Array[Byte]): (Int, Int) =
      if (mime != null && mime.startsWith("image/"))
        (content.length % 1024 + 1, content.length % 768 + 1)
      else (-1, -1)
  }

  /** Feature extraction over a media DataFrame: one decoder per
    * partition, record-streamed (constant memory per task). Output keeps
    * the id + mime and adds `features: array<float>`.
    */
  def extractFeatures(media: DataFrame, decoder: MediaDecoder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("mime"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mime, bytes) =>
          (id, mime, decoder.features(mime, bytes))
        }
      }
      .toDF("media_id", "mime", "features")
  }

  /** Metadata enrichment (decode dimensions) — same partition-mapped
    * shape.
    */
  def probeDimensions(media: DataFrame, decoder: MediaDecoder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("mime"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, mime, bytes) =>
        val (w, h) = decoder.dimensions(mime, bytes)
        (id, w, h)
      })
      .toDF("media_id", "width", "height")
  }

  /** Perceptual block-hash over the payload — the blockhash family of
    * image fingerprints computed over the byte stream as the stub
    * stand-in for decoded pixel blocks (a real deployment decodes
    * first; the hashing, banding and join machinery below it is what
    * this engine owns): split the payload into `blocks` equal runs,
    * bit_i = "block i's unsigned byte sum is at or above the
    * per-block average" — compared as `blockSum·blocks ≥ totalSum`,
    * pure integers, no division. Visually-near payloads (small
    * re-encode perturbations) flip few block relations → small
    * Hamming distance; unrelated payloads land ~blocks/2 apart.
    * Same partition-mapped record-streamed shape as
    * [[extractFeatures]].
    */
  def blockHash(media: DataFrame, blocks: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val sums = new Array[Long](blocks)
        val n = math.max(bytes.length, 1)
        var i = 0
        while (i < bytes.length) {
          sums((i.toLong * blocks / n).toInt) += (bytes(i) & 0xff)
          i += 1
        }
        val total = sums.sum
        var hash = 0L
        var b = 0
        while (b < blocks) {
          if (sums(b) * blocks >= total) hash |= (1L << b)
          b += 1
        }
        (id, hash)
      })
      .toDF("media_id", "phash")
  }

  /** Resize planning — the thumbnail/normalize step an image pipeline
    * runs before a vision encoder: decode dimensions (stub seam), fit
    * into a `target`×`target` box preserving aspect ratio, report the
    * output size and the scaled byte budget. All arithmetic is
    * integer (`out = dim·target div max(w,h)`, floor semantics with a
    * 1-pixel floor), so the plan is engine-exact; the actual pixel
    * resample lives behind the same decoder seam as everything else
    * (the container has no image libs — the Spark-side plumbing is
    * the deliverable). Same partition-mapped shape as
    * [[probeDimensions]].
    */
  def planResize(media: DataFrame, decoder: MediaDecoder,
      target: Int = 224): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("mime"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, mime, bytes) =>
        val (w, h) = decoder.dimensions(mime, bytes)
        // dimensionless payloads (audio/video under this decoder)
        // pass through unplanned with a zero pixel budget
        if (w <= 0 || h <= 0) (id, w, h, w, h, 0L)
        else {
          val m = math.max(w, h)
          val (ow, oh) =
            if (m <= target) (w, h) // never upscale
            else (math.max(w.toLong * target / m, 1L).toInt,
                  math.max(h.toLong * target / m, 1L).toInt)
          (id, w, h, ow, oh, ow.toLong * oh * 3L) // RGB byte budget
        }
      })
      .toDF("media_id", "width", "height", "out_w", "out_h", "out_bytes")
  }

  /** Per-frame energy over the payload — the VAD-shaped statistic an
    * audio-curation pass needs before segmentation: the payload splits
    * into fixed-size frames and each frame reports the sum of absolute
    * sample amplitudes (bytes as signed samples — the stub stand-in
    * for decoded PCM; a real deployment decodes the codec first, the
    * framing/energy/segmentation machinery downstream is what this
    * engine owns). Integer energies end to end. Same 1→N generator
    * shape as [[sampleFrames]], but only the (id, idx, energy) triple
    * leaves the task — frame BYTES never ship.
    */
  def frameEnergy(media: DataFrame, frameBytes: Int = 256): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nFrames = math.max(1, (bytes.length + frameBytes - 1) / frameBytes)
        (0 until nFrames).map { i =>
          var e = 0L
          var j = i * frameBytes
          val end = math.min(bytes.length, j + frameBytes)
          while (j < end) { e += math.abs(bytes(j).toInt); j += 1 }
          (id, i, e)
        }
      }
      .toDF("media_id", "frame_idx", "energy")
  }

  /** Frame sampling for video-shaped payloads: emit every k-th chunk of
    * the payload as a pseudo-frame (stub chunking; real impl swaps the
    * chunker for a codec). Demonstrates the 1→N generator shape
    * (flatMap) that keeps frame explosion distributed.
    */
  def sampleFrames(media: DataFrame, everyKth: Int = 10,
      frameBytes: Int = 4096): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nChunks = math.max(1, bytes.length / frameBytes)
        (0 until nChunks by everyKth).map { i =>
          val from = i * frameBytes
          val until = math.min(bytes.length, from + frameBytes)
          (id, i, java.util.Arrays.copyOfRange(bytes, from, until))
        }
      }
      .toDF("media_id", "frame_idx", "frame")
  }
}
