package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle gate for the multimodal pack (r5, VERDICT #4) — the one
  * LLM-pipeline component that previously had only spec coverage.
  *
  * The corpus is generated deterministically from fixed seeds
  * (java.util.Random is spec-pinned LCG, so bytes are identical on any
  * JVM), and the oracle is a VALUES literal computed by running the
  * SAME decoder and chunk arithmetic as a straight-line driver-side
  * loop. The differential therefore exercises exactly the Spark-side
  * plumbing the stub seam leaves real: Dataset encoders over binary
  * payloads, the partition-mapped decode (mapPartitions), the 1→N
  * frame generator (flatMap), the higher-order checksum aggregate and
  * the joins — against a zero-Spark reference evaluation.
  *
  * Float discipline: the per-media feature checksum folds
  * `floor(double(f) * 1000)` into a LONG — float→double widening is
  * exact and floor has no tie semantics, so the checksum is
  * engine-exact without pinning float literals.
  */
object MediaGate {

  val NumMedia = 24
  private val FrameBytes = 512
  private val EveryKth = 2

  /** Deterministic seeded media corpus: mixed mimes, varied payload
    * sizes (~0.7–9.7 KB), bytes from a per-id fixed-seed LCG.
    */
  private def corpusRows: Seq[(Long, String, Array[Byte])] =
    (0 until NumMedia).map { i =>
      val mime = i % 3 match {
        case 0 => "image/png"
        case 1 => "audio/wav"
        case _ => "video/mp4"
      }
      val len = 700 + (i * 1371) % 9000
      val bytes = new Array[Byte](len)
      new java.util.Random(1000003L * i + 17).nextBytes(bytes)
      (i.toLong, mime, bytes)
    }

  /** media table as a DataFrame, spread over partitions so the
    * partition-mapped operators actually run distributed.
    */
  def media(s: SparkSession): DataFrame = {
    import s.implicits._
    corpusRows.toDF("media_id", "mime", "content")
      .repartition(4, col("media_id"))
  }

  /** m42: dimensions + frame sampling + feature checksum per media id
    * through the real operator surface.
    */
  def qMediaPipeline(s: SparkSession, dir: String): DataFrame = {
    val decoder = new Multimodal.StubDecoder(16)
    val m = media(s)
    val dims = Multimodal.probeDimensions(m, decoder)
    val feats = Multimodal.extractFeatures(m, decoder)
      .withColumn("feat_checksum", expr(
        "aggregate(features, 0L, (acc, f) -> acc + cast(floor(cast(f as double) * 1000.0) as long))"))
      .select(col("media_id"), col("feat_checksum"))
    val frames = Multimodal.sampleFrames(m, everyKth = EveryKth, frameBytes = FrameBytes)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(length(col("frame")).cast("long")).as("frame_bytes"))
    dims.join(feats, "media_id").join(frames, "media_id")
      .select(col("media_id"), col("width"), col("height"),
        col("n_frames"), col("frame_bytes"), col("feat_checksum"))
      .orderBy(col("media_id"))
  }

  /** VALUES oracle from a straight-line (no Spark) evaluation of the
    * same decoder and chunk arithmetic.
    */
  def qMediaPipelineOracle: String = {
    val decoder = new Multimodal.StubDecoder(16)
    val rows = corpusRows.map { case (id, mime, bytes) =>
      val (w, h) = decoder.dimensions(mime, bytes)
      val checksum = decoder.features(mime, bytes)
        .map(f => math.floor(f.toDouble * 1000.0).toLong).sum
      val nChunks = math.max(1, bytes.length / FrameBytes)
      val idxs = 0 until nChunks by EveryKth
      val frameBytes = idxs
        .map(i => math.min(bytes.length, i * FrameBytes + FrameBytes) - i * FrameBytes)
        .sum
      s"($id, $w, $h, ${idxs.size}, $frameBytes, $checksum)"
    }
    s"""SELECT CAST(media_id AS BIGINT) AS media_id, width, height,
          CAST(n_frames AS BIGINT) AS n_frames,
          CAST(frame_bytes AS BIGINT) AS frame_bytes,
          CAST(feat_checksum AS BIGINT) AS feat_checksum
        FROM (VALUES ${rows.mkString(",\n")})
          t(media_id, width, height, n_frames, frame_bytes, feat_checksum)
        ORDER BY media_id"""
  }

  val all: Seq[GateQuery] = Seq(
    GateQuery("m42_media_pipeline", qMediaPipeline, Some(qMediaPipelineOracle)),
  )
}
