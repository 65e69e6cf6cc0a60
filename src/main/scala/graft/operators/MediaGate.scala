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

  // -- Perceptual-hash near-dup gate (m45) ------------------------------

  // Production-width fingerprint (r8 VERDICT #3): 64-bit hash, 8 bands
  // × 8 bits. The old 16-bit/4-band config had only 16 values per band
  // key — every band-bucket held ~N/16 items, degenerating the banded
  // self-join toward N²/16 and saturating with hash collisions far
  // below 10⁶ images. 256 values per band plus the hot-bucket cap
  // below bound the join at any corpus size; τ = 7 < 8 bands keeps the
  // banding provably lossless (a true pair always shares one intact
  // band), which the all-pairs oracle re-proves at the new width.
  private val HashBlocks = 64
  private val HammingTau = 7
  private val HashBands = 8
  private val BandBits = 64 / HashBands

  /** Max rows per (band, bits) bucket in the banded self-join — the
    * VectorOps.LshCap discipline: a degenerate corpus region (constant
    * payloads, re-encoded solid-color images) would otherwise
    * reintroduce the quadratic stage; cap membership and drop that
    * bucket's candidates instead. The gate corpus (34 rows) never
    * reaches the cap, so m45's oracle equality is unaffected;
    * MediaDedupCapSpec pins the degenerate case.
    */
  private[graft] val MediaLshCap = 50

  /** Dedup corpus: the 24 media rows plus 8 perturbed copies (one byte
    * nudged by +1 in a different block each) — the re-encode-noise
    * stand-in that makes NEAR duplicates, not just exact ones — and
    * 2 exact byte-for-byte copies.
    */
  private def dedupCorpusRows: Seq[(Long, String, Array[Byte])] = {
    val base = corpusRows
    val near = (0 until 8).map { i =>
      val (id, mime, bytes) = base(i * 3 % base.length)
      val copy = bytes.clone()
      val pos = (i * 131) % copy.length
      copy(pos) = (copy(pos) + 1).toByte
      (100L + id, mime, copy)
    }
    val exact = Seq(24, 25).zip(Seq(base(1), base(4))).map {
      case (nid, (_, mime, bytes)) => (200L + nid, mime, bytes)
    }
    base ++ near ++ exact
  }

  private def dedupMedia(s: SparkSession): DataFrame = {
    import s.implicits._
    dedupCorpusRows.map { case (id, mime, b) => (id, mime, b) }
      .toDF("media_id", "mime", "content")
      .repartition(4, col("media_id"))
  }

  private def hashOf(bytes: Array[Byte]): Long = {
    val sums = new Array[Long](HashBlocks)
    val n = math.max(bytes.length, 1)
    var i = 0
    while (i < bytes.length) {
      sums((i.toLong * HashBlocks / n).toInt) += (bytes(i) & 0xff); i += 1
    }
    val total = sums.sum
    (0 until HashBlocks).foldLeft(0L) { (h, b) =>
      if (sums(b) * HashBlocks >= total) h | (1L << b) else h
    }
  }

  /** m45: perceptual near-dup pairs over the media corpus — the image
    * dedup every multimodal pipeline runs before training: blockhash
    * fingerprints ([[Multimodal.blockHash]], decode stubbed, hashing
    * real), candidates from a BANDED equi-join (8 bands × 8 bits;
    * Hamming ≤ 7 < 8 bands means a true pair always shares one intact
    * band — the banding is provably lossless, and the all-pairs
    * driver-side oracle is the proof), verified with exact
    * `bit_count(xor)`. At scale this is the t28 layout over binary
    * payloads: O(1) fingerprint per item, shuffle on (band, bits),
    * candidate-bounded verification with the [[MediaLshCap]] hot-bucket
    * guard.
    */
  def qMediaDedup(s: SparkSession, dir: String): DataFrame =
    nearDupPairs(dedupMedia(s))

  /** The banded near-dup join over any (media_id, content) frame — the
    * reusable operator behind m45, exposed so degenerate corpora can be
    * pinned in specs. Band keys are unsigned shift/mask slices
    * (`shiftrightunsigned`) so bit 63 of the hash cannot corrupt the
    * bucket id through signed division.
    */
  def nearDupPairs(mediaDf: DataFrame): DataFrame = {
    val hashes = Multimodal.blockHash(mediaDf, HashBlocks)
    val bands = hashes.select(col("media_id"), col("phash"),
      explode(expr(s"transform(sequence(0, ${HashBands - 1}), " +
        s"b -> struct(b AS band, " +
        s"shiftrightunsigned(phash, b * $BandBits) & ${(1L << BandBits) - 1} AS bits))"))
        .as("bb"))
      .select(col("media_id"), col("phash"),
        col("bb.band").as("band"), col("bb.bits").as("bits"))
    val bucketN = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bits"))
    val capped = bands.withColumn("bn", count(lit(1)).over(bucketN))
      .filter(col("bn") <= MediaLshCap).drop("bn")
    capped.as("x").join(capped.as("y"),
        col("x.band") === col("y.band") && col("x.bits") === col("y.bits") &&
        col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("id_a"), col("y.media_id").as("id_b"),
        col("x.phash").as("ha"), col("y.phash").as("hb"))
      .distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= HammingTau)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** VALUES oracle: straight-line hashes + the full all-pairs loop
    * (bounded corpus) — every pair with Hamming ≤ τ, no banding, so
    * gate equality proves the banded join loses nothing.
    */
  def qMediaDedupOracle: String = {
    val rows = dedupCorpusRows.map { case (id, _, b) => (id, hashOf(b)) }
    val pairs = for {
      (ia, ha) <- rows; (ib, hb) <- rows
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= HammingTau
    } yield s"($ia, $ib, ${java.lang.Long.bitCount(ha ^ hb)})"
    require(pairs.nonEmpty, "no near-dup pairs in the seeded corpus")
    s"""SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
          CAST(hamming AS INTEGER) AS hamming
        FROM (VALUES ${pairs.mkString(",\n")}) t(id_a, id_b, hamming)
        ORDER BY id_a, id_b"""
  }

  // -- Audio segmentation gate (m46) ------------------------------------

  private val AudioFrameBytes = 256

  /** Straight-line per-frame energies — ONE copy of the framing/abs-sum
    * arithmetic shared by the m46 and m47 oracles, mirroring
    * [[Multimodal.frameEnergy]]; an edit here moves both oracles and
    * the gate differentials catch any desync from the operator.
    */
  private def frameEnergies(bytes: Array[Byte]): IndexedSeq[Long] = {
    val nFrames = math.max(1, (bytes.length + AudioFrameBytes - 1) / AudioFrameBytes)
    (0 until nFrames).map { i =>
      bytes.slice(i * AudioFrameBytes,
        math.min(bytes.length, (i + 1) * AudioFrameBytes))
        .map(b => math.abs(b.toInt).toLong).sum
    }
  }

  /** m46: VAD-shaped audio segmentation over the seeded corpus — the
    * speech/music curation pass that turns a waveform into voiced
    * segments: per-frame energies ([[Multimodal.frameEnergy]]; decode
    * stubbed, framing/energy real and integer-exact), a frame is
    * "voiced" when its energy is at-or-above the per-media average
    * (`energy·n ≥ total` — no division), and consecutive voiced frames
    * merge into segments via the gaps-and-islands window (the q28
    * sessionize shape on frame indices). Per media: frame/voiced/
    * segment counts and the longest segment.
    *
    * Scale shape: only (id, idx, energy) triples leave the decode
    * task — frame bytes never ship; the windows are media-partitioned
    * (bounded by one payload's frame count); output is #media rows.
    */
  def qAudioSegments(s: SparkSession, dir: String): DataFrame = {
    val audio = media(s).filter(col("mime") === "audio/wav")
    val fe = Multimodal.frameEnergy(audio, AudioFrameBytes)
    val byMedia = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id"))
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_idx"))
    val voiced = fe
      .withColumn("n_frames", count(lit(1)).over(byMedia))
      .withColumn("total_e", sum(col("energy")).over(byMedia))
      .filter(col("energy") * col("n_frames") >= col("total_e"))
      .withColumn("boundary",
        when(col("frame_idx") - lag(col("frame_idx"), 1).over(ord) === 1, 0L)
          .otherwise(1L))
      .withColumn("seg_id", sum(col("boundary")).over(
        ord.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
    voiced.groupBy(col("media_id"), col("n_frames"), col("seg_id"))
      .agg(count(lit(1)).as("seg_len"))
      .groupBy(col("media_id"), col("n_frames"))
      .agg(count(lit(1)).as("n_segments"),
        sum(col("seg_len")).as("n_voiced"),
        max(col("seg_len")).as("longest_seg"))
      .select(col("media_id"), col("n_frames"), col("n_voiced"),
        col("n_segments"), col("longest_seg"))
      .orderBy(col("media_id"))
  }

  /** VALUES oracle: straight-line framing, energy, threshold and
    * segment scan over the same seeded payloads.
    */
  def qAudioSegmentsOracle: String = {
    val rows = corpusRows.filter(_._2 == "audio/wav").map { case (id, _, bytes) =>
      val energies = frameEnergies(bytes)
      val nFrames = energies.length
      val total = energies.sum
      val voicedIdx = energies.zipWithIndex
        .collect { case (e, i) if e * nFrames >= total => i }
      val segs = voicedIdx.foldLeft(List.empty[Int]) { (acc, i) =>
        acc match {
          case h :: t if voicedIdx.contains(i - 1) => (h + 1) :: t
          case _ => 1 :: acc
        }
      }
      s"($id, $nFrames, ${voicedIdx.size}, ${segs.size}, ${segs.max})"
    }
    require(rows.nonEmpty, "no audio rows in the seeded corpus")
    s"""SELECT CAST(media_id AS BIGINT) AS media_id,
          CAST(n_frames AS BIGINT) AS n_frames,
          CAST(n_voiced AS BIGINT) AS n_voiced,
          CAST(n_segments AS BIGINT) AS n_segments,
          CAST(longest_seg AS BIGINT) AS longest_seg
        FROM (VALUES ${rows.mkString(",\n")})
          t(media_id, n_frames, n_voiced, n_segments, longest_seg)
        ORDER BY media_id"""
  }

  // -- Resize-planning gate (m48) ---------------------------------------

  private val ResizeTarget = 224

  /** m48: resize planning over the full seeded corpus — decode
    * dimensions through the stub seam, fit into the 224-box with
    * aspect-preserving integer math (never upscaling), report output
    * dims and RGB byte budget. The aggregate row at the end is what a
    * capacity planner reads: total decoded vs total resized bytes.
    */
  def qResizePlan(s: SparkSession, dir: String): DataFrame = {
    val decoder = new Multimodal.StubDecoder(16)
    Multimodal.planResize(media(s), decoder, ResizeTarget)
      .orderBy(col("media_id"))
  }

  def qResizePlanOracle: String = {
    val decoder = new Multimodal.StubDecoder(16)
    val rows = corpusRows.map { case (id, mime, bytes) =>
      val (w, h) = decoder.dimensions(mime, bytes)
      if (w <= 0 || h <= 0) s"($id, $w, $h, $w, $h, 0)"
      else {
        val m = math.max(w, h)
        val (ow, oh) =
          if (m <= ResizeTarget) (w, h)
          else (math.max(w.toLong * ResizeTarget / m, 1L).toInt,
                math.max(h.toLong * ResizeTarget / m, 1L).toInt)
        s"($id, $w, $h, $ow, $oh, ${ow.toLong * oh * 3L})"
      }
    }
    s"""SELECT CAST(media_id AS BIGINT) AS media_id,
          CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
          CAST(out_w AS INTEGER) AS out_w, CAST(out_h AS INTEGER) AS out_h,
          CAST(out_bytes AS BIGINT) AS out_bytes
        FROM (VALUES ${rows.mkString(",\n")})
          t(media_id, width, height, out_w, out_h, out_bytes)
        ORDER BY media_id"""
  }

  // -- Video scene-change gate (m47) ------------------------------------

  /** m47: scene-change detection over the video payloads — the
    * frame-differencing pass video curation runs to sample one
    * keyframe per scene instead of N near-identical frames: per-frame
    * energies ([[Multimodal.frameEnergy]] again — decode stubbed,
    * framing real), a scene CUT where the absolute energy delta
    * STRICTLY exceeds twice the per-video mean absolute delta
    * (`|Δe|·(n−1) > 2·Σ|Δe|` — integer, division-free; strict, so a
    * perfectly static video with all-zero deltas is ONE scene, not
    * n), scenes = cuts + 1. Per video: frame count, scene count,
    * longest scene.
    *
    * Scale shape: identical to m46 — energies leave the decode task as
    * triples, the lag/threshold windows are video-partitioned, output
    * is #videos rows.
    */
  def qSceneChanges(s: SparkSession, dir: String): DataFrame = {
    val video = media(s).filter(col("mime") === "video/mp4")
    val fe = Multimodal.frameEnergy(video, AudioFrameBytes)
    val W = org.apache.spark.sql.expressions.Window
    val byV = W.partitionBy(col("media_id"))
    val ord = W.partitionBy(col("media_id")).orderBy(col("frame_idx"))
    val withDelta = fe
      .withColumn("d", abs(col("energy") - lag(col("energy"), 1).over(ord)))
      .withColumn("n", count(lit(1)).over(byV))
      .withColumn("td", sum(col("d")).over(byV))
    val cuts = withDelta
      .withColumn("cut",
        when(col("d").isNotNull &&
          col("d") * (col("n") - 1) > lit(2L) * col("td"), 1L).otherwise(0L))
      .withColumn("scene_id", sum(col("cut")).over(
        ord.rowsBetween(W.unboundedPreceding, W.currentRow)))
    cuts.groupBy(col("media_id"), col("n"), col("scene_id"))
      .agg(count(lit(1)).as("scene_len"))
      .groupBy(col("media_id"), col("n"))
      .agg(count(lit(1)).as("n_scenes"), max(col("scene_len")).as("longest_scene"))
      .select(col("media_id"), col("n").as("n_frames"), col("n_scenes"),
        col("longest_scene"))
      .orderBy(col("media_id"))
  }

  def qSceneChangesOracle: String = {
    val rows = corpusRows.filter(_._2 == "video/mp4").map { case (id, _, bytes) =>
      val energies = frameEnergies(bytes)
      val nFrames = energies.length
      val deltas = energies.zip(energies.drop(1)).map { case (a, b) => math.abs(b - a) }
      val td = deltas.sum
      val cuts = deltas.count(d => d * (nFrames - 1) > 2L * td)
      // scene lengths: walk the cut positions
      val cutIdx = deltas.zipWithIndex
        .collect { case (d, i) if d * (nFrames - 1) > 2L * td => i + 1 }
      val bounds = 0 +: cutIdx :+ nFrames
      val longest = bounds.zip(bounds.tail).map { case (a, b) => b - a }.max
      s"($id, $nFrames, ${cuts + 1}, $longest)"
    }
    require(rows.nonEmpty, "no video rows in the seeded corpus")
    s"""SELECT CAST(media_id AS BIGINT) AS media_id,
          CAST(n_frames AS BIGINT) AS n_frames,
          CAST(n_scenes AS BIGINT) AS n_scenes,
          CAST(longest_scene AS BIGINT) AS longest_scene
        FROM (VALUES ${rows.mkString(",\n")})
          t(media_id, n_frames, n_scenes, longest_scene)
        ORDER BY media_id"""
  }

  // -- PDF layout gate (m43) --------------------------------------------

  /** Region dictionary in the notebook's bounding_boxes shape
    * (pruebas.ipynb), sized to the stub decoder's US-Letter grid.
    */
  private val Regions: Seq[(String, (Double, Double, Double, Double))] = Seq(
    "header" -> (0.0, 0.0, 612.0, 120.0),
    "left"   -> (0.0, 120.0, 306.0, 500.0),
    "right"  -> (306.0, 120.0, 612.0, 500.0),
    "footer" -> (0.0, 500.0, 612.0, 792.0))

  private val LineTol = 6.0

  /** m43: words → named-region text assembly over the seeded corpus;
    * the oracle replays the same decoder and assembly as straight-line
    * Scala, so the differential covers the flatMap generator, the
    * broadcast region join and the two-level array_sort aggregation.
    */
  def qPdfLayout(s: SparkSession, dir: String): DataFrame = {
    val w = PdfLayout.words(
      media(s).withColumnRenamed("media_id", "doc_id"),
      new PdfLayout.StubLayoutDecoder())
    PdfLayout.regionText(w, Regions, LineTol)
      .select(col("doc_id"), col("page"), col("region"),
        col("n_lines"), col("n_words"), md5(col("text")).as("text_md5"))
      .orderBy(col("doc_id"), col("page"), col("region"))
  }

  def qPdfLayoutOracle: String = {
    val decoder = new PdfLayout.StubLayoutDecoder()
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(t: String): String =
      md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = for {
      (id, _, bytes) <- corpusRows
      ((region, (rx0, rtop, rx1, rbottom)), _) <- Regions.zipWithIndex
      (page, ws) <- decoder.words(bytes)
        .filter { w =>
          val cx = (w.x0 + w.x1) / 2; val cy = (w.top + w.bottom) / 2
          cx >= rx0 && cx < rx1 && cy >= rtop && cy < rbottom
        }
        .groupBy(_.page).toSeq
    } yield {
      val lines = ws.groupBy(w => math.floor(w.top / LineTol).toLong).toSeq
        .map { case (key, lws) =>
          val line = lws.sortBy(w => (w.x0, w.text)).map(_.text).mkString(" ")
          (lws.map(_.top).min, key, line)
        }
        .sortBy(identity)
      val text = lines.map(_._3).mkString("\n")
      (id, page, region, lines.size.toLong, ws.size.toLong, md5hex(text))
    }
    val values = rows.sortBy(r => (r._1, r._2, r._3)).map { r =>
      s"(${r._1}, ${r._2}, '${r._3}', ${r._4}, ${r._5}, '${r._6}')"
    }
    s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, page, region,
          CAST(n_lines AS BIGINT) AS n_lines,
          CAST(n_words AS BIGINT) AS n_words, text_md5
        FROM (VALUES ${values.mkString(",\n")})
          t(doc_id, page, region, n_lines, n_words, text_md5)
        ORDER BY doc_id, page, region"""
  }

  // -- PDF table-cell gate (m44) ----------------------------------------

  private val RowTol = 6.0
  private val ColTol = 12.0

  /** m44: table-cell clustering over the seeded corpus, summarized per
    * page as (n_rows, n_cols, n_cells, md5 of the ordered grid) — the
    * page-bounded dense_rank windows and cell concatenation verified
    * against a straight-line replay.
    */
  def qPdfTables(s: SparkSession, dir: String): DataFrame = {
    val w = PdfLayout.words(
      media(s).withColumnRenamed("media_id", "doc_id"),
      new PdfLayout.StubLayoutDecoder())
    val serial = transform(
      array_sort(collect_list(struct(col("row_id"), col("col_id"), col("cell")))),
      x => concat_ws(",", x.getField("row_id"), x.getField("col_id"),
        x.getField("cell")))
    PdfLayout.tableCells(w, RowTol, ColTol)
      .groupBy(col("doc_id"), col("page"))
      .agg(max(col("row_id")).cast("long").as("n_rows"),
        max(col("col_id")).cast("long").as("n_cols"),
        count(lit(1)).as("n_cells"),
        md5(array_join(serial, "|")).as("grid_md5"))
      .orderBy(col("doc_id"), col("page"))
  }

  def qPdfTablesOracle: String = {
    val decoder = new PdfLayout.StubLayoutDecoder()
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(t: String): String =
      md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = for {
      (id, _, bytes) <- corpusRows
      (page, ws) <- decoder.words(bytes).groupBy(_.page).toSeq.sortBy(_._1)
    } yield {
      val rowRank = ws.map(w => math.floor(w.top / RowTol).toLong)
        .distinct.sorted.zipWithIndex.map { case (k, i) => k -> (i + 1) }.toMap
      val colRank = ws.map(w => math.floor(w.x0 / ColTol).toLong)
        .distinct.sorted.zipWithIndex.map { case (k, i) => k -> (i + 1) }.toMap
      val cells = ws
        .groupBy(w => (rowRank(math.floor(w.top / RowTol).toLong),
          colRank(math.floor(w.x0 / ColTol).toLong)))
        .map { case ((r, c), g) =>
          (r, c, g.sortBy(w => (w.x0, w.text)).map(_.text).mkString(" "))
        }.toSeq.sortBy(identity)
      val serial = cells.map { case (r, c, t) => s"$r,$c,$t" }.mkString("|")
      (id, page, rowRank.values.max.toLong, colRank.values.max.toLong,
        cells.size.toLong, md5hex(serial))
    }
    val values = rows.map { r =>
      s"(${r._1}, ${r._2}, ${r._3}, ${r._4}, ${r._5}, '${r._6}')"
    }
    s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, page,
          CAST(n_rows AS BIGINT) AS n_rows, CAST(n_cols AS BIGINT) AS n_cols,
          CAST(n_cells AS BIGINT) AS n_cells, grid_md5
        FROM (VALUES ${values.mkString(",\n")})
          t(doc_id, page, n_rows, n_cols, n_cells, grid_md5)
        ORDER BY doc_id, page"""
  }

  val all: Seq[GateQuery] = Seq(
    GateQuery("m42_media_pipeline", qMediaPipeline, Some(qMediaPipelineOracle)),
    GateQuery("m43_pdf_layout", qPdfLayout, Some(qPdfLayoutOracle)),
    GateQuery("m44_pdf_tables", qPdfTables, Some(qPdfTablesOracle)),
    GateQuery("m45_media_dedup", qMediaDedup, Some(qMediaDedupOracle)),
    GateQuery("m46_audio_segments", qAudioSegments, Some(qAudioSegmentsOracle)),
    GateQuery("m47_scene_changes", qSceneChanges, Some(qSceneChangesOracle)),
    GateQuery("m48_resize_plan", qResizePlan, Some(qResizePlanOracle)),
  )
}
