package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Incremental MinHash+LSH index maintenance (r5, VERDICT #6): the
  * monthly-drop dedup story as an UPDATEABLE signature index instead of
  * the session-static [[graft.operators.SessionMemo]] materializations.
  *
  * The index is a persisted table (parquet) of one row per document:
  * its distinct shingle array, shingle count, and the 4 banded MinHash
  * signatures — exactly the signature layout of the batch operator
  * (TextOps.qMinhashLsh: 8 Kirsch–Mitzenmacher minhash minima off one
  * md5 per shingle, 4 bands × 2 rows). Each micro-batch:
  *
  *  1. computes signatures for the NEW documents only (the old
  *     documents' raw text is never touched — their signatures are
  *     read back from the index);
  *  2. probes new-vs-all through the band equi-join (never
  *     all-vs-all, never old-vs-old — the work per batch is
  *     O(new × collisions));
  *  3. verifies candidates with exact Jaccard over the stored shingle
  *     arrays;
  *  4. appends the new documents' rows to the index. Replayed batches
  *     (streaming retry semantics) are no-ops: already-indexed ids are
  *     anti-joined out before probing or appending.
  *
  * At 100 TB scale the same shape holds: the index is a table keyed by
  * doc_id (bucketed/partitioned on the band signature for the probe
  * join), new drops are a few percent of the corpus, and the probe
  * shuffles only the new side plus colliding index rows.
  */
object IncrementalDedup {

  private val Bands = 4

  /** On-disk signature-scheme version. History: 1 = seeded-md5 string
    * minima with bare band concat (≤ r9); 2 = Kirsch–Mitzenmacher
    * 40-bit integer minima with ':'-separated band keys (r10+). The
    * schemes produce band signatures that can NEVER collide with each
    * other, so probing a v1 index with v2 signatures would silently
    * miss every true near-duplicate instead of failing — the marker
    * turns that silent miss into a hard error at open time.
    */
  private[streaming] val FormatVersion = 2

  private def versionPath(path: String) = s"$path/_graft_format_version"

  /** Refuse an index written under a different signature scheme; stamp
    * the version on first creation. The marker filename starts with
    * '_' so the parquet reader treats it as hidden metadata.
    */
  private def checkOrStampVersion(spark: SparkSession, path: String): Unit = {
    val fs = StreamingState.fsFor(spark, path)
    val vp = new org.apache.hadoop.fs.Path(versionPath(path))
    val root = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(vp)) {
      val in = fs.open(vp)
      val v = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      if (v != FormatVersion.toString)
        throw new IllegalStateException(
          s"IncrementalDedup index at $path has signature-scheme version $v " +
          s"but this build writes version $FormatVersion; its band signatures " +
          "can never match newly signed documents. Rebuild the index (delete " +
          "the directory and re-stream the corpus).")
    } else if (fs.exists(root) &&
        fs.listStatus(root).exists(st =>
          !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))) {
      throw new IllegalStateException(
        s"IncrementalDedup index at $path predates signature-scheme versioning " +
        s"(no ${versionPath(path)} marker); refusing to probe it with version-" +
        s"$FormatVersion signatures. Rebuild the index.")
    } else {
      fs.mkdirs(root)
      val out = fs.create(vp, true)
      try out.write(FormatVersion.toString.getBytes("UTF-8")) finally out.close()
    }
  }

  val indexSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("shs", ArrayType(StringType), nullable = false),
    StructField("n", LongType, nullable = false)) ++
    (1 to Bands).map(b => StructField(s"b$b", StringType, nullable = true)))

  /** Doc-level signature rows for a (doc_id, text) batch — in-row
    * shingling and array_min minhashing, no shuffle (see
    * TextOps.qMinhashLsh for the formulation notes).
    */
  def docSignatures(docs: DataFrame): DataFrame = {
    val base = docs
      .withColumn("words", expr("filter(split(text, ' '), w -> w != '')"))
      .select(col("doc_id"), array_distinct(
        expr("case when size(words) < 3 then array() " +
          "else transform(sequence(1, size(words) - 2), " +
          "i -> array_join(slice(words, i, 3), ' ')) end")).as("shs"))
      .withColumn("n", size(col("shs")).cast("long"))
      .filter(col("n") > 0)
    // one md5 per shingle + Kirsch–Mitzenmacher mixing — the same
    // signature family as the batch operator (TextOps.minhashSigs):
    // h_i = (a + i·b) mod 2^40 over the digest's two 40-bit halves
    val withHalves = base.withColumn("hp", expr(
      "transform(shs, x -> named_struct(" +
        "'a', cast(conv(substring(md5(x), 1, 10), 16, 10) as bigint), " +
        "'b', cast(conv(substring(md5(x), 11, 10), 16, 10) as bigint)))"))
    val sigs = (1 to 2 * Bands).foldLeft(withHalves) { case (df, i) =>
      df.withColumn(s"h$i", array_min(
        expr(s"transform(hp, p -> (p.a + $i * p.b) % 1099511627776)")))
    }
    (1 to Bands).foldLeft(sigs) { case (df, b) =>
      df.withColumn(s"b$b",
        concat_ws(":", col(s"h${2 * b - 1}"), col(s"h${2 * b}")))
    }.select(indexSchema.fieldNames.toIndexedSeq.map(col): _*)
  }

  /** Current index contents ((session, path) may not exist yet).
    * Existence resolves through Hadoop's FileSystem (HDFS/S3-safe) and
    * an existing index must carry the current signature-scheme version.
    */
  def readIndex(spark: SparkSession, path: String): DataFrame =
    if (StreamingState.exists(spark, path)) {
      checkOrStampVersion(spark, path)
      spark.read.schema(indexSchema).parquet(path)
    } else
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], indexSchema)

  /** Ids-only banded view: the probe join must move (id, band, sig)
    * rows, never the shingle arrays — payloads re-attach by id for
    * the (small) candidate set only.
    */
  private def bandRows(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      posexplode(array((1 to Bands).map(b => col(s"b$b")): _*))
        .as(Seq("band_id", "band_sig")))

  /** Probe the new batch against the index (and itself) and append the
    * new signatures. Returns the verified near-dup pairs
    * (doc_a, doc_b, jaccard) with doc_a < doc_b, at least one side new.
    */
  def probeAndUpdate(batch: DataFrame, indexPath: String,
      threshold: Double = 0.5): DataFrame = {
    val spark = batch.sparkSession
    checkOrStampVersion(spark, indexPath)
    val existing = readIndex(spark, indexPath)
    val fresh = docSignatures(batch)
      .join(existing.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val all = existing.unionByName(fresh)

    // the probe is a self-join (fresh rides inside `all`), so the
    // target side gets explicitly renamed columns — fresh exprIds —
    // instead of dataset aliases, which resolve ambiguously here
    val target = bandRows(all).select(
      col("doc_id").as("t_doc_id"), col("band_id").as("t_band_id"),
      col("band_sig").as("t_band_sig"))
    val candIds = bandRows(fresh)
      .join(target,
        col("band_id") === col("t_band_id") &&
        col("band_sig") === col("t_band_sig") &&
        col("doc_id") =!= col("t_doc_id"))
      .select(
        least(col("doc_id"), col("t_doc_id")).as("doc_a"),
        greatest(col("doc_id"), col("t_doc_id")).as("doc_b"))
      .distinct()
    val payload = all.select(col("doc_id"), col("shs"), col("n"))
    val cand = candIds
      .join(payload.select(col("doc_id").as("doc_a"), col("shs").as("shs_a"),
        col("n").as("n_a")), Seq("doc_a"))
      .join(payload.select(col("doc_id").as("doc_b"), col("shs").as("shs_b"),
        col("n").as("n_b")), Seq("doc_b"))
    // localCheckpoint (eager): the pair result must be MATERIALIZED
    // with its lineage truncated before the append and the fresh
    // unpersist below — a lazily-lineaged (or merely cached) result
    // would be recomputed against the post-append file listing, where
    // the batch's own rows are already indexed and the anti-join
    // empties `fresh`, silently erasing the batch's pairs.
    val pairs = cand
      .withColumn("inter",
        size(array_intersect(col("shs_a"), col("shs_b"))).cast("long"))
      .withColumn("jaccard",
        col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .localCheckpoint(true)
    fresh.write.mode("append").parquet(indexPath)
    fresh.unpersist()
    pairs
  }

  /** Streaming surface: foreachBatch maintaining the index, handing
    * each micro-batch's verified near-dup pairs to the caller.
    */
  def sink(docs: DataFrame, indexPath: String, threshold: Double = 0.5)
      (onBatch: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val pairs = probeAndUpdate(batch, indexPath, threshold)
        onBatch(pairs, id)
        pairs.unpersist()
        ()
      }
}
