package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Incremental sign-LSH ANN index (r5, the ANN half of VERDICT #6's
  * "incremental dedup/ANN index maintenance").
  *
  * The index directory holds two tables:
  *  - `planes/`  — the hyperplane model (plane_id, pv): written ONCE
  *    when the index is created (from the first batch's lowest-id
  *    vectors, the same data-derived convention as the batch operator,
  *    VectorOps.withBandSigs) and read back by every later batch, so
  *    signatures stay comparable across the index's lifetime;
  *  - `state/` — the [[StreamingState]] epoch-committed log (r12,
  *    VERDICT #2): one `epoch-<batch>/` dir per drop holding the
  *    batch's vector delta (vec_id, v, nv, bucket — bucket packs all
  *    sign bits into one long; band signatures are shift/mask slices
  *    of it, so the banded view is a projection, never a recompute
  *    against the raw vectors) AND its top-k neighbor report,
  *    published together by one atomic marker. A crash mid-batch
  *    leaves nothing visible; a crash after the marker finds the
  *    report durable and the replay returns it — the r11
  *    append-vectors-then-write-report lost-report window is closed.
  *
  * Each micro-batch: sign only the NEW vectors, probe new-vs-all via
  * the per-band signature equi-join (with a bucket-occupancy cap so a
  * degenerate signature region cannot reintroduce the quadratic
  * stage), score exact cosine on candidates, emit per-new-vector
  * top-k, and commit the delta + report + occupancy state atomically.
  * The occupancy counts ARE maintained incrementally (r12): the batch
  * delta folds into the persisted per-(band, sig) state — exact, since
  * a vector's band rows enter exactly one committed delta — instead of
  * re-aggregating every indexed vector's banded view per batch.
  */
object IncrementalAnn {

  final case class Config(bands: Int = 2, bits: Int = 8, cap: Long = 100L,
      k: Int = 3)

  /** Sequential dot product via the codegen'd expression — identical
    * IEEE order to the HOF fold it replaced (see VectorOps notes);
    * registered per session in [[probeAndUpdate]].
    */
  private def dot(a: String, b: String): Column =
    expr(s"dot_product($a, $b)")

  // epoch-committed vector deltas + per-batch neighbor reports live
  // under state/; the once-written hyperplane model sits beside it
  // (outside the epoch log — it is immutable after creation)
  private def statePath(p: String) = s"$p/state"
  private def planesPath(p: String) = s"$p/planes"

  private val vectorsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("v", ArrayType(DoubleType), nullable = false),
    StructField("nv", DoubleType, nullable = false),
    StructField("bucket", LongType, nullable = false)))

  private val neighborsSchema: StructType = StructType(Seq(
    StructField("query_id", LongType, nullable = true),
    StructField("rank", IntegerType, nullable = true),
    StructField("neighbor_id", LongType, nullable = true),
    StructField("cosine", DoubleType, nullable = true)))

  private[graft] val occSchema: StructType = StructType(Seq(
    StructField("band_id", IntegerType, nullable = true),
    StructField("sig", LongType, nullable = true),
    StructField("bn", LongType, nullable = true)))

  /** Current committed vectors (union of every published epoch's
    * delta; empty if never written). Existence resolves through
    * Hadoop's FileSystem (HDFS/S3-safe — the r10 java.io.File probes
    * silently restarted from an empty index on object stores).
    */
  def readIndex(spark: SparkSession, indexPath: String): DataFrame = {
    StreamingState.guardEpochLayout(spark, statePath(indexPath), "IncrementalAnn")
    StreamingState.readCommittedDeltas(spark, statePath(indexPath),
      "vectors", vectorsSchema)
  }

  /** The persisted hyperplane model, initialized from `batch` if the
    * index does not exist yet.
    */
  private def planes(spark: SparkSession, batch: DataFrame, indexPath: String,
      cfg: Config): DataFrame = {
    val pp = planesPath(indexPath)
    val schema = StructType(Seq(
      StructField("plane_id", IntegerType, nullable = false),
      StructField("pv", ArrayType(DoubleType), nullable = false)))
    if (!StreamingState.exists(spark, pp)) {
      // number the ≤ bands×bits seed planes in-row (single-row
      // aggregate + posexplode) instead of a global window — same
      // result, no empty-partition WindowExec warning in the logs
      batch.orderBy(col("vec_id")).limit(cfg.bands * cfg.bits)
        .agg(expr("array_sort(collect_list(struct(vec_id, v)))").as("ps"))
        .select(posexplode(col("ps")).as(Seq("plane_id", "p")))
        .select(col("plane_id").cast("int").as("plane_id"),
          col("p.v").as("pv"))
        .write.mode("overwrite").parquet(pp)
    }
    spark.read.schema(schema).parquet(pp)
  }

  /** Pack all sign bits of `v` against the broadcast plane set. */
  private def withBucket(df: DataFrame, planesDf: DataFrame): DataFrame = {
    val planesArr = planesDf
      .agg(collect_list(struct(col("plane_id"), col("pv"))).as("ps"))
    df.crossJoin(broadcast(planesArr))
      .withColumn("bucket", expr(
        """aggregate(ps, 0L, (acc, p) -> acc +
             if(dot_product(v, p.pv) >= 0,
                shiftleft(1L, p.plane_id), 0L))"""))
      .drop("ps")
  }

  private def bandRows(df: DataFrame, cfg: Config): DataFrame =
    df.select(col("vec_id"), col("bucket"),
        explode(expr(s"sequence(0, ${cfg.bands - 1})")).as("band_id"))
      .withColumn("sig",
        expr(s"shiftright(bucket, ${cfg.bits} * band_id) & ${(1 << cfg.bits) - 1}"))
      .withColumn("band_id", col("band_id").cast("int"))
      .drop("bucket")

  /** Persisted per-(band, sig) occupancy of the CURRENT epoch. */
  private[graft] def currentOcc(spark: SparkSession, indexPath: String): DataFrame = {
    val root = statePath(indexPath)
    val e = StreamingState.currentEpoch(spark, root)
    if (e < 0L)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], occSchema)
    else StreamingState.readOr(spark,
      StreamingState.epochRel(root, e, "occ"), occSchema)
  }

  /** Fold a batch's band rows into the persisted occupancy state (r12,
    * the span index's caps-fold pattern): the r11 layout re-aggregated
    * the banded view of EVERY indexed vector per batch; the fold is
    * exact because a vector's band rows enter exactly one committed
    * delta (the vec-id anti-join guarantees it), so counts add. The
    * state is signature-space bounded (≤ bands × 2^bits rows).
    * Exposed for the spec that pins fold == recompute and that the
    * plan never scans the vectors relation.
    */
  private[graft] def foldedOcc(spark: SparkSession, indexPath: String,
      fresh: DataFrame, cfg: Config): DataFrame =
    currentOcc(spark, indexPath)
      .unionByName(bandRows(fresh, cfg)
        .groupBy(col("band_id"), col("sig")).agg(count(lit(1)).as("bn")))
      .groupBy(col("band_id"), col("sig"))
      .agg(sum(col("bn")).as("bn"))

  /** Probe the batch's vectors against the index (and the batch
    * itself), commit the new signatures AND the batch's top-k report
    * in one atomic epoch (r12, VERDICT #2 — see IncrementalDedup for
    * the exactly-once argument), and return per-new-vector top-k
    * neighbors (query_id, rank, neighbor_id, cosine). Replays of a
    * committed `batchId` return the persisted report.
    */
  def processBatch(batch: DataFrame, indexPath: String, batchId: Long,
      cfg: Config = Config()): DataFrame = {
    val spark = batch.sparkSession
    graft.functions.DotProduct.register(spark)
    StreamingState.guardEpochLayout(spark, statePath(indexPath), "IncrementalAnn")
    if (StreamingState.isCommitted(spark, statePath(indexPath), batchId))
      return spark.read.schema(neighborsSchema)
        .parquet(StreamingState.epochRel(statePath(indexPath), batchId, "neighbors"))
    val existing = readIndex(spark, indexPath)
    val pl = planes(spark, batch, indexPath, cfg)
    val fresh = withBucket(
        batch.select(col("vec_id"), col("v"))
          .withColumn("nv", sqrt(dot("v", "v"))), pl)
      .select(vectorsSchema.fieldNames.toIndexedSeq.map(col): _*)
      .join(existing.select(col("vec_id")), Seq("vec_id"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val all = existing.unionByName(fresh)

    // occupancy cap from the FOLDED state (r12): counts over index ∪
    // fresh without re-aggregating every indexed vector's band rows
    val occState = foldedOcc(spark, indexPath, fresh, cfg)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val over = occState.filter(col("bn") > cfg.cap)
      .select(col("band_id"), col("sig"))
    val capped = bandRows(all, cfg)
      .join(broadcast(over), Seq("band_id", "sig"), "left_anti")
    val target = capped.select(col("vec_id").as("t_vec_id"),
      col("band_id").as("t_band_id"), col("sig").as("t_sig"))

    val cand = bandRows(fresh, cfg)
      .join(target,
        col("band_id") === col("t_band_id") && col("sig") === col("t_sig") &&
        col("vec_id") =!= col("t_vec_id"))
      .select(col("vec_id").as("query_id"), col("t_vec_id").as("neighbor_id"))
      .distinct()
    val scored = cand
      .join(fresh.select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nv").as("qnv")), Seq("query_id"))
      .join(all.select(col("vec_id").as("neighbor_id"), col("v"), col("nv")),
        Seq("neighbor_id"))
      .withColumn("cosine", dot("qv", "v") / (col("qnv") * col("nv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    // No localCheckpoint: the committed index is stable until the
    // epoch marker, so the top-k plan materializes exactly once — by
    // the epoch write — against an unmoving listing
    val topk = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= cfg.k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
    StreamingState.commitAppend(spark, statePath(indexPath), batchId,
      Map("vectors" -> fresh, "neighbors" -> topk, "occ" -> occState))
    // occupancy is full state per epoch; each copy supersedes the last
    StreamingState.pruneRel(spark, statePath(indexPath), "occ")
    occState.unpersist(); fresh.unpersist()
    spark.read.schema(neighborsSchema)
      .parquet(StreamingState.epochRel(statePath(indexPath), batchId, "neighbors"))
  }

  /** Batch-API convenience: commits under the next free epoch id
    * (re-sent vectors stay no-ops via the vec-id anti-join).
    */
  def probeAndUpdate(batch: DataFrame, indexPath: String,
      cfg: Config = Config()): DataFrame =
    processBatch(batch, indexPath,
      StreamingState.currentEpoch(batch.sparkSession, statePath(indexPath)) + 1L,
      cfg)

  /** Compact the vector delta log into one copy and drop the
    * superseded per-drop dirs (crash-safe: see
    * [[StreamingState.checkpointDeltas]]). Markers, neighbor reports,
    * the occupancy state, and the plane model stay untouched.
    */
  def compact(spark: SparkSession, indexPath: String): Unit = {
    StreamingState.checkpointDeltas(spark, statePath(indexPath),
      Map("vectors" -> vectorsSchema))
    StreamingState.vacuum(spark, statePath(indexPath), Seq("vectors"))
  }

  /** Streaming surface: foreachBatch maintaining the index, handing
    * each micro-batch's top-k neighbor frame to the caller.
    */
  def sink(vectors: DataFrame, indexPath: String, cfg: Config = Config())
      (onBatch: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    vectors.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val topk = processBatch(batch, indexPath, id, cfg)
        onBatch(topk, id)
        topk.unpersist()
        ()
      }
}
