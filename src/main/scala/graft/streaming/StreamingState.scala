package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared persisted-state layout for the streaming sketch artifacts
  * (StreamingCms / StreamingHll / StreamingQuantile), fixing two r10
  * audit findings at once:
  *
  * 1. ATOMIC COMMIT. The r10 sketches overwrote their merged cells
  *    and THEN appended the applied-batch ledger as a second write —
  *    a crash between the two left the increments applied but
  *    unrecorded, so the streaming retry of that batch re-applied
  *    them and double-counted, in exactly the replay scenario the
  *    ledger exists for. Here a fold writes a fresh
  *    `<root>/epoch-<id>/` directory (state relations AND the ledger
  *    that already includes the batch id, together), then publishes
  *    it with ONE atomic operation: creating the zero-byte marker
  *    `<root>/commits/<id>` with overwrite=false. Crash before the
  *    marker → readers still resolve the previous epoch and the
  *    retry simply rewrites the orphan directory; crash after the
  *    marker → the commit is complete and the retry sees its batch
  *    id in the ledger and no-ops. There is no window in which state
  *    and ledger disagree.
  *
  * 2. OBJECT-STORE PATHS. Existence probes went through
  *    `java.io.File`, which only sees the local filesystem — on
  *    HDFS/S3 (the deployment the sketches are for) every read
  *    silently restarted from an empty sketch. All probes here
  *    resolve through Hadoop's `FileSystem` API
  *    (`path.getFileSystem(hadoopConf)`), the same resolution the
  *    parquet reader itself uses.
  *
  * The marker-directory pattern is the commit-log discipline
  * Structured Streaming's own offset/commit logs use: an append-only
  * directory of monotonically named entries where the reader's state
  * is "highest committed id", and publication is a single atomic
  * file creation.
  */
object StreamingState {

  def fsFor(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, p: String): Boolean =
    fsFor(spark, p).exists(new Path(p))

  /** Read a parquet relation, or an empty frame of the schema if the
    * path does not exist (resolved via Hadoop FS, not java.io.File).
    */
  def readOr(spark: SparkSession, p: String, schema: StructType): DataFrame =
    if (exists(spark, p)) spark.read.schema(schema).parquet(p)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  private def commitsDir(root: String) = s"$root/commits"

  def epochRel(root: String, epoch: Long, rel: String): String =
    s"$root/epoch-$epoch/$rel"

  /** Highest committed epoch id, or -1 if nothing was ever committed. */
  def currentEpoch(spark: SparkSession, root: String): Long = {
    val fs = fsFor(spark, root)
    val commits = new Path(commitsDir(root))
    if (!fs.exists(commits)) -1L
    else fs.listStatus(commits).iterator
      .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption)
      .foldLeft(-1L)(math.max)
  }

  /** Current contents of one state relation (empty if none committed). */
  def readCurrent(spark: SparkSession, root: String, rel: String,
      schema: StructType): DataFrame = {
    val e = currentEpoch(spark, root)
    if (e < 0L)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else readOr(spark, epochRel(root, e, rel), schema)
  }

  /** Write the relations of epoch `epoch` and publish them atomically.
    * The relations are written into a directory no reader resolves yet
    * (so, unlike the r10 in-place overwrite, the merge plan may read
    * the previous epoch WHILE writing the next — no localCheckpoint
    * lineage-truncation dance); the marker creation is the commit
    * point. Epochs older than the previous one are pruned after the
    * commit (current + previous stay, for frames handed out earlier
    * that still reference the prior directory).
    */
  def commit(spark: SparkSession, root: String, epoch: Long,
      rels: Map[String, DataFrame]): Unit = {
    rels.foreach { case (rel, df) =>
      df.write.mode("overwrite").parquet(epochRel(root, epoch, rel))
    }
    val fs = fsFor(spark, root)
    fs.mkdirs(new Path(commitsDir(root)))
    val marker = new Path(s"${commitsDir(root)}/$epoch")
    try fs.create(marker, false).close()
    catch { case _: java.io.IOException => () } // already published (replay race)
    prune(fs, root)
  }

  /** Has epoch `epoch` been published at `root`? */
  def isCommitted(spark: SparkSession, root: String, epoch: Long): Boolean =
    fsFor(spark, root).exists(new Path(s"${commitsDir(root)}/$epoch"))

  /** All committed epoch ids at `root`, ascending. */
  def committedEpochs(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsFor(spark, root)
    val commits = new Path(commitsDir(root))
    if (!fs.exists(commits)) Seq.empty
    else fs.listStatus(commits).iterator
      .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption)
      .toSeq.sorted
  }

  /** Commit an APPEND-DELTA epoch: every epoch's relations stay live
    * (the committed index IS the union of the deltas), so unlike
    * [[commit]] nothing is pruned. Used by the incremental indexes
    * (IncrementalDedup / IncrementalSpanIndex / IncrementalAnn), whose
    * per-drop delta is the natural write unit — rewriting a 100 TB
    * window index per monthly drop would be a corpus-sized write.
    */
  def commitAppend(spark: SparkSession, root: String, epoch: Long,
      rels: Map[String, DataFrame]): Unit = {
    val fs = fsFor(spark, root)
    // create the (possibly empty) commit log BEFORE any relation write:
    // a crash mid-first-epoch must leave a root that reads as "epoch
    // layout, nothing committed", not one guardEpochLayout mistakes
    // for a pre-epoch legacy index and refuses to recover
    fs.mkdirs(new Path(commitsDir(root)))
    rels.foreach { case (rel, df) =>
      df.write.mode("overwrite").parquet(epochRel(root, epoch, rel))
    }
    val marker = new Path(s"${commitsDir(root)}/$epoch")
    try fs.create(marker, false).close()
    catch { case _: java.io.IOException => () } // already published (replay race)
  }

  private def checkpointsDir(root: String) = s"$root/checkpoints"
  private def compactRel(root: String, cp: Long, rel: String) =
    s"$root/compact-$cp/$rel"

  /** Highest published checkpoint id, or -1 if never checkpointed. */
  def currentCheckpoint(spark: SparkSession, root: String): Long = {
    val fs = fsFor(spark, root)
    val cps = new Path(checkpointsDir(root))
    if (!fs.exists(cps)) -1L
    else fs.listStatus(cps).iterator
      .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption)
      .foldLeft(-1L)(math.max)
  }

  /** Union of one relation across the committed epochs (the reader of
    * the [[commitAppend]] layout): the newest checkpoint's compacted
    * copy plus every committed delta AFTER it. Uncommitted/partial
    * epoch or compact dirs are invisible by construction — only
    * marker-published paths are read.
    */
  def readCommittedDeltas(spark: SparkSession, root: String, rel: String,
      schema: StructType): DataFrame = {
    val cp = currentCheckpoint(spark, root)
    val paths = ((if (cp >= 0L) Seq(compactRel(root, cp, rel)) else Seq.empty) ++
      committedEpochs(spark, root).filter(_ > cp).map(e => epochRel(root, e, rel)))
      .filter(p => exists(spark, p))
    if (paths.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else spark.read.schema(schema).parquet(paths: _*)
  }

  /** Compact the delta log (r12) — the epoch-layout analogue of a log
    * checkpoint: after years of monthly drops the committed union
    * reads one fragment per drop, so fold everything committed so far
    * into ONE `compact-<id>/` copy per relation and publish it with a
    * single atomic marker under `checkpoints/<id>`. Readers switch
    * atomically: before the marker the orphan compact dir is invisible
    * (a retried compaction overwrites it); after it they read the
    * compacted copy plus only the deltas newer than it. Epoch MARKERS
    * are never deleted — replay detection by batch id keeps working
    * for the whole history — and the superseded delta DIRS are removed
    * by [[vacuum]], a separate lazily-run step, so no crash point can
    * lose data. Returns the checkpoint id (-1 if nothing committed).
    *
    * `fold` (r14, VERDICT #1): what the compacted copy of each relation
    * holds. The default writes the delta union verbatim — correct for
    * APPEND relations where every row is live (dedup signatures, span
    * windows, ANN buckets). For RESOLVE-keyed relations
    * (latest-epoch-wins, e.g. the cluster members/survivors) the
    * verbatim union carries every superseded relabel and tombstone row
    * into every future compacted copy forever — state grows with
    * lifetime churn, not current size — so their owners pass the
    * resolver here and the compacted copy holds only the CURRENT row
    * per key (epoch column retained, so post-compaction reads resolve
    * exactly as before).
    */
  def checkpointDeltas(spark: SparkSession, root: String,
      rels: Map[String, StructType],
      fold: (String, DataFrame) => DataFrame = (_, df) => df): Long = {
    val cp = currentEpoch(spark, root)
    if (cp < 0L) return -1L
    rels.foreach { case (rel, schema) =>
      fold(rel, readCommittedDeltas(spark, root, rel, schema))
        .write.mode("overwrite").parquet(compactRel(root, cp, rel))
    }
    val fs = fsFor(spark, root)
    fs.mkdirs(new Path(checkpointsDir(root)))
    try fs.create(new Path(s"${checkpointsDir(root)}/$cp"), false).close()
    catch { case _: java.io.IOException => () } // already published
    cp
  }

  /** Delete the delta copies superseded by the newest checkpoint (the
    * heavy content; tiny epoch markers and any non-listed relations —
    * per-batch reports — stay). Safe to run any time after
    * [[checkpointDeltas]]; a crash mid-vacuum just leaves some
    * already-superseded dirs for the next run. Prior checkpoints'
    * compact dirs are removed too.
    */
  def vacuum(spark: SparkSession, root: String, rels: Seq[String]): Unit = {
    val cp = currentCheckpoint(spark, root)
    if (cp < 0L) return
    val fs = fsFor(spark, root)
    committedEpochs(spark, root).filter(_ <= cp).foreach { e =>
      rels.foreach { rel => fs.delete(new Path(epochRel(root, e, rel)), true); () }
    }
    val cps = new Path(checkpointsDir(root))
    fs.listStatus(cps).iterator
      .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption)
      .filter(_ < cp)
      .foreach { old =>
        fs.delete(new Path(s"$root/compact-$old"), true)
        fs.delete(new Path(s"${checkpointsDir(root)}/$old"), false)
        ()
      }
  }

  /** Drop a FULL-STATE relation (one rewritten per epoch, each copy
    * superseding the last — e.g. the span index's folded df-cap
    * aggregate) from all but the `keep` newest committed epochs. The
    * delta relations of those epochs stay untouched.
    */
  def pruneRel(spark: SparkSession, root: String, rel: String,
      keep: Int = 2): Unit = {
    val fs = fsFor(spark, root)
    committedEpochs(spark, root).dropRight(keep).foreach { e =>
      fs.delete(new Path(epochRel(root, e, rel)), true)
      ()
    }
  }

  /** Refuse a root that holds pre-epoch-layout data: non-hidden files
    * or dirs but no commits log. Reading such an index through the
    * committed-deltas resolver would silently see an EMPTY index (the
    * same silent-miss class the dedup format-version marker guards),
    * so it is a hard error at open time.
    */
  def guardEpochLayout(spark: SparkSession, root: String, what: String): Unit = {
    val fs = fsFor(spark, root)
    val p = new Path(root)
    if (!fs.exists(p)) return
    if (fs.exists(new Path(commitsDir(root)))) return
    val foreign = fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    if (foreign)
      throw new IllegalStateException(
        s"$what at $root predates the epoch-committed layout (no commits/ " +
        "log); reading it as committed deltas would silently treat it as " +
        "empty. Rebuild the index (delete the directory and re-stream).")
  }

  /** Keep the two newest committed epochs; drop older dirs + markers. */
  private def prune(fs: FileSystem, root: String): Unit = {
    val commits = new Path(commitsDir(root))
    if (!fs.exists(commits)) return
    val ids = fs.listStatus(commits)
      .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption)
      .sorted
    if (ids.length <= 2) return
    val drop = ids.dropRight(2)
    drop.foreach { id =>
      fs.delete(new Path(s"$root/epoch-$id"), true)
      fs.delete(new Path(s"${commitsDir(root)}/$id"), false)
      ()
    }
  }
}
