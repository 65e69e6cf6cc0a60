package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel
import graft.operators.Scale

/** Incremental near-dup cluster + survivor state (r12, VERDICT #1 of
  * "What's missing"): the operator a recurring 100 TB pipeline
  * actually reads after each monthly drop — "which cluster is this
  * document in, and who survives" — maintained ACROSS drops instead
  * of re-running batch t40/t52 over the accumulated corpus.
  *
  * State (epoch-committed, [[StreamingState]] layout; each copy
  * supersedes the last and older copies are pruned):
  *
  *  - `members`   — (doc_id, label, score) for every document that has
  *    ever appeared in a near-dup pair. label = component MINIMUM doc
  *    id, the t40 convention. Docs never paired are implicit
  *    singletons (exactly t40's contract: labels exist only for
  *    edge-touched docs), so the state is duplication-bounded — a few
  *    percent of the corpus — not corpus-sized.
  *  - `survivors` — (cluster_id, survivor_id, cluster_size, score):
  *    per cluster, the member maximizing (score, then lowest doc_id)
  *    over the SAME quality score t52 elects with.
  *
  * Per drop, [[update]] folds the batch's verified pairs in
  * LOCALLY: only components touched by a new edge are re-solved —
  * the new edges plus one (doc → label) star edge per member of an
  * affected component feed [[Scale.connectedComponents]]; untouched
  * components are carried over unchanged. Label correctness is
  * inductive: a state label is its component's min and participates
  * as a node of the local graph, so the merged component's new label
  * is the min over everything it absorbed — identical to batch t40
  * over the union of all drops' pairs. Per-drop cost is
  * O(new pairs + affected members), never state-sized.
  *
  * Each epoch also publishes the drop's change report atomically with
  * the state (the VERDICT #2 discipline — no crash point can apply
  * the fold and lose the report):
  *
  *  - `label_changes`    — (doc_id, old_label, new_label): docs that
  *    entered a cluster or whose cluster merged (old_label null =
  *    first appearance);
  *  - `survivor_changes` — (cluster_id, old_survivor, new_survivor,
  *    cluster_size, score): affected clusters whose elected survivor
  *    appeared or changed; clusters merged AWAY surface as the
  *    absorbing cluster's row (their members' rows in
  *    `label_changes` carry the relabel).
  *
  * Replays of a committed batch id return the persisted report and
  * touch nothing.
  */
object IncrementalCluster {

  val membersSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("label", LongType, nullable = true),
    StructField("score", DoubleType, nullable = true)))

  val survivorsSchema: StructType = StructType(Seq(
    StructField("cluster_id", LongType, nullable = true),
    StructField("survivor_id", LongType, nullable = true),
    StructField("cluster_size", LongType, nullable = true),
    StructField("score", DoubleType, nullable = true)))

  val labelChangesSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("old_label", LongType, nullable = true),
    StructField("new_label", LongType, nullable = true)))

  val survivorChangesSchema: StructType = StructType(Seq(
    StructField("cluster_id", LongType, nullable = true),
    StructField("old_survivor", LongType, nullable = true),
    StructField("new_survivor", LongType, nullable = true),
    StructField("cluster_size", LongType, nullable = true),
    StructField("score", DoubleType, nullable = true)))

  /** The drop's change report, read back from the committed epoch. */
  final case class Changes(labelChanges: DataFrame, survivorChanges: DataFrame)

  private def currentFull(spark: SparkSession, path: String, rel: String,
      schema: StructType): DataFrame = {
    val e = StreamingState.currentEpoch(spark, path)
    if (e < 0L)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else StreamingState.readOr(spark,
      StreamingState.epochRel(path, e, rel), schema)
  }

  /** Current (doc_id, label, score) state — every doc ever paired. */
  def readMembers(spark: SparkSession, path: String): DataFrame = {
    StreamingState.guardEpochLayout(spark, path, "IncrementalCluster")
    currentFull(spark, path, "members", membersSchema)
  }

  /** Current per-cluster survivor election. */
  def readSurvivors(spark: SparkSession, path: String): DataFrame = {
    StreamingState.guardEpochLayout(spark, path, "IncrementalCluster")
    currentFull(spark, path, "survivors", survivorsSchema)
  }

  /** t52's quality score for a (doc_id, text) batch — the per-doc
    * election key, computed once per document at arrival (text is
    * immutable, so the stored score never goes stale).
    */
  def docScores(docs: DataFrame): DataFrame =
    graft.operators.TextOps.withQualityScore(
        docs.withColumn("words", expr("filter(split(text, ' '), w -> w != '')")))
      .select(col("doc_id"), col("score"))

  private def readChanges(spark: SparkSession, path: String,
      batchId: Long): Changes = Changes(
    spark.read.schema(labelChangesSchema)
      .parquet(StreamingState.epochRel(path, batchId, "label_changes")),
    spark.read.schema(survivorChangesSchema)
      .parquet(StreamingState.epochRel(path, batchId, "survivor_changes")))

  /** Fold one drop's verified near-dup pairs into the persisted
    * cluster state and publish state + change report as one atomic
    * epoch.
    *
    * @param pairs  this drop's verified pairs — (doc_a, doc_b), the
    *               IncrementalDedup report (extra columns ignored)
    * @param scores (doc_id, score) for this drop's documents (see
    *               [[docScores]]); previously-stored scores win for
    *               re-sent ids (same text → same score)
    */
  def update(spark: SparkSession, path: String, batchId: Long,
      pairs: DataFrame, scores: DataFrame): Changes = {
    StreamingState.guardEpochLayout(spark, path, "IncrementalCluster")
    if (StreamingState.isCommitted(spark, path, batchId))
      return readChanges(spark, path, batchId)
    val prevM = currentFull(spark, path, "members", membersSchema)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val prevS = currentFull(spark, path, "survivors", survivorsSchema)

    val e = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
    val touched = e.select(col("u").as("doc_id"))
      .union(e.select(col("v").as("doc_id"))).distinct()
    // components holding any endpoint of a new edge; everything else
    // is carried over untouched — the fold never scans an unaffected
    // cluster
    val affLabels = prevM.join(touched, Seq("doc_id"), "left_semi")
      .select(col("label")).distinct()
    val affMembers = prevM.join(affLabels, Seq("label"), "left_semi")
    val starEdges = affMembers.filter(col("doc_id") =!= col("label"))
      .select(col("doc_id").as("u"), col("label").as("v"))
    val (labels, _) = Scale.connectedComponents(e.unionByName(starEdges))

    // score every relabeled doc: stored score wins, batch score covers
    // first appearances
    // defensive one-row-per-doc on the caller's scores: a duplicate
    // (doc_id, score) row would silently fan the member join out
    val batchScores = scores.groupBy(col("doc_id"))
      .agg(max(col("score")).as("batch_score"))
    val newAffM = labels
      .join(prevM.select(col("doc_id"), col("score").as("prev_score")),
        Seq("doc_id"), "left")
      .join(batchScores, Seq("doc_id"), "left")
      .select(col("doc_id"), col("label"),
        coalesce(col("prev_score"), col("batch_score")).as("score"))
    val members = prevM.join(affLabels, Seq("label"), "left_anti")
      .select(col("doc_id"), col("label"), col("score"))
      .unionByName(newAffM)

    val affSurv = newAffM
      .groupBy(col("label").as("cluster_id"))
      .agg(max(struct(col("score"), (-col("doc_id")).as("neg_id"))).as("best"),
        count(lit(1)).as("cluster_size"))
      .select(col("cluster_id"), (-col("best.neg_id")).as("survivor_id"),
        col("cluster_size"), col("best.score").as("score"))
    val survivors = prevS
      .join(affLabels.select(col("label").as("cluster_id")),
        Seq("cluster_id"), "left_anti")
      .unionByName(affSurv)

    val labelChanges = newAffM
      .join(prevM.select(col("doc_id"), col("label").as("old_label")),
        Seq("doc_id"), "left")
      .filter(col("old_label").isNull || col("old_label") =!= col("label"))
      .select(col("doc_id"), col("old_label"), col("label").as("new_label"))
    val survivorChanges = affSurv
      .join(prevS.select(col("cluster_id"),
        col("survivor_id").as("old_survivor")), Seq("cluster_id"), "left")
      .filter(col("old_survivor").isNull ||
        col("old_survivor") =!= col("survivor_id"))
      .select(col("cluster_id"), col("old_survivor"),
        col("survivor_id").as("new_survivor"), col("cluster_size"),
        col("score"))

    StreamingState.commitAppend(spark, path, batchId,
      Map("members" -> members, "survivors" -> survivors,
        "label_changes" -> labelChanges,
        "survivor_changes" -> survivorChanges))
    // full-state rels: each epoch's copy supersedes the last
    StreamingState.pruneRel(spark, path, "members")
    StreamingState.pruneRel(spark, path, "survivors")
    prevM.unpersist()
    readChanges(spark, path, batchId)
  }
}
