package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextOps
import graft.streaming.{IncrementalCluster, IncrementalDedup}

/** End-to-end differential of the INCREMENTAL monthly-drop dedup
  * pipeline against the BATCH gates on a real corpus (r12): split the
  * documents table into K drops, run each through
  * [[IncrementalDedup.processBatch]] + [[IncrementalCluster.update]]
  * exactly as graft-drop does, and require
  *
  *  1. the union of the K per-drop pair reports to equal batch t28
  *     (`TextOps.qMinhashLsh`) row-for-row INCLUDING the IEEE jaccard
  *     — the new-vs-all probe over K drops must enumerate every
  *     band-colliding unordered pair exactly once;
  *  2. the folded cluster state to equal batch t40
  *     (`qDedupClusters`): same member set, same component-min labels,
  *     same sizes;
  *  3. the same labels from a code-independent driver-side union-find
  *     over the reported pairs (the CcCheck discipline — a
  *     straight-line DSU sharing no structure with either the
  *     alternating-star loop or the incremental fold);
  *  4. the per-drop survivor elections to equal batch t52
  *     (`qDedupSurvivors`) on every multi-member cluster, score and
  *     size included.
  *
  * This closes the gap between IncrementalClusterSpec's synthetic
  * multi-drop fixtures and the corpus: the spec proves the fold's
  * algebra; this proves the WIRED PIPELINE (signature parity between
  * docSignatures and the batch minhash family, probe completeness
  * across drops, score parity between signing-time and batch scoring)
  * on real data at any SF the caller points it at.
  *
  * Run: runMain graft.tools.DropCheck <dir> [drops]   (exit 1 on any
  * mismatch). DropCheckSpec runs it at sf0.01 with 3 drops in CI.
  */
object DropCheck {

  private final class Dsu {
    private val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    def union(a: Long, b: Long): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      ()
    }
    def nodes: Iterator[Long] = parent.keysIterator
  }

  /** Returns mismatch descriptions; empty = pipeline verified. */
  def check(spark: SparkSession, dir: String, drops: Int = 4,
      maxErrs: Int = 20): Seq[String] = {
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    def err(m: => String): Unit = if (errs.size < maxErrs) { errs += m; () }

    val root = java.nio.file.Files.createTempDirectory("dropcheck").toString
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))

    // the wired pipeline, drop by drop (same sequence as graft-drop)
    val reported = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    for (i <- 0 until drops) {
      val batch = docs.filter(pmod(col("doc_id"), lit(drops)) === i)
      val pairs = IncrementalDedup.processBatch(batch, s"$root/dedup", i.toLong)
      val scores = pairs
        .select(col("doc_a").as("doc_id"), col("score_a").as("score"))
        .unionByName(pairs
          .select(col("doc_b").as("doc_id"), col("score_b").as("score")))
        .distinct()
      IncrementalCluster.update(spark, s"$root/clusters", i.toLong, pairs, scores)
      reported ++= pairs.select(col("doc_a"), col("doc_b"), col("jaccard"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      ()
    }

    // 1. pair-set equality vs batch t28 (near-dup-bounded — collectable)
    val inc = reported.sortBy(p => (p._1, p._2)).toSeq
    val batchPairs = TextOps.qMinhashLsh(spark, dir)
      .select(col("doc_a"), col("doc_b"), col("jaccard")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2)).toSeq
    if (inc.size != batchPairs.size)
      err(s"pair count: incremental ${inc.size} vs batch ${batchPairs.size}")
    inc.zip(batchPairs).foreach { case (a, b) =>
      if (a != b) err(s"pair mismatch: incremental $a vs batch $b")
    }

    // 3. independent union-find over the reported edges
    val dsu = new Dsu
    reported.foreach { case (a, b, _) => dsu.union(a, b) }
    val expect = dsu.nodes.map(n => n -> dsu.find(n)).toMap

    // 2. folded members vs t40 labels and the DSU
    val members = IncrementalCluster.readMembers(spark, s"$root/clusters")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val t40 = TextOps.qDedupClusters(spark, dir)
      .select(col("doc_id"), col("cluster_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    if (members.keySet != t40.keySet)
      err(s"member sets differ: inc-only ${(members.keySet -- t40.keySet).take(5)}, " +
        s"batch-only ${(t40.keySet -- members.keySet).take(5)}")
    members.foreach { case (d, (l, _)) =>
      if (t40.getOrElse(d, -1L) != l) err(s"doc $d: fold label $l, t40 ${t40.get(d)}")
      if (expect.getOrElse(d, d) != l) err(s"doc $d: fold label $l, union-find ${expect.get(d)}")
    }

    // 4. survivors vs t52 on multi-member clusters (score + size too)
    val surv = IncrementalCluster.readSurvivors(spark, s"$root/clusters")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val t52 = TextOps.qDedupSurvivors(spark, dir)
      .filter(col("cluster_size") > 1L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    if (surv.keySet != t52.keySet)
      err(s"survivor cluster sets differ: inc-only ${(surv.keySet -- t52.keySet).take(5)}, " +
        s"batch-only ${(t52.keySet -- surv.keySet).take(5)}")
    surv.foreach { case (c, row) =>
      if (t52.get(c).exists(_ != row) || !t52.contains(c))
        err(s"cluster $c: fold survivor $row, t52 ${t52.get(c)}")
    }

    if (errs.isEmpty)
      println(s"[drop-check] $dir drops=$drops verified: ${inc.size} pairs, " +
        s"${members.size} members, ${surv.size} clusters — incremental == batch == union-find")
    // checker scratch must not outlive the check: drop the temp index
    // state and release the memoized batch relations (a shared suite
    // session would otherwise keep minhash-sig/cc-labels frames cached
    // for every later spec)
    graft.streaming.StreamingState.fsFor(spark, root)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    graft.operators.SessionMemo.release(spark)
    errs.toSeq
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val drops = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val errs = check(spark, dir, drops)
    errs.foreach(e => System.err.println(s"[drop-check] MISMATCH: $e"))
    if (errs.nonEmpty) sys.exit(1)
  }
}
