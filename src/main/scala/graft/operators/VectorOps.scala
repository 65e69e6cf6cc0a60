package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Similarity search over the `embeddings` table (Array[Float], 64-d):
  * the ANN operators from the project north star.
  *
  *  - brute-force cosine top-k — the exact baseline (query-set ×
  *    corpus, fine when the query set is small/broadcastable);
  *  - sign-LSH bucketed ANN — the scale path: each vector gets an
  *    8-bit bucket from the signs of its dot products with 8 fixed
  *    hyperplanes, so candidate generation is an equi-join on bucket id
  *    (shuffle on a 256-value key, no cross join anywhere);
  *  - per-label vector stats (decimal-exact norm aggregation).
  *
  * All vector math is `zip_with`/`aggregate` higher-order functions over
  * double-cast arrays — sequential left-folds, which both Spark and the
  * DuckDB oracle's list functions evaluate in identical IEEE order, so
  * cosines are engine-exact without any rounding.
  */
object VectorOps {

  /** embedding cast float→double (exact widening). */
  private val vec: Column = expr("transform(embedding, x -> cast(x as double))")

  private def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v)")

  /** (vec_id, label, v, nv = ‖v‖): the norm is a per-vector constant, so
    * compute it ONCE at load instead of per candidate pair — the scoring
    * joins then do one dot product per pair instead of three. sqrt of
    * the same left-fold is bit-identical to the oracle's per-row
    * SQRT(LIST_DOT_PRODUCT(v, v)), so cosines are unchanged.
    */
  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), vec.as("v"))
      .withColumn("nv", sqrt(dot("v", "v")))

  /** Brute-force cosine top-k: 10 query vectors against the corpus.
    * cosine = dot / (sqrt(na) * sqrt(nb)) — parenthesization mirrored
    * exactly in the oracle.
    */
  def qAnnBruteForce(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"), col("v"), col("nv"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nv").as("qnv"))
    val joined = broadcast(q).crossJoin(e)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", dot("qv", "v") / (col("qnv") * col("nv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  val qAnnBruteForceOracle: String = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    scored AS (
      SELECT query_id, vec_id,
             LIST_DOT_PRODUCT(qv, v) /
               (SQRT(LIST_DOT_PRODUCT(qv, qv)) * SQRT(LIST_DOT_PRODUCT(v, v))) AS cosine
      FROM q CROSS JOIN e
      WHERE vec_id <> query_id),
    ranked AS (
      SELECT query_id, vec_id AS neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
      FROM scored)
    SELECT query_id, rank, neighbor_id, cosine
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank"""

  /** Sign-LSH bucketed ANN — the 100 TB path. Hyperplanes are the first
    * 8 corpus vectors (a fixed, data-derived model parameter, joined as
    * a broadcast side — no driver collect). bucket = Σ 2^i·[dot(v,pᵢ)≥0]
    * is an order-independent integer, so both engines agree exactly.
    * Candidates = same-bucket pairs; exact cosine re-ranks within the
    * bucket. Each vector is hashed once; the join key has 256 values.
    */
  /** Attach the 8-bit sign-LSH bucket IN-ROW: the 8 hyperplanes arrive
    * as one broadcast single-row array and each vector folds over them
    * in place — versus the naive explode-8×-then-groupBy layout, which
    * shuffles every (vector, plane) pair and then joins the vectors
    * back. Bit sums are order-independent integers, so the bucket is
    * engine-exact regardless of collect_list order.
    */
  private def withBuckets(e: DataFrame): DataFrame = {
    val planesArr = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("plane_id"), col("v").as("pv"))
      .agg(collect_list(struct(col("plane_id"), col("pv"))).as("ps"))
    e.crossJoin(broadcast(planesArr))
      .withColumn("bucket", expr(
        """aggregate(ps, 0L, (acc, p) -> acc +
             if(aggregate(zip_with(v, p.pv, (x, y) -> x * y),
                          cast(0 as double), (a2, v2) -> a2 + v2) >= 0,
                shiftleft(1L, p.plane_id), 0L))"""))
      .drop("ps")
  }

  def qAnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"), col("v"), col("nv"))
    val buckets = withBuckets(e)
    val q = buckets.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("bucket").as("qb"),
        col("v").as("qv"), col("nv").as("qnv"))
    val joined = q.join(buckets, col("bucket") === col("qb") &&
        col("vec_id") =!= col("query_id"))
      .withColumn("cosine", dot("qv", "v") / (col("qnv") * col("nv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("bucket"), col("rank"),
        col("vec_id").as("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  val qAnnLshOracle: String = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    planes AS (SELECT vec_id AS plane_id, v AS pv FROM e WHERE vec_id < 8),
    buckets AS (
      SELECT e.vec_id,
             CAST(SUM(CASE WHEN LIST_DOT_PRODUCT(v, pv) >= 0
                           THEN 1 << plane_id ELSE 0 END) AS BIGINT) AS bucket
      FROM e CROSS JOIN planes
      GROUP BY e.vec_id),
    be AS (SELECT b.vec_id, b.bucket, e.v FROM buckets b JOIN e ON b.vec_id = e.vec_id),
    q AS (SELECT vec_id AS query_id, bucket AS qb, v AS qv FROM be WHERE vec_id < 10),
    scored AS (
      SELECT query_id, be.bucket, be.vec_id AS neighbor_id,
             LIST_DOT_PRODUCT(qv, v) /
               (SQRT(LIST_DOT_PRODUCT(qv, qv)) * SQRT(LIST_DOT_PRODUCT(v, v))) AS cosine
      FROM q JOIN be ON be.bucket = q.qb AND be.vec_id <> q.query_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, bucket, rank, neighbor_id, cosine
    FROM ranked WHERE rank <= 3
    ORDER BY query_id, rank"""

  /** Embedding-cosine near-dup detection (dedup family): all pairs
    * within an LSH bucket with cosine ≥ 0.3 — blocking via the same
    * sign-LSH buckets keeps it join-shaped at scale.
    */
  def qCosineDedup(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"), col("v"), col("nv"))
    val buckets = withBuckets(e)
    val a = buckets.select(col("vec_id").as("id_a"), col("bucket"),
      col("v").as("va"), col("nv").as("na"))
    val b = buckets.select(col("vec_id").as("id_b"), col("bucket").as("bucket_b"),
      col("v").as("vb"), col("nv").as("nb"))
    a.join(b, col("bucket") === col("bucket_b") && col("id_a") < col("id_b"))
      .withColumn("cosine", dot("va", "vb") / (col("na") * col("nb")))
      .filter(col("cosine") >= 0.3)
      .select(col("id_a"), col("id_b"), col("cosine"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val qCosineDedupOracle: String = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    planes AS (SELECT vec_id AS plane_id, v AS pv FROM e WHERE vec_id < 8),
    buckets AS (
      SELECT e.vec_id,
             CAST(SUM(CASE WHEN LIST_DOT_PRODUCT(v, pv) >= 0
                           THEN 1 << plane_id ELSE 0 END) AS BIGINT) AS bucket
      FROM e CROSS JOIN planes
      GROUP BY e.vec_id),
    be AS (SELECT b.vec_id, b.bucket, e.v FROM buckets b JOIN e ON b.vec_id = e.vec_id),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             LIST_DOT_PRODUCT(a.v, b.v) /
               (SQRT(LIST_DOT_PRODUCT(a.v, a.v)) * SQRT(LIST_DOT_PRODUCT(b.v, b.v))) AS cosine
      FROM be a JOIN be b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT id_a, id_b, cosine
    FROM pairs WHERE cosine >= 0.3
    ORDER BY id_a, id_b"""

  /** Per-label vector statistics: counts and decimal-exact norm
    * aggregation (per-row norms are engine-identical doubles; the
    * decimal cast makes the cross-row sum order-independent).
    */
  def qVectorStats(s: SparkSession, dir: String): DataFrame = {
    Tables.embeddings(s, dir)
      .withColumn("v", vec)
      .withColumn("norm", sqrt(dot("v", "v")))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("norm").cast(DecimalType(18, 6))).cast("double").as("sum_norm6"),
        min(col("norm")).as("min_norm"),
        max(col("norm")).as("max_norm"))
      .withColumn("avg_norm6", col("sum_norm6") / col("n"))
      .orderBy(col("label"))
  }

  val qVectorStatsOracle: String = """
    WITH e AS (SELECT label, SQRT(LIST_DOT_PRODUCT(CAST(embedding AS DOUBLE[]),
                                                   CAST(embedding AS DOUBLE[]))) AS norm
               FROM embeddings)
    SELECT label, COUNT(*) AS n,
           CAST(SUM(CAST(norm AS DECIMAL(18,6))) AS DOUBLE) AS sum_norm6,
           MIN(norm) AS min_norm, MAX(norm) AS max_norm,
           CAST(SUM(CAST(norm AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_norm6
    FROM e
    GROUP BY label
    ORDER BY label"""

  /** IVF (inverted-file) ANN — the second scale path beside sign-LSH.
    * Coarse quantizer: per-label centroids (the labels stand in for a
    * k-means coarse assignment, which at 100 TB would be trained
    * offline). Centroid coordinates are decimal-exact sums / count so
    * both engines derive identical doubles; queries probe the top-2
    * centroids by cosine and search only those partitions — candidate
    * generation is an equi-join on label, never a cross join.
    */
  def qAnnIvf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val e = embs(s, dir)
    // exact per-dimension centroid: posexplode -> decimal sum -> double/count
    val cent = e.select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg((sum(col("x").cast(DecimalType(28, 12))).cast("double") /
        count(lit(1))).as("c"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, c))), p -> p.c)").as("cv"))
      .withColumn("ncv", sqrt(dot("cv", "cv")))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nv").as("qnv"))
    val probes = {
      val scored = q.join(broadcast(cent))
        .withColumn("csim", dot("qv", "cv") / (col("qnv") * col("ncv")))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("csim").desc, col("label"))
      scored.withColumn("p", row_number().over(w)).filter(col("p") <= 2)
        .select(col("query_id"), col("qv"), col("qnv"), col("label"))
    }
    val joined = probes.join(e, Seq("label"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", dot("qv", "v") / (col("qnv") * col("nv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("label"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  val qAnnIvfOracle: String = """
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    dims AS (
      SELECT label, i AS dim, x
      FROM (SELECT label, UNNEST(v) AS x,
                   UNNEST(RANGE(0, LEN(v))) AS i
            FROM e)),
    cdim AS (
      SELECT label, dim,
             CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS c
      FROM dims GROUP BY label, dim),
    cent AS (SELECT label, LIST(c ORDER BY dim) AS cv FROM cdim GROUP BY label),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    probes AS (
      SELECT query_id, qv, label FROM (
        SELECT q.query_id, q.qv, cent.label,
               ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                 LIST_DOT_PRODUCT(qv, cv) /
                   (SQRT(LIST_DOT_PRODUCT(qv, qv)) * SQRT(LIST_DOT_PRODUCT(cv, cv))) DESC,
                 cent.label) AS p
        FROM q CROSS JOIN cent)
      WHERE p <= 2),
    scored AS (
      SELECT probes.query_id, e.vec_id AS neighbor_id, e.label,
             LIST_DOT_PRODUCT(qv, v) /
               (SQRT(LIST_DOT_PRODUCT(qv, qv)) * SQRT(LIST_DOT_PRODUCT(v, v))) AS cosine
      FROM probes JOIN e ON probes.label = e.label
      WHERE e.vec_id <> probes.query_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, label, cosine
    FROM ranked WHERE rank <= 3
    ORDER BY query_id, rank"""

  val all: Seq[GateQuery] = Seq(
    GateQuery("v33_ann_bruteforce", qAnnBruteForce, Some(qAnnBruteForceOracle)),
    GateQuery("v34_ann_lsh", qAnnLsh, Some(qAnnLshOracle)),
    GateQuery("v35_cosine_dedup", qCosineDedup, Some(qCosineDedupOracle)),
    GateQuery("v36_vector_stats", qVectorStats, Some(qVectorStatsOracle)),
    GateQuery("v37_ann_ivf", qAnnIvf, Some(qAnnIvfOracle)),
  )
}
