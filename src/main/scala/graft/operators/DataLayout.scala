package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multi-dimensional data layout (Z-order / Morton clustering) — the
  * storage-side half of scan pruning at 100 TB. A corpus written
  * sorted by ONE key gives parquet row-group min/max stats that prune
  * only that key's predicates; interleaving the bits of several
  * rank-bucketed dimensions into one sort key clusters the file layout
  * so per-file min/max ranges are tight in EVERY interleaved dimension
  * at once (the technique behind Delta Lake's OPTIMIZE ZORDER and the
  * classic UB-tree; Morton 1966). Nothing here changes row contents —
  * like salting, it is a pure layout choice, which is exactly what the
  * q45 oracle pins.
  *
  * Construction:
  *  1. each dimension maps to an equi-depth rank bucket in
  *     [0, 2^bits): global rank by (value, id-tiebreak) via
  *     [[Scale.distributedRank]] (range-partitioned two-phase rank —
  *     no single-reducer global window), then
  *     bucket = (rank-1) · 2^bits ÷ n in INTEGER arithmetic (no
  *     percentile float whose last ulp could disagree across engines).
  *     Rank buckets, not raw value bits: equi-depth is skew-immune —
  *     a heavy-tailed dimension still spreads over all 2^bits codes;
  *  2. bucket bits interleave round-robin into the z-value (all
  *     shiftleft/shiftright/bitwiseAND built-ins — codegen'd, no UDF);
  *  3. [[zorderWrite]] range-partitions on the z-value and sorts
  *     within partitions, so every output file covers a contiguous
  *     z-range = a small hyper-rectangle of the bucketed space.
  *
  * At scale: ranks are the two-phase distributed form, the bucket
  * arithmetic is in-row, the final exchange is the ONE range shuffle
  * any re-layout job pays by definition. The rank pass is exact; a
  * sampled variant (boundaries from a fraction, buckets by range
  * lookup) trades bucket-boundary precision for a cheaper pass — same
  * trade as [[Scale.adaptiveSaltedJoin]]'s sampled detection — but the
  * exact form is already shuffle-bounded, so it is the default.
  */
object DataLayout {

  /** Interleave the low `bits` bits of each dimension column
    * round-robin (dim 0 owns the most-significant position within each
    * round): bit i of dims(k) lands at position i·d + (d-1-k). All
    * built-in bit expressions — stays inside whole-stage codegen.
    */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    val d = dims.size
    require(d >= 2, "z-order needs at least two dimensions")
    require(d * bits <= 62, s"$d dims x $bits bits overflows a signed long")
    val terms = for {
      (c, k) <- dims.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * d + (d - 1 - k))
    terms.reduce(_ + _)
  }

  /** The identical interleave as oracle SQL over integer column
    * expressions (DuckDB `>> << &` semantics match Spark's on BIGINT).
    */
  def zSql(dims: Seq[String], bits: Int): String = {
    val d = dims.size
    (for {
      (c, k) <- dims.zipWithIndex
      i <- 0 until bits
    } yield s"((($c >> $i) & 1) << ${i * d + (d - 1 - k)})").mkString(" + ")
  }

  /** Equi-depth rank bucket of `orderCol` (with `idCol` tiebreak, so
    * the rank — and therefore the bucket — is a deterministic total
    * order even under ties) in [0, 2^bits): appended as `bucketCol`.
    * The rank is [[Scale.distributedRank]]; n rides along as
    * max(rank) via one broadcast one-row frame, never a driver action.
    */
  def rankBucket(df: DataFrame, orderCol: Column, idCol: Column,
      bits: Int, bucketCol: String,
      materialize: DataFrame => DataFrame): DataFrame = {
    val b = 1L << bits
    val (ranked, counts) = Scale.distributedRankWithCounts(
      df.withColumn("__zk", lit(1)).withColumn("__zo", struct(orderCol, idCol)),
      "__zk", "__zo", "__zr", materialize = materialize)
    // n = Σ of the rank pass's per-slice counts (a tasks×1-row frame)
    // — r15: the previous max(__zr) re-aggregated the corpus-sized
    // ranked output, a full second pass per bucketed dimension
    ranked
      .crossJoin(broadcast(counts.agg(sum(col("__cnt")).as("__zn"))))
      .withColumn(bucketCol, expr(s"((__zr - 1) * $b) div __zn"))
      .drop("__zk", "__zo", "__zr", "__zn")
  }

  /** Cluster `df`'s layout on a precomputed z-value column (plus
    * optional prefix columns — e.g. the write's partitionBy keys, so
    * clustering happens WITHIN each partition dir): ONE range exchange
    * + an in-partition sort, the shared recipe behind [[zorderWrite]]
    * and `graft-curate --zorder`.
    */
  def clusterWrite(df: DataFrame, z: Column, prefix: Seq[Column] = Nil,
      numFiles: Option[Int] = None): DataFrame = {
    val tagged = df.withColumn("__z", z)
    val keys = prefix :+ col("__z")
    numFiles.map(n => tagged.repartitionByRange(n, keys: _*))
      .getOrElse(tagged.repartitionByRange(keys: _*))
      .sortWithinPartitions(keys: _*)
      .drop("__z")
  }

  /** Re-layout `df` so files are z-clustered on `dims` (already
    * bucketed integer columns, e.g. from [[rankBucket]]): ONE range
    * exchange on the z-value + an in-partition sort. Writers that cap
    * file size (maxRecordsPerFile / target row-group size) then emit
    * files whose min/max footer stats are tight in every dimension.
    */
  def zorderWrite(df: DataFrame, dims: Seq[String], bits: Int,
      numFiles: Int): DataFrame =
    clusterWrite(df, zValue(dims.map(col), bits), Nil, Some(numFiles))

  /** q45: the z-layout computation oracle-pinned end-to-end on events —
    * per event, its (user, time) equi-depth buckets and the interleaved
    * z-value. Deterministic by construction (rank tiebreak on
    * event_id; integer bucket + interleave arithmetic), so DuckDB's
    * ROW_NUMBER formulation must agree bit-for-bit. The file-level
    * pruning payoff (per-file min/max area vs a 1-D sort) is
    * spec-asserted in DataLayoutSpec, where written files exist to
    * measure.
    */
  def qZorderLayout(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("tus"))
    // the second rank CHAINS over the first's output (rankBucket
    // carries the other columns through), so the two bucket columns
    // meet without an event_id re-join — the only corpus exchanges are
    // the two range re-sorts equi-depth bucketing inherently costs
    val bu = rankBucket(ev, col("user_id"), col("event_id"), Bits, "bu",
      df => SessionMemo.persist("layout:rank-user", s, dir)(df))
    rankBucket(bu, col("tus"), col("event_id"), Bits, "bt",
        df => SessionMemo.persist("layout:rank-time", s, dir)(df))
      .select(col("event_id"), col("bu"), col("bt"))
      .withColumn("z", zValue(Seq(col("bu"), col("bt")), Bits))
      .orderBy(col("event_id"))
  }

  /** 8 bits/dim = 256 equi-depth buckets: at a 1 GB target file size a
    * 100 TB table has ~10^5 files, so 2^16 z-cells keep multiple cells
    * per file without degenerating to one cell per millions of rows.
    */
  val Bits = 8

  val qZorderLayoutOracle: String = s"""
    WITH r AS (
      SELECT event_id,
             ROW_NUMBER() OVER (ORDER BY user_id, event_id) AS ru,
             ROW_NUMBER() OVER (ORDER BY epoch_us(ts), event_id) AS rt,
             COUNT(*) OVER () AS n
      FROM events),
    b AS (
      SELECT event_id,
             ((ru - 1) * ${1L << Bits}) // n AS bu,
             ((rt - 1) * ${1L << Bits}) // n AS bt
      FROM r)
    SELECT event_id, CAST(bu AS BIGINT) AS bu, CAST(bt AS BIGINT) AS bt,
           CAST(${zSql(Seq("bu", "bt"), Bits)} AS BIGINT) AS z
    FROM b ORDER BY event_id"""

  val all: Seq[GateQuery] = Seq(
    GateQuery("q45_zorder_layout", qZorderLayout, Some(qZorderLayoutOracle)))
}
