package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Tables, Det}

/** One oracle-checked query: a Spark build plus (optionally) the
  * equivalent DuckDB SQL the driver runs against the same parquet files.
  */
final case class GateQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Relational query pack over the TPC-H-ish corpus.
  *
  * Maps the reference's operator inventory (SURVEY.md §2) onto the
  * driver's synthetic tables. Each query is written Spark-first —
  * declarative DataFrame ops, decimal-exact aggregation (see
  * [[graft.Det]]), explicit broadcast hints for dimension joins — and is
  * paired with an independently-written DuckDB oracle.
  *
  * Scale notes are inline per query; the guiding rules:
  *  - dimension tables (region/nation/part/supplier at 100TB these stay
  *    small) are broadcast, so fact-side scans never shuffle for them;
  *  - aggregations rely on partial (map-side) aggregation, so shuffled
  *    bytes are #groups, not #rows;
  *  - final `orderBy` on small aggregated outputs only (never a full
  *    fact-table sort).
  */
object Relational {

  import Det._

  /** Q1 — pricing summary (SURVEY A1/A2/A7, M1/M6).
    * Scan → filter (pushed to parquet) → groupBy(2 low-card keys).
    * At 100TB: partial agg reduces each task to ≤6 groups before the
    * shuffle; shuffle volume is O(partitions × groups) — negligible.
    */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        avgMoney(col("l_quantity")).as("avg_qty"),
        avgMoney(col("l_extendedprice")).as("avg_price"),
        avgMoney(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1Oracle: String = """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  /** Q2 — filter + projection (SURVEY F1-F7, ST2, M).
    * Predicates and the 4-column projection reach the parquet scan
    * (PushedFilters + ReadSchema); no shuffle at all except the sort of
    * the (small) filtered result.
    */
  def q2FilterProject(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-02-01").cast("timestamp") &&
              col("l_discount") >= 0.07 && col("l_quantity") < 5)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").as("qty"),
        (dec2(col("l_extendedprice")) * dec2(col("l_discount")))
          .cast("double").as("disc_amount"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val q2Oracle: String = """
    SELECT l_orderkey, l_linenumber, l_quantity AS qty,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE) AS disc_amount
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-02-01'
      AND l_discount >= 0.07 AND l_quantity < 5
    ORDER BY l_orderkey, l_linenumber"""

  /** Q3 — join + aggregate + top-k (SURVEY J3/J5, A7, L3/L6).
    * customer is the small side of customer⋈orders → broadcast; the
    * orders⋈lineitem join shuffles on orderkey (both sides huge at
    * 100TB — that shuffle is inherent; AQE handles skew). Top-10 via
    * sort of the aggregated output only.
    */
  def q3TopOrders(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(s, dir)
    val li   = Tables.lineitem(s, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Oracle: String = """
    SELECT l_orderkey, o_orderdate,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10"""

  /** Q5 — multi-way join through the star (SURVEY J5).
    * region→nation→supplier/customer are all broadcast (tiny even at
    * 100TB); only orders⋈lineitem shuffles. Nation-level output: 25 rows.
    */
  def q5NationRevenue(s: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(s, dir)
    val cust   = Tables.customer(s, dir)
    val ord    = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1998-01-01").cast("timestamp"))
    val li     = Tables.lineitem(s, dir)
    val supp   = Tables.supplier(s, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey") &&
                             col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Oracle: String = """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name"""

  /** Q6 — forecast revenue change (SURVEY M1/M2 arithmetic, F).
    * Pure scan+filter+single-group agg: zero shuffle beyond the 1-row
    * partial-agg exchange.
    */
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
              col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
              col("l_quantity") < 24)
      .agg(sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
        .cast("double").as("revenue"))
  }

  val q6Oracle: String = """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""

  /** Anti join — customers with no orders (SURVEY F2, the skip-list
    * anti-join). customer side is smaller → it stays the probe side;
    * Spark plans a broadcast/shuffled hash anti depending on sizes.
    */
  def qAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val ord  = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val qAntiJoinOracle: String = """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate < TIMESTAMP '1996-01-01')
    ORDER BY c_custkey"""

  /** Semi join — customers having at least one open order (SURVEY F5/F6
    * existence probe; J3). Semi join never duplicates the probe side, so
    * no post-join dedup is needed.
    */
  def qSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val ord = Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
      .select(col("o_custkey"))
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  val qSemiJoinOracle: String = """
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment"""

  /** Window top-k — best order per customer (SURVEY W2: top-1-per-key,
    * the fuzzy-join selection pattern). One shuffle on the partition key;
    * rank computed streaming within sorted partitions.
    */
  def qWindowTopk(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val qWindowTopkOracle: String = """
    SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 2
    ORDER BY o_custkey, rn"""

  /** Window running sum — cumulative spend per customer (SURVEY W1:
    * per-group aggregate applied back to each row). Decimal running sum
    * keeps the prefix sums order-exact (frame order is total, so both
    * engines see identical prefixes).
    */
  def qWindowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("running_spend", sum(dec2(col("o_totalprice"))).over(w).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_day"), col("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val qWindowRunningOracle: String = """
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_day,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
    FROM orders
    ORDER BY o_custkey, o_orderkey"""

  /** Latest-wins dedup — the reference's upsert-head semantics (SURVEY
    * U1: probe by key, keep the row with the max date; ties broken
    * deterministically). At scale this is one shuffle on the upsert key.
    */
  def qDedupLatest(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("latest_day"),
        col("o_totalprice"))
      .orderBy(col("o_custkey"))
  }

  val qDedupLatestOracle: String = """
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS latest_day, o_totalprice FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders)
    WHERE rn = 1
    ORDER BY o_custkey"""

  /** Set ops — union ∪ / except (SURVEY SE1/SE2/SE3). */
  def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val big = cust.filter(col("c_acctbal") > 9000).select(col("c_custkey"))
    val bld = cust.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val auto = cust.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
    big.union(bld).distinct()
      .except(auto)
      .orderBy(col("c_custkey"))
  }

  val qSetOpsOracle: String = """
    SELECT c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_acctbal > 9000
      UNION
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    ORDER BY c_custkey"""

  /** Rollup — hierarchical totals (SURVEY §2.4 note: grouping-set surface
    * the reference lacks but the engine exposes).
    */
  def qRollup(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
           sum(dec2(col("l_quantity"))).cast("double").as("qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  val qRollupOracle: String = """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""

  /** Distinct aggregates (SURVEY §2.4 note). Exact distinct counts
    * per group — Spark expands distinct aggs into a two-phase plan.
    */
  def qDistinctAgg(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  val qDistinctAggOracle: String = """
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag"""

  /** Skew-ADAPTIVE fact-fact join (q38) — [[Scale.adaptiveSaltedJoin]]
    * as an oracle-gated operator: lineitem⋈orders on the order key
    * with heavy-key detection (exact pruned-column count, broadcast
    * hot set) choosing per-row whether to salt, then per-priority
    * revenue. The result is IDENTICAL to the plain inner join (salting
    * only re-keys the shuffle), which is exactly what the oracle
    * asserts — the skew-mitigation rewrite is a pure partitioning
    * change, verified, not trusted.
    *
    * Scale shape: a hot order key (one key carrying a disproportionate
    * share of fact rows) no longer lands on one reducer — its rows
    * spread over `saltFactor` tasks at the cost of replicating the
    * build side's matching rows per salt — while on an UNSKEWED corpus
    * (this one: ≤7 lineitems per order at every SF, far under the
    * 1M-row threshold ≈ one healthy task's share of fact rows) the
    * exchange degenerates to the plain join's, so nothing is
    * replicated and no replication tax is paid for insurance that
    * isn't needed. The always-salt variant stays available
    * ([[Scale.saltedJoin]], spec-pinned) as the a-priori-known-skew
    * tool; the hot path of THIS operator is spec-pinned on a
    * deterministic skewed fixture (identity to the plain join + hot
    * partition split). This is the manual fallback for skew AQE's
    * size-based splitter misses (many small rows under ONE key value).
    */
  def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o_orderkey"),
        col("l_extendedprice"), col("l_discount"))
    Scale.adaptiveSaltedJoin(li, orders, "o_orderkey", saltFactor = 4,
        skewThreshold = 1000000L, detectSampleRate = 0.02)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(dec2(col("l_extendedprice")) *
            (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  val qSaltedJoinOracle: String = """
    SELECT o_orderpriority, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""

  val all: Seq[GateQuery] = Seq(
    GateQuery("q1_pricing_summary", q1PricingSummary, Some(q1Oracle)),
    GateQuery("q2_filter_project", q2FilterProject, Some(q2Oracle)),
    GateQuery("q3_top_orders", q3TopOrders, Some(q3Oracle)),
    GateQuery("q5_nation_revenue", q5NationRevenue, Some(q5Oracle)),
    GateQuery("q6_forecast_revenue", q6ForecastRevenue, Some(q6Oracle)),
    GateQuery("q7_anti_join", qAntiJoin, Some(qAntiJoinOracle)),
    GateQuery("q8_semi_join", qSemiJoin, Some(qSemiJoinOracle)),
    GateQuery("q9_window_topk", qWindowTopk, Some(qWindowTopkOracle)),
    GateQuery("q10_window_running", qWindowRunning, Some(qWindowRunningOracle)),
    GateQuery("q11_dedup_latest", qDedupLatest, Some(qDedupLatestOracle)),
    GateQuery("q12_set_ops", qSetOps, Some(qSetOpsOracle)),
    GateQuery("q13_rollup", qRollup, Some(qRollupOracle)),
    GateQuery("q14_distinct_agg", qDistinctAgg, Some(qDistinctAggOracle)),
    GateQuery("q38_salted_join", qSaltedJoin, Some(qSaltedJoinOracle)),
  )
}
