package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.{Tables, Det}

/** Scalar-function query pack: strings, dates, math heuristics, JSON,
  * array shredding, time bucketing, classification and an as-of join —
  * the SURVEY §2.8 scalar families exercised over the synthetic corpus.
  *
  * Everything here is a narrow per-row computation followed by a small
  * aggregation or an ordered projection: at 100 TB these plans are
  * scan-bound with whole-stage codegen end-to-end (no UDFs — every
  * expression is a built-in Catalyst expression).
  */
object Scalar {

  import Det._

  private def dec6(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 6))

  /** String functions (SURVEY ST1-ST11): normalization chains, token
    * split, first/last token, concat — the bank/fund-name normalization
    * shapes from the reference, applied to part names.
    */
  def qStringFuncs(s: SparkSession, dir: String): DataFrame = {
    val words = split(col("p_name"), " ")
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lower"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowels"),
        size(words).cast("long").as("n_tokens"),
        element_at(words, 1).as("first_token"),
        element_at(words, -1).as("last_token"),
        upper(trim(col("p_brand"))).as("brand_up"),
        concat_ws("|", col("p_type"), col("p_brand")).as("type_brand"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_name"), 1, 4).as("name_pfx"))
      .orderBy(col("p_partkey"))
  }

  val qStringFuncsOracle: String = """
    SELECT p_partkey,
           LOWER(p_name) AS name_lower,
           REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS name_novowels,
           LEN(STRING_SPLIT(p_name, ' ')) AS n_tokens,
           STRING_SPLIT(p_name, ' ')[1] AS first_token,
           STRING_SPLIT(p_name, ' ')[-1] AS last_token,
           UPPER(TRIM(p_brand)) AS brand_up,
           CONCAT_WS('|', p_type, p_brand) AS type_brand,
           LENGTH(p_name) AS name_len,
           SUBSTRING(p_name, 1, 4) AS name_pfx
    FROM part
    ORDER BY p_partkey"""

  /** Date functions (SURVEY D1-D5 family): extraction, truncation,
    * arithmetic, per-month aggregation.
    */
  def qDateFuncs(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      .withColumn("o_year", year(col("o_orderdate")))
      .withColumn("o_month", month(col("o_orderdate")))
      .groupBy(col("o_year"), col("o_month"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("o_orderdate").cast("date")).as("first_day"),
        max(col("o_orderdate").cast("date")).as("last_seen"),
        sumMoney(col("o_totalprice")).as("month_value"))
      .withColumn("month_start",
        make_date(col("o_year"), col("o_month"), lit(1)))
      .withColumn("next_month", add_months(col("month_start"), 1))
      .orderBy(col("o_year"), col("o_month"))
  }

  val qDateFuncsOracle: String = """
    SELECT YEAR(o_orderdate) AS o_year, MONTH(o_orderdate) AS o_month,
           COUNT(*) AS n_orders,
           MIN(CAST(o_orderdate AS DATE)) AS first_day,
           MAX(CAST(o_orderdate AS DATE)) AS last_seen,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS month_value,
           MAKE_DATE(YEAR(o_orderdate), MONTH(o_orderdate), 1) AS month_start,
           CAST(MAKE_DATE(YEAR(o_orderdate), MONTH(o_orderdate), 1) + INTERVAL 1 MONTH AS DATE) AS next_month
    FROM orders
    GROUP BY YEAR(o_orderdate), MONTH(o_orderdate)
    ORDER BY o_year, o_month"""

  /** Percent-normalization heuristic (SURVEY M1/M2): values arrive
    * either as fractions (0.05) or ×100 (5.0); |v| > 1 → divide by 100.
    * Mirrors `_convertir_si_es_necesario`. The mixed-format input is
    * synthesized deterministically from the row key.
    */
  def qPercentNormalize(s: SparkSession, dir: String): DataFrame = {
    val mixed = when(col("l_orderkey") % 2 === 0, col("l_tax") * 100)
      .otherwise(col("l_tax"))
    Tables.lineitem(s, dir)
      .withColumn("v", mixed)
      .withColumn("pct", when(abs(col("v")) > 1.0, col("v") / 100).otherwise(col("v")))
      .withColumn("converted", (abs(col("v")) > 1.0).cast("int"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(dec6(col("pct"))).cast("double").as("sum_pct"),
        sum(col("converted")).as("n_converted"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  val qPercentNormalizeOracle: String = """
    WITH m AS (
      SELECT l_returnflag,
             CASE WHEN l_orderkey % 2 = 0 THEN l_tax * 100 ELSE l_tax END AS v
      FROM lineitem)
    SELECT l_returnflag,
           CAST(SUM(CAST(CASE WHEN ABS(v) > 1.0 THEN v / 100 ELSE v END AS DECIMAL(18,6))) AS DOUBLE) AS sum_pct,
           CAST(SUM(CASE WHEN ABS(v) > 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           COUNT(*) AS n
    FROM m
    GROUP BY l_returnflag
    ORDER BY l_returnflag"""

  /** Monetary rescale (SURVEY M3): divide by 1000 while the value
    * exceeds 1e6 — the reference's `limpiar_valor` loop, expressed as a
    * bounded when-chain so it stays codegen'd. All arithmetic is integer
    * cents (2-dp money × bigint key), so every step — including the
    * truncating integer division — is bit-exact in any engine.
    */
  def qMonetaryRescale(s: SparkSession, dir: String): DataFrame = {
    val cents = round(col("o_totalprice") * 100).cast("long")
    Tables.orders(s, dir)
      .withColumn("v0", cents * col("o_orderkey"))
      .withColumn("v1", when(col("v0") > 100000000L, expr("v0 div 1000")).otherwise(col("v0")))
      .withColumn("v2", when(col("v1") > 100000000L, expr("v1 div 1000")).otherwise(col("v1")))
      .withColumn("scaled_cents",
        when(col("v2") > 100000000L, expr("v2 div 1000")).otherwise(col("v2")))
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(col("scaled_cents")).as("sum_scaled_cents"),
        max(col("scaled_cents")).as("max_scaled_cents"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
  }

  val qMonetaryRescaleOracle: String = """
    WITH a AS (SELECT o_orderstatus,
                      CAST(ROUND(o_totalprice * 100) AS BIGINT) * o_orderkey AS v0
               FROM orders),
    b AS (SELECT o_orderstatus, CASE WHEN v0 > 100000000 THEN v0 // 1000 ELSE v0 END AS v1 FROM a),
    c AS (SELECT o_orderstatus, CASE WHEN v1 > 100000000 THEN v1 // 1000 ELSE v1 END AS v2 FROM b),
    d AS (SELECT o_orderstatus, CASE WHEN v2 > 100000000 THEN v2 // 1000 ELSE v2 END AS scaled_cents FROM c)
    SELECT o_orderstatus,
           CAST(SUM(scaled_cents) AS BIGINT) AS sum_scaled_cents,
           MAX(scaled_cents) AS max_scaled_cents,
           COUNT(*) AS n
    FROM d
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus"""

  /** JSON extraction (SURVEY AR5): pull a field out of the events
    * `props` JSON string, bucket it, aggregate. `get_json_object` is a
    * native Catalyst expression (no UDF). The oracle parses with a
    * regexp — independent implementations, same result.
    */
  def qJsonExtract(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("k_bucket", col("k") % 10)
      .groupBy(col("k_bucket"))
      .agg(
        count(lit(1)).as("n"),
        sumMoney(col("value")).as("sum_value"),
        max(col("k")).as("max_k"))
      .orderBy(col("k_bucket"))
  }

  val qJsonExtractOracle: String = """
    WITH e AS (
      SELECT CAST(REGEXP_EXTRACT(props, '"k": (\d+)', 1) AS INT) AS k, value
      FROM events)
    SELECT k % 10 AS k_bucket, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           MAX(k) AS max_k
    FROM e
    GROUP BY k % 10
    ORDER BY k_bucket"""

  /** Explode/shred (SURVEY U3-U7, AR4): split documents into words,
    * explode, count — the child-table shredding shape. Narrow explode +
    * one partial-agg'd shuffle on the word key.
    */
  def qExplodeWords(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)
  }

  val qExplodeWordsOracle: String = """
    SELECT word, COUNT(*) AS n FROM (
      SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 20"""

  /** Time-bucket aggregation (SURVEY §2.10 batch shape of the streaming
    * surface): tumbling 1-hour windows over event time. In streaming
    * mode the same expression runs under `readStream` + watermark (see
    * graft.streaming); semantics here are identical by construction.
    */
  def qTimeBuckets(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .withColumn("hour", date_trunc("hour", col("ts")))
      .groupBy(col("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sumMoney(col("value")).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .filter(col("hour") < lit("2024-01-03 00:00:00").cast("timestamp"))
      .orderBy(col("hour"), col("event_type"))
  }

  val qTimeBucketsOracle: String = """
    SELECT DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    HAVING hour < TIMESTAMP '2024-01-03 00:00:00'
    ORDER BY hour, event_type"""

  /** Keyword-vote classification (SURVEY A3/ST11): classify rows by
    * keyword containment with deterministic precedence — the fund-type
    * classifier shape.
    */
  def qClassify(s: SparkSession, dir: String): DataFrame = {
    val name = col("p_name")
    val kind = when(name.contains("widget"), "widget")
      .when(name.contains("bolt"), "bolt")
      .when(name.contains("gear"), "gear")
      .otherwise("other")
    val size = when(col("p_type").isin("SMALL", "ECONOMY"), "compact")
      .when(col("p_type").isin("LARGE", "STANDARD"), "full")
      .otherwise("mid")
    Tables.part(s, dir)
      .withColumn("kind", kind).withColumn("size_class", size)
      .groupBy(col("kind"), col("size_class"))
      .agg(count(lit(1)).as("n"),
        sumMoney(col("p_retailprice")).as("sum_price"))
      .orderBy(col("kind"), col("size_class"))
  }

  val qClassifyOracle: String = """
    WITH t AS (
      SELECT CASE WHEN CONTAINS(p_name, 'widget') THEN 'widget'
                  WHEN CONTAINS(p_name, 'bolt') THEN 'bolt'
                  WHEN CONTAINS(p_name, 'gear') THEN 'gear'
                  ELSE 'other' END AS kind,
             CASE WHEN p_type IN ('SMALL','ECONOMY') THEN 'compact'
                  WHEN p_type IN ('LARGE','STANDARD') THEN 'full'
                  ELSE 'mid' END AS size_class,
             p_retailprice
      FROM part)
    SELECT kind, size_class, COUNT(*) AS n,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM t
    GROUP BY kind, size_class
    ORDER BY kind, size_class"""

  /** As-of join (beyond-reference custom operator): for each purchase,
    * the most recent signup of the same user at-or-before its timestamp.
    *
    * Spark lacks a batch as-of join; the scalable composition is
    * union(tagged streams) → one window over (user, time) carrying the
    * last-seen signup timestamp forward. Exactly ONE shuffle on user_id
    * — no range-join explosion, no per-key collect; this survives 100 TB
    * because state per row is O(1). The oracle uses DuckDB's native
    * ASOF JOIN as an independent implementation.
    */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("signup_ts"),
        col("event_id").as("signup_event_id"))
    AsOfJoin.backward(purchases, signups, Seq("user_id"),
        leftTs = "ts", rightTs = "signup_ts",
        payload = Seq("signup_ts"), tieBreak = Seq("signup_event_id"))
      .select(col("event_id"), col("user_id"), col("ts"), col("signup_ts"))
      .orderBy(col("event_id"))
  }

  val qAsofJoinOracle: String = """
    WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
               FROM events WHERE event_type IN ('signup','purchase')),
    p AS (SELECT * FROM e WHERE event_type = 'purchase'),
    s AS (SELECT user_id, ts AS signup_ts FROM e WHERE event_type = 'signup')
    SELECT p.event_id, p.user_id, p.ts, s.signup_ts
    FROM p ASOF LEFT JOIN s
      ON p.user_id = s.user_id AND p.ts >= s.signup_ts
    ORDER BY p.event_id"""

  /** Forward as-of (q32): for each signup, the user's FIRST purchase
    * at-or-after it — the activation-latency join. Same single-shuffle
    * [[AsOfJoin]] plan in the opposite direction; the payload is the
    * timestamp alone so duplicate same-instant purchases cannot make
    * the hash depend on which row an engine picks (q23's discipline).
    */
  def qAsofForward(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_event_id"))
    AsOfJoin.forward(signups, purchases, Seq("user_id"),
        leftTs = "ts", rightTs = "purchase_ts",
        payload = Seq("purchase_ts"), tieBreak = Seq("purchase_event_id"))
      .select(col("event_id"), col("user_id"), col("ts"), col("purchase_ts"))
      .orderBy(col("event_id"))
  }

  val qAsofForwardOracle: String = """
    WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
               FROM events WHERE event_type IN ('signup','purchase')),
    s AS (SELECT * FROM e WHERE event_type = 'signup'),
    p AS (SELECT user_id, ts AS purchase_ts FROM e WHERE event_type = 'purchase')
    SELECT s.event_id, s.user_id, s.ts, p.purchase_ts
    FROM s ASOF LEFT JOIN p
      ON s.user_id = p.user_id AND s.ts <= p.purchase_ts
    ORDER BY s.event_id"""

  /** High-cardinality aggregation (SURVEY A4/A8 shape + skew note §7):
    * per-user stats then top-k. The groupBy shuffles on user_id; AQE
    * skew handling splits oversized partitions at scale.
    */
  def qUserStats(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sumMoney(col("value")).as("total_value"),
        max(col("ts")).as("last_seen"),
        countDistinct(col("event_type")).as("n_types"))
      .orderBy(col("n_events").desc, col("user_id"))
      .limit(25)
  }

  val qUserStatsOracle: String = """
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           MAX(CAST(ts AS TIMESTAMP)) AS last_seen,
           COUNT(DISTINCT event_type) AS n_types
    FROM events
    GROUP BY user_id
    ORDER BY n_events DESC, user_id
    LIMIT 25"""

  val all: Seq[GateQuery] = Seq(
    GateQuery("q15_string_funcs", qStringFuncs, Some(qStringFuncsOracle)),
    GateQuery("q16_date_funcs", qDateFuncs, Some(qDateFuncsOracle)),
    GateQuery("q17_percent_normalize", qPercentNormalize, Some(qPercentNormalizeOracle)),
    GateQuery("q18_monetary_rescale", qMonetaryRescale, Some(qMonetaryRescaleOracle)),
    GateQuery("q19_json_extract", qJsonExtract, Some(qJsonExtractOracle)),
    GateQuery("q20_explode_words", qExplodeWords, Some(qExplodeWordsOracle)),
    GateQuery("q21_time_buckets", qTimeBuckets, Some(qTimeBucketsOracle)),
    GateQuery("q22_classify", qClassify, Some(qClassifyOracle)),
    GateQuery("q23_asof_join", qAsofJoin, Some(qAsofJoinOracle)),
    GateQuery("q32_asof_forward", qAsofForward, Some(qAsofForwardOracle)),
    GateQuery("q24_user_stats", qUserStats, Some(qUserStatsOracle)),
  )
}
