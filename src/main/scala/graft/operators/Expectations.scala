package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Declarative data-quality expectations — the promotion firewall a
  * recurring corpus pipeline runs before releasing a snapshot (the
  * dbt-test / Great-Expectations shape, Spark-native): a rule set is
  * declared as named violation-count aggregates and evaluated in ONE
  * aggregation pass over the table; the report is one row per rule
  * (rule, n_violations, pass), sized by the rule count, never the
  * corpus.
  *
  * Scale shape: row rules are `sum(when(pred, 1))` — map-side combined,
  * no shuffle beyond the single-row final aggregate; a uniqueness rule
  * adds `count − count(distinct)`, whose Expand doubles scanned rows
  * for that pass (the documented price of exact duplicate counting —
  * q30's HLL is the approximate alternative when 2× scan matters).
  * The wide single-row aggregate un-pivots to the per-rule report via
  * `stack` in-row. Nothing collects; the report is rules-sized.
  */
object Expectations {

  /** One expectation: `violations` must be an AGGREGATE expression
    * counting violating rows (0 = pass).
    */
  final case class Rule(name: String, violations: Column)

  /** Row-predicate rule: counts rows where `violation` holds. */
  def rowRule(name: String, violation: Column): Rule =
    Rule(name, sum(when(violation, 1L).otherwise(0L)))

  /** Column-uniqueness rule: counts surplus rows beyond the distinct
    * key count (0 = unique).
    */
  def unique(name: String, c: Column): Rule =
    Rule(name, count(c) - countDistinct(c))

  /** Evaluate all rules in one aggregation pass:
    * (rule, n_violations, pass) sorted by rule name.
    */
  def evaluate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no expectations declared")
    require(rules.map(_.name).distinct.size == rules.size,
      "duplicate expectation names")
    val wide = df.agg(
      coalesce(rules.head.violations, lit(0L)).cast("long").as(rules.head.name),
      rules.tail.map(r =>
        coalesce(r.violations, lit(0L)).cast("long").as(r.name)): _*)
    val stacked = rules.map(r => s"'${r.name}', `${r.name}`").mkString(", ")
    wide.select(expr(
        s"stack(${rules.size}, $stacked) as (rule, n_violations)"))
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy(col("rule"))
  }

  /** The documents-table release rule set (t88): schema invariants that
    * must hold (ids present and unique, text present, the stored
    * n_chars consistent with the text, source naming) plus two
    * screening rules that intentionally BITE on this corpus — language
    * allow-list and a length ceiling — so the gate pins non-zero
    * corpus-derived violation counts, not a vacuous column of zeros.
    */
  def documentRules: Seq[Rule] = Seq(
    rowRule("doc_id_not_null", col("doc_id").isNull),
    unique("doc_id_unique", col("doc_id")),
    rowRule("text_not_null", col("text").isNull),
    rowRule("n_chars_consistent", col("n_chars") =!= length(col("text"))),
    rowRule("source_naming", !col("source").startsWith("src")),
    rowRule("lang_allowed", !col("lang").isin("en", "es", "de")),
    rowRule("length_ceiling", col("n_chars") > 400))

  def qExpectations(s: SparkSession, dir: String): DataFrame =
    evaluate(Tables.documents(s, dir), documentRules)

  val qExpectationsOracle: String = """
    WITH a AS (
      SELECT
        SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS doc_id_not_null,
        COUNT(doc_id) - COUNT(DISTINCT doc_id) AS doc_id_unique,
        SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS text_not_null,
        SUM(CASE WHEN n_chars <> LENGTH(text) THEN 1 ELSE 0 END) AS n_chars_consistent,
        SUM(CASE WHEN source NOT LIKE 'src%' THEN 1 ELSE 0 END) AS source_naming,
        SUM(CASE WHEN lang NOT IN ('en', 'es', 'de') THEN 1 ELSE 0 END) AS lang_allowed,
        SUM(CASE WHEN n_chars > 400 THEN 1 ELSE 0 END) AS length_ceiling
      FROM documents)
    SELECT rule, CAST(n_violations AS BIGINT) AS n_violations,
           n_violations = 0 AS pass
    FROM (
      SELECT 'doc_id_not_null' AS rule, COALESCE(doc_id_not_null, 0) AS n_violations FROM a
      UNION ALL SELECT 'doc_id_unique', COALESCE(doc_id_unique, 0) FROM a
      UNION ALL SELECT 'text_not_null', COALESCE(text_not_null, 0) FROM a
      UNION ALL SELECT 'n_chars_consistent', COALESCE(n_chars_consistent, 0) FROM a
      UNION ALL SELECT 'source_naming', COALESCE(source_naming, 0) FROM a
      UNION ALL SELECT 'lang_allowed', COALESCE(lang_allowed, 0) FROM a
      UNION ALL SELECT 'length_ceiling', COALESCE(length_ceiling, 0) FROM a)
    ORDER BY rule"""

  val all: Seq[GateQuery] = Seq(
    GateQuery("t88_expectations", qExpectations, Some(qExpectationsOracle)))
}
