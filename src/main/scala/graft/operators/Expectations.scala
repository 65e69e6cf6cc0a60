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

  /** Rule severity (r13, closing the r12 ADVICE finding): an INVARIANT
    * is a schema/consistency contract whose violation means the data is
    * broken — the promotion firewall blocks on it; a SCREEN is a
    * curation-policy rule DESIGNED to bite on real corpora (language
    * allow-lists, length ceilings) — its count is report material, not
    * a release blocker. Without the split, `graft-expect
    * --fail-on-violation` exited 2 on every real corpus and could not
    * distinguish broken invariants from intended screening.
    */
  sealed trait Severity
  case object Invariant extends Severity
  case object Screen extends Severity

  /** One expectation: `violations` must be an AGGREGATE expression
    * counting violating rows (0 = pass). `prepare` (r14) is the hook a
    * two-table rule uses to staple its context onto the evaluated
    * frame before the single aggregation pass — see [[referential]];
    * single-table rules leave it None and the frame unchanged.
    */
  final case class Rule(name: String, violations: Column,
      severity: Severity = Invariant,
      prepare: Option[DataFrame => DataFrame] = None) {
    // names are interpolated into a stack() expr string (quoted and
    // back-quoted) and into oracle SQL — restrict to identifier chars
    // so a quote/backtick can neither break the parse nor smuggle an
    // expression in through a rule name
    require(name.matches("[A-Za-z0-9_]+"),
      s"expectation name must match [A-Za-z0-9_]+, got: $name")
  }

  /** Row-predicate rule: counts rows where `violation` holds. */
  def rowRule(name: String, violation: Column,
      severity: Severity = Invariant): Rule =
    Rule(name, sum(when(violation, 1L).otherwise(0L)), severity)

  /** Column-uniqueness rule: counts surplus rows beyond the distinct
    * key count (0 = unique).
    */
  def unique(name: String, c: Column, severity: Severity = Invariant): Rule =
    Rule(name, count(c) - countDistinct(c), severity)

  /** Approximate uniqueness for the 100 TB regime: surplus estimate
    * from HLL (`approx_count_distinct`) instead of the exact
    * count-distinct, whose Expand doubles the scanned rows for the
    * pass (the price documented on [[unique]]). The HLL estimate
    * carries relative standard deviation `rsd`, so treat a small
    * surplus as noise: this is a monitoring rule (Screen), never an
    * exact gate — the swap is exactness for a single-scan sketch, the
    * q43/q30 trade. ExpectationsSpec pins the estimate against the
    * exact count within the configured rsd.
    */
  def uniqueApprox(name: String, c: Column, rsd: Double = 0.02): Rule =
    // clamp at 0: HLL may OVERestimate the distinct count, and a
    // negative surplus on a perfectly unique column would read as a
    // biting screen (pass = n === 0 is false for negatives)
    Rule(name, greatest(lit(0L), count(c) - approx_count_distinct(c, rsd)),
      Screen)

  /** Referential-integrity rule (r14 — the dbt `relationships` test,
    * the one firewall rule kind a single-table predicate cannot
    * express): counts non-null values of `fk` absent from `keys`'
    * single column. NULL fks are NOT violations (declare a separate
    * not-null rule if they should be — SQL FK semantics).
    *
    * Scale shape: `keys` is distinct-reduced and LEFT-joined onto the
    * evaluation frame as a presence marker, so the fact table is still
    * scanned ONCE for all rules and the violation is counted inside the
    * same single aggregation pass. The parent side after distinct is
    * key-sized — for real dimension tables Catalyst auto-broadcasts it
    * from parquet stats; a genuinely huge parent degrades to one
    * shuffled equi-join, never an all-pairs stage. The distinct join
    * key makes the join 1:1, so stapling any number of referential
    * rules multiplies no rows and perturbs no other rule's count.
    */
  def referential(name: String, fk: Column, keys: DataFrame,
      severity: Severity = Invariant): Rule = {
    require(keys.columns.length == 1,
      s"referential rule $name: keys frame must have exactly one column, " +
        s"got [${keys.columns.mkString(", ")}]")
    referentialLazy(name, fk, () => keys, severity)
  }

  /** [[referential]] with the parent frame supplied as a thunk, resolved
    * only when the rule set is EVALUATED (r15, closing the r14 ADVICE
    * items on RulePack): a declarative rule pack parses IO-free — no
    * file listing, no schema inference, no job — and a long-running
    * drop campaign re-resolves its parent tables at every evaluation,
    * so a dimension table updated mid-campaign is seen fresh instead of
    * snapshotted at parse. The prepare closure also rejects a marker
    * collision (`__ref_<name>` already a column of the evaluated frame)
    * as a clear declaration error rather than the ambiguous-column
    * AnalysisException the join would otherwise throw.
    */
  def referentialLazy(name: String, fk: Column, keys: () => DataFrame,
      severity: Severity = Invariant): Rule = {
    val marker = s"__ref_$name"
    Rule(name,
      sum(when(fk.isNotNull && col(marker).isNull, 1L).otherwise(0L)),
      severity,
      Some { df =>
        require(!df.columns.contains(marker),
          s"referential rule $name: the evaluated frame already has a " +
            s"column named '$marker' (the rule's presence marker) — " +
            "rename the column or the rule")
        val k = keys()
        require(k.columns.length == 1,
          s"referential rule $name: keys frame must have exactly one " +
            s"column, got [${k.columns.mkString(", ")}]")
        val dim = k.distinct().withColumnRenamed(k.columns.head, marker)
        df.join(dim, fk === col(marker), "left")
      })
  }

  /** Evaluate all rules in one aggregation pass:
    * (rule, n_violations, pass) sorted by rule name.
    */
  def evaluate(df: DataFrame, rules: Seq[Rule]): DataFrame =
    evaluateBy(df, rules, Nil)

  /** Evaluate all rules at the grain of `groupCols` in ONE groupBy
    * pass (r13, VERDICT #4): the release firewall's per-(split, source)
    * form — a rule can pass globally while one source is 100%
    * violating, and the global report cannot say WHICH partition to
    * block. The report is (groupCols..., rule, n_violations, pass),
    * sized rules × groups, never the corpus; uniqueness rules count
    * surplus WITHIN each group (per-partition key uniqueness — the
    * grain a partitioned snapshot actually promotes on).
    */
  def evaluateBy(df: DataFrame, rules: Seq[Rule],
      groupCols: Seq[String]): DataFrame = {
    require(rules.nonEmpty, "no expectations declared")
    require(rules.map(_.name).distinct.size == rules.size,
      "duplicate expectation names")
    require(groupCols.forall(g => rules.forall(_.name != g)),
      "a group column shares a name with a rule")
    // staple each two-table rule's context (a 1:1 marker join) onto the
    // frame; single-table rules contribute nothing here, so the common
    // case is still a bare scan → aggregate
    val prepared = rules.flatMap(_.prepare).foldLeft(df)((d, f) => f(d))
    val aggs = rules.map(r =>
      coalesce(r.violations, lit(0L)).cast("long").as(r.name))
    val wide =
      if (groupCols.isEmpty) prepared.agg(aggs.head, aggs.tail: _*)
      else prepared.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val stacked = rules.map(r => s"'${r.name}', `${r.name}`").mkString(", ")
    wide.select(groupCols.map(col) :+ expr(
        s"stack(${rules.size}, $stacked) as (rule, n_violations)"): _*)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy(groupCols.map(col) :+ col("rule"): _*)
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
    rowRule("lang_allowed", !col("lang").isin("en", "es", "de"), Screen),
    rowRule("length_ceiling", col("n_chars") > 400, Screen))

  /** The promotion-blocking subset of [[documentRules]] — what
    * `graft-expect --fail-on-violation` actually gates on.
    */
  def invariantDocumentRules: Seq[Rule] =
    documentRules.filter(_.severity == Invariant)

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

  /** t89: the same release rule set at the SOURCE grain (r13, VERDICT
    * #4) — one groupBy pass, report sized rules × sources. The corpus
    * makes this non-vacuous the same way t88 is: the screening rules'
    * violation counts differ per source, so the gate pins that the
    * grouped aggregation routes each violation to the right partition,
    * not just the right total.
    */
  def qExpectationsBySource(s: SparkSession, dir: String): DataFrame =
    evaluateBy(Tables.documents(s, dir), documentRules, Seq("source"))

  val qExpectationsBySourceOracle: String = """
    WITH a AS (
      SELECT source,
        SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS doc_id_not_null,
        COUNT(doc_id) - COUNT(DISTINCT doc_id) AS doc_id_unique,
        SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS text_not_null,
        SUM(CASE WHEN n_chars <> LENGTH(text) THEN 1 ELSE 0 END) AS n_chars_consistent,
        SUM(CASE WHEN source NOT LIKE 'src%' THEN 1 ELSE 0 END) AS source_naming,
        SUM(CASE WHEN lang NOT IN ('en', 'es', 'de') THEN 1 ELSE 0 END) AS lang_allowed,
        SUM(CASE WHEN n_chars > 400 THEN 1 ELSE 0 END) AS length_ceiling
      FROM documents GROUP BY source)
    SELECT source, rule, CAST(n_violations AS BIGINT) AS n_violations,
           n_violations = 0 AS pass
    FROM (
      SELECT source, 'doc_id_not_null' AS rule, COALESCE(doc_id_not_null, 0) AS n_violations FROM a
      UNION ALL SELECT source, 'doc_id_unique', COALESCE(doc_id_unique, 0) FROM a
      UNION ALL SELECT source, 'text_not_null', COALESCE(text_not_null, 0) FROM a
      UNION ALL SELECT source, 'n_chars_consistent', COALESCE(n_chars_consistent, 0) FROM a
      UNION ALL SELECT source, 'source_naming', COALESCE(source_naming, 0) FROM a
      UNION ALL SELECT source, 'lang_allowed', COALESCE(lang_allowed, 0) FROM a
      UNION ALL SELECT source, 'length_ceiling', COALESCE(length_ceiling, 0) FROM a)
    ORDER BY source, rule"""

  /** t90 (r14, VERDICT #4/#7): the DECLARATIVE rule-pack path — the
    * bundled JSON fixture (`resources/rulepacks/documents.json`)
    * parsed by [[RulePack]] and evaluated at the source grain. The
    * pack's rules deliberately differ from [[documentRules]] (an
    * en-only language screen, different length bounds), so the gate
    * pins that the counts come from the PARSED pack, not the compiled
    * set; the oracle re-states each JSON predicate independently in
    * SQL.
    */
  def qRulePack(s: SparkSession, dir: String): DataFrame =
    evaluateBy(Tables.documents(s, dir),
      RulePack.loadResource("/rulepacks/documents.json"), Seq("source"))

  val qRulePackOracle: String = """
    WITH a AS (
      SELECT source,
        SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS doc_id_not_null,
        COUNT(doc_id) - COUNT(DISTINCT doc_id) AS doc_id_unique,
        SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS text_not_null,
        SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS lang_en_only,
        SUM(CASE WHEN n_chars < 25 THEN 1 ELSE 0 END) AS tiny_doc,
        SUM(CASE WHEN n_chars > 300 THEN 1 ELSE 0 END) AS long_doc
      FROM documents GROUP BY source)
    SELECT source, rule, CAST(n_violations AS BIGINT) AS n_violations,
           n_violations = 0 AS pass
    FROM (
      SELECT source, 'doc_id_not_null' AS rule, COALESCE(doc_id_not_null, 0) AS n_violations FROM a
      UNION ALL SELECT source, 'doc_id_unique', COALESCE(doc_id_unique, 0) FROM a
      UNION ALL SELECT source, 'text_not_null', COALESCE(text_not_null, 0) FROM a
      UNION ALL SELECT source, 'lang_en_only', COALESCE(lang_en_only, 0) FROM a
      UNION ALL SELECT source, 'tiny_doc', COALESCE(tiny_doc, 0) FROM a
      UNION ALL SELECT source, 'long_doc', COALESCE(long_doc, 0) FROM a)
    ORDER BY source, rule"""

  /** t91 (r14): referential integrity over the events stream — the
    * two-table rule kind. One fk rule that PASSES (every event user is
    * a known customer: pins that the presence join actually finds the
    * keys), one against a FILTERED parent that BITES (users outside
    * the "active nation" customer subset — the dbt `relationships +
    * where` shape, corpus-derived non-zero count at every scale), plus
    * a not-null rule pinning the NULL-fk-is-not-a-violation contract's
    * other half. Both parents broadcast from parquet stats; the events
    * scan stays single-pass.
    */
  def eventRules(s: SparkSession, dir: String): Seq[Rule] = Seq(
    rowRule("user_id_not_null", col("user_id").isNull),
    referential("user_known_customer", col("user_id"),
      Tables.customer(s, dir).select(col("c_custkey"))),
    referential("user_active_nation", col("user_id"),
      Tables.customer(s, dir).filter(col("c_nationkey") < 10)
        .select(col("c_custkey")), Screen))

  def qReferential(s: SparkSession, dir: String): DataFrame =
    evaluate(Tables.events(s, dir), eventRules(s, dir))

  val qReferentialOracle: String = """
    WITH a AS (
      SELECT
        SUM(CASE WHEN e.user_id IS NULL THEN 1 ELSE 0 END) AS user_id_not_null,
        SUM(CASE WHEN e.user_id IS NOT NULL AND k.ck IS NULL THEN 1 ELSE 0 END) AS user_known_customer,
        SUM(CASE WHEN e.user_id IS NOT NULL AND act.ck IS NULL THEN 1 ELSE 0 END) AS user_active_nation
      FROM events e
      LEFT JOIN (SELECT DISTINCT c_custkey AS ck FROM customer) k
        ON e.user_id = k.ck
      LEFT JOIN (SELECT DISTINCT c_custkey AS ck FROM customer
                 WHERE c_nationkey < 10) act
        ON e.user_id = act.ck)
    SELECT rule, CAST(n_violations AS BIGINT) AS n_violations,
           n_violations = 0 AS pass
    FROM (
      SELECT 'user_id_not_null' AS rule, COALESCE(user_id_not_null, 0) AS n_violations FROM a
      UNION ALL SELECT 'user_known_customer', COALESCE(user_known_customer, 0) FROM a
      UNION ALL SELECT 'user_active_nation', COALESCE(user_active_nation, 0) FROM a)
    ORDER BY rule"""

  val all: Seq[GateQuery] = Seq(
    GateQuery("t88_expectations", qExpectations, Some(qExpectationsOracle)),
    GateQuery("t89_expectations_by_source", qExpectationsBySource,
      Some(qExpectationsBySourceOracle)),
    GateQuery("t90_rulepack", qRulePack, Some(qRulePackOracle)),
    GateQuery("t91_referential", qReferential, Some(qReferentialOracle)))
}
