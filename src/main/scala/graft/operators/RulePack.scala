package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Declarative expectation rule packs (r14, VERDICT #4/#7): the
  * [[Expectations]] firewall loaded from a JSON-lines file instead of
  * recompiled Scala, so a deployment ships its own release rules as
  * config — the dbt-test / Great-Expectations "rules are data" shape.
  *
  * One rule per line, e.g.:
  * {{{
  *   {"name": "doc_id_not_null", "predicate": "doc_id IS NULL"}
  *   {"name": "doc_id_unique",   "unique": "doc_id"}
  *   {"name": "lang_en_only",    "predicate": "lang <> 'en'", "severity": "screen"}
  *   {"name": "ids_unique_approx", "unique_approx": "doc_id", "rsd": 0.01}
  *   {"name": "user_known", "fk": "user_id", "ref_table": "customer", "ref_key": "c_custkey"}
  * }}}
  *
  * Fields: `name` (required, `[A-Za-z0-9_]+` — enforced by
  * [[Expectations.Rule]] so a name can't smuggle SQL into the stack()
  * expr), `severity` (`invariant` default | `screen`), and EXACTLY ONE
  * of `predicate` (SQL boolean, TRUE = the row violates), `unique`
  * (column whose surplus beyond distinct counts), `unique_approx`
  * (HLL surplus, optional `rsd`, Screen-only — a sketch estimate must
  * never gate promotion), or `fk` (referential integrity: the fk
  * column, with required `ref_table`/`ref_key` naming the parent and
  * an optional `ref_filter` SQL predicate restricting it — the dbt
  * `relationships + where` shape). Any field outside the matched
  * kind's allowlist is a loud parse error — a typo'd `ref_filter` or a
  * field mixed in from another kind must never silently weaken a rule.
  * `fk` rules need the caller to pass a table resolver (the CLI wires
  * the run's tables directory); a pack declaring one without a
  * resolver fails loudly at first EVALUATION (resolution is deferred
  * into the rule's prepare hook, so parsing itself stays IO-free).
  *
  * Parsing is DRIVER-SIDE Jackson (the JSON library Spark itself
  * ships) — a rule pack is tiny config, and parsing it must not run a
  * Spark job: the t90 gate builds its frame at catalog-registration
  * time, which SqlSurfaceSpec pins job-free. Every malformed line is a
  * LOUD error, never a silently skipped rule (a skipped invariant is a
  * firewall hole); the predicate string goes through `expr(...)`,
  * which analysis-checks it against the table at evaluate time.
  */
object RulePack {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def bad(msg: String): Nothing = throw new IllegalArgumentException(msg)

  /** What a pack with no `fk` rules gets by default: a resolver that
    * refuses, so a referential rule can never be silently dropped.
    */
  val noResolver: String => org.apache.spark.sql.DataFrame = t =>
    bad(s"rule pack declares an fk rule against table '$t' but the " +
      "caller supplied no table resolver (graft-expect resolves against " +
      "--in; graft-drop needs --ref-dir)")

  private def strField(node: com.fasterxml.jackson.databind.JsonNode,
      field: String): Option[String] =
    if (!node.hasNonNull(field)) None
    else if (!node.get(field).isTextual)
      bad(s"rule pack field '$field' must be a JSON string: ${node.get(field)}")
    else Some(node.get(field).asText())

  /** Per-kind field allowlists: a typo'd field (`ref_filter` →
    * `where`), or a field from ANOTHER kind mixed in (`predicate` +
    * `ref_table`, `rsd` on an fk rule), must be a loud parse error —
    * otherwise the pack parses as some narrower rule and the dropped
    * field silently weakens the firewall (r14 ADVICE, medium).
    */
  private val kindFields: Map[String, Set[String]] = Map(
    "predicate"     -> Set("predicate"),
    "unique"        -> Set("unique"),
    "unique_approx" -> Set("unique_approx", "rsd"),
    "fk"            -> Set("fk", "ref_table", "ref_key", "ref_filter"))

  private def requireFields(node: com.fasterxml.jackson.databind.JsonNode,
      name: String, kind: String): Unit = {
    val allowed = kindFields(kind) ++ Set("name", "severity")
    val fields = {
      val it = node.fieldNames()
      val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
    val extra = fields.filterNot(allowed)
    if (extra.nonEmpty) bad(
      s"rule $name: unexpected field(s) [${extra.mkString(", ")}] for a " +
        s"'$kind' rule — allowed: ${allowed.toSeq.sorted.mkString(", ")}")
  }

  private def parseLine(line: String,
      resolve: String => org.apache.spark.sql.DataFrame): Expectations.Rule = {
    val node =
      try mapper.readTree(line)
      catch { case e: com.fasterxml.jackson.core.JacksonException =>
        bad(s"Malformed rule pack line (${e.getOriginalMessage}): $line") }
    if (node == null || !node.isObject)
      bad(s"Malformed rule pack line (not a JSON object): $line")
    val name = strField(node, "name").getOrElse(
      bad(s"rule pack entry missing 'name': $line"))
    val sevField = strField(node, "severity")
    val sev = sevField.getOrElse("invariant") match {
      case "invariant" => Expectations.Invariant
      case "screen"    => Expectations.Screen
      case other => bad(
        s"rule $name: unknown severity '$other' (expected invariant|screen)")
    }
    val pred = strField(node, "predicate")
    val uniq = strField(node, "unique")
    val uniqA = strField(node, "unique_approx")
    val fk = strField(node, "fk")
    (pred, uniq, uniqA, fk) match {
      case (Some(p), None, None, None) =>
        requireFields(node, name, "predicate")
        Expectations.rowRule(name, expr(p), sev)
      case (None, Some(c), None, None) =>
        requireFields(node, name, "unique")
        Expectations.unique(name, col(c), sev)
      case (None, None, Some(c), None) =>
        requireFields(node, name, "unique_approx")
        if (sev == Expectations.Invariant && sevField.isDefined)
          bad(s"rule $name: unique_approx is an HLL estimate and cannot be an " +
            "invariant — drop the severity field (it is Screen by contract) " +
            "or use 'unique' for an exact gate")
        val rsd =
          if (!node.hasNonNull("rsd")) 0.02
          else if (!node.get("rsd").isNumber)
            bad(s"rule $name: 'rsd' must be a number: ${node.get("rsd")}")
          else node.get("rsd").asDouble()
        Expectations.uniqueApprox(name, col(c), rsd)
      case (None, None, None, Some(fkCol)) =>
        requireFields(node, name, "fk")
        val refTable = strField(node, "ref_table").getOrElse(
          bad(s"rule $name: fk rule requires 'ref_table'"))
        val refKey = strField(node, "ref_key").getOrElse(
          bad(s"rule $name: fk rule requires 'ref_key'"))
        val refFilter = strField(node, "ref_filter")
        // parent resolution is DEFERRED into the rule's prepare hook
        // (referentialLazy): parsing a pack stays IO-free — no file
        // listing, no schema inference — and a long-running drop
        // campaign sees parent-table updates at every evaluation
        // instead of a parse-time snapshot
        Expectations.referentialLazy(name, col(fkCol), () => {
          val parent = resolve(refTable)
          val filtered = refFilter
            .map(f => parent.filter(expr(f))).getOrElse(parent)
          filtered.select(col(refKey))
        }, sev)
      case _ => bad(
        s"rule $name: exactly one of predicate | unique | unique_approx | fk required")
    }
  }

  /** Parse JSON-lines rule declarations (blank lines skipped).
    * `resolve` maps an fk rule's `ref_table` name to its DataFrame.
    * It is NOT called here: resolution happens inside the rule's
    * prepare hook at each evaluation, so parsing runs no IO (no file
    * listing, no schema-inference job) and a drop campaign re-reads
    * updated parents fresh per drop.
    */
  def parse(jsonLines: Seq[String],
      resolve: String => org.apache.spark.sql.DataFrame = noResolver)
      : Seq[Expectations.Rule] = {
    val lines = jsonLines.map(_.trim).filter(_.nonEmpty)
    if (lines.isEmpty) bad("rule pack declares no rules")
    lines.map(parseLine(_, resolve))
  }

  /** Load a rule pack from a file (local or any Hadoop-visible path —
    * the session is only used to resolve the filesystem, no job runs).
    */
  def load(spark: SparkSession, path: String,
      resolve: String => org.apache.spark.sql.DataFrame = noResolver)
      : Seq[Expectations.Rule] = {
    val fs = graft.streaming.StreamingState.fsFor(spark, path)
    val in = fs.open(new org.apache.hadoop.fs.Path(path))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    parse(text.split("\n").toSeq, resolve)
  }

  /** Load a rule pack bundled on the classpath (the t90 gate fixture). */
  def loadResource(resource: String,
      resolve: String => org.apache.spark.sql.DataFrame = noResolver)
      : Seq[Expectations.Rule] = {
    val in = Option(getClass.getResourceAsStream(resource)).getOrElse(
      bad(s"rule pack resource not found: $resource"))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    parse(text.split("\n").toSeq, resolve)
  }
}
