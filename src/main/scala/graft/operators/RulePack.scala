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
  * }}}
  *
  * Fields: `name` (required, `[A-Za-z0-9_]+` — enforced by
  * [[Expectations.Rule]] so a name can't smuggle SQL into the stack()
  * expr), `severity` (`invariant` default | `screen`), and EXACTLY ONE
  * of `predicate` (SQL boolean, TRUE = the row violates), `unique`
  * (column whose surplus beyond distinct counts), or `unique_approx`
  * (HLL surplus, optional `rsd`, Screen-only — a sketch estimate must
  * never gate promotion).
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

  private def strField(node: com.fasterxml.jackson.databind.JsonNode,
      field: String): Option[String] =
    if (!node.hasNonNull(field)) None
    else if (!node.get(field).isTextual)
      bad(s"rule pack field '$field' must be a JSON string: ${node.get(field)}")
    else Some(node.get(field).asText())

  private def parseLine(line: String): Expectations.Rule = {
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
    (pred, uniq, uniqA) match {
      case (Some(p), None, None) => Expectations.rowRule(name, expr(p), sev)
      case (None, Some(c), None) => Expectations.unique(name, col(c), sev)
      case (None, None, Some(c)) =>
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
      case _ => bad(
        s"rule $name: exactly one of predicate | unique | unique_approx required")
    }
  }

  /** Parse JSON-lines rule declarations (blank lines skipped). */
  def parse(jsonLines: Seq[String]): Seq[Expectations.Rule] = {
    val lines = jsonLines.map(_.trim).filter(_.nonEmpty)
    if (lines.isEmpty) bad("rule pack declares no rules")
    lines.map(parseLine)
  }

  /** Load a rule pack from a file (local or any Hadoop-visible path —
    * the session is only used to resolve the filesystem, no job runs).
    */
  def load(spark: SparkSession, path: String): Seq[Expectations.Rule] = {
    val fs = graft.streaming.StreamingState.fsFor(spark, path)
    val in = fs.open(new org.apache.hadoop.fs.Path(path))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    parse(text.split("\n").toSeq)
  }

  /** Load a rule pack bundled on the classpath (the t90 gate fixture). */
  def loadResource(resource: String): Seq[Expectations.Rule] = {
    val in = Option(getClass.getResourceAsStream(resource)).getOrElse(
      bad(s"rule pack resource not found: $resource"))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    parse(text.split("\n").toSeq)
  }
}
