package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  * Parsing is Spark's own JSON reader in FAILFAST mode (a malformed
  * line is a loud error, not a silently skipped rule) against an
  * explicit schema, so an unknown field is ignored but a mistyped one
  * fails; the predicate string goes through `expr(...)`, which
  * analysis-checks it against the table at evaluate time.
  */
object RulePack {

  private val schema = StructType(Seq(
    StructField("name", StringType, nullable = true),
    StructField("severity", StringType, nullable = true),
    StructField("predicate", StringType, nullable = true),
    StructField("unique", StringType, nullable = true),
    StructField("unique_approx", StringType, nullable = true),
    StructField("rsd", DoubleType, nullable = true)))

  /** Parse JSON-lines rule declarations (blank lines skipped). */
  def parse(spark: SparkSession, jsonLines: Seq[String]): Seq[Expectations.Rule] = {
    import spark.implicits._
    val lines = jsonLines.map(_.trim).filter(_.nonEmpty)
    require(lines.nonEmpty, "rule pack declares no rules")
    val rows = spark.read.schema(schema).option("mode", "FAILFAST")
      .json(spark.createDataset(lines)).collect()
    rows.toSeq.map { r =>
      val name = Option(r.getAs[String]("name")).getOrElse(
        throw new IllegalArgumentException("rule pack entry missing 'name'"))
      val sev = Option(r.getAs[String]("severity")).getOrElse("invariant") match {
        case "invariant" => Expectations.Invariant
        case "screen"    => Expectations.Screen
        case other => throw new IllegalArgumentException(
          s"rule $name: unknown severity '$other' (expected invariant|screen)")
      }
      val pred = Option(r.getAs[String]("predicate"))
      val uniq = Option(r.getAs[String]("unique"))
      val uniqA = Option(r.getAs[String]("unique_approx"))
      (pred, uniq, uniqA) match {
        case (Some(p), None, None) => Expectations.rowRule(name, expr(p), sev)
        case (None, Some(c), None) => Expectations.unique(name, col(c), sev)
        case (None, None, Some(c)) =>
          if (sev == Expectations.Invariant && Option(r.getAs[String]("severity")).isDefined)
            throw new IllegalArgumentException(
              s"rule $name: unique_approx is an HLL estimate and cannot be an " +
              "invariant — drop the severity field (it is Screen by contract) " +
              "or use 'unique' for an exact gate")
          val rsd = if (r.isNullAt(r.fieldIndex("rsd"))) 0.02
            else r.getAs[Double]("rsd")
          Expectations.uniqueApprox(name, col(c), rsd)
        case _ => throw new IllegalArgumentException(
          s"rule $name: exactly one of predicate | unique | unique_approx required")
      }
    }
  }

  /** Load a rule pack from a file (local or any Hadoop-visible path). */
  def load(spark: SparkSession, path: String): Seq[Expectations.Rule] = {
    val fs = graft.streaming.StreamingState.fsFor(spark, path)
    val in = fs.open(new org.apache.hadoop.fs.Path(path))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    parse(spark, text.split("\n").toSeq)
  }

  /** Load a rule pack bundled on the classpath (the t90 gate fixture). */
  def loadResource(spark: SparkSession, resource: String): Seq[Expectations.Rule] = {
    val in = Option(getClass.getResourceAsStream(resource)).getOrElse(
      throw new IllegalArgumentException(s"rule pack resource not found: $resource"))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    parse(spark, text.split("\n").toSeq)
  }
}
