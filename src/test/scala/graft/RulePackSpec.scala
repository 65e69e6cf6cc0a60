package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Expectations, RulePack}

/** Declarative rule packs (r14, VERDICT #4/#7): JSON-lines rules must
  * parse into exactly the [[Expectations.Rule]]s the compiled set
  * would build — and every malformed declaration must be a LOUD error
  * at parse time, never a silently skipped rule (a skipped invariant
  * is a firewall hole).
  */
class RulePackSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("parsed pack evaluates identically to the equivalent compiled rules") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha", "en"), (2L, "beta", "fr"), (2L, "gamma", "en"),
      (3L, null.asInstanceOf[String], "en"))
      .toDF("doc_id", "text", "lang")
    val pack = RulePack.parse(Seq(
      """{"name": "text_not_null", "predicate": "text IS NULL"}""",
      "",
      """{"name": "id_unique", "unique": "doc_id"}""",
      """{"name": "en_only", "predicate": "lang <> 'en'", "severity": "screen"}"""))
    assert(pack.map(_.name) === Seq("text_not_null", "id_unique", "en_only"))
    assert(pack.map(_.severity) === Seq(Expectations.Invariant,
      Expectations.Invariant, Expectations.Screen))
    val got = Expectations.evaluate(df, pack)
      .collect().map(r => r.getAs[String]("rule") -> r.getAs[Long]("n_violations"))
      .toMap
    assert(got === Map("text_not_null" -> 1L, "id_unique" -> 1L, "en_only" -> 1L))
  }

  test("unique_approx parses with rsd and stays a screen") {
    val pack = RulePack.parse(
      Seq("""{"name": "ids_approx", "unique_approx": "doc_id", "rsd": 0.01}"""))
    assert(pack.head.severity === Expectations.Screen)
    import spark.implicits._
    val df = (1L to 500L).toDF("doc_id")
    val n = Expectations.evaluate(df, pack)
      .collect().head.getAs[Long]("n_violations")
    assert(n === 0L, s"unique column must report 0 approx surplus, got $n")
  }

  test("malformed declarations fail loudly") {
    def fails(line: String, want: String): Unit = {
      val e = intercept[Exception](RulePack.parse(Seq(line)))
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains(want)),
        s"expected failure mentioning '$want', got: $e")
    }
    fails("""{"predicate": "doc_id IS NULL"}""", "missing 'name'")
    fails("""{"name": "x", "predicate": "a", "unique": "b"}""", "exactly one")
    fails("""{"name": "x"}""", "exactly one")
    fails("""{"name": "x", "predicate": "a", "severity": "warn"}""",
      "unknown severity")
    fails("""{"name": "x", "unique_approx": "a", "severity": "invariant"}""",
      "cannot be an invariant")
    fails("""{"name": "has space", "predicate": "a"}""", "A-Za-z0-9_")
    fails("""not json at all""", "Malformed")
    intercept[Exception](RulePack.parse(Seq.empty))
  }

  test("fk rules parse with resolver, filter the parent, and count orphans") {
    import spark.implicits._
    val child = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, Some(99L)),
      (4L, Some(30L)), (5L, None))
      .toDF("id", "user_id")
    val parent = Seq((10L, 1), (20L, 1), (30L, 5), (40L, 1))
      .toDF("c_custkey", "c_nationkey")
    val pack = RulePack.parse(Seq(
      """{"name": "user_known", "fk": "user_id", "ref_table": "customer", "ref_key": "c_custkey"}""",
      """{"name": "user_small_nation", "fk": "user_id", "ref_table": "customer", "ref_key": "c_custkey", "ref_filter": "c_nationkey < 3", "severity": "screen"}"""),
      resolve = { case "customer" => parent })
    assert(pack.map(_.severity) ===
      Seq(Expectations.Invariant, Expectations.Screen))
    val got = Expectations.evaluate(child, pack)
      .collect().map(r => r.getAs[String]("rule") -> r.getAs[Long]("n_violations"))
      .toMap
    // 99 is an orphan everywhere; 30's parent is filtered out of the
    // small-nation subset; the NULL fk is never a violation
    assert(got === Map("user_known" -> 1L, "user_small_nation" -> 2L))
  }

  test("fk declarations fail loudly when incomplete or unresolvable") {
    def fails(line: String, want: String,
        resolve: String => org.apache.spark.sql.DataFrame = RulePack.noResolver)
        : Unit = {
      val e = intercept[Exception](RulePack.parse(Seq(line), resolve))
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains(want)),
        s"expected failure mentioning '$want', got: $e")
    }
    fails("""{"name": "x", "fk": "a"}""", "requires 'ref_table'")
    fails("""{"name": "x", "fk": "a", "ref_table": "t"}""", "requires 'ref_key'")
    fails("""{"name": "x", "fk": "a", "predicate": "b"}""", "exactly one")
    // a pack with an fk rule but no resolver parses (resolution is
    // deferred, r15) but must refuse at EVALUATION, not skip the rule
    import spark.implicits._
    val pack = RulePack.parse(Seq(
      """{"name": "x", "fk": "a", "ref_table": "t", "ref_key": "k"}"""))
    val e = intercept[Exception](
      Expectations.evaluate(Seq(1L).toDF("a"), pack).collect())
    assert(e.getMessage.contains("no table resolver"))
  }

  test("unknown or cross-kind fields fail loudly per kind (r15, r14 ADVICE)") {
    def fails(line: String, want: String): Unit = {
      val e = intercept[IllegalArgumentException](RulePack.parse(Seq(line)))
      assert(e.getMessage.contains(want),
        s"expected failure mentioning '$want', got: ${e.getMessage}")
    }
    // dbt-style 'where' instead of 'ref_filter': silently gating against
    // the UNFILTERED parent would be a firewall hole
    fails("""{"name": "x", "fk": "a", "ref_table": "t", "ref_key": "k", "where": "n < 3"}""",
      "unexpected field(s) [where]")
    // a field from another kind mixed in parses as one kind — reject the strays
    fails("""{"name": "x", "fk": "a", "ref_table": "t", "ref_key": "k", "rsd": 0.01}""",
      "unexpected field(s) [rsd]")
    fails("""{"name": "x", "predicate": "a IS NULL", "ref_table": "t"}""",
      "unexpected field(s) [ref_table]")
    fails("""{"name": "x", "unique": "a", "ref_filter": "b"}""",
      "unexpected field(s) [ref_filter]")
    // plain typos on any kind
    fails("""{"name": "x", "predicate": "a IS NULL", "predciate_extra": 1}""",
      "unexpected field(s) [predciate_extra]")
  }

  test("parsing an fk pack runs no resolver; evaluation re-resolves fresh each time (r15)") {
    import spark.implicits._
    var calls = 0
    var parentKeys: Seq[Long] = Seq(10L, 20L)
    val resolve: String => org.apache.spark.sql.DataFrame = { _ =>
      calls += 1
      parentKeys.toDF("pk")
    }
    val pack = RulePack.parse(Seq(
      """{"name": "fk_known", "fk": "fk", "ref_table": "p", "ref_key": "pk"}"""),
      resolve)
    assert(calls === 0, "parse must not resolve parent tables (IO-free)")
    val child = Seq(Some(10L), Some(20L), Some(99L)).toDF("fk")
    def orphans(): Long = Expectations.evaluate(child, pack)
      .collect().head.getAs[Long]("n_violations")
    assert(orphans() === 1L)
    assert(calls === 1)
    // the parent "table" gains the missing key mid-campaign: the next
    // evaluation must see it (fresh per-evaluation resolution, never a
    // parse-time snapshot)
    parentKeys = Seq(10L, 20L, 99L)
    assert(orphans() === 0L)
    assert(calls === 2)
  }

  test("a marker-name collision is a clear declaration error (r15, r14 ADVICE)") {
    import spark.implicits._
    val parent = Seq(10L).toDF("pk")
    val rule = Expectations.referential("k", org.apache.spark.sql.functions.col("fk"), parent)
    val clashing = Seq((Some(10L), 1)).toDF("fk", "__ref_k")
    val e = intercept[IllegalArgumentException](
      Expectations.evaluate(clashing, Seq(rule)).collect())
    assert(e.getMessage.contains("__ref_k"),
      s"expected the collision message to name the marker, got: ${e.getMessage}")
  }

  test("the bundled t90 fixture loads and bites on the real corpus") {
    val pack = RulePack.loadResource("/rulepacks/documents.json")
    assert(pack.size === 6)
    assert(pack.count(_.severity == Expectations.Screen) === 3)
    val rep = Expectations.evaluateBy(
      Tables.documents(spark, "/root/testdata/sf0.001"), pack, Seq("source"))
      .collect()
    // non-vacuous: the en-only screen must bite (the corpus is
    // multilingual) while the schema invariants hold everywhere
    val byRule = rep.groupBy(_.getAs[String]("rule"))
      .view.mapValues(_.map(_.getAs[Long]("n_violations")).sum).toMap
    assert(byRule("lang_en_only") > 0L, s"fixture screen vacuous: $byRule")
    assert(byRule("doc_id_not_null") === 0L && byRule("text_not_null") === 0L)
  }
}
