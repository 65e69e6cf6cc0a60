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
    // a pack with an fk rule but no resolver must refuse, not skip
    fails("""{"name": "x", "fk": "a", "ref_table": "t", "ref_key": "k"}""",
      "no table resolver")
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
