package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Expectations

class ExpectationsSpec extends AnyFunSuite {

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

  test("rules count planted violations exactly; uniqueness counts surplus rows") {
    import spark.implicits._
    // 2 null names, doc 7 appears 3 times (2 surplus), 3 rows over the
    // length cap
    val df = Seq(
      (1L, Some("a"), 10L), (2L, Some("b"), 900L), (3L, None, 20L),
      (7L, Some("c"), 30L), (7L, Some("d"), 950L), (7L, None, 40L),
      (8L, Some("e"), 999L)).toDF("id", "name", "len")
    val rep = Expectations.evaluate(df, Seq(
        Expectations.rowRule("name_not_null", col("name").isNull),
        Expectations.unique("id_unique", col("id")),
        Expectations.rowRule("len_cap", col("len") > 800L)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rep("name_not_null") == ((2L, false)))
    assert(rep("id_unique") == ((2L, false)))
    assert(rep("len_cap") == ((3L, false)))
    // all-pass set on the same frame
    val ok = Expectations.evaluate(df, Seq(
        Expectations.rowRule("id_not_null", col("id").isNull)))
      .head()
    assert(ok.getLong(1) == 0L && ok.getBoolean(2))
  }

  test("empty input: zero violations, every rule passes (no null sums)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "name")
    val rep = Expectations.evaluate(empty, Seq(
        Expectations.rowRule("name_not_null", col("name").isNull),
        Expectations.unique("id_unique", col("id"))))
      .collect()
    assert(rep.length == 2)
    rep.foreach(r => assert(r.getLong(1) == 0L && r.getBoolean(2)))
  }

  test("grouped evaluation routes each violation to its group; matches composed global counts") {
    import spark.implicits._
    val df = Seq(
      ("s1", 1L, Some("a")), ("s1", 2L, None), ("s1", 2L, Some("b")),
      ("s2", 3L, Some("c")), ("s2", 3L, Some("d")), ("s2", 3L, None))
      .toDF("src", "id", "name")
    val rules = Seq(
      Expectations.rowRule("name_not_null", col("name").isNull),
      Expectations.unique("id_unique", col("id")))
    val rep = Expectations.evaluateBy(df, rules, Seq("src"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rep(("s1", "name_not_null")) == 1L && rep(("s2", "name_not_null")) == 1L)
    // uniqueness is WITHIN the group: s1 has one surplus id row, s2 two
    assert(rep(("s1", "id_unique")) == 1L && rep(("s2", "id_unique")) == 2L)
    // per-group counts compose to the global row-rule answer
    val global = Expectations.evaluate(df, rules.take(1)).head().getLong(1)
    assert(rep.filter(_._1._2 == "name_not_null").values.sum == global)
  }

  test("uniqueApprox tracks the exact surplus within HLL error; severity is Screen") {
    import spark.implicits._
    // 10k ids, ~1k duplicated rows
    val df = ((1 to 10000) ++ (1 to 1000)).map(_.toLong).toDF("id")
    val rule = Expectations.uniqueApprox("id_unique_approx", col("id"), rsd = 0.02)
    assert(rule.severity == Expectations.Screen)
    val approx = Expectations.evaluate(df, Seq(rule)).head().getLong(1)
    val exact = Expectations.evaluate(df,
      Seq(Expectations.unique("id_unique", col("id")))).head().getLong(1)
    assert(exact == 1000L)
    // surplus = rows - estimate(distinct): a 2% rsd on 10k distinct
    // keys bounds the estimate error ~3 sigma at ~600
    assert(math.abs(approx - exact) <= 600L,
      s"HLL surplus $approx too far from exact $exact")
  }

  test("rule names are locked to identifier characters") {
    intercept[IllegalArgumentException] {
      Expectations.rowRule("bad'name", col("id").isNull)
    }
    intercept[IllegalArgumentException] {
      Expectations.rowRule("bad`name", col("id").isNull)
    }
  }

  test("the promotion firewall gates on invariants only: screens never count, broken invariants do") {
    import spark.implicits._
    // real corpus: both screens bite (non-allowed langs, length ceiling)
    // but no invariant does — the firewall must report ZERO failing
    // rules (the r12 ADVICE finding: it used to exit 2 on every corpus)
    assert(graft.app.GraftExpect.run(spark, "/root/testdata/sf0.001") === 0L)
    assert(graft.app.GraftExpect.run(spark, "/root/testdata/sf0.001",
      bySource = true) === 0L)

    // plant a duplicate doc_id: the uniqueness INVARIANT breaks and the
    // firewall counts it
    val dir = java.nio.file.Files.createTempDirectory("expect_fw").toString
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    docs.union(docs.limit(1)).write.parquet(s"$dir/documents.parquet")
    assert(graft.app.GraftExpect.run(spark, dir) === 1L)
  }

  test("referential rules: orphans counted, null fks exempt, other rules unperturbed") {
    import spark.implicits._
    val child = Seq(
      ("a", Some(10L), 1L), ("a", Some(20L), 2L), ("a", Some(99L), 3L),
      ("b", Some(20L), 4L), ("b", Some(99L), 5L), ("b", None, 6L))
      .toDF("grp", "fk", "payload")
    val parent = Seq(10L, 20L, 20L, 30L).toDF("pk") // dup key: distinct-reduced
    val rules = Seq(
      Expectations.referential("fk_known", col("fk"), parent),
      Expectations.rowRule("payload_cap", col("payload") > 4L,
        Expectations.Screen))
    val global = Expectations.evaluate(child, rules)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // two rows carry fk=99 (orphan); the NULL fk row is exempt; the
    // single-table rule's count is untouched by the stapled join (the
    // distinct parent guarantees 1:1 — a dup pk must not double rows)
    assert(global === Map("fk_known" -> 2L, "payload_cap" -> 2L))
    // grouped grain routes each orphan to its group
    val byGrp = Expectations.evaluateBy(child, rules, Seq("grp"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byGrp(("a", "fk_known")) === 1L && byGrp(("b", "fk_known")) === 1L)
    // a multi-column keys frame is a declaration error, not a bad join
    intercept[IllegalArgumentException](
      Expectations.referential("bad", col("fk"), parent.withColumn("x", lit(1))))
  }

  test("t91 on the real corpus: known-customer passes, active-nation screen bites") {
    val rep = Expectations.qReferential(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("user_id_not_null") === 0L)
    assert(rep("user_known_customer") === 0L,
      "every event user must resolve against the full customer table")
    assert(rep("user_active_nation") > 0L,
      "the filtered-parent screen must be non-vacuous on the corpus")
  }

  test("document rule set on the real corpus: invariants pass, screens bite") {
    val rep = Expectations
      .qExpectations(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(rep("doc_id_not_null") && rep("doc_id_unique") &&
      rep("text_not_null") && rep("n_chars_consistent") && rep("source_naming"))
    // the two screening rules must be non-vacuous on the synthetic corpus
    assert(!rep("lang_allowed"), "lang screen should bite (fr/zh docs exist)")
  }
}
