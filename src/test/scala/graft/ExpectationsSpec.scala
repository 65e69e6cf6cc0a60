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
