package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fic.{FicLookup, FicShredder, FicTransform, FicUpsert}
import graft.llm.{LlmOperators, StubOcrClient, StubStructurizer}
import graft.load.JdbcSink
import graft.quality.Validation
import graft.sources.FicSources

/** CLI drivers mirroring the reference's stage scripts
  * (script_extract / script_transform / script_load — SURVEY §3).
  * Thin arg-parsing shells over the library operators; each stage is one
  * Spark job.
  */
object Cli {

  def session(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def arg(args: Array[String], name: String): Option[String] =
    args.sliding(2).collectFirst { case Array(`name`, v) => v }
}

/** Stage 1 — `--folder <pdfs> --out <dir> [--workers N]`:
  * PDF scan → OCR → structurize → raw JSON per document.
  * Clients are the deterministic stubs in this zero-egress build; swap
  * real HTTP clients in via LlmOperators' traits.
  */
object GraftExtract {
  def main(args: Array[String]): Unit = {
    val folder = Cli.arg(args, "--folder").getOrElse(sys.error("--folder required"))
    val out = Cli.arg(args, "--out").getOrElse(sys.error("--out required"))
    val workers = Cli.arg(args, "--workers").map(_.toInt).getOrElse(3)
    val spark = Cli.session("graft-extract")
    val pdfs = FicSources.pdfFolder(spark, folder)
    val texts = LlmOperators.ocr(pdfs, new StubOcrClient(), maxInFlight = workers)
    val docs = LlmOperators.structurize(texts, new StubStructurizer, maxInFlight = workers)
    docs.select(col("path"), col("json"), col("error"))
      .write.mode("overwrite").json(out)
    val failed = docs.filter(col("error").isNotNull).count()
    println(s"extract complete: ${docs.count()} docs, $failed failed")
    spark.stop()
  }
}

/** Stage 2 — `--input <rawJsonDir> --output <dir> [--fics fics.json]`:
  * raw docs → 8-pass transform → transformed JSON + warnings +
  * skip list from the date-vs-folder check.
  */
object GraftTransform {
  def main(args: Array[String]): Unit = {
    val in = Cli.arg(args, "--input").getOrElse(sys.error("--input required"))
    val out = Cli.arg(args, "--output").getOrElse(sys.error("--output required"))
    val lookup = Cli.arg(args, "--fics").map(FicSources.ficsLookup)
      .getOrElse(FicLookup(Nil))
    val spark = Cli.session("graft-transform")
    val raw = FicSources.rawJsonFolder(spark, in)
    val transformed = FicTransform(raw, lookup)
    FicSources.writePerDocumentJson(transformed, out)
    val warnings = Validation.sumWarnings(transformed)
    println(s"transform complete: ${transformed.count()} docs, " +
      s"${warnings.count()} sum warnings")
    val folderName = new java.io.File(in).getName
    Validation.writeSkipList(
      Validation.dateFolderCheck(transformed, folderName),
      new java.io.File(out, "skip_list.txt").getPath)
    spark.stop()
  }
}

/** Stage 3 — `--input <transformedDir> --jdbc <url> [--skip-list f]`:
  * transformed docs → skip-list anti-join → shred → latest-wins upsert
  * into the relational sink.
  */
object GraftLoad {
  def main(args: Array[String]): Unit = {
    val in = Cli.arg(args, "--input").getOrElse(sys.error("--input required"))
    val url = Cli.arg(args, "--jdbc").getOrElse(sys.error("--jdbc required"))
    val spark = Cli.session("graft-load")
    var docs = FicSources.transformedJsonFolder(spark, in)
    Cli.arg(args, "--skip-list").foreach { sl =>
      docs = docs.join(broadcast(FicSources.skipList(spark, sl)),
        Seq("filename"), "left_anti")
    }
    val shredded = FicShredder(docs)
    JdbcSink.loadShredded(shredded.all, url)
    println(s"load complete: ${shredded.fic.count()} documents")
    spark.stop()
  }
}
