package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PDF layout-extraction operators (SURVEY multimodal follow-up; the
  * capability prototyped in the reference's notebooks —
  * /root/reference/notebooks/pruebas.ipynb: pdfplumber word+bbox
  * extraction, named bounding-box region cropping with text
  * reassembly, and per-region table extraction).
  *
  * Split of responsibilities:
  *  - the DECODER (pdf bytes → positioned words) is a per-partition
  *    seam like [[Multimodal.MediaDecoder]] — stubbed here
  *    (deterministic fake; no PDF lib in this container), real on a
  *    cluster;
  *  - everything AFTER the decode — region containment, line
  *    assembly, row/column clustering — is genuine relational logic
  *    (broadcast region join, bucketed aggregation, bounded
  *    per-page windows) and runs identically with a real decoder.
  */
object PdfLayout {

  /** One positioned word: pdfplumber's extract_words tuple shape. */
  final case class LayoutWord(page: Int, text: String,
      x0: Double, top: Double, x1: Double, bottom: Double)

  /** Decode seam: cheap to construct, safe to reuse per partition. */
  trait LayoutDecoder extends Serializable {
    def words(pdf: Array[Byte]): Seq[LayoutWord]
  }

  /** Deterministic fake: a grid of jittered words on US-Letter pages,
    * seeded by the payload bytes — reproducible on any JVM
    * (java.util.Random is spec-pinned), so specs and the differential
    * gate exercise the full operator surface without a PDF library.
    */
  final class StubLayoutDecoder(wordsPerPage: Int = 60) extends LayoutDecoder {
    override def words(pdf: Array[Byte]): Seq[LayoutWord] = {
      val rnd = new java.util.Random(java.util.Arrays.hashCode(pdf).toLong)
      val nPages = 1 + pdf.length / 8192
      for (p <- 0 until nPages; i <- 0 until wordsPerPage) yield {
        val x0 = (20 + (i % 6) * 95 + rnd.nextInt(8)).toDouble
        val top = (40 + (i / 6) * 70 + rnd.nextInt(6)).toDouble
        val text = s"w${p}_${i}_" + Integer.toHexString(rnd.nextInt(16))
        LayoutWord(p, text, x0, top, x0 + 60, top + 12)
      }
    }
  }

  /** 1→N word generator over (doc_id, content) rows: one decoder per
    * partition, flatMap keeps the word explosion distributed.
    */
  def words(pdfs: DataFrame, decoder: LayoutDecoder): DataFrame = {
    val spark = pdfs.sparkSession
    import spark.implicits._
    pdfs.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        decoder.words(bytes).map(w =>
          (id, w.page, w.text, w.x0, w.top, w.x1, w.bottom))
      }
      .toDF("doc_id", "page", "word", "x0", "top", "x1", "bottom")
  }

  /** Named-region text extraction (the notebook's bounding_boxes +
    * within_bbox + extract_text loop, relationally): words whose
    * CENTER falls in a region are bucketed into lines (top / lineTol),
    * each line reads left-to-right, lines read top-down. Regions ride
    * a broadcast join; the per-(doc, page, region) aggregation is
    * in-row array_sort, no windows.
    */
  def regionText(words: DataFrame,
      regions: Seq[(String, (Double, Double, Double, Double))],
      lineTol: Double = 6.0): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val regionDf = regions.map { case (n, (a, b, c, d)) => (n, a, b, c, d) }
      .toDF("region", "rx0", "rtop", "rx1", "rbottom")
    val cx = (col("x0") + col("x1")) / 2
    val cy = (col("top") + col("bottom")) / 2
    val contained = words.join(broadcast(regionDf),
      cx >= col("rx0") && cx < col("rx1") &&
      cy >= col("rtop") && cy < col("rbottom"))
    val lines = contained
      .withColumn("line_key", floor(col("top") / lineTol))
      .groupBy(col("doc_id"), col("page"), col("region"), col("line_key"))
      .agg(
        min(col("top")).as("line_top"),
        count(lit(1)).as("n_words_line"),
        array_join(transform(
          array_sort(collect_list(struct(col("x0"), col("word")))),
          x => x.getField("word")), " ").as("line"))
    lines
      .groupBy(col("doc_id"), col("page"), col("region"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("n_words_line")).as("n_words"),
        array_join(transform(
          array_sort(collect_list(
            struct(col("line_top"), col("line_key"), col("line")))),
          x => x.getField("line")), "\n").as("text"))
  }

  /** Table-cell extraction (the notebook's extract_table / camelot
    * stream flavor): rows and columns are position clusters —
    * dense_rank over the top / x0 buckets WITHIN a page, so every
    * window partition is bounded by one page's words. Multiple words
    * landing in a cell concatenate left-to-right.
    */
  def tableCells(words: DataFrame, rowTol: Double = 6.0,
      colTol: Double = 12.0): DataFrame = {
    val w = words
      .withColumn("row_key", floor(col("top") / rowTol))
      .withColumn("col_key", floor(col("x0") / colTol))
    val byRow = Window.partitionBy(col("doc_id"), col("page"))
      .orderBy(col("row_key"))
    val byCol = Window.partitionBy(col("doc_id"), col("page"))
      .orderBy(col("col_key"))
    w.withColumn("row_id", dense_rank().over(byRow))
      .withColumn("col_id", dense_rank().over(byCol))
      .groupBy(col("doc_id"), col("page"), col("row_id"), col("col_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("x0"), col("word")))),
        x => x.getField("word")), " ").as("cell"))
  }
}
