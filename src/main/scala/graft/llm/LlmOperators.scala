package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.fic.FicSchema

/** External-service clients used by the extract stage. The reference
  * calls LLMWhisperer (PDF OCR) and Gemini (text → structured JSON) over
  * HTTP (/root/reference/src/etl/extract.py:111-202); this container has
  * zero egress, so production clients are out of scope — the trait is
  * the seam, and [[StubOcrClient]]/[[StubStructurizer]] are
  * deterministic fakes that keep the Spark-side plumbing (partitioning,
  * retries, schema) real and testable.
  */
trait OcrClient extends Serializable {
  /** PDF bytes → plain text. Throws on transient failure. */
  def extractText(name: String, pdf: Array[Byte]): String
}

trait Structurizer extends Serializable {
  /** Fact-sheet text → JSON string matching [[FicSchema.raw]]. */
  def structure(text: String): String
}

/** Deterministic fake OCR: emits a synthetic fact-sheet text derived
  * from the file name/size. `failEvery` simulates transient faults to
  * exercise the retry path.
  */
final class StubOcrClient(failEvery: Int = 0) extends OcrClient {
  private val calls = new java.util.concurrent.atomic.AtomicInteger()
  override def extractText(name: String, pdf: Array[Byte]): String = {
    if (failEvery > 0 && calls.incrementAndGet() % failEvery == 0)
      throw new java.io.IOException("simulated transient OCR failure")
    s"FICHA TECNICA ${name.toUpperCase}\nbytes=${pdf.length}"
  }
}

trait Embedder extends Serializable {
  /** Batched text → vector call (real embedding APIs take k texts per
    * request). Throws on transient failure; must return one vector per
    * input in order.
    */
  def embed(texts: Seq[String]): Seq[Array[Float]]
}

/** Deterministic fake embedder: 64-dim feature hashing — each word
  * lands in dimension md5(word) % 64 with ±1 sign from the next hash
  * bit, L2-normalized. Deterministic per text (batching and
  * partitioning cannot change a vector), and similar texts land near
  * each other in cosine, so downstream ANN tests are meaningful.
  * `failEvery` simulates transient faults to exercise the batch retry.
  */
final class StubEmbedder(dims: Int = 64, failEvery: Int = 0) extends Embedder {
  private val calls = new java.util.concurrent.atomic.AtomicInteger()
  override def embed(texts: Seq[String]): Seq[Array[Float]] = {
    if (failEvery > 0 && calls.incrementAndGet() % failEvery == 0)
      throw new java.io.IOException("simulated transient embed failure")
    texts.map { t =>
      val v = new Array[Float](dims)
      t.split(" ").filter(_.nonEmpty).foreach { w =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(w.getBytes("UTF-8"))
        val dim = java.lang.Math.floorMod(h(0).toInt * 256 + (h(1) & 0xff), dims)
        val sign = if ((h(2) & 1) == 0) 1f else -1f
        v(dim) += sign
      }
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (norm > 0) v.map(x => (x / norm).toFloat) else v
    }
  }
}

final class StubStructurizer extends Structurizer {
  override def structure(text: String): String = {
    val name = text.linesIterator.next().stripPrefix("FICHA TECNICA ").trim
    s"""```json
       |{"fic": {"nombre_fic": "$name", "gestor": "stub", "custodio": null,
       | "fecha_corte": "jul-25", "politica_de_inversion": "renta fija"}}
       |```""".stripMargin
  }
}

/** The LLM map operators (SURVEY S2/S3) — `mapPartitions` over a
  * Dataset with the reference's resilience semantics re-created
  * in-lambda:
  *
  *  - retry ×3 with exponential backoff 2^n seconds
  *    (extract.py:111,160-164) INSIDE the lambda — a Spark task retry
  *    would re-bill every record in the partition;
  *  - bounded concurrency: `repartition(maxInFlight)` caps simultaneous
  *    clients exactly like the reference's 3-worker pool
  *    (script_extract.py:87) — at cluster scale each partition holds one
  *    API client/connection, reused across its records;
  *  - per-record failures are captured, not thrown (error column), so
  *    one poisoned document cannot kill a 100 TB job — the quarantine
  *    discipline of SURVEY §7.8.
  */
object LlmOperators {

  val ocrSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("text", StringType),
    StructField("error", StringType)))

  private[graft] def withRetries[T](maxRetries: Int, sleepMs: Long => Long = n => n)(f: => T): Either[String, T] = {
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxRetries) {
      try return Right(f)
      catch {
        case e: Throwable =>
          last = e
          attempt += 1
          if (attempt < maxRetries) // 2^(n-1) s: 1s, 2s — extract.py:164
            Thread.sleep(sleepMs((1L << (attempt - 1)) * 1000L))
      }
    }
    Left(s"${last.getClass.getSimpleName}: ${last.getMessage}")
  }

  /** PDF binary rows (path, content) → (path, text, error). */
  def ocr(pdfs: DataFrame, client: OcrClient, maxInFlight: Int = 3,
      maxRetries: Int = 3, backoffMs: Long => Long = n => n): DataFrame = {
    val spark = pdfs.sparkSession
    import spark.implicits._
    pdfs.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .repartition(maxInFlight) // rate limit ≈ reference's 3 workers
      .mapPartitions { rows =>
        // one client per partition ≈ one connection per worker
        rows.map { case (path, bytes) =>
          withRetries(maxRetries, backoffMs)(client.extractText(path, bytes)) match {
            case Right(t) if t != null && t.trim.nonEmpty => (path, t, null: String)
            case Right(_) => (path, null: String, "empty extraction") // extract.py:154-155
            case Left(err) => (path, null: String, err)
          }
        }
      }
      .toDF("path", "text", "error")
  }

  /** Text rows → parsed FIC documents: LLM structure call (with fence
    * stripping, extract.py:192-195) then `from_json` with the declared
    * schema — untrusted output never throws (PERMISSIVE).
    */
  def structurize(texts: DataFrame, client: Structurizer,
      maxInFlight: Int = 3, maxRetries: Int = 3,
      backoffMs: Long => Long = n => n): DataFrame = {
    val spark = texts.sparkSession
    import spark.implicits._
    texts.select(col("path"), col("text"))
      .as[(String, String)]
      .repartition(maxInFlight)
      .mapPartitions { rows =>
        rows.map { case (path, text) =>
          if (text == null) (path, null: String, "no text")
          else withRetries(maxRetries, backoffMs)(client.structure(text)) match {
            case Right(j) => (path, stripFences(j), null: String)
            case Left(err) => (path, null: String, err)
          }
        }
      }
      .toDF("path", "json", "error")
      .withColumn("doc", from_json(col("json"), FicSchema.raw))
  }

  /** Text rows → embedding vectors (the north-star `embed` map
    * operator, SURVEY §6): the remote-model call is BATCHED — real
    * embedding APIs price and rate-limit per request of up to k texts,
    * so the lambda groups its partition into `batchSize` slices and one
    * retry wraps each batch, not each row. A failed batch quarantines
    * its rows (null vector + error) instead of killing the job. Output
    * plugs straight into the vector pack (same `Array[Float]` shape as
    * the embeddings table).
    */
  def embed(texts: DataFrame, client: Embedder, batchSize: Int = 16,
      maxInFlight: Int = 3, maxRetries: Int = 3,
      backoffMs: Long => Long = n => n): DataFrame = {
    val spark = texts.sparkSession
    import spark.implicits._
    texts.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .repartition(maxInFlight)
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          val (withText, wordless) = batch.partition(r => r._2 != null && r._2.nonEmpty)
          val quarantined = wordless.map { case (id, _) =>
            (id, null: Array[Float], "no text")
          }
          val embedded =
            if (withText.isEmpty) Nil
            else withRetries(maxRetries, backoffMs) {
              val vs = client.embed(withText.map(_._2))
              // a short response would zip-truncate and silently DROP
              // the tail rows — force it through the retry/quarantine
              // path instead (drop-free is the operator's contract)
              require(vs.size == withText.size,
                s"embedder returned ${vs.size} vectors for ${withText.size} texts")
              vs
            } match {
              case Right(vs) => withText.zip(vs).map { case ((id, _), v) =>
                (id, v, null: String)
              }
              case Left(err) => withText.map { case (id, _) =>
                (id, null: Array[Float], err)
              }
            }
          quarantined ++ embedded
        }
      }
      .toDF("doc_id", "embedding", "error")
  }

  /** ```json fences → bare JSON (extract.py:192-195). */
  def stripFences(s: String): String = {
    if (s == null) return null
    val t = s.trim
    if (t.contains("```json")) t.split("```json", 2)(1).split("```", 2)(0).trim
    else if (t.startsWith("```")) t.stripPrefix("```").split("```", 2)(0).trim
    else t
  }
}
