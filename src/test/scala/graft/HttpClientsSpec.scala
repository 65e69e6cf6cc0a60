package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{HttpEmbedder, HttpOcrClient, LlmOperators}

/** The REAL HTTP clients (submit + poll + timeout OCR; batched POST
  * embedder) exercised end-to-end against an in-process loopback
  * server — the zero-egress container's stand-in for the hosted
  * services. Every scenario drives the production code path: the
  * `java.net.http` requests, the 5 s-shaped poll loop (at millisecond
  * intervals), the poll cap, service-reported errors, transient HTTP
  * failures through `LlmOperators.withRetries`, and the zip-truncation
  * quarantine — including through Spark `mapPartitions` so client
  * serialization to tasks is covered.
  */
class HttpClientsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _

  // one status-poll counter per job so "ok" jobs need 2 polls
  private val jobPolls = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
  private val submits = new AtomicInteger()
  private val embedCalls = new AtomicInteger()
  private val embed500s = new AtomicInteger()

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def query(ex: HttpExchange, key: String): String =
    Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
      .map(_.split("=", 2)).collectFirst {
        case Array(k, v) if k == key =>
          java.net.URLDecoder.decode(v, UTF_8)
      }.getOrElse("")

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // POST /jobs?name=X  -> job id "X"; scenario is encoded in the name
    server.createContext("/jobs", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      if (ex.getRequestMethod == "POST" && path == "/jobs") {
        val name = query(ex, "name")
        val nBytes = ex.getRequestBody.readAllBytes().length
        submits.incrementAndGet()
        jobPolls.putIfAbsent(name, new AtomicInteger())
        if (name.startsWith("flaky") && submits.get() % 2 == 1)
          respond(ex, 500, """{"error":"transient"}""")
        else
          respond(ex, 200, s"""{"job_id":"$name:$nBytes"}""")
      } else if (path.endsWith("/status")) {
        val id = path.stripPrefix("/jobs/").stripSuffix("/status")
        val name = id.split(":")(0)
        val polls = jobPolls.get(name).incrementAndGet()
        val status =
          if (name.startsWith("err")) """{"status":"error","error":"bad scan"}"""
          else if (name.startsWith("hang")) """{"status":"processing"}"""
          else if (polls >= 2) """{"status":"processed"}"""
          else """{"status":"processing"}"""
        respond(ex, 200, status)
      } else if (path.endsWith("/result")) {
        val id = path.stripPrefix("/jobs/").stripSuffix("/result")
        val Array(name, nBytes) = id.split(":")
        val text =
          if (name.startsWith("empty")) ""
          else s"FICHA TECNICA ${name.toUpperCase} bytes=$nBytes"
        respond(ex, 200,
          s"""{"text":"${text.replace("\"", "\\\"")}"}""")
      } else respond(ex, 404, "{}")
    })
    // POST /structure {"text": ...} -> fenced JSON derived from the text
    server.createContext("/structure", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val text = mapper.readTree(body).get("text").asText()
      if (text.contains("ERR")) respond(ex, 500, """{"error":"model overloaded"}""")
      else {
        val name = text.linesIterator.next()
          .stripPrefix("FICHA TECNICA ").trim
        val out = mapper.createObjectNode()
        out.put("json",
          s"""```json\n{"fic": {"nombre_fic": "$name", "gestor": "http"}}\n```""")
        respond(ex, 200, mapper.writeValueAsString(out))
      }
    })
    // POST /embed {"inputs":[...]} -> one deterministic vector per input
    server.createContext("/embed", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      embedCalls.incrementAndGet()
      if (body.contains("FLAKY") && embed500s.get() == 0) {
        embed500s.incrementAndGet()
        respond(ex, 503, """{"error":"overloaded"}""")
      } else {
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val inputs = mapper.readTree(body).get("inputs")
        val short = (0 until inputs.size())
          .exists(i => inputs.get(i).asText().contains("SHORT"))
        val take = if (short) inputs.size() - 1 else inputs.size()
        val vecs = (0 until take).map { i =>
          s"[${inputs.get(i).asText().length}.0, $i.0]"
        }.mkString(",")
        respond(ex, 200, s"""{"embeddings":[$vecs]}""")
      }
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit =
    if (server != null) server.stop(0)

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def fastOcr() = new HttpOcrClient(base,
    pollIntervalMs = 5L, maxWaitMs = 200L, sleep = _ => ())

  test("OCR client: submit, poll until processed, retrieve") {
    val text = fastOcr().extractText("doc1.pdf", Array[Byte](1, 2, 3))
    assert(text == "FICHA TECNICA DOC1.PDF bytes=3")
    assert(jobPolls.get("doc1.pdf").get() >= 2, "poll loop did not poll")
  }

  test("OCR client: service-reported error and empty extraction throw") {
    val e1 = intercept[java.io.IOException](
      fastOcr().extractText("err1.pdf", Array[Byte](9)))
    assert(e1.getMessage.contains("bad scan"))
    val e2 = intercept[java.io.IOException](
      fastOcr().extractText("empty1.pdf", Array[Byte](9)))
    assert(e2.getMessage.contains("empty extraction"))
  }

  test("OCR client: poll cap elapses into a timeout failure") {
    val e = intercept[java.io.IOException](
      fastOcr().extractText("hang1.pdf", Array[Byte](9)))
    assert(e.getMessage.contains("timeout"))
  }

  test("OCR through Spark: good docs extract, poisoned docs quarantine") {
    import spark.implicits._
    val pdfs = Seq(
      ("ok_a.pdf", Array[Byte](1, 2)),
      ("ok_b.pdf", Array[Byte](1, 2, 3)),
      ("err_c.pdf", Array[Byte](1)),
      ("hang_d.pdf", Array[Byte](1)),
    ).toDF("path", "content")
    val out = LlmOperators.ocr(pdfs, fastOcr(), maxInFlight = 2,
      backoffMs = _ => 0L).collect()
      .map(r => r.getAs[String]("path") ->
        (r.getAs[String]("text"), r.getAs[String]("error"))).toMap
    assert(out("ok_a.pdf")._1 == "FICHA TECNICA OK_A.PDF bytes=2")
    assert(out("ok_b.pdf")._1 == "FICHA TECNICA OK_B.PDF bytes=3" &&
      out("ok_b.pdf")._2 == null)
    assert(out("err_c.pdf")._1 == null &&
      out("err_c.pdf")._2.contains("bad scan"))
    assert(out("hang_d.pdf")._1 == null &&
      out("hang_d.pdf")._2.contains("timeout"))
  }

  test("OCR client: transient submit 500 is retried to success") {
    // "flaky" submits 500 on odd global submit counts: align the
    // parity so this test's FIRST flaky submit fails and its retry wins
    if (submits.get() % 2 == 1) fastOcr().extractText("ok_warm.pdf", Array[Byte](1))
    val out = LlmOperators.withRetries(3, _ => 0L)(
      fastOcr().extractText("flaky1.pdf", Array[Byte](7, 7)))
    assert(out == Right("FICHA TECNICA FLAKY1.PDF bytes=2"))
  }

  test("structurizer through Spark: fenced JSON parsed, poisoned text quarantined") {
    import spark.implicits._
    val texts = Seq(
      ("a.pdf", "FICHA TECNICA FONDO_A\nbytes=9"),
      ("b.pdf", "FICHA TECNICA ERR_DOC\nbytes=9"),
    ).toDF("path", "text")
    val out = LlmOperators.structurize(texts,
        new graft.llm.HttpStructurizer(base), maxInFlight = 1,
        backoffMs = _ => 0L).collect()
      .map(r => r.getAs[String]("path") ->
        (r.getAs[String]("json"), r.getAs[String]("error"),
          r.getAs[org.apache.spark.sql.Row]("doc"))).toMap
    // fences stripped downstream of the REAL client, from_json parses
    assert(out("a.pdf")._2 == null && out("a.pdf")._1.startsWith("{"))
    assert(out("a.pdf")._3.getAs[org.apache.spark.sql.Row]("fic")
      .getAs[String]("nombre_fic") == "FONDO_A")
    assert(out("b.pdf")._1 == null && out("b.pdf")._2.contains("HTTP 500"))
  }

  test("embedder through Spark: batched calls, vectors in order") {
    import spark.implicits._
    embedCalls.set(0)
    val texts = (0L until 7L).map(i => (i, s"text number $i")).toDF("doc_id", "text")
    val out = LlmOperators.embed(texts, new HttpEmbedder(base),
      batchSize = 3, maxInFlight = 1, backoffMs = _ => 0L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Seq[Float]]("embedding"), r.getAs[String]("error"))).toMap
    assert(out.size == 7 && out.values.forall(_._2 == null))
    // vector[0] = text length — proves order was preserved end to end
    (0L until 7L).foreach { i =>
      assert(out(i)._1.head == s"text number $i".length.toFloat, s"doc $i")
    }
    assert(embedCalls.get() == 3, s"expected ceil(7/3)=3 batches, got ${embedCalls.get()}")
  }

  test("embedder: transient 503 retries; short response quarantines the batch") {
    import spark.implicits._
    embed500s.set(0)
    val flaky = Seq((1L, "FLAKY text")).toDF("doc_id", "text")
    val ok = LlmOperators.embed(flaky, new HttpEmbedder(base),
      maxInFlight = 1, backoffMs = _ => 0L).collect()
    assert(ok.head.getAs[String]("error") == null, "503 retry did not recover")
    // a SHORT batch returns n-1 vectors: the drop-free guard must
    // quarantine every row of the batch, never zip-truncate
    val short = Seq((1L, "SHORT a"), (2L, "plain b")).toDF("doc_id", "text")
    val bad = LlmOperators.embed(short, new HttpEmbedder(base),
      batchSize = 2, maxInFlight = 1, backoffMs = _ => 0L).collect()
    assert(bad.length == 2)
    assert(bad.forall(_.getAs[String]("error") != null &&
      bad.head.getAs[String]("error").contains("vectors")))
  }
}
