package graft.llm

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** REAL HTTP implementations of the extract/embed client seams.
  *
  * The reference's OCR call is asynchronous: submit the document, then
  * poll a status endpoint every 5 s up to a 300 s cap, retrieve the
  * result when the job reports processed, fail the attempt when it
  * reports error or the cap elapses, and reject an empty extraction so
  * the retry loop sees it (extract.py:126-155). The embedding call is a
  * plain batched POST. Both are re-created here against `java.net.http`
  * (one pooled connection per client instance, re-used across a
  * partition's records) with the wire format as minimal JSON.
  *
  * This container has zero egress, so these classes are exercised
  * against an in-process loopback server (`HttpClientsSpec`) — through
  * the REAL request/poll/timeout code paths — and the deterministic
  * stubs remain the default wiring everywhere else.
  *
  * Threading through Spark: instances ship to executors inside the
  * `mapPartitions` lambda, so the non-serializable HTTP client and JSON
  * mapper are `@transient lazy` — rebuilt once per executor JVM on
  * first use.
  */
object HttpClients {
  private[llm] def newHttp(connectTimeoutMs: Long): HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(connectTimeoutMs))
      .build()
}

/** Async-job OCR client: POST the PDF bytes, poll until processed.
  *
  * Wire protocol (the generic shape of hosted OCR APIs):
  *  - `POST {base}/jobs?name=<file>` body = PDF bytes → `{"job_id": id}`
  *  - `GET {base}/jobs/{id}/status` → `{"status": "processing" |
  *    "processed" | "error", "error": …}`
  *  - `GET {base}/jobs/{id}/result` → `{"text": …}`
  *
  * Every failure mode throws (HTTP non-2xx, service-reported error,
  * poll cap elapsed, empty extraction) — `LlmOperators.withRetries`
  * owns the attempt loop and backoff, exactly as the reference's
  * for-attempt loop wraps its poll loop.
  *
  * @param sleep injectable so specs can poll in milliseconds; the
  *              elapsed accounting always advances by `pollIntervalMs`.
  */
final class HttpOcrClient(
    baseUrl: String,
    apiKey: String = "",
    pollIntervalMs: Long = 5000L, // extract.py:130 (wait_time = 5 s)
    maxWaitMs: Long = 300000L, // extract.py:131 (max_wait = 300 s)
    connectTimeoutMs: Long = 10000L,
    requestTimeoutMs: Long = 60000L,
    sleep: Long => Unit = Thread.sleep) extends OcrClient {

  @transient private lazy val http = HttpClients.newHttp(connectTimeoutMs)
  @transient private lazy val mapper = new ObjectMapper()

  private def builder(path: String): HttpRequest.Builder = {
    val b = HttpRequest.newBuilder(URI.create(baseUrl + path))
      .timeout(Duration.ofMillis(requestTimeoutMs))
    if (apiKey.nonEmpty) b.header("Authorization", s"Bearer $apiKey") else b
  }

  private def send(req: HttpRequest): String = {
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"${req.method()} ${req.uri().getPath} -> HTTP ${resp.statusCode()}")
    resp.body()
  }

  private def getJson(path: String): JsonNode =
    mapper.readTree(send(builder(path).GET().build()))

  override def extractText(name: String, pdf: Array[Byte]): String = {
    val submit = builder(s"/jobs?name=${URLEncoder.encode(name, UTF_8)}")
      .header("Content-Type", "application/pdf")
      .POST(HttpRequest.BodyPublishers.ofByteArray(pdf))
      .build()
    val jobId = mapper.readTree(send(submit)).get("job_id").asText()
    var elapsed = 0L
    while (elapsed < maxWaitMs) {
      val st = getJson(s"/jobs/$jobId/status")
      st.get("status").asText() match {
        case "processed" =>
          val text = getJson(s"/jobs/$jobId/result").get("text").asText()
          if (text.trim.isEmpty) // extract.py:154 — retried, not returned
            throw new java.io.IOException("empty extraction from OCR service")
          return text
        case "error" =>
          val msg = Option(st.get("error")).map(_.asText()).getOrElse("unknown")
          throw new java.io.IOException(s"OCR service error: $msg")
        case _ => () // still processing
      }
      sleep(pollIntervalMs)
      elapsed += pollIntervalMs
    }
    throw new java.io.IOException(
      s"timeout after $maxWaitMs ms waiting for OCR job $jobId")
  }
}

/** Synchronous text→structured-JSON client (the reference's second
  * external call, extract.py:169-202: one prompt+text request, one
  * generated response; the markdown fence-stripping stays downstream in
  * `LlmOperators.stripFences` exactly as the reference strips after the
  * call). Wire: `POST {base}/structure` with `{"text": …}` →
  * `{"json": …}`. Throws on HTTP or shape failure; the per-record
  * retry/quarantine in `LlmOperators.structurize` owns recovery.
  */
final class HttpStructurizer(
    baseUrl: String,
    apiKey: String = "",
    connectTimeoutMs: Long = 10000L,
    requestTimeoutMs: Long = 60000L) extends Structurizer {

  @transient private lazy val http = HttpClients.newHttp(connectTimeoutMs)
  @transient private lazy val mapper = new ObjectMapper()

  override def structure(text: String): String = {
    val payload = mapper.createObjectNode()
    payload.put("text", text)
    val b = HttpRequest.newBuilder(URI.create(s"$baseUrl/structure"))
      .timeout(Duration.ofMillis(requestTimeoutMs))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(payload)))
    if (apiKey.nonEmpty) b.header("Authorization", s"Bearer $apiKey")
    val resp = http.send(b.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(s"POST /structure -> HTTP ${resp.statusCode()}")
    val out = mapper.readTree(resp.body()).get("json")
    if (out == null)
      throw new java.io.IOException("malformed structure response: no json field")
    out.asText()
  }
}

/** Batched embedding client: one `POST {base}/embed` per batch with
  * `{"inputs": [text, …]}`, expecting `{"embeddings": [[float, …], …]}`
  * — one vector per input in order (`LlmOperators.embed` enforces the
  * drop-free contract on top). Throws on any HTTP or shape failure so
  * the batch retry/quarantine path owns recovery.
  */
final class HttpEmbedder(
    baseUrl: String,
    apiKey: String = "",
    connectTimeoutMs: Long = 10000L,
    requestTimeoutMs: Long = 60000L) extends Embedder {

  @transient private lazy val http = HttpClients.newHttp(connectTimeoutMs)
  @transient private lazy val mapper = new ObjectMapper()

  override def embed(texts: Seq[String]): Seq[Array[Float]] = {
    val payload = mapper.createObjectNode()
    val arr = payload.putArray("inputs")
    texts.foreach(arr.add)
    val b = HttpRequest.newBuilder(URI.create(s"$baseUrl/embed"))
      .timeout(Duration.ofMillis(requestTimeoutMs))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(payload)))
    if (apiKey.nonEmpty) b.header("Authorization", s"Bearer $apiKey")
    val resp = http.send(b.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(s"POST /embed -> HTTP ${resp.statusCode()}")
    val out = mapper.readTree(resp.body()).get("embeddings")
    if (out == null || !out.isArray)
      throw new java.io.IOException("malformed embed response: no embeddings array")
    (0 until out.size()).map { i =>
      val row = out.get(i)
      Array.tabulate(row.size())(j => row.get(j).floatValue())
    }
  }
}
