package graft.enrich

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

import graft.model.Domains

/** Real network `Enricher`: an OpenAI-compatible chat-completions
  * JSON client (reference: scripts/llm_enricher.py:148-211 — prompt
  * template, `response_format=json_object`, temperature 0.1,
  * max_tokens 150, parse `{sentiment, category, confidence}` from
  * `choices[0].message.content`, clamp to the domains, any failure →
  * the `('Erro','Erro',0.0)` sentinel, never drop rows, 0.1 s
  * inter-row throttle).
  *
  * Deployment shape: one instance per executor partition (built
  * inside `Enrich.enrichBatch`'s `mapPartitions`), so request
  * concurrency = partition count — the Spark analog of the
  * reference's single serial client. The HttpClient is @transient
  * lazy: the enricher config serializes to executors, the socket
  * state never does.
  *
  * On top of the reference's try/except→sentinel, TRANSIENT failures
  * only — network I/O, HTTP 5xx, 429 — are retried with linear
  * backoff: `maxRetries` retried attempts plus one final attempt
  * (total `maxRetries + 1` requests) before the failure propagates
  * to the per-row sentinel. Deterministic failures (4xx, malformed
  * 200 content) are NOT retried — they would fail identically every
  * time, and at 100 TB retrying them triples the wasted requests —
  * they fall through to the sentinel immediately.
  */
final class HttpEnricher(
    endpoint: String,
    apiKey: String,
    model: String = "gpt-3.5-turbo-1106",
    requestTimeoutMillis: Long = 30000L,
    throttleMillis: Long = 100L,
    maxRetries: Int = 2) extends Enricher {

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(requestTimeoutMillis)).build()
  @transient private lazy val mapper = new ObjectMapper()

  // reference prompt (llm_enricher.py:151-161), verbatim semantics:
  // Brazilian-news classification into the fixed domains
  private def prompt(title: String): String =
    s"""Analise a seguinte manchete de notícia brasileira e retorne APENAS um objeto JSON com estas chaves:
       |- 'sentiment': "Positiva", "Negativa" ou "Neutra"
       |- 'category': uma das opções: ${Domains.categories.map(c => s""""$c"""").mkString(", ")}
       |- 'confidence': um número entre 0.0 e 1.0 indicando sua confiança na classificação
       |
       |Seja preciso e considere o contexto brasileiro.
       |
       |Manchete: "$title"""".stripMargin

  private def requestBody(title: String): String = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    root.put("temperature", 0.1)
    root.put("max_tokens", 150)
    root.putObject("response_format").put("type", "json_object")
    root.putArray("messages").addObject()
      .put("role", "user").put("content", prompt(title))
    mapper.writeValueAsString(root)
  }

  /** One POST; returns the raw body on HTTP 200. 5xx/429 throw
    * IOException (retryable, like network I/O); other non-200 codes
    * throw IllegalStateException (deterministic — never retried). */
  private def post(body: String): String = {
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(Duration.ofMillis(requestTimeoutMillis))
      .header("Content-Type", "application/json")
      .header("Authorization", s"Bearer $apiKey")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    val code = resp.statusCode()
    if (code == 200) resp.body()
    else if (code >= 500 || code == 429)
      throw new java.io.IOException(s"HTTP $code")
    else throw new IllegalStateException(s"HTTP $code")
  }

  /** choices[0].message.content → {sentiment, category, confidence};
    * missing keys default to the sentinel values exactly like the
    * reference's `result.get('sentiment', 'Erro')`. Domain clamping
    * happens in [[Enrich.enrichBatch]] (shared with the mock path). */
  private def parse(body: String): (String, String, Double) = {
    val content = mapper.readTree(body)
      .path("choices").path(0).path("message").path("content").asText("")
    val r = mapper.readTree(content)
    (if (r.hasNonNull("sentiment")) r.get("sentiment").asText(Domains.Error)
     else Domains.Error,
      if (r.hasNonNull("category")) r.get("category").asText(Domains.Error)
      else Domains.Error,
      if (r.hasNonNull("confidence")) r.get("confidence").asDouble(0.0)
      else 0.0)
  }

  override def classify(title: String, rowIndex: Long): (String, String, Double) = {
    if (throttleMillis > 0) Thread.sleep(throttleMillis) // llm_enricher.py:252-254
    // Retry ONLY the network call, and only on transient faults
    // (network IOException, 5xx/429 from post). A 4xx
    // (IllegalStateException) escapes immediately; parsing happens
    // OUTSIDE the loop so a malformed 200 body (Jackson's
    // JsonProcessingException IS an IOException — it must not reach
    // this catch) is never retried: deterministic failures would
    // fail identically every attempt.
    val body = requestBody(title)
    var attempt = 0
    var resp: String = null
    while (resp == null && attempt < maxRetries) {
      try resp = post(body)
      catch {
        case _: java.io.IOException =>
          attempt += 1
          // linear backoff with a floor: throttleMillis=0 (throttle
          // disabled) must not mean zero backoff — that would hammer
          // a 429/5xx endpoint with immediate retries
          Thread.sleep(math.max(throttleMillis, 50L) * attempt)
      }
    }
    // final attempt (#maxRetries+1) if all retries failed; any
    // NonFatal from it — or from parse — propagates to enrichBatch's
    // per-row catch, which maps it to the sentinel row — identical
    // sentinel semantics to the reference's except branch
    parse(if (resp != null) resp else post(body))
  }
}
