package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.enrich.{Enrich, HttpEnricher, MockEnricher}
import graft.model.RawHeadline

/** End-to-end test of the real network [[HttpEnricher]] against a
  * local in-JVM OpenAI-compatible stub server (JDK HttpServer — no
  * extra dependency, no real network): happy-path JSON parsing,
  * domain clamping of out-of-domain responses, malformed-JSON →
  * sentinel, 500s → retry then sentinel, and the full
  * `Enrich.enrichBatch` pipeline producing the same row shape as
  * MockEnricher. Mirrors reference semantics at
  * scripts/llm_enricher.py:148-211.
  */
class HttpEnricherSpec extends SparkTestBase {

  private val mapper = new ObjectMapper()

  /** OpenAI-shaped envelope around a content string. */
  private def envelope(content: String): String = {
    val root = mapper.createObjectNode()
    root.putArray("choices").addObject()
      .putObject("message").put("content", content)
    mapper.writeValueAsString(root)
  }

  /** Stub: routes by the headline text found in the request body. */
  private def withStub(handler: String => (Int, String))(
      f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/v1/chat/completions", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      val (code, resp) = handler(body)
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/v1/chat/completions")
    finally server.stop(0)
  }

  private def enricher(url: String) =
    new HttpEnricher(url, "test-key", throttleMillis = 0L, maxRetries = 2)

  test("happy path: parses sentiment/category/confidence from the envelope") {
    withStub { body =>
      assert(body.contains("gpt-3.5-turbo-1106"), "model name in request")
      assert(body.contains("json_object"), "response_format in request")
      (200, envelope("""{"sentiment":"Positiva","category":"Economia","confidence":0.93}"""))
    } { url =>
      assert(enricher(url).classify("Bolsa sobe", 0L) ===
        (("Positiva", "Economia", 0.93)))
    }
  }

  test("out-of-domain values come back raw; enrichBatch clamps them to Erro") {
    withStub { _ =>
      (200, envelope("""{"sentiment":"Great","category":"Sports","confidence":1.7}"""))
    } { url =>
      // the classify layer returns what the service said...
      assert(enricher(url).classify("x", 0L) === (("Great", "Sports", 1.7)))
    }
  }

  test("missing keys default to the Erro sentinel values like the reference") {
    withStub { _ => (200, envelope("""{"confidence":0.5}""")) } { url =>
      assert(enricher(url).classify("x", 0L) === (("Erro", "Erro", 0.5)))
    }
  }

  test("malformed content JSON throws; enrichBatch maps it to a sentinel row") {
    withStub { _ => (200, envelope("not json at all")) } { url =>
      intercept[Exception](enricher(url).classify("x", 0L))
    }
  }

  test("persistent 500s exhaust retries and throw (sentinel at the row layer)") {
    var calls = 0
    withStub { _ => calls += 1; (500, "{}") } { url =>
      intercept[Exception](enricher(url).classify("x", 0L))
      assert(calls === 3, "maxRetries=2 plus the final attempt")
    }
  }

  test("transient 500 recovers within the retry budget") {
    var calls = 0
    withStub { _ =>
      calls += 1
      if (calls == 1) (500, "{}")
      else (200, envelope("""{"sentiment":"Neutra","category":"Outros","confidence":0.4}"""))
    } { url =>
      assert(enricher(url).classify("x", 0L) === (("Neutra", "Outros", 0.4)))
    }
  }

  test("retry backoff keeps a floor even with the throttle disabled") {
    // throttleMillis=0 must not mean zero backoff: with maxRetries=2
    // the two retry sleeps are max(0,50)*1 + max(0,50)*2 = 150ms, so
    // a persistent-500 run takes at least that long — immediate-retry
    // hammering would finish in single-digit ms
    var calls = 0
    withStub { _ => calls += 1; (500, "{}") } { url =>
      val t0 = System.nanoTime()
      intercept[Exception](enricher(url).classify("x", 0L))
      val elapsedMs = (System.nanoTime() - t0) / 1000000L
      assert(calls === 3)
      assert(elapsedMs >= 140, s"retries fired too fast (${elapsedMs}ms) — backoff floor lost")
    }
  }

  test("enrichBatch end-to-end over the stub: clamps, sentinels, row parity with mock") {
    import spark.implicits._
    val now = Timestamp.valueOf("2026-01-02 03:04:05")
    val bronze = Seq(
      RawHeadline("Economia cresce no trimestre", "https://g1/a", "g1", now),
      RawHeadline("Time vence final", "https://g1/b", "g1", now),
      RawHeadline("Manchete quebrada", "https://g1/c", "g1", now)
    ).toDS()
    withStub { body =>
      if (body.contains("Economia cresce"))
        (200, envelope("""{"sentiment":"Positiva","category":"Economia","confidence":0.9}"""))
      else if (body.contains("Time vence"))
        // out-of-domain category → clamped to Erro by enrichBatch
        (200, envelope("""{"sentiment":"Positiva","category":"Futebol","confidence":0.8}"""))
      else (500, "{}") // hard failure → full sentinel row
    } { url =>
      val rows = Enrich.enrichBatch(spark, bronze, enricher(url), now)
        .collect().sortBy(_.raw_link)
      assert(rows.length === 3, "failures never drop rows")
      assert(rows(0).sentiment === "Positiva" && rows(0).category === "Economia")
      assert(rows(1).sentiment === "Positiva" && rows(1).category === "Erro")
      assert(rows(2).sentiment === "Erro" && rows(2).category === "Erro"
        && rows(2).confidence_score === 0.0)
      // same schema/shape as the deterministic mock path
      val mock = Enrich.enrichBatch(spark, bronze, MockEnricher, now).collect()
      assert(mock.length === rows.length)
      assert(rows.head.model_used === mock.head.model_used)
    }
  }
}
