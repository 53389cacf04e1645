package graft.api

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

class ResponseCacheSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()
  private def node(v: String) = {
    val n = mapper.createObjectNode(); n.put("v", v); n
  }

  test("hits within ttl, recomputes after expiry") {
    var nowMs = 0L
    val cache = new ResponseCache(() => nowMs)
    var computes = 0
    def get() = cache.getOrCompute("k", ttlMs = 100) { computes += 1; node("a") }
    assert(get().get("v").asText == "a" && computes == 1)
    nowMs = 99
    assert(get().get("v").asText == "a" && computes == 1) // cache hit
    nowMs = 100
    assert(get().get("v").asText == "a" && computes == 2) // expired
  }

  test("keys cache independently; ttl<=0 bypasses") {
    var nowMs = 0L
    val cache = new ResponseCache(() => nowMs)
    var computes = 0
    cache.getOrCompute("a", 100) { computes += 1; node("1") }
    cache.getOrCompute("b", 100) { computes += 1; node("2") }
    assert(computes == 2 && cache.size == 2)
    cache.getOrCompute("c", 0) { computes += 1; node("3") }
    cache.getOrCompute("c", 0) { computes += 1; node("3") }
    assert(computes == 4 && cache.size == 2) // never stored
  }

  test("returned nodes are copies: mutation cannot poison the cache") {
    val cache = new ResponseCache(() => 0L)
    val out = cache.getOrCompute("k", 1000)(node("clean"))
    out.put("v", "dirty")
    assert(cache.getOrCompute("k", 1000)(node("never")).get("v").asText == "clean")
  }

  test("distinct live keys stay bounded by maxEntries, oldest evicted") {
    var nowMs = 0L
    val cache = new ResponseCache(() => nowMs, maxEntries = 3)
    (1 to 10).foreach { i =>
      nowMs = i // distinct, unexpired keys (ttl far exceeds the run)
      cache.getOrCompute(s"k$i", 1000000)(node(i.toString))
    }
    assert(cache.size <= 3)
    // the newest key survived; the oldest were evicted
    var fresh = 0
    val latest = cache.getOrCompute("k10", 1000000) { fresh += 1; node("x") }
    assert(fresh == 0 && latest.get("v").asText == "10")
    cache.getOrCompute("k1", 1000000) { fresh += 1; node("re") }
    assert(fresh == 1)
  }

  test("concurrent identical requests share one computation (single flight)") {
    val cache = new ResponseCache(() => 0L)
    val computes = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val results = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = {
            gate.await()
            cache.getOrCompute("k", 1000) {
              computes.incrementAndGet()
              Thread.sleep(50) // a slow "Spark query"
              node("once")
            }.get("v").asText
          }
        })
      }
      gate.countDown()
      assert(results.map(_.get()).forall(_ == "once"))
      assert(computes.get() == 1, "stampede: query ran more than once")
    } finally pool.shutdown()
  }

  test("a failed computation deregisters so the next caller retries") {
    val cache = new ResponseCache(() => 0L)
    intercept[RuntimeException] {
      cache.getOrCompute("k", 1000)(throw new RuntimeException("boom"))
    }
    assert(cache.getOrCompute("k", 1000)(node("ok")).get("v").asText == "ok")
  }

  test("sweep drops only expired entries") {
    var nowMs = 0L
    val cache = new ResponseCache(() => nowMs)
    cache.getOrCompute("short", 10)(node("s"))
    cache.getOrCompute("long", 1000)(node("l"))
    nowMs = 500
    assert(cache.sweep() == 1 && cache.size == 1)
  }
}
