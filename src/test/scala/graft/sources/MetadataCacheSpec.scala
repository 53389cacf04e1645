package graft.sources

import java.util.concurrent.CountDownLatch
import java.util.concurrent.atomic.AtomicInteger
import graft.SparkSpec
import graft.sources.SnmpPoller.IfInfo
import graft.streaming.Enrichment
import org.apache.spark.sql.functions._

/** Reference cache semantics (`outlet/metadata/root.go`): single-flight
  * misses, access-based expiry, age-based refresh, negative caching —
  * then the full J3 path: poller → cache → broadcast dimension →
  * `withMetadata` join.
  */
class MetadataCacheSpec extends SparkSpec {

  private def info(n: String) = Some(IfInfo("r1", n, s"$n desc", 1000L))

  test("miss polls once; hits are free; negative answers cache too") {
    val polls = new AtomicInteger
    var now = 0L
    val c = MetadataCache.single((e, i) => { polls.incrementAndGet()
        if (i == 404L) None else info(s"if$i") },
      cacheDurationMs = 100L, refreshAfterMs = 100L, clock = () => now)
    assert(c.lookup("10.0.0.1", 1).map(_.name).contains("if1"))
    assert(c.lookup("10.0.0.1", 1).map(_.name).contains("if1"))
    assert(polls.get() == 1)
    // a failed poll is remembered — no storm on a dead exporter
    assert(c.lookup("10.0.0.1", 404).isEmpty)
    assert(c.lookup("10.0.0.1", 404).isEmpty)
    assert(polls.get() == 2)
    assert(c.stats("hits") == 2 && c.stats("misses") == 2)
  }

  test("concurrent lookups for one key coalesce into one poll") {
    val polls = new AtomicInteger
    val gate = new CountDownLatch(1)
    val c = MetadataCache.single((_, i) => { polls.incrementAndGet()
        gate.await(); info(s"if$i") },
      cacheDurationMs = 1000L, refreshAfterMs = 1000L, clock = () => 0L)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to 4).map(_ => new Thread(() =>
      c.lookup("10.0.0.1", 7).foreach(r => results.add(r.name))))
    threads.foreach(_.start())
    Thread.sleep(100) // let every thread reach the miss path
    gate.countDown()
    threads.foreach(_.join(5000))
    assert(polls.get() == 1, s"expected one coalesced poll, got ${polls.get()}")
    assert(results.size == 4)
  }

  test("unaccessed entries expire; old entries refresh in place") {
    val polls = new AtomicInteger
    var now = 0L
    val c = MetadataCache.single((_, i) => { polls.incrementAndGet()
        info(s"v${polls.get()}") },
      cacheDurationMs = 100L, refreshAfterMs = 200L, clock = () => now)
    c.lookup("e", 1) // retrieved at 0
    c.lookup("e", 2)
    now = 90
    c.lookup("e", 2) // keeps 2 alive
    now = 150 // 1 unaccessed for 150 > 100 → expire; 2 accessed at 90 → stays
    assert(c.expireAndRefresh() == (1, 0))
    assert(c.size == 1)
    now = 250 // entry 2 retrieved at 0: age 250 > 200 → refresh re-polls
    c.lookup("e", 2) // access keeps it alive at 250
    assert(c.expireAndRefresh() == (0, 1))
    val refreshedName = c.lookup("e", 2).get.name
    assert(refreshedName == s"v${polls.get()}", "refresh must swap in the new answer")
  }

  test("provider mux: ordered, first answer wins, per-provider counters") {
    // reference outlet/metadata/root.go:81-90 — static config answers
    // first; SNMP is only asked for what static misses; a provider that
    // THROWS is skipped, not fatal
    val staticPolls = new AtomicInteger
    val snmpPolls = new AtomicInteger
    val c = new MetadataCache(Seq(
      "static" -> ((_: String, i: Long) => { staticPolls.incrementAndGet()
        if (i == 1L) info("static-if1") else None }),
      "broken" -> ((_: String, _: Long) =>
        throw new RuntimeException("gnmi down")),
      "snmp" -> ((_: String, i: Long) => { snmpPolls.incrementAndGet()
        if (i == 404L) None else info(s"snmp-if$i") })),
      cacheDurationMs = 1000L, refreshAfterMs = 1000L, clock = () => 0L)
    // static answers if1: snmp never asked for it
    assert(c.lookup("e", 1).map(_.name).contains("static-if1"))
    assert(staticPolls.get() == 1 && snmpPolls.get() == 0)
    // static misses if2, broken throws, snmp answers
    assert(c.lookup("e", 2).map(_.name).contains("snmp-if2"))
    assert(c.stats("provider_hits_static") == 1)
    assert(c.stats("provider_misses_static") == 1)
    assert(c.stats("provider_errors_broken") == 1)
    assert(c.stats("provider_hits_snmp") == 1)
    // everyone misses 404 → negative answer caches like any other
    assert(c.lookup("e", 404).isEmpty)
    assert(c.lookup("e", 404).isEmpty)
    assert(c.stats("provider_misses_snmp") == 1, "negative answer re-polled")
    assert(c.stats("hits") == 1)
  }

  test("refresh failures are contained, counted, and excluded from the result") {
    var now = 0L
    val polls = new AtomicInteger
    val c = new MetadataCache(Seq(
      "flaky" -> ((_: String, i: Long) => {
        val n = polls.incrementAndGet()
        // first poll of each key answers; the refresh round throws for
        // key 1 only (simulating one dead exporter among live ones)
        if (now > 0 && i == 1L) throw new RuntimeException("timeout")
        info(s"v$n")
      })),
      cacheDurationMs = 1000L, refreshAfterMs = 1000L, clock = () => now)
    val v1 = c.lookup("e", 1).get.name
    c.lookup("e", 2)
    now = 500
    c.lookup("e", 1); c.lookup("e", 2) // keep both access-alive
    now = 1200 // both age-stale; key 1's refresh throws, key 2's lands
    val (expired, refreshed) = c.expireAndRefresh()
    assert(expired == 0)
    assert(refreshed == 1, s"only the successful refresh counts, got $refreshed")
    assert(c.stats("provider_errors_flaky") == 1)
    assert(c.stats("refresh_failures") == 1)
    assert(c.size == 2)
    // the fully-errored refresh kept key 1's known-good entry…
    assert(c.lookup("e", 1).map(_.name).contains(v1),
      "transient refresh failure wiped a known-good entry")
    // …while key 2 swapped in the new value
    assert(c.lookup("e", 2).isDefined)
    c.close()
    c.close() // idempotent
    // a ticker firing after close() must not throw: the rejected
    // refreshes count as failures and the entries survive untouched
    now = 2400
    c.lookup("e", 1); c.lookup("e", 2) // keep access-alive at 2400
    now = 2600
    val (exp2, ref2) = c.expireAndRefresh()
    assert(exp2 == 0 && ref2 == 0)
    assert(c.stats("refresh_failures") >= 3)
    assert(c.size == 2)
  }

  test("an all-errored lookup poll caches born-stale: throttled now, retried next tick") {
    // transient outage on first contact: every provider THROWS once,
    // then recovers. Flow-plane lookups must NOT pay a blocking
    // provider chain per flow (the entry caches), but the miss must
    // not freeze for refreshAfterMs either — the back-dated entry is
    // stale to the very next ticker cycle, which heals it
    val calls = new AtomicInteger
    val c = new MetadataCache(Seq(
      "flaky" -> ((_: String, i: Long) => {
        if (calls.incrementAndGet() == 1) throw new RuntimeException("boom")
        info(s"if$i")
      })),
      cacheDurationMs = 1000L, refreshAfterMs = 1000L, clock = () => 0L)
    assert(c.lookup("e", 1).isEmpty) // outage: negative answer served
    assert(c.stats("poll_failures") == 1)
    assert(c.size == 1)
    assert(c.lookup("e", 1).isEmpty, "hot key re-polled before the ticker")
    assert(c.stats("polls") == 1 && c.stats("hits") == 1)
    // the very next ticker cycle retries (entry is born-stale) and heals
    val (_, refreshed) = c.expireAndRefresh()
    assert(refreshed == 1)
    assert(c.lookup("e", 1).map(_.name).contains("if1"))
  }

  test("rejects refresh below duration like the reference") {
    intercept[IllegalArgumentException] {
      MetadataCache.single((_, _) => None, cacheDurationMs = 100, refreshAfterMs = 50)
    }
  }

  test("the cache snapshot joins flows end to end") {
    val c = MetadataCache.single((e, i) => info(s"eth$i"),
      cacheDurationMs = 1000L, refreshAfterMs = 1000L, clock = () => 0L)
    c.lookup("10.0.0.9", 1)
    c.lookup("10.0.0.9", 2)

    import spark.implicits._
    val flows = Seq((100L, 1L, 2L), (50L, 9L, 9L))
      .toDF("Bytes", "InIfIndex", "OutIfIndex")
      .withColumn("ExporterAddress", lit(graft.functions.Ip.parse("10.0.0.9")))
    val out = Enrichment.withMetadata(flows,
      Enrichment.MetadataDim(c.toDim(spark))).collect()
    // the unknown-interface flow drops (reference enricher.go:82-89)
    assert(out.length == 1)
    assert(out(0).getAs[String]("InIfName") == "eth1")
    assert(out(0).getAs[String]("OutIfName") == "eth2")
    assert(out(0).getAs[String]("ExporterName") == "r1")
    assert(out(0).getAs[Long]("InIfSpeed") == 1000L)
  }
}
