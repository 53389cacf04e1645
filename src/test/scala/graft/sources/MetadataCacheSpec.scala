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
    val c = new MetadataCache((e, i) => { polls.incrementAndGet()
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
    val c = new MetadataCache((_, i) => { polls.incrementAndGet()
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
    val c = new MetadataCache((_, i) => { polls.incrementAndGet()
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

  test("rejects refresh below duration like the reference") {
    intercept[IllegalArgumentException] {
      new MetadataCache((_, _) => None, cacheDurationMs = 100, refreshAfterMs = 50)
    }
  }

  test("the cache snapshot joins flows end to end") {
    val c = new MetadataCache((e, i) => info(s"eth$i"),
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
