package graft.sources

import java.util.concurrent.{CompletableFuture, ConcurrentHashMap}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.SnmpPoller.IfInfo

/** Interface-metadata cache between the flow plane and its pollers —
  * the reference's `outlet/metadata/root.go` semantics:
  *
  *  - **provider mux** (`root.go:39,81-90`): an ORDERED list of named
  *    providers (static config → SNMP → gNMI…); a lookup asks each in
  *    turn and the first answer wins. Per-provider hit/error counters
  *    land in [[stats]]. A provider that throws is skipped (counted),
  *    so a broken poller degrades to the next provider instead of
  *    failing the lookup.
  *  - **access-based expiry** (`CacheDuration`, default 30 m): an entry
  *    nobody looks up falls out at the next ticker run;
  *  - **age-based refresh** (`CacheRefresh`, default 1 h ≥ duration): an
  *    entry retrieved long ago re-polls proactively so interface renames
  *    propagate without a lookup storm;
  *  - **single-flight misses** (`root.go:185` `sf.Do`): concurrent
  *    lookups for one (exporter, ifIndex) coalesce into one poll;
  *  - negative answers cache too — a dead exporter is asked once per
  *    ticker cycle, not once per flow.
  *
  * [[expireAndRefresh]] is the `CacheCheckInterval` ticker body — the
  * caller owns scheduling, like every other lifecycle hook in graft.
  * The flow plane never calls [[lookup]] from a task: [[toDim]]
  * snapshots the cache into the broadcast dimension frame that
  * [[graft.streaming.Enrichment.withMetadata]] joins, so executors see
  * immutable rows and cache mutation stays driver-side, at SNMP rate.
  */
final class MetadataCache(
    providers: Seq[(String, (String, Long) => Option[IfInfo])],
    cacheDurationMs: Long = 30L * 60 * 1000,
    refreshAfterMs: Long = 60L * 60 * 1000,
    clock: () => Long = () => System.currentTimeMillis()) {
  require(refreshAfterMs >= cacheDurationMs,
    "cache refresh must be greater than cache duration (reference root.go:61-63)")
  require(providers.nonEmpty, "at least one metadata provider required")

  private final case class Entry(info: Option[IfInfo], retrievedAt: Long,
      accessedAt: AtomicLong)

  private val entries = new ConcurrentHashMap[(String, Long), Entry]()
  private val inFlight =
    new ConcurrentHashMap[(String, Long), CompletableFuture[Option[IfInfo]]]()
  // refresh polls run on this bounded pool (the reference refreshes in
  // goroutines, root.go expireCache): a batch of stale entries for dead
  // exporters costs ~one poll timeout total, not one EACH, and expiry
  // is never queued behind them
  private val refreshPool = java.util.concurrent.Executors.newFixedThreadPool(8,
    (r: Runnable) => {
      val t = new Thread(r, "metadata-refresh"); t.setDaemon(true); t
    })
  private val counters = new ConcurrentHashMap[String, AtomicLong]()
  private def bump(k: String): Unit =
    counters.computeIfAbsent(k, _ => new AtomicLong).incrementAndGet()

  def stats: Map[String, Long] = {
    val b = Map.newBuilder[String, Long]
    counters.forEach((k, v) => b += k -> v.get())
    b.result()
  }

  /** Ordered break-on-first-answer across the provider list (reference
    * `outlet/metadata/root.go:81-90`): later providers are only asked
    * when every earlier one misses. Returns (answer, answered):
    * `answered` is false only when EVERY provider threw — an
    * authoritative all-miss is (None, true) and negative-caches like
    * any single-provider miss, while a fully-errored poll lets the
    * caller keep a known-good entry instead of wiping it.
    */
  private def pollMux(exporter: String, ifIndex: Long): (Option[IfInfo], Boolean) = {
    var answered = false
    val it = providers.iterator
    while (it.hasNext) {
      val (name, p) = it.next()
      try p(exporter, ifIndex) match {
        case some @ Some(_) => bump(s"provider_hits_$name"); return (some, true)
        case None => bump(s"provider_misses_$name"); answered = true
      } catch {
        case scala.util.control.NonFatal(_) => bump(s"provider_errors_$name")
      }
    }
    (None, answered)
  }

  /** Cached answer for (exporter, ifIndex); polls on miss (coalesced). */
  def lookup(exporter: String, ifIndex: Long): Option[IfInfo] = {
    val key = (exporter, ifIndex)
    val hit = entries.get(key)
    if (hit != null) {
      hit.accessedAt.set(clock())
      bump("hits")
      hit.info
    } else {
      bump("misses")
      val mine = new CompletableFuture[Option[IfInfo]]()
      val race = inFlight.putIfAbsent(key, mine)
      if (race != null) race.join() // someone else is polling — wait
      else {
        try {
          // re-check under the flight slot: a previous winner may have
          // cached the answer between our entries miss and winning
          // putIfAbsent (it removes its slot AFTER putting the entry) —
          // serving the fresh entry avoids the duplicate poll
          val cached = entries.get(key)
          val got =
            if (cached != null) { cached.accessedAt.set(clock()); cached.info }
            else {
              bump("polls")
              // authoritative answers cache normally (Some, or an
              // all-providers MISS — the dead-exporter negative entry).
              // A fully-ERRORED poll caches a BORN-STALE negative entry:
              // lookups still hit it (a persistently-throwing provider —
              // unresolvable hostname, broken poller — must not pay a
              // blocking provider chain per flow), but its retrievedAt
              // is back-dated past refreshAfter so the very next ticker
              // cycle retries it — a transient outage heals in one
              // CacheCheckInterval, not refreshAfterMs.
              val (g, answered) = pollMux(exporter, ifIndex)
              val retrievedAt =
                if (answered) clock() else clock() - refreshAfterMs - 1
              if (!answered) bump("poll_failures")
              entries.put(key, Entry(g, retrievedAt, new AtomicLong(clock())))
              g
            }
          mine.complete(got)
          got
        } catch {
          case e: Throwable => mine.completeExceptionally(e); throw e
        } finally inFlight.remove(key)
      }
    }
  }

  /** Ticker body: drop entries unaccessed for `cacheDuration`, then
    * re-poll entries retrieved more than `refreshAfter` ago — expiry
    * first and synchronously (it is pure map work), refresh polls in
    * PARALLEL on the bounded pool so a batch of stale entries behind
    * dead exporters costs about one poll timeout, not one each (the
    * reference's goroutine refresh, `root.go` expireCache). Returns
    * (expired, successfully refreshed) after every refresh poll has
    * landed, so the caller observes the post-refresh cache; a poll that
    * throws is contained inside its own future (counted under
    * `refresh_failures`), never aborting the sweep or the join loop.
    */
  def expireAndRefresh(): (Int, Int) = {
    val now = clock()
    var expired = 0
    entries.forEach { (key, e) =>
      if (now - e.accessedAt.get() > cacheDurationMs) {
        if (entries.remove(key, e)) { expired += 1; bump("expired") }
      }
    }
    val stale = scala.collection.mutable.ArrayBuffer.empty[((String, Long), Entry)]
    entries.forEach { (key, e) =>
      if (now - e.retrievedAt > refreshAfterMs) stale += ((key, e))
    }
    val refreshedOk = new AtomicInteger
    val polls = stale.flatMap { case (key, e) =>
      try Some(runRefresh(key, e, now, refreshedOk))
      catch {
        // a ticker firing after close(): the pool rejects — count, keep
        // the entry, never throw out of the ticker body
        case _: java.util.concurrent.RejectedExecutionException =>
          bump("refresh_failures"); None
      }
    }
    polls.foreach(_.join())
    (expired, refreshedOk.get())
  }

  private def runRefresh(key: (String, Long), e: Entry, now: Long,
      refreshedOk: AtomicInteger): CompletableFuture[Void] =
    CompletableFuture.runAsync(() => {
        try {
          val (got, answered) = pollMux(key._1, key._2)
          if (answered) {
            entries.put(key, Entry(got, now, e.accessedAt))
            refreshedOk.incrementAndGet()
            bump("refreshed")
          } else {
            // every provider errored: keep the known-good entry (it
            // stays stale and re-tries next ticker) rather than wiping
            // it to a negative answer
            bump("refresh_failures")
          }
        } catch {
          // pollMux already contains provider errors; this guards the
          // entry swap itself so one bad refresh never poisons the batch
          case scala.util.control.NonFatal(_) => bump("refresh_failures")
        }
      }, refreshPool)

  /** Release the refresh pool. Idempotent; the cache stays readable
    * (lookups poll on the caller's thread), only ticker refreshes stop.
    */
  def close(): Unit = { refreshPool.shutdownNow(); () }

  def size: Int = entries.size()

  /** Snapshot as the broadcast metadata dimension
    * ([[graft.streaming.Enrichment.MetadataDim]] columns; the
    * connectivity/provider/boundary attributes come from classifier
    * rules downstream, so they are null here — reference parity: SNMP
    * knows names and speeds, not business roles).
    */
  def toDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Array[Byte], Long, String, String, String, Long)]
    entries.forEach { (key, e) =>
      e.info.foreach { i =>
        rows += ((graft.functions.Ip.parse(key._1), key._2, i.sysName,
          i.name, i.description, i.speedMbps))
      }
    }
    rows.toSeq
      .toDF("exporter_addr", "if_index", "exporter_name", "if_name",
        "if_desc", "if_speed")
      .withColumn("if_connectivity",
        org.apache.spark.sql.functions.lit(null).cast("string"))
      .withColumn("if_provider",
        org.apache.spark.sql.functions.lit(null).cast("string"))
      .withColumn("if_boundary",
        org.apache.spark.sql.functions.lit(null).cast("string"))
  }
}

object MetadataCache {
  /** Single-provider convenience (the pre-mux construction shape). */
  def single(
      poll: (String, Long) => Option[IfInfo],
      cacheDurationMs: Long = 30L * 60 * 1000,
      refreshAfterMs: Long = 60L * 60 * 1000,
      clock: () => Long = () => System.currentTimeMillis()): MetadataCache =
    new MetadataCache(Seq("default" -> poll), cacheDurationMs, refreshAfterMs,
      clock)
}
