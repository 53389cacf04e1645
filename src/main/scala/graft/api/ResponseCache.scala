package graft.api

import java.util.concurrent.CompletableFuture
import com.fasterxml.jackson.databind.node.ObjectNode

/** TTL response cache for the console API — the reference caches query
  * results keyed by the request body for `CacheTTL` (3 h,
  * `console/config.go:109`, applied at `console/root.go:113-114`) and
  * widget endpoints for 5 s–5 min (`console/root.go:108-112`). A repeated
  * dashboard poll hits the cache instead of re-running the Spark query —
  * on a shared console that is the difference between one scan per
  * refresh interval and one per viewer.
  *
  * Per-key single flight: entries are `CompletableFuture`s registered
  * before computing, so N concurrent identical requests (a shared
  * dashboard refresh landing together) run the expensive Spark query ONCE
  * and share the result — the stampede the cache exists to absorb. A
  * failed computation deregisters itself so the next caller retries.
  *
  * The clock is injectable so expiry is testable; nodes are deep-copied
  * both ways (Jackson nodes are mutable). Expired entries are dropped
  * lazily on probe and by [[sweep]] (bounded memory without a timer
  * thread).
  */
final class ResponseCache(now: () => Long = () => System.currentTimeMillis(),
    maxEntries: Int = 10000) {

  private final case class Entry(atMs: Long, ttlMs: Long, value: ObjectNode)
  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, CompletableFuture[Entry]]()

  private def fresh(e: Entry): Boolean = now() - e.atMs < e.ttlMs

  /** Cached value for `key` if fresh, else compute (once across concurrent
    * callers), store, return. TTL ≤ 0 bypasses the cache entirely.
    */
  def getOrCompute(key: String, ttlMs: Long)(f: => ObjectNode): ObjectNode = {
    if (ttlMs <= 0) return f
    while (true) {
      val existing = entries.get(key)
      if (existing != null) {
        // join() outside any lock: concurrent distinct keys never block
        val e = try existing.join() catch {
          case _: java.util.concurrent.CompletionException => null
        }
        if (e != null && fresh(e)) return e.value.deepCopy()
        // stale or failed: deregister this future (only it) and retry
        entries.remove(key, existing)
      } else {
        val mine = new CompletableFuture[Entry]()
        if (entries.putIfAbsent(key, mine) == null) {
          val v = try f catch {
            case t: Throwable =>
              entries.remove(key, mine)
              mine.completeExceptionally(t)
              throw t
          }
          mine.complete(Entry(now(), ttlMs, v.deepCopy()))
          evictIfNeeded()
          return v
        }
        // lost the registration race: loop and join the winner
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Sweep expired entries, then evict the oldest completed entries while
    * over `maxEntries` — memory stays bounded even when each request
    * carries a fresh key (a moving time-window dashboard, or an
    * adversarial client minting bodies). In-flight computations are never
    * evicted (their callers still hold the future).
    */
  private def evictIfNeeded(): Unit = {
    sweep()
    if (entries.size >= maxEntries) {
      entries.entrySet().stream()
        .filter(e => e.getValue.isDone && !e.getValue.isCompletedExceptionally)
        .sorted(java.util.Comparator.comparingLong[
          java.util.Map.Entry[String, CompletableFuture[Entry]]](
          _.getValue.join().atMs))
        .limit(math.max(1L, entries.size - maxEntries + 1L))
        .forEach(old => entries.remove(old.getKey, old.getValue))
    }
  }

  /** Drop every expired completed entry; returns the number removed. */
  def sweep(): Int = {
    var removed = 0
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val fut = e.getValue
      if (fut.isDone && !fut.isCompletedExceptionally && !fresh(fut.join())) {
        it.remove(); removed += 1
      }
    }
    removed
  }

  def invalidateAll(): Unit = entries.clear()
  def size: Int = entries.size()
}
