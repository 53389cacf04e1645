package graft.api

import com.fasterxml.jackson.databind.node.ObjectNode

/** TTL response cache for the console API — the reference caches query
  * results keyed by the request body for `CacheTTL` (3 h,
  * `console/config.go:109`, applied at `console/root.go:113-114`) and
  * widget endpoints for 5 s–5 min (`console/root.go:108-112`). A repeated
  * dashboard poll hits the cache instead of re-running the Spark query —
  * on a shared console that is the difference between one scan per
  * refresh interval and one per viewer.
  *
  * The clock is injectable so expiry is testable; entries are deep-copied
  * both ways (Jackson nodes are mutable). Expired entries are dropped
  * lazily on probe and by [[sweep]] (bounded memory without a timer
  * thread).
  */
final class ResponseCache(now: () => Long = () => System.currentTimeMillis(),
    maxEntries: Int = 10000) {

  private final case class Entry(atMs: Long, ttlMs: Long, value: ObjectNode)
  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** Cached value for `key` if fresh, else compute, store, return. TTL ≤ 0
    * bypasses the cache entirely.
    *
    * Every store first sweeps expired entries, and if the cache is still
    * at `maxEntries` the oldest-stored entries are evicted — memory stays
    * bounded even when each request carries a fresh key (a moving
    * time-window dashboard, or an adversarial client minting bodies).
    */
  def getOrCompute(key: String, ttlMs: Long)(f: => ObjectNode): ObjectNode = {
    if (ttlMs <= 0) return f
    val e = entries.get(key)
    if (e != null && now() - e.atMs < e.ttlMs) return e.value.deepCopy()
    val v = f
    sweep()
    if (entries.size >= maxEntries) {
      // evict the oldest stores until under the cap (rare path: only when
      // maxEntries distinct keys are live and unexpired)
      entries.entrySet().stream()
        .sorted(java.util.Comparator.comparingLong[
          java.util.Map.Entry[String, Entry]](_.getValue.atMs))
        .limit(math.max(1L, entries.size - maxEntries + 1L))
        .forEach(old => entries.remove(old.getKey))
    }
    entries.put(key, Entry(now(), ttlMs, v.deepCopy()))
    v
  }

  /** Drop every expired entry; returns the number removed. */
  def sweep(): Int = {
    var removed = 0
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (now() - e.getValue.atMs >= e.getValue.ttlMs) { it.remove(); removed += 1 }
    }
    removed
  }

  def invalidateAll(): Unit = entries.clear()
  def size: Int = entries.size()
}
