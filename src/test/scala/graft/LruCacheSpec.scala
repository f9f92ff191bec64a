package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.identity.LruCache

class LruCacheSpec extends AnyFunSuite {

  test("caches and counts hits/misses") {
    val c = new LruCache[String, String](maxEntries = 10)
    var computes = 0
    def get(k: String) = c.getOrElseUpdate(k, { computes += 1; k + "!" })
    assert(get("a") == "a!" && get("a") == "a!" && computes == 1)
    assert(c.hits.sum() == 1 && c.misses.sum() == 1)
  }

  test("evicts least-recently-used beyond maxEntries") {
    val c = new LruCache[Int, Int](maxEntries = 3)
    (1 to 3).foreach(i => c.getOrElseUpdate(i, i))
    c.getOrElseUpdate(1, 1) // touch 1 → 2 is now LRU
    c.getOrElseUpdate(4, 4) // evicts 2
    assert(c.size == 3)
    var recomputed = false
    c.getOrElseUpdate(2, { recomputed = true; 2 })
    assert(recomputed, "evicted key must be recomputed")
  }

  test("TTL expiry (reference: 10-minute TTL, server.ts:249-252)") {
    var now = 0L
    val c = new LruCache[String, Int](maxEntries = 10, ttlMs = 1000,
      clock = () => now)
    c.getOrElseUpdate("k", 1)
    now = 999
    assert(c.getOrElseUpdate("k", 2) == 1, "within TTL → cached")
    now = 1001
    assert(c.getOrElseUpdate("k", 3) == 3, "past TTL → recomputed")
  }
}
