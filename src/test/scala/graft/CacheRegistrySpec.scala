package graft

import graft.operators.CacheRegistry
import org.apache.spark.storage.StorageLevel

/** The bounded persist registry: reuse on same-result plans, LRU eviction
  * past the cap — the fix for per-call `.persist()` accumulating cache
  * entries without bound in a long-lived session. */
class CacheRegistrySpec extends SparkSpec {
  import spark.implicits._

  test("same-result plans share one persisted entry") {
    CacheRegistry.clear()
    val a = CacheRegistry.persistBounded(
      Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text"))
    val b = CacheRegistry.persistBounded(
      Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text"))
    assert(a eq b, "second registration must return the first frame")
    assert(CacheRegistry.liveCount === 1)
    assert(a.storageLevel === StorageLevel.MEMORY_AND_DISK)
    CacheRegistry.clear()
  }

  test("registrations past the cap evict the least-recently-used entry") {
    CacheRegistry.clear()
    val frames = (0 until CacheRegistry.MaxEntries + 4).map { i =>
      CacheRegistry.persistBounded(
        Seq((i.toLong, s"doc $i body")).toDF("doc_id", "text"))
    }
    assert(CacheRegistry.liveCount === CacheRegistry.MaxEntries)
    // the 4 oldest were unpersisted; the newest still hold their level
    frames.take(4).foreach(f => assert(f.storageLevel === StorageLevel.NONE))
    frames.takeRight(4).foreach(f => assert(f.storageLevel === StorageLevel.MEMORY_AND_DISK))
    CacheRegistry.clear()
    assert(CacheRegistry.liveCount === 0)
  }

  test("operators route their shared subtrees through the registry") {
    CacheRegistry.clear()
    val docs = (1 to 30).map(i =>
      (i.toLong, s"alpha beta gamma delta w$i x${i % 5} y${i % 3} z common tail")).toDF("doc_id", "text")
    // contamination persists the eval shingles; adaptiveQualityFilter the
    // ranked corpus — both must land in the registry, and a repeat call
    // must not add entries.
    graft.operators.DataHygiene.contamination(docs, docs).collect()
    val afterFirst = CacheRegistry.liveCount
    assert(afterFirst >= 1, "contamination must register its shared shingles")
    graft.operators.DataHygiene.contamination(docs, docs).collect()
    assert(CacheRegistry.liveCount === afterFirst, "repeat call must reuse, not stack")
    graft.operators.DataHygiene.adaptiveQualityFilter(docs).collect()
    assert(CacheRegistry.liveCount <= CacheRegistry.MaxEntries)
    CacheRegistry.clear()
  }
}
