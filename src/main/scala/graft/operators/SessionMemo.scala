package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped memo of persisted intermediate frames (the shingle
  * relation, LSH signature index, norm-annotated embeddings, …).
  *
  * A `def` that persisted a fresh frame per call would re-register the
  * same plan with the CacheManager on every query invocation ("already
  * cached" warnings) and never unpersist; building each plan exactly
  * once per (session, key, dir) keeps the cache footprint constant in a
  * long-lived session. This is also the 100 TB shape: a signature or
  * shingle index is materialized once and shared by every query that
  * probes it, not recomputed per plan branch.
  *
  * `release(session)` drops a session's entries (Bench/Verify teardown,
  * spec afterAll) so long-lived processes touching many dirs don't
  * accumulate MEMORY_AND_DISK frames (VERDICT r3 #6).
  */
object SessionMemo {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  /** REENTRANT memoization: an index build may itself memoize its
    * inputs (cappedPosts → docShingles), and `computeIfAbsent` throws
    * "Recursive update" when the mapping function touches the same
    * map — so build OUTSIDE the map operation and race with
    * putIfAbsent (a concurrent loser unpersists its duplicate).
    */
  def persist(key: String, s: SparkSession, dir: String)
      (build: => DataFrame): DataFrame = {
    val k = (s, key, dir)
    val existing = cache.get(k)
    if (existing != null) existing
    else {
      val built = build.persist(StorageLevel.MEMORY_AND_DISK)
      val prev = cache.putIfAbsent(k, built)
      if (prev != null) { built.unpersist(); prev } else built
    }
  }

  def release(s: SparkSession): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq s) { e.getValue.unpersist(); it.remove() }
    }
  }
}
