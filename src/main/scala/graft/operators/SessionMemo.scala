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

  /** Non-frame model artifacts (a Bloom sketch's broadcast, a trained
    * quantizer, …) memoized with the same lifecycle: built once per
    * (session, key, dir), dropped by [[release]]. Released broadcasts
    * are UNPERSISTED, not destroyed: DataFrames returned before the
    * release still capture the broadcast in their UDF closures, and
    * unpersist only evicts executor copies (they re-fetch from the
    * driver on next use) while destroy would make re-executing such a
    * frame throw. Only a build-race loser — a broadcast that was never
    * handed to any caller — is destroyed outright.
    */
  private val objects =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), AnyRef]()

  def memo[T <: AnyRef](key: String, s: SparkSession, dir: String)
      (build: => T): T = {
    val k = (s, key, dir)
    val existing = objects.get(k)
    if (existing != null) existing.asInstanceOf[T]
    else {
      val built = build
      val prev = objects.putIfAbsent(k, built)
      if (prev != null) {
        destroyUnshared(built)
        prev.asInstanceOf[T]
      } else built
    }
  }

  /** The race loser was never returned to a caller — safe to destroy. */
  private def destroyUnshared(v: AnyRef): Unit = v match {
    case b: org.apache.spark.broadcast.Broadcast[_] => b.destroy()
    case _ => ()
  }

  /** Release path: frames handed out earlier may still reference the
    * broadcast, so only evict executor copies. */
  private def releaseArtifact(v: AnyRef): Unit = v match {
    case b: org.apache.spark.broadcast.Broadcast[_] => b.unpersist()
    case _ => ()
  }

  def release(s: SparkSession): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq s) { e.getValue.unpersist(); it.remove() }
    }
    val oit = objects.entrySet().iterator()
    while (oit.hasNext) {
      val e = oit.next()
      if (e.getKey._1 eq s) { releaseArtifact(e.getValue); oit.remove() }
    }
  }
}
