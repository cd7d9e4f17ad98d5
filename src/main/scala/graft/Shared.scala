package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-session registry of shared materializations.
  *
  * Several query families recompute the same intermediate from scratch on
  * every call — the `cdc_*` queries each rebuild `Changelog.synthetic`
  * (4 scans of `orders` + a union), and the dedup ladder re-tokenizes the
  * corpus into `docShingles` three times. In a real deployment these are
  * maintained *indexes* of the pipeline, built once per dataset and shared
  * by every downstream query; this registry gives them exactly that
  * lifecycle inside one SparkSession: the first caller pays one
  * `localCheckpoint` (truncated lineage, cluster-cached blocks), every
  * later query over the same `sfDir` reads the blocks.
  *
  * The blocks are deliberately NOT released by per-query cache cleanup
  * ([[releaseTransient]] spares them): they are bounded, data-proportional
  * index state (a changelog and a shingle index), not per-query scratch.
  * Keyed by `sessionUUID` — collision-free across session restarts (an
  * identity-hash key could alias a stopped session's entry onto a new
  * session and hand out a DataFrame bound to a dead SparkContext).
  * Entries of stopped sessions are small driver-side plan objects, never
  * executor memory.
  */
object Shared {
  private val memo = TrieMap.empty[(String, String, String), (SparkSession, DataFrame)]
  private val shared = TrieMap.empty[Int, Unit]

  /** Session identity: applicationId (changes across context restarts) +
    * identity hash. Identity hashes are not unique, so hits additionally
    * require the SAME session object (`eq`) — a collision with a stopped
    * session's entry rebuilds instead of handing out a DataFrame bound to
    * a dead SparkContext.
    */
  private def sessionKey(s: SparkSession): String =
    s.sparkContext.applicationId + "#" + System.identityHashCode(s)

  /** Memoized `build.localCheckpoint()` for (session, dir, key). */
  def materialize(s: SparkSession, dir: String, key: String)(build: => DataFrame): DataFrame =
    synchronized {
      val k = (sessionKey(s), dir, key)
      memo.get(k) match {
        case Some((sess, df)) if sess eq s => df
        case _ =>
          val ck = build.localCheckpoint() // eager: blocks exist when this returns
          // The checkpointed Dataset's plan IS a LogicalRDD over the
          // persisted RDD — read its id directly instead of diffing
          // getPersistentRDDs around the build (a diff would misclassify
          // any RDD a CONCURRENT query happens to persist in the window,
          // pinning per-query scratch for the session's lifetime).
          ck.queryExecution.analyzed.collect {
            case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
          }.foreach(id => shared.put(id, ()))
          memo.put(k, (s, ck))
          ck
      }
    }

  /** Unpersist every persistent RDD except the shared materializations.
    *
    * `spark.catalog.clearCache()` drops `cache()`d plans but not
    * `localCheckpoint` blocks (they live outside the CacheManager), so
    * iterative operators would otherwise accumulate superseded round
    * state across a 50-query Verify/Bench session. Call between queries,
    * AFTER the query's result has been consumed — a localCheckpoint's
    * lineage is truncated, so its blocks must outlive its readers.
    */
  def releaseTransient(s: SparkSession): Unit =
    s.sparkContext.getPersistentRDDs.valuesIterator
      .filter(r => !shared.contains(r.id))
      .foreach(_.unpersist(blocking = false))
}
