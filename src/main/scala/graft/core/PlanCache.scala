package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bounded memo of Spark-cached DataFrames shared between operators
  * within one process — the "compute the common subexpression once
  * per run" discipline for query families that consume the same
  * derived frame (the profiler's bottom-k sample, dedup's
  * postings-pair set). A verify/bench run invokes each query as an
  * independent call, so without this the shared scan is paid once
  * per consumer.
  *
  * Same bounding rationale as [[Tables]]: a DataFrame strongly
  * references its SparkSession, so an unbounded map would retain
  * every session a long-lived process creates. LRU-bounded; evicted
  * entries release their storage blocks via unpersist. Values are
  * built lazily and `.cache()`d, so the first consumer pays the
  * build and later consumers read executor-memory blocks.
  */
final class PlanCache(maxEntries: Int = 16) {
  private val m =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](
        16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame])
          : Boolean =
        if (size() > maxEntries) { e.getValue.unpersist(false); true }
        else false
    }

  /** The cached frame for `key`, building (and `.cache()`ing) it on
    * first use. The build runs OUTSIDE the monitor — plan resolution
    * can do I/O; a racing duplicate is unpersisted, first insert
    * wins. */
  def getOrBuild(spark: SparkSession, key: String)
      (build: => DataFrame): DataFrame = {
    val k = (spark, key)
    val hit = m.synchronized(m.get(k))
    if (hit != null) {
      // harness loops call spark.catalog.clearCache() between queries
      // (block hygiene over a 128-query run); that drops this frame's
      // storage but not the memo. Re-register so the next consumer
      // re-materializes once and sharing resumes — a duplicate
      // cache() race is benign (no-op + log line).
      if (hit.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        hit.cache()
      hit
    } else {
      val built = build.cache()
      m.synchronized {
        val raced = m.get(k)
        if (raced != null) { built.unpersist(false); raced }
        else { m.put(k, built); built }
      }
    }
  }

  /** Drop (and unpersist) every entry — test isolation hook. */
  def clear(): Unit = m.synchronized {
    m.values.forEach(_.unpersist(false)); m.clear()
  }
}
