package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Schema-typed readers over the driver-generated parquet tables.
  *
  * Each accessor is a plain `spark.read.parquet` — column pruning and
  * predicate pushdown are left to Catalyst, so a caller that selects
  * two columns scans two columns (verified in ExplainSpec).
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = Tables.relation(spark, dir, name)

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = ltz(t("orders"), "o_orderdate")
  def lineitem: DataFrame   = ltz(t("lineitem"), "l_shipdate")
  /** The driver's `events.ts` encoding has varied across testdata
    * generations — int64 nanoseconds (read as LongType under
    * `spark.sql.legacy.parquet.nanosAsLong=true`), then naive
    * `timestamp[us]` (read as TIMESTAMP_NTZ unless the session sets
    * `spark.sql.parquet.inferTimestampNTZ.enabled=false`). This reader
    * normalizes every variant to a session-local TimestampType `ts`
    * (sessions run UTC, so the NTZ→LTZ cast is value-preserving and
    * matches DuckDB's naive-timestamp epoch), so downstream code is
    * insulated from the file encoding. */
  def events: DataFrame = Tables.normalizeTs(t("events"), "ts")
  private def ltz(df: DataFrame, c: String): DataFrame =
    Tables.normalizeTs(df, c)
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  /** Normalize a timestamp column to session-local TimestampType,
    * whatever the file encoding handed us — the ONE switch batch
    * ([[Tables]] accessors) and streaming
    * ([[graft.streaming.Streams.readEvents]]) reads share, so the
    * two paths cannot drift across testdata generations:
    *  - int64 nanoseconds (read as LongType under
    *    `spark.sql.legacy.parquet.nanosAsLong=true`): integer FLOOR
    *    division to micros — exact for any value incl. pre-epoch
    *    negatives (`div` alone truncates toward zero, shifting
    *    negative non-µs-aligned nanos +1 µs; a double-division
    *    floor mis-truncates large values — ulp at 1.7e15 > 0.25);
    *  - naive timestamp[us] (TIMESTAMP_NTZ unless the session sets
    *    `spark.sql.parquet.inferTimestampNTZ.enabled=false`): cast to
    *    LTZ — value-preserving under the pinned UTC session zone and
    *    equal to the oracle engine's naive-timestamp epoch;
    *  - already TimestampType: identity. */
  private[graft] def normalizeTs(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case LongType =>
        // floor division in integers: truncate, then correct the
        // negative-remainder case downward
        df.withColumn(c, timestamp_micros(
          expr(s"($c div 1000) - if($c % 1000 < 0, 1, 0)")))
      case TimestampNTZType =>
        df.withColumn(c, col(c).cast(TimestampType))
      case _ => df
    }

  // Resolved-relation reuse: `spark.read.parquet` re-lists the path
  // and re-reads footers for the schema on EVERY call, which at ~60
  // queries × 2-3 table reads each is pure driver-side latency. A
  // DataFrame is an immutable logical plan, so handing the same one
  // to every caller is safe — and each query still gets its own
  // pruning/pushdown on top. Keyed by session so concurrent test
  // sessions don't share analyzer state.
  //
  // BOUNDED (LRU): a resolved DataFrame strongly references its
  // SparkSession, so an unbounded map would retain every session a
  // long-lived process ever creates (tests spawn them via
  // newSession()) — and weak keys can't work here, the VALUE pins the
  // key. 64 entries covers many sessions × the 9 tables; evicted
  // entries just re-resolve on next use. A cached plan also pins the
  // parquet FILE LISTING as of resolve time — after rewriting a table
  // path in place, call [[invalidate]] or reads fail/stale.
  private val MaxEntries = 64
  private val cache =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame]): Boolean =
        size() > MaxEntries
    }

  private def relation(spark: SparkSession, dir: String, name: String): DataFrame = {
    val key = (spark, s"$dir/$name.parquet")
    val hit = cache.synchronized(cache.get(key))
    if (hit != null) hit
    else {
      // resolve OUTSIDE the monitor: file listing + footer reads are
      // I/O, and holding the single lock across them would serialize
      // every session's first resolution process-wide. A racing
      // duplicate resolution is idempotent; first insert wins.
      val resolved = spark.read.parquet(key._2)
      cache.synchronized {
        val raced = cache.get(key)
        if (raced != null) raced
        else { cache.put(key, resolved); resolved }
      }
    }
  }

  /** Drop every cached relation (all sessions, all paths), plus all
    * [[PlanCache]] derived-frame memos. */
  def invalidate(): Unit = {
    cache.synchronized(cache.clear())
    PlanCache.invalidate("")
  }

  /** Drop cached relations under `dir` — call after rewriting any of
    * its parquet tables in place so the next read re-lists files.
    * Also drops the [[PlanCache]] derived frames built over `dir`
    * (their keys embed it), so operator memos can't serve results
    * from the pre-rewrite corpus. */
  def invalidate(dir: String): Unit = {
    cache.synchronized {
      cache.keySet.removeIf(_._2.startsWith(dir + "/"))
    }
    PlanCache.invalidate(dir)
  }
}
