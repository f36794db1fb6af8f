package graft.core

import org.apache.spark.sql.DataFrame

/** Bounded-result drain — release an operator's working-set caches the
  * moment its (constant/dictionary-bounded) answer exists.
  *
  * Several operators cache a corpus→bounded intermediate (a day spine,
  * a contingency table) that the returned plan reads several times;
  * returning the plan LAZILY means nobody ever unpersists, so a
  * long-lived session or bench loop accumulates executor storage until
  * block eviction kicks in (r11 ADVICE). [[bounded]] forces the result
  * once while the caches are alive, unpersists them in a finally, and
  * hands back the SAME rows/schema as a local relation.
  *
  * The collect is safe BY CONTRACT — callers may only pass results
  * whose row count is bounded by a constant or a dictionary (a ±7-lag
  * CCF bank, a 7-row forecast, event_type×dow cells), never
  * corpus-shaped — and the contract is ENFORCED: `maxRows` (default a
  * few thousand, far above any dictionary-bounded result yet far
  * below driver-OOM territory) fails fast with an actionable message
  * if a future caller hands in a corpus-shaped frame. The driver's
  * hash gate sorts rows before comparing, so the local-relation
  * round trip is value-identical. */
object Drain {
  def bounded(result: DataFrame, cached: DataFrame*): DataFrame =
    boundedAtMost(4096, result, cached: _*)

  def boundedAtMost(maxRows: Int, result: DataFrame,
      cached: DataFrame*): DataFrame =
    try {
      val rows = result.collect()
      require(rows.length <= maxRows,
        s"Drain.bounded: result has ${rows.length} rows (> $maxRows) — " +
          "this drain is for constant/dictionary-bounded results only; " +
          "a corpus-shaped frame here is a driver OOM at scale. " +
          "Return the plan lazily instead.")
      result.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), result.schema)
    } finally cached.foreach(_.unpersist(blocking = false))
}
