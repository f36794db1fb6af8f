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
  * The collect is safe BY CONTRACT, not by luck: callers may only pass
  * results whose row count is bounded by a constant or a dictionary
  * (a ±7-lag CCF bank, a 7-row forecast, event_type×dow cells) — never
  * corpus-shaped. The driver's hash gate sorts rows before comparing,
  * so the local-relation round trip is value-identical. */
object Drain {
  def bounded(result: DataFrame, cached: DataFrame*): DataFrame =
    try {
      val rows = result.collect()
      result.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), result.schema)
    } finally cached.foreach(_.unpersist(blocking = false))
}
