package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Data-profiling operator block: the "what is in this table" sweep
  * every ingestion pipeline runs before trusting a new shard.
  *
  * Shape: melt the profiled columns to (col_name, value) rows with
  * one `stack` projection — a single scan however many columns are
  * profiled — then one partially-aggregating groupBy on col_name.
  * At 100 TB the scan dominates and nothing else grows: the
  * aggregate state is a handful of rows per column per partition.
  */
object Profile {

  /** Per-column stats over lineitem's numeric measures: count,
    * distinct count, min/max, and an exact-cents mean. The melt
    * multiplies rows by the column count BEFORE the aggregate, but
    * map-side partial aggregation collapses them inside the same
    * stage — no multiplied exchange (the shuffle carries ≤ columns ×
    * partitions rows). */
  def numericProfile(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val stackExpr = s"stack(${cols.length}, " +
      cols.map(c => s"'$c', $c").mkString(", ") + ") as (col_name, value)"
    Tables(spark, dir).lineitem
      .selectExpr(stackExpr)
      .groupBy(col("col_name"))
      .agg(
        count(col("value")).as("n"),
        countDistinct(col("value")).as("n_distinct"),
        round(min("value"), 4).as("min_value"),
        round(max("value"), 4).as("max_value"),
        round(sum(round(col("value") * 100, 0).cast("long")) / 100.0 /
          count(col("value")), 6).as("mean"))
      .orderBy("col_name")
  }
}
