package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.PortableHash

/** Snapshot differencing — the change-data-capture primitive of an
  * incremental pipeline: given two versions of a keyed table, emit
  * exactly the rows that were inserted, deleted, or updated. At
  * 100 TB this is how a daily re-crawl folds into the standing
  * corpus without reprocessing it: one co-partitioned full-outer
  * hash join on the key (both sides shuffle ONCE on c_custkey; no
  * broadcast — both snapshots scale with the corpus), and the
  * unchanged majority is filtered before the result ever moves
  * again, so the output is proportional to the churn, not the
  * table.
  *
  * The two snapshots are carved deterministically out of the one
  * driver-generated `customer` table with the engine-portable hash
  * (so the DuckDB oracle reconstructs identical versions): ~5% of
  * keys exist only in the old version (deletes), ~5% only in the new
  * (inserts), and ~14% of the surviving rows get an account-balance
  * bump (updates). Balances compare in exact cents.
  */
object Snapshot {

  private val Buckets = 20

  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir).customer
      .select(col("c_custkey"),
        round(col("c_acctbal") * 100, 0).cast("long").as("cents"),
        pmod(PortableHash.h60(col("c_custkey").cast("string")),
          lit(Buckets.toLong)).as("hv"))
    val base = cust.filter(col("hv") =!= 0)
      .select(col("c_custkey").as("b_key"), col("cents").as("old_cents"))
    val curr = cust.filter(col("hv") =!= 1)
      .select(col("c_custkey").as("n_key"),
        when(col("hv") % 7 === 3, col("cents") + 100)
          .otherwise(col("cents")).as("new_cents"))
    base.join(curr, col("b_key") === col("n_key"), "full_outer")
      .withColumn("change",
        when(col("b_key").isNull, "insert")
          .when(col("n_key").isNull, "delete")
          .when(col("old_cents") =!= col("new_cents"), "update"))
      .filter(col("change").isNotNull)
      .select(coalesce(col("b_key"), col("n_key")).as("c_custkey"),
        col("change"), col("old_cents"), col("new_cents"))
      .sortWithinPartitions("c_custkey")
  }
}
