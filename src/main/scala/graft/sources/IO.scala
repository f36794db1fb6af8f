package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2 H). Parquet is the primary
  * contract (driver-provided tables); CSV and JSON cover interchange.
  * All readers take an explicit schema — schema inference is a full
  * extra pass over the data and non-deterministic under dirty input,
  * neither acceptable at 100 TB.
  */
object IO {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .json(path)

  def writeParquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  /** Bucketed write (hash-bucketed by join key, sorted within
    * buckets): two tables bucketed the same way join with NO shuffle —
    * the co-location contract a 100 TB star schema is laid out on.
    * Bucketing metadata lives in the session catalog, so this writes
    * a managed table (`saveAsTable`), not a bare path. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      key: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)
}
