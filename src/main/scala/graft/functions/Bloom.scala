package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable Bloom filter over the [[PortableHash]] family — the
  * runtime-filter pattern: build a tiny bit table from a selective
  * dimension's join keys, broadcast it, and prune the fact side
  * BEFORE its shuffle. At 100 TB this is the difference between
  * shuffling every fact row to the join and shuffling only the ~hit
  * rate that survives the filter (Spark's own runtime row-group
  * filters do this opportunistically; this one is explicit, portable,
  * and engine-reproducible).
  *
  * Layout: m = 2¹⁶ bits packed into 1024 longs, k = 2 affine-salted
  * hashes per key. No false negatives ever (BloomSpec proves the
  * prefilter output is a superset of the exact matches); false
  * positives are removed by the exact join that follows, so the
  * composed operator is value-invisible — the driver's oracle for
  * [[graft.operators.Relational.qBloomJoin]] is the PLAIN semi-join
  * SQL, and the hash match is the proof.
  */
object Bloom {

  val MBits = 65536L

  private val (salts_a, salts_b) = PortableHash.affineParams(2)

  private def positions(key: Column): Seq[Column] = {
    val h = PortableHash.h60(key.cast("string"))
    (0 until 2).map(i =>
      pmod(PortableHash.salted(h, salts_a(i), salts_b(i)), lit(MBits)))
  }

  private def wordIdx(pos: Column): Column = shiftright(pos, 6)
  private def bitOf(pos: Column): Column =
    pos.bitwiseAND(lit(63L)).cast("int")

  /** Build the bit table from the (small) key set: one row per 64-bit
    * word that has at least one bit set — `(word_idx, bits)`, ≤ 1024
    * rows regardless of key count. */
  def build(keys: DataFrame, key: Column): DataFrame =
    keys.select(explode(array(positions(key): _*)).as("pos"))
      .select(wordIdx(col("pos")).as("word_idx"), bitOf(col("pos")).as("bit"))
      .select(col("word_idx"), expr("shiftleft(CAST(1 AS BIGINT), bit)").as("b"))
      .groupBy(col("word_idx"))
      .agg(bit_or(col("b")).as("bits"))

  /** Keep only rows whose key MIGHT be in the built set: both hash
    * positions' bits are set. Missing words (left-join miss) mean the
    * bit is clear. The bloom table is broadcast — the fact side sees
    * two broadcast probes and no shuffle. */
  def prefilter(df: DataFrame, key: Column, bloom: DataFrame): DataFrame = {
    val Seq(p0, p1) = positions(key)
    val b0 = bloom.select(col("word_idx").as("bf_w0"), col("bits").as("bf_bits0"))
    val b1 = bloom.select(col("word_idx").as("bf_w1"), col("bits").as("bf_bits1"))
    df.withColumn("bf_p0", p0).withColumn("bf_p1", p1)
      .join(broadcast(b0), wordIdx(col("bf_p0")) === col("bf_w0"), "left")
      .join(broadcast(b1), wordIdx(col("bf_p1")) === col("bf_w1"), "left")
      .filter(
        coalesce(col("bf_bits0"), lit(0L))
          .bitwiseAND(expr("shiftleft(CAST(1 AS BIGINT), CAST(bf_p0 % 64 AS INT))")) =!= 0L &&
        coalesce(col("bf_bits1"), lit(0L))
          .bitwiseAND(expr("shiftleft(CAST(1 AS BIGINT), CAST(bf_p1 % 64 AS INT))")) =!= 0L)
      .drop("bf_p0", "bf_p1", "bf_w0", "bf_bits0", "bf_w1", "bf_bits1")
  }
}
