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

  /** Build the bit table from the (small) key set as ONE row holding
    * the dense 1024-long word array — 8 KiB regardless of key count.
    * The final ungrouped aggregate makes the bound structural: the
    * frame is 1 row by construction at any corpus size, so the
    * broadcast in [[prefilter]] passes PlanHygieneSpec's scaling-table
    * hint ban without a whitelist. */
  def build(keys: DataFrame, key: Column): DataFrame =
    keys.select(explode(array(positions(key): _*)).as("pos"))
      .select(wordIdx(col("pos")).as("word_idx"), bitOf(col("pos")).as("bit"))
      .select(col("word_idx"), expr("shiftleft(CAST(1 AS BIGINT), bit)").as("b"))
      .groupBy(col("word_idx"))
      .agg(bit_or(col("b")).as("bits"))
      .agg(map_from_entries(collect_list(struct(col("word_idx"), col("bits"))))
        .as("m"))
      .select(expr(
        s"transform(sequence(0L, ${MBits / 64 - 1}L), i -> coalesce(m[i], 0L))")
        .as("bf_words"))

  /** Keep only rows whose key MIGHT be in the built set: both hash
    * positions' bits are set. The 1-row bloom array rides a broadcast
    * nested-loop join (8 KiB), so the probe is a pure projection +
    * filter on the fact side — no shuffle, no per-row join. */
  def prefilter(df: DataFrame, key: Column, bloom: DataFrame): DataFrame = {
    val Seq(p0, p1) = positions(key)
    def bitSet(p: String): Column =
      element_at(col("bf_words"), (wordIdx(col(p)) + 1).cast("int"))
        .bitwiseAND(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($p % 64 AS INT))")) =!= 0L
    df.withColumn("bf_p0", p0).withColumn("bf_p1", p1)
      .crossJoin(broadcast(bloom))
      .filter(bitSet("bf_p0") && bitSet("bf_p1"))
      .drop("bf_p0", "bf_p1", "bf_words")
  }
}
