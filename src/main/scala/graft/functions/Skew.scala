package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation: salted joins (SURVEY.md §5).
  *
  * AQE's skew-join split handles most runtime skew; salting is the
  * explicit tool for the pathological case — a handful of hot keys
  * carrying a large fraction of a 100 TB fact table. The hot side
  * gets a deterministic per-row salt in [0, n); the small side is
  * replicated n times; the join key becomes (key, salt), spreading
  * each hot key over n reducers.
  */
object Skew {

  /** Deterministic per-row salt: hash of the whole row modulo n —
    * stable under retries (no rand()), uniform within a key group. */
  def rowSalt(df: DataFrame, n: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(n))
      .cast("int")

  /** Inner equi-join of a skewed `large` side with a `small` side on
    * `key`, spreading each key over `saltFactor` partitions. Result
    * equals the plain join (SkewSpec asserts). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val salted = large.withColumn("__salt", rowSalt(large, saltFactor))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
