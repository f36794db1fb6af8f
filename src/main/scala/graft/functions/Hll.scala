package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** HyperLogLog distinct-count sketch as a custom aggregate — the
  * third sketch in the family (MinHash, Count-Min, HLL), and the
  * approximate-distinct primitive a 100 TB profile pass runs instead
  * of `countDistinct`'s full shuffle: each partition ships one
  * fixed 1 KiB register array, merge is an elementwise max.
  *
  * ORACLE-PARITY DESIGN (the portability trick the other sketches
  * use, applied to HLL): the input is the [[PortableHash]] 60-bit
  * hash, the bucket is `h mod m`, and the register is the first-1-bit
  * rank of the remaining 50-bit window — all integer arithmetic a
  * DuckDB oracle reproduces with one group-by-max over the SAME hash
  * (register content is "max rank of any value landing in the
  * bucket", which max's idempotence makes duplicate-insensitive —
  * the whole point of HLL). The estimate is then derived from exact
  * integers: `Z_scaled = Σ_b 2^(51−reg_b)` fits a BIGINT
  * (≤ 1024·2⁵¹ = 2⁶¹), so the harmonic mean is exact on both
  * engines and the final division is deterministic IEEE arithmetic.
  * m = 1024 → standard error ≈ 1.04/√1024 ≈ 3.3%.
  */
case class HllAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  import Hll.{M, W}

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = java.lang.Math.floorMod(h, M.toLong).toInt
      val rest = java.lang.Math.floorDiv(h, M.toLong) // < 2^50
      // rank = leading zeros within the W-bit window + 1; rest == 0
      // means "no 1-bit seen" = W + 1
      val rank =
        if (rest == 0L) (W + 1)
        else W + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      if (rank > buf(bucket)) buf(bucket) = rank.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toLong))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "hll_agg"

  override def withNewMutableAggBufferOffset(o: Int): HllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

object Hll {
  /** Register count (2¹⁰ buckets → σ ≈ 3.3%). */
  val M = 1024
  /** Hash-window width after the bucket bits: 60 − 10. */
  val W = 50

  /** m-register HLL sketch of a long-hash column. */
  def hllAgg(hash: Column): Column =
    ColumnBridge.column(
      HllAgg(ColumnBridge.expression(hash)).toAggregateExpression())

  /** Dialect-portable SQL for the first-1-bit rank of the post-bucket
    * window `vExpr` — a descending threshold CASE chain (no log2, no
    * bit-length builtin: both of those differ or go through doubles
    * across engines; 50 integer comparisons are portable by
    * construction). Shared VERBATIM by the Spark declarative twin
    * (SketchAggsSpec) and the generated DuckDB oracle, so the rank
    * rule cannot drift between engines. */
  def rankCaseSql(vExpr: String): String = {
    val whens = (1 to W).map { rank =>
      val threshold = 1L << (W - rank) // v >= 2^(W-rank) → rank
      s"WHEN $vExpr >= $threshold THEN $rank"
    }
    s"CASE ${whens.mkString(" ")} ELSE ${W + 1} END"
  }

  /** Dialect-portable SQL deriving the HLL estimate from integer
    * aggregates `nPresentExpr` (hit buckets) and `zPresentExpr`
    * (Σ 2^(51−reg) over hit buckets). Empty buckets contribute
    * 2⁵¹ each; the small-range branch is standard linear counting
    * `m·ln(m/V)`.
    *
    * EVERY fractional literal is CAST to DOUBLE: Spark's SQL parser
    * types bare decimal literals as DECIMAL and then does exact
    * decimal division (`1.079 / 1024.0` → scale-9 HALF_UP), while
    * DuckDB promotes the same division to DOUBLE — a ~6e-11 relative
    * divergence that survives into the estimate and would flip
    * round(est, 2) once estimates reach the 10⁷+ regime HLL exists
    * for (the q1_sql dialect-typing lesson, applied here BEFORE it
    * ships). With the casts, both engines run identical IEEE double
    * arithmetic on identical exact integers. */
  def estimateSql(nPresentExpr: String, zPresentExpr: String): String = {
    def d(x: String) = s"CAST($x AS DOUBLE)"
    val twoW1 = 1L << (W + 1) // 2^51, exact in double
    val alpha =
      s"(${d("0.7213")} / (${d("1.0")} + ${d("1.079")} / ${d(s"$M")}))"
    val zScaled =
      s"($zPresentExpr + CAST(($M - $nPresentExpr) AS BIGINT) * $twoW1)"
    val raw =
      s"($alpha * ${d(s"${M.toLong * M}")} * ${d(s"$twoW1")} / ${d(zScaled)})"
    val vZero = s"($M - $nPresentExpr)"
    s"""CASE WHEN $raw <= ${d(s"${5 * M / 2}")} AND $vZero > 0
        THEN ${d(s"$M")} * ln(${d(s"$M")} / ${d(vZero)})
        ELSE $raw END"""
  }
}
