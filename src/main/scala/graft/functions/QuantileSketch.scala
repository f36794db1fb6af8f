package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Mergeable approximate-quantile sketch over non-negative integers
  * (HDR-histogram-style exponential bucketing — the public
  * High-Dynamic-Range histogram recipe), designed under the repo's
  * exact-gate discipline: every step is INTEGER arithmetic, so the
  * sketch is bit-identical at any partitioning / merge order (unlike
  * t-digest, whose centroids depend on insertion order and can never
  * hash-match an oracle) and a DuckDB oracle reproduces estimates
  * exactly from the same generated CASE chains.
  *
  * Bucketing (m = [[SubBits]] = 5 mantissa bits):
  *  - v < 64: bucket = v (exact unit buckets);
  *  - otherwise, with s = floor(log2 v) − 5: bucket = 32·s + (v div 2ˢ)
  *    — 32 buckets per octave, bucket width 2ˢ at magnitude ≥ 2^(s+5),
  *    so relative bucket width ≤ 2⁻⁵ = 3.125% and the midpoint
  *    estimate is within ±1.6% of any value in the bucket.
  *  - [[NumBuckets]] = 1888 covers the full non-negative long range;
  *    the whole sketch is a fixed 15 KiB long[] — each partition ships
  *    one array, merge is an elementwise sum (associative and
  *    commutative ⇒ partition-invariant), which is also exactly the
  *    incremental state a streaming window wants.
  *
  * Quantile extraction: rank ⌈q·n⌉ (exact integer ceiling), first
  * bucket whose cumulative count reaches the rank, decoded to the
  * bucket midpoint — deterministic BIGINT end to end.
  *
  * The per-value bucket rule exists twice by necessity (a JVM loop in
  * the aggregate, a CASE chain in SQL); QuantileSketchSpec pins them
  * equal value-by-value, and the SQL text itself is shared VERBATIM
  * between the Spark relational formulation and the generated DuckDB
  * oracle (only the integer-division token differs by dialect), so
  * the rule cannot drift between engines.
  */
object QuantileSketch {

  /** Mantissa bits per octave: 2⁵ = 32 sub-buckets, rel. width ≤ 1/32. */
  val SubBits: Int = 5
  private val Sub: Int = 1 << SubBits // 32

  /** Largest shift: values v ∈ [2⁶², 2⁶³) take s = 57. */
  val MaxShift: Int = 62 - SubBits

  /** Fixed sketch width: exact region [0, 64) + 32 per octave. */
  val NumBuckets: Int = (MaxShift + 1) * Sub + Sub // 1888

  /** JVM bucket rule — must match [[idxCaseSql]] (spec-pinned). */
  def bucketOf(v: Long): Int = {
    require(v >= 0, s"quantile sketch input must be non-negative, got $v")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(v | 1L)
    val s = if (e <= SubBits) 0 else e - SubBits
    (s * Sub + (v >>> s)).toInt
  }

  /** Midpoint decode — must match [[midCaseSql]] (spec-pinned).
    * Exact-region buckets hold a single integer value; exponential
    * buckets decode to (2w+1)·2^(s−1), the integer midpoint. */
  def midpointOf(idx: Int): Long = {
    if (idx < 2 * Sub) idx.toLong
    else {
      val s = idx / Sub - 1
      val w = (idx - s * Sub).toLong // ∈ [32, 64)
      (2 * w + 1) << (s - 1)
    }
  }

  /** Dialect-portable CASE chain computing the bucket index of the
    * non-negative BIGINT expression `vExpr`. `divOp` is the integer
    * division token — "div" (Spark) or "//" (DuckDB); everything else
    * is comparisons and multiplication, portable by construction (the
    * [[Hll.rankCaseSql]] recipe: no log2 / bit-length builtins, which
    * differ or round through doubles across engines). */
  def idxCaseSql(vExpr: String, divOp: String): String = {
    // descending thresholds: shift = s ⟺ v ≥ 2^(s+5) (s ≥ 1)
    val whens = (MaxShift to 1 by -1).map { s =>
      val threshold = 1L << (s + SubBits)
      s"WHEN $vExpr >= $threshold THEN ${s.toLong * Sub} + ($vExpr $divOp ${1L << s})"
    }
    s"CASE ${whens.mkString(" ")} ELSE $vExpr END"
  }

  /** Dialect-portable CASE chain decoding bucket index `idxExpr` to
    * its integer midpoint (inverse of [[idxCaseSql]]). Unlike the
    * encoder it needs no division — comparisons, multiply and
    * subtract only — so there is no dialect knob here. */
  def midCaseSql(idxExpr: String): String = {
    val whens = (MaxShift to 1 by -1).map { s =>
      val lo = (s + 1).toLong * Sub // first idx of shift s
      s"WHEN $idxExpr >= $lo THEN (2 * ($idxExpr - ${s.toLong * Sub}) + 1) * ${1L << (s - 1)}"
    }
    s"CASE ${whens.mkString(" ")} ELSE $idxExpr END"
  }

  /** Exact integer ceiling rank ⌈n·num/den⌉ as SQL (portable: + − ×
    * and one integer division). */
  def rankSql(nExpr: String, num: Int, den: Int, divOp: String): String =
    s"(($nExpr * $num + ${den - 1}) $divOp $den)"

  /** ONE `aggregate()` fold finding the p50/p90/p99 bucket positions
    * in a bucket-count array column: carry (cum, next array position,
    * found-or-−1 per percentile); a position is recorded the first
    * time the running total reaches its ceiling rank — identical to
    * "min idx with cum ≥ rank" over non-empty buckets, because the
    * running total only moves at non-empty positions. Array position
    * ≡ bucket index ([[bucketOf]]). Shared VERBATIM by the batch
    * profiler ([[graft.operators.Profile.qsketchProfile]]) and the
    * streaming window decode ([[graft.streaming.Streams
    * .qsketchWindowPercentiles]]) so the decode rule cannot drift
    * between the twins. `nExpr` is the total-count expression the
    * ranks are taken against (typically its own one-line fold,
    * [[totalFoldSql]]). */
  def rankFoldSql(regsCol: String, nExpr: String): String = {
    def found(num: Int, den: Int, name: String) =
      s"'$name', IF(a.$name >= 0, a.$name, " +
        s"IF(a.cum + x >= ${rankSql(nExpr, num, den, "div")}, a.i, -1))"
    s"""aggregate($regsCol,
       |  named_struct('cum', CAST(0 AS BIGINT), 'i', 0,
       |               'i50', -1, 'i90', -1, 'i99', -1),
       |  (a, x) -> named_struct('cum', a.cum + x, 'i', a.i + 1,
       |    ${found(1, 2, "i50")},
       |    ${found(9, 10, "i90")},
       |    ${found(99, 100, "i99")}))""".stripMargin
  }

  /** Total count of a bucket array — the `n` the ceiling ranks are
    * taken against. */
  def totalFoldSql(regsCol: String): String =
    s"aggregate($regsCol, CAST(0 AS BIGINT), (a, x) -> a + x)"

  /** Sketch aggregate column: fixed long[[[NumBuckets]]] counts. */
  def qsketchAgg(v: Column): Column =
    ColumnBridge.column(
      QSketchAgg(ColumnBridge.expression(v)).toAggregateExpression())
}

/** The mergeable aggregate form of [[QuantileSketch]]: long[1888]
  * bucket counts, elementwise-sum merge — map-side partials ship one
  * fixed array per partition, and the same buffer is the incremental
  * per-window state of the streaming twin (bit-identical to a batch
  * sketch over the same rows, like [[CountMinAgg]]/[[HllAgg]]).
  * Negative inputs fail fast (the operator contract is non-negative
  * integer measures — cents, counts, micros); nulls are skipped. */
case class QSketchAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  import QuantileSketch.NumBuckets

  // integral inputs only, checked at ANALYSIS time: without this a
  // decimal/string column would pass analysis and die mid-job with a
  // ClassCastException in every task (and a silent Cast would
  // truncate decimals instead of making the caller decide)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"qsketch_agg needs an integral column (cast cents/micros " +
            s"explicitly), got ${other.sql}")
    }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](NumBuckets)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf(QuantileSketch.bucketOf(v.asInstanceOf[Number].longValue())) += 1L
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < NumBuckets) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * NumBuckets)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(NumBuckets)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "qsketch_agg"

  override def withNewMutableAggBufferOffset(o: Int): QSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}
