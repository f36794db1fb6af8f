package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary as a mergeable Catalyst
  * aggregate — "frequent items at 100 TB with bounded state AND
  * bounded error", the capability the exact [[TopKFreqAgg]] (exact
  * only while capacity ≥ distinct count) and the CMS point queries
  * (no top-k enumeration) each cover half of.
  *
  * State is ≤ 2·capacity (item → counter) entries plus ONE scalar
  * `offset` θ — the cumulative decrement the classic Misra-Gries
  * algorithm spreads over its counters. Compression subtracts the
  * (capacity+1)-th largest counter value t from every counter and
  * drops the non-positives (≤ capacity survive, since survival needs
  * counter > t); θ += t. Merging two summaries sums counters
  * (absent = 0) and offsets, then compresses — the published
  * mergeable-summaries recipe (Agarwal, Cormode, Huang, Phillips,
  * Wei, Yi, PODS'12), which keeps the bound under ANY merge tree:
  * each compression removes ≥ (capacity+1)·t of input mass, so
  * θ ≤ N / (capacity+1) for N total items, and every item satisfies
  *
  *   counter(i) ≤ true_count(i) ≤ counter(i) + θ
  *
  * (absent items: 0 ≤ true ≤ θ). Any item with true count > θ — in
  * particular anything above N/(capacity+1) — is guaranteed present.
  * All selection orders are (counter desc, item asc), so equal states
  * compress identically on every executor; summary CONTENT can still
  * vary with merge order in the θ-sized tail (inherent to MG — the
  * bounds above are the invariant, SpaceSavingSpec pins them across
  * partitionings). The ORDER-INVARIANT canonicalization — exact
  * counts + the (capacity+1)-th-largest θ, a pure multiset function
  * with the same guarantee shape — is what the oracle-gated
  * `mr_heavyhitters` query computes ([[graft.operators.TextMR.
  * heavyHitters]]); this aggregate is the single-pass bounded-state
  * form for streams and generic pipelines.
  *
  * Output: `array<struct<item, lo, hi>>` sorted (lo desc, item asc),
  * where lo = counter (lower bound) and hi = counter + θ (upper
  * bound). The summary can legitimately be EMPTY under near-uniform
  * input (every counter decremented away); the certificate an empty
  * summary gives is "no item's true count exceeds θ ≤ N/(capacity+1)"
  * — θ itself is only readable (as hi − lo) from a non-empty summary.
  */
case class SpaceSavingAgg(child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingAgg.Buf] {

  require(capacity >= 1, "capacity must be at least 1")

  import SpaceSavingAgg.Buf

  override def createAggregationBuffer(): Buf =
    new Buf(mutable.Map.empty, 0L)

  /** Subtract the (capacity+1)-th largest counter from all and drop
    * the non-positives — the Misra-Gries decrement, batched. The 2×
    * high-water caller amortizes the O(n log n) selection over
    * `capacity` inserts (the [[TopKFreqAgg]] discipline); `hard`
    * (serialize/merge boundaries) compresses whenever > capacity so
    * shuffled buffers never carry the slack. */
  private def compress(b: Buf, hard: Boolean): Buf = {
    val limit = if (hard) capacity else 2 * capacity
    if (b.m.size <= limit) return b
    val t = b.m.toSeq.sortBy { case (w, c) => (-c, w) }
      .apply(capacity)._2 // (capacity+1)-th largest counter value
    b.m.filterInPlace { case (_, c) => c > t }
    b.m.mapValuesInPlace { case (_, c) => c - t }
    b.offset += t
    b
  }

  override def update(b: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null) b
    else {
      val s = v.toString
      b.m.update(s, b.m.getOrElse(s, 0L) + 1L)
      compress(b, hard = false)
    }
  }

  override def merge(a: Buf, other: Buf): Buf = {
    other.m.foreach { case (w, c) => a.m.update(w, a.m.getOrElse(w, 0L) + c) }
    a.offset += other.offset
    compress(a, hard = true)
  }

  override def eval(b: Buf): Any = {
    val t = compress(b, hard = true)
    new GenericArrayData(
      t.m.toSeq.sortBy { case (w, c) => (-c, w) }.map { case (w, c) =>
        InternalRow(UTF8String.fromString(w), c, c + t.offset)
      }.toArray[Any])
  }

  override def serialize(b: Buf): Array[Byte] = {
    val t = compress(b, hard = true)
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(t.offset)
    out.writeInt(t.m.size)
    t.m.foreach { case (w, c) => out.writeUTF(w); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val offset = in.readLong()
    val n = in.readInt()
    val m = mutable.Map.empty[String, Long]
    (0 until n).foreach { _ => val w = in.readUTF(); m.update(w, in.readLong()) }
    new Buf(m, offset)
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("lo", LongType, nullable = false),
      StructField("hi", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "spacesaving_agg"

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

object SpaceSavingAgg {
  /** Counter map + the cumulative Misra-Gries decrement θ. */
  final class Buf(val m: mutable.Map[String, Long], var offset: Long)

  /** Column form: bounded-state heavy-hitters summary of a string
    * column. */
  def spaceSaving(item: Column, capacity: Int): Column =
    ColumnBridge.column(
      SpaceSavingAgg(ColumnBridge.expression(item), capacity)
        .toAggregateExpression())
}
