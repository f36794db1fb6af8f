package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Heavy-hitters aggregate: top-k most frequent items, in the
  * space-saving style (bounded state), as a typed
  * `org.apache.spark.sql.expressions.Aggregator` — the user-facing
  * typed-aggregate extension point (SURVEY.md §4).
  *
  * State is an exact counting map truncated back to `capacity`
  * entries whenever it grows past `2 × capacity`; with `capacity ≥`
  * the true distinct count the result is exact and deterministic,
  * beyond that it degrades to an approximation like any space-saving
  * sketch (TopKFreqSpec pins the exact regime against a full
  * wordcount). Truncation order is (count desc, item asc) so equal
  * states truncate identically on every executor. The 2× high-water
  * mark amortizes the O(n log n) trim over `capacity` inserts —
  * trimming at exactly `capacity` would pay a full sort per input row
  * once a group's distinct count crosses it.
  *
  * Usage: {{{ ds.select(TopKFreq.topK(10, 1000).toColumn) }}}
  */
class TopKFreq(k: Int, capacity: Int)
    extends Aggregator[String, mutable.Map[String, Long], Seq[(String, Long)]] {

  require(k <= capacity, "capacity must be at least k")

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  // amortized: trim only past the 2× high-water mark (see class doc) —
  // state stays bounded at 2×capacity, trims cost O(log) per insert
  private def truncate(m: mutable.Map[String, Long]): mutable.Map[String, Long] =
    if (m.size <= 2 * capacity) m
    else mutable.Map(m.toSeq.sortBy { case (w, c) => (-c, w) }.take(capacity): _*)

  override def reduce(b: mutable.Map[String, Long],
      a: String): mutable.Map[String, Long] = {
    b.update(a, b.getOrElse(a, 0L) + 1L)
    truncate(b)
  }

  override def merge(x: mutable.Map[String, Long],
      y: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    y.foreach { case (w, c) => x.update(w, x.getOrElse(w, 0L) + c) }
    truncate(x)
  }

  override def finish(m: mutable.Map[String, Long]): Seq[(String, Long)] =
    m.toSeq.sortBy { case (w, c) => (-c, w) }.take(k)

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

object TopKFreq {
  def topK(k: Int, capacity: Int = 4096): TopKFreq = new TopKFreq(k, capacity)

  /** [[TopKFreqAgg]] as a Column aggregate (for DataFrame use without
    * SQL registration). */
  def topkFreqAgg(item: org.apache.spark.sql.Column, k: Int,
      capacity: Int = 4096): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      TopKFreqAgg(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(item),
        k, capacity).toAggregateExpression())
}

/** [[TopKFreq]]'s semantics as a Catalyst `TypedImperativeAggregate`,
  * so heavy-hitters are callable from plain SQL
  * (`SELECT topk_freq(word, 10) FROM ...` after
  * [[graft.GraftFunctions.register]]). Same bounded-state rule: the
  * counting map trims back to `capacity` entries when it grows past
  * 2×capacity (amortizing the O(n log n) sort over `capacity`
  * inserts) and at serialize boundaries (so shuffled buffers carry at
  * most `capacity` entries), ordered (count desc, item asc), so
  * results are deterministic and exact while `capacity ≥` the true
  * distinct count (TopKFreqSpec pins this aggregate to the typed
  * Aggregator). */
case class TopKFreqAgg(child: org.apache.spark.sql.catalyst.expressions.Expression,
    k: Int, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[mutable.Map[String, Long]] {

  require(k <= capacity, "capacity must be at least k")

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String

  override def createAggregationBuffer(): mutable.Map[String, Long] =
    mutable.Map.empty

  // amortized 2× high-water trim; `hard` (serialize) always trims to
  // capacity so the shuffle never carries the slack
  private def truncate(m: mutable.Map[String, Long],
      hard: Boolean = false): mutable.Map[String, Long] =
    if (m.size <= (if (hard) capacity else 2 * capacity)) m
    else mutable.Map(m.toSeq.sortBy { case (w, c) => (-c, w) }.take(capacity): _*)

  override def update(m: mutable.Map[String, Long],
      input: InternalRow): mutable.Map[String, Long] = {
    val v = child.eval(input)
    if (v == null) m
    else {
      val s = v.toString
      m.update(s, m.getOrElse(s, 0L) + 1L)
      truncate(m)
    }
  }

  override def merge(x: mutable.Map[String, Long],
      y: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    y.foreach { case (w, c) => x.update(w, x.getOrElse(w, 0L) + c) }
    truncate(x)
  }

  override def eval(m: mutable.Map[String, Long]): Any =
    new GenericArrayData(
      m.toSeq.sortBy { case (w, c) => (-c, w) }.take(k).map { case (w, c) =>
        InternalRow(UTF8String.fromString(w), c)
      }.toArray[Any])

  override def serialize(m: mutable.Map[String, Long]): Array[Byte] = {
    val t = truncate(m, hard = true)
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(t.size)
    t.foreach { case (w, c) => out.writeUTF(w); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.Map[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.Map.empty[String, Long]
    (0 until n).foreach { _ => val w = in.readUTF(); m.update(w, in.readLong()) }
    m
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "topk_freq"

  override def withNewMutableAggBufferOffset(o: Int): TopKFreqAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKFreqAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = c.head)
}
