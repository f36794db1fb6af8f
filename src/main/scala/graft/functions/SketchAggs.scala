package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as a custom Catalyst aggregate
  * (`TypedImperativeAggregate`, SURVEY.md §4): one agg column with a
  * `long[k]` buffer instead of k separate `min((a_i·h + b_i) mod P)`
  * columns. Bit-compatible with that declarative formulation — the
  * salt family is [[PortableHash.affineParams]]'s fixed-seed affine
  * functions over P = 2³¹−1 — so band keys and candidate pairs are
  * unchanged (SketchAggsSpec asserts), and the identical arithmetic
  * runs in the DuckDB oracle (value-checked, not rows-only). Update
  * and merge are tight primitive loops; the serialized form is 8k
  * bytes.
  */
case class MinHashAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  @transient private lazy val (saltA, saltB) = PortableHash.affineParams(k)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hp = java.lang.Math.floorMod(v.asInstanceOf[Long], PortableHash.P)
      var i = 0
      while (i < k) {
        val salted = (saltA(i) * hp + saltB(i)) % PortableHash.P
        if (salted < buf(i)) buf(i) = salted
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "minhash_agg"

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

/** 64-bit SimHash as a custom aggregate: `long[64]` ±1 vote buffer,
  * sign-packed on eval. Bit-compatible with the 64-column
  * sum-of-votes formulation (same input hashes, same vote rule). */
case class SimHashAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        buf(j) += (if (((h >>> j) & 1L) == 1L) 1L else -1L)
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var sim = 0L
    var j = 0
    while (j < 64) { if (buf(j) > 0) sim |= (1L << j); j += 1 }
    sim
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * 64)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong())
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "simhash_agg"

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

/** Count-Min sketch as a custom aggregate: `long[d·w]` counter
  * matrix, row i bucketing by the i-th [[PortableHash]] affine salt.
  * Update is d counter increments per input row; merge is an
  * elementwise sum — map-side partials mean each partition ships one
  * fixed-size matrix, never its token stream. The counter content is
  * exactly "sum of counts of all tokens landing in the bucket", so
  * the DuckDB oracle reproduces every counter with d group-bys over
  * the same salt arithmetic — the sketch is value-checked, not
  * rows-only (same portability trick as minhash/simhash). */
case class CountMinAgg(child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  @transient private lazy val (saltA, saltB) = PortableHash.affineParams(depth)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hp = java.lang.Math.floorMod(v.asInstanceOf[Long], PortableHash.P)
      var i = 0
      while (i < depth) {
        val bucket = (((saltA(i) * hp + saltB(i)) % PortableHash.P) % width).toInt
        buf(i * width + bucket) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "countmin_agg"

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

object SketchAggs {
  /** k-entry minhash signature of a long-hash column. */
  def minhashAgg(hash: Column, k: Int): Column =
    ColumnBridge.column(
      MinHashAgg(ColumnBridge.expression(hash), k).toAggregateExpression())

  /** 64-bit simhash of a long-hash column. */
  def simhashAgg(hash: Column): Column =
    ColumnBridge.column(
      SimHashAgg(ColumnBridge.expression(hash)).toAggregateExpression())

  /** depth×width Count-Min counter matrix of a long-hash column,
    * flattened row-major. */
  def countMinAgg(hash: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(hash), depth, width)
        .toAggregateExpression())
}
