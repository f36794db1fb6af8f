package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Deterministic uniform sample as a mergeable sketch — the fourth
  * sketch aggregate (after Count-Min, HLL, and the top-k heavy
  * hitters): keep the k rows whose PORTABLE HASH is smallest. Bottom-k
  * over a uniform hash IS a uniform sample of the population, and
  * unlike `TABLESAMPLE`/`rand()` it is reproducible across engines,
  * runs, partitionings, and merges: the union of two bottom-k sketches
  * is the bottom-k of the union, so map-side partials shrink every
  * partition to ≤ k entries before the shuffle — the same bounded-state
  * argument as [[TopKScoreAgg]], and the standard distributed
  * replacement for `ORDER BY rand() LIMIT k` (a full sort, funneled
  * into one reducer, different answer every run).
  *
  * Ordering is (hash asc, value asc); duplicates are KEPT (two distinct
  * source rows that collide on hash and value are still two sample
  * members — matching the window-rank oracle formulation exactly).
  * `eval` returns the sampled VALUES sorted ascending, ready for exact
  * index-based quantile selection.
  */
case class BottomKSampleAgg(hash: Expression, value: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomKSampleAgg.Buf] {

  import BottomKSampleAgg.{Buf, ahead}

  override def createAggregationBuffer(): Buf =
    new Buf(new Array[Long](k), new Array[Double](k), 0)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val hv = hash.eval(input)
    val vv = value.eval(input)
    if (hv != null && vv != null) {
      val h = hv.asInstanceOf[Long]
      val v = vv.asInstanceOf[Double]
      if (buf.size < k || ahead(h, v, buf.hashes(buf.size - 1), buf.values(buf.size - 1))) {
        var i = buf.size
        while (i > 0 && ahead(h, v, buf.hashes(i - 1), buf.values(i - 1))) i -= 1
        val newSize = math.min(buf.size + 1, k)
        var j = newSize - 1
        while (j > i) {
          buf.hashes(j) = buf.hashes(j - 1); buf.values(j) = buf.values(j - 1); j -= 1
        }
        if (i < k) { buf.hashes(i) = h; buf.values(i) = v; buf.size = newSize }
      }
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    if (b.size == 0) return a
    val nh = new Array[Long](k); val nv = new Array[Double](k)
    var ia = 0; var ib = 0; var n = 0
    while (n < k && (ia < a.size || ib < b.size)) {
      val takeA =
        if (ib >= b.size) true
        else if (ia >= a.size) false
        else ahead(a.hashes(ia), a.values(ia), b.hashes(ib), b.values(ib))
      if (takeA) { nh(n) = a.hashes(ia); nv(n) = a.values(ia); ia += 1 }
      else { nh(n) = b.hashes(ib); nv(n) = b.values(ib); ib += 1 }
      n += 1
    }
    new Buf(nh, nv, n)
  }

  override def eval(buf: Buf): Any = {
    val vals = java.util.Arrays.copyOf(buf.values, buf.size)
    java.util.Arrays.sort(vals)
    new GenericArrayData(vals)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.hashes(i)); bb.putDouble(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val hh = new Array[Long](k); val vv = new Array[Double](k)
    var i = 0
    while (i < n) { hh(i) = bb.getLong(); vv(i) = bb.getDouble(); i += 1 }
    new Buf(hh, vv, n)
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hash, value)
  override def prettyName: String = "bottomk_sample"

  override def withNewMutableAggBufferOffset(o: Int): BottomKSampleAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKSampleAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(hash = c(0), value = c(1))
}

object BottomKSampleAgg {

  /** Sorted smallest-first by (hash, value), capacity k. */
  final class Buf(val hashes: Array[Long], val values: Array[Double], var size: Int)

  /** (h1, v1) ranks strictly ahead of (h2, v2): hash asc, value asc. */
  private[functions] def ahead(h1: Long, v1: Double, h2: Long, v2: Double): Boolean =
    h1 < h2 || (h1 == h2 && v1 < v2)

  /** The values of the k hash-smallest rows, sorted ascending, as an
    * `array<double>` aggregate column. */
  def bottomk(hash: Column, value: Column, k: Int): Column =
    ColumnBridge.column(BottomKSampleAgg(
      ColumnBridge.expression(hash.cast("long")),
      ColumnBridge.expression(value.cast("double")), k).toAggregateExpression())
}
