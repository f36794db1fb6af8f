package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k-by-score as a custom Catalyst aggregate
  * (`TypedImperativeAggregate`, SURVEY.md §4) — the distributed
  * replacement for `row_number() OVER (PARTITION BY qid ORDER BY
  * score DESC)` top-k.
  *
  * The window formulation funnels the *entire* scored set for a query
  * through one reducer task before discarding all but k rows — a
  * straggler at 100× test scale and an OOM at 100 TB. This aggregate
  * keeps a k-entry sorted buffer instead, so map-side partial
  * aggregation shrinks every partition's contribution to ≤ k entries
  * *before* the per-group shuffle; the merge combines k-entry buffers.
  * Ordering is (score desc, id asc) — identical to the window's
  * `ORDER BY score DESC, id` tie-break, so results are byte-identical.
  *
  * Duplicate (score, id) entries — e.g. the same candidate reached via
  * several LSH buckets — are dropped exactly: insert skips an entry
  * already present, and merge skips equal heads. An entry missing from
  * a full buffer is dominated by k better entries, so its duplicate
  * would be evicted anyway; no separate `distinct()` shuffle needed.
  */
case class TopKScoreAgg(score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKScoreAgg.Buf] {

  import TopKScoreAgg.{Buf, better}

  override def createAggregationBuffer(): Buf =
    new Buf(new Array[Double](k), new Array[Long](k), 0)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val sv = score.eval(input)
    val iv = id.eval(input)
    if (sv != null && iv != null) {
      val s = sv.asInstanceOf[Double]
      val vid = iv.asInstanceOf[Long]
      if (buf.size < k || better(s, vid, buf.scores(buf.size - 1), buf.ids(buf.size - 1))) {
        // walk back to the insertion point (buffers are tiny: k ≤ ~100)
        var i = buf.size
        while (i > 0 && better(s, vid, buf.scores(i - 1), buf.ids(i - 1))) i -= 1
        // exact-duplicate candidate (same score AND id) — already kept
        if (!(i > 0 && buf.scores(i - 1) == s && buf.ids(i - 1) == vid)) {
          val newSize = math.min(buf.size + 1, k)
          var j = newSize - 1
          while (j > i) {
            buf.scores(j) = buf.scores(j - 1); buf.ids(j) = buf.ids(j - 1); j -= 1
          }
          buf.scores(i) = s; buf.ids(i) = vid; buf.size = newSize
        }
      }
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    if (b.size == 0) return a
    val ns = new Array[Double](k); val ni = new Array[Long](k)
    var ia = 0; var ib = 0; var n = 0
    while (n < k && (ia < a.size || ib < b.size)) {
      val takeA =
        if (ib >= b.size) true
        else if (ia >= a.size) false
        else if (a.scores(ia) == b.scores(ib) && a.ids(ia) == b.ids(ib)) {
          ib += 1; true // same candidate seen on both sides — emit once
        } else better(a.scores(ia), a.ids(ia), b.scores(ib), b.ids(ib))
      if (takeA) { ns(n) = a.scores(ia); ni(n) = a.ids(ia); ia += 1 }
      else { ns(n) = b.scores(ib); ni(n) = b.ids(ib); ib += 1 }
      n += 1
    }
    new Buf(ns, ni, n)
  }

  override def eval(buf: Buf): Any = {
    val rows = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) { rows(i) = InternalRow(buf.ids(i), buf.scores(i)); i += 1 }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val ss = new Array[Double](k); val ii = new Array[Long](k)
    var i = 0
    while (i < n) { ss(i) = bb.getDouble(); ii(i) = bb.getLong(); i += 1 }
    new Buf(ss, ii, n)
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  override def prettyName: String = "topk_by_score"

  override def withNewMutableAggBufferOffset(o: Int): TopKScoreAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKScoreAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(score = c(0), id = c(1))
}

object TopKScoreAgg {

  /** Sorted best-first, capacity k. */
  final class Buf(val scores: Array[Double], val ids: Array[Long], var size: Int)

  /** (s1, i1) ranks strictly ahead of (s2, i2): score desc, id asc. */
  private[functions] def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  /** Top-k (id, score) entries by (score desc, id asc), as an
    * `array<struct<id,score>>` aggregate column. */
  def topk(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKScoreAgg(
      ColumnBridge.expression(score.cast("double")),
      ColumnBridge.expression(id.cast("long")), k).toAggregateExpression())
}
