package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document sketch KERNELS: the whole minhash / simhash signature
  * computed in one codegen'd loop over the document's shingle array.
  *
  * The aggregate formulation ([[MinHashAgg]] / [[SimHashAgg]]) is the
  * right shape when the input arrives as one ROW per element — a
  * token stream, a streaming micro-batch — but for per-document
  * signatures it forces `explode` + hash-aggregate: every shingle
  * becomes a row (1M+ at sf0.1), each crosses the partial-aggregate
  * machinery, and the groupBy adds a doc_id exchange that a per-doc
  * computation never needed. These expressions keep the signature
  * MAP-SIDE: one md5 per shingle and one k-way min loop per document,
  * no explode, no aggregate, no shuffle — the CharMoments playbook
  * ([[TextAnalysis.charMoments]]) applied to the dedup sketches.
  *
  * Bit-compatibility is the contract (SketchAggsSpec asserts both):
  *  - the per-shingle base hash is [[PortableHash.h60]] — md5, top 60
  *    bits — computed here directly from the digest bytes (the first
  *    15 hex characters ARE the top 60 bits of the first 8 digest
  *    bytes), so the DuckDB oracle arithmetic is unchanged;
  *  - the salt family is [[PortableHash.affineParams]]'s fixed-seed
  *    affine functions over P = 2³¹−1, identical to the aggregates'.
  *
  * Document coverage caveat: an EMPTY shingle array yields the neutral
  * signature (all `Long.MaxValue` / simhash 0) where the exploded
  * formulation yields NO row. [[graft.functions.Shingles.grams3]]
  * never emits an empty array (short texts collapse to one shingle),
  * and the dedup call sites filter `size(grams) > 0` for generic
  * inputs, so the two formulations stay row-identical.
  */
object SketchKernel {

  private val mdPool: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** [[PortableHash.h60]] of one shingle, from the raw digest: the
    * top 60 bits of md5 as a non-negative long. Equals
    * `conv(substring(md5(x),1,15),16,10)` — 15 hex chars = the first
    * 7.5 digest bytes = bits 63..4 of the big-endian first-8-bytes
    * long, recovered with one logical shift. */
  def h60(g: UTF8String): Long = {
    val md = mdPool.get()
    md.reset()
    val d = md.digest(g.getBytes)
    val top = (d(0) & 0xFFL) << 56 | (d(1) & 0xFFL) << 48 |
      (d(2) & 0xFFL) << 40 | (d(3) & 0xFFL) << 32 |
      (d(4) & 0xFFL) << 24 | (d(5) & 0xFFL) << 16 |
      (d(6) & 0xFFL) << 8 | (d(7) & 0xFFL)
    top >>> 4
  }
}

/** [[PortableHash.h60]] of every element of a string array, in one
  * per-row loop — the map-side feeder for the dedup postings tables.
  * `explode(grams)` + the h60 Column chain evaluates
  * md5 → hex string → substring → conv(base-16 parse) PER EXPLODED
  * ROW; this expression goes digest-bytes → long directly (no hex
  * materialization, no string parse), and the explode that follows
  * carries longs instead of shingle strings. Value-identical: a null
  * element maps to a null hash, exactly as `h60(null)` evaluates
  * (SketchAggsSpec asserts elementwise equality). */
case class GramHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType match {
    case ArrayType(_, n) => ArrayType(LongType, containsNull = n)
    case _ => ArrayType(LongType)
  }
  override def prettyName: String = "gram_hashes"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gram_hashes needs array<string>, got ${other.sql}")
    }

  def compute(input: ArrayData): ArrayData = {
    val n = input.numElements()
    val out = new Array[Any](n)
    var j = 0
    while (j < n) {
      if (!input.isNullAt(j)) {
        out(j) = SketchKernel.h60(input.getUTF8String(j))
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramHashes", this,
      classOf[GramHashes].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** k-entry minhash signature of a shingle-array column in one per-doc
  * loop — bit-identical to `explode` + [[MinHashAgg]] (same h60 base,
  * same affine salts; SketchAggsSpec asserts equality on real
  * documents), with no exploded rows and no aggregation exchange. */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  @transient private lazy val (saltA, saltB) = PortableHash.affineParams(k)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature needs array<string>, got ${other.sql}")
    }

  def compute(input: ArrayData): ArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = input.numElements()
    var j = 0
    while (j < n) {
      if (!input.isNullAt(j)) {
        // identical arithmetic to MinHashAgg.update: floorMod ≡ % here
        // because h60 is non-negative by construction
        val hp = SketchKernel.h60(input.getUTF8String(j)) % PortableHash.P
        var i = 0
        while (i < k) {
          val s = (saltA(i) * hp + saltB(i)) % PortableHash.P
          if (s < sig(i)) sig(i) = s
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this,
      classOf[MinHashSignature].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit simhash of a shingle-array column in one per-doc loop —
  * bit-identical to `explode` + [[SimHashAgg]] (same h60 base, same
  * ±1 vote rule per bit, sign-packed; bits 60-63 vote −1 always and
  * pack to 0, exactly as in the aggregate). */
case class SimHashSignature(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_signature"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_signature needs array<string>, got ${other.sql}")
    }

  def compute(input: ArrayData): Long = {
    val votes = new Array[Long](64)
    val n = input.numElements()
    var j = 0
    while (j < n) {
      if (!input.isNullAt(j)) {
        val h = SketchKernel.h60(input.getUTF8String(j))
        var b = 0
        while (b < 64) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
          b += 1
        }
      }
      j += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sim |= (1L << b); b += 1 }
    sim
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashSig", this,
      classOf[SimHashSignature].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SketchExprs {
  /** One-loop [[PortableHash.h60]] of every element of a string-array
    * column (see [[GramHashes]]). */
  def gramHashes(grams: Column): Column =
    ColumnBridge.column(GramHashes(ColumnBridge.expression(grams)))

  /** One-loop k-entry minhash signature of a shingle-array column. */
  def minhashSig(grams: Column, k: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(grams), k))

  /** One-loop 64-bit simhash of a shingle-array column. */
  def simhashSig(grams: Column): Column =
    ColumnBridge.column(SimHashSignature(ColumnBridge.expression(grams)))
}
