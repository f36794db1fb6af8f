package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Cosine similarity of two float vectors as a native Catalyst
  * expression with whole-stage codegen (`doGenCode`) — the hot scalar
  * path of the ANN / embedding-dedup operators (SURVEY.md §2 D-E).
  *
  * A Scala UDF here would box every row and break the codegen span;
  * the higher-order-function composition ([[Vectors.dotHof]]) stays
  * declarative but walks three lambda evaluations per row. This
  * expression is one tight fused loop.
  *
  * Null handling: any null input → null result (standard
  * BinaryExpression nullable contract). Zero-norm vectors AND
  * non-finite results (a NaN component — a failed encoder's output)
  * → 0.0: the score domain is total and finite, which matters at
  * scale because Spark's double ordering treats NaN as the LARGEST
  * value — an unguarded NaN cosine would outrank every real score
  * and surface one corrupted embedding at the top of every ANN
  * ranking. Scoring degenerate vectors as orthogonal keeps them out
  * of near-dup pairs and top-k results instead.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toFloatArray()
    val ys = b.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(xs.length, ys.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = xs(i).toDouble; val y = ys(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else Vectors.finiteOr0(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs"); val ys = ctx.freshName("ys")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val r = ctx.freshName("r")
      s"""
         |float[] $xs = $a.toFloatArray();
         |float[] $ys = $b.toFloatArray();
         |int $n = Math.min($xs.length, $ys.length);
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = (double) $xs[$i];
         |  double y = (double) $ys[$i];
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |double $r = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (Math.sqrt($na) * Math.sqrt($nb));
         |${ev.value} = java.lang.Double.isFinite($r) ? $r : 0.0;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The `n` nearest codebook cells of a float vector, by (cosine desc,
  * cent_id asc) — the IVF cell-assignment / probe-selection kernel as
  * ONE fused expression over the broadcast codebook.
  *
  * The composed formulation (an `array_max` / `sort_array` over C
  * per-centroid `struct(cosine, -id)` nodes) is semantically identical
  * (AnnSpec pins them equal) but materializes C struct entries per row
  * and costs the optimizer/codegen a ~C·dim-literal expression tree.
  * Here the codebook rides as a [[Broadcast]] HANDLE — the plan
  * serializes a reference, executors fetch the cell array once via
  * block manager (never per task, never as plan literals: a 2¹⁴-cell
  * production codebook is ~4 MB, which belongs in broadcast blocks,
  * not in every serialized task binary) — and the row pays a single
  * C×dim loop with zero exchange.
  *
  * Arithmetic is bit-compatible with [[CosineSimilarity]] (same
  * double accumulation order, zero-norm → 0.0), and the tie-break is
  * the same primitive-compare-then-id rule as the struct ordering, so
  * swapping formulations cannot move a single result. */
case class NearestCells(child: Expression,
    codebook: Broadcast[Array[(Long, Array[Float])]], n: Int)
    extends UnaryExpression {

  @transient private lazy val ids: Array[Long] = codebook.value.map(_._1)
  @transient private lazy val cents: Array[Array[Float]] =
    codebook.value.map(_._2)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  def compute(input: ArrayData): ArrayData = {
    val xs = input.toFloatArray()
    val c = ids.length
    val sims = new Array[Double](c)
    var k = 0
    while (k < c) {
      val ys = cents(k)
      val m = math.min(xs.length, ys.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < m) {
        val x = xs(i).toDouble; val y = ys(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      // same total-finite contract as CosineSimilarity: a NaN
      // component must not hijack the (sims desc) cell ordering
      sims(k) =
        if (na == 0.0 || nb == 0.0) 0.0
        else Vectors.finiteOr0(dot / (math.sqrt(na) * math.sqrt(nb)))
      k += 1
    }
    val order = Array.range(0, c).sortWith { (a, b) =>
      if (sims(a) > sims(b)) true
      else if (sims(a) < sims(b)) false
      else ids(a) < ids(b)
    }
    new GenericArrayData(order.take(math.min(n, c)).map(ids(_)))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCells", this,
      classOf[NearestCells].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Vector math over `array<float>` embedding columns. */
object Vectors {

  /** The shared total-finite score guard of the interpreted cosine
    * paths (the codegen template inlines the same expression —
    * `java.lang.Double.isFinite(r) ? r : 0.0` — and VectorsSpec pins
    * the paths equal on NaN/Inf/zero-norm inputs). */
  @inline private[functions] def finiteOr0(r: Double): Double =
    if (java.lang.Double.isFinite(r)) r else 0.0

  /** Codegen'd nearest-codebook-cells over a BROADCAST codebook (see
    * [[NearestCells]]). Callers broadcast once per derived codebook
    * and reuse the handle across every assignment/probe column. */
  def nearestCells(v: Column, codebook: Broadcast[Array[(Long, Array[Float])]],
      n: Int): Column =
    ColumnBridge.column(NearestCells(ColumnBridge.expression(v), codebook, n))

  /** Codegen'd cosine similarity (see [[CosineSimilarity]]). */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Built-in-composed dot product (zip_with + aggregate) — the
    * "compose existing ops" baseline the custom expression is
    * benchmarked against in VectorsSpec. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + coalesce(v, lit(0.0d)))

  /** L2 norm via HOFs. */
  def normHof(a: Column): Column = sqrt(dotHof(a, a))

  /** Cosine via HOFs (reference semantics for the spec). Mirrors the
    * codegen kernel's total-finite contract: zero norms and NaN
    * results score 0.0 (float inputs cannot overflow the double
    * accumulators to infinity, so nanvl covers the non-finite set). */
  def cosineHof(a: Column, b: Column): Column = {
    val d = dotHof(a, b)
    val n = normHof(a) * normHof(b)
    when(n === 0.0d, 0.0d).otherwise(nanvl(d / n, lit(0.0d)))
  }

  // --- int8 scalar quantization ------------------------------------

  /** Per-vector symmetric int8 quantization scale: max|x| / 127.
    * Zero vectors quantize with scale 1 (all-zero codes). */
  def quantScale(v: Column): Column = {
    val m = array_max(transform(v, x => abs(x)))
    when(m === 0.0f, lit(1.0d)).otherwise(m.cast("double") / 127.0d)
  }

  /** Quantize a float vector to int8 codes (array<tinyint>): 4× the
    * storage density of float32 — the write-time representation for
    * a 100 TB embedding corpus. Round-half-up, clamped to ±127. */
  def quantize(v: Column, scale: Column): Column =
    transform(v, x =>
      greatest(lit(-127), least(lit(127),
        round(x.cast("double") / scale, 0).cast("int"))).cast("byte"))

  /** Dequantize int8 codes back to floats for scoring. */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => (c.cast("double") * scale).cast("float"))
}
