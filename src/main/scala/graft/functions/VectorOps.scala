package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftInterop
import org.apache.spark.sql.types._

/** Order-independent vector kernels as native Catalyst expressions.
  *
  * The engine's correctness contract (SURVEY.md §5) demands
  * order-independent, engine-independent float aggregation — a 1000-way
  * cluster merge must not change the answer, and the DuckDB oracle must
  * reproduce it exactly. Floating addition is not associative, so each
  * per-element product is quantized to the fixed grid 2⁻²⁴ FIRST:
  *
  *   dot(a, b) = ( Σᵢ ⌊aᵢ·bᵢ·2²⁴⌋ ) / 2²⁴
  *
  * Every step is exact IEEE-754 arithmetic that any engine reproduces
  * bit-identically: float→double widening is exact, the product is one
  * correctly-rounded double multiply, scaling by a power of two only
  * shifts the exponent (no rounding), floor is exact, and the integer
  * sum is associative. The final long→double divide is exact while the
  * scaled sum stays under 2⁵³ (quantization 6e-8 per element — far below
  * any embedding-similarity signal, and identical in both engines).
  *
  * An earlier version used per-element DECIMAL(30,12) casts
  * (`aggregate(zip_with(…))`); correct, but `BigDecimal.valueOf` parses a
  * string per element — measured ~34µs per 64-dim dot, 25× slower than
  * this kernel, and the SQL HOF form is interpreted (CodegenFallback) on
  * top. Codegen here emits a single static call, so the expression stays
  * inside whole-stage codegen and the JIT sees one tight primitive loop.
  */
object VectorKernels {
  /** 2²⁴ — quantization grid. Power of two, so scaling is exact. */
  val Scale: Double = 16777216.0

  private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** ( Σ ⌊aᵢ·bᵢ·2²⁴⌋ ) / 2²⁴ over the common prefix. */
  def dot(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += math.floor(elem(a, i, aF) * elem(b, i, bF) * Scale).toLong
      i += 1
    }
    acc / Scale
  }

  /** ( Σ ⌊(aᵢ−bᵢ)²·2²⁴⌋ ) / 2²⁴ — quantized squared L2 distance. */
  def sqDist(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = elem(a, i, aF) - elem(b, i, bF)
      acc += math.floor(d * d * Scale).toLong
      i += 1
    }
    acc / Scale
  }
}

/** Base for binary array→double decimal folds. Children must be
  * array<float> or array<double> (the engine's embedding types); anything
  * else fails analysis rather than silently coercing.
  */
abstract class DecimalVectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def kernelName: String

  protected def kernel(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double

  private def elementIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double> inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elementIsFloat(left), elementIsFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.$kernelName(" +
        s"$a, $b, ${elementIsFloat(left)}, ${elementIsFloat(right)});")
}

case class DecimalDot(left: Expression, right: Expression)
    extends DecimalVectorFold {
  override def prettyName: String = "decimal_dot"
  override protected def kernelName: String = "dot"
  override protected def kernel(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double =
    VectorKernels.dot(a, b, aF, bF)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class DecimalSquaredDistance(left: Expression, right: Expression)
    extends DecimalVectorFold {
  override def prettyName: String = "decimal_sq_dist"
  override protected def kernelName: String = "sqDist"
  override protected def kernel(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double =
    VectorKernels.sqDist(a, b, aF, bF)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-level API for the vector expressions. */
object VectorOps {
  def dot(a: Column, b: Column): Column =
    GraftInterop.column(DecimalDot(
      GraftInterop.expression(a), GraftInterop.expression(b)))

  def sqDist(a: Column, b: Column): Column =
    GraftInterop.column(DecimalSquaredDistance(
      GraftInterop.expression(a), GraftInterop.expression(b)))
}
