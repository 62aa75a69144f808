package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftInterop
import org.apache.spark.sql.types._

/** Decimal-exact vector kernels as native Catalyst expressions.
  *
  * The engine's correctness contract (SURVEY.md §5) demands
  * order-independent, engine-independent float aggregation, which the
  * first implementation got from SQL higher-order functions:
  * `aggregate(zip_with(a, b, (x,y) -> CAST(x*y AS DECIMAL(30,12))), …)`.
  * HOFs are interpreted (CodegenFallback) and allocate a Catalyst Decimal
  * per element — the dominant cost of the ANN/near-dup operators, which
  * evaluate 1–24 such folds per row.
  *
  * These expressions keep the arithmetic BIT-IDENTICAL to that path —
  * per-element `BigDecimal.valueOf(product).setScale(12, HALF_UP)`, exact
  * scale-12 accumulation, final `.doubleValue()` — Spark's double→decimal
  * cast is value-of + HALF_UP rescale, and decimal addition at equal scale
  * is exact, so both pipelines produce the same double. The accumulator
  * here is the unscaled long (exact, alloc-free); `longValueExact` throws
  * on overflow rather than silently deviating (the decimal path would
  * overflow to null at the same magnitudes, ~1e20, far beyond any
  * realistic embedding).
  *
  * Codegen emits a single static call, so the expression stays inside
  * whole-stage codegen and the JIT sees one tight loop.
  */
object VectorKernels {
  @inline private def scaled12(p: Double): Long =
    JBigDecimal.valueOf(p).setScale(12, RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Σ round12(aᵢ·bᵢ) over the common prefix, as an exact decimal sum. */
  def dot(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc = Math.addExact(acc, scaled12(elem(a, i, aF) * elem(b, i, bF)))
      i += 1
    }
    new JBigDecimal(BigInteger.valueOf(acc), 12).doubleValue()
  }

  /** Σ round12((aᵢ−bᵢ)²) — exact-decimal squared L2 distance. */
  def sqDist(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = elem(a, i, aF) - elem(b, i, bF)
      acc = Math.addExact(acc, scaled12(d * d))
      i += 1
    }
    new JBigDecimal(BigInteger.valueOf(acc), 12).doubleValue()
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
