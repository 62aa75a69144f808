package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInterop
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Kernel for the `xor_decode` expression: Prometheus XOR chunk bytes →
  * Catalyst array<struct<us, value>>. Lives in its own object so codegen
  * can emit one static call.
  */
object ChunkKernels {
  def decode(bytes: Array[Byte]): ArrayData = {
    val samples = graft.sources.XorChunk.decode(bytes)
    val rows = new Array[Any](samples.length)
    var i = 0
    while (i < samples.length) {
      rows(i) = InternalRow(samples(i)._1, samples(i)._2)
      i += 1
    }
    new GenericArrayData(rows)
  }
}

/** `xor_decode(chunk_bytes)` — decode a Prometheus XOR chunk (the
  * reference's `__chunk_bytes` format, schema/chunk.go:25-37) into
  * array<struct<us: bigint, value: double>>, usable from plain SQL:
  *
  *   SELECT user_id, s.us, s.value
  *   FROM chunks LATERAL VIEW explode(xor_decode(chunk)) t AS s
  *
  * Codegen'd (one static call), so decode + explode stay inside
  * whole-stage codegen.
  */
case class XorDecode(child: Expression) extends UnaryExpression {

  override def prettyName: String = "xor_decode"

  override def dataType: DataType = XorDecode.OutType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"xor_decode expects binary chunk bytes, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ChunkKernels.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ChunkKernels.decode($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object XorDecode {
  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("us", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false))), containsNull = false)
}

/** Column-level API. */
object ChunkOps {
  def xorDecode(chunk: Column): Column =
    GraftInterop.column(XorDecode(GraftInterop.expression(chunk)))
}
