package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.text.Fingerprint

/** text -> array<long> winnowing fingerprint set (Schleimer et al. 2003).
  * Deterministic; the copy-detection sketch tier of the text-analysis ops. */
case class WinnowFingerprintExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprint"

  def kernel(input: UTF8String): GenericArrayData =
    new GenericArrayData(Fingerprint.fingerprints(input.toString, k, w))

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprintExpr =
    copy(child = newChild)

  // SQL-registered (GraftExtensions): a wrong-typed argument must fail
  // ANALYSIS, not crash codegen/eval with a ClassCastException mid-query.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects STRING, got ${child.dataType.catalogString}")
}

/** text -> 64-bit digest of the winnowing fingerprint set. */
case class Fingerprint64Expr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fingerprint64"

  def kernel(input: UTF8String): Long =
    Fingerprint.fingerprint64(input.toString, k, w)

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fp64Expr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64Expr =
    copy(child = newChild)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects STRING, got ${child.dataType.catalogString}")
}

object TextFunctions {
  import org.apache.spark.sql.graftshim.ColumnShim.{column, expression}

  def winnowFingerprint(text: Column,
      k: Int = Fingerprint.DefaultK, w: Int = Fingerprint.DefaultW): Column =
    column(WinnowFingerprintExpr(expression(text), k, w))

  def fingerprint64(text: Column,
      k: Int = Fingerprint.DefaultK, w: Int = Fingerprint.DefaultW): Column =
    column(Fingerprint64Expr(expression(text), k, w))
}
