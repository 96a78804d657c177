package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.similarity.EmbeddingKernels

/** Custom Catalyst expressions for the embedding-similarity tier (training-
  * data ops). Deterministic + null-intolerant like the text-signature
  * expressions; each emits a direct kernel call from generated code so the
  * projection stays inside one whole-stage-codegen span (the loops
  * themselves are JIT-compiled Scala either way).
  */

private[functions] object EmbeddingExprs {
  /** Null ELEMENTS cannot be rejected at analysis (parquet-read arrays are
    * always containsNull=true in schema) and `toDoubleArray`/`toFloatArray`
    * handle them inconsistently by physical layout — UnsafeArrayData reads
    * a null slot as 0.0 (silently wrong math), GenericArrayData NPEs. This
    * guard turns both into one loud, described failure; callers skip it
    * when the child schema proves elements non-null. */
  def requireNoNullElements(arr: ArrayData, fn: String): Unit = {
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"$fn: null array element at index $i (embedding vectors must be dense)")
      i += 1
    }
  }

  def mayHaveNullElements(dt: DataType): Boolean = dt match {
    case ArrayType(_, containsNull) => containsNull
    case _                          => true
  }
}

/** array<double> x array<double> -> double dot product (tight loop; faster
  * than the builtin `aggregate(zip_with(..))` lambda chain on the kNN
  * hot path, where it runs O(n*k_candidates) times). */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  private lazy val checkLeft = EmbeddingExprs.mayHaveNullElements(left.dataType)
  private lazy val checkRight = EmbeddingExprs.mayHaveNullElements(right.dataType)

  def kernel(a: ArrayData, b: ArrayData): Double = {
    if (checkLeft) EmbeddingExprs.requireNoNullElements(a, prettyName)
    if (checkRight) EmbeddingExprs.requireNoNullElements(b, prettyName)
    EmbeddingKernels.dot(a.toDoubleArray(), b.toDoubleArray())
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dotExpr", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.kernel($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductExpr =
    copy(left = l, right = r)

  // SQL-registered (GraftExtensions): wrong-typed arguments must fail
  // ANALYSIS, not crash eval with a ClassCastException mid-query.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val want = ArrayType(DoubleType, containsNull = false)
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (${want.catalogString}, ${want.catalogString}), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
}

/** array<float> -> l2-normalized array<double> (the similarity unit vector,
  * computed once per row instead of once per candidate pair). */
case class L2NormalizeExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2_normalize"

  private lazy val checkNulls = EmbeddingExprs.mayHaveNullElements(child.dataType)

  def kernel(input: ArrayData): GenericArrayData = {
    if (checkNulls) EmbeddingExprs.requireNoNullElements(input, prettyName)
    new GenericArrayData(EmbeddingKernels.normalize(input.toFloatArray()))
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("l2Expr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): L2NormalizeExpr =
    copy(child = newChild)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects ARRAY<FLOAT>, got ${other.catalogString}")
    }
}

/** array<float> -> array<long> of sign-LSH band bucket keys (random
  * hyperplane LSH, Charikar 2002). Same key shape as the MinHash band keys
  * so ST2's candidate-pair machinery is shared across both dedup tiers. */
case class EmbeddingBandKeysExpr(child: Expression, bits: Int, bands: Int, seed: Long)
    extends UnaryExpression {
  require(bits % bands == 0, s"bits=$bits must be divisible by bands=$bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "embedding_band_keys"

  // Hyperplanes depend on the runtime dim; built once per (instance, dim)
  // and cached behind a single @volatile reference — the expression instance
  // may be shared across task threads, and the volatile publish makes the
  // tuple's contents visible to other threads (a plain var's reference
  // write can't tear, but without the fence a reader could see a stale
  // null and recompute; volatile also rules out unsafe publication of the
  // array contents). Deterministic in (dim, bits, seed), so a benign race
  // at worst recomputes an identical tuple.
  @transient @volatile private var cache: (Int, Array[Array[Double]]) = _

  private lazy val checkNulls = EmbeddingExprs.mayHaveNullElements(child.dataType)

  def kernel(input: ArrayData): GenericArrayData = {
    if (checkNulls) EmbeddingExprs.requireNoNullElements(input, prettyName)
    val v = input.toFloatArray()
    var c = cache
    if (c == null || c._1 != v.length) {
      c = (v.length, EmbeddingKernels.hyperplanes(v.length, bits, seed))
      cache = c
    }
    val unit = EmbeddingKernels.normalize(v)
    new GenericArrayData(EmbeddingKernels.signBandKeys(unit, c._2, bands))
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bandKeysExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): EmbeddingBandKeysExpr =
    copy(child = newChild)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects ARRAY<FLOAT>, got ${other.catalogString}")
    }
}

object EmbeddingFunctions {
  import org.apache.spark.sql.graftshim.ColumnShim.{column, expression}

  def dotProduct(a: Column, b: Column): Column =
    column(DotProductExpr(expression(a), expression(b)))

  def l2Normalize(v: Column): Column =
    column(L2NormalizeExpr(expression(v)))

  def embeddingBandKeys(v: Column, bits: Int, bands: Int, seed: Long): Column =
    column(EmbeddingBandKeysExpr(expression(v), bits, bands, seed))
}
