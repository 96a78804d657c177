package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.extract.ExtractText
import graft.signatures.MinHasher

/** Custom Catalyst expressions (SURVEY.md §2.10). All deterministic and
  * null-intolerant so Catalyst can fold/prune around them.
  *
  * Codegen: each expression emits a direct static-shaped call to its kernel
  * (via an object reference) from inside the whole-stage-generated code —
  * the generated projection stays in one WSCG span and the per-row cost is
  * exactly one virtual call into the JIT-compiled kernel. v1 used
  * CodegenFallback (interpreted `eval(row)` per row); the measured delta is
  * recorded in BASELINE.md — the kernels dominate either way, codegen here
  * buys the span, not arithmetic.
  */

/** html: binary -> extracted text: string (ST0 per-row invariant). */
case class ExtractTextExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "extract_text"

  /** Shared by interpreted eval and generated code. */
  def kernel(input: Array[Byte]): UTF8String =
    UTF8String.fromString(ExtractText(input))

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("extractTextExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ExtractTextExpr =
    copy(child = newChild)

  // checkInputDataTypes default (via inputTypes) not available without
  // ExpectsInputTypes; keep an explicit guard:
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"extract_text expects BINARY, got ${child.dataType.catalogString}")
}

/** text: string -> struct(minhash: array<long>, simhash: long,
  * band_hashes: array<long>) — the full ST1 signature in one fused pass so
  * the shingle set is materialized exactly once per distinct text.
  */
case class DocSignatureExpr(
    child: Expression,
    shingleK: Int,
    numPerm: Int,
    bands: Int,
    seed: Long
) extends UnaryExpression {

  override def dataType: DataType = DocSignatureExpr.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "doc_signature"

  // Permutation parameters are a pure function of (numPerm, seed); computed
  // once per expression instance (per task after serialization), not per row.
  @transient private lazy val perms = MinHasher.permParams(numPerm, seed)

  /** Shared by interpreted eval and generated code: the full ST1 signature
    * in one fused pass, shingle set materialized exactly once. */
  def kernel(input: UTF8String): InternalRow = {
    val shingles = MinHasher.shingleHashes(input.toString, shingleK)
    val sig = MinHasher.minhash(shingles, perms._1, perms._2)
    val sim = MinHasher.simhash(shingles)
    val bandKeys = MinHasher.bandHashes(sig, bands)
    InternalRow(new GenericArrayData(sig), sim, new GenericArrayData(bandKeys))
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("docSignatureExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): DocSignatureExpr =
    copy(child = newChild)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"doc_signature expects STRING, got ${child.dataType.catalogString}")
}

object DocSignatureExpr {
  val schema: StructType = StructType(Seq(
    StructField("minhash", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("simhash", LongType, nullable = false),
    StructField("band_hashes", ArrayType(LongType, containsNull = false), nullable = false)
  ))
}

/** Column-level entry points. */
object GraftFunctions {
  import org.apache.spark.sql.graftshim.ColumnShim.{column, expression}

  def extractText(html: Column): Column =
    column(ExtractTextExpr(expression(html)))

  def docSignature(text: Column, shingleK: Int, numPerm: Int, bands: Int, seed: Long): Column =
    column(DocSignatureExpr(expression(text), shingleK, numPerm, bands, seed))
}
