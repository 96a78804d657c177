package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._
import graft.text.Fingerprint

/** SQL-function surface for the custom Catalyst expressions, so
  * `spark.sql("SELECT extract_text(html) ...")` works alongside the Column
  * API (SURVEY §2.10 registration surface).
  *
  * Two wiring paths over one definition list:
  *  - `spark.sql.extensions=graft.GraftExtensions` (spark-submit / fresh
  *    JVM): the standard SparkSessionExtensions injection;
  *  - `GraftExtensions.register(spark)`: direct registry installation into
  *    an existing session (tests, notebooks).
  */
object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** Arity-checked builder: a wrong-arity SQL call must fail analysis with
    * the function's name and usage, not leak a bare NoSuchElementException /
    * IndexOutOfBoundsException from `args.head` / `args(1)`. */
  private def checked(name: String, n: Int, usage: String)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != n)
        throw new IllegalArgumentException(
          s"Invalid number of arguments for function $name: expected $n, got ${args.length}. Usage: $usage")
      build(args)
    }

  /** (identifier, info, builder) for every exposed function. */
  val definitions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    val cfg = graft.model.GraftConfig()
    def fn(name: String, n: Int, usage: String)(build: Seq[Expression] => Expression) =
      (FunctionIdentifier(name), info(name, usage), checked(name, n, usage)(build))
    Seq(
      fn("extract_text", 1,
        "extract_text(html binary) - deterministic HTML -> text extraction")(
        args => ExtractTextExpr(args.head)),
      fn("doc_signature", 1,
        "doc_signature(text) - struct(minhash, simhash, band_hashes) at the default config")(
        args => DocSignatureExpr(args.head, cfg.shingleK, cfg.numPerm, cfg.bands, cfg.seed)),
      fn("winnow_fingerprint", 1,
        "winnow_fingerprint(text) - array<long> winnowing fingerprint set")(
        args => WinnowFingerprintExpr(args.head, Fingerprint.DefaultK, Fingerprint.DefaultW)),
      fn("fingerprint64", 1,
        "fingerprint64(text) - 64-bit winnowing fingerprint digest")(
        args => Fingerprint64Expr(args.head, Fingerprint.DefaultK, Fingerprint.DefaultW)),
      fn("l2_normalize", 1,
        "l2_normalize(embedding array<float>) - unit vector as array<double>")(
        args => L2NormalizeExpr(args.head)),
      fn("dot_product", 2,
        "dot_product(a array<double>, b array<double>) - double")(
        args => DotProductExpr(args(0), args(1))),
      fn("embedding_band_keys", 1,
        "embedding_band_keys(embedding array<float>) - array<long> sign-LSH band keys at the default AnnConfig")(
        args => {
          val ann = graft.similarity.Similarity.AnnConfig()
          EmbeddingBandKeysExpr(args.head, ann.bits, ann.bands, ann.seed)
        })
    )
  }

  /** Install into an existing session's function registry. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (id, fi, builder) =>
      org.apache.spark.sql.graftshim.FunctionShim.register(spark, id, fi, builder)
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach(ext.injectFunction)
}
