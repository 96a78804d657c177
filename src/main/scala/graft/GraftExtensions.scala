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

  /** (identifier, info, builder) for every exposed function. */
  val definitions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    val cfg = graft.model.GraftConfig()
    Seq(
      (FunctionIdentifier("extract_text"),
        info("extract_text", "extract_text(html binary) - deterministic HTML -> text extraction"),
        (args: Seq[Expression]) => ExtractTextExpr(args.head)),
      (FunctionIdentifier("doc_signature"),
        info("doc_signature",
          "doc_signature(text) - struct(minhash, simhash, band_hashes) at the default config"),
        (args: Seq[Expression]) =>
          DocSignatureExpr(args.head, cfg.shingleK, cfg.numPerm, cfg.bands, cfg.seed)),
      (FunctionIdentifier("winnow_fingerprint"),
        info("winnow_fingerprint", "winnow_fingerprint(text) - array<long> winnowing fingerprint set"),
        (args: Seq[Expression]) =>
          WinnowFingerprintExpr(args.head, Fingerprint.DefaultK, Fingerprint.DefaultW)),
      (FunctionIdentifier("fingerprint64"),
        info("fingerprint64", "fingerprint64(text) - 64-bit winnowing fingerprint digest"),
        (args: Seq[Expression]) =>
          Fingerprint64Expr(args.head, Fingerprint.DefaultK, Fingerprint.DefaultW)),
      (FunctionIdentifier("l2_normalize"),
        info("l2_normalize", "l2_normalize(embedding array<float>) - unit vector as array<double>"),
        (args: Seq[Expression]) => L2NormalizeExpr(args.head)),
      (FunctionIdentifier("dot_product"),
        info("dot_product", "dot_product(a array<double>, b array<double>) - double"),
        (args: Seq[Expression]) => DotProductExpr(args(0), args(1))),
      (FunctionIdentifier("embedding_band_keys"),
        info("embedding_band_keys",
          "embedding_band_keys(embedding array<float>) - array<long> sign-LSH band keys at the default AnnConfig"),
        (args: Seq[Expression]) => {
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
