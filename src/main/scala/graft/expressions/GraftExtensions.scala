package graft.expressions

import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration of the native vector expressions, two ways:
  *
  *  - cluster-wide: `spark.sql.extensions=graft.expressions.GraftExtensions`
  *    (the SparkSessionExtensions injection point);
  *  - per-session: `GraftExtensions.register(spark)` on a live session.
  *
  * After either, plain SQL works:
  * {{{
  *   SELECT quantized_dot(a.embedding, b.embedding, 1000) FROM ...
  *   SELECT cosine_similarity(a.embedding, b.embedding) FROM ...
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    // auto-accelerate the documented interpreted dot-product fold
    ext.injectOptimizerRule(_ => NativeVectorRules)
  }
}

object GraftExtensions {

  private def quantizedDotBuilder(children: Seq[Expression]): Expression = {
    val scale = children.lift(2) match {
      case Some(Literal(v: Int, _)) => v
      case Some(other) => throw new IllegalArgumentException(
        s"quantized_dot scale must be an integer literal, got $other")
      case None => 1000
    }
    QuantizedDot(children(0), children(1), scale)
  }

  private[graft] val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("quantized_dot"),
      new ExpressionInfo(classOf[QuantizedDot].getName, "quantized_dot"),
      quantizedDotBuilder _),
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))),
    // Text-cleanup chains registered as SQL functions: the builder expands
    // the same Column composition the Scala API uses, so SQL and DataFrame
    // callers share one definition (no drift possible between the two).
    (FunctionIdentifier("redact_pii"),
      new ExpressionInfo(graft.operators.TextAnalysis.getClass.getName,
        "redact_pii"),
      (children: Seq[Expression]) => GraftBridge.expressionEager(
        graft.operators.TextAnalysis.redactPii(GraftBridge.column(children(0))))),
    (FunctionIdentifier("canonicalize_url"),
      new ExpressionInfo(graft.operators.TextAnalysis.getClass.getName,
        "canonicalize_url"),
      (children: Seq[Expression]) => GraftBridge.expressionEager(
        graft.operators.TextAnalysis.canonicalizeUrl(
          GraftBridge.column(children(0))))))

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(NativeVectorRules))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ NativeVectorRules
  }
}
