package graft

import graft.functions.{CosineSimilarityExpr, IsStopwordExpr, StemExpression}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: exposes graft's custom Catalyst
  * expressions to SQL (`SELECT graft_stem(word) …`), so `spark.sql` users
  * get the same codegen'd operators as the DataFrame API.
  *
  * Enable with:
  *   SparkSession.builder().config("spark.sql.extensions", "graft.GraftExtensions")
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.FuseCosineRule)
    ext.injectFunction((
      FunctionIdentifier("graft_stem"),
      new ExpressionInfo(classOf[StemExpression].getName, "graft_stem"),
      (children: Seq[Expression]) => StemExpression(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_is_stopword"),
      new ExpressionInfo(classOf[IsStopwordExpr].getName, "graft_is_stopword"),
      (children: Seq[Expression]) => IsStopwordExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSimilarityExpr(children(0), children(1))))
  }
}
