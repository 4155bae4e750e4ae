package graft

import graft.functions.{BloomMightContainF, DotProductF}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes the engine's custom Catalyst
  * expressions available to plain SQL users
  * (`spark.sql.extensions=graft.GraftExtensions` or
  * `.withExtensions(new GraftExtensions)`), and injects the optimizer
  * rule that rewrites the equivalent interpreted HOF fold into the
  * codegen'd expression automatically.
  *
  *   SELECT dot_product_f(a.embedding, b.embedding) FROM ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product_f"),
      new ExpressionInfo(classOf[DotProductF].getName, "dot_product_f"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_product_f(arrayA, arrayB)")
        DotProductF(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain_f"),
      new ExpressionInfo(classOf[BloomMightContainF].getName, "bloom_might_contain_f"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "bloom_might_contain_f(value, bloomBytes)")
        BloomMightContainF(children.head, children(1))
      }))
    ext.injectOptimizerRule(_ => graft.plans.RewriteDotProduct)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinLengthGuard)
  }
}
