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
      GraftExtensions.buildDotProduct _))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain_f"),
      new ExpressionInfo(classOf[BloomMightContainF].getName, "bloom_might_contain_f"),
      GraftExtensions.buildBloomMightContain _))
    ext.injectOptimizerRule(_ => graft.plans.RewriteDotProduct)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinLengthGuard)
    // whole-operator tier: custom logical nodes → custom SparkPlans
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategies)
  }
}

/** SQL builders, shared between the extension injection and tests so
  * argument validation has exactly one code path. */
object GraftExtensions {
  def buildDotProduct(children: Seq[Expression]): Expression = {
    require(children.length == 2, "dot_product_f(arrayA, arrayB)")
    DotProductF(children.head, children(1))
  }

  def buildBloomMightContain(children: Seq[Expression]): Expression = {
    require(children.length == 2, "bloom_might_contain_f(value, bloomBytes)")
    // The sketch must be a compile-time constant: a non-foldable second
    // argument would make BloomMightContainF deserialize per row (or NPE
    // on right.eval(null) for an attribute) at task runtime — fail here,
    // at analysis time, with a clear message.
    require(children(1).foldable,
      "bloom_might_contain_f: the bloom argument must be a foldable " +
        "binary literal (got a non-foldable expression)")
    BloomMightContainF(children.head, children(1))
  }
}
