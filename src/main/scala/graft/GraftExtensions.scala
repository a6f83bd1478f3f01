package graft

import graft.expressions.{DotProduct, RewriteDotProduct}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension wiring — `.config("spark.sql.extensions",
  * "graft.GraftExtensions")` makes the engine's native expressions
  * available to plain `spark.sql(...)` text, not just the Column API:
  *
  * {{{ SELECT dot_product(a.embedding, b.embedding) FROM ... }}}
  *
  * and installs the [[graft.expressions.RewriteDotProduct]] optimizer
  * rule, which upgrades the equivalent built-in
  * `aggregate(zip_with(...))` fold to the native expression
  * automatically.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"dot_product takes 2 arguments, got ${args.length}")
        DotProduct(args.head, args(1))
      }))
    ext.injectOptimizerRule(_ => RewriteDotProduct)
  }
}
