package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql("SELECT graft_dot(a, b)")`
  * works anywhere the library's Column API does. Install with
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)          // programmatic
  *   // or: spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions
  *
  * (`Engine.session` installs it by default.) This is the (c)-tier
  * extension surface of the build contract — no custom planner rules are
  * needed for the reference's semantics (SURVEY.md §4: Catalyst covers
  * every rewrite it relies on), so only functions are injected.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFn)
    ext.injectFunction(GraftExtensions.asciiFoldFn)
  }
}

object GraftExtensions {
  private val dotFn = (
    new FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_dot(arrayA, arrayB)")
      DotProduct(children(0), children(1))
    })

  private val asciiFoldFn = (
    new FunctionIdentifier("graft_ascii_fold"),
    new ExpressionInfo(classOf[AsciiFold].getName, "graft_ascii_fold"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "graft_ascii_fold(str)")
      AsciiFold(children.head)
    })

  /** Imperative registration for a session that was built elsewhere
    * (extensions only apply at builder time; `getOrCreate` on an existing
    * context skips them — e.g. the driver-owned Verify/Bench sessions). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(dotFn, asciiFoldFn).foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
