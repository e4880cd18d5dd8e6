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
    ext.injectFunction(GraftExtensions.bottomKFn)
    ext.injectFunction(GraftExtensions.heavyHittersFn)
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

  /** Foldable-integer second argument (the sketch capacity in SQL text:
    * `graft_bottom_k(h, 16)`). */
  private def litInt(e: Expression, fn: String): Int = e.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other =>
      throw new IllegalArgumentException(s"$fn: k must be an integer literal, got $other")
  }

  private val bottomKFn = (
    new FunctionIdentifier("graft_bottom_k"),
    new ExpressionInfo(classOf[BottomKAgg].getName, "graft_bottom_k"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_bottom_k(longCol, k)")
      BottomKAgg(children.head, litInt(children(1), "graft_bottom_k"))
    })

  private val heavyHittersFn = (
    new FunctionIdentifier("graft_heavy_hitters"),
    new ExpressionInfo(classOf[HeavyHittersAgg].getName, "graft_heavy_hitters"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_heavy_hitters(strCol, k)")
      HeavyHittersAgg(children.head, litInt(children(1), "graft_heavy_hitters"))
    })

  /** Imperative registration for a session that was built elsewhere
    * (extensions only apply at builder time; `getOrCreate` on an existing
    * context skips them — e.g. the driver-owned Verify/Bench sessions). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(dotFn, asciiFoldFn, bottomKFn, heavyHittersFn).foreach {
      case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
