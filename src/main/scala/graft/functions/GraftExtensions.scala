package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: exposes the engine's native
  * expressions to SQL, so `spark.sql("SELECT sorted_intersect_card(a, b)")`
  * works on any session built with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  *
  * (Preference order (c) of the build rules — registered extension point;
  * the engine itself needs no custom planner strategies because every
  * operator lowers to stock Catalyst plans, SURVEY.md §7.3.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_card"),
      new ExpressionInfo(
        classOf[SortedLongIntersectCard].getName,
        null,
        "sorted_intersect_card",
        "_FUNC_(a, b) - Intersection cardinality of two array<bigint> that are " +
          "sorted ascending and distinct (PRECONDITION: unsorted input undercounts).",
        "", "", "", "misc_funcs", "", "", "java_udf"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new IllegalArgumentException(
            s"sorted_intersect_card requires exactly 2 arguments, got ${children.length}")
        SortedLongIntersectCard(children(0), children(1))
      }))
  }
}
