package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{greatest, lit, size, when}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Intersection cardinality of two SORTED long arrays — a native Catalyst
  * expression (preference order (b) of the build rules: custom Expression
  * before UDF). `array_intersect` builds a hash set per row and materializes
  * the intersection array; for the verify hot path we only need |∩| of two
  * pre-sorted hash shingle arrays, which a merge scan computes in O(n+m)
  * reading primitive longs straight out of ArrayData — no boxing, no
  * allocation. PRECONDITION: both arrays sorted ascending, distinct —
  * unsorted input undercounts (documented in the SQL usage string).
  *
  * Type checking makes SQL misuse an AnalysisException instead of silent
  * garbage (array<int> elements read as longs).
  */
case class SortedLongIntersectCard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_card requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedLongIntersectCard.card(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // real codegen (not CodegenFallback): one static call, keeps the verify
  // projection inside its whole-stage codegen span
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedLongIntersectCard.card($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SortedLongIntersectCard {
  /** JVM entry shared by eval and generated code. */
  def card(x: ArrayData, y: ArrayData): Int = {
    var i = 0; var j = 0; var c = 0
    val n = x.numElements(); val m = y.numElements()
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }
}

/** Int sibling of [[SortedLongIntersectCard]] for the 32-bit pipeline
  * shingle feature (array<int>, sorted ascending, distinct).
  */
case class SortedIntIntersectCard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_card_int requires two array<int> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntIntersectCard.card(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntIntersectCard.card($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SortedIntIntersectCard {
  def card(x: ArrayData, y: ArrayData): Int = {
    var i = 0; var j = 0; var c = 0
    val n = x.numElements(); val m = y.numElements()
    while (i < n && j < m) {
      val xv = x.getInt(i); val yv = y.getInt(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }
}

object SortedIntersect {

  import org.apache.spark.sql.GraftColumnBridge

  def card(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedLongIntersectCard(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def cardInt(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedIntIntersectCard(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Jaccard over two sorted distinct int arrays (32-bit shingle form). */
  def jaccardSortedInt(a: Column, b: Column): Column = {
    val c = cardInt(a, b)
    val u = size(a) + size(b) - c
    when(a.isNull || b.isNull, lit(null).cast("double"))
      .otherwise(when(u === 0, 1.0).otherwise(c.cast("double") / u))
  }

  /** Jaccard over two sorted distinct long arrays: |∩| / |∪| with the exact
    * same integer counts and IEEE division as the array_intersect form.
    */
  def jaccardSorted(a: Column, b: Column): Column = {
    val c = card(a, b)
    val u = size(a) + size(b) - c
    when(a.isNull || b.isNull, lit(null).cast("double"))
      .otherwise(when(u === 0, 1.0).otherwise(c.cast("double") / u))
  }
}
