package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

/** Elements of a SORTED-distinct long array that are present in a fixed
  * sorted key set (merge scan, no allocation beyond the result) — the
  * index side of the substring-containment blocker: instead of exploding
  * every k-gram hash of every document (~|corpus|·|text| rows) into a
  * join, each document emits ONLY its matching probe keys (typically a
  * handful), and the join machinery never sees the non-matches.
  */
case class KeysInSortedSet(child: Expression, keys: Array[Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"keys_in_sorted_set requires array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    KeysInSortedSet.matches(input.asInstanceOf[ArrayData], keys)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedKeys", keys, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.KeysInSortedSet.matches($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KeysInSortedSet {
  /** PRECONDITION: x sorted ascending distinct; keys sorted ascending. */
  def matches(x: ArrayData, keys: Array[Long]): ArrayData = {
    val n = x.numElements()
    var i = 0; var j = 0; var c = 0
    val out = new Array[Long](math.min(n, keys.length))
    while (i < n && j < keys.length) {
      val xv = x.getLong(i); val kv = keys(j)
      if (xv == kv) { out(c) = xv; c += 1; i += 1; j += 1 }
      else if (xv < kv) i += 1
      else j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      if (c == out.length) out else java.util.Arrays.copyOf(out, c))
  }
}

/** Column constructors for expressions carrying driver-side arrays. */
object GraftColumnBridgeOps {
  import org.apache.spark.sql.GraftColumnBridge
  def keysInSortedSet(c: Column, keys: Array[Long]): Column =
    GraftColumnBridge.column(KeysInSortedSet(GraftColumnBridge.expression(c), keys))
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
