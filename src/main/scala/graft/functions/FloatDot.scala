package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two array<float> columns as one codegen'd multiply-add
  * scan over ArrayData — no intermediate zipped array, no boxing. The
  * accumulation is a sequential left-fold in double over
  * `x(i).toDouble * y(i).toDouble`, bit-identical to the
  * `aggregate(zip_with(...))` expression chain it replaces (and to DuckDB's
  * `list_dot_product` over `::DOUBLE[]`), so oracle hashes are unchanged.
  * Extra elements of the longer array are ignored (zip semantics).
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_dot requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    FloatDotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.FloatDotProduct.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object FloatDotProduct {
  /** JVM entry shared by eval and generated code: sequential double fold. */
  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  import org.apache.spark.sql.GraftColumnBridge
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(FloatDotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

/** Squared L2 distance of two array<bigint> code columns as one codegen'd
  * scan — the SQ8 shortlist distance. Replaces an interpreted
  * `aggregate(zip_with(...))` fold that dominated the SQ search at corpus
  * scale (measured 158 s vs the 21 s EXACT float baseline at n=1M, i.e.
  * the "compressed" path was 7× slower than the thing it compresses).
  * Pure integer arithmetic — commutative, so values are bit-identical to
  * the fold it replaces and the ann_sq oracle is unchanged. Extra
  * elements of the longer array are ignored (zip semantics).
  */
case class LongSqL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"long_sq_l2 requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    LongSqL2.dist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LongSqL2.dist($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object LongSqL2 {
  def dist(x: ArrayData, y: ArrayData): Long = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  import org.apache.spark.sql.GraftColumnBridge
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(LongSqL2(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
