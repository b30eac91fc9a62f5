package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expression for the float-vector dot product: the hot
  * inner loop of every similarity/dedup operator over embeddings.
  *
  * Semantics are EXACTLY the sequential fold
  * `sum_i (double)a[i] * (double)b[i]` — the same order of operations as
  * the `aggregate(zip_with(...))` HOF it replaces and as the DuckDB
  * oracle's `list_sum(list_transform(list_zip(...)))`, so results stay
  * bit-identical while the codegen'd loop runs on primitive arrays with
  * zero per-element allocation (the HOF materializes a zipped struct
  * array per row-pair, which dominated the d05/s01 profile).
  */
case class DotProductF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_f32 requires ARRAY<FLOAT> inputs, got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f32"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** Native integer dot product over two ARRAY<INT> columns — the scoring
  * loop of scalar-quantized (SQ8) retrieval, where vectors are stored as
  * per-vector-scaled int8 codes (the s05 convention) and the approximate
  * dot is `idot(qa, qb) · mxa · mxb / 127²`. The fold is exact 64-bit
  * integer arithmetic (64-dim int8 products bound |acc| ≤ 64·127² ≪
  * 2⁶³), so cross-engine parity is exact by construction — no float
  * ordering concerns at all. Same zero-allocation primitive-array loop
  * as [[DotProductF32]]. */
case class DotProductI32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_i32 requires ARRAY<INT> inputs, got $l and $r")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_i32"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getInt(i).toLong * y.getInt(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((long) $a.getInt($i)) * ((long) $b.getInt($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** Native ADC (asymmetric distance computation) table lookup for product
  * quantization: given a per-QUERY lookup table `lut` (flattened
  * `m × ksub` doubles, `lut[mi * ksub + code]` = the query⋅sub-centroid
  * dot product, precomputed ONCE per query) and a per-ROW code array
  * (`m` small ints), returns `sum_mi lut[mi * ksub + code[mi]]`.
  *
  * This is the PQ scan trick from Jégou et al.: the per-candidate cost
  * drops from m × dsub multiply-adds (the interpreted
  * `aggregate(zip_with(slice(...)))` HOF it replaces — the engine's
  * slowest per-byte code, r7 verdict) to m array reads, and the loop
  * codegens into the same whole-stage pipeline as the surrounding join.
  * The LUT entries are computed with the identical sequential fold the
  * old inline dot used, so ADC scores stay bit-identical.
  *
  * Registered as a public SQL function, so the index arithmetic is
  * bounds-checked: a code outside [0, ksub) or past the LUT's length
  * raises a named error instead of silently reading past the
  * UnsafeArrayData payload (whose own assert is disabled in normal
  * JVMs). Library call sites always satisfy the invariant, so the
  * branch never fires on the hot path — it exists for the SQL surface.
  */
case class PqAdcLut(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_lut requires (ARRAY<DOUBLE>, ARRAY<INT>), got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_lut"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val code = b.asInstanceOf[ArrayData]
    val m = code.numElements()
    val n = lut.numElements()
    var acc = 0.0
    var mi = 0
    while (mi < m) {
      val c = code.getInt(mi)
      if (c < 0 || c >= ksub || mi * ksub + c >= n)
        PqAdcLut.outOfRange(mi, c, ksub, n)
      acc += lut.getDouble(mi * ksub + c)
      mi += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val mi = ctx.freshName("mi")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $b.numElements();
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  int $c = $b.getInt($mi);
         |  if ($c < 0 || $c >= $ksub || $mi * $ksub + $c >= $n) {
         |    graft.functions.PqAdcLut.outOfRange($mi, $c, $ksub, $n);
         |  }
         |  $acc += $a.getDouble($mi * $ksub + $c);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object PqAdcLut {
  /** Named failure for the SQL surface (called from generated code). */
  def outOfRange(mi: Int, code: Int, ksub: Int, lutLen: Int): Nothing =
    throw new IllegalArgumentException(
      s"pq_adc_lut: code $code at subspace $mi out of range for " +
        s"ksub=$ksub, lut of $lutLen entries")
}

/** Native PQ encoder: per corpus vector, the argmax sub-centroid code
  * for every subspace in ONE codegen'd pass — the per-corpus-byte map
  * work of PQ index build (m × ksub × dsub multiply-adds per row; the
  * interpreted `array_min(transform(map_entries(...)))` HOF it replaces
  * allocated a struct per (subspace, centroid) candidate and was the
  * dominant linear-growth term of s10/s11 index build).
  *
  * Inputs are the flattened codebook (one broadcast row): `cells[j]` =
  * `mi * ksub + code` for live codebook entry j (Lloyd can empty cells,
  * so entries are sparse and sorted), `cents` = the entries' centroids
  * concatenated (dsub floats each), `cnrms[j]` = the entries' norms.
  * Output: `m` codes (ARRAY<INT>).
  *
  * Parity contract with the HOF (asserted in VectorExpressionsSpec):
  * per entry the dot product is the same sequential fold, the winner
  * comparison is `java.lang.Double.compare` on -dot/cnrm then the
  * smaller code — exactly Spark's struct ordering in `array_min`
  * (NaN greater than every double and equal to itself). A vector
  * shorter than m·dsub yields null (the HOF produced an undefined
  * code there; no fixture or API path feeds short vectors), as does a
  * codebook with an entry-less subspace — malformed input fails to a
  * null row instead of emitting a poisoned sentinel code.
  */
case class PqEncodeF32(first: Expression, second: Expression,
    third: Expression, fourth: Expression, m: Int, ksub: Int, dsub: Int)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(IntegerType, _),
            ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_encode_f32 requires (ARRAY<FLOAT>, ARRAY<INT>, ARRAY<FLOAT>, " +
          s"ARRAY<DOUBLE>), got $other")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode_f32"
  override def nullable: Boolean = true

  /** Shared by eval and the codegen template (called reflectively from
    * generated code, so it must be public static-like — an object method
    * on the companion). */
  override protected def nullSafeEval(vecA: Any, cellsA: Any, centsA: Any,
      cnrmsA: Any): Any =
    PqEncodeF32.encode(vecA.asInstanceOf[ArrayData],
      cellsA.asInstanceOf[ArrayData], centsA.asInstanceOf[ArrayData],
      cnrmsA.asInstanceOf[ArrayData], m, ksub, dsub)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, cells, cents, cnrms) => {
      val out = ctx.freshName("out")
      s"""
         |Object $out = graft.functions.PqEncodeF32.encode(
         |  $vec, $cells, $cents, $cnrms, $m, $ksub, $dsub);
         |if ($out == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(newFirst, newSecond, newThird, newFourth)
}

object PqEncodeF32 {
  /** The encode kernel: primitive-array loops, zero per-candidate
    * allocation. Returns null (not an exception) for vectors shorter
    * than m·dsub — the HOF folded null there. */
  def encode(vec: ArrayData, cells: ArrayData, cents: ArrayData,
      cnrms: ArrayData, m: Int, ksub: Int, dsub: Int): AnyRef = {
    if (vec.numElements() < m * dsub) return null
    val nEntries = cells.numElements()
    val bestNegd = new Array[Double](m)
    val bestCode = new Array[Int](m)
    java.util.Arrays.fill(bestNegd, java.lang.Double.NaN)
    java.util.Arrays.fill(bestCode, Int.MaxValue)
    var j = 0
    while (j < nEntries) {
      val cell = cells.getInt(j)
      val mi = cell / ksub
      val code = cell - mi * ksub
      var acc = 0.0
      var t = 0
      val vOff = mi * dsub
      val cOff = j * dsub
      while (t < dsub) {
        acc += vec.getFloat(vOff + t).toDouble *
          cents.getFloat(cOff + t).toDouble
        t += 1
      }
      val negd = -acc / cnrms.getDouble(j)
      val cmp = java.lang.Double.compare(negd, bestNegd(mi))
      if (cmp < 0 || (cmp == 0 && code < bestCode(mi))) {
        bestNegd(mi) = negd
        bestCode(mi) = code
      }
      j += 1
    }
    // A subspace with zero live codebook entries has no argmax: return
    // null (the short-vector convention) rather than emit the sentinel
    // Int.MaxValue inside a containsNull=false array — a poisoned code
    // that would overflow pq_adc_lut's index arithmetic downstream.
    // Unreachable via pqCodebooks (every subspace keeps >= 1 cell), so
    // this only fires on malformed hand-built codebooks.
    var mi = 0
    while (mi < m) {
      if (bestCode(mi) == Int.MaxValue) return null
      mi += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(bestCode)
  }
}

object VectorExpressions {
  /** Column-level exact integer dot product over two ARRAY<INT>
    * columns (SQ8 scoring — see [[DotProductI32]]). */
  def dotI32(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      DotProductI32(
        org.apache.spark.sql.graft.Bridge.expression(a),
        org.apache.spark.sql.graft.Bridge.expression(b)))

  /** Column-level dot product over two ARRAY<FLOAT> columns. */
  def dotF32(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      DotProductF32(
        org.apache.spark.sql.graft.Bridge.expression(a),
        org.apache.spark.sql.graft.Bridge.expression(b)))

  /** ADC score: sum over subspaces of the per-query LUT entry selected
    * by each candidate's PQ code. `lut` is ARRAY<DOUBLE> of length
    * m·ksub, `code` ARRAY<INT> of length m with values in [0, ksub). */
  def pqAdcLut(lut: Column, code: Column, ksub: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      PqAdcLut(
        org.apache.spark.sql.graft.Bridge.expression(lut),
        org.apache.spark.sql.graft.Bridge.expression(code),
        ksub))

  /** PQ encode: per-subspace argmax codes against the flattened
    * codebook (see [[PqEncodeF32]]). */
  def pqEncodeF32(vec: Column, cells: Column, cents: Column,
      cnrms: Column, m: Int, ksub: Int, dsub: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      PqEncodeF32(
        org.apache.spark.sql.graft.Bridge.expression(vec),
        org.apache.spark.sql.graft.Bridge.expression(cells),
        org.apache.spark.sql.graft.Bridge.expression(cents),
        org.apache.spark.sql.graft.Bridge.expression(cnrms),
        m, ksub, dsub))
}
