package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

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
    var acc = 0.0
    var mi = 0
    while (mi < m) {
      acc += lut.getDouble(mi * ksub + code.getInt(mi))
      mi += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val mi = ctx.freshName("mi")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $b.numElements();
         |double $acc = 0.0;
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  $acc += $a.getDouble($mi * $ksub + $b.getInt($mi));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
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
  * code there; no fixture or API path feeds short vectors).
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
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(bestCode)
  }
}

object VectorExpressions {
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
