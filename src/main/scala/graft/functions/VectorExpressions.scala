package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
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
}
