package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{AHash60, AHashWide, ByteEntropyStats, DotProductF32, DotProductI32, FrameMeans, HexSliceToLong, MaxAbsF32, Pcm16WindowEnergy, PqAdcLut, PqEncodeF32, RollingMinHash64, Sq8EncodeF32, StrideSample, VecSubF32, WordChunks, WordNgrams}

/** Library entry point for SQL users: registers the native expressions
  * under SQL names, so `spark.sql("SELECT dot_f32(a, b) ...")` works the
  * same as the Column API. Enable with
  * `spark.sql.extensions=graft.GraftExtensions` (config-only, no code
  * change — the standard way a platform team ships engine extensions to
  * every job on a cluster).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotProductF32].getName, "dot_f32"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_f32 takes exactly 2 arguments")
        DotProductF32(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_i32"),
      new ExpressionInfo(classOf[DotProductI32].getName, "dot_i32"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_i32 takes exactly 2 arguments")
        DotProductI32(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "word_ngrams takes exactly 2 arguments")
        WordNgrams(args.head, intLit("word_ngrams", args(1)))
      }))
    ext.injectFunction((
      FunctionIdentifier("word_chunks"),
      new ExpressionInfo(classOf[WordChunks].getName, "word_chunks"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "word_chunks takes exactly 2 arguments")
        WordChunks(args.head, intLit("word_chunks", args(1)))
      }))
    ext.injectFunction((
      FunctionIdentifier("max_abs_f32"),
      new ExpressionInfo(classOf[MaxAbsF32].getName, "max_abs_f32"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "max_abs_f32 takes exactly 1 argument")
        MaxAbsF32(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("sq8_encode_f32"),
      new ExpressionInfo(classOf[Sq8EncodeF32].getName, "sq8_encode_f32"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "sq8_encode_f32 takes exactly 2 arguments")
        Sq8EncodeF32(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_sub_f32"),
      new ExpressionInfo(classOf[VecSubF32].getName, "vec_sub_f32"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_sub_f32 takes exactly 2 arguments")
        VecSubF32(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("rolling_min_hash64"),
      new ExpressionInfo(classOf[RollingMinHash64].getName,
        "rolling_min_hash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "rolling_min_hash64 takes exactly 1 argument")
        RollingMinHash64(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("hex_slice_long"),
      new ExpressionInfo(classOf[HexSliceToLong].getName, "hex_slice_long"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "hex_slice_long takes (string, start, len)")
        HexSliceToLong(args.head, intLit("hex_slice_long", args(1)),
          intLit("hex_slice_long", args(2)))
      }))
    ext.injectFunction((
      FunctionIdentifier("byte_entropy_stats"),
      new ExpressionInfo(classOf[ByteEntropyStats].getName,
        "byte_entropy_stats"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          "byte_entropy_stats takes exactly 1 argument")
        ByteEntropyStats(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("ahash60"),
      new ExpressionInfo(classOf[AHash60].getName, "ahash60"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "ahash60 takes exactly 1 argument")
        AHash60(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("ahash_wide"),
      new ExpressionInfo(classOf[AHashWide].getName, "ahash_wide"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "ahash_wide takes (binary, words)")
        AHashWide(args.head, intLit("ahash_wide", args(1)))
      }))
    ext.injectFunction((
      FunctionIdentifier("pcm16_window_energy"),
      new ExpressionInfo(classOf[Pcm16WindowEnergy].getName,
        "pcm16_window_energy"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "pcm16_window_energy takes (binary, windowSamples, channels)")
        Pcm16WindowEnergy(args.head,
          intLit("pcm16_window_energy", args(1)),
          intLit("pcm16_window_energy", args(2)))
      }))
    ext.injectFunction((
      FunctionIdentifier("frame_means"),
      new ExpressionInfo(classOf[FrameMeans].getName, "frame_means"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "frame_means takes (binary, frameBytes)")
        FrameMeans(args.head, intLit("frame_means", args(1)))
      }))
    ext.injectFunction((
      FunctionIdentifier("stride_sample"),
      new ExpressionInfo(classOf[StrideSample].getName, "stride_sample"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "stride_sample takes (binary, stride)")
        StrideSample(args.head, intLit("stride_sample", args(1)))
      }))
    ext.injectFunction((
      FunctionIdentifier("pq_adc_lut"),
      new ExpressionInfo(classOf[PqAdcLut].getName, "pq_adc_lut"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "pq_adc_lut takes (lut, code, ksub)")
        PqAdcLut(args.head, args(1), intLit("pq_adc_lut", args(2)))
      }))
    ext.injectFunction((
      FunctionIdentifier("pq_encode_f32"),
      new ExpressionInfo(classOf[PqEncodeF32].getName, "pq_encode_f32"),
      (args: Seq[Expression]) => {
        require(args.length == 7,
          "pq_encode_f32 takes (vec, cells, cents, cnrms, m, ksub, dsub)")
        PqEncodeF32(args.head, args(1), args(2), args(3),
          intLit("pq_encode_f32", args(4)),
          intLit("pq_encode_f32", args(5)),
          intLit("pq_encode_f32", args(6)))
      }))
  }

  // Sizing parameters must be literals: they shape the output schema,
  // which Catalyst resolves before any row exists.
  private def intLit(fn: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
      v.toString.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: sizing arguments must be integer literals, got $other")
  }
}
