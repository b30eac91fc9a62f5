package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class VectorExpressionsSpec extends AnyFunSuite with Matchers {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("dot_f32 matches the sequential-fold HOF bit for bit") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, -0.6f)),
      (Array.empty[Float], Array.empty[Float]))
      .toDF("a", "b")
    val rows = df.select(
      VectorExpressions.dotF32(col("a"), col("b")).as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * " +
        "CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
        .as("ref")).collect()
    rows.foreach { r =>
      // exact bit equality, not approx: the operators' oracle parity
      // depends on it
      java.lang.Double.doubleToLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToLongBits(r.getDouble(1))
    }
    rows(0).getDouble(0) shouldBe 32.0
  }

  test("dot_f32 survives both codegen and interpreted paths") {
    import spark.implicits._
    val df = Seq((Array(1.5f, 2.5f), Array(2.0f, 4.0f))).toDF("a", "b")
    // wholestage on (default)
    df.select(VectorExpressions.dotF32(col("a"), col("b")))
      .collect().head.getDouble(0) shouldBe 13.0
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      df.select(VectorExpressions.dotF32(col("a"), col("b")))
        .collect().head.getDouble(0) shouldBe 13.0
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("null inputs yield null") {
    import spark.implicits._
    val df = Seq((Option.empty[Array[Float]], Some(Array(1.0f))))
      .toDF("a", "b")
    df.select(VectorExpressions.dotF32(col("a"), col("b")))
      .collect().head.isNullAt(0) shouldBe true
  }

  test("pq_adc_lut sums the selected LUT cells on both codegen paths") {
    import spark.implicits._
    // m = 2 subspaces, ksub = 3: lut laid out [mi * ksub + code]
    val lut = Array(10.0, 20.0, 30.0, 1.0, 2.0, 3.0)
    val df = Seq(
      (lut, Array(0, 2)), // 10 + 3
      (lut, Array(2, 0)), // 30 + 1
      (lut, Array(1, 1))) // 20 + 2
      .toDF("lut", "code")
    def run(): Seq[Double] =
      df.select(VectorExpressions.pqAdcLut(col("lut"), col("code"), 3))
        .collect().toSeq.map(_.getDouble(0))
    run() shouldBe Seq(13.0, 31.0, 22.0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try run() shouldBe Seq(13.0, 31.0, 22.0)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("pq_adc_lut null inputs yield null") {
    import spark.implicits._
    val df = Seq((Option.empty[Array[Double]], Some(Array(0))))
      .toDF("lut", "code")
    df.select(VectorExpressions.pqAdcLut(col("lut"), col("code"), 1))
      .collect().head.isNullAt(0) shouldBe true
  }
}
