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
}
