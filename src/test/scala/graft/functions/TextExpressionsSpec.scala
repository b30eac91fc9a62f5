package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class TextExpressionsSpec extends AnyFunSuite with Matchers {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fp(texts: String*): Seq[Long] = {
    import spark.implicits._
    texts.toDF("t")
      .select(TextExpressions.rollingMinHash64(col("t")))
      .collect().toSeq.map(_.getLong(0))
  }

  test("concatenation never raises the fingerprint: windows of the parts " +
    "are a subset of windows of the whole") {
    val x = "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"
    val y = "pack my box with five dozen liquor jugs"
    val Seq(a, b, ab) = fp(x, y, x + y)
    ab should be <= math.min(a, b)
  }

  test("different content yields different fingerprints") {
    val Seq(a, b) = fp("completely different words here", "nothing in common at all okay")
    a should not be b
  }

  test("short (<8 byte) and empty strings still fingerprint") {
    val out = fp("abc", "")
    out should have size 2
    out(0) should not be out(1)
  }

  test("codegen and interpreted paths agree") {
    val expected = fp("the quick brown fox", "tiny")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try fp("the quick brown fox", "tiny") shouldBe expected
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("matches a brute-force reference implementation") {
    val text = "abcdefghijklmnop"
    val bytes = text.getBytes("UTF-8")
    val windows = (0 to bytes.length - 8).map { i =>
      bytes.slice(i, i + 8).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    }
    val expected = windows
      .map(org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(_, 42L))
      .min
    fp(text).head shouldBe expected
  }

  test("null input yields null") {
    import spark.implicits._
    Seq(Option.empty[String]).toDF("t")
      .select(TextExpressions.rollingMinHash64(col("t")))
      .collect().head.isNullAt(0) shouldBe true
  }

  test("hex_slice_long equals conv(substring(...), 16, 10) on md5 output") {
    import spark.implicits._
    val df = Seq("alpha", "beta", "the quick brown fox", "").toDF("t")
      .select(md5(col("t")).as("h"))
    val viaConv = df.selectExpr(
      "CAST(conv(substring(h, 1, 15), 16, 10) AS BIGINT)",
      "CAST(conv(substring(h, 9, 8), 16, 10) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaNative = df.select(
      TextExpressions.hexSliceLong(col("h"), 1, 15),
      TextExpressions.hexSliceLong(col("h"), 9, 8))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    viaNative shouldBe viaConv
  }

  test("hex_slice_long: codegen and interpreted paths agree, nulls " +
    "propagate, lenient out-of-range digits read as 0") {
    import spark.implicits._
    def run() = Seq(Some("00000001cafebabe"), Some("ff"), None).toDF("h")
      .select(TextExpressions.hexSliceLong(col("h"), 1, 8))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    val expected = Array(Some(1L), Some(0xff000000L), None)
    run() shouldBe expected
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try run() shouldBe expected
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
