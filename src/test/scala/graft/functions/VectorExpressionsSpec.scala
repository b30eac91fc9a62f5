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

  test("dot_i32 matches the integer-fold HOF exactly on both codegen " +
    "paths, nulls yield null") {
    import spark.implicits._
    val df = Seq(
      (Array(127, -127, 64), Array(-127, 127, 64)),
      (Array(3, 0, -5), Array(7, 9, 2)),
      (Array.empty[Int], Array.empty[Int]))
      .toDF("a", "b")
    def check(): Unit = {
      val rows = df.select(
        VectorExpressions.dotI32(col("a"), col("b")).as("fast"),
        expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS BIGINT) * " +
          "CAST(y AS BIGINT)), CAST(0 AS BIGINT), (acc, v) -> acc + v)")
          .as("ref")).collect()
      rows.foreach(r => r.getLong(0) shouldBe r.getLong(1))
      rows(0).getLong(0) shouldBe (-127L * 127 * 2 + 64L * 64)
    }
    check()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try check()
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    Seq((Option.empty[Array[Int]], Some(Array(1))))
      .toDF("a", "b")
      .select(VectorExpressions.dotI32(col("a"), col("b")))
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

  test("pq_encode_f32 matches the array_min HOF formulation bit for bit") {
    import spark.implicits._
    val m = 2; val ksub = 3; val dsub = 4
    // deterministic pseudo-random corpus + codebook, incl. an exact-tie
    // vector (all-zero -> every negd is -0.0/cnrm == -0.0: smallest code
    // must win in both formulations)
    def vec(seed: Int): Array[Float] =
      Array.tabulate(m * dsub)(i => (((seed * 31 + i * 17) % 13) - 6) / 7.0f)
    val corpus = ((0 until 12).map(s => (s.toLong, vec(s))) :+
      (99L, Array.fill(m * dsub)(0.0f))).toDF("id", "v")
    // live cells: drop one (dead Lloyd cell) to exercise sparsity
    val entries = for {
      mi <- 0 until m; k <- 0 until ksub
      if !(mi == 1 && k == 1)
    } yield (mi, k, Array.tabulate(dsub)(t => (((mi * 7 + k * 5 + t) % 9) - 4) / 5.0f))
    val cells = entries.map { case (mi, k, _) => mi * ksub + k }.toArray
    val cents = entries.flatMap(_._3).toArray
    val cnrms = entries.map { case (_, _, c) =>
      math.sqrt(c.map(x => x.toDouble * x.toDouble).sum) }.toArray
    val withCb = corpus
      .withColumn("cells", typedLit(cells))
      .withColumn("cents", typedLit(cents))
      .withColumn("cnrms", typedLit(cnrms))
    // the old interpreted formulation, reconstructed as a map lookup
    val mbEntries = entries.map { case (mi, k, c) => (mi, k, c,
      math.sqrt(c.map(x => x.toDouble * x.toDouble).sum)) }
    val mbSql = (0 until m).map { mi =>
      val inner = mbEntries.filter(_._1 == mi).map { case (_, k, c, nr) =>
        s"$k, named_struct('centroid', array(${c.mkString("F,")}F), " +
          s"'cnrm', ${nr}D)"
      }.mkString(", ")
      s"$mi, map($inner)"
    }.mkString(", ")
    val hof = withCb.withColumn("mb", expr(s"map($mbSql)"))
      .withColumn("ref", expr(
        s"""transform(sequence(0, ${m - 1}), mi ->
           |  array_min(transform(map_entries(element_at(mb, mi)), e ->
           |    struct(
           |      -aggregate(zip_with(
           |         slice(v, mi * $dsub + 1, $dsub),
           |         e.value.centroid,
           |         (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
           |        CAST(0 AS DOUBLE), (a, v) -> a + v) / e.value.cnrm
           |        AS negd,
           |      e.key AS code))).code)""".stripMargin))
      .withColumn("fast", VectorExpressions.pqEncodeF32(
        col("v"), col("cells"), col("cents"), col("cnrms"), m, ksub, dsub))
    val rows = hof.select("id", "ref", "fast").collect()
    rows.foreach { r =>
      withClue(s"id=${r.getLong(0)}: ") {
        r.getSeq[Int](2) shouldBe r.getSeq[Int](1)
      }
    }
    // short vector -> null, never an out-of-bounds read
    val short = Seq((1L, Array(1.0f))).toDF("id", "v")
      .withColumn("cells", typedLit(cells))
      .withColumn("cents", typedLit(cents))
      .withColumn("cnrms", typedLit(cnrms))
      .select(VectorExpressions.pqEncodeF32(
        col("v"), col("cells"), col("cents"), col("cnrms"), m, ksub, dsub))
      .collect()
    short.head.isNullAt(0) shouldBe true
  }

  test("pq_adc_lut null inputs yield null") {
    import spark.implicits._
    val df = Seq((Option.empty[Array[Double]], Some(Array(0))))
      .toDF("lut", "code")
    df.select(VectorExpressions.pqAdcLut(col("lut"), col("code"), 1))
      .collect().head.isNullAt(0) shouldBe true
  }

  test("pq_adc_lut raises a named error on out-of-range codes (SQL surface)") {
    import spark.implicits._
    val lut = Array(10.0, 20.0, 30.0, 1.0, 2.0, 3.0) // m=2, ksub=3
    def run(code: Array[Int]): Unit =
      Seq((lut, code)).toDF("lut", "code")
        .select(VectorExpressions.pqAdcLut(col("lut"), col("code"), 3))
        .collect()
    // code >= ksub, negative code, and short lut must all fail by name
    // on both execution paths, never read past the payload
    for (bad <- Seq(Array(0, 3), Array(-1, 0))) {
      val e = intercept[Exception](run(bad))
      e.getMessage should include("pq_adc_lut")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try {
        val e2 = intercept[Exception](run(bad))
        e2.getMessage should include("pq_adc_lut")
      } finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    val shortLut = intercept[Exception] {
      Seq((Array(10.0, 20.0, 30.0, 1.0), Array(0, 2))).toDF("lut", "code")
        .select(VectorExpressions.pqAdcLut(col("lut"), col("code"), 3))
        .collect()
    }
    shortLut.getMessage should include("pq_adc_lut")
    // in-range codes still sum exactly as before
    Seq((lut, Array(0, 2))).toDF("lut", "code")
      .select(VectorExpressions.pqAdcLut(col("lut"), col("code"), 3))
      .collect().head.getDouble(0) shouldBe 13.0
  }

  test("pq_encode_f32 yields null for a codebook with an entry-less subspace") {
    import spark.implicits._
    val m = 2; val ksub = 3; val dsub = 2
    // subspace 1 has NO live cells: the old HOF produced a null element;
    // the kernel must return a null row, never the Int.MaxValue sentinel
    val cells = Array(0, 1) // both entries in subspace 0
    val cents = Array(1.0f, 0.0f, 0.0f, 1.0f)
    val cnrms = Array(1.0, 1.0)
    val out = Seq((1L, Array(1.0f, 2.0f, 3.0f, 4.0f))).toDF("id", "v")
      .withColumn("cells", typedLit(cells))
      .withColumn("cents", typedLit(cents))
      .withColumn("cnrms", typedLit(cnrms))
      .select(VectorExpressions.pqEncodeF32(
        col("v"), col("cells"), col("cents"), col("cnrms"), m, ksub, dsub))
      .collect()
    out.head.isNullAt(0) shouldBe true
  }
}
