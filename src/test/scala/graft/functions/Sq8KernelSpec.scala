package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Kernel ≡ HOF parity for the SQ8 encode path (MaxAbsF32 /
  * Sq8EncodeF32 vs the interpreted array_max(transform)/
  * transform(round) formulation they retire): same scale, same codes,
  * bit for bit, over adversarial values — negative exact halves (where
  * HALF_UP and Math.round disagree), denormals, huge magnitudes, NaN
  * and empty arrays. The PqCodebooksKernelSpec pattern. */
class Sq8KernelSpec extends AnyFunSuite with Matchers {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def hofFrame(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("mx",
      expr("array_max(transform(v, x -> abs(CAST(x AS DOUBLE))))"))
    .filter(col("mx") > 0)
    .withColumn("q", expr(
      "transform(v, x -> CAST(round(CAST(x AS DOUBLE) * 127 / mx) AS INT))"))

  private def kernelFrame(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("mx", VectorExpressions.maxAbsF32(col("v")))
    .filter(col("mx") > 0)
    .withColumn("q", VectorExpressions.sq8EncodeF32(col("v"), col("mx")))

  test("kernel scale and codes match the HOF bit for bit on random and " +
    "adversarial vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows: Seq[(Long, Seq[Float])] =
      (0L until 300L).map { i =>
        (i, Seq.fill(16)((rnd.nextFloat() - 0.5f) * 2000f))
      } ++ Seq(
        // exact .5 multiples after scaling: v*127/mx lands on ±x.5
        (1000L, Seq(2f, 1f, -1f, 3f, -3f, 254f)),
        (1001L, Seq(-0.5f, 0.5f, 0.25f, -0.25f, 127f)),
        // denormal/extreme magnitudes
        (1002L, Seq(Float.MinPositiveValue, 1e-30f, -1e30f, 3.4e38f)),
        // all-negative, single-element
        (1003L, Seq(-7.5f)),
        // zero vector: mx = 0, filtered by BOTH paths
        (1004L, Seq(0f, 0f, 0f)))
    val df = rows.toDF("id", "v")
    val h = hofFrame(df).select("id", "mx", "q").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Int](2)))
      .sortBy(_._1)
    val k = kernelFrame(df).select("id", "mx", "q").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Int](2)))
      .sortBy(_._1)
    k.length shouldBe h.length
    k.zip(h).foreach { case ((ki, km, kq), (hi, hm, hq)) =>
      ki shouldBe hi
      java.lang.Double.doubleToRawLongBits(km) shouldBe
        java.lang.Double.doubleToRawLongBits(hm)
      kq shouldBe hq
    }
  }

  test("HALF_UP is replayed exactly where Math.round would differ " +
    "(negative .5 rounds away from zero)") {
    import spark.implicits._
    // v = [-1, 2]: mx = 2, -1*127/2 = -63.5 -> HALF_UP -64 (Math.round
    // gives -63).
    val df = Seq((0L, Seq(-1f, 2f))).toDF("id", "v")
    val q = kernelFrame(df).select("q").head().getSeq[Int](0)
    q shouldBe Seq(-64, 127)
    hofFrame(df).select("q").head().getSeq[Int](0) shouldBe q
  }

  test("empty array yields null scale (array_max convention); NaN " +
    "component poisons the scale identically") {
    import spark.implicits._
    val df = Seq((0L, Seq.empty[Float]), (1L, Seq(1f, Float.NaN)))
      .toDF("id", "v")
    val k = df.withColumn("mx", VectorExpressions.maxAbsF32(col("v")))
      .select("id", "mx").collect().sortBy(_.getLong(0))
    k(0).isNullAt(1) shouldBe true
    k(1).getDouble(1).isNaN shouldBe true
    val h = df.withColumn("mx",
      expr("array_max(transform(v, x -> abs(CAST(x AS DOUBLE))))"))
      .select("id", "mx").collect().sortBy(_.getLong(0))
    h(0).isNullAt(1) shouldBe true
    h(1).getDouble(1).isNaN shouldBe true
  }

  test("null ARRAY ELEMENTS: MaxAbsF32 skips them exactly like " +
    "array_max (all-null = null scale); Sq8EncodeF32 encodes them as 0 " +
    "— the documented divergence from transform's null code (r11 " +
    "advice)") {
    import spark.implicits._
    val df = Seq(
        (0L, Seq[java.lang.Float](1.0f, null, -3.0f)),
        (1L, Seq[java.lang.Float](null, null)))
      .toDF("id", "v")
    // scale: kernel ≡ HOF even with null elements now
    val k = df.withColumn("mx", VectorExpressions.maxAbsF32(col("v")))
      .select("id", "mx").collect().sortBy(_.getLong(0))
    val h = df.withColumn("mx",
        expr("array_max(transform(v, x -> abs(CAST(x AS DOUBLE))))"))
      .select("id", "mx").collect().sortBy(_.getLong(0))
    k(0).getDouble(1) shouldBe 3.0
    h(0).getDouble(1) shouldBe 3.0
    k(1).isNullAt(1) shouldBe true
    h(1).isNullAt(1) shouldBe true
    // codes: the kernel's null element -> 0 (zero-contribution,
    // containsNull=false output by design); the HOF would emit null
    val q = df.filter(col("id") === 0L)
      .withColumn("mx", VectorExpressions.maxAbsF32(col("v")))
      .withColumn("q", VectorExpressions.sq8EncodeF32(col("v"), col("mx")))
      .select("q").head().getSeq[Int](0)
    q shouldBe Seq(42, 0, -127)
    val qh = df.filter(col("id") === 0L)
      .withColumn("mx",
        expr("array_max(transform(v, x -> abs(CAST(x AS DOUBLE))))"))
      .select(expr(
        "transform(v, x -> CAST(round(CAST(x AS DOUBLE) * 127 / mx) " +
          "AS INT))").as("q"))
      .head().getSeq[java.lang.Integer](0)
    qh shouldBe Seq[java.lang.Integer](42, null, -127)
  }

  test("sqTopK's session encode-cache keys on SOURCE identity: two " +
    "same-schema corpora back-to-back do not share an encode (the r12 " +
    "collision class — canonicalized plan strings elide file paths)") {
    import spark.implicits._
    val a = Seq((0L, Seq(1f, 0f)), (1L, Seq(0.99f, 0.14f)),
        (2L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    // same schema, same shape — only the DATA differs
    val b = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)),
        (2L, Seq(0.99f, 0.14f))).toDF("vec_id", "embedding")
    def nn(df: org.apache.spark.sql.DataFrame): Long =
      graft.api.Graft.sqTopK(df, "vec_id", "embedding",
          queryPred = col("vec_id") < 1, k = 1, shortlist = 1)
        .select("neighbor_id").head().getLong(0)
    nn(a) shouldBe 1L
    nn(b) shouldBe 2L // a collided cache would replay corpus A's codes
    nn(a) shouldBe 1L // and returning to A must not see B's
  }

  test("sqTopK's session encode-cache HITS on a repeat call over the " +
    "same corpus — exactly one encode build for two calls (r12: the " +
    "first ship silently missed every call)") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings")
    def call(pred: org.apache.spark.sql.Column): Long =
      graft.api.Graft.sqTopK(emb, "vec_id", "embedding",
        queryPred = pred, k = 3, shortlist = 8).count()
    val before = graft.ops.ListingCache.builds.get()
    call(col("vec_id") < 4) should be > 0L
    val afterFirst = graft.ops.ListingCache.builds.get()
    call(col("vec_id") < 8) should be > 0L // different pred, same corpus
    val afterSecond = graft.ops.ListingCache.builds.get()
    // first call may build (or reuse an earlier suite's entry for this
    // same fixture); the second call must NOT build again
    (afterFirst - before) should be <= 1L
    afterSecond shouldBe afterFirst
  }

  test("sqTopK end-to-end is unchanged by the kernel swap (fixture " +
    "slice, vs an inline HOF reimplementation)") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings")
    val now = graft.api.Graft.sqTopK(emb, "vec_id", "embedding",
      queryPred = col("vec_id") < 8, k = 5, shortlist = 50)
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // The pre-r11 formulation: encode inlined as interpreted HOFs.
    val hofEnc = hofFrame(
      graft.api.Graft.normalized(emb, "vec_id", "embedding")
        .withColumnRenamed("embedding", "v"))
      .withColumnRenamed("v", "embedding")
    val old = graft.api.Graft.sqTopKFromEncoded(hofEnc, "vec_id",
      "embedding", queryPred = col("vec_id") < 8, k = 5, shortlist = 50)
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    now shouldBe old
  }
}
