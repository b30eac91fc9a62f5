package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Kernel ≡ HOF parity for the residual subtraction (VecSubF32 vs the
  * interpreted `zip_with(a, b, (x, y) -> x - y)` it replaces on the
  * full-corpus residual-encode pass), plus the L2 objective mode of
  * the PQ kernels (CentroidTopNF32 / PqEncodeF32): the l2 score
  * dot − ‖c‖²/2 must pick exactly the argmin-L2 cell a brute-force
  * distance computation picks. */
class VecSubKernelSpec extends AnyFunSuite with Matchers {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("VecSubF32 matches zip_with element for element on random, " +
    "negative, denormal, NaN and infinite components") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows: Seq[(Long, Seq[Float], Seq[Float])] =
      (0L until 200L).map { i =>
        (i, Seq.fill(16)((rnd.nextFloat() - 0.5f) * 200f),
          Seq.fill(16)((rnd.nextFloat() - 0.5f) * 200f))
      } ++ Seq(
        (1000L, Seq(Float.NaN, 1f, Float.PositiveInfinity),
          Seq(1f, Float.NaN, Float.PositiveInfinity)),
        (1001L, Seq(Float.MinPositiveValue, -3.4e38f),
          Seq(-Float.MinPositiveValue, 3.4e38f)),
        (1002L, Seq.empty[Float], Seq.empty[Float]))
    val df = rows.toDF("id", "a", "b")
    val k = df.select(col("id"),
        VectorExpressions.vecSubF32(col("a"), col("b")).as("d"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    val h = df.select(col("id"),
        expr("zip_with(a, b, (x, y) -> x - y)").as("d"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    k.length shouldBe h.length
    k.zip(h).foreach { case ((ki, kd), (hi, hd)) =>
      ki shouldBe hi
      kd.length shouldBe hd.length
      kd.zip(hd).foreach { case (kx, hx) =>
        java.lang.Float.floatToRawIntBits(kx) shouldBe
          java.lang.Float.floatToRawIntBits(hx)
      }
    }
  }

  test("l2 mode of CentroidTopNF32 picks the brute-force argmin-L2 " +
    "cell (ties by lower id), where cosine mode picks a different, " +
    "directionally-closest one on magnitude-varied centroids") {
    import spark.implicits._
    // centroids: same direction at two magnitudes + an orthogonal one.
    // v = (1, 0): L2-nearest is c0 = (0.9, 0); cosine ties c0/c1 by
    // direction and tie-breaks to the LOWER id among equal cosines.
    val cents = Array(0.9f, 0f, 10f, 0f, 0f, 1f)
    val cnrms = Array(0.9, 10.0, 1.0)
    val ids = Array(0, 1, 2)
    val df = Seq((0L, Seq(1f, 0f))).toDF("id", "v")
    def pick(l2: Boolean): Int = df.select(
        VectorExpressions.centroidTopN(col("v"), lit(1.0), cents, cnrms,
          ids, dim = 2, probes = 1, nanWins = false, l2 = l2)
          .getItem(0).as("c"))
      .head().getInt(0)
    // brute force: ||v-c0||²=0.01, ||v-c1||²=81, ||v-c2||²=2 -> c0
    pick(l2 = true) shouldBe 0
    // cosine: c0 and c1 both cos=1 -> lower id = 0 here too, so use a
    // magnitude-inverted pair to force divergence
    val cents2 = Array(10f, 0f, 0.9f, 0f, 0f, 1f)
    val cnrms2 = Array(10.0, 0.9, 1.0)
    def pick2(l2: Boolean): Int = df.select(
        VectorExpressions.centroidTopN(col("v"), lit(1.0), cents2, cnrms2,
          ids, dim = 2, probes = 1, nanWins = false, l2 = l2)
          .getItem(0).as("c"))
      .head().getInt(0)
    pick2(l2 = true) shouldBe 1  // ||v-c1||²=0.01 beats ||v-c0||²=81
    pick2(l2 = false) shouldBe 0 // cosine ties on direction, id 0 wins
  }

  test("l2 mode of PqEncodeF32 picks the argmin-L2 code per subspace " +
    "(brute-force cross-check over a random codebook)") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val m = 4; val ksub = 8; val dsub = 4
    val cents = Array.fill(m * ksub * dsub)((rnd.nextFloat() - 0.5f) * 4f)
    val cells = (0 until m * ksub).toArray
    val cnrms = (0 until m * ksub).map { j =>
      math.sqrt((0 until dsub).map(t =>
        cents(j * dsub + t).toDouble * cents(j * dsub + t)).sum)
    }.toArray
    val vecs = (0L until 50L).map(i =>
      (i, Seq.fill(m * dsub)((rnd.nextFloat() - 0.5f) * 4f)))
    val df = vecs.toDF("id", "v")
      .withColumn("cells", lit(cells))
      .withColumn("cents", lit(cents))
      .withColumn("cnrms", lit(cnrms))
    val got = df.select(col("id"),
        VectorExpressions.pqEncodeF32(col("v"), col("cells"),
          col("cents"), col("cnrms"), m, ksub, dsub, l2 = true).as("c"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    for ((i, v) <- vecs) {
      val expected = (0 until m).map { mi =>
        (0 until ksub).minBy { code =>
          val j = mi * ksub + code
          (0 until dsub).map { t =>
            val d = v(mi * dsub + t).toDouble - cents(j * dsub + t)
            d * d
          }.sum
        }
      }
      got(i) shouldBe expected
    }
  }
}
