package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The native centroid-assignment kernel ([[CentroidTopNF32]]) against
  * the HOF broadcast-fold paths it replaces above the KernelNlist
  * threshold: argmax parity, top-N order parity, tie-break by list_id,
  * the NaN-placement split between the two HOF shapes, and codegen vs
  * interpreted agreement. The hint parameter is the ONLY switch — same
  * data through both paths must be identical row for row. */
class CentroidKernelSpec extends AnyFunSuite with Matchers {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Dim = 16
  private val ForceKernel = 100000 // any hint above KernelNlist

  private def vecDf(n: Int, seed: Int,
      withZero: Boolean = false): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      (i.toLong,
        if (withZero && i % 17 == 0) Array.fill(Dim)(0.0f)
        else Array.fill(Dim)(rnd.nextGaussian().toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  private def centDf(nlist: Int, seed: Int,
      dupEvery: Int = 0): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val base = (0 until nlist).map(i =>
      (i, Array.fill(Dim)(rnd.nextGaussian().toFloat)))
    // dupEvery > 0 plants identical centroids under different list_ids
    // so ties are real, not just theoretical
    val rows =
      if (dupEvery > 0) base.map { case (i, v) =>
        (i, if (i % dupEvery == 0 && i > 0) base(0)._2 else v) }
      else base
    rows.toDF("list_id", "centroid")
  }

  private def argmaxRows(vecs: DataFrame, cents: DataFrame,
      hint: Int): Seq[(Long, Int)] =
    graft.api.Graft.assignToCentroids(vecs, "vec_id", "embedding",
        cents, hint)
      .select(col("vec_id"), col("list_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted

  private def topNRows(vecs: DataFrame, cents: DataFrame, probes: Int,
      hint: Int): Map[Long, Seq[Int]] =
    graft.api.Graft.assignToCentroidsTopN(vecs, "vec_id", "embedding",
        cents, probes, hint)
      .select(col("vec_id"), col("list_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }

  test("kernel argmax equals the HOF fold on random data") {
    val vecs = vecDf(200, seed = 1)
    val cents = centDf(50, seed = 2)
    argmaxRows(vecs, cents, ForceKernel) shouldBe argmaxRows(vecs, cents, 0)
  }

  test("kernel top-N equals the HOF sorted slice, per-query order " +
    "included (explode preserves best-first)") {
    val vecs = vecDf(150, seed = 3)
    val cents = centDf(40, seed = 4)
    val k = topNRows(vecs, cents, probes = 3, hint = ForceKernel)
    val h = topNRows(vecs, cents, probes = 3, hint = 0)
    k.keySet shouldBe h.keySet
    k.foreach { case (id, lists) => lists shouldBe h(id) }
  }

  test("identical centroids tie-break by lower list_id on both paths") {
    val vecs = vecDf(80, seed = 5)
    val cents = centDf(30, seed = 6, dupEvery = 7)
    argmaxRows(vecs, cents, ForceKernel) shouldBe argmaxRows(vecs, cents, 0)
    val k = topNRows(vecs, cents, probes = 4, hint = ForceKernel)
    val h = topNRows(vecs, cents, probes = 4, hint = 0)
    k.foreach { case (id, lists) => lists shouldBe h(id) }
  }

  test("zero-norm vector (all-NaN cosines): deterministic kernel " +
    "ordering — argmax takes the lowest list_id, top-N keeps ascending " +
    "ids (the HOF paths cannot run this case at all: ANSI mode turns " +
    "the 0/0 into DIVIDE_BY_ZERO)") {
    val vecs = vecDf(18, seed = 7, withZero = true) // ids 0, 17 are zero
    val cents = centDf(25, seed = 8)
    // hint forces the kernel; NaN ties resolve by list_id on both shapes
    val am = argmaxRows(vecs, cents, ForceKernel).toMap
    am(0L) shouldBe 0
    am(17L) shouldBe 0
    val tn = topNRows(vecs, cents, probes = 3, hint = ForceKernel)
    tn(0L) shouldBe Seq(0, 1, 2)
    tn(17L) shouldBe Seq(0, 1, 2)
  }

  test("probes beyond nlist returns nlist assignments, like the HOF " +
    "slice") {
    val vecs = vecDf(20, seed = 9)
    val cents = centDf(3, seed = 10)
    val k = topNRows(vecs, cents, probes = 5, hint = ForceKernel)
    val h = topNRows(vecs, cents, probes = 5, hint = 0)
    k.foreach { case (id, lists) =>
      lists.length shouldBe 3
      lists shouldBe h(id)
    }
  }

  test("codegen and interpreted kernel paths agree") {
    val vecs = vecDf(40, seed = 11)
    val cents = centDf(20, seed = 12)
    val onWS = argmaxRows(vecs, cents, ForceKernel)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try argmaxRows(vecs, cents, ForceKernel) shouldBe onWS
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
