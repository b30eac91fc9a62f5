package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Kernel ≡ HOF parity for the per-query PQ ADC lookup-table build
  * (PqQueryLutF32 vs the nested transform/aggregate/zip_with
  * formulation it retires): every (subspace, code) cell bit-identical
  * over random query vectors against a hand-built sparse codebook that
  * includes a DEAD cell (Lloyd can empty one — both sides must land
  * 0.0 there). Complements PqCodebooksKernelSpec (training side) and
  * the s10/s11 oracle rows (end to end). */
class QueryLutKernelSpec extends AnyFunSuite with Matchers {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val M = 4
  private val Ksub = 4
  private val Dsub = 4

  test("kernel qlut matches the HOF cell-for-cell, dead cells 0.0") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // Sparse codebook: cell (mi=2, ki=3) is DEAD (absent).
    val entries: Seq[(Int, Int, Seq[Float])] =
      (for { mi <- 0 until M; ki <- 0 until Ksub
             if !(mi == 2 && ki == 3) }
        yield (mi, ki, Seq.fill(Dsub)(rnd.nextFloat() * 2 - 1f)))
    // HOF layout: mb MAP<m, MAP<code, STRUCT<centroid>>>
    val mb = entries.groupBy(_._1).map { case (mi, es) =>
      (mi, es.map(e => (e._2, e._3)).toMap)
    }
    // Kernel layout: sorted live cells + concatenated centroids.
    val sorted = entries.map(e => (e._1 * Ksub + e._2, e._3)).sortBy(_._1)
    val cellsArr = sorted.map(_._1)
    val centsArr = sorted.flatMap(_._2)

    val queries = (0L until 50L)
      .map(i => (i, Seq.fill(M * Dsub)(rnd.nextFloat() * 4 - 2f)))
    val df = queries.toDF("id", "qe")
      .withColumn("mb", typedLit(mb.map { case (mi, cm) =>
        (mi, cm.map { case (ki, c) => (ki, Tuple1(c)) })
      }))
      .withColumn("cells", typedLit(cellsArr))
      .withColumn("cents", typedLit(centsArr.map(_.toFloat)))

    val hof = df.withColumn("qlut", expr(
      s"""flatten(transform(sequence(0, ${M - 1}), mi ->
         |  transform(sequence(0, ${Ksub - 1}), ki ->
         |    coalesce(aggregate(zip_with(
         |      slice(qe, mi * $Dsub + 1, $Dsub),
         |      try_element_at(element_at(mb, mi), ki)._1,
         |      (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
         |      CAST(0 AS DOUBLE), (a, v) -> a + v),
         |      CAST(0 AS DOUBLE)))))""".stripMargin))
      .select("id", "qlut").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)

    val kern = df.withColumn("qlut", VectorExpressions.pqQueryLutF32(
        col("qe"), col("cells"), col("cents"), M, Ksub, Dsub))
      .select("id", "qlut").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)

    kern.length shouldBe hof.length
    kern.zip(hof).foreach { case ((ki, kl), (hi, hl)) =>
      ki shouldBe hi
      kl.length shouldBe M * Ksub
      kl.zip(hl).foreach { case (a, b) =>
        java.lang.Double.doubleToRawLongBits(a) shouldBe
          java.lang.Double.doubleToRawLongBits(b)
      }
      // the dead cell landed 0.0
      kl(2 * Ksub + 3) shouldBe 0.0
    }
  }
}
