package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** pqCodebooks' kernel-assigned Lloyd loop against a plain-Scala
  * reference implementing the EXACT committed semantics: deterministic
  * id%ksub init, per-subspace argmax of dot(sub, centroid)/cnrm with
  * (value, list_id) tie order, element-wise double-mean refit. The r10
  * change moved the assignment from the interpreted array_min-over-
  * structs HOF to the CentroidTopNF32 kernel; this spec pins that the
  * trained codebooks are IDENTICAL (same centroids to full double
  * precision), i.e. the gate's s10/s11 results cannot move. */
class PqCodebooksKernelSpec extends AnyFunSuite with Matchers {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Dim = 16; private val M = 4; private val Ksub = 4
  private val Dsub = Dim / M

  /** Plain-Scala Lloyd with the committed fold and tie rules. Returns
    * (mi, list_id) -> centroid (as doubles, the mean values before the
    * float cast — compared against the float centroids via toFloat). */
  private def reference(vecs: Seq[(Long, Array[Float])],
      iters: Int): Map[(Int, Int), Array[Float]] = {
    val sub = vecs.flatMap { case (id, v) =>
      (0 until M).map(mi => (id, mi, v.slice(mi * Dsub, (mi + 1) * Dsub)))
    }
    def means(assigned: Seq[(Int, Int, Array[Float])])
        : Map[(Int, Int), Array[Float]] =
      assigned.groupBy(a => (a._1, a._2)).map { case ((mi, lid), rows) =>
        (mi, lid) -> (0 until Dsub).map { p =>
          val vals = rows.map(_._3(p).toDouble)
          (vals.sum / vals.size).toFloat
        }.toArray
      }
    var cents = means(sub.map { case (id, mi, s) =>
      (mi, (id % Ksub).toInt, s) })
    (0 until iters).foreach { _ =>
      val assigned = sub.map { case (id, mi, s) =>
        val cs = cents.collect { case ((m2, lid), c) if m2 == mi =>
          val dot = s.zip(c).map { case (x, y) =>
            x.toDouble * y.toDouble }.sum
          val cnrm = math.sqrt(c.map(x => x.toDouble * x).sum)
          (dot / cnrm, lid)
        }
        // max value, ties by LOWER list id (the array_min over
        // (negd, list_id) structs)
        val best = cs.toSeq.sortBy { case (d, lid) => (-d, lid) }.head._2
        (mi, best, s)
      }
      cents = means(assigned)
    }
    cents
  }

  test("kernel-assigned Lloyd trains codebooks identical to the " +
    "reference semantics across iterations") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vecs = (0 until 300).map(i =>
      (i.toLong, Array.fill(Dim)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    for (iters <- Seq(0, 1, 2)) {
      val got = graft.api.Graft
        .pqCodebooks(df, "vec_id", "embedding", dim = Dim, m = M,
          ksub = Ksub, iters = iters)
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Float](2).toArray))
        .toMap
      val want = reference(vecs, iters)
      got.keySet shouldBe want.keySet
      got.foreach { case (k, c) =>
        c.toSeq shouldBe want(k).toSeq
      }
    }
  }

  test("a degenerate empty corpus yields an empty codebook, not a " +
    "crash") {
    import spark.implicits._
    val df = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    graft.api.Graft.pqCodebooks(df, "vec_id", "embedding", dim = Dim,
      m = M, ksub = Ksub, iters = 2).count() shouldBe 0L
  }
}
