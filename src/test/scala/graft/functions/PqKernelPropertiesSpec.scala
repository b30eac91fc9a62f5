package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** ScalaCheck properties for the PQ kernels' pure-JVM compute paths
  * (no Spark session — the expression plumbing and codegen parity are
  * covered in VectorExpressionsSpec; THIS spec drives the argmax
  * semantics over arbitrary codebooks, including zero-norm centroids
  * (NaN/±Inf scores), dead cells, whole dead subspaces, and exact
  * ties — the corners a fixed fixture cannot enumerate). */
class PqKernelPropertiesSpec extends AnyFunSuite with Matchers {

  private def check(prop: Prop, minTests: Int = 80): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(res.passed, res.status.toString)
  }

  private case class Case(m: Int, ksub: Int, dsub: Int,
      vec: Array[Float], entries: List[(Int, Int, Array[Float])])

  private val genCase: Gen[Case] = for {
    m <- Gen.choose(1, 3)
    ksub <- Gen.choose(2, 5)
    dsub <- Gen.choose(1, 4)
    vec <- Gen.listOfN(m * dsub,
      Gen.frequency(
        8 -> Gen.choose(-2.0, 2.0).map(_.toFloat),
        1 -> Gen.const(0.0f))).map(_.toArray)
    // arbitrary sparse live-cell set: cells (and whole subspaces) may
    // be dead; centroids may be all-zero (cnrm 0 -> NaN/Inf negd)
    entries <- Gen.listOf(for {
      mi <- Gen.choose(0, m - 1)
      k <- Gen.choose(0, ksub - 1)
      c <- Gen.frequency(
        6 -> Gen.listOfN(dsub, Gen.choose(-1.0, 1.0).map(_.toFloat)),
        1 -> Gen.const(List.fill(dsub)(0.0f)))
    } yield (mi, k, c.toArray))
      .map(_.distinctBy(e => (e._1, e._2)))
  } yield Case(m, ksub, dsub, vec, entries)

  /** Independent reference: per subspace, sort candidates by Spark's
    * struct order — Double.compare on negd (NaN greatest, equal to
    * itself), then the smaller code — and take the head. A subspace
    * with no live cells has no argmax: the whole row encodes to null
    * (r9 — the old Int.MaxValue sentinel poisoned pq_adc_lut's index
    * arithmetic downstream; see the kernel's in-code note). */
  private def reference(c: Case): Option[Seq[Int]] = {
    val codes = (0 until c.m).map { mi =>
      val cands = c.entries.filter(_._1 == mi).map { case (_, k, cent) =>
        var dot = 0.0
        var t = 0
        while (t < c.dsub) {
          dot += c.vec(mi * c.dsub + t).toDouble * cent(t).toDouble
          t += 1
        }
        val cnrm = math.sqrt(
          cent.map(x => x.toDouble * x.toDouble).sum)
        (-dot / cnrm, k)
      }
      if (cands.isEmpty) None
      else Some(cands.sortWith { case ((na, ka), (nb, kb)) =>
        val cmp = java.lang.Double.compare(na, nb)
        cmp < 0 || (cmp == 0 && ka < kb)
      }.head._2)
    }
    if (codes.exists(_.isEmpty)) None else Some(codes.map(_.get))
  }

  test("pq_encode_f32 picks the struct-order argmax on arbitrary " +
    "codebooks (dead cells, dead subspaces, zero norms, ties)") {
    check(Prop.forAll(genCase) { c =>
      val sorted = c.entries.sortBy { case (mi, k, _) => mi * c.ksub + k }
      val cells = sorted.map { case (mi, k, _) => mi * c.ksub + k }.toArray
      val cents = sorted.flatMap(_._3).toArray
      val cnrms = sorted.map { case (_, _, cent) =>
        math.sqrt(cent.map(x => x.toDouble * x.toDouble).sum) }.toArray
      val got = Option(PqEncodeF32.encode(
        UnsafeArrayData.fromPrimitiveArray(c.vec),
        UnsafeArrayData.fromPrimitiveArray(cells),
        UnsafeArrayData.fromPrimitiveArray(cents),
        UnsafeArrayData.fromPrimitiveArray(cnrms),
        c.m, c.ksub, c.dsub))
        .map(_.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toIntArray().toSeq)
      val want = reference(c)
      if (got != want)
        println(s"MISMATCH: got=$got want=$want case=$c")
      got == want
    })
  }

  test("pq_encode_f32 returns null for vectors shorter than m*dsub") {
    PqEncodeF32.encode(
      UnsafeArrayData.fromPrimitiveArray(Array(1.0f)),
      UnsafeArrayData.fromPrimitiveArray(Array(0)),
      UnsafeArrayData.fromPrimitiveArray(Array(1.0f, 0.0f)),
      UnsafeArrayData.fromPrimitiveArray(Array(1.0)),
      1, 2, 2) shouldBe null
  }
}
