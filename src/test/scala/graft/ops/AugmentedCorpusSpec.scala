package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins [[Multimodal.ahashAugmentedCorpus]] — the constructed corpus
  * both m11 (60-bit) and m13 (120-bit) gate on. The gate oracles
  * REBUILD the same construction in SQL, so a fixture drift that
  * changes the construction's semantics (the r8 timestamp lesson)
  * would move both engines in lockstep and stay green; this spec pins
  * the INTENDED properties instead, by name, at every fixture scale
  * (r14 verdict item 8):
  *
  *  - membership: exactly one copy per 7th document of ≥ 2 chars,
  *    under id + 1,000,000;
  *  - the perturbation is the first/last character swap and nothing
  *    else — equal length, byte-SUM-preserving on the UTF-8 payload
  *    (what bounds the aHash flip to 2 chunks);
  *  - recovery: every constructed (source, copy) pair is within
  *    hamming ≤ 2 by construction and ahashNearDupPairs(radius = 3)
  *    finds it (checked at the smallest fixture).
  */
class AugmentedCorpusSpec extends AnyFunSuite with Matchers {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDirs = Seq("/root/testdata/sf0.001",
    "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("membership and the byte-sum-preserving first/last swap hold " +
      "at every fixture scale") {
    sfDirs.foreach { d =>
      val docs = graft.Tables.load(spark, d, "documents")
        .filter(org.apache.spark.sql.functions.length(col("text")) >= 2)
        .select(col("doc_id"), col("text"))
      val srcTexts = docs.filter(col("doc_id") % 7 === 0)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val aug = Multimodal.ahashAugmentedCorpus(spark, d)
      val copies = aug.filter(col("doc_id") >= 1000000L)
        .collect()
        .map(r => (r.getLong(0) - 1000000L) -> r.getAs[Array[Byte]](1))
        .toMap
      withClue(s"$d membership:") {
        copies.keySet shouldBe srcTexts.keySet
        assert(aug.count() == docs.count() + srcTexts.size)
      }
      srcTexts.foreach { case (id, src) =>
        val expected =
          src.last.toString + src.substring(1, src.length - 1) + src.head
        val copy = new String(copies(id), "UTF-8")
        withClue(s"$d doc $id perturbation:") {
          copy shouldBe expected
          copy.length shouldBe src.length
          // byte-SUM preservation on the UTF-8 payload — the property
          // that bounds the aHash flip to the two touched chunks
          copies(id).map(_.toLong & 0xffL).sum shouldBe
            src.getBytes("UTF-8").map(_.toLong & 0xffL).sum
        }
      }
    }
  }

  test("every constructed pair is recovered by the banded join") {
    val d = sfDirs.head
    val aug = Multimodal.ahashAugmentedCorpus(spark, d)
    val expected = aug.filter(col("doc_id") >= 1000000L)
      .select((col("doc_id") - 1000000L).as("id_a"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = graft.api.Graft
      .ahashNearDupPairs(aug, "doc_id", "payload", radius = 3)
      .select(col("id_a"), col("id_b"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    expected.foreach { p =>
      withClue(s"constructed pair $p:") {
        found.keySet should contain(p)
        // hamming <= 2 BY CONSTRUCTION (only the chunks holding the
        // swapped characters' bytes can flip)
        found(p) should be <= 2L
      }
    }
  }
}
