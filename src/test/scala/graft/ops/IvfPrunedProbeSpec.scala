package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** [[Vector.ivfProbeSearch]]'s `pruneLists` serving path (r12): pushing
  * the batch's probed list ids as an isin() filter onto a bucketed
  * index table must (a) change NOTHING about the results — the
  * broadcast equi-join already restricted candidates to probed lists,
  * the filter only restricts what the SCAN reads — and (b) actually
  * engage bucket pruning, so a small serving batch reads the probed
  * buckets' files instead of the whole corpus. */
class IvfPrunedProbeSpec extends AnyFunSuite with Matchers {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Dim = 8
  private val Lists = 20

  test("pruneLists returns identical rows and bucket-prunes the scan") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(Lists, Dim)(rnd.nextDouble() * 2 - 1)
    val rows = (0 until 1000).map { i =>
      val c = centers(i % Lists)
      val v = Array.tabulate(Dim)(d =>
        (c(d) + (rnd.nextDouble() * 2 - 1) * 0.05).toFloat)
      val nrm = math.sqrt(v.map(x => x.toDouble * x).sum)
      (i.toLong, v, nrm, i % Lists)
    }
    val idxDir = java.nio.file.Files
      .createTempDirectory("pruned-probe-idx").toString
    val tbl = s"pruned_idx_${System.nanoTime()}"
    rows.toDF("vec_id", "embedding", "nrm", "list_id")
      .write.bucketBy(16, "list_id").sortBy("list_id")
      .option("path", s"$idxDir/t").saveAsTable(tbl)
    val listed = spark.table(tbl)
    val centroids = centers.zipWithIndex
      .map { case (c, i) => (i, c.map(_.toFloat)) }
      .toSeq.toDF("list_id", "centroid")
    val q = rows.take(3).map(r => (r._1, r._2, r._3))
      .toSeq.toDF("query_id", "qe", "qn")

    val plain = Vector.ivfProbeSearch(q, listed, centroids,
      nProbe = 2, k = 4).collect()
    val prunedDf = Vector.ivfProbeSearch(q, listed, centroids,
      nProbe = 2, k = 4, pruneLists = true)
    val pruned = prunedDf.collect()
    pruned.toSeq shouldBe plain.toSeq

    // the pruned plan's index scan selects a strict subset of buckets
    // (3 queries × 2 probes ≤ 6 of 20 lists → ≤ 6 of 16 buckets)
    val plan = prunedDf.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val sel = """SelectedBucketsCount: (\d+) out of 16""".r
      .findFirstMatchIn(plan)
    withClue(s"no bucket pruning in plan:\n$plan") {
      sel.isDefined shouldBe true
      sel.get.group(1).toInt should be < 16
    }
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
