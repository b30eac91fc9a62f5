package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** [[Graft.ivfPqSave]]/[[Graft.ivfPqLoad]] — the build-once /
  * serve-for-weeks deployment shape: a saved-and-loaded index must
  * return row-identical results to the in-session build, the
  * `pruneLists` serving path must change nothing but the scan, and the
  * loaded layout must actually partition-prune (the codes are
  * hive-partitioned by bucket = pmod(list_id, buckets)). */
class IvfPqPersistenceSpec extends AnyFunSuite with Matchers {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Dim = 16

  private lazy val corpus: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    (0 until 800).map(i =>
      (i.toLong, Array.fill(Dim)((rnd.nextGaussian() + 0.1).toFloat)))
      .toDF("vec_id", "embedding")
  }

  private lazy val queries = corpus
    .filter(pmod(col("vec_id"), lit(100)) === 0)
    .select(col("vec_id").as("qid"), col("embedding"))

  private def rows(df: DataFrame): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    df.select(col("query_id"), col("neighbor_id"), col("rnk"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
  }

  test("saved+loaded index returns row-identical results, pruned and " +
      "plain, and the pruned scan partition-prunes") {
    val built = Graft.ivfPqBuild(corpus, "vec_id", "embedding",
      dim = Dim, nlist = 12, m = 4, ksub = 8, iters = 2)
    def search(idx: Graft.IvfPqIndex, prune: Boolean): DataFrame =
      Graft.ivfPqSearch(idx, queries, "qid", "embedding",
        corpus, "embedding", k = 4, nProbe = 3, shortlist = 12,
        pruneLists = prune)
    val expected = rows(search(built, prune = false))
    // the pruned path on an IN-SESSION index (buckets = 0: list_id
    // isin only, no partition filter) must also change nothing
    rows(search(built, prune = true)) shouldBe expected

    val dir = java.nio.file.Files
      .createTempDirectory("ivfpq-persist").toString
    Graft.ivfPqSave(built, dir, buckets = 8)
    val loaded = Graft.ivfPqLoad(spark, dir)
    loaded.buckets shouldBe 8
    loaded.nlist shouldBe built.nlist

    rows(search(loaded, prune = false)) shouldBe expected
    val pruned = search(loaded, prune = true)
    rows(pruned) shouldBe expected

    // the pruned plan's codes scan carries a partition filter on bucket
    val plan = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    withClue(s"no partition pruning on the codes scan:\n$plan") {
      plan should include("PartitionFilters")
      """PartitionFilters: \[[^\]]*bucket""".r
        .findFirstIn(plan).isDefined shouldBe true
    }
    // r12 advice (determinism): the pruned plan joins the PINNED probe
    // rows (a localCheckpoint scan), not a re-execution of the probe
    // subplan — ids collected from one run joined against another run
    // could silently drop candidates under nondeterministic inputs.
    withClue(s"pruned probe side is not checkpoint-pinned:\n$plan") {
      plan should include("Scan ExistingRDD")
    }
  }

  test("re-save over an existing dir with different buckets swaps " +
      "atomically: consistent meta+codes, no temp leftovers, " +
      "list_id sorted within each bucket file") {
    val built = Graft.ivfPqBuild(corpus, "vec_id", "embedding",
      dim = Dim, nlist = 12, m = 4, ksub = 8, iters = 2)
    val dir = java.nio.file.Files
      .createTempDirectory("ivfpq-resave").toString + "/idx"
    Graft.ivfPqSave(built, dir, buckets = 8)
    // the layout is generational since r14: resolve the live tree
    def tree(): String = Graft.resolveIndexTree(spark, dir)
    val rows8 = spark.read.parquet(s"${tree()}/codes.parquet").count()
    // re-save with a DIFFERENT modulus over the same dir — the r12
    // advice failure shape: in-place sub-path overwrites could leave
    // new meta over old codes (bucket = id % wrong-modulus at load)
    Graft.ivfPqSave(built, dir, buckets = 4)
    val loaded = Graft.ivfPqLoad(spark, dir)
    loaded.buckets shouldBe 4
    val codesDir = s"${tree()}/codes.parquet"
    spark.read.parquet(codesDir).count() shouldBe rows8
    // the LIVE generation's codes partition dirs obey the loaded
    // modulus — resolving through the pointer is what makes this
    // coherent (the grace generation still holds the bucket=8 layout
    // for in-flight readers, by design)
    val bucketDirs = new java.io.File(codesDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .map(_.getName.stripPrefix("bucket=").toInt)
    bucketDirs should not be empty
    all(bucketDirs) should be < 4
    // the swap leaves no temp pointer behind
    new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.contains(".tmp-")) shouldBe empty
    // r12 advice (sort order): intra-bucket list_id order is the
    // row-group-skip property ivfPqSave documents; sortWithinPartitions
    // must sort by (bucket, list_id) so the write's required bucket
    // sort is satisfied by prefix and no planner sort reorders rows.
    import spark.implicits._
    for (b <- bucketDirs) {
      val files = new java.io.File(s"$codesDir/bucket=$b")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      for (f <- files) {
        val ids = spark.read.parquet(f.getAbsolutePath)
          .select("list_id").as[Int].collect()
        withClue(s"bucket=$b file ${f.getName} not list_id-sorted") {
          ids.toSeq shouldBe ids.toSeq.sorted
        }
      }
    }
  }
}
