package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** [[Graft.ivfSqSave]]/[[Graft.ivfSqLoad]] — the SQ-family twin of
  * IvfPqPersistenceSpec: a saved-and-loaded IVF-SQ8 index must return
  * row-identical results to the in-session build, the `pruneLists`
  * serving path must change nothing but the scan, and the loaded
  * layout must actually partition-prune. */
class IvfSqPersistenceSpec extends AnyFunSuite with Matchers {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Dim = 16

  private lazy val corpus: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
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

  test("saved+loaded IVF-SQ8 returns row-identical results, pruned " +
      "and plain, and the pruned scan partition-prunes") {
    val built = Graft.ivfSqBuild(corpus, "vec_id", "embedding",
      nlist = 12, iters = 2)
    built.rows shouldBe 800L
    def search(idx: Graft.IvfSqIndex, prune: Boolean): DataFrame =
      Graft.ivfSqSearch(idx, queries, "qid", "embedding",
        corpus, "embedding", k = 4, nProbe = 3, shortlist = 12,
        pruneLists = prune)
    val expected = rows(search(built, prune = false))
    rows(search(built, prune = true)) shouldBe expected

    val dir = java.nio.file.Files
      .createTempDirectory("ivfsq-persist").toString
    Graft.ivfSqSave(built, dir, buckets = 8)
    val loaded = Graft.ivfSqLoad(spark, dir)
    loaded.buckets shouldBe 8
    loaded.nlist shouldBe built.nlist
    loaded.rows shouldBe 800L

    rows(search(loaded, prune = false)) shouldBe expected
    val pruned = search(loaded, prune = true)
    rows(pruned) shouldBe expected

    val plan = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    withClue(s"no partition pruning on the codes scan:\n$plan") {
      plan should include("PartitionFilters")
      """PartitionFilters: \[[^\]]*bucket""".r
        .findFirstIn(plan).isDefined shouldBe true
    }
    // default shortlist derives from the loaded row count (the r14
    // sizing rule) — must return k rows per query either way
    Graft.ivfSqSearch(loaded, queries, "qid", "embedding",
      corpus, "embedding", k = 4, nProbe = loaded.nlist)
      .groupBy("query_id").count()
      .select(col("count")).collect().map(_.getLong(0))
      .foreach(_ shouldBe 4L)
  }
}
