package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The [[Graft.ivfPqBuild]]/[[Graft.ivfPqSearch]] split and its two
  * physical regimes: the broadcast-probes plan at fixture-sized query
  * batches, and the shuffle-join + two-phase-shortlist plan past
  * `broadcastQueries` (the many-query retrieval regime — r10 verdict
  * item 2). `broadcastQueries` is the ONLY switch — identical results,
  * row for row, either side of it. */
class IvfPqManyQuerySpec extends AnyFunSuite with Matchers {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    // fixture rows all sit under the auto-broadcast threshold; disable
    // it so the hint-free joins plan the shape a real corpus would get
    // (the explicit broadcast() hints of the small regime still apply)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .getOrCreate()

  private val Dim = 16

  private lazy val corpus: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    (0 until 600).map(i =>
      (i.toLong, Array.fill(Dim)((rnd.nextGaussian() + 0.05).toFloat)))
      .toDF("vec_id", "embedding")
  }

  private lazy val index = Graft.ivfPqBuild(corpus, "vec_id",
    "embedding", dim = Dim, nlist = 12, m = 4, ksub = 8, iters = 2)

  private lazy val queries = corpus.filter(pmod(col("vec_id"), lit(7)) === 0)
    .select(col("vec_id").as("qid"), col("embedding"))

  private def search(bq: Int): DataFrame =
    Graft.ivfPqSearch(index, queries, "qid", "embedding",
      corpus, "embedding", k = 4, nProbe = 4, shortlist = 12,
      broadcastQueries = bq)

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Double)] =
    df.select(col("query_id"), col("neighbor_id"), col("rnk"),
        round(col("cos"), 9).as("cos"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted

  test("small and large regimes return identical listings (probe set, " +
    "shortlist, rerank order, scores)") {
    val small = rows(search(bq = 10000))
    val large = rows(search(bq = 0))
    small should not be empty
    large shouldBe small
  }

  test("a corpus-id query never lists itself, both regimes") {
    for (bq <- Seq(10000, 0))
      search(bq).filter(col("query_id") === col("neighbor_id"))
        .count() shouldBe 0L
  }

  test("large regime broadcasts nothing query-sized: no " +
    "BroadcastHashJoin (probes and the rerank query side both shuffle) " +
    "and the phase-1 window reuses the candidate join's list_id " +
    "clustering — no (list_id, query_id) Exchange") {
    val p = search(bq = 0).queryExecution.explainString(FormattedMode)
    (p should not).include("BroadcastHashJoin")
    """hashpartitioning\(list_id#\d+, query_id""".r
      .findFirstIn(p) shouldBe None
  }

  test("small regime keeps the broadcast candidate join") {
    val p = search(bq = 10000).queryExecution
      .explainString(FormattedMode)
    p should include("BroadcastHashJoin")
  }
}
