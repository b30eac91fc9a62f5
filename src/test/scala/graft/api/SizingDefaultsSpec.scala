package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The measured sizing rules wired as DEFAULTS (r13 verdict item 2):
  * the 5M-decade failure configurations — ivfPqSearch at a static
  * shortlist (recall 0.713, flat in nProbe) and annKnnJoin at a fixed
  * probe width (0.706) — must not exist at default arguments anymore.
  * The derivations themselves are pinned at the measured scale points
  * (SCALE.md r12/r13: 1M nlist=2500 occupancy 400; 5M nlist=8944
  * occupancy 559, cluster span ~9), and the index metadata that feeds
  * them (IvfPqIndex.rows) is pinned through build and save/load. */
class SizingDefaultsSpec extends AnyFunSuite with Matchers {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Dim = 16

  private lazy val corpus: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until 600).map(i =>
      (i.toLong, Array.fill(Dim)((rnd.nextGaussian() + 0.1).toFloat)))
      .toDF("vec_id", "embedding")
  }

  // ------------------------------------------------- derivation math

  test("deriveShortlist covers the probed list's occupancy at the " +
      "measured decades") {
    // 5M / nlist 8944: occupancy 559 — the static 256 read 0.713,
    // occupancy-sized read 0.984 (SCALE.md r13)
    val s5m = Graft.deriveShortlist(5000000L, 8944)
    s5m should be >= 559
    // 1M / nlist 2500: occupancy 400
    Graft.deriveShortlist(1000000L, 2500) should be >= 400
    // never below k
    Graft.deriveShortlist(100L, 100, k = 50) shouldBe 50
  }

  test("deriveProbes: committed fixture behavior at small nlist, " +
      "cluster-span coverage at the 5M decade") {
    // fixture regime (nlist <= 50 at every committed sf): the floor
    // keeps the committed probes = 4 exactly — s12's gate behavior
    // and its bench entry are unchanged
    Graft.deriveProbes(5) shouldBe 4
    Graft.deriveProbes(15) shouldBe 4
    Graft.deriveProbes(50) shouldBe 4
    // 1M: nlist 2500, measured span ~2.5 — probes 4 restored recall
    // to 1.000 (the r12 probes 2 -> 4 measurement)
    Graft.deriveProbes(2500) shouldBe 4
    // 5M: nlist 8944, measured span ~9 — the fixed width 4 read 0.706;
    // the derived width must cover the span
    Graft.deriveProbes(8944) should be >= 9
    // capped at nlist
    Graft.deriveProbes(3) should be <= 3
  }

  // --------------------------------------- the metadata that feeds it

  test("ivfPqBuild records the corpus count; save/load round-trips it") {
    val built = Graft.ivfPqBuild(corpus, "vec_id", "embedding",
      dim = Dim, nlist = 8, m = 4, ksub = 8, iters = 1)
    built.rows shouldBe 600L

    val dir = java.nio.file.Files
      .createTempDirectory("ivfpq-sizing").toString
    Graft.ivfPqSave(built, dir, buckets = 4)
    Graft.ivfPqLoad(spark, dir).rows shouldBe 600L
  }

  test("ivfPqSearch default shortlist derives from the index (and " +
      "falls back to a codes count when rows is unknown)") {
    val built = Graft.ivfPqBuild(corpus, "vec_id", "embedding",
      dim = Dim, nlist = 8, m = 4, ksub = 8, iters = 1)
    val queries = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding"))
    def run(idx: Graft.IvfPqIndex): Seq[(Long, Long)] = {
      import spark.implicits._
      Graft.ivfPqSearch(idx, queries, "qid", "embedding",
        corpus, "embedding", k = 4, nProbe = 8)
        .select(col("query_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().toSeq.sorted
    }
    // default shortlist = deriveShortlist(600, 8) = 75 > occupancy 75:
    // probing ALL lists with an occupancy-covering shortlist makes the
    // default search EXACT up to PQ rerank — k rows per query
    val got = run(built)
    got.size shouldBe 3 * 4
    // rows = -1 (hand-assembled index): same results via the enc count
    run(built.copy(rows = -1L)) shouldBe got
  }

  test("annKnnJoin default derives its probe width (fixture floor = " +
      "the committed 4-probe behavior)") {
    import spark.implicits._
    val knn = Graft.annKnnJoin(corpus, "vec_id", "embedding", k = 3)
    val counts = knn.groupBy("query_id").count()
      .select(col("count")).as[Long].collect()
    counts.length shouldBe 600
    all(counts) shouldBe 3L
  }
}
