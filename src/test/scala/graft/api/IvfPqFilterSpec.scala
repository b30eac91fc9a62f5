package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Payload columns in the IVF-PQ codes frame ([[Graft.ivfPqBuild]]'s
  * `payload`) and the serve-time metadata `filter` of
  * [[Graft.ivfPqSearch]] — the vector-store payload-filter design:
  * the predicate PRE-applies to the codes side, so the result is the
  * exact top-k among MATCHING rows of the probed lists (never a
  * post-filtered unfiltered top-k), and on a persisted index it pushes
  * into the codes parquet scan, composing with `pruneLists`.
  */
class IvfPqFilterSpec extends AnyFunSuite with Matchers {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Dim = 8
  private val N = 200
  private val K = 5

  /** 4 axis clusters in 8 dims; distinct magnitudes make every cosine
    * distinct (no tie lottery in the exact ground truth). */
  private def vec(id: Long): Array[Float] = {
    val v = new Array[Float](Dim)
    v((id % 4).toInt) = 10f + 0.01f * id
    v((id % 4).toInt + 4) = 1f + 0.003f * ((id * 7) % 23)
    v
  }

  private def corpus(): DataFrame = {
    import spark.implicits._
    (0L until N).map(i => (i, vec(i), (i % 3).toInt))
      .toDF("vec_id", "embedding", "tag")
  }

  /** Exact filtered top-K by cosine, computed independently in plain
    * Scala over the same float vectors. */
  private def exactFiltered(qid: Long): Seq[Long] = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      (0 until Dim).foreach { i =>
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / math.sqrt(na * nb)
    }
    val q = vec(qid)
    (0L until N)
      .filter(i => i != qid && i % 3 == 0)
      .sortBy(i => (-cos(q, vec(i)), i))
      .take(K)
  }

  private def queriesDf(): DataFrame = {
    import spark.implicits._
    Seq(1L, 2L, 7L).map(i => (i, vec(i))).toDF("query_id", "embedding")
  }

  private def searched(index: Graft.IvfPqIndex,
      filter: Option[org.apache.spark.sql.Column],
      pruneLists: Boolean = false): Map[Long, Seq[Long]] =
    Graft.ivfPqSearch(index, queriesDf(), "query_id", "embedding",
        corpus(), "embedding", k = K,
        // all lists probed + corpus-wide shortlist: the ADC stage is
        // then complete and the exact rerank makes the result the
        // EXACT filtered top-k, independent of code quality
        nProbe = index.nlist, shortlist = N, pruneLists = pruneLists,
        filter = filter)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getAs[Long]("rnk"))
          .map(_.getAs[Long]("neighbor_id")).toSeq
      }

  test("the serve-time filter returns the exact top-k among MATCHING " +
      "rows — k of them, all matching, equal to the independent oracle") {
    val index = Graft.ivfPqBuild(corpus(), "vec_id", "embedding",
      dim = Dim, nlist = 4, m = 4, ksub = 16, payload = Seq("tag"))
    val got = searched(index, Some(col("tag") === 0))
    got.keySet shouldBe Set(1L, 2L, 7L)
    for ((q, ns) <- got) {
      ns should have size K
      every(ns.map(_ % 3)) shouldBe 0L
      ns shouldBe exactFiltered(q)
    }
    // and the filtered result is NOT a post-filtered unfiltered top-k:
    // the unfiltered top-K of these clustered queries contains
    // non-matching rows, so post-filtering would return < K
    val unfiltered = searched(index, None)
    unfiltered(1L).count(_ % 3 == 0) should be < K
  }

  test("payload names colliding with index internals fail by name at " +
      "build time — 'bucket' would be silently overwritten by the " +
      "save-time partition column") {
    val e = intercept[IllegalArgumentException] {
      Graft.ivfPqBuild(corpus().withColumnRenamed("tag", "bucket"),
        "vec_id", "embedding", dim = Dim, nlist = 4, m = 4, ksub = 16,
        payload = Seq("bucket"))
    }
    e.getMessage should include("bucket")
    e.getMessage should include("reserved")
  }

  test("payload columns persist through save/load; the filter pushes " +
      "into the codes scan and composes with pruneLists") {
    val index = Graft.ivfPqBuild(corpus(), "vec_id", "embedding",
      dim = Dim, nlist = 4, m = 4, ksub = 16, payload = Seq("tag"))
    val dir = java.nio.file.Files
      .createTempDirectory("ivfpq-filter").toString + "/idx"
    Graft.ivfPqSave(index, dir, buckets = 4)
    val loaded = Graft.ivfPqLoad(spark, dir)
    loaded.enc.columns should contain("tag")

    val got = searched(loaded, Some(col("tag") === 0),
      pruneLists = true)
    for ((q, ns) <- got) ns shouldBe exactFiltered(q)

    // the predicate reaches the persisted codes scan as a pushed filter
    val plan = Graft.ivfPqSearch(loaded, queriesDf(), "query_id",
        "embedding", corpus(), "embedding", k = K, nProbe = 4,
        shortlist = N, filter = Some(col("tag") === 0))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    plan should include("EqualTo(tag,0)")
  }
}
