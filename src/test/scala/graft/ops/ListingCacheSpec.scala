package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The reuse contract: a gate query's listing is shared within a
  * session, a cache hit is validated with a FULL action before being
  * trusted (localCheckpoint is non-reliable — lost blocks cannot be
  * recomputed from lineage), and a poisoned hit falls back to a fresh
  * materialization instead of surfacing an opaque block-fetch failure
  * from inside the consumer's plan (r8 advice, hardened in r9). */
class ListingCacheSpec extends AnyFunSuite with Matchers {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("reuse=true returns the session's materialized listing without " +
    "rebuilding; reuse=false always rebuilds") {
    var builds = 0
    def build = { builds += 1; spark.range(100).toDF("id") }
    ListingCache.shared("lcspec-a", spark, "dir", reuse = false)(build)
    builds shouldBe 1
    ListingCache.shared("lcspec-a", spark, "dir", reuse = true)(build)
      .count() shouldBe 100L
    builds shouldBe 1 // cache hit — no rebuild
    ListingCache.shared("lcspec-a", spark, "dir", reuse = false)(build)
    builds shouldBe 2 // fresh-build request always rebuilds
  }

  test("a cache hit with lost localCheckpoint blocks rebuilds instead " +
    "of failing the consumer") {
    var builds = 0
    def build = { builds += 1; spark.range(50).toDF("id") }
    val first =
      ListingCache.shared("lcspec-b", spark, "dir", reuse = false)(build)
    builds shouldBe 1
    // Simulate executor loss: drop the checkpoint's storage blocks at
    // the RDD level (Dataset.unpersist only clears CacheManager
    // entries — the blocks belong to the LogicalRDD's underlying RDD).
    // The plan was truncated by localCheckpoint, so the cached
    // DataFrame can no longer produce rows.
    first.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = true))
    intercept[Exception](first.count())
    // The reuse path must detect the poisoned entry (full-partition
    // validation) and fall back to a fresh materialization.
    val again =
      ListingCache.shared("lcspec-b", spark, "dir", reuse = true)(build)
    builds shouldBe 2
    again.count() shouldBe 50L
  }
}
