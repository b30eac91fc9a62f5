package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Bucketing is the no-shuffle story for repeated big-table joins: both
  * sides pre-hashed into the same number of buckets on the join key join
  * bucket-to-bucket, with no Exchange in the plan. At 100 TB this turns
  * the nightly fact-to-fact join from a full-cluster shuffle into
  * partition-local merges; this spec proves the plan shape and the
  * result on the fixture.
  */
class BucketingSpec extends AnyFunSuite with Matchers {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("co-located bucketed join: no shuffle in the plan, same result " +
    "as the shuffled join") {
    val dir = Files.createTempDirectory("graft-bucket").toString
    Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_extendedprice").write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$dir/li").saveAsTable("li_bucketed")
    Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus").write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$dir/ord").saveAsTable("ord_bucketed")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "o_orderstatus", "l_extendedprice")
      val plan = joined.queryExecution.explainString(FormattedMode)
      plan should include("SortMergeJoin")
      (plan should not).include("Exchange")
      // result parity with the plain (shuffled) join on the raw parquet
      val expected = Tables.load(spark, sfDir, "lineitem")
        .join(Tables.load(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .count()
      joined.count() shouldBe expected
      expected should be > 0L
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
