package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Fixture-drift guard (r7 post-mortem): the driver regenerated
  * `events.parquet` with a different physical timestamp type and every
  * query over `events` died at ANALYSIS — 20 gate queries lost their
  * round-7 row before any spec could catch it, because no test probed
  * the fixtures' schemas directly. This spec asserts, for EVERY scale
  * factor present on disk, that [[Tables.load]] accepts each fixture and
  * surfaces the column types the engine's operators assume. A future
  * fixture change now fails HERE, by name, instead of as 20 opaque gate
  * absences.
  *
  * Only types the operators actually rely on are pinned (timestamps,
  * vectors, join keys, text columns); incidental columns may drift
  * freely. Reading one row forces the parquet footer + a page decode, so
  * physical-type surprises (e.g. TIMESTAMP(NANOS) vs timestamp[us])
  * surface even when the declared schema looks right.
  */
class FixtureSchemaSpec extends AnyFunSuite with Matchers {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(sf => s"/root/testdata/$sf")
    .filter(d => new java.io.File(d).isDirectory)

  /** column -> required Spark type, per table; only load-bearing ones. */
  private val pinned: Map[String, Map[String, DataType]] = Map(
    "events" -> Map(
      // Tables.load normalizes whatever the fixture ships (long nanos,
      // timestamp[us] NTZ) to the TimestampType the operators assume.
      "ts" -> TimestampType,
      "event_id" -> LongType,
      "user_id" -> LongType,
      "event_type" -> StringType,
      "value" -> DoubleType),
    "embeddings" -> Map(
      "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true)),
    "documents" -> Map(
      "doc_id" -> LongType,
      "text" -> StringType,
      "lang" -> StringType,
      "source" -> StringType,
      "n_chars" -> LongType),
    "lineitem" -> Map(
      "l_orderkey" -> LongType,
      "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType,
      "l_returnflag" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "orders" -> Map(
      "o_orderkey" -> LongType,
      "o_custkey" -> LongType,
      "o_orderdate" -> TimestampNTZType),
    "customer" -> Map("c_custkey" -> LongType, "c_nationkey" -> IntegerType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_nationkey" -> IntegerType),
    "part" -> Map("p_partkey" -> LongType),
    "nation" -> Map("n_nationkey" -> IntegerType,
      "n_regionkey" -> IntegerType),
    "region" -> Map("r_regionkey" -> IntegerType))

  sfDirs.foreach { dir =>
    test(s"every fixture in $dir loads and keeps its pinned types") {
      assume(sfDirs.nonEmpty)
      Tables.all.foreach { name =>
        val df =
          withClue(s"$name: Tables.load must accept the fixture: ") {
            Tables.load(spark, dir, name)
          }
        val types = df.schema.map(f => f.name -> f.dataType).toMap
        pinned.getOrElse(name, Map.empty).foreach { case (c, t) =>
          withClue(s"$name.$c: ") {
            types.get(c) shouldBe Some(t)
          }
        }
        // Force a physical read: footer-level type surprises fail here,
        // at a named fixture, not at some downstream gate query.
        withClue(s"$name: one-row read must succeed: ") {
          df.limit(1).collect()
        }
      }
    }
  }
}
