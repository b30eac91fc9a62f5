package graft.pubsub

import java.nio.file.Files

import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Fault injection: a sink task dies MID-PUBLISH (after some chunks are
  * already on the broker) and is retried. The chunk dedup keys
  * (query, epoch, partition, chunk#) must make the retry's republish a
  * no-op for the already-delivered chunks — effectively-once, the
  * property the reference only approximates with its batch-level
  * latestBatchId guard.
  *
  * Needs task retries, so this suite owns a local[4,2] SparkContext
  * (the shared test session runs local[4] = maxFailures 1).
  */
object SinkRetrySpec {
  /** Set by the flaky task when the injected failure fires (local mode:
    * executors share the JVM, so this is visible to the test). */
  @volatile var failureInjected = false
}

class SinkRetrySpec extends AnyFunSuite with Matchers {

  test("sink publish is effectively-once when a task dies mid-write " +
    "and retries") {
    SparkSession.getActiveSession.foreach(_.sparkContext.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4, 2]") // 2 task attempts
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      PubsubStreamRegistry.clear()
      val ep = s"retry-${System.nanoTime()}"
      val b = EmbeddedBroker.get(ep)
      b.createTopic("projects/p/topics/in")
      b.createTopic("projects/p/topics/out")
      b.createSubscription("projects/p/subscriptions/in-sub",
        "projects/p/topics/in")
      b.createSubscription("projects/p/subscriptions/out-sub",
        "projects/p/topics/out")
      val N = 1000
      (0 until N).grouped(200).foreach(g => b.publishBatch(
        "projects/p/topics/in",
        g.map(i => (s"m$i".getBytes, Map("i" -> i.toString), ""))))

      import spark.implicits._
      val flaky = spark.readStream.format("pubsub")
        .option("project_id", "p")
        .option("subscription", "in-sub")
        .option("endpoint", ep)
        .option("num_partitions", "4")
        .option("dynamic_partitioning", "false")
        .load()
        .selectExpr("data", "attributes")
        .as[(Array[Byte], Map[String, String])]
        .mapPartitions { it =>
          val tc = TaskContext.get()
          if (tc.partitionId() == 0 && tc.attemptNumber() == 0) {
            // pass ~half the rows downstream (the sink flushes chunks of
            // 20 as it goes), then die — chunks 0..k are already on the
            // broker when the retry republishes them
            val rows = it.toVector
            var n = 0
            rows.iterator.map { r =>
              n += 1
              if (n > rows.size / 2) {
                SinkRetrySpec.failureInjected = true
                throw new RuntimeException("injected mid-write failure")
              }
              r
            }
          } else it
        }
        .toDF("data", "attributes")

      val q = flaky.writeStream.format("pubsub")
        .option("project_id", "p")
        .option("topic", "out")
        .option("endpoint", ep)
        .option("checkpointLocation",
          Files.createTempDirectory("retry-chk").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000) shouldBe true
      withClue("the injected failure never fired — test was vacuous: ")(
        SinkRetrySpec.failureInjected shouldBe true)

      // every message delivered exactly once despite the partial publish
      // + full republish of partition 0
      val out = Iterator.continually(
        b.pull("projects/p/subscriptions/out-sub", N + 100))
        .takeWhile(_.nonEmpty).flatten.toVector
      out.map(p => new String(p._2.data)).sorted shouldBe
        (0 until N).map(i => s"m$i").sorted
    } finally {
      spark.sparkContext.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("a restarted batch (same query/epoch/partition, fresh writer) " +
    "republishes without duplicates — exactly-once across batch replay, " +
    "not just task retry") {
    val ep = s"replay-${System.nanoTime()}"
    val b = EmbeddedBroker.get(ep)
    b.createTopic("projects/p/topics/rp")
    b.createSubscription("projects/p/subscriptions/rp-sub",
      "projects/p/topics/rp")
    val f = PubsubWriterFactory(
      endpoint = ep, topicPath = "projects/p/topics/rp",
      queryId = "q", dataIdx = 0, attrIdx = -1, keyIdx = -1)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    def writeAllRows(w: PubsubDataWriter, n: Int): Unit = {
      (0 until n).foreach { i =>
        row.update(0, Array[Byte](i.toByte)); w.write(row)
      }
      w.commit(); ()
    }
    // first attempt of the epoch publishes 45 rows (3 chunks incl. a
    // partial tail)
    writeAllRows(new PubsubDataWriter(f, partitionId = 0, epochId = 7L), 45)
    b.backlog("projects/p/subscriptions/rp-sub") shouldBe 45L
    // driver dies before the epoch commits; the restarted query replays
    // the SAME epoch with a fresh writer over the replay-deterministic
    // row sequence — every ordinal is already claimed, nothing lands
    writeAllRows(new PubsubDataWriter(f, partitionId = 0, epochId = 7L), 45)
    b.backlog("projects/p/subscriptions/rp-sub") shouldBe 45L
    // the NEXT epoch is a different ordinal stream and publishes fully
    writeAllRows(new PubsubDataWriter(f, partitionId = 0, epochId = 8L), 5)
    b.backlog("projects/p/subscriptions/rp-sub") shouldBe 50L
  }

  test("a buffered chunk older than the 10ms batching delay flushes on " +
    "the next row, not at the 20-row count") {
    val ep = s"delay-${System.nanoTime()}"
    val b = EmbeddedBroker.get(ep)
    b.createTopic("projects/p/topics/dl")
    b.createSubscription("projects/p/subscriptions/dl-sub",
      "projects/p/topics/dl")
    val f = PubsubWriterFactory(
      endpoint = ep, topicPath = "projects/p/topics/dl",
      queryId = "q", dataIdx = 0, attrIdx = -1, keyIdx = -1)
    val w = new PubsubDataWriter(f, partitionId = 0, epochId = 0L)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    row.update(0, Array[Byte](1))
    w.write(row)
    Thread.sleep(50) // well past the 10 ms publishDelayThreshold mirror
    row.update(0, Array[Byte](2))
    w.write(row) // delay exceeded -> this write flushes the chunk
    b.backlog("projects/p/subscriptions/dl-sub") shouldBe 2L
    w.commit()
    b.backlog("projects/p/subscriptions/dl-sub") shouldBe 2L
  }

  test("max_outstanding_bytes flushes a chunk by size before the 20-row " +
    "count is reached") {
    val ep = s"flow-${System.nanoTime()}"
    val b = EmbeddedBroker.get(ep)
    b.createTopic("projects/p/topics/fc")
    b.createSubscription("projects/p/subscriptions/fc-sub",
      "projects/p/topics/fc")
    val f = PubsubWriterFactory(
      endpoint = ep, topicPath = "projects/p/topics/fc",
      queryId = "q", dataIdx = 0, attrIdx = -1, keyIdx = -1,
      maxOutstandingBytes = 256L)
    val w = new PubsubDataWriter(f, partitionId = 0, epochId = 0L)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    // 5 rows x 100 bytes: crosses the 256-byte cap on the 3rd row, well
    // before the 20-row chunk count — the first chunk must already be on
    // the broker before commit().
    (0 until 5).foreach { _ =>
      row.update(0, Array.fill[Byte](100)(7))
      w.write(row)
    }
    val early = b.backlog("projects/p/subscriptions/fc-sub")
    withClue("no chunk published before commit despite crossing the " +
      "byte cap: ")(early should be >= 3L)
    w.commit()
    b.backlog("projects/p/subscriptions/fc-sub") shouldBe 5L
  }
}
