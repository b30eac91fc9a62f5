package graft.pubsub

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQueryException, TimeMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Per-key running total on the Spark 4 arbitrary-state API, emitting the
  * RUNNING value (not the increment) per batch: an increment stream sums
  * to the right answer even if state is lost on restart, so only the
  * running total can PROVE the ValueState crossed a checkpoint recovery
  * (the restart-equivalence property this spec exists for). */
class RunningTotalReporter
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Long, (Long, Long)] {
  import org.apache.spark.sql.streaming.{TimerValues, TTLConfig, ValueState}
  @transient private var total: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    total = getHandle.getValueState[Long]("total",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Long],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val t = (if (total.exists()) total.get() else 0L) + rows.size.toLong
    total.update(t)
    Iterator.single((key, t))
  }
}

/** Stateful-operator restart equivalence (the recovery leg
  * PubsubConnectorSpec:308 covers for the SOURCE offset log and
  * SinkRetrySpec covers for SINK epochs, here for OPERATOR state): a
  * p10-style transformWithState query on the RocksDB state store
  * provider is killed mid-stream by an injected batch failure, resumed
  * from the same checkpoint, and must produce per-key running totals
  * identical to an uninterrupted run — i.e. the typed ValueState was
  * restored from the checkpointed store, not rebuilt from zero, and the
  * failed batch replayed exactly once (idempotent per-batchId sink).
  */
class StatefulRestartSpec extends AnyFunSuite with Matchers {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val NumMessages = 600
  private val NumKeys = 7

  private def tmpDir(): String =
    Files.createTempDirectory("stateful-restart").toString

  /** The query under test: pubsub source in small admission-capped
    * micro-batches, per-uid running totals via RunningTotalReporter,
    * idempotent foreachBatch parquet sink (overwrite-by-batchId — the
    * standard exactly-once foreachBatch recipe, so the replayed batch
    * cannot double-append). `failAtBatch` injects one failure. */
  private def runQuery(ep: String, sub: String, chk: String, out: String,
      failAtBatch: Option[Long]): Unit = {
    import spark.implicits._
    var armed = failAtBatch
    val totals = spark.readStream.format("pubsub")
      .option("project_id", "p")
      .option("subscription", sub.split('/').last)
      .option("endpoint", ep)
      .option("num_partitions", "2")
      .option("max_messages_per_partition", "50")
      // ReadLimit admission: 100 rows/trigger over 600 msgs = >= 6
      // micro-batches, so the injected batch-2 failure lands mid-stream
      .option("max_messages_per_trigger", "100")
      .option("dynamic_partitioning", "false")
      .option("ack_deadline_seconds", "600")
      .load()
      .selectExpr("CAST(attributes['uid'] AS BIGINT) AS uid")
      .as[Long]
      .groupByKey(identity)
      .transformWithState(new RunningTotalReporter,
        TimeMode.None(), OutputMode.Append())
      .toDF("user_id", "running")
    val q = totals.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (armed.contains(id)) {
          armed = None
          sys.error(s"injected failure at batch $id")
        }
        batch.write.mode("overwrite").parquet(s"$out/batch_$id")
        ()
      }
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000) shouldBe true
  }

  private def finalTotals(out: String): Map[Long, Long] =
    spark.read.parquet(s"$out/batch_*")
      .groupBy("user_id").agg(max("running").as("total"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("transformWithState (RocksDB) killed mid-stream resumes from the " +
    "checkpoint with state intact: results equal an uninterrupted run") {
    PubsubStreamRegistry.clear()
    val ep = s"restart-${System.nanoTime()}"
    val broker = EmbeddedBroker.get(ep)
    val topic = "projects/p/topics/restart-topic"
    val subKilled = "projects/p/subscriptions/restart-killed"
    val subControl = "projects/p/subscriptions/restart-control"
    broker.createTopic(topic)
    // both subscriptions exist BEFORE publishing so each sees all rows
    broker.createSubscription(subKilled, topic)
    broker.createSubscription(subControl, topic)
    (0 until NumMessages).foreach(i => broker.publish(topic,
      s"m$i".getBytes, Map("uid" -> (i % NumKeys).toString)))

    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    try {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")

      // --- killed-and-resumed run: 600 msgs / (2 x 50)-capped batches
      // = >= 6 micro-batches; batch 2 throws after batches 0-1 committed
      // state, so the restart must restore mid-stream RocksDB state.
      val chk = tmpDir(); val out = tmpDir()
      val failed = intercept[StreamingQueryException] {
        runQuery(ep, subKilled, chk, out, failAtBatch = Some(2L))
      }
      failed.getMessage should include("injected failure")
      // the kill landed mid-stream: some but not all rows were sunk
      val sunkBeforeRestart =
        spark.read.parquet(s"$out/batch_*").count()
      sunkBeforeRestart should be > 0L
      sunkBeforeRestart should be < NumMessages.toLong

      runQuery(ep, subKilled, chk, out, failAtBatch = None)

      // --- uninterrupted control run on its own subscription/checkpoint
      val chkC = tmpDir(); val outC = tmpDir()
      runQuery(ep, subControl, chkC, outC, failAtBatch = None)

      val resumed = finalTotals(out)
      val control = finalTotals(outC)
      val truth = (0 until NumMessages).groupBy(i => (i % NumKeys).toLong)
        .map { case (k, v) => k -> v.size.toLong }
      control shouldBe truth
      // state restored across the kill: running totals continued from
      // the checkpointed values (a from-zero rebuild would cap at the
      // post-restart row counts, well below the true totals)
      resumed shouldBe control
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
