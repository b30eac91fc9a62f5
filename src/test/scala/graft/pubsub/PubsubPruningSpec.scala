package graft.pubsub

import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Column-pruning pushdown + lazy-row materialization.
  *
  * The pushdown path (SupportsPushDownRequiredColumns on
  * [[PubsubScanBuilder]]) is exercised DIRECTLY here because Spark 4.1's
  * micro-batch planner builds streaming scans without a pushdown pass
  * (MicroBatchExecution calls newScanBuilder(options).build();
  * V2ScanRelationPushDown matches batch relations only) — the builder
  * honors pruneColumns end-to-end through the scan, the partition
  * descriptor, and the reader's emitted rows, so it engages the release
  * Spark extends pushdown to streaming, and batch-style direct use gets
  * it today. The win reachable today regardless of pushdown is
  * [[PubsubMessageRow]]'s per-field laziness, unit-tested below. */
class PubsubPruningSpec extends AnyFunSuite with Matchers {

  // The stream constructor reads SparkSession.active (backlog monitor).
  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private var n = 0
  private def freshOpts(): (EmbeddedBroker.Broker, PubsubReadOptions) = {
    n += 1
    val ep = s"prune-broker-$n-${System.nanoTime()}"
    val b = EmbeddedBroker.get(ep)
    b.createTopic("projects/p/topics/t")
    b.createSubscription("projects/p/subscriptions/s",
      "projects/p/topics/t")
    (b, PubsubOptions.readOptions(Map(
      "project_id" -> "p", "subscription" -> "s", "endpoint" -> ep,
      "num_partitions" -> "1")))
  }

  private def subsetSchema(names: String*): StructType =
    StructType(names.map(PubsubOptions.ReadSchema.apply))

  test("pruneColumns narrows readSchema, the plan description, and the " +
    "rows the reader emits") {
    spark.sparkContext.setLogLevel("ERROR")
    val (b, opts) = freshOpts()
    b.publish("projects/p/topics/t", "payload".getBytes, Map("k" -> "v"))

    val builder = new PubsubScanBuilder(opts)
    builder.pruneColumns(subsetSchema("data", "publish_timestamp"))
    val scan = builder.build()
    scan.readSchema().fieldNames.toSeq shouldBe
      Seq("data", "publish_timestamp")
    scan.description() should include("[data,publish_timestamp]")

    val cp = java.nio.file.Files
      .createTempDirectory("prune-cp").toString
    val stream = scan.toMicroBatchStream(cp)
      .asInstanceOf[PubsubMicroBatchStream]
    try {
      val end = stream.latestOffset(stream.initialOffset(),
        stream.getDefaultReadLimit)
      val parts = stream.planInputPartitions(stream.initialOffset(), end)
      val reader = stream.createReaderFactory().createReader(parts.head)
      reader.next() shouldBe true
      val row = reader.get()
      row.numFields shouldBe 2
      new String(row.getBinary(0)) shouldBe "payload"
      row.getLong(1) should be > 0L
      reader.next() shouldBe false
    } finally stream.stop()
  }

  test("unpruned build keeps the full 7-column schema (the default " +
    "every existing stream uses)") {
    val (_, opts) = freshOpts()
    val scan = new PubsubScanBuilder(opts).build()
    scan.readSchema() shouldBe PubsubOptions.ReadSchema
  }

  private val msg = EmbeddedBroker.Message(
    messageId = "m1", data = "abc".getBytes,
    attributes = Map("a" -> "1", "b" -> "2"),
    orderingKey = "ok", publishTimestampMicros = 42L)
  private val sub = UTF8String.fromString("projects/p/subscriptions/s")

  test("lazy row: full projection matches the eager layout field for " +
    "field") {
    val row = new PubsubMessageRow(sub, "ack-1", msg,
      PubsubInputPartition.AllFields)
    row.numFields shouldBe 7
    row.getUTF8String(0) shouldBe sub
    row.getUTF8String(1).toString shouldBe "ack-1"
    row.getUTF8String(2).toString shouldBe "m1"
    row.getUTF8String(3).toString shouldBe "ok"
    new String(row.getBinary(4)) shouldBe "abc"
    row.getLong(5) shouldBe 42L
    val m: MapData = row.getMap(6)
    m.numElements() shouldBe 2
    row.anyNull shouldBe false
    (0 until 7).foreach(i => row.isNullAt(i) shouldBe false)
  }

  test("lazy row: pruned ordinals emit in the pruned order, including " +
    "reversed and empty projections") {
    val rev = new PubsubMessageRow(sub, "ack-1", msg, Array(5, 4))
    rev.numFields shouldBe 2
    rev.getLong(0) shouldBe 42L
    new String(rev.getBinary(1)) shouldBe "abc"
    // typed access on a non-long field falls back to the generic boxed
    // path (r11 advice: the old hard require was a schema-shape trap) —
    // the generic path's own cast failure is what surfaces
    an[ClassCastException] should be thrownBy rev.getLong(1)

    val empty = new PubsubMessageRow(sub, "ack-1", msg, Array.empty)
    empty.numFields shouldBe 0
    empty.copy().numFields shouldBe 0
  }

  test("lazy row: conversion memoizes (same instance on re-access) and " +
    "copy() materializes everything") {
    val row = new PubsubMessageRow(sub, "ack-1", msg,
      PubsubInputPartition.AllFields)
    (row.getUTF8String(2) eq row.getUTF8String(2)) shouldBe true
    val copied = row.copy()
    copied.getUTF8String(2).toString shouldBe "m1"
    copied.getLong(5) shouldBe 42L
    copied.getMap(6).numElements() shouldBe 2
  }

  test("CANARY: Spark 4.1's micro-batch planner does NOT call " +
    "pruneColumns on streaming relations — when this FAILS, the " +
    "pushdown has gone live: wire it into p01's PLANS.md plan " +
    "assertion and retire the honesty notes here and on " +
    "PubsubScanBuilder") {
    spark.sparkContext.setLogLevel("ERROR")
    val ep = s"canary-${System.nanoTime()}"
    val b = EmbeddedBroker.get(ep)
    b.createTopic("projects/p/topics/t")
    b.createSubscription("projects/p/subscriptions/s",
      "projects/p/topics/t")
    (0 until 5).foreach(i =>
      b.publish("projects/p/topics/t", s"m$i".getBytes, Map.empty))
    val before = PubsubScanBuilder.pruneCalls.get()
    val got = new java.util.concurrent.atomic.AtomicLong(0)
    // a NARROW projection — exactly the shape a pushdown pass would
    // prune to (data only) if it ran on streaming relations
    val q = spark.readStream.format("pubsub")
      .option("project_id", "p").option("subscription", "s")
      .option("endpoint", ep).option("num_partitions", "1")
      .load()
      .selectExpr("CAST(data AS STRING) AS text")
      .writeStream
      .foreachBatch {
        (ds: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) => got.addAndGet(ds.count()); ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("canary-cp").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000) shouldBe true
    got.get() shouldBe 5L
    withClue("Spark's planner called pruneColumns on a streaming " +
      "relation — the pushdown is LIVE now; update p01's plan " +
      "assertion in PLANS.md to expect the pruned readSchema and " +
      "retire the honesty notes: ") {
      PubsubScanBuilder.pruneCalls.get() shouldBe before
    }
  }

  test("lazy row: a narrow UnsafeProjection through the real codegen " +
    "path converts ONLY the accessed ordinal — the reachable " +
    "narrow-projection win the honesty note claims") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
    import org.apache.spark.sql.types.BinaryType
    val row = new PubsubMessageRow(sub, "ack-1", msg,
      PubsubInputPartition.AllFields)
    row.touchedCount shouldBe 0
    // project `data` (ordinal 4) the way a fused Project does
    val proj = UnsafeProjection.create(
      Seq(BoundReference(4, BinaryType, nullable = false)))
    new String(proj(row).getBinary(0)) shouldBe "abc"
    row.touchedCount shouldBe 1
    // the timestamp fast path materializes nothing at all
    val row2 = new PubsubMessageRow(sub, "ack-1", msg,
      PubsubInputPartition.AllFields)
    row2.getLong(5) shouldBe 42L
    row2.touchedCount shouldBe 0
    // a full-width copy() (an Exchange buffering the row) pays all 7
    val row3 = new PubsubMessageRow(sub, "ack-1", msg,
      PubsubInputPartition.AllFields)
    row3.copy()
    row3.touchedCount shouldBe 7
  }

  test("lazy row is read-only") {
    val row = new PubsubMessageRow(sub, "ack-1", msg,
      PubsubInputPartition.AllFields)
    an[UnsupportedOperationException] should be thrownBy row.setNullAt(0)
    an[UnsupportedOperationException] should be thrownBy row.update(0, 1)
  }
}
