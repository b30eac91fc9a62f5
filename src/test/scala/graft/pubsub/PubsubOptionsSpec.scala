package graft.pubsub

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Mirror of the reference's option-validation unit tests
  * (PubsubOptionsTest.scala:6-114). */
class PubsubOptionsSpec extends AnyFunSuite with Matchers {

  private val readBase = Map(
    "project_id" -> "p", "subscription" -> "s")
  private val writeBase = Map(
    "project_id" -> "p", "topic" -> "t")

  test("missing project_id throws") {
    an[IllegalArgumentException] should be thrownBy
      PubsubOptions.readOptions(Map("subscription" -> "s"))
  }

  test("missing subscription throws") {
    an[IllegalArgumentException] should be thrownBy
      PubsubOptions.readOptions(Map("project_id" -> "p"))
  }

  test("missing topic throws for write") {
    an[IllegalArgumentException] should be thrownBy
      PubsubOptions.writeOptions(Map("project_id" -> "p"))
  }

  test("read defaults: 4 partitions, 1000 messages, dynamic ON " +
    "(reference package.scala:145 defaults dynamic_partitioning true)") {
    val o = PubsubOptions.readOptions(readBase)
    o.numPartitions shouldBe 4
    o.maxMessagesPerPartition shouldBe 1000
    o.dynamicPartitioning shouldBe true
    o.endpoint shouldBe None
  }

  test("explicit values respected") {
    val o = PubsubOptions.readOptions(readBase ++ Map(
      "num_partitions" -> "7", "max_messages_per_partition" -> "50",
      "dynamic_partitioning" -> "false", "endpoint" -> "e1"))
    o.numPartitions shouldBe 7
    o.maxMessagesPerPartition shouldBe 50
    o.dynamicPartitioning shouldBe false
    o.endpoint shouldBe Some("e1")
  }

  test("max_messages_per_trigger: unset means all-available, explicit " +
    "value parses, non-positive rejected") {
    PubsubOptions.readOptions(readBase).maxMessagesPerTrigger shouldBe None
    PubsubOptions.readOptions(
      readBase + ("max_messages_per_trigger" -> "2500"))
      .maxMessagesPerTrigger shouldBe Some(2500L)
    an[IllegalArgumentException] should be thrownBy
      PubsubOptions.readOptions(
        readBase + ("max_messages_per_trigger" -> "0"))
  }

  test("non-positive num_partitions throws") {
    an[IllegalArgumentException] should be thrownBy
      PubsubOptions.readOptions(readBase + ("num_partitions" -> "0"))
  }

  test("non-positive max_messages_per_partition throws") {
    an[IllegalArgumentException] should be thrownBy
      PubsubOptions.readOptions(
        readBase + ("max_messages_per_partition" -> "-1"))
  }

  test("ordering key column passes through") {
    PubsubOptions.writeOptions(writeBase + ("ordering_key_column" -> "k"))
      .orderingKeyColumn shouldBe Some("k")
    PubsubOptions.writeOptions(writeBase).orderingKeyColumn shouldBe None
  }

  test("ordering_key is the reference's option name (package.scala:21) " +
    "and wins over the ordering_key_column alias") {
    PubsubOptions.writeOptions(writeBase + ("ordering_key" -> "k"))
      .orderingKeyColumn shouldBe Some("k")
    PubsubOptions.writeOptions(writeBase ++
      Map("ordering_key" -> "a", "ordering_key_column" -> "b"))
      .orderingKeyColumn shouldBe Some("a")
  }

  test("writer flow-control options: defaults, explicit, non-positive " +
    "rejected (reference PubsubWriter.scala:96-100, " +
    "CachedPublishers.scala:21-25)") {
    val o = PubsubOptions.writeOptions(writeBase)
    o.writerTimeoutSeconds shouldBe 300
    o.maxOutstandingBytes shouldBe 20L * 1024 * 1024
    val e = PubsubOptions.writeOptions(writeBase +
      ("writer_timeout_seconds" -> "60") +
      ("max_outstanding_bytes" -> "1048576"))
    e.writerTimeoutSeconds shouldBe 60
    e.maxOutstandingBytes shouldBe 1048576L
    an[IllegalArgumentException] should be thrownBy
      PubsubOptions.writeOptions(writeBase +
        ("writer_timeout_seconds" -> "0"))
    an[IllegalArgumentException] should be thrownBy
      PubsubOptions.writeOptions(writeBase +
        ("max_outstanding_bytes" -> "-1"))
  }

  test("fully qualified paths") {
    PubsubOptions.readOptions(readBase).subscriptionPath shouldBe
      "projects/p/subscriptions/s"
    PubsubOptions.writeOptions(writeBase).topicPath shouldBe
      "projects/p/topics/t"
  }

  test("a fully-qualified topic path carries its own project id " +
    "(reference alternate-constructor parity)") {
    val o = PubsubOptions.writeOptions(
      Map("topic" -> "projects/other/topics/full"))
    o.projectId shouldBe "other"
    o.topic shouldBe "full"
    o.topicPath shouldBe "projects/other/topics/full"
    // short form still requires project_id
    an[IllegalArgumentException] should be thrownBy
      PubsubOptions.writeOptions(Map("topic" -> "short"))
  }

  test("read schema shape is fixed") {
    val f = PubsubOptions.ReadSchema.fields.map(f => f.name).toSeq
    f shouldBe Seq("subscription", "ack_id", "message_id", "ordering_key",
      "data", "publish_timestamp", "attributes")
  }
}
