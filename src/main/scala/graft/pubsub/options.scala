package graft.pubsub

import org.apache.spark.sql.types._

/** Option keys + validated option holders for the pub/sub-style connector.
  *
  * API surface mirrors the reference connector's options
  * (reference: src/main/scala/.../pubsub/package.scala:8-38,49-80,138-171):
  * `project_id`, `subscription`/`topic`, `endpoint`, `num_partitions`,
  * `max_messages_per_partition`, `dynamic_partitioning`,
  * `ordering_key_column` — re-validated here as pure functions.
  */
object PubsubOptions {
  val ProjectId = "project_id"
  val Subscription = "subscription"
  val Topic = "topic"
  val Endpoint = "endpoint"
  val NumPartitions = "num_partitions"
  val MaxMessagesPerPartition = "max_messages_per_partition"
  // Admission control: cap on messages admitted per micro-batch trigger
  // (Spark's ReadLimit.maxRows path). Unset = all available.
  val MaxMessagesPerTrigger = "max_messages_per_trigger"
  val DynamicPartitioning = "dynamic_partitioning"
  // The reference names this option `ordering_key` (package.scala:21);
  // `ordering_key_column` is kept as an accepted alias for configs
  // written against earlier rounds of this library.
  val OrderingKey = "ordering_key"
  val OrderingKeyColumn = "ordering_key_column"
  val AckDeadlineSeconds = "ack_deadline_seconds"
  val WriterTimeoutSeconds = "writer_timeout_seconds"
  val MaxOutstandingBytes = "max_outstanding_bytes"
  // The reference configures the publish-barrier timeout through SPARK
  // CONF, not a DSv2 option (PubsubWriter.scala:98); accepted here as a
  // fallback so a ported job's tuning is honored. Option wins over conf.
  val RefWriterTimeoutConf = "spark.sql.pubsub.writer.timeout.seconds"

  val DefaultNumPartitions = 4
  val DefaultMaxMessagesPerPartition = 1000
  // Reference publish-barrier timeout: 300 s
  // (PubsubWriter.scala:96-100, spark.sql.pubsub.writer.timeout.seconds).
  val DefaultWriterTimeoutSeconds = 300
  // Reference publisher flow control blocks at 20 MB outstanding
  // (CachedPublishers.scala:21-25).
  val DefaultMaxOutstandingBytes = 20L * 1024 * 1024

  /** Fixed, non-inferred source schema
    * (reference: package.scala:174-186). */
  val ReadSchema: StructType = StructType(Seq(
    StructField("subscription", StringType, nullable = false),
    StructField("ack_id", StringType, nullable = false),
    StructField("message_id", StringType, nullable = false),
    StructField("ordering_key", StringType, nullable = false),
    StructField("data", BinaryType, nullable = false),
    StructField("publish_timestamp", TimestampType, nullable = false),
    StructField("attributes", MapType(StringType, StringType),
      nullable = true)))

  /** Minimal sink schema; an extra string ordering-key column is allowed
    * (reference: package.scala:189-196, PubsubSink.scala:23-35). */
  val WriteSchema: StructType = StructType(Seq(
    StructField("data", BinaryType, nullable = false),
    StructField("attributes", MapType(StringType, StringType),
      nullable = true)))

  private def required(opts: Map[String, String], key: String): String =
    opts.getOrElse(key, throw new IllegalArgumentException(
      s"Option '$key' is required"))

  private def positiveInt(opts: Map[String, String], key: String,
      default: Int): Int = {
    val v = opts.get(key).map(_.toInt).getOrElse(default)
    if (v <= 0) throw new IllegalArgumentException(
      s"Option '$key' must be positive, got $v")
    v
  }

  def readOptions(opts: Map[String, String]): PubsubReadOptions =
    PubsubReadOptions(
      projectId = required(opts, ProjectId),
      subscription = required(opts, Subscription),
      endpoint = opts.get(Endpoint),
      numPartitions = positiveInt(opts, NumPartitions, DefaultNumPartitions),
      maxMessagesPerPartition = positiveInt(opts, MaxMessagesPerPartition,
        DefaultMaxMessagesPerPartition),
      // Defaults ON, matching the reference (package.scala:145:
      // `.map(_.toBoolean).getOrElse(true)`): an unset option means
      // backlog-proportional planning, not static partitioning.
      dynamicPartitioning =
        opts.get(DynamicPartitioning).map(_.toBoolean).getOrElse(true),
      maxMessagesPerTrigger = opts.get(MaxMessagesPerTrigger).map { v =>
        val n = v.toLong
        if (n <= 0) throw new IllegalArgumentException(
          s"Option '$MaxMessagesPerTrigger' must be positive, got $n")
        n
      },
      ackDeadlineSeconds = opts.get(AckDeadlineSeconds).map { v =>
        val n = v.toInt
        if (n <= 0) throw new IllegalArgumentException(
          s"Option '$AckDeadlineSeconds' must be positive, got $n")
        n
      })

  def writeOptions(opts: Map[String, String]): PubsubWriteOptions = {
    // A fully-qualified `projects/<p>/topics/<t>` value carries its own
    // project id (reference: PubsubWriteOptions alternate constructor,
    // package.scala:71-76); the short form pairs with `project_id`.
    val rawTopic = required(opts, Topic)
    val (projectId, topic) = rawTopic match {
      case FullTopicPath(p, t) => (p, t)
      case _ => (required(opts, ProjectId), rawTopic)
    }
    PubsubWriteOptions(
      projectId = projectId,
      topic = topic,
      orderingKeyColumn =
        opts.get(OrderingKey).orElse(opts.get(OrderingKeyColumn)),
      endpoint = opts.get(Endpoint),
      writerTimeoutSeconds = {
        val confFallback = org.apache.spark.sql.SparkSession.getActiveSession
          .flatMap(_.conf.getOption(RefWriterTimeoutConf)).map(_.toInt)
        positiveInt(opts, WriterTimeoutSeconds,
          confFallback.getOrElse(DefaultWriterTimeoutSeconds))
      },
      maxOutstandingBytes = {
        val v = opts.get(MaxOutstandingBytes).map(_.toLong)
          .getOrElse(DefaultMaxOutstandingBytes)
        if (v <= 0) throw new IllegalArgumentException(
          s"Option '$MaxOutstandingBytes' must be positive, got $v")
        v
      })
  }

  private val FullTopicPath = "^projects/([^/]+)/topics/([^/]+)$".r
}

final case class PubsubReadOptions(
    projectId: String,
    subscription: String,
    endpoint: Option[String],
    numPartitions: Int,
    maxMessagesPerPartition: Int,
    dynamicPartitioning: Boolean,
    maxMessagesPerTrigger: Option[Long] = None,
    ackDeadlineSeconds: Option[Int] = None) {
  def subscriptionPath: String =
    s"projects/$projectId/subscriptions/$subscription"
}

final case class PubsubWriteOptions(
    projectId: String,
    topic: String,
    orderingKeyColumn: Option[String],
    endpoint: Option[String],
    writerTimeoutSeconds: Int = PubsubOptions.DefaultWriterTimeoutSeconds,
    maxOutstandingBytes: Long = PubsubOptions.DefaultMaxOutstandingBytes) {
  def topicPath: String = s"projects/$projectId/topics/$topic"
}
