package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.pubsub.EmbeddedBroker

/** Streaming micro-bench (BASELINE.md: "source→sink round-trip msgs/sec,
  * recorded once built"): publishes N messages to the embedded broker,
  * streams them through the pubsub source and back out through the pubsub
  * sink (Trigger.AvailableNow), and reports msgs/sec for
  *
  *  - `defaults`: the reference's defaults (4 partitions × 1000 msgs/pull
  *    — 25 micro-batches at N=100k), and
  *  - `tuned`: pulls sized so the backlog drains in one micro-batch
  *    (8 × 16k), isolating per-batch overhead from per-message cost.
  *
  * Prints one JSON line, mirroring graft.Bench.
  *
  * Usage: StreamBench [N] [mode]
  *   N    — messages per rep (default 100000, the committed headline)
  *   mode — `all` (default: defaults+tuned+dynamic) or `dyn`
  *          (defaults+dynamic only — the backlog-decade probe: at
  *          N=1M the clamp plans ceil(1M/10000)=100 partitions, a
  *          decade above the 10 it plans at the headline's 100k; the
  *          256-partition ceiling binds from 2.56M), or `shard<K>`
  *          (e.g. `shard4`: N messages split over K endpoint-sharded
  *          brokers, K concurrent dynamic source→sink streams — the
  *          r11 3M finding was that ONE single-JVM broker saturates
  *          past ~1M retained messages and the bench starts measuring
  *          its test double; sharding keeps each broker inside its
  *          honest decade so the aggregate measures the CONNECTOR's
  *          clamp fan-out at 3M, the way a real deployment spreads
  *          load over many brokers)
  */
object StreamBench {

  def main(args: Array[String]): Unit = {
    val N = args.headOption.map(_.toInt).getOrElse(100000)
    val mode = if (args.length > 1) args(1) else "all"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-stream-bench")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()

    val payload = ("x" * 64).getBytes

    if (mode.startsWith("shard")) {
      val shards = mode.stripPrefix("shard").toInt
      require(shards > 1 && shards <= 16, s"shard count: $shards")
      val perShard = N / shards
      // publish each shard's slice to its own broker endpoint
      val eps = (0 until shards).map { s =>
        val ep = s"stream-bench-shard-$s"
        val b = EmbeddedBroker.get(ep)
        b.createTopic("projects/p/topics/in")
        b.createTopic("projects/p/topics/out")
        b.createSubscription("projects/p/subscriptions/in-sub",
          "projects/p/topics/in")
        b.createSubscription("projects/p/subscriptions/out-sub",
          "projects/p/topics/out")
        (0 until perShard).grouped(5000).foreach { g =>
          b.publishBatch("projects/p/topics/in",
            g.map(i => (payload, Map("i" -> i.toString), "")))
        }
        ep
      }
      // K concurrent dynamic streams, one per endpoint — the aggregate
      // drain wall is the throughput denominator
      val t0 = System.nanoTime()
      val qs = eps.zipWithIndex.map { case (ep, s) =>
        spark.readStream.format("pubsub")
          .option("project_id", "p")
          .option("subscription", "in-sub")
          .option("endpoint", ep)
          .option("num_partitions", "4")
          .option("max_messages_per_partition", "1000")
          .option("ack_deadline_seconds",
            math.max(10L, perShard / 10000L).toString)
          .option("dynamic_partitioning", "true")
          .load()
          .select("data", "attributes")
          .writeStream.format("pubsub")
          .option("project_id", "p")
          .option("topic", "out")
          .option("endpoint", ep)
          .option("checkpointLocation",
            Files.createTempDirectory(s"graft-sbench-shard-$s").toString)
          .trigger(Trigger.AvailableNow())
          .start()
      }
      qs.foreach(_.awaitTermination(600000))
      val sec = (System.nanoTime() - t0) / 1e9
      eps.foreach { ep =>
        val got = EmbeddedBroker.get(ep)
          .backlog("projects/p/subscriptions/out-sub")
        require(got == perShard, s"shard $ep lost messages: $got")
      }
      println(f"""{"metric":"stream_roundtrip_msgs_per_sec","n":${
        perShard * shards},"shards":$shards,""" +
        f""""sharded_dynamic":${perShard * shards / sec}%.0f}""")
      spark.stop()
      return
    }

    def run(label: String, partitions: Int, maxPerPull: Int,
        dynamic: Boolean = false): Double = {
      val ep = s"stream-bench-$label"
      val b = EmbeddedBroker.get(ep)
      b.createTopic("projects/p/topics/in")
      b.createTopic("projects/p/topics/out")
      b.createSubscription("projects/p/subscriptions/in-sub",
        "projects/p/topics/in")
      b.createSubscription("projects/p/subscriptions/out-sub",
        "projects/p/topics/out")
      (0 until N).grouped(5000).foreach { g =>
        b.publishBatch("projects/p/topics/in",
          g.map(i => (payload, Map("i" -> i.toString), "")))
      }
      val t0 = System.nanoTime()
      val q = spark.readStream.format("pubsub")
        .option("project_id", "p")
        .option("subscription", "in-sub")
        .option("endpoint", ep)
        .option("num_partitions", partitions.toString)
        .option("max_messages_per_partition", maxPerPull.toString)
        // Size the ack deadline above the worst-case pull-to-commit
        // latency (the source's own scaladoc guidance): at the 256-
        // partition ceiling a 3M-backlog batch pulls 256k messages and
        // outlives the broker's 10 s default mid-batch — the measured
        // result was 1.87M at-least-once redeliveries into the drain
        // (engine behaving as documented; the bench must configure the
        // documented knob). 10 s at the 100k headline (the default).
        .option("ack_deadline_seconds", math.max(10L, N / 10000L).toString)
        // The fixed configs (4x1000 / 8x16k) pin static partitioning —
        // the dynamic default would override num_partitions with the
        // backlog-derived count; the `dynamic` config leaves it ON to
        // price the backlog-monitor path itself.
        .option("dynamic_partitioning", dynamic.toString)
        .load()
        .select("data", "attributes")
        .writeStream.format("pubsub")
        .option("project_id", "p")
        .option("topic", "out")
        .option("endpoint", ep)
        .option("checkpointLocation",
          Files.createTempDirectory(s"graft-sbench-$label").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(600000)
      val sec = (System.nanoTime() - t0) / 1e9
      require(b.backlog("projects/p/subscriptions/out-sub") == N,
        s"round-trip lost messages: " +
          b.backlog("projects/p/subscriptions/out-sub"))
      N / sec
    }

    // Min-of-3 per config (fresh broker endpoint + checkpoint per rep,
    // same JVM): single-shot readings fold one-time JVM/codegen warm-up
    // and shared-VM contention into what is supposed to be a steady-state
    // throughput number — the same methodology the query bench uses
    // (BASELINE.md). The FIRST rep of the first config still pays the full
    // cold start; the min is the engine's actual per-batch cost.
    val reps = sys.env.getOrElse("SPARK_GRAFT_STREAM_REPS", "3").toInt
    def best(name: String, partitions: Int, maxPerPull: Int,
        dynamic: Boolean = false): Double =
      (1 to reps).map(r =>
        run(s"$name-r$r", partitions, maxPerPull, dynamic)).max
    val defaults = best("defaults", 4, 1000)
    // In dyn mode the tuned config is never run — OMIT its key rather
    // than printing 0, which any downstream BASELINE merge would read
    // as a measured throughput (r11 advice).
    val tuned = if (mode == "dyn") None else Some(best("tuned", 8, 16000))
    // dynamic fan-out: num_partitions is only the floor — each batch
    // asks the backlog monitor for the partition count, pricing the
    // monitor + clamp path the static configs bypass.
    val dynamic = best("dynamic", 4, 1000, dynamic = true)
    val tunedField =
      tuned.map(t => f""""tuned_8x16000":${t}%.0f,""").getOrElse("")
    println(f"""{"metric":"stream_roundtrip_msgs_per_sec","n":$N,"reps":$reps,""" +
      f""""defaults_4x1000":${defaults}%.0f,""" + tunedField +
      f""""dynamic_4x1000":${dynamic}%.0f}""")
    spark.stop()
  }
}
