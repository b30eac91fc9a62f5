package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.pubsub.{EmbeddedBroker, PubsubOptions, PubsubStreamRegistry, ReplayCache}

/** Regressions for the round-1 ADVICE findings: short-document shingles,
  * registry restart semantics, replay-cache rename races, configurable
  * ack deadlines, and the as-of-join tie-break.
  */
class AdviceRegressionSpec extends AnyFunSuite with Matchers {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("shingle-based dedup survives documents shorter than 3 words") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-shortdoc").toString
    Seq(
      (1L, "one", "en", "t", 3L),
      (2L, "two words", "en", "t", 9L),
      (3L, "the quick brown fox jumps over", "en", "t", 30L),
      (4L, "the quick brown fox jumps over", "en", "t", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val d04 = SparkEntry.queries("d04_ngram_jaccard")(s, dir).collect()
    d04.map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((3L, 4L))

    // d02 must not throw on the short docs (Spark's sequence(0, size-3)
    // is DESCENDING for size < 3 and slice() then throws).
    val d02 = SparkEntry.queries("d02_minhash_lsh")(s, dir).collect()
    d02.map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((3L, 4L))
  }

  test("a24 as-of join includes a click tied exactly with the error ts") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-asof").toString
    // click and error share user 7 and the *same* timestamp; DuckDB's
    // ASOF condition e.ts >= l.ts includes the tie.
    Seq(
      (1L, 7L, "click", 1000000L, 1.0, """{}"""),
      (2L, 7L, "error", 1000000L, 1.0, """{}"""),
      (3L, 7L, "error", 5000000L, 1.0, """{}"""),
      (4L, 8L, "error", 2000000L, 1.0, """{}"""))
      .toDF("event_id", "user_id", "event_type", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    // fixture ts values are nanos on disk -> micros in the result
    val out = SparkEntry.queries("a24_asof_join")(s, dir).collect()
    out.map(r => (r.getLong(0), Option(r.get(1)))) shouldBe Array(
      (2L, Some(1000L)), // tie included
      (3L, Some(1000L)),
      (4L, None))        // no click for user 8
  }

  test("stream registry: same-checkpoint re-registration is a no-op, " +
    "different checkpoint still rejected") {
    val key = s"advice-reg-${System.nanoTime()}"
    PubsubStreamRegistry.register(key, "/chk/a")
    noException should be thrownBy
      PubsubStreamRegistry.register(key, "/chk/a") // restart, same stream
    an[IllegalStateException] should be thrownBy
      PubsubStreamRegistry.register(key, "/chk/b") // split
    PubsubStreamRegistry.deregister(key)
  }

  test("replay cache: the rename-race loser adopts the winner's rows") {
    val dir = Files.createTempDirectory("graft-replay").toString
    val path = s"$dir/batch=0/part=0"
    def msg(id: String) =
      ("ack-" + id, EmbeddedBroker.Message(id, id.getBytes, Map.empty, "", 0L))
    val winner = Seq(msg("w1"), msg("w2"))
    val loser = Seq(msg("l1"))
    ReplayCache.write(path, winner).map(_._1) shouldBe Seq("ack-w1", "ack-w2")
    // Second writer for the same slot must NOT clobber the canonical file
    // and must return the winner's rows.
    ReplayCache.write(path, loser).map(_._1) shouldBe Seq("ack-w1", "ack-w2")
    ReplayCache.read(path).get.map(_._1) shouldBe Seq("ack-w1", "ack-w2")
  }

  test("replay cache: explicit file:-scheme paths take the same local " +
    "nio fast path as scheme-less paths (round-5 rewrite)") {
    // Spark hands the checkpoint location through as a URI on some
    // configs ("file:/tmp/..."); the local fast path must recognize
    // both spellings, and the bytes must interoperate.
    val dir = Files.createTempDirectory("graft-replay-uri").toString
    def msg(id: String) =
      ("ack-" + id, EmbeddedBroker.Message(id, id.getBytes, Map.empty, "", 0L))
    ReplayCache.write(s"file:$dir/batch=0/part=0", Seq(msg("u1")))
      .map(_._1) shouldBe Seq("ack-u1")
    // scheme-less read sees the scheme-ful write (same file)
    ReplayCache.read(s"$dir/batch=0/part=0").get
      .map(_._1) shouldBe Seq("ack-u1")
    // and the claim stays atomic across spellings: the scheme-less
    // second writer loses and adopts the winner's rows
    ReplayCache.write(s"$dir/batch=0/part=0", Seq(msg("u2")))
      .map(_._1) shouldBe Seq("ack-u1")
    ReplayCache.ackIds(
      new org.apache.hadoop.fs.Path(s"file:$dir/batch=0")) shouldBe
      Seq("ack-u1")
  }

  test("replay cache: concurrent racing writers all adopt one canonical " +
    "row set (atomic claim, no silent POSIX rename overwrite)") {
    // Round-2 ADVICE: exists()-then-rename is check-then-act — two writers
    // could both pass the guard, both renames succeed on POSIX, and each
    // returns its OWN rows as canonical. The claim is now a hard link
    // (atomic EEXIST on local filesystems). Race many writers through a
    // start barrier and require a single canonical outcome.
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val dir = Files.createTempDirectory("graft-replay-race").toString
    def msg(id: String) =
      ("ack-" + id, EmbeddedBroker.Message(id, id.getBytes, Map.empty, "", 0L))
    (1 to 20).foreach { round =>
      val path = s"$dir/batch=$round/part=0"
      val n = 8
      val start = new CountDownLatch(1)
      val pool = Executors.newFixedThreadPool(n)
      val results = (0 until n).map { i =>
        pool.submit(new java.util.concurrent.Callable[Seq[String]] {
          override def call(): Seq[String] = {
            start.await()
            ReplayCache.write(path, Seq(msg(s"w$i-a"), msg(s"w$i-b")))
              .map(_._1)
          }
        })
      }
      start.countDown()
      val outcomes = results.map(_.get(30, TimeUnit.SECONDS))
      pool.shutdown()
      // every writer returns the same canonical rows...
      outcomes.distinct should have size 1
      // ...and those rows are exactly what the file holds
      ReplayCache.read(path).get.map(_._1) shouldBe outcomes.head
    }
  }

  test("bench ref parser handles the committed pretty-printed " +
    "BENCH_local.json (round-3 dead-gate regression)") {
    // The r3 gate regex required no space after the colon; the committed
    // reference is pretty-printed with `": "` so the gate compared against
    // an empty map and never fired. Parse the ACTUAL committed bytes.
    val committed = scala.io.Source.fromFile("BENCH_local.json").mkString
    val ref = Bench.parseRef(committed)
    val queryNames = ref.keySet -- Set("value") // drop the total metric
    // Every registered query must carry a committed reference time —
    // otherwise the per-query regression scan silently skips it.
    SparkEntry.allDefs.map(_.name).toSet.diff(queryNames) shouldBe empty
    ref("a01_scan_project") should be > 0.0
    ref.keySet should contain allOf
      ("m01_media_meta", "m02_frame_features", "s04_ann_ivf_trained")
    // Compact (no-space) form parses identically.
    Bench.parseRef(""""m01_media_meta":0.215""") shouldBe
      Map("m01_media_meta" -> 0.215)
    // A reference captured verbatim from a run that FLAGGED regressions
    // carries a ratio map after the queries object; the ratios must not
    // clobber the seconds (toMap keeps the last binding).
    Bench.parseRef("""{"metric":"total","value":9.99,""" +
      """"queries":{"d02_minhash_lsh":1.80,"a01_scan_project":0.30},""" +
      """"regressions_vs_local":{"d02_minhash_lsh":1.62},"sf":"x"}""") shouldBe
      Map("d02_minhash_lsh" -> 1.80, "a01_scan_project" -> 0.30)
    // Truncation tripwire: parsed count must satisfy the declared count.
    Bench.declaredQueryCount(committed) shouldBe Some(ref.size)
    Bench.declaredQueryCount(""""n_queries": 105,""") shouldBe Some(105)
    Bench.declaredQueryCount("""{"queries":{}}""") shouldBe None
  }

  test("bench regression gate adjudicates a flag by in-session retry " +
    "(round-4: three rounds of noise-only findings)") {
    val ref = Map("q_slow" -> 1.0, "q_noise" -> 1.0, "q_fast" -> 1.0,
      "q_tiny" -> 0.1, "q_dead" -> 1.0)
    val retried = scala.collection.mutable.ArrayBuffer.empty[String]
    def retry(times: Map[String, Double])(name: String): Double = {
      retried += name
      times(name)
    }

    // Reproducible breach: retry confirms -> flagged at the min ratio.
    val (f1, imp1) = Bench.detectRegressions(
      Seq("q_slow" -> 2.4), ref, retry(Map("q_slow" -> 2.2)))
    f1 shouldBe Seq("q_slow" -> 2.2)
    imp1 shouldBe Map("q_slow" -> 2.2)

    // Transient breach: retry lands under 1.5x -> NOT flagged, and the
    // improved reading is surfaced for the merged per-query report.
    val (f2, imp2) = Bench.detectRegressions(
      Seq("q_noise" -> 2.4), ref, retry(Map("q_noise" -> 1.1)))
    f2 shouldBe empty
    imp2 shouldBe Map("q_noise" -> 1.1)

    // No breach / sub-floor timings: retry must never run.
    retried.clear()
    val (f3, _) = Bench.detectRegressions(
      Seq("q_fast" -> 1.2, "q_tiny" -> 0.4, "unknown_query" -> 9.9),
      ref, retry(Map.empty))
    f3 shouldBe empty
    retried shouldBe empty

    // Retry itself failing (-1) keeps the original flag — a query that
    // stops running under retry is reportable, not adjudicated away.
    val (f4, imp4) = Bench.detectRegressions(
      Seq("q_dead" -> 3.0), ref, retry(Map("q_dead" -> -1.0)))
    f4 shouldBe Seq("q_dead" -> 3.0)
    imp4 shouldBe empty
  }

  test("m01/m02/s04 stay within the CI bench threshold vs BENCH_local.json " +
    "(round-3: driver flagged them weak with the regression gate dead)") {
    // Gross-regression tripwire, not a precision benchmark: a reintroduced
    // window sort / cartesian / collect would blow these bars by 10x+,
    // while shared-VM noise (documented in BASELINE.md) stays well under
    // the generous 6x-or-3s bar — especially as a min over reps.
    val ref = Bench.parseRef(
      scala.io.Source.fromFile("BENCH_local.json").mkString)
    val sfDir = "/root/testdata/sf0.1"
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val s = spark
    Seq("m01_media_meta", "m02_frame_features", "s04_ann_ivf_trained")
      .foreach { name =>
        val secs = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(s, sfDir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.min
        val bar = math.max(6 * ref(name), 3.0)
        withClue(f"$name took $secs%.2fs vs ref ${ref(name)} (bar $bar): ") {
          secs should be <= bar
        }
      }
  }

  test("ack_deadline_seconds option: parsed, validated positive") {
    val base = Map(
      PubsubOptions.ProjectId -> "p",
      PubsubOptions.Subscription -> "s")
    PubsubOptions.readOptions(base).ackDeadlineSeconds shouldBe None
    PubsubOptions.readOptions(
      base + (PubsubOptions.AckDeadlineSeconds -> "120"))
      .ackDeadlineSeconds shouldBe Some(120)
    an[IllegalArgumentException] should be thrownBy
      PubsubOptions.readOptions(
        base + (PubsubOptions.AckDeadlineSeconds -> "0"))
  }

  test("broker: setAckDeadline applies to future leases") {
    val b = EmbeddedBroker.get(s"advice-deadline-${System.nanoTime()}")
    b.createTopic("t")
    b.createSubscription("s", "t", ackDeadlineMs = 60)
    b.publish("t", "x".getBytes)
    b.setAckDeadline("s", 600000L) // size above worst-case batch latency
    b.pull("s", 10) should have size 1
    Thread.sleep(150) // past the ORIGINAL 60ms deadline
    b.pull("s", 10) shouldBe empty // not redelivered: new deadline holds
  }

  test("broker: extendLeases keeps an in-flight batch leased past its " +
    "original deadline") {
    val b = EmbeddedBroker.get(s"advice-extend-${System.nanoTime()}")
    b.createTopic("t")
    b.createSubscription("s", "t", ackDeadlineMs = 250)
    b.publish("t", "x".getBytes)
    b.pull("s", 10) should have size 1
    Thread.sleep(150)
    b.extendLeases("s") // batch still in flight
    Thread.sleep(150)   // 300ms since lease: past original deadline
    b.pull("s", 10) shouldBe empty // lease extended, no double-delivery
    Thread.sleep(300)   // extension lapsed without ack
    b.pull("s", 10) should have size 1 // at-least-once redelivery intact
  }
}
