package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.api.Graft

/** The public API surface works on ARBITRARY schemas and column names —
  * not just the fixture tables the gate binds it to. (The gate itself
  * proves oracle correctness; this proves reusability.)
  */
class ApiSpec extends AnyFunSuite with Matchers {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      ("u1", "the quick brown fox jumps over the lazy dog"),
      ("u2", "the quick brown fox jumps over the lazy cat"),
      ("u3", "completely different content with nothing shared here"),
      ("u4", "tiny"),
      ("u5", "the quick brown fox jumps over the lazy dog"))
      .toDF("uid", "body")
  }

  test("minhashLshPairs finds near-dups on custom column names") {
    val pairs = Graft.minhashLshPairs(corpus, "uid", "body")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    pairs should contain(("u1", "u5")) // identical docs
    pairs should contain(("u1", "u2")) // 8/9 shingles shared
    (pairs.flatMap(p => Seq(p._1, p._2)) should not).contain("u3")
    (pairs.flatMap(p => Seq(p._1, p._2)) should not).contain("u4") // short
  }

  test("minhashLshPairs rejects banding parameters that would degenerate " +
    "to all-pairs") {
    // bands > k -> r = 0: every band hash would be md5 of the band index
    // alone, every document collides in every band, O(n²).
    an[IllegalArgumentException] should be thrownBy
      Graft.minhashLshPairs(corpus, "uid", "body", k = 4, bands = 8)
    // k % bands != 0 silently ignores trailing signature columns.
    an[IllegalArgumentException] should be thrownBy
      Graft.minhashLshPairs(corpus, "uid", "body", k = 32, bands = 5)
  }

  test("ngramJaccardPairs matches hand-computed jaccard") {
    val m = Graft.ngramJaccardPairs(corpus, "uid", "body", threshold = 0.1)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
      .toMap
    m(("u1", "u5")) shouldBe 1.0
    // u1/u2: 7 word-3-shingles each, 6 shared -> 6/8
    m(("u1", "u2")) shouldBe 0.75 +- 1e-9
  }

  test("ngramJaccardPairs maxShingleDf: a hot shingle no longer pairs " +
    "every document that contains it") {
    val s = spark
    import s.implicits._
    // Every doc ends with the same 3-word tail; docs 1..4 are otherwise
    // unrelated, docs 5/6 are true near-duplicates of each other.
    val tail = "common suffix tail"
    val hot = Seq(
      ("h1", s"alpha beta gamma $tail"),
      ("h2", s"delta epsilon zeta $tail"),
      ("h3", s"eta theta iota $tail"),
      ("h4", s"kappa lambda mu $tail"),
      ("h5", s"the same exact words here $tail"),
      ("h6", s"the same exact words here $tail"))
      .toDF("uid", "body")
    // Uncapped with a low threshold: the hot tail shingle creates a
    // candidate pair for EVERY document combination — 15 joined pairs.
    val uncapped = Graft.ngramJaccardPairs(hot, "uid", "body",
      threshold = 0.01)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    uncapped.size shouldBe 15
    // Capped below the hot shingle's df=6: only genuinely similar docs
    // keep pairing, on their remaining (quiet) shingles.
    val capped = Graft.ngramJaccardPairs(hot, "uid", "body",
      threshold = 0.01, maxShingleDf = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    capped shouldBe Set(("h5", "h6"))
    // And the surviving pair's jaccard is exact over the reduced sets.
    val jac = Graft.ngramJaccardPairs(hot, "uid", "body",
      threshold = 0.01, maxShingleDf = 3)
      .collect().head.getDouble(2)
    jac shouldBe 1.0
  }

  test("shingle-join hot-shingle tripwire refuses the unbounded join and " +
    "names the hot df") {
    val s = spark
    import s.implicits._
    val tail = "common suffix tail"
    val hot = (1 to 6).map(i => (s"h$i", s"word$i other$i more$i $tail"))
      .toDF("uid", "body")
    // hottest shingle df = 6 > guard 5 -> both pair ops refuse loudly
    val e1 = the[IllegalArgumentException] thrownBy
      Graft.ngramJaccardPairs(hot, "uid", "body", threshold = 0.5,
        hotShingleGuardDf = 5).collect()
    e1.getMessage should include("hottest shingle occurs in 6")
    val e2 = the[IllegalArgumentException] thrownBy
      Graft.containmentPairs(hot, "uid", "body", threshold = 0.5,
        hotShingleGuardDf = 5).collect()
    e2.getMessage should include("containmentPairs")
    // explicit opt-outs both work: raise the guard, or cap the df
    noException should be thrownBy
      Graft.ngramJaccardPairs(hot, "uid", "body", threshold = 0.5,
        hotShingleGuardDf = Int.MaxValue).collect()
    noException should be thrownBy
      Graft.ngramJaccardPairs(hot, "uid", "body", threshold = 0.5,
        maxShingleDf = 5).collect()
  }

  test("LshParams: plane width derives from the data (no silent 64-dim " +
    "truncation) and tables/bits are tunable") {
    val s = spark
    import s.implicits._
    // two 128-dim vectors identical in the first 64 components and
    // OPPOSITE in the tail: the old fixed-64 planes could not tell them
    // apart (tail ignored), full-width planes must
    val v1 = (Array.fill(64)(0.01f) ++ Array.fill(64)(1.0f)).toSeq
    val v2 = (Array.fill(64)(0.01f) ++ Array.fill(64)(-1.0f)).toSeq
    val df = Seq((1L, v1), (2L, v2)).toDF("id", "vec")
    val idx = graft.api.Graft.lshIndex(df, "id", "vec").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val c1 = idx.filter(_._1 == 1L).map(t => (t._2, t._3)).toSet
    val c2 = idx.filter(_._1 == 2L).map(t => (t._2, t._3)).toSet
    c1 should not equal c2 // tail components reached the codes
    // tables/bits shape the index: rows per id = tables, codes < 2^bits
    val shaped = graft.api.Graft.lshIndex(df, "id", "vec",
      graft.api.Graft.LshParams(tables = 7, bits = 3)).collect()
    shaped.count(_.getLong(0) == 1L) shouldBe 7
    all(shaped.map(_.getInt(2))) should be < 8
    // a different seed draws different planes -> different codes
    val reseeded = graft.api.Graft.lshIndex(df, "id", "vec",
      graft.api.Graft.LshParams(seed = 7L)).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    reseeded should not equal idx.toSet
  }

  test("redactPii scrubs emails, phones and IPs and counts each") {
    val s = spark
    import s.implicits._
    val dirty = Seq(
      ("r1", "contact bob.smith+x@example.co.uk or 555-123-4567 now"),
      ("r2", "server at 10.0.0.1 and backup 192.168.1.254 ok"),
      ("r3", "nothing sensitive here at all"))
      .toDF("uid", "body")
    val out = Graft.redactPii(dirty, "uid", "body")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    out("r1") shouldBe ((1L, 1L, 0L, "contact [EMAIL] or [PHONE] now"))
    out("r2") shouldBe ((0L, 0L, 2L, "server at [IPV4] and backup [IPV4] ok"))
    out("r3") shouldBe ((0L, 0L, 0L, "nothing sensitive here at all"))
  }

  test("redactPii is idempotent: redacting already-redacted text changes " +
    "nothing") {
    val s = spark
    import s.implicits._
    val dirty = Seq(("x", "mail a@b.co from 10.0.0.1 or 555-123-4567"))
      .toDF("uid", "body")
    val once = Graft.redactPii(dirty, "uid", "body")
      .select(col("uid"), col("redacted").as("body"))
    val twice = Graft.redactPii(once, "uid", "body")
      .collect().head
    (twice.getLong(1), twice.getLong(2), twice.getLong(3)) shouldBe
      ((0L, 0L, 0L))
    twice.getString(4) shouldBe "mail [EMAIL] from [IPV4] or [PHONE]"
  }

  test("kmeansCentroids: at most nlist centroids, assignment covers every " +
    "vector exactly once") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L)
      .map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vid", "v")
    val cents = Graft.kmeansCentroids(vecs, "vid", "v", nlist = 5, iters = 2)
    cents.count() should be <= 5L
    val assigned = Graft.assignToCentroids(vecs, "vid", "v", cents)
    assigned.count() shouldBe 40L
    assigned.select("vid").distinct().count() shouldBe 40L
  }

  test("pcm16WindowEnergy: little-endian parse, negative samples, " +
    "complete windows only") {
    val s = spark
    import s.implicits._
    // 5 samples per window; 12 samples total -> exactly 2 complete
    // windows, 2 trailing samples dropped. Samples alternate +1000 and
    // -1000 (0xE8 0x03 and 0x18 0xFC little-endian).
    val pos = Array[Byte](0xE8.toByte, 0x03)          // +1000
    val neg = Array[Byte](0x18, 0xFC.toByte)          // -1000
    val payload = (0 until 12).flatMap(i =>
      if (i % 2 == 0) pos else neg).toArray
    val out = Graft.pcm16WindowEnergy(
      Seq((1L, payload)).toDF("mid", "blob"), "mid", "blob",
      windowSamples = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted
    out shouldBe Array((0L, 5000L), (1L, 5000L))
  }

  test("exactDedup keeps the minimum id per content group") {
    val groups = Graft.exactDedup(corpus, "uid", "body")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    groups("u1") shouldBe 2 // u1+u5 collapse
    groups("u2") shouldBe 1
  }

  test("containmentPairs: a doc quoted inside a longer one scores 1.0 " +
    "containment while Jaccard stays below its threshold") {
    val s = spark
    import s.implicits._
    val quote = "the quick brown fox jumps over the lazy dog"
    val page = ("unrelated preamble text " * 10) + quote +
      (" trailing commentary words" * 10)
    val docs = Seq((1L, quote), (2L, page), (3L, "nothing shared at all " * 5))
      .toDF("did", "body")
    val cont = Graft.containmentPairs(docs, "did", "body", n = 3,
      threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    cont((1L, 2L)) shouldBe 1.0 // every quote shingle is in the page
    (cont.keySet should not).contain((2L, 1L)) // page ⊄ quote
    // the symmetric signal misses this entirely
    Graft.ngramJaccardPairs(docs, "did", "body", n = 3, threshold = 0.5)
      .collect() shouldBe empty
  }

  test("incrementalDedup: new-shard verdicts against a prior index, and " +
    "the kept rows extend the index for the next shard") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, sha2}
    // prior corpus kept "alpha" (id 1) and "beta" (id 2)
    val prior = Seq((1L, "alpha"), (2L, "beta")).toDF("pid", "ptext")
      .select(sha2(col("ptext").cast("binary"), 256).as("digest"),
        col("pid").as("keep_id"))
    // shard 1: an index dup, an in-batch dup pair, and fresh content
    val shard1 = Seq((10L, "alpha"), (11L, "gamma"), (12L, "gamma"),
      (13L, "delta")).toDF("nid", "body")
    val v1 = Graft.incrementalDedup(shard1, "nid", "body", prior)
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toMap
    v1(10L) shouldBe ("dup_of_index", Some(1L))
    v1(11L) shouldBe ("kept", None)
    v1(12L) shouldBe ("dup_in_batch", Some(11L))
    v1(13L) shouldBe ("kept", None)
    // fold shard 1's kept rows into the index; shard 2 sees them
    val extended = prior.union(
      Graft.incrementalDedup(shard1, "nid", "body", prior)
        .filter(col("status") === "kept")
        .select(col("digest"), col("nid").as("keep_id")))
    val v2 = Graft.incrementalDedup(
      Seq((20L, "gamma"), (21L, "epsilon")).toDF("nid", "body"),
      "nid", "body", extended)
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toMap
    v2(20L) shouldBe ("dup_of_index", Some(11L))
    v2(21L) shouldBe ("kept", None)
  }

  test("cosineTopK and cosinePairsExact run on custom vector columns") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val vecs = Seq(
      ("a", Array(1f, 0f, 0f)),
      ("b", Array(0.9f, 0.1f, 0f)),
      ("c", Array(0f, 1f, 0f)),
      ("d", Array(0f, 0f, 1f)))
      .toDF("name", "v")
    val top1 = Graft.cosineTopK(vecs, "name", "v",
      queryPred = col("name") === "a", k = 1)
      .collect().map(r => (r.getString(0), r.getString(1)))
    top1 shouldBe Array(("a", "b"))
    val pairs = Graft.cosinePairsExact(vecs, "name", "v", threshold = 0.9)
      .collect().map(r => (r.getString(0), r.getString(1)))
    pairs shouldBe Array(("a", "b"))
  }

  test("semanticDedupPairs on custom columns: co-clustered near-dups " +
    "pair up, multi-probe dedupes shared-cluster pairs") {
    val s = spark
    import s.implicits._
    // two tight groups on opposite axes + one far-off singleton
    val vecs = Seq(
      (1L, Array(1f, 0.02f, 0f)), (2L, Array(0.99f, 0f, 0.01f)),
      (10L, Array(0f, 1f, 0.02f)), (11L, Array(0.01f, 0.98f, 0f)),
      (99L, Array(0f, 0f, 1f)))
      .toDF("doc", "emb")
    val pairs = Graft.semanticDedupPairs(vecs, "doc", "emb",
      nlist = 3, iters = 2, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs shouldBe Set((1L, 2L), (10L, 11L)) // exactly once each
  }

  test("cosinePairsExact refuses inputs above maxRows (the O(n²) guard) " +
    "unless the caller opts in") {
    val s = spark
    import s.implicits._
    val vecs = (0 until 10).map(i => (i.toLong, Array(i.toFloat, 1f)))
      .toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Graft.cosinePairsExact(vecs, "id", "v", threshold = 0.5, maxRows = 5)
    }
    e.getMessage should include("O(n²)")
    // explicit opt-in runs
    Graft.cosinePairsExact(vecs, "id", "v", threshold = 0.99,
      maxRows = 10).count() should be >= 0L
  }

  test("rrfFuse: candidates surfaced by both rankers outrank " +
    "single-ranker candidates; ranks beat raw scores") {
    val s = spark
    import s.implicits._
    // ranker A: n1 > n2 > n3; ranker B: n3 > n1. n1 appears in both
    // (ranks 1+2), n3 in both (3+1), n2 only in A (2).
    val a = Seq((7L, 101L, 1L), (7L, 102L, 2L), (7L, 103L, 3L))
      .toDF("query_id", "neighbor_id", "rnk")
    val b = Seq((7L, 103L, 1L), (7L, 101L, 2L))
      .toDF("query_id", "neighbor_id", "rnk")
    val got = Graft.rrfFuse(Seq(a, b), k0 = 60, topK = 3)
      .orderBy("rnk")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    got.map(_._1) shouldBe Array(101L, 103L, 102L)
    // fused scores are the exact reciprocal-rank sums
    got(0)._2 shouldBe (1.0 / 61 + 1.0 / 62) +- 1e-6
    got(1)._2 shouldBe (1.0 / 63 + 1.0 / 61) +- 1e-6
    got(2)._2 shouldBe (1.0 / 62) +- 1e-6
  }

  test("scrubDuplicatePassages: corpus-duplicated passages drop, " +
    "survivors reassemble in original order") {
    val s = spark
    import s.implicits._
    // 2-word passages: "a b" appears in docs 1 and 2 (boilerplate);
    // doc 1 = [a b][c d][e f], doc 2 = [a b][g h], doc 3 unique.
    val df = Seq(
      (1L, "a b c d e f"),
      (2L, "a b g h"),
      (3L, "x y z"))
      .toDF("id", "body")
    val got = Graft.scrubDuplicatePassages(df, "id", "body",
      unitWords = 2, maxOcc = 1)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    got(1L) shouldBe ((3L, 1L, "c d e f")) // order preserved
    got(2L) shouldBe ((2L, 1L, "g h"))
    got(3L) shouldBe ((2L, 0L, "x y z"))   // [x y][z] untouched
    // fully-boilerplate doc -> empty string, not NULL
    val all = Graft.scrubDuplicatePassages(
      Seq((1L, "a b"), (2L, "a b")).toDF("id", "body"),
      "id", "body", unitWords = 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    all shouldBe Map(1L -> "", 2L -> "")
  }

  test("chunkDedupStats: shared byte chunks count as duplicated, " +
    "unique payloads report zero") {
    val s = spark
    import s.implicits._
    val shared = Array.fill[Byte](16)(7)
    val df = Seq(
      (1L, shared ++ Array.fill[Byte](16)(1)), // chunk A + unique
      (2L, shared ++ Array.fill[Byte](16)(2)), // chunk A + unique
      (3L, Array.fill[Byte](8)(9)))            // single partial chunk
      .toDF("id", "p")
    val got = Graft.chunkDedupStats(df, "id", "p", chunkBytes = 16)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    got(1L) shouldBe ((2L, 1L, 0.5))
    got(2L) shouldBe ((2L, 1L, 0.5))
    got(3L) shouldBe ((1L, 0L, 0.0))
  }

  test("blockedCosinePairs: identical vectors pair within a block, " +
    "never across blocks") {
    val s = spark
    import s.implicits._
    val v = Seq(1.0f, 0.0f)
    val vecs = Seq(
      (1L, v, "en"), (2L, v, "en"),   // same block, identical -> pair
      (3L, v, "fr"),                  // identical but other block -> no pair
      (4L, Seq(0.0f, 1.0f), "en"))    // same block, orthogonal -> no pair
      .toDF("vid", "vec", "blk")
    val got = Graft.blockedCosinePairs(vecs, "vid", "vec", "blk", 0.9)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got shouldBe Array(("en", 1L, 2L))
  }

  test("importanceWeights: target-like documents score above " +
    "raw-typical documents, weights are deterministic") {
    val s = spark
    import s.implicits._
    // target = the "wiki" rows; "alpha beta" is target vocabulary,
    // "spam junk" is raw-only vocabulary
    val df = Seq(
      (1L, "alpha beta alpha beta", "wiki"),
      (2L, "spam junk spam junk", "web"),
      (3L, "alpha beta spam junk", "web"))
      .toDF("id", "body", "src")
    def run() = Graft.importanceWeights(df, "id", "body",
      targetPred = col("src") === "wiki", buckets = 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val got = run()
    got(1L)._1 shouldBe 4L
    // target-vocabulary doc outranks raw-only doc; the mixed doc sits
    // between them
    got(1L)._2 should be > got(3L)._2
    got(3L)._2 should be > got(2L)._2
    run() shouldBe got // deterministic
  }

  test("dupClusters: pairs collapse into components, singletons keep " +
    "their own id") {
    val s = spark
    import s.implicits._
    // Chain 1-2-3 (never directly paired 1-3), pair 10-11, singleton 20:
    // propagation must walk the chain, not just adopt direct neighbors.
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("nid")
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("x", "y")
    val got = Graft.dupClusters(nodes, "nid", pairs, "x", "y")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L)
  }

  test("dupClusters walks a long chain to one component") {
    val s = spark
    import s.implicits._
    // Worst-case diameter for label propagation: a 9-hop path. Every node
    // must end at label 0, exercising the convergence loop (not just one
    // round).
    val n = 10
    val nodes = (0L until n).toDF("nid")
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("x", "y")
    val got = Graft.dupClusters(nodes, "nid", pairs, "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.map(_._2).distinct shouldBe Array(0L)
    got.length shouldBe n
  }

  test("dupClusters runs ONE Spark job per propagation round — the old " +
    "separate join+count convergence check doubled the per-round driver " +
    "latency (round-4 verdict #4)") {
    val s = spark
    import s.implicits._
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        stages.add(js.stageInfos.map(_.name).mkString("|")); ()
      }
    }
    // AQE splits a query into per-stage jobs, which would make the
    // count measure AQE's planning, not the loop's action structure
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.sparkContext.addSparkListener(listener)
    try {
      // 6-node path graph: exactly 6 propagation rounds (5 to walk the
      // diameter, 1 to confirm the fixpoint)
      val n = 6L
      val nodes = (0L until n).toDF("nid")
      val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("x", "y")
      val got = Graft.dupClusters(nodes, "nid", pairs, "x", "y").collect()
      got.map(_.getLong(1)).distinct shouldBe Array(0L)
      // listener bus is async: wait for the job feed to go quiet
      var last = -1
      var spins = 0
      while (stages.size != last && spins < 50) {
        last = stages.size; Thread.sleep(100); spins += 1
      }
      // Broadcast-build jobs (async exchange threads, named after the
      // CompletableFuture trampoline) belong to the SAME query execution
      // — only driver-blocking actions measure the loop's structure.
      val actions = stages.toArray(Array.empty[String])
        .filterNot(_.contains("CompletableFuture"))
      // the old shape's smoking gun: a per-round count() action
      actions.count(_.contains("count at Graft")) shouldBe 0
      // 1 (symmetrized edges ckpt) + 1 (initial labels ckpt) + 6 rounds
      // x 1 materialization + 1 (collect) = 9; the two-actions-per-round
      // shape this guards against lands at 15
      actions.length should be <= 10
    } finally {
      s.sparkContext.removeSparkListener(listener)
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("dupClusters matches a union-find reference on seeded random " +
    "graphs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260812)
    (1 to 3).foreach { _ =>
      val n = 30 + rnd.nextInt(20)
      val edges = Seq.fill(n / 2)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // plain union-find reference
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      val got = Graft.dupClusters(
        (0L until n.toLong).toDF("nid"), "nid",
        edges.toDF("x", "y"), "x", "y")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got shouldBe expected
      // the O(log d) contraction must agree with propagation exactly
      val gotStar = Graft.dupClustersLargeStar(
        (0L until n.toLong).toDF("nid"), "nid",
        edges.toDF("x", "y"), "x", "y")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      gotStar shouldBe expected
    }
  }

  test("clustering/packing ops reject non-numeric id columns up front " +
    "instead of silently casting to null") {
    val s = spark
    import s.implicits._
    val strNodes = Seq("a", "b").toDF("nid")
    val pairs = Seq((1L, 2L)).toDF("x", "y")
    an[IllegalArgumentException] should be thrownBy
      Graft.dupClusters(strNodes, "nid", pairs, "x", "y")
    an[IllegalArgumentException] should be thrownBy
      Graft.dupClustersLargeStar(strNodes, "nid", pairs, "x", "y")
    an[IllegalArgumentException] should be thrownBy
      Graft.packAssignments(Seq(("a", "b c")).toDF("nid", "body"),
        "nid", "body")
  }

  test("dupClustersLargeStar collapses a long chain (the shape built " +
    "for) and handles the empty edge set") {
    val s = spark
    import s.implicits._
    val n = 12
    val chain = (0L until n - 1).map(i => (i, i + 1)).toDF("x", "y")
    val got = Graft.dupClustersLargeStar(
      (0L until n.toLong).toDF("nid"), "nid", chain, "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.map(_._2).distinct shouldBe Array(0L)
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    val singletons = Graft.dupClustersLargeStar(
      (0L until 4L).toDF("nid"), "nid", empty, "x", "y")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    singletons shouldBe Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L)
  }

  test("repetitionSignals flags repeated text and leaves varied text low") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("rep", "spam spam spam spam"),
      ("var", "all words here differ"),
      ("one", "single"))
      .toDF("uid", "body")
    val m = Graft.repetitionSignals(df, "uid", "body")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    m("rep") shouldBe ((4L, 0.75, 1.0)) // 1 distinct of 4; all bigrams equal
    m("var") shouldBe ((4L, 0.0, 0.3333)) // 3 distinct bigrams
    m("one") shouldBe ((1L, 0.0, 0.0))   // no bigrams -> coalesced 0
  }

  test("tfidfTopTerms ranks a document-specific term above corpus-wide " +
    "boilerplate") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("d1", "shared boilerplate words plus unicorn"),
      ("d2", "shared boilerplate words plus dragon"),
      ("d3", "shared boilerplate words plus dragon"))
      .toDF("uid", "body")
    val top1 = Graft.tfidfTopTerms(df, "uid", "body", k = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // "unicorn" (df=1) must beat "shared"/"boilerplate" (df=3) for d1;
    // "dragon" (df=2) still beats the df=3 terms for d2/d3.
    top1 shouldBe Map("d1" -> "unicorn", "d2" -> "dragon", "d3" -> "dragon")
  }

  test("deterministicSplit: assignment is stable, exhaustive, and " +
    "validated") {
    val s = spark
    import s.implicits._
    val a = (1L to 200L).toDF("uid")
    val b = (101L to 300L).toDF("uid") // overlapping, different corpus
    val sa = Graft.deterministicSplit(a, "uid")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val sb = Graft.deterministicSplit(b, "uid")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // Stability: ids present in both corpora land in the same split —
    // the no-eval-drift property.
    (101L to 200L).foreach(id => sa(id) shouldBe sb(id))
    sa.values.toSet shouldBe Set("train", "val", "test")
    an[IllegalArgumentException] should be thrownBy
      Graft.deterministicSplit(a, "uid", weights = Seq("a" -> 50))
  }

  test("byteEntropy: constant payload is 0 bits, two equal halves are " +
    "1 bit") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("zero", Array.fill[Byte](16)(7)),
      ("coin", (Array.fill[Byte](8)(0) ++ Array.fill[Byte](8)(1))),
      ("rich", (0 until 16).map(_.toByte).toArray))
      .toDF("uid", "blob")
    val m = Graft.byteEntropy(df, "uid", "blob")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    m("zero") shouldBe ((16L, 1L, 0.0))
    m("coin") shouldBe ((16L, 2L, 1.0))
    m("rich") shouldBe ((16L, 16L, 4.0))
    // the -0.0 guard: a single-symbol histogram must not hash as -0.0
    java.lang.Double.doubleToRawLongBits(m("zero")._3) shouldBe 0L
  }

  test("trigramLangId: compiled-profile argmax counts overlapping " +
    "windows, breaks ties by lang, defaults when nothing matches") {
    val s = spark
    import s.implicits._
    val profiles = Seq("aa" -> Seq("aaa"), "bb" -> Seq("bbb"))
    val df = Seq(
      (1L, "AAAABBB"),  // aaa x2 (overlapping), bbb x1 -> aa
      (2L, "abbbb"),    // bbb x2 -> bb
      (3L, "aaabbb"),   // 1-1 tie -> smallest lang wins: aa
      (4L, "xyz"),      // no hits -> default
      (5L, "ab"))       // shorter than a window -> default
      .toDF("k", "t")
      .unionAll(Seq((6L, Option.empty[String])) // NULL text -> default
        .toDF("k", "t"))
    val got = Graft.trigramLangId(df, "k", "t", profiles, default = "zz")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got shouldBe Map(1L -> "aa", 2L -> "bb", 3L -> "aa",
      4L -> "zz", 5L -> "zz", 6L -> "zz")
  }

  test("duplicatePassageStats: corpus-wide repeated passages are flagged, " +
    "unique ones are not") {
    val s = spark
    import s.implicits._
    // 3-word passages: d1 = [A, B], d2 = [A, C], d3 = [D] (+ d1's A
    // repeats in d2) -> A is duplicated (occurs 2x), B/C/D unique.
    val df = Seq(
      (1L, "a b c x y z"),       // units: "a b c"(A), "x y z"(B)
      (2L, "a b c q r s"),       // units: "a b c"(A), "q r s"(C)
      (3L, "m n"))               // single short unit "m n"(D)
      .toDF("id", "body")
    val got = Graft.duplicatePassageStats(df, "id", "body", unitWords = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    got(1L) shouldBe ((2L, 1L, 0.5))
    got(2L) shouldBe ((2L, 1L, 0.5))
    got(3L) shouldBe ((1L, 0L, 0.0))
  }

  test("bpePairCounts: pair counts weight by word frequency and rank " +
    "deterministically") {
    val s = spark
    import s.implicits._
    // "ab" occurs in 'ab' (x3 rows) and 'abc' (x1): pair "ab" count 4;
    // 'abc' adds "bc" count 1; single-char words are excluded.
    val df = Seq("ab ab c", "ab abc").toDF("body")
    val got = Graft.bpePairCounts(df, "body", topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    got shouldBe Array(("ab", 4L), ("bc", 1L))
  }

  test("bpeTrain: deterministic merge sequence, later rounds merge " +
    "earlier rounds' output, consecutive runs merge leftmost-first") {
    val s = spark
    import s.implicits._
    // vocab: aaab (wc 2), ab (1), xy (1).
    // round 1 pairs: (a,a) 2x2=4, (a,b) 2+1=3, (x,y) 1 -> merge "a a";
    //   aaab rewrites a,a,a,b -> aa,a,b (leftmost non-overlapping).
    // round 2 pairs: (aa,a) 2, (a,b) 2+1=3, (x,y) 1 -> merge "a b".
    val df = Seq(("d1", "aaab aaab ab"), ("d2", "xy")).toDF("id", "body")
    val got = Graft.bpeTrain(df, "body", merges = 2)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    got shouldBe Array((1L, "a a", "aa", 4L), (2L, "a b", "ab", 3L))
  }

  test("bpeEncode: per-doc token counts under the trained merges; " +
    "wordless docs keep a zero row") {
    val s = spark
    import s.implicits._
    val df = Seq(("d1", "aaab aaab ab"), ("d2", "xy"), ("d3", ""))
      .toDF("id", "body")
    val merges = Graft.bpeTrain(df, "body", merges = 2)
    val got = Graft.bpeEncode(df, "id", "body", merges)
      .orderBy("id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // after (a a)->aa, (a b)->ab: aaab = [aa, ab] (2 tokens: the round-2
    // state aa,a,b takes the (a,b) merge), ab = [ab] (1), xy = [x, y] (2)
    got shouldBe Array(("d1", 3L, 5L), ("d2", 1L, 2L), ("d3", 0L, 0L))
  }

  test("bpeTrain: local and distributed regimes emit the identical " +
    "merge table at K=64 on the fixture corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    def table(localVocabMax: Long) =
      Graft.bpeTrain(docs, "text", merges = 64,
          localVocabMax = localVocabMax)
        .orderBy("step").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3)))
    val local = table(Long.MaxValue)
    val dist = table(0L)
    local.length shouldBe 64
    local shouldBe dist
  }

  test("bpeTrain: UTF-8 byte tie order and code-point tokens, pinned " +
    "identical across both regimes") {
    val s = spark
    import s.implicits._
    // (U+FF61, a) and (U+10000, b) tie at count 2. Spark's binary
    // string order puts "｡ a" FIRST (EF BD A1 < F0 90 80 80);
    // Java's UTF-16 compareTo would pick the other (D800 < FF61) —
    // the local loop must follow Spark. U+10000 is a surrogate PAIR
    // in UTF-16 but ONE token under code-point tokenization.
    val df = Seq("｡a ｡a 𐀀b 𐀀b")
      .toDF("body")
    def table(localVocabMax: Long) =
      Graft.bpeTrain(df, "body", merges = 2,
          localVocabMax = localVocabMax)
        .orderBy("step").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3)))
    val local = table(Long.MaxValue)
    local shouldBe table(0L)
    local(0) shouldBe ((1L, "｡ a", "｡a", 2L))
    local(1) shouldBe ((2L, "𐀀 b", "𐀀b", 2L))
  }

  test("bpeTrain: overlapping-run counts and leftmost-first rewrite, " +
    "identical across both regimes") {
    val s = spark
    import s.implicits._
    // "cccc" counts (c,c) at ALL 3 adjacent positions; the rewrite is
    // leftmost non-overlapping -> "cc cc", so round 2 merges (cc,cc).
    val df = Seq("cccc").toDF("body")
    def table(localVocabMax: Long) =
      Graft.bpeTrain(df, "body", merges = 3,
          localVocabMax = localVocabMax)
        .orderBy("step").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3)))
    val local = table(Long.MaxValue)
    local shouldBe table(0L)
    local shouldBe Array((1L, "c c", "cc", 3L),
      (2L, "cc cc", "cccc", 1L))
  }

  test("bpeEncode: >64-merge tables apply chunked and match a local " +
    "reference tokenizer") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    val merges = Graft.bpeTrain(docs, "text", merges = 80)
    val steps = merges.orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2)))
    steps.length shouldBe 80
    // independent reference: apply the merge table per word in plain
    // Scala (code-point tokens, leftmost non-overlapping, step order)
    def tokenize(word: String): Long = {
      var t = word.codePoints().toArray
        .map(cp => new String(Character.toChars(cp)))
      steps.foreach { case (pair, m) =>
        val Array(l, r) = pair.split(" ", 2)
        val out = Array.newBuilder[String]
        var i = 0
        while (i < t.length) {
          if (i < t.length - 1 && t(i) == l && t(i + 1) == r) {
            out += m; i += 2
          } else { out += t(i); i += 1 }
        }
        t = out.result()
      }
      t.length.toLong
    }
    val expected = docs.select("doc_id", "text").collect().map { r =>
      val words = r.getString(1).split(" ").filter(_.nonEmpty)
      (r.getLong(0), words.length.toLong,
        words.map(tokenize).sum)
    }.sortBy(_._1)
    val got = Graft.bpeEncode(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got shouldBe expected
  }

  test("stratifiedSample: deterministic, rate-monotone, missing strata " +
    "drop, rate 1.0 keeps everything") {
    val s = spark
    import s.implicits._
    val df = (0L until 400L).map(i =>
      (i, if (i % 2 == 0) "big" else "small")).toDF("k", "grp")
    def run(rates: Seq[(String, Double)]) =
      Graft.stratifiedSample(df, "k", "grp", rates)
        .collect().map(_.getLong(0)).toSet
    val half = run(Seq("big" -> 0.5, "small" -> 1.0))
    half shouldBe run(Seq("big" -> 0.5, "small" -> 1.0)) // deterministic
    (0L until 400L by 2).filter(i => half(i)).size should
      (be > 50 and be < 150) // ~100 of 200 at rate 0.5
    half.count(_ % 2 == 1) shouldBe 200 // rate 1.0: all small rows
    // a lower rate samples a SUBSET of a higher rate (nested samples)
    val fifth = run(Seq("big" -> 0.2, "small" -> 1.0))
    fifth.filter(_ % 2 == 0).subsetOf(half.filter(_ % 2 == 0)) shouldBe true
    // strata without a rate drop entirely
    run(Seq("big" -> 1.0)).count(_ % 2 == 1) shouldBe 0
  }

  test("unigramLogProb: in-vocab text outscores OOV-heavy text") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "common common common words words"),
      (2L, "zzyx qqzz vvxx common words"))
      .toDF("k", "t")
    val got = Graft.unigramLogProb(df, "k", "t", vocabSize = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    got(1L)._1 shouldBe 5L
    got(2L)._1 shouldBe 5L
    got(1L)._2 should be > got(2L)._2 // fluency beats rare-token spam
  }

  test("ahashNearDupPairs: perturbed payloads pair up within the radius, " +
    "unrelated payloads do not") {
    val s = spark
    import s.implicits._
    // base: a strong block pattern (half low, half high bytes) so the
    // aHash has structure; 'near' flips a few bytes (re-encode noise);
    // 'far' inverts the pattern entirely.
    val base = Array.tabulate[Byte](600)(i => if (i < 300) 10 else 120)
    val near = base.clone(); (0 until 5).foreach(i => near(i * 60) = 65)
    val far = base.map(b => (130 - b).toByte)
    val df = Seq((1L, base), (2L, near), (3L, far))
      .toDF("mid", "payload")
    val pairs = Graft.ahashNearDupPairs(df, "mid", "payload", radius = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((1L, 2L))
    (pairs.flatMap(p => Seq(p._1, p._2)) should not).contain(3L)
    // identical payloads: distance 0, found through every band
    val dup = Graft.ahashNearDupPairs(
      Seq((7L, base), (8L, base)).toDF("mid", "payload"),
      "mid", "payload", radius = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    dup shouldBe Array((7L, 8L, 0L))
  }

  test("ahashNearDupPairs: a byte-sum-preserving first/last-char swap " +
    "(the m11 gate construction) stays within radius 3 of its source") {
    val s = spark
    import s.implicits._
    // ASCII word-soup texts (the fixture's shape): swapping the first
    // and last characters preserves the byte SUM, so only the first and
    // last aHash chunks can flip — hamming distance <= 2 by
    // construction, caught deterministically by the 4-band pigeonhole.
    val texts = Seq(
      "quartz vineyard mosaic ember lantern drizzle harbor velvet " +
        "meadow cascade thistle orchard pebble summit willow fjord",
      "zeppelin oracle biscuit harbor glacier mantle prism nectar " +
        "quill rampart sonnet tundra umber vortex wicker yonder axiom")
    val rows = texts.zipWithIndex.flatMap { case (t, i) =>
      val swapped = t.last +: t.substring(1, t.length - 1) :+ t.head
      Seq((i.toLong, t.getBytes("UTF-8")),
        (i.toLong + 100L, swapped.getBytes("UTF-8")))
    }
    val pairs = Graft.ahashNearDupPairs(
      rows.toDF("mid", "payload"), "mid", "payload", radius = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    texts.indices.foreach { i =>
      val p = pairs.filter(t => t._1 == i.toLong && t._2 == i + 100L)
      p should have size 1
      p.head._3 should be <= 2L
    }
  }

  test("ahashWideNearDupPairs: matches a brute-force hamming filter " +
    "over the wide hash (exactness of the word-aligned banding)") {
    val s = spark
    import s.implicits._
    // Deterministic payload soup: block patterns plus small seeded
    // perturbations so SOME pairs land inside the radius and most stay
    // out — then the banded join must reproduce the brute-force pair
    // list exactly (pigeonhole banding is exact, not approximate).
    val rnd = new scala.util.Random(41)
    val rows = (0 until 40).map { i =>
      val base = Array.tabulate[Byte](480)(g =>
        if ((g / 40 + i % 4) % 2 == 0) 15 else 110)
      (0 until rnd.nextInt(6)).foreach { _ =>
        base(rnd.nextInt(480)) = (rnd.nextInt(120) + 5).toByte
      }
      (i.toLong, base)
    }
    val df = rows.toDF("mid", "payload")
    val got = Graft.ahashWideNearDupPairs(df, "mid", "payload",
      radius = 3, words = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val hashes = rows.map { case (id, b) =>
      val a = graft.functions.AHashWide.compute(b, 2).toLongArray()
      id -> a
    }
    val want = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha(0) ^ hb(0)) +
        java.lang.Long.bitCount(ha(1) ^ hb(1))
      if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    got shouldBe want
    want should not be empty
  }

  test("ahashWideNearDupPairs: the byte-sum-preserving swap stays " +
    "within radius 3 in the 120-bit metric (the m13 gate construction)") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      "quartz vineyard mosaic ember lantern drizzle harbor velvet " +
        "meadow cascade thistle orchard pebble summit willow fjord",
      "zeppelin oracle biscuit harbor glacier mantle prism nectar " +
        "quill rampart sonnet tundra umber vortex wicker yonder axiom")
    val rows = texts.zipWithIndex.flatMap { case (t, i) =>
      val swapped = t.last +: t.substring(1, t.length - 1) :+ t.head
      Seq((i.toLong, t.getBytes("UTF-8")),
        (i.toLong + 100L, swapped.getBytes("UTF-8")))
    }
    val pairs = Graft.ahashWideNearDupPairs(
      rows.toDF("mid", "payload"), "mid", "payload",
      radius = 3, words = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    texts.indices.foreach { i =>
      val p = pairs.filter(t => t._1 == i.toLong && t._2 == i + 100L)
      p should have size 1
      p.head._3 should be <= 2L
    }
  }

  test("simhashWideNearDupPairs: matches a brute-force hamming filter " +
    "over the 120-bit signatures (exactness of the banding)") {
    val s = spark
    import s.implicits._
    // Near-identical variants (one word substituted) plus disjoint
    // docs: the banded join must reproduce the brute-force pair list
    // over the collected signatures exactly.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val rows = Seq(
      (1L, base),
      (2L, base),                                  // exact dup: dist 0
      (3L, base.replace("gamma", "chi")),          // one-word variant
      (4L, "completely different words everywhere here nothing shared " +
        "at all with those other documents in any token position"))
    val df = rows.toDF("mid", "text")
    val got = Graft.simhashWideNearDupPairs(df, "mid", "text", radius = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val sigs = Graft.simhashWideSignatures(df, "mid", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    val want = (for {
      (ia, (a0, a1)) <- sigs; (ib, (b0, b1)) <- sigs if ia < ib
      d = java.lang.Long.bitCount(a0 ^ b0) + java.lang.Long.bitCount(a1 ^ b1)
      if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    got shouldBe want
    got.map(p => (p._1, p._2)) should contain((1L, 2L)) // the exact dup
    (got.flatMap(p => Seq(p._1, p._2)) should not).contain(4L)
  }

  test("silenceSegments: runs of sub-threshold PCM windows island up; " +
    "isolated quiet windows are dropped") {
    val s = spark
    import s.implicits._
    def pcm(amps: Seq[Int]): Array[Byte] = amps.flatMap { a =>
      Seq((a & 0xff).toByte, ((a >> 8) & 0xff).toByte)
    }.toArray
    // 9 windows of 16 samples: loud(1000) x4, quiet(10) x3, loud,
    // quiet x1 — mean energy 8960, 4/5 threshold 7168: the quiet
    // windows island at 4-6; the trailing single one is dropped.
    val amps = Seq.fill(4 * 16)(1000) ++ Seq.fill(3 * 16)(10) ++
      Seq.fill(16)(1000) ++ Seq.fill(16)(10)
    val got = Graft.silenceSegments(
      Seq((1L, pcm(amps))).toDF("mid", "payload"),
      "mid", "payload", windowSamples = 16,
      thresholdNum = 4, thresholdDen = 5, minWindows = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    got shouldBe Array((1L, 4L, 6L, 3L))
    // minWindows=1 admits the isolated trailing window too
    val loose = Graft.silenceSegments(
      Seq((1L, pcm(amps))).toDF("mid", "payload"),
      "mid", "payload", windowSamples = 16,
      thresholdNum = 4, thresholdDen = 5, minWindows = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    loose shouldBe Array((4L, 6L, 3L), (8L, 8L, 1L))
  }

  test("ahashWideNearDupPairs: the words=4 (240-bit) variant bands at " +
    "full 60-bit words and still finds identical payloads at dist 0") {
    val s = spark
    import s.implicits._
    val base = Array.tabulate[Byte](960)(i => if (i % 80 < 40) 20 else 100)
    val far = base.map(b => (120 - b).toByte)
    val got = Graft.ahashWideNearDupPairs(
      Seq((1L, base), (2L, base.clone()), (3L, far))
        .toDF("mid", "payload"),
      "mid", "payload", radius = 3, words = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got shouldBe Array((1L, 2L, 0L))
  }

  test("ahashWideNearDupPairs: rejects a banding that cannot be " +
    "word-aligned; words=1/radius=3 degrades to the AHash60 split") {
    val s = spark
    import s.implicits._
    an[IllegalArgumentException] should be thrownBy
      Graft.ahashWideNearDupPairs(
        Seq((1L, Array[Byte](1, 2))).toDF("mid", "payload"),
        "mid", "payload", radius = 2, words = 2) // 40-bit bands !| 60
    // words=1 reproduces m11's banding over the same 60-bit hash: the
    // wide word-0 hash equals AHash60 bit for bit
    val b = "abcdefgh".getBytes("UTF-8")
    graft.functions.AHashWide.compute(b, 1).toLongArray()(0) shouldBe
      graft.functions.AHash60.compute(b)
  }

  test("ngramNoveltyScores: duplicated docs score 0, disjoint docs " +
    "score 1, short docs yield no row") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // exact dup of 1
      (3L, "zeta eta theta iota kappa"),      // disjoint content
      (4L, "two words"))                      // < 3 words: no shingles
      .toDF("doc_id", "text")
    val got = Graft.ngramNoveltyScores(df, "doc_id", "text", n = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    got.keySet shouldBe Set(1L, 2L, 3L)
    got(1L) shouldBe ((3L, 0.0)) // every shingle shared with doc 2
    got(2L) shouldBe ((3L, 0.0))
    got(3L) shouldBe ((3L, 1.0)) // every shingle unique to doc 3
  }

  test("bigramLogProb: repeated transitions score higher than unique " +
    "ones, short docs report zero bigrams") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "go go go go go"),        // one transition, seen 4x
      (2L, "alpha beta gamma delta"), // every transition unique
      (3L, "single"))                 // < 2 words: no transitions
      .toDF("doc_id", "text")
    val got = graft.api.Graft.bigramLogProb(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    got(1L)._1 shouldBe 4L
    got(2L)._1 shouldBe 3L
    got(3L) shouldBe ((0L, None))
    got(1L)._2.get should be > got(2L)._2.get
  }

  test("contaminationFlags: overlap with the eval set is counted, clean " +
    "docs report zero") {
    val s = spark
    import s.implicits._
    val evalSet = Seq("the capital of france is paris").toDF("q")
    // u-corpus: u1 contains an eval 3-gram ("capital of france"), the
    // rest share nothing 3-gram-long with the eval text.
    val corpus = Seq(
      ("c1", "we know the capital of france is paris obviously"),
      ("c2", "completely unrelated text about sparkling databases"),
      ("c3", "to"))  // shorter than 3 words -> no shingles at all
      .toDF("uid", "body")
    val m = Graft.contaminationFlags(corpus, "uid", "body", evalSet, "q")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    m("c1")._1 shouldBe 4L // 4 of the eval text's 3-grams appear in c1
    m("c1")._2 shouldBe (4.0 / 7).round4
    m("c2") shouldBe ((0L, 0.0))
    m("c3") shouldBe ((0L, 0.0))
  }

  test("packAssignments: packs fill to capacity within a shard and " +
    "never mix shards") {
    val s = spark
    import s.implicits._
    // one shard (ids all ≡ 0 mod 1): 5 docs x 4 tokens, capacity 8 ->
    // packs of 2 docs: [0,0,1,1,2]
    val docs = (0L to 4L)
      .map(i => (i, "a b c d")).toDF("uid", "body")
    val got = Graft.packAssignments(docs, "uid", "body",
      capacity = 8, shards = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    got shouldBe Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L)
    an[IllegalArgumentException] should be thrownBy
      Graft.packAssignments(docs, "uid", "body", capacity = 0)
  }

  private implicit class Round4(d: Double) {
    def round4: Double = math.round(d * 1e4) / 1e4
  }

  test("normalizeText collapses case, control chars and whitespace runs") {
    val s = spark
    import s.implicits._
    val df = Seq(("n1", "  Hello  WORLD\tfoo  ")).toDF("uid", "body")
    val r = Graft.normalizeText(df, "uid", "body").collect().head
    r.getString(1) shouldBe "hello world foo"
    r.getLong(2) shouldBe 15L
  }

  test("pcm16ChannelWindowEnergy deinterleaves stereo: silent left " +
    "channel, constant right channel") {
    val s = spark
    import s.implicits._
    // 16 stereo frames of [L=0x0000, R=0x0101]: left window sums to 0,
    // right to 16 * (0x01 + 0x01*256) = 16 * 257
    val payload = Array.fill(16)(Array[Byte](0, 0, 1, 1)).flatten
    val df = Seq(("a1", payload)).toDF("uid", "blob")
    val got = Graft.pcm16ChannelWindowEnergy(df, "uid", "blob",
      windowSamples = 16, channels = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    got shouldBe Map((0L, 0L) -> 0L, (1L, 0L) -> 16L * 257)
  }

  test("minhashLshPairs: hot band-bucket tripwire fires on mass " +
    "duplicates; maxBandBucket opts into skip semantics") {
    val s = spark
    import s.implicits._
    // 60 byte-identical docs: every band bucket holds all 60
    val hot = (1L to 60L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta")).toDF(
      "doc_id", "text")
    val ex = intercept[Exception] {
      Graft.minhashLshPairs(hot, "doc_id", "text", hotBandGuard = 50)
        .collect()
    }
    ex.getMessage should include("band bucket holds")
    // explicit cap: over-cap buckets skip (exact dups belong to d01)
    Graft.minhashLshPairs(hot, "doc_id", "text", maxBandBucket = 50)
      .count() shouldBe 0L
    // raised guard forces the unbounded join and finds all pairs
    Graft.minhashLshPairs(hot, "doc_id", "text", hotBandGuard = 60)
      .count() shouldBe 60L * 59 / 2
  }

  test("repeatedSpanStats: offset-shifted repeats are caught (tumbling " +
    "passages miss them), short docs report zeros") {
    val s = spark
    import s.implicits._
    val span = (1 to 10).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      // span starts at word 0 in d1 but word 3 in d2 — never aligned to
      // a 10-word tumbling boundary in d2
      (1L, span + " tail1 tail2 tail3"),
      (2L, "pre1 pre2 pre3 " + span),
      (3L, "all unique words here nothing repeats in this document at"),
      (4L, "short doc")).toDF("doc_id", "text")
    val got = Graft.repeatedSpanStats(docs, "doc_id", "text",
      windowWords = 10, maxOcc = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // d1: 4 windows (13 words), window at pos 0 duplicated -> 10 covered
    got(1L) shouldBe ((4L, 1L, 10L))
    // d2: 4 windows, window at pos 3 duplicated -> 10 covered
    got(2L) shouldBe ((4L, 1L, 10L))
    got(3L) shouldBe ((1L, 0L, 0L))
    got(4L) shouldBe ((0L, 0L, 0L)) // shorter than the window
    // the tumbling variant is blind to d2's shifted copy
    val tumbling = Graft.duplicatePassageStats(docs, "doc_id", "text",
      unitWords = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    tumbling(2L) shouldBe 0L
  }

  test("mixtureByBudget: admitted prefix equals the naive global-window " +
    "formulation, budgets bind per source, unlisted sources drop") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{concat_ws, lit, md5, sum}
    val docs = (1L to 400L).map(i =>
      (i, s"s${i % 3}", 10L + i % 7)).toDF("id", "src", "tok")
    val budgets = Seq("s0" -> 300L, "s1" -> 120L) // s2 unlisted
    val got = Graft.mixtureByBudget(docs, "id", "tok", "src", budgets)
    // naive reference: one global cumsum per source in (pri, id) order
    val pri = graft.functions.TextExpressions.hexSliceLong(
      org.apache.spark.sql.functions.md5(
        concat_ws(":", lit("mix"), $"id".cast("string"))), 1, 15)
    val w = Window.partitionBy("src").orderBy("pri", "id")
      .rowsBetween(Long.MinValue, 0)
    val naive = docs.withColumn("pri", pri)
      .join(budgets.toDF("src", "budget"), Seq("src"))
      .withColumn("cum", sum("tok").over(w))
      .filter($"cum" <= $"budget")
      .select($"id", $"src", $"tok".as("n_tok"), $"cum".as("cum_tok"))
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val gotSet = key(got)
    gotSet shouldBe key(naive)
    gotSet.map(_._2) shouldBe Set("s0", "s1") // s2 dropped
    // budgets actually bind: admitted token mass within budget but
    // close enough that at least one doc per listed source was cut
    val byTok = gotSet.groupBy(_._2).view
      .mapValues(_.toSeq.map(_._3).sum)
    assert(byTok("s0") <= 300L && byTok("s0") > 300L - 17)
    assert(byTok("s1") <= 120L && byTok("s1") > 120L - 17)
  }

  test("bloomIncrementalDedup: verdicts identical to incrementalDedup, " +
    "and the index probe join is bloom-pruned in the plan") {
    val s = spark
    import s.implicits._
    // index holds digests of "alpha"/"beta"; the batch re-sends "beta"
    // (dup_of_index), duplicates "gamma" within itself (dup_in_batch +
    // kept), and brings fresh "delta" (kept, must skip the probe join)
    val prior = Seq(("alpha", 1L), ("beta", 2L))
      .toDF("t", "keep_id")
      .select(org.apache.spark.sql.functions.sha2($"t".cast("binary"), 256)
        .as("digest"), $"keep_id")
    val batch = Seq((10L, "beta"), (11L, "gamma"), (12L, "gamma"),
      (13L, "delta")).toDF("doc_id", "text")
    val viaBloom = Graft.bloomIncrementalDedup(
      batch, "doc_id", "text", prior)
    val plain = Graft.incrementalDedup(batch, "doc_id", "text", prior)
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getLong(0), r.getString(2),
        Option(r.get(3)).map(_.toString))).toSet
    key(viaBloom) shouldBe key(plain)
    key(viaBloom).map(t => (t._1, t._2)) shouldBe Set(
      (10L, "dup_of_index"), (11L, "kept"), (12L, "dup_in_batch"),
      (13L, "kept"))
    // the pre-prune is real: the probe side filters on might_contain
    // BEFORE the index join (definitely-new digests never shuffle).
    // Asserted on the analyzed plan: over a LocalRelation test fixture
    // the optimizer constant-folds the filter away entirely (over a
    // parquet scan it stays as a codegen'd map filter).
    val plan = viaBloom.queryExecution.analyzed.toString
    plan should include("might_contain")
  }

  test("keepBestPerCluster: one survivor per cluster by score, ties to " +
    "the smaller id, singletons keep themselves") {
    val s = spark
    import s.implicits._
    // numeric ids: cluster math is defined on numeric ids (require()'d)
    val df = Seq(
      (1L, 10L), (2L, 30L), (3L, 30L), // cluster {1,2,3}
      (4L, 5L))                        // singleton
      .toDF("uid", "len")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("pa", "pb")
    val rows = Graft.keepBestPerCluster(df, "uid", "len", pairs, "pa", "pb")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // ids 2 and 3 tie on score 30; the smaller id (2) survives
    rows(2L)._3 shouldBe true
    rows(3L)._3 shouldBe false
    rows(1L)._3 shouldBe false
    rows(4L)._3 shouldBe true // singleton cluster keeps its only member
    rows(1L)._1 shouldBe rows(3L)._1 // same cluster id across members
    // empty pair set: every document is its own cluster and is kept
    val none = Graft.keepBestPerCluster(df, "uid", "len",
      Seq.empty[(Long, Long)].toDF("pa", "pb"), "pa", "pb")
      .collect()
    none.length shouldBe 4
    all(none.map(_.getBoolean(3))) shouldBe true
  }

  test("deriveNlist: fixed occupancy below the crossover, 4*sqrt(n) past it") {
    // committed fixture sizes resolve to the EXACT layouts the old
    // fixed-occupancy derivation produced (bit-identical gate rows)
    Graft.deriveNlist(500) shouldBe 1
    Graft.deriveNlist(500, floor = 5) shouldBe 5
    Graft.deriveNlist(2000) shouldBe 5
    Graft.deriveNlist(2000, floor = 5) shouldBe 5
    // the 10x/30x/100x scale-run sizes stay in the occupancy regime too
    Graft.deriveNlist(20000) shouldBe 50
    Graft.deriveNlist(60000) shouldBe 150
    Graft.deriveNlist(200000) shouldBe 500
    // crossover at (400 * 4)^2 = 2.56M: past it the count follows
    // 4*sqrt(n), so the assignment pass is O(n^1.5), not O(n^2)/400
    Graft.deriveNlist(2560000) shouldBe 6400
    Graft.deriveNlist(10000000) shouldBe math.round(4 * math.sqrt(1e7)).toInt
    Graft.deriveNlist(1000000000L) shouldBe
      math.round(4 * math.sqrt(1e9)).toInt
    // monotone non-decreasing across the crossover
    val around = Seq(2e6, 2.5e6, 2.56e6, 2.6e6, 3e6, 1e7).map(n =>
      Graft.deriveNlist(n.toLong))
    around shouldBe around.sorted
    an[IllegalArgumentException] should be thrownBy Graft.deriveNlist(-1)
  }

  test("deriveShortlist: covers list occupancy, floors at k, grows " +
      "past the sqrt-n crossover") {
    // fixture scale: occupancy tiny, the k floor rules
    Graft.deriveShortlist(2000, Graft.deriveNlist(2000)) shouldBe 400
    Graft.deriveShortlist(500, 5, k = 50) shouldBe 100
    // the measured 5M case: nlist 8,944, occupancy ~559 — the default
    // 256-class shortlist under-covered (recall 0.713 flat in nProbe);
    // the derived value covers it (0.984 measured at shortlist >= occ)
    val n5m = 5000000L
    val s = Graft.deriveShortlist(n5m, Graft.deriveNlist(n5m))
    s should be >= 559
    s should be <= 600
    // monotone in n at fixed nlist; exact ceiling division
    Graft.deriveShortlist(1001, 10, k = 1) shouldBe 101
    an[IllegalArgumentException] should be thrownBy
      Graft.deriveShortlist(10, 0)
  }

  test("text stats and langId run on the custom schema") {
    Graft.tokenCounts(corpus, "uid", "body").columns shouldBe
      Array("uid", "n_ws", "n_bpe")
    Graft.qualityScore(corpus, "uid", "body").count() shouldBe 5
    val langs = Graft.langId(corpus, "uid", "body",
      Seq("en" -> "the|a|of", "de" -> "der|die|das"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    langs("u1") shouldBe "en"
  }
}
