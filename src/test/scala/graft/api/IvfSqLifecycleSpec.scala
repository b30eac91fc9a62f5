package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The SQ-family lifecycle ([[Graft.ivfSqAppend]] /
  * [[Graft.ivfSqIndexStats]] / [[Graft.ivfSqCompact]] /
  * [[Graft.ivfSqRetrain]]) + payload filters — PqLifecycleSpec's
  * contracts on the machinery the two families share, plus the one
  * property unique to SQ: appends are the PURE Faiss `add` case (no
  * codebooks — nothing frozen-but-stale beyond the quantizer). */
class IvfSqLifecycleSpec extends AnyFunSuite with Matchers {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Dim = 16

  private def mkCorpus(ids: Range, seed: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    ids.map { i =>
      val v = Array.fill(Dim)((rnd.nextGaussian() + 0.1).toFloat)
      (i.toLong, v, if (i % 3 == 0) "en" else "de")
    }.toDF("vec_id", "embedding", "lang")
  }

  private def search(idx: Graft.IvfSqIndex, corpus: DataFrame,
      shortlist: Int, filter: Option[org.apache.spark.sql.Column] = None)
      : Seq[(Long, Long, Long)] = {
    import spark.implicits._
    val queries = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding"))
    Graft.ivfSqSearch(idx, queries, "qid", "embedding",
      corpus, "embedding", k = 4, nProbe = idx.nlist,
      shortlist = shortlist, filter = filter)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
  }

  test("append-grown SQ index serves identically to a batch build " +
      "over the union; payload filters work on appended rows; stats + " +
      "advice drive compact and retrain under the persisted rule") {
    val a = mkCorpus(0 until 100, seed = 71)
    val b = mkCorpus(100 until 400, seed = 72)
    val union = a.unionByName(b)
    val dir = java.nio.file.Files
      .createTempDirectory("sq-lifecycle").toString
    val Vpl = 25
    Graft.ivfSqSave(Graft.ivfSqBuild(a, "vec_id", "embedding",
      nlist = 4, iters = 1, payload = Seq("lang")),
      dir, buckets = 4, vectorsPerList = Vpl)

    // frozen growth in 3 appends — the training-free add
    Seq(0, 1, 2).foreach(i =>
      Graft.ivfSqAppend(spark, dir,
        b.filter(pmod(col("vec_id"), lit(3)) === i), "embedding"))

    val loaded = Graft.ivfSqLoad(spark, dir)
    loaded.rows shouldBe 400L
    loaded.enc.count() shouldBe 400L
    // full-coverage probe == batch build over the union (exact rerank)
    val expected = search(Graft.ivfSqBuild(union, "vec_id", "embedding",
      nlist = 4, iters = 1, payload = Seq("lang")), union,
      shortlist = 400)
    search(loaded, union, shortlist = 400) shouldBe expected
    // payload filter: every neighbor matches, including appended rows
    val en = union.filter(col("lang") === "en")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    search(loaded, union, shortlist = 400,
      filter = Some(col("lang") === "en"))
      .map(_._2).foreach(nb => en should contain(nb))
    // a batch missing the payload column fails by name
    intercept[IllegalArgumentException] {
      Graft.ivfSqAppend(spark, dir, b.drop("lang"), "embedding")
    }.getMessage should include("lang")

    // stats at DEFAULTS read the persisted rule; the 4x growth fires
    // the outgrown trigger
    val stats = Graft.ivfSqIndexStats(spark, dir)
    stats.rows shouldBe 400L
    stats.quantizerLists shouldBe Some(4)
    stats.targetNlist shouldBe Graft.deriveNlist(400L, Vpl) // = 16
    Graft.maintenanceAdvice(stats).outgrown shouldBe true

    // compact: files bounded, serving identical
    val c = Graft.ivfSqCompact(spark, dir)
    c.rows shouldBe 400L
    c.filesAfter should be <= 4
    search(Graft.ivfSqLoad(spark, dir), union, shortlist = 400) shouldBe
      expected

    // retrain at DEFAULTS re-derives under the persisted rule, keeps
    // payload, and the retrained index still serves the exact top-k
    val rt = Graft.ivfSqRetrain(spark, dir, union, "embedding",
      iters = 1)
    rt.nlistBefore shouldBe 4
    rt.nlistAfter shouldBe Graft.deriveNlist(400L, Vpl)
    val retrained = Graft.ivfSqLoad(spark, dir)
    search(retrained, union, shortlist = 400) shouldBe expected
    search(retrained, union, shortlist = 400,
      filter = Some(col("lang") === "en"))
      .map(_._2).foreach(nb => en should contain(nb))
    Graft.maintenanceAdvice(Graft.ivfSqIndexStats(spark, dir))
      .outgrown shouldBe false
  }

  test("the dim guard survives appends: the meta rewrite preserves " +
      "dim, so a wrong-width batch still fails AFTER a first append " +
      "(r14 advice), and a mixed-width batch fails the aggregate check") {
    import spark.implicits._
    val a = mkCorpus(0 until 60, seed = 81)
    val dir = java.nio.file.Files
      .createTempDirectory("sq-dim-guard").toString
    Graft.ivfSqSave(Graft.ivfSqBuild(a, "vec_id", "embedding",
      nlist = 2, iters = 1, payload = Seq("lang")), dir, buckets = 2)

    // first GOOD append rewrites meta — dim must survive the rewrite
    Graft.ivfSqAppend(spark, dir, mkCorpus(60 until 90, seed = 82),
      "embedding")
    Graft.ivfSqLoad(spark, dir).dim shouldBe Dim

    // second append at the wrong width must STILL throw
    val rnd = new scala.util.Random(83)
    val narrow = (90 until 95).map(i =>
      (i.toLong, Array.fill(Dim / 2)(rnd.nextGaussian().toFloat), "en"))
      .toDF("vec_id", "embedding", "lang")
    intercept[IllegalArgumentException] {
      Graft.ivfSqAppend(spark, dir, narrow, "embedding")
    }.getMessage should include("dimension")

    // a batch whose FIRST row has the right width but a later row does
    // not fails the min/max aggregate (head() would have passed it)
    val mixed = (95 until 99).map { i =>
      val d = if (i == 95) Dim else Dim / 2
      (i.toLong, Array.fill(d)(rnd.nextGaussian().toFloat), "de")
    }.toDF("vec_id", "embedding", "lang")
    intercept[IllegalArgumentException] {
      Graft.ivfSqAppend(spark, dir, mixed, "embedding")
    }.getMessage should include("dimension")
  }

  test("ivfSqBuild rejects an empty corpus explicitly and a " +
      "mixed-width corpus by aggregate") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float], String)]
      .toDF("vec_id", "embedding", "lang")
    intercept[IllegalArgumentException] {
      Graft.ivfSqBuild(empty, "vec_id", "embedding", nlist = 2,
        iters = 1)
    }.getMessage should include("empty corpus")
    val rnd = new scala.util.Random(84)
    val mixed = (0 until 40).map { i =>
      val d = if (i % 7 == 0) Dim / 2 else Dim
      (i.toLong, Array.fill(d)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Graft.ivfSqBuild(mixed, "vec_id", "embedding", nlist = 2,
        iters = 1)
    }.getMessage should include("mixed dimensions")
  }

  test("ivfSqDirAppender autopilot: advice-driven retrain fires " +
      "unprompted mid-ingest, later appends land in the new " +
      "generation, and serving stays exact") {
    import spark.implicits._
    val full = mkCorpus(0 until 300, seed = 95)
    val dir = java.nio.file.Files
      .createTempDirectory("sq-autopilot").toString
    val rawDir = java.nio.file.Files
      .createTempDirectory("sq-autopilot-raw").toString
    val Vpl = 30
    val seed = full.filter(col("vec_id") < 100)
    seed.write.mode("overwrite").parquet(rawDir)
    // nlist0 = 3; outgrown (target >= 6) fires at rows >= 165 —
    // batch 3 of 5 under 40-row batches
    Graft.ivfSqSave(Graft.ivfSqBuild(seed, "vec_id", "embedding",
      nlist = 3, iters = 1, payload = Seq("lang")),
      dir, buckets = 4, vectorsPerList = Vpl)
    def gen(): String = new org.apache.hadoop.fs.Path(
      Graft.resolveIndexTree(spark, dir)).getName
    val seedGen = gen()
    val appender = Graft.ivfSqDirAppender(spark, dir, "embedding",
      vectors = () => spark.read.parquet(rawDir),
      maintainEvery = 1, iters = 1)
    val genAt = scala.collection.mutable.ArrayBuffer[String]()
    (0 until 5).foreach { i =>
      val batch = full
        .filter(col("vec_id") >= 100 + i * 40 &&
          col("vec_id") < 100 + (i + 1) * 40)
        .localCheckpoint(true)
      batch.write.mode("append").parquet(rawDir)
      appender(batch, i.toLong)
      genAt += gen()
    }
    // retrain fired unprompted, strictly before the last batch
    val firstChange = genAt.indexWhere(_ != seedGen)
    firstChange should be >= 0
    firstChange should be < genAt.size - 1
    val loaded = Graft.ivfSqLoad(spark, dir)
    loaded.rows shouldBe 300L // post-swap appends landed
    loaded.nlist should be >= 6 // re-derived width
    // serving stays exact at full coverage
    val expected = search(Graft.ivfSqBuild(full, "vec_id", "embedding",
      nlist = 3, iters = 1, payload = Seq("lang")), full,
      shortlist = 300)
    search(loaded, full, shortlist = 300) shouldBe expected
  }

  test("a crashed pointer swap does not lose the grace generation: " +
      "the next save keeps the newest complete generation for one " +
      "cycle (r14 advice)") {
    val a = mkCorpus(0 until 60, seed = 91)
    val dir = java.nio.file.Files
      .createTempDirectory("sq-crash-swap").toString
    def gens(): Set[String] = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
      .map(_.getName).toSet
    def current(): String = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "CURRENT")), "UTF-8").trim

    Graft.ivfSqSave(Graft.ivfSqBuild(a, "vec_id", "embedding",
      nlist = 2, iters = 1), dir, buckets = 2)
    val genA = current()
    Graft.ivfSqSave(Graft.ivfSqBuild(a, "vec_id", "embedding",
      nlist = 2, iters = 1), dir, buckets = 2)
    val genB = current()
    gens() shouldBe Set(genA, genB) // genA is the live grace copy

    // crash INSIDE the swap: CURRENT deleted, rename never happened —
    // in-flight readers still hold frames of genB (newest complete)
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "CURRENT"))
    Graft.ivfSqSave(Graft.ivfSqBuild(a, "vec_id", "embedding",
      nlist = 2, iters = 1), dir, buckets = 2)
    val genC = current()
    // genB (the generation readers could hold) MUST survive this save;
    // genA (a full cycle stale) is reclaimed
    gens() shouldBe Set(genB, genC)
  }
}
