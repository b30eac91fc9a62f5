package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Lifecycle of the SAVED IVF-PQ layout (r13 verdict item 1):
  * [[Graft.ivfPqAppend]] (frozen-codebook growth, Faiss `add`),
  * [[Graft.ivfPqIndexStats]] + [[Graft.maintenanceAdvice]] (the shared
  * decision surface), [[Graft.ivfPqCompact]] (fragmentation), and
  * [[Graft.ivfPqRetrain]] (rebuild + atomic swap). */
class PqLifecycleSpec extends AnyFunSuite with Matchers {

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

  private def search(idx: Graft.IvfPqIndex, corpus: DataFrame,
      shortlist: Int, filter: Option[org.apache.spark.sql.Column] = None)
      : Seq[(Long, Long, Long)] = {
    import spark.implicits._
    val queries = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding"))
    Graft.ivfPqSearch(idx, queries, "qid", "embedding",
      corpus, "embedding", k = 4, nProbe = idx.nlist,
      shortlist = shortlist, filter = filter)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
  }

  test("append-grown index serves identically to a batch build over " +
      "the union (full-coverage probe), and existing code files never " +
      "rewrite") {
    val a = mkCorpus(0 until 300, seed = 11)
    val b = mkCorpus(300 until 400, seed = 12)
    val union = a.unionByName(b)
    val dir = java.nio.file.Files
      .createTempDirectory("pq-append").toString
    val built = Graft.ivfPqBuild(a, "vec_id", "embedding", dim = Dim,
      nlist = 6, m = 4, ksub = 8, iters = 1, payload = Seq("lang"))
    Graft.ivfPqSave(built, dir, buckets = 4)

    // snapshot the seed code files: an append may only ADD files
    // (resolved through the generation pointer)
    def codeFiles(): Map[String, Long] = {
      val codesDir = new java.io.File(
        s"${Graft.resolveIndexTree(spark, dir)}/codes.parquet")
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(codesDir).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.length()).toMap
    }
    val seedFiles = codeFiles()

    val stats = Graft.ivfPqAppend(spark, dir, b, "embedding")
    stats.appended shouldBe 100L
    stats.rowsAfter shouldBe 400L

    val after = codeFiles()
    seedFiles.foreach { case (p, len) =>
      withClue(s"seed code file $p changed by the append:") {
        after.get(p) shouldBe Some(len)
      }
    }
    after.size should be > seedFiles.size

    val loaded = Graft.ivfPqLoad(spark, dir)
    loaded.rows shouldBe 400L
    loaded.enc.count() shouldBe 400L
    // full-coverage probe (every list, shortlist = corpus) reranks
    // exactly — the grown index must return the union's exact top-k
    search(loaded, union, shortlist = 400) shouldBe
      search(Graft.ivfPqBuild(union, "vec_id", "embedding", dim = Dim,
        nlist = 6, m = 4, ksub = 8, iters = 1, payload = Seq("lang")),
        union, shortlist = 400)
    // payload filters keep working on appended rows
    val en = union.filter(col("lang") === "en")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val filtered = search(loaded, union, shortlist = 400,
      filter = Some(col("lang") === "en"))
    filtered.map(_._2).foreach(nb => en should contain(nb))
    // a batch missing the index's payload column fails by name
    val e = intercept[IllegalArgumentException] {
      Graft.ivfPqAppend(spark, dir, b.drop("lang"), "embedding")
    }
    e.getMessage should include("lang")
  }

  test("stats + advice drive compact and retrain; the swap preserves " +
      "serving") {
    val a = mkCorpus(0 until 100, seed = 21)
    val b = mkCorpus(100 until 400, seed = 22)
    val union = a.unionByName(b)
    val dir = java.nio.file.Files
      .createTempDirectory("pq-retrain").toString
    val Vpl = 25
    val nlist0 = Graft.deriveNlist(100L, Vpl) // = 4
    nlist0 shouldBe 4
    Graft.ivfPqSave(Graft.ivfPqBuild(a, "vec_id", "embedding",
      dim = Dim, nlist = nlist0, m = 4, ksub = 8, iters = 1),
      dir, buckets = 4)

    // grow 4x in several appends — fragmentation + quantizer outgrowth
    Seq(0, 1, 2).foreach(i =>
      Graft.ivfPqAppend(spark, dir,
        b.filter(pmod(col("vec_id"), lit(3)) === i)
          .select("vec_id", "embedding"), "embedding"))

    val stats = Graft.ivfPqIndexStats(spark, dir, vectorsPerList = Vpl)
    stats.rows shouldBe 400L
    stats.buckets shouldBe 4
    stats.quantizerLists shouldBe Some(nlist0)
    stats.targetNlist shouldBe Graft.deriveNlist(400L, Vpl) // = 16
    val advice = Graft.maintenanceAdvice(stats)
    advice.outgrown shouldBe true // 16 >= 2 * 4
    // fragmentation arm (tight cap: file counts per append depend on
    // task layout, but seed + 3 appends is always > 1 file per bucket)
    Graft.maintenanceAdvice(stats, maxFilesPerBucket = 1)
      .compact shouldBe true

    // compact first: files back to <= buckets, rows preserved, serving
    // identical
    val preCompact = search(Graft.ivfPqLoad(spark, dir), union,
      shortlist = 400)
    val cStats = Graft.ivfPqCompact(spark, dir)
    cStats.rows shouldBe 400L
    cStats.filesAfter should be <= 4
    cStats.filesAfter should be < cStats.filesBefore
    search(Graft.ivfPqLoad(spark, dir), union, shortlist = 400) shouldBe
      preCompact

    // advice-driven retrain: width re-derives from the CURRENT corpus
    val rt = Graft.ivfPqRetrain(spark, dir, union, "embedding",
      vectorsPerList = Vpl)
    rt.nlistBefore shouldBe nlist0
    rt.nlistAfter shouldBe 16
    rt.rows shouldBe 400L
    val loaded = Graft.ivfPqLoad(spark, dir)
    loaded.nlist shouldBe 16
    loaded.rows shouldBe 400L
    // retrained index still serves the exact union top-k under full
    // coverage, and the payload columns survived the rebuild
    search(loaded, union, shortlist = 400) shouldBe
      preCompact
    Graft.maintenanceAdvice(Graft.ivfPqIndexStats(spark, dir,
      vectorsPerList = Vpl)).outgrown shouldBe false
  }

  test("the sizing rule persists in the save meta and drives " +
      "stats/retrain DEFAULTS; a stale meta row count self-heals on " +
      "the next append (r14 review)") {
    import spark.implicits._
    val a = mkCorpus(0 until 100, seed = 31)
    val b = mkCorpus(100 until 200, seed = 32)
    val dir = java.nio.file.Files
      .createTempDirectory("pq-meta").toString
    Graft.ivfPqSave(Graft.ivfPqBuild(a, "vec_id", "embedding",
      dim = Dim, nlist = 4, m = 4, ksub = 8, iters = 1),
      dir, buckets = 4, vectorsPerList = 25)
    // no-args stats read the PERSISTED rule (25/list), not the 400
    // default — under the default the trigger below could never fire
    Graft.ivfPqIndexStats(spark, dir).targetNlist shouldBe
      Graft.deriveNlist(100L, 25)
    // simulate a crash between a codes commit and its meta rewrite:
    // the persisted count goes stale
    Seq(("vec_id", 4, Dim, 4, 8, 4, 7L, 25, 4.0))
      .toDF("id_col", "nlist", "dim", "m", "ksub", "buckets", "rows",
        "vectors_per_list", "sqrt_factor")
      .write.mode("overwrite").parquet(
        s"${Graft.resolveIndexTree(spark, dir)}/meta.parquet")
    Graft.ivfPqLoad(spark, dir).rows shouldBe 7L
    // the next append RECOUNTS the committed codes — self-healed, the
    // stale 7 never snowballs into the shortlist derivation
    val st = Graft.ivfPqAppend(spark, dir,
      b.select("vec_id", "embedding"), "embedding")
    st.rowsAfter shouldBe 200L
    Graft.ivfPqLoad(spark, dir).rows shouldBe 200L
    // no-args retrain re-derives under the persisted rule and
    // re-persists it for the next cycle
    Graft.ivfPqRetrain(spark, dir, a.unionByName(b)
        .select("vec_id", "embedding"), "embedding", iters = 1)
      .nlistAfter shouldBe Graft.deriveNlist(200L, 25)
    Graft.ivfPqIndexStats(spark, dir).targetNlist shouldBe
      Graft.deriveNlist(200L, 25)
  }

  test("generational publish: a reader holding the previous " +
      "generation keeps serving through one maintenance cycle — no " +
      "absence window (r14)") {
    val a = mkCorpus(0 until 200, seed = 51)
    val dir = java.nio.file.Files
      .createTempDirectory("pq-gen").toString
    Graft.ivfPqSave(Graft.ivfPqBuild(a, "vec_id", "embedding",
      dim = Dim, nlist = 4, m = 4, ksub = 8, iters = 1),
      dir, buckets = 4)
    val held = Graft.ivfPqLoad(spark, dir)
    val before = search(held, a, shortlist = 200)

    // a retrain swaps the POINTER to a fresh generation — the frames
    // `held` already resolved keep scanning their own complete files
    // (the pre-generational layout deleted them out from under an
    // in-flight reader)
    Graft.ivfPqRetrain(spark, dir, a, "embedding", nlist = 8,
      iters = 1)
    search(held, a, shortlist = 200) shouldBe before
    // a NEW load serves the retrained generation
    val fresh = Graft.ivfPqLoad(spark, dir)
    fresh.nlist shouldBe 8
    search(fresh, a, shortlist = 200) shouldBe before // exact either way
    // the generation `held` reads is reclaimed by the NEXT cycle
    // (grace = one cycle), while `fresh`'s survives it
    Graft.ivfPqCompact(spark, dir)
    search(Graft.ivfPqLoad(spark, dir), a, shortlist = 200) shouldBe
      before
  }

  test("legacy (pre-generational) dirs load; the first save converts " +
      "in place and keeps the legacy tree for one grace cycle") {
    val a = mkCorpus(0 until 120, seed = 61)
    val dir = java.nio.file.Files
      .createTempDirectory("pq-legacy").toString
    Graft.ivfPqSave(Graft.ivfPqBuild(a, "vec_id", "embedding",
      dim = Dim, nlist = 4, m = 4, ksub = 8, iters = 1),
      dir, buckets = 4)
    // flatten to the legacy layout: move the generation's frames to
    // the top level and drop the pointer
    val root = new java.io.File(dir)
    val gen = new java.io.File(
      Graft.resolveIndexTree(spark, dir))
    gen.listFiles().foreach { f =>
      java.nio.file.Files.move(f.toPath,
        new java.io.File(root, f.getName).toPath)
    }
    new java.io.File(root, "CURRENT").delete() shouldBe true
    gen.delete() shouldBe true
    // legacy resolve = the dir itself; loads and serves
    Graft.resolveIndexTree(spark, dir) shouldBe dir
    val legacy = Graft.ivfPqLoad(spark, dir)
    val expected = search(legacy, a, shortlist = 120)
    // first save over the legacy dir converts to generational and
    // keeps the legacy frames (the in-flight readers' grace copy)...
    Graft.ivfPqCompact(spark, dir)
    Graft.resolveIndexTree(spark, dir) should not be dir
    new java.io.File(root, "codes.parquet").exists() shouldBe true
    search(legacy, a, shortlist = 120) shouldBe expected
    search(Graft.ivfPqLoad(spark, dir), a, shortlist = 120) shouldBe
      expected
    // ...and the SECOND save reclaims them
    Graft.ivfPqCompact(spark, dir)
    new java.io.File(root, "codes.parquet").exists() shouldBe false
    search(Graft.ivfPqLoad(spark, dir), a, shortlist = 120) shouldBe
      expected
  }
}
