package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** r17: the append path encodes against FROZEN per-generation state
  * re-embedded as plan literals (zero broadcast-future jobs per
  * micro-batch). These tests pin the two properties that make that
  * optimization safe:
  *
  *  1. the frozen-literal encode is BIT-IDENTICAL to the batch build's
  *     broadcast-join encode — append-grown codes equal a batch build
  *     over the union, row for row, in BOTH assignment regimes (the
  *     HOF fold at fixture nlist and the native kernel above
  *     KernelNlist = 1024);
  *  2. the generation cache holds ONE live entry per index dir — a
  *     publish (retrain/compact) REPLACES the entry instead of
  *     accumulating one per dead generation (the r16-verdict eviction
  *     item), and the post-publish append encodes under the NEW
  *     generation's frozen state. */
class FrozenEncodeSpec extends AnyFunSuite with Matchers {

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

  /** Multiset equality via two-way exceptAll (test scope). */
  private def sameRows(a: DataFrame, b: DataFrame): Unit = {
    val cols = a.columns.toSeq.sorted.map(col)
    val l = a.select(cols: _*)
    val r = b.select(cols: _*)
    withClue("rows only in the grown index: ") {
      l.exceptAll(r).count() shouldBe 0L
    }
    withClue("rows only in the batch build: ") {
      r.exceptAll(l).count() shouldBe 0L
    }
  }

  test("PQ append-grown codes are bit-identical to the batch build " +
      "over the union (HOF assignment regime, payload carried)") {
    val a = mkCorpus(0 until 250, seed = 71)
    val b = mkCorpus(250 until 400, seed = 72)
    val union = a.unionByName(b)
    val dir = java.nio.file.Files
      .createTempDirectory("frozen-pq").toString
    val built = Graft.ivfPqBuild(union, "vec_id", "embedding",
      dim = Dim, nlist = 6, m = 4, ksub = 8, iters = 1,
      payload = Seq("lang"))
    val pinned = built.copy(enc = built.enc.localCheckpoint(true))
    val seed = pinned.enc.filter(col("vec_id") < 250)
    Graft.ivfPqSave(pinned.copy(enc = seed), dir, buckets = 4)
    // two appends so the second hits the warm cache entry
    Graft.ivfPqAppend(spark, dir,
      b.filter(col("vec_id") < 320), "embedding")
    Graft.ivfPqAppend(spark, dir,
      b.filter(col("vec_id") >= 320), "embedding")
    val grown = Graft.ivfPqLoad(spark, dir).enc.drop("bucket")
    sameRows(grown, pinned.enc)
  }

  test("PQ frozen encode stays bit-identical in the KERNEL assignment " +
      "regime (nlist above KernelNlist = 1024)") {
    val a = mkCorpus(0 until 2400, seed = 81)
    val union = a
    val dir = java.nio.file.Files
      .createTempDirectory("frozen-pq-kernel").toString
    val built = Graft.ivfPqBuild(union, "vec_id", "embedding",
      dim = Dim, nlist = 1100, m = 4, ksub = 8, iters = 0)
    val pinned = built.copy(enc = built.enc.localCheckpoint(true))
    val seed = pinned.enc.filter(col("vec_id") < 1200)
    Graft.ivfPqSave(pinned.copy(enc = seed), dir, buckets = 4)
    Graft.ivfPqAppend(spark, dir,
      union.filter(col("vec_id") >= 1200)
        .select("vec_id", "embedding"), "embedding")
    val grown = Graft.ivfPqLoad(spark, dir).enc.drop("bucket")
    sameRows(grown, pinned.enc)
  }

  test("SQ append-grown codes are bit-identical to the batch build " +
      "over the union") {
    val a = mkCorpus(0 until 250, seed = 91)
    val b = mkCorpus(250 until 400, seed = 92)
    val union = a.unionByName(b)
    val dir = java.nio.file.Files
      .createTempDirectory("frozen-sq").toString
    val built = Graft.ivfSqBuild(union, "vec_id", "embedding",
      nlist = 6, iters = 1, payload = Seq("lang"))
    val pinned = built.copy(enc = built.enc.localCheckpoint(true))
    val seed = pinned.enc.filter(col("vec_id") < 250)
    Graft.ivfSqSave(pinned.copy(enc = seed), dir, buckets = 4)
    Graft.ivfSqAppend(spark, dir,
      b.filter(col("vec_id") < 320), "embedding")
    Graft.ivfSqAppend(spark, dir,
      b.filter(col("vec_id") >= 320), "embedding")
    val grown = Graft.ivfSqLoad(spark, dir).enc.drop("bucket")
    sameRows(grown, pinned.enc)
  }

  test("pqEncodeFrozen is bit-identical to the retained broadcast-join " +
      "reference (pqEncodeAgainst) on the same trained state — the " +
      "value-equality argument the r17 literal-plan encode rests on") {
    val corpus = mkCorpus(0 until 400, seed = 111)
    val built = Graft.ivfPqBuild(corpus, "vec_id", "embedding",
      dim = Dim, nlist = 6, m = 4, ksub = 8, iters = 1,
      payload = Seq("lang"))
    val reference = Graft.pqEncodeAgainst(corpus, "vec_id", "embedding",
      built.cents, built.lookup, Dim, 4, 8, 6, Seq("lang"))
    sameRows(built.enc, reference)
  }

  test("sqEncodeFrozen is bit-identical to the retained broadcast-join " +
      "reference (sqEncodeAgainst) on the same trained state") {
    val corpus = mkCorpus(0 until 400, seed = 121)
    val built = Graft.ivfSqBuild(corpus, "vec_id", "embedding",
      nlist = 6, iters = 1, payload = Seq("lang"))
    val reference = Graft.sqEncodeAgainst(corpus, "vec_id", "embedding",
      built.cents, 6, Seq("lang"))
    sameRows(built.enc, reference)
  }

  test("the generation cache keeps ONE live entry per dir: a retrain " +
      "publish evicts the dead generation's entry and the next append " +
      "encodes under the new generation (r16-verdict eviction item)") {
    val a = mkCorpus(0 until 200, seed = 101)
    val b = mkCorpus(200 until 300, seed = 102)
    val c = mkCorpus(300 until 360, seed = 103)
    val dir = java.nio.file.Files
      .createTempDirectory("frozen-evict").toString
    Graft.ivfPqSave(Graft.ivfPqBuild(a, "vec_id", "embedding",
      dim = Dim, nlist = 4, m = 4, ksub = 8, iters = 1), dir,
      buckets = 4)
    Graft.ivfPqAppend(spark, dir,
      b.select("vec_id", "embedding"), "embedding")
    val gen1 = Graft.resolveIndexTree(spark, dir)
    Graft.frozenIdxCachedTrees(dir) shouldBe Seq(gen1)
    // publish: fresh generation, dead entry must be REPLACED not joined
    Graft.ivfPqRetrain(spark, dir,
      a.unionByName(b).select("vec_id", "embedding"), "embedding",
      iters = 1)
    val gen2 = Graft.resolveIndexTree(spark, dir)
    gen2 should not be gen1
    Graft.ivfPqAppend(spark, dir,
      c.select("vec_id", "embedding"), "embedding")
    Graft.frozenIdxCachedTrees(dir) shouldBe Seq(gen2)
    // the post-publish append landed on the new generation and the
    // index serves all 360 rows
    Graft.ivfPqLoad(spark, dir).enc.count() shouldBe 360L
  }
}
