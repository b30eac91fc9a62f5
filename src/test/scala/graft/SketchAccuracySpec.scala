package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Accuracy contracts for the approximate queries, asserted on the raw
  * listings (the gate entries emit oracle-checked contract rows instead):
  * HLL distinct within its rsd bound, and the ANN variants' recall
  * against the exact brute-force top-k.
  */
class SketchAccuracySpec extends AnyFunSuite with Matchers {

  private val sfDir = "/root/testdata/sf0.01"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.run(spark, sfDir)

  test("a27: HLL approx distinct within 3x the default 5% rsd of exact") {
    // Independent recomputation (the a27 gate query now folds this bound
    // into its own output as oracle-checked booleans).
    val li = Tables.load(spark, sfDir, "lineitem")
    val both = li.agg(
      approx_count_distinct(col("l_partkey")), countDistinct(col("l_partkey")),
      approx_count_distinct(col("l_suppkey")), countDistinct(col("l_suppkey")))
      .collect().head
    for (i <- Seq(0, 2)) {
      val (a, e) = (both.getLong(i).toDouble, both.getLong(i + 1))
      withClue(s"col $i approx=$a exact=$e: ")(
        math.abs(a - e) / e should be < 0.15)
    }
    // and the gate row agrees: both contract booleans true
    val gate = run("a27_approx_distinct").collect().head
    gate.getBoolean(2) shouldBe true
    gate.getBoolean(3) shouldBe true
  }

  test("approx_percentile tracks a28's exact percentiles (the documented " +
    "100 TB swap)") {
    import org.apache.spark.sql.functions._
    val li = Tables.load(spark, sfDir, "lineitem")
    val approx = li.groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_quantity, 0.5, 10000)").as("ap"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, v) =>
      withClue(s"median($k): ")(math.abs(approx(k) - v) should be <= 1.0)
    }
  }

  test("d02: k=24 minhash estimate tracks d04's exact n-gram jaccard") {
    // d02 dropped from 32 to 24 permutations for the signature-stage cost;
    // this is the re-validated estimation bound: the LSH pair set must
    // still equal the exact-jaccard pair set on the fixture, and the
    // estimate must stay within 0.15 of the true jaccard (observed max
    // deviation 0.058; binomial std at k=24, j=0.5 is ~0.10).
    val est = run("d02_minhash_lsh").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val exact = run("d04_ngram_jaccard").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    est.keySet shouldBe exact.keySet
    exact.foreach { case (pair, jac) =>
      withClue(s"pair $pair est=${est(pair)} jac=$jac: ")(
        math.abs(est(pair) - jac) should be < 0.15)
    }
  }

  test("d17: minhash containment estimate tracks d14's exact containment " +
    "on shared pairs") {
    // d17's estimate composes the k=24 jaccard estimate with exact
    // shingle counts, so its error bound follows d02's: compare on the
    // pairs BOTH ops emit (d17's banding misses small-in-big inclusions
    // by design — recall is documented, accuracy is asserted here).
    val est = run("d17_containment_minhash").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val exact = graft.api.Graft.containmentPairs(
      Tables.load(spark, sfDir, "documents"), "doc_id", "text",
      threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        math.min(1.0, r.getDouble(2)))).toMap
    val shared = est.keySet.intersect(exact.keySet)
    shared should not be empty
    shared.foreach { pair =>
      withClue(s"pair $pair est=${est(pair)} exact=${exact(pair)}: ")(
        math.abs(est(pair) - exact(pair)) should be < 0.2)
    }
  }

  test("d18: bottom-k containment finds the constructed A⊂B inclusions " +
    "exactly where d17's symmetric banding misses them") {
    // The recall contract the r8 verdict asked for: on strict
    // small-in-big inclusions (fragment = first 12 words of a >= 40-word
    // document, |A|≪|B|), the bottom-k sketch must recover what exact
    // d14 finds — and the documented reason d18 exists is that d17's
    // band collisions fade as |B|/|A| grows, so its recall on the same
    // pairs should be poor.
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val frags = docs
      .filter(org.apache.spark.sql.functions.size(
        split(col("text"), " ")) >= 40)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 12)).as("text"))
    val corpus = docs.unionByName(frags)
    def fragPairs(pairs: Array[((Long, Long), Double)]) =
      pairs.collect { case ((a, b), c)
        if a >= 1000000L && b < 1000000L => ((a, b), c) }.toMap
    // ground truth: exact containment (d14's op) on the augmented corpus,
    // restricted to fragment -> original pairs
    val exact = fragPairs(graft.api.Graft.containmentPairs(
      corpus, "doc_id", "text", threshold = 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        math.min(1.0, r.getDouble(2)))))
    exact.size should be > 100 // the construction really made inclusions
    val sketch = fragPairs(graft.api.Graft.bottomKContainmentPairs(
      corpus, "doc_id", "text", n = 3, k = 16, threshold = 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))))
    val recall = exact.keySet.count(sketch.contains).toDouble / exact.size
    withClue(s"bottom-k recall on ${exact.size} strict inclusions: ") {
      recall should be >= 0.95
    }
    // a strict inclusion's sketch is found IN FULL (every sampled hash
    // of A is in B), so the estimate is exactly 1.0 there
    val strict = exact.filter { case ((a, b), _) => b == a - 1000000L }
    strict.keySet.foreach { p =>
      withClue(s"fragment-of-source pair $p: ")(
        sketch.getOrElse(p, 0.0) shouldBe 1.0)
    }
    // the hole being closed: symmetric banding (d17) misses most of
    // these pairs — if this ever starts PASSING well, d18's premise
    // should be re-examined, so assert the miss explicitly
    val d17 = fragPairs(graft.api.Graft.containmentMinhashPairs(
      Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("text")).unionByName(frags),
      "doc_id", "text", k = 24, bands = 8, threshold = 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))))
    val d17Recall = exact.keySet.count(d17.contains).toDouble / exact.size
    withClue(s"d17 recall ${d17Recall} vs d18 ${recall}: ") {
      d17Recall should be < (recall - 0.4)
    }
  }

  test("d06: LSH-candidate near-dup recovers most of d05's exact pairs") {
    val exact = run("d05_embed_cosine_dup").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // The pair set now comes from the API (the d06 gate query emits the
    // aggregated contract row instead of the listing).
    val approx = graft.api.Graft
      .lshCosinePairs(Tables.load(spark, sfDir, "embeddings"), "vec_id",
        "embedding", threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH candidates are a subset of all pairs: no false positives
    // (the exact cosine filter runs on candidates), only missed recall.
    (approx -- exact) shouldBe empty
    val recall = (approx & exact).size.toDouble / exact.size
    withClue(s"d06 recall vs exact near-dup pairs: ")(recall should be >= 0.5)
    // and the gate contract row agrees
    val gate = run("d06_embed_cosine_lsh").collect().head
    gate.getLong(0) shouldBe exact.size.toLong // n_exact
    gate.getLong(1) shouldBe 0L                // false_positives
    gate.getBoolean(2) shouldBe true           // recall_ok
  }

  test("d12: semantic-dedup pairs are a subset of exact pairs and " +
    "2-probe clustering recovers most of them") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val exact = graft.api.Graft
      .cosinePairsExact(emb, "vec_id", "embedding", threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = graft.api.Graft
      .semanticDedupPairs(emb, "vec_id", "embedding",
        nlist = 5, iters = 2, threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // within-cluster exact cosine -> no false positives, ever
    (sem -- exact) shouldBe empty
    val recall = (sem & exact).size.toDouble / exact.size
    withClue(s"d12 recall vs exact pairs: ")(recall should be >= 0.6)
    // and the gate contract row agrees
    val gate = run("d12_semantic_dedup").collect().head
    gate.getLong(0) shouldBe exact.size.toLong // n_exact
    gate.getLong(1) shouldBe 0L                // false_positives
    gate.getBoolean(2) shouldBe true           // recall_ok
  }

  test("d12 hot clusters: a dominant cluster is auto-sub-clustered, " +
    "bounding block occupancy without losing exact near-dups") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    // 200 vectors, 16-dim: half sit in ONE tight region (the dominant
    // cluster), half are spread. Ten planted exact-duplicate pairs live
    // inside the hot region (ids 2k == 2k+1 for k < 10).
    val hotBase = Array.fill(16)(1.0f)
    def jit(eps: Float) = hotBase.map(v => v + (rnd.nextFloat() - 0.5f) * eps)
    val hotVecs: Seq[(Long, Seq[Float])] = (0 until 100).map { i =>
      if (i < 20 && i % 2 == 1) (i.toLong, null) // filled below from twin
      else (i.toLong, jit(0.05f).toSeq)
    }
    val byId = hotVecs.toMap
    val hot = (0 until 100).map { i =>
      if (i < 20 && i % 2 == 1) (i.toLong, byId((i - 1).toLong))
      else (i.toLong, byId(i.toLong))
    }
    val spread = (100 until 200).map { i =>
      (i.toLong, Array.fill(16)((rnd.nextFloat() - 0.5f) * 2f).toSeq)
    }
    val df = (hot ++ spread).toDF("id", "vec")
    // containment bounds occupancy: the hot list (~half the corpus,
    // x2 with probes) splits into ~mean-sized sub-blocks. The skewed
    // assignment is CONSTRUCTED (hot cluster -> list 0, spread rows ->
    // lists 1-3): this test exercises containHotClusters' mechanics,
    // and deriving the skew through kmeans made it hostage to init
    // quality — the r13 point-init improvement splits this fixture
    // well enough that no list trips the hot threshold at all.
    val assigned = df
      .withColumn("list_id",
        when(col("id") < 120, 0).otherwise(pmod(col("id"), lit(3)) + 1))
      .select(col("id"), col("vec"), col("list_id"))
    val before = assigned.groupBy("list_id").count()
      .collect().map(_.getLong(1))
    val contained = graft.api.Graft
      .containHotClusters(assigned, "id", "vec", hotFactor = 2.0)
    val after = contained.groupBy("block_id").count()
      .collect().map(_.getLong(1))
    withClue(s"block sizes before ${before.toSeq} after ${after.toSeq}: ") {
      after.max should be < before.max
      // every row kept exactly once (split re-keys, never drops)
      after.sum shouldBe before.sum
    }
    // end-to-end: the skew-contained pipeline still has NO false
    // positives and still finds every planted exact-dup pair (identical
    // vectors always land in the same sub-block: same argmax)
    val exact = graft.api.Graft
      .cosinePairsExact(df, "id", "vec", threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = graft.api.Graft
      .semanticDedupPairs(df, "id", "vec", nlist = 4, iters = 2,
        threshold = 0.999, probes = 2, hotFactor = 2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (sem -- exact) shouldBe empty
    val planted = (0 until 10).map(k => (2L * k, 2L * k + 1)).toSet
    (planted -- sem) shouldBe empty
  }

  test("s02/s03/s04: approximate neighbors overlap the exact top-k, " +
    "and the gate contract rows hold") {
    val exact = run("s01_cosine_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val listings = Seq(
      "s02_ann_lsh" -> graft.ops.Vector.lshListing(spark, sfDir),
      "s03_ann_ivf" -> graft.ops.Vector.ivfLabelListing(spark, sfDir),
      "s04_ann_ivf_trained" ->
        graft.ops.Vector.ivfTrainedListing(spark, sfDir),
      "s10_pq_topk" -> graft.ops.Vector.pqListing(spark, sfDir),
      "s11_ivfpq_topk" -> graft.ops.Vector.ivfpqListing(spark, sfDir),
      "s13_sq_topk" -> graft.ops.Vector.sqListing(spark, sfDir))
    // Per-index floors, recalibrated for the r13 point-init quantizer
    // (hash-Forgy seeding): on this 500-vector NEAR-ISOTROPIC fixture,
    // top-k membership is substantially a tie lottery (the r11
    // adjudication that motivated the margin slice), so the fixture
    // recall moves with any index-definition change — the floors here
    // are regression tripwires at the measured values minus a small
    // band, NOT quality claims. Quality claims live where geometry is
    // real: the margin-slice sweep (SCALE.md) reads s11 recall 1.000
    // at nProbe 16/64/256 under the same init, and the 1M init A/B
    // measured hash-Forgy at 2,475/2,500 usable lists vs mean-init's
    // 1,337 with occupancy p99 halved — the change this recalibration
    // pays for.
    val floors = Map("s11_ivfpq_topk" -> 0.4).withDefaultValue(0.5)
    for ((name, df) <- listings) {
      val approx = df.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (approx & exact).size.toDouble / exact.size
      info(s"$name recall = $recall")
      withClue(s"$name recall vs exact top-k: ")(
        recall should be >= floors(name))
      // The gate entry now emits the per-query structural contract; it
      // must hold for every query (one row each, all invariants true).
      val gate = run(name).collect()
      withClue(s"$name contract rows: ")(gate.length shouldBe 8)
      for (r <- gate) {
        withClue(s"$name query ${r.getLong(0)}: ") {
          r.getLong(1) shouldBe 5L  // n_ret
          r.getLong(2) shouldBe 15L // rnk_sum = 1+..+5
          r.getLong(3) shouldBe 5L  // n_distinct
          r.getBoolean(4) shouldBe true // self_excluded
          r.getBoolean(5) shouldBe true // cos_bounded
          r.getBoolean(6) shouldBe true // ranked_desc
        }
      }
    }
  }

  test("s04: Lloyd training does not degrade the quantizer") {
    import graft.api.Graft
    val emb = Tables.load(spark, sfDir, "embeddings")
    // quantizer quality = mean cosine between each vector and its
    // assigned centroid (higher is tighter lists -> better probes)
    def quality(cents: org.apache.spark.sql.DataFrame): Double = {
      val assigned = Graft.assignToCentroids(emb, "vec_id", "embedding",
        cents)
      val cn = cents.select(col("list_id").as("cl"), col("centroid"),
        sqrt(graft.functions.VectorExpressions
          .dotF32(col("centroid"), col("centroid"))).as("cnrm"))
      assigned
        .join(cn, col("list_id") === col("cl"))
        .select((graft.functions.VectorExpressions
          .dotF32(col("embedding"), col("centroid")) /
          (sqrt(graft.functions.VectorExpressions
            .dotF32(col("embedding"), col("embedding"))) * col("cnrm")))
          .as("c"))
        .agg(avg("c")).head().getDouble(0)
    }
    val untrained = quality(
      Graft.kmeansCentroids(emb, "vec_id", "embedding", nlist = 10, iters = 0))
    val trained = quality(
      Graft.kmeansCentroids(emb, "vec_id", "embedding", nlist = 10, iters = 2))
    withClue(s"untrained=$untrained trained=$trained: ")(
      trained should be >= untrained - 1e-9)
  }
}
