package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.api.Graft

/** Pins the r16 single-scan [[Graft.curate]] restructure to the r15
  * report semantics: the one-row report must equal the stage-by-stage
  * formulation computed independently here (separate quality/langid
  * passes + semi joins + the per-cluster sum-minus-max branch) — the
  * exact shape curate had before the optimization round. */
class CurateSpec extends AnyFunSuite with Matchers {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val profiles = Seq(
    "en" -> "the|a|of|and|to|in|is",
    "fr" -> "le|la|les|et|de|un|une")

  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      // en, in-band, near-dup pair (9-word docs, 8/9 shingles shared)
      (1L, "the quick brown fox jumps over the lazy dog", "src0"),
      (2L, "the quick brown fox jumps over the lazy cat", "src0"),
      // exact duplicate of 1 (digest dedup removes it before near-dup)
      (3L, "the quick brown fox jumps over the lazy dog", "src1"),
      // en, in-band, unique
      (4L, "a completely different document about the sea and the sky", "src1"),
      // fr (language filter removes)
      (5L, "le chat et le chien et la mer et le ciel et la nuit", "src0"),
      // too short (quality filter removes)
      (6L, "the tiny", "src1"),
      // en, in-band, unique, third source with zero budget
      (7L, "another unique english text with the sea and a boat in it", "src2"))
      .toDF("doc_id", "text", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(col("text")).cast("int"))
  }

  /** The r15 curate formulation, verbatim (minus the shared-loop reuse):
    * the independent reference the restructure must match. */
  private def referenceReport = {
    val df = corpus
    val (minWords, maxWords) = (3L, 20L)
    val budgets = Seq("src0" -> 100L, "src1" -> 100L)
    val idc = col("doc_id")
    val qualIds = Graft.qualityScore(df, "doc_id", "text")
      .filter(col("words").between(minWords, maxWords))
      .select(idc)
    val langIds = Graft.langId(df, "doc_id", "text", profiles)
      .filter(col("pred_lang") === "en")
      .select(idc)
    val s1 = df.join(qualIds, Seq("doc_id"), "left_semi")
      .join(langIds, Seq("doc_id"), "left_semi")
    val exactKeep = Graft.exactDedup(s1, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val s2 = s1.join(exactKeep, Seq("doc_id"), "left_semi")
    val clusters = Graft.dupClusters(s2, "doc_id",
      Graft.minhashLshPairs(s2, "doc_id", "text",
        k = 24, bands = 8, threshold = 0.5),
      "id_a", "id_b")
    val keep = Graft.keepBestFromClusters(s2, "doc_id", "n_chars", clusters)
    val s3 = s2.join(keep.filter(col("kept")).select(idc),
      Seq("doc_id"), "left_semi")
    val perCluster = clusters
      .join(s2.select(idc, col("n_chars").cast("long").as("sz")),
        Seq("doc_id"))
      .groupBy("cluster_id")
      .agg((sum("sz") - max("sz")).as("rm"))
    val mix = Graft.mixtureByBudget(s3, "doc_id", "n_chars", "source",
      budgets)
    def cnt(d: org.apache.spark.sql.DataFrame, as: String) =
      d.agg(count(lit(1)).cast("bigint").as(as))
    cnt(df, "n_input")
      .crossJoin(cnt(qualIds, "n_quality"))
      .crossJoin(cnt(s1, "n_lang"))
      .crossJoin(cnt(s2, "n_exact"))
      .crossJoin(cnt(s3, "n_near"))
      .crossJoin(perCluster.agg(coalesce(sum("rm"), lit(0L))
        .cast("bigint").as("chars_removed_near")))
      .crossJoin(mix.agg(count(lit(1)).cast("bigint").as("n_admitted"),
        coalesce(sum("n_tok"), lit(0L)).cast("bigint")
          .as("tok_admitted")))
  }

  test("curate report equals the stage-by-stage r15 formulation") {
    val got = Graft.curate(corpus, "doc_id", "text", "n_chars", "source",
      profiles, "en", 3L, 20L,
      Seq("src0" -> 100L, "src1" -> 100L)).head()
    val want = referenceReport.head()
    got.schema.fieldNames.toSeq shouldBe Seq("n_input", "n_quality",
      "n_lang", "n_exact", "n_near", "chars_removed_near",
      "n_admitted", "tok_admitted")
    got shouldBe want
    // sanity on the fixture's intent: every stage actually cut something
    got.getLong(0) shouldBe 7L   // n_input
    got.getLong(1) shouldBe 6L   // n_quality (6 in word band)
    got.getLong(2) shouldBe 5L   // n_lang (fr doc dropped)
    got.getLong(3) shouldBe 4L   // n_exact (doc 3 deduped)
    got.getLong(4) shouldBe 3L   // n_near (doc 2 clustered under 1)
    got.getLong(6) should be <= 3L // n_admitted (src2 has no budget)
  }
}
