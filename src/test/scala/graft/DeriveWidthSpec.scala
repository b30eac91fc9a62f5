package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.api.Graft

/** Width derivation for the hamming-banded near-dup family
  * (deriveHammingWords — the r9 verdict's "width selection is manual"
  * item), plus the radius=0 equality paths the r9 advice flagged as
  * unreachable in the wide ops. */
class DeriveWidthSpec extends AnyFunSuite with Matchers {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog and keeps going"),
      (2L, "the quick brown fox jumps over the lazy dog and keeps moving"),
      (3L, "completely different content with nothing shared here at all"),
      (4L, "the quick brown fox jumps over the lazy dog and keeps going"))
      .toDF("doc_id", "text")
  }

  // ---------------------------------------------------- derivation math

  test("deriveHammingWords: committed fixtures resolve to words=1, the " +
    "m11-vs-m13 crossover to words=2") {
    // every committed fixture is <= ~6k items at radius 3
    Graft.deriveHammingWords(6000L, 3) shouldBe 1
    // the documented switch point: bands*n/2^15 <= 32 up to n = 262144
    Graft.deriveHammingWords(262144L, 3) shouldBe 1
    Graft.deriveHammingWords(262145L, 3) shouldBe 2
    // SCALE.md's measured bracket: 60-bit still right at 171k rows,
    // wide right at 571k
    Graft.deriveHammingWords(171000L, 3) shouldBe 1
    Graft.deriveHammingWords(571000L, 3) shouldBe 2
    // four decades later the 2^30 band space saturates too -> words=4
    Graft.deriveHammingWords(10L * 1000 * 1000 * 1000, 3) shouldBe 4
  }

  test("deriveHammingWords: simhash budget (8) switches a decade earlier " +
    "and maxWords caps at the 120-bit construction") {
    Graft.deriveHammingWords(65536L, 3, collisionsPerItem = 8.0,
      maxWords = 2) shouldBe 1
    Graft.deriveHammingWords(65537L, 3, collisionsPerItem = 8.0,
      maxWords = 2) shouldBe 2
    // d03-vs-d19 measured: 50k docs still 60-bit, 150k docs wide
    Graft.deriveHammingWords(50000L, 3, collisionsPerItem = 8.0,
      maxWords = 2) shouldBe 1
    Graft.deriveHammingWords(150000L, 3, collisionsPerItem = 8.0,
      maxWords = 2) shouldBe 2
    // maxWords=2 holds even where the unbounded derivation says 4
    Graft.deriveHammingWords(10L * 1000 * 1000 * 1000, 3,
      maxWords = 2) shouldBe 2
  }

  test("deriveHammingWords: radius=0 is an equality join at any width " +
    "so the narrow signature always wins; non-aligned radii stay " +
    "on the ceil-banded single word") {
    Graft.deriveHammingWords(1000L * 1000 * 1000, 0) shouldBe 1
    // radius=6 -> 7 bands: no {2,4}-word width is band-aligned, so the
    // derivation must stay at 1 (the ceil-banding path) at any n
    Graft.deriveHammingWords(1000L * 1000 * 1000, 6) shouldBe 1
  }

  // ------------------------------------------------- routing equivalence

  test("simhashNearDupPairs: words=0 resolves to the 60-bit arm below " +
    "the crossover and matches the pinned words=1 pair set") {
    val auto = Graft.simhashNearDupPairs(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pinned = Graft.simhashNearDupPairs(corpus, "doc_id", "text",
      words = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    auto shouldBe pinned
    auto.map(t => (t._1, t._2)) should contain((1L, 4L)) // identical docs
  }

  test("simhashNearDupPairs: words=2 routes to the wide construction") {
    val wide = Graft.simhashWideNearDupPairs(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val routed = Graft.simhashNearDupPairs(corpus, "doc_id", "text",
      words = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    routed shouldBe wide
  }

  test("ahashNearDupPairs: words=0 matches the pinned 60-bit pair set " +
    "on a fixture-sized corpus") {
    val payload = corpus.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"))
    val auto = Graft.ahashNearDupPairs(payload, "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pinned = Graft.ahashNearDupPairs(payload, "doc_id", "payload",
      radius = 3, words = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    auto shouldBe pinned
  }

  // --------------------------------------------------- radius=0 paths

  test("radius=0 runs as full-signature equality in all three " +
    "near-dup ops (r9 advice: the wide band-alignment check rejected it)") {
    val payload = corpus.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"))
    // docs 1 and 4 are byte-identical, so every signature matches exactly
    val sim0 = Graft.simhashNearDupPairs(corpus, "doc_id", "text",
      radius = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    sim0 should contain((1L, 4L))
    val simw0 = Graft.simhashWideNearDupPairs(corpus, "doc_id", "text",
      radius = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    simw0 should contain((1L, 4L))
    val ahw0 = Graft.ahashWideNearDupPairs(payload, "doc_id", "payload",
      radius = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    ahw0 should contain((1L, 4L))
    // doc 3 shares no signature with anything
    (sim0 ++ simw0 ++ ahw0).flatMap(p => Seq(p._1, p._2)) should
      not contain 3L
  }
}
