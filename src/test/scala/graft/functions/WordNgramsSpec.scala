package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Kernel ≡ HOF parity for the word n-gram builder (WordNgrams vs the
  * interpreted `transform(sequence(0, size(w)-n), i -> concat_ws(' ',
  * slice(w, i+1, n)))` it retires) — gram-for-gram over random word
  * arrays, empty words (consecutive-space splits), unicode, and the
  * exact-boundary sizes; plus end-to-end through Graft.shingles. */
class WordNgramsSpec extends AnyFunSuite with Matchers {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def hof(n: Int) = expr(
    s"transform(sequence(0, size(w)-$n), " +
      s"i -> concat_ws(' ', slice(w, i+1, $n)))")

  test("kernel grams match the HOF on random, empty-word, unicode, and " +
    "boundary-size arrays (n = 1, 2, 3, 7)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val words = Vector("a", "bb", "", "çé", "word", "x1", "longer-token",
      "éł", "Z")
    val rows: Seq[(Long, Seq[String])] =
      (0L until 200L).map { i =>
        (i, Seq.fill(1 + rnd.nextInt(12))(words(rnd.nextInt(words.size))))
      } ++ Seq(
        (1000L, Seq("only")),
        (1001L, Seq("two", "words")),
        (1002L, Seq("", "", "")), // all-empty words
        (1003L, ("a b  c".split(" ")).toSeq)) // real split artifact
    val df = rows.toDF("id", "w")
    for (n <- Seq(1, 2, 3, 7)) {
      // The HOF walks sequence() BACKWARDS below n words — restrict the
      // compared domain to size >= n, the only domain call sites use.
      val base = df.filter(org.apache.spark.sql.functions.size(col("w")) >= n)
      val h = base.select(col("id"), hof(n).as("g"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1))).sortBy(_._1)
      val k = base.select(col("id"),
          TextExpressions.wordNgrams(col("w"), n).as("g"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1))).sortBy(_._1)
      k shouldBe h
    }
  }

  test("below n words the kernel yields an empty array (the CASE-guard " +
    "convention callers relied on)") {
    import spark.implicits._
    val df = Seq((0L, Seq("a", "b"))).toDF("id", "w")
    df.select(TextExpressions.wordNgrams(col("w"), 5))
      .head().getSeq[String](0) shouldBe Seq.empty
  }

  test("WordChunks matches the tumbling HOF chunk-for-chunk, partial " +
    "tail included") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows: Seq[(Long, Seq[String])] =
      (0L until 150L).map { i =>
        (i, Seq.fill(1 + rnd.nextInt(25))("w" + rnd.nextInt(50)))
      } ++ Seq((1000L, Seq("a")), (1001L, Seq.fill(10)("x")),
        (1002L, Seq.fill(11)("y")), (1003L, Seq("", "b", "")))
    val df = rows.toDF("id", "w")
    for (unit <- Seq(1, 3, 10)) {
      val h = df.select(col("id"), expr(
          s"transform(sequence(0, CAST((size(w) + $unit - 1) " +
            s"DIV $unit AS INT) - 1), " +
            s"i -> concat_ws(' ', slice(w, i * $unit + 1, $unit)))").as("c"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1))).sortBy(_._1)
      val k = df.select(col("id"),
          TextExpressions.wordChunks(col("w"), unit).as("c"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1))).sortBy(_._1)
      k shouldBe h
    }
  }

  test("WordChunks on an EMPTY array yields [] — the documented domain " +
    "divergence from the HOF, whose sequence(0,-1) counts down to two " +
    "empty-string chunks (r11 advice)") {
    import spark.implicits._
    val df = Seq((0L, Seq.empty[String])).toDF("id", "w")
    val kernel = df.select(
        TextExpressions.wordChunks(col("w"), 3).as("c"))
      .collect().head.getSeq[String](0)
    kernel shouldBe Seq.empty
    // and the HOF really does diverge here — pin the reason the
    // scaladoc stops claiming exact equivalence on this domain
    val hofEmpty = df.select(expr(
        "transform(sequence(0, CAST((size(w) + 2) DIV 3 AS INT) - 1), " +
          "i -> concat_ws(' ', slice(w, i * 3 + 1, 3)))").as("c"))
      .collect().head.getSeq[String](0)
    hofEmpty shouldBe Seq("", "")
  }

  test("Graft.shingles end-to-end is unchanged by the kernel swap") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "documents").select(col("doc_id"), col("text"))
    val now = graft.api.Graft.shingles(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val old = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(org.apache.spark.sql.functions.size(col("w")) >= 3)
      .select(col("doc_id"), explode(hof(3)).as("s"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    now shouldBe old
    now.nonEmpty shouldBe true
  }
}
