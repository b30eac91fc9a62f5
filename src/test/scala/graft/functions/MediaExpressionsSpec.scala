package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The round-4 native expressions (ByteEntropyStats, Pcm16WindowEnergy,
  * AHash60, TrigramLangIdExpr) against brute-force reference
  * implementations on seeded-random inputs, plus codegen-vs-interpreted
  * parity — the two paths every custom expression must keep identical.
  */
class MediaExpressionsSpec extends AnyFunSuite with Matchers {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def randomPayloads(n: Int, maxLen: Int): Seq[Array[Byte]] = {
    val rnd = new java.util.Random(42)
    (0 until n).map { _ =>
      val b = new Array[Byte](rnd.nextInt(maxLen + 1))
      rnd.nextBytes(b)
      b
    }
  }

  private def withInterpreted[A](body: => A): A = {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try body
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("ByteEntropyStats matches a brute-force histogram on random " +
    "payloads, and codegen agrees with the interpreted path") {
    val s = spark
    import s.implicits._
    val payloads = randomPayloads(50, 300).filter(_.nonEmpty)
    def run(): Seq[(Long, Long, Double)] =
      payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
        .toDF("k", "p")
        .orderBy("k")
        .select(TextExpressions.byteEntropyStats(col("p")).as("st"))
        .select("st.nbytes", "st.n_distinct", "st.entropy")
        .collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val got = run()
    payloads.zip(got).foreach { case (b, (nb, nd, ent)) =>
      nb shouldBe b.length.toLong
      val hist = b.groupBy(identity).view.mapValues(_.length).toMap
      nd shouldBe hist.size.toLong
      val expected = -hist.values.map { c =>
        val p = c.toDouble / b.length
        p * (math.log(p) / math.log(2.0))
      }.sum
      ent shouldBe expected +- 1e-9
    }
    withInterpreted(run()) shouldBe got
  }

  test("Pcm16WindowEnergy matches a brute-force deinterleave on random " +
    "payloads for 1 and 2 channels, and codegen agrees") {
    val s = spark
    import s.implicits._
    val payloads = randomPayloads(40, 200)
    def reference(b: Array[Byte], w: Int,
        ch: Int): Seq[(Long, Long, Long)] = {
      val ns = b.length / 2
      val samples = (0 until ns).map { i =>
        val raw = (b(2 * i) & 0xff) | ((b(2 * i + 1) & 0xff) << 8)
        if (raw >= 32768) 65536 - raw else raw
      }
      (0 until ch).flatMap { c =>
        val mine = samples.zipWithIndex.filter(_._2 % ch == c).map(_._1)
        mine.grouped(w).zipWithIndex
          .filter(_._1.size == w)
          .map { case (win, wi) =>
            (c.toLong, wi.toLong, win.map(_.toLong).sum)
          }
      }
    }
    Seq(1, 2).foreach { ch =>
      def run(): Seq[Seq[(Long, Long, Long)]] =
        payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
          .toDF("k", "p")
          .select(col("k"), MediaExpressions
            .pcm16WindowEnergy(col("p"), 4, ch).as("ws"))
          .orderBy("k")
          .collect().toSeq
          .map(_.getSeq[org.apache.spark.sql.Row](1)
            .map(w => (w.getLong(0), w.getLong(1), w.getLong(2))))
      val got = run()
      payloads.zip(got).foreach { case (b, ws) =>
        ws shouldBe reference(b, 4, ch)
      }
      withInterpreted(run()) shouldBe got
    }
  }

  test("AHash60 matches a brute-force chunk-mean reference on random " +
    "payloads, and codegen agrees") {
    val s = spark
    import s.implicits._
    val payloads = randomPayloads(50, 400).filter(_.nonEmpty)
    def reference(b: Array[Byte]): Long = {
      val n = b.length
      val total = b.map(x => (x & 0xff).toLong).sum
      (0 until 60).foldLeft(0L) { (h, i) =>
        val chunk = b.indices.filter(g => g.toLong * 60 / n == i)
        if (chunk.nonEmpty) {
          val cs = chunk.map(g => (b(g) & 0xff).toLong).sum
          if (cs * n > total * chunk.size) h | (1L << i) else h
        } else h
      }
    }
    def run(): Seq[Long] =
      payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
        .toDF("k", "p")
        .orderBy("k")
        .select(MediaExpressions.ahash60(col("p")))
        .collect().toSeq.map(_.getLong(0))
    val got = run()
    payloads.zip(got).foreach { case (b, h) =>
      h shouldBe reference(b)
      h should be >= 0L // 60 bits always fit a signed long positively
    }
    withInterpreted(run()) shouldBe got
  }

  test("FrameMeans matches a brute-force frame fold on random payloads " +
    "and agrees between codegen and interpreted") {
    import spark.implicits._
    val payloads = randomPayloads(30, 200)
    def reference(b: Array[Byte], fb: Int): Seq[Double] =
      (0 until b.length / fb).map { f =>
        b.slice(f * fb, (f + 1) * fb).map(x => (x & 0xff).toLong).sum
          .toDouble / fb
      }
    def run(): Seq[Seq[Double]] =
      payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
        .toDF("k", "p").orderBy("k")
        .select(MediaExpressions.frameMeans(col("p"), 16))
        .collect().toSeq.map(_.getSeq[Double](0))
    val got = run()
    payloads.zip(got).foreach { case (b, means) =>
      withClue(s"payload len ${b.length}: ") {
        means shouldBe reference(b, 16)
      }
    }
    withInterpreted(run()) shouldBe got
    // empty payload and sub-frame payload: zero frames, not a crash
    Seq((1L, Array.empty[Byte]), (2L, Array[Byte](1, 2, 3)))
      .toDF("k", "p")
      .select(MediaExpressions.frameMeans(col("p"), 16))
      .collect().foreach(_.getSeq[Double](0) shouldBe Seq.empty)
  }

  test("StrideSample keeps every stride-th byte on random payloads, " +
    "both codegen paths, incl. the old mapPartitions stub's semantics") {
    import spark.implicits._
    val payloads = randomPayloads(30, 200) :+ Array.empty[Byte] :+
      Array[Byte](7) :+ Array[Byte](1, 2, 3) // < stride: keep byte 0 only
    def reference(b: Array[Byte], stride: Int): Array[Byte] =
      b.indices.collect { case i if i % stride == 0 => b(i) }.toArray
    for (stride <- Seq(1, 4, 7)) {
      def run(): Seq[Array[Byte]] =
        payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }
          .toDF("k", "p")
          .orderBy("k")
          .select(MediaExpressions.strideSample(col("p"), stride))
          .collect().toSeq.map(_.getAs[Array[Byte]](0))
      val got = run()
      payloads.zip(got).foreach { case (p, g) =>
        withClue(s"stride=$stride len=${p.length}: ") {
          g.toSeq shouldBe reference(p, stride).toSeq
        }
      }
      withInterpreted(run()).map(_.toSeq) shouldBe got.map(_.toSeq)
    }
  }

  test("TrigramLangIdExpr matches a brute-force window count on random " +
    "texts, and codegen agrees") {
    val s = spark
    import s.implicits._
    val clef = new String(Character.toChars(0x1D11E)) // non-BMP, 2 chars
    val profiles = Seq(
      "aa" -> Seq("abc", "bca"),
      "bb" -> Seq("cab", "abc"), // "abc" shared: counts for both langs
      "cc" -> Seq("ccc"),
      "dd" -> Seq(s"a${clef}b")) // astral trigram: 3 codepoints, 4 chars
    val rnd = new java.util.Random(7)
    val alphabet = Seq("a", "b", "c", clef) // astral chars in the stream
    val texts = (0 until 60).map { _ =>
      val n = rnd.nextInt(30)
      (0 until n).map(_ => alphabet(rnd.nextInt(4))).mkString
    }
    // codepoint-based brute force: windows must NOT split surrogate
    // pairs (the round-4 ADVICE divergence — a UTF-16 char walk counts
    // phantom trigrams around astral chars)
    def reference(t: String): String = {
      val cps = t.codePoints().toArray
      val counts = profiles.map { case (l, tgs) =>
        l -> tgs.distinct.map { tg =>
          val w = tg.codePoints().toArray
          (0 to cps.length - 3).count(i =>
            cps(i) == w(0) && cps(i + 1) == w(1) && cps(i + 2) == w(2))
        }.sum
      }.toMap
      val best = counts.filter(_._2 > 0)
      if (best.isEmpty) "zz"
      else best.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
    }
    def run(): Seq[String] =
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("k", "t")
        .orderBy("k")
        .select(TextExpressions.trigramLangId(col("t"), profiles, "zz"))
        .collect().toSeq.map(_.getString(0))
    val got = run()
    texts.zip(got).foreach { case (t, pred) =>
      withClue(s"text '$t': ") { pred shouldBe reference(t) }
    }
    withInterpreted(run()) shouldBe got
  }
}
