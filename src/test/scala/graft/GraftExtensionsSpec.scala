package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The SQL-facing registration path: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` can call the native
  * expressions from plain SQL.
  */
class GraftExtensionsSpec extends AnyFunSuite with Matchers {

  test("dot_f32 and rolling_min_hash64 are callable from SQL when the " +
    "extension is configured") {
    // `spark.sql.extensions` is STATIC conf: it only takes effect on the
    // SparkContext the session is built on. Another suite may already own
    // a context without it, so this test tears the shared context down,
    // builds its own, and cleans up so the next suite starts fresh.
    SparkSession.getActiveSession.foreach(_.sparkContext.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val dot = s.sql(
        "SELECT dot_f32(array(CAST(1.5 AS FLOAT), CAST(2.5 AS FLOAT)), " +
          "array(CAST(2.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
        .collect().head.getDouble(0)
      dot shouldBe 13.0
      val idot = s.sql(
        "SELECT dot_i32(array(3, -5), array(7, 2)) AS d")
        .collect().head.getLong(0)
      idot shouldBe 11L
      val fp = s.sql("SELECT rolling_min_hash64('the quick brown fox') AS f")
        .collect().head.getLong(0)
      val viaColumn = s.range(1)
        .selectExpr("'the quick brown fox' AS t")
        .select(graft.functions.TextExpressions.rollingMinHash64(
          org.apache.spark.sql.functions.col("t")))
        .collect().head.getLong(0)
      fp shouldBe viaColumn
      // r11 SQ8 natives: scale + encode
      val sq = s.sql(
        "SELECT sq8_encode_f32(array(CAST(-1.0 AS FLOAT), " +
          "CAST(2.0 AS FLOAT)), max_abs_f32(array(CAST(-1.0 AS FLOAT), " +
          "CAST(2.0 AS FLOAT)))) AS q")
        .collect().head.getSeq[Int](0)
      sq shouldBe Seq(-64, 127) // -63.5 rounds HALF_UP away from zero
      // r11 text kernels: n-grams + tumbling chunks
      s.sql("SELECT word_ngrams(array('a','b','c'), 2) AS g")
        .collect().head.getSeq[String](0) shouldBe Seq("a b", "b c")
      s.sql("SELECT word_chunks(array('a','b','c'), 2) AS c")
        .collect().head.getSeq[String](0) shouldBe Seq("a b", "c")
      // round-4/5 natives: entropy struct, perceptual hash, PCM energy
      val ent = s.sql("SELECT byte_entropy_stats(encode('aabb', 'UTF-8')) AS e")
        .selectExpr("e.nbytes", "e.n_distinct", "e.entropy")
        .collect().head
      ent.getLong(0) shouldBe 4L
      ent.getLong(1) shouldBe 2L
      ent.getDouble(2) shouldBe 1.0 +- 1e-9
      val ah = s.sql("SELECT ahash60(encode('abcdef', 'UTF-8')) AS h")
        .collect().head.getLong(0)
      val ahCol = s.range(1)
        .selectExpr("encode('abcdef', 'UTF-8') AS p")
        .select(graft.functions.MediaExpressions.ahash60(
          org.apache.spark.sql.functions.col("p")))
        .collect().head.getLong(0)
      ah shouldBe ahCol
      // round-9 wide hash: SQL = Column API, word 0 = ahash60
      val ahw = s.sql("SELECT ahash_wide(encode('abcdef', 'UTF-8'), 2) AS h")
        .collect().head.getSeq[Long](0)
      val ahwCol = s.range(1)
        .selectExpr("encode('abcdef', 'UTF-8') AS p")
        .select(graft.functions.MediaExpressions.ahashWide(
          org.apache.spark.sql.functions.col("p"), 2))
        .collect().head.getSeq[Long](0)
      ahw shouldBe ahwCol
      ahw should have size 2
      s.sql("SELECT ahash_wide(encode('abcdef', 'UTF-8'), 1) AS h")
        .collect().head.getSeq[Long](0).head shouldBe ah
      // 4 samples of value 1 little-endian (01 00 x4), window of 2:
      // two windows with |1|+|1| = 2 energy each
      val pcm = s.sql("SELECT pcm16_window_energy(" +
        "unhex('0100010001000100'), 2, 1) AS w")
        .selectExpr("inline(w)") // (channel, win_idx, energy)
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      pcm shouldBe Array((0L, 2L), (1L, 2L))
      // round-8 natives: PQ ADC lookup + encode
      val adc = s.sql("SELECT pq_adc_lut(array(10D, 20D, 30D, 1D, 2D, 3D), " +
        "array(0, 2), 3) AS a").collect().head.getDouble(0)
      adc shouldBe 13.0
      // one subspace, two unit-axis centroids: vector (0,1) encodes to
      // the second centroid (code 1)
      val code = s.sql("SELECT pq_encode_f32(" +
        "array(CAST(0 AS FLOAT), CAST(1 AS FLOAT)), " +
        "array(0, 1), " +
        "array(CAST(1 AS FLOAT), CAST(0 AS FLOAT), " +
        "      CAST(0 AS FLOAT), CAST(1 AS FLOAT)), " +
        "array(1D, 1D), 1, 2, 2) AS c")
        .collect().head.getSeq[Int](0)
      code shouldBe Seq(1)
      val fm = s.sql("SELECT frame_means(unhex('00FF00FF'), 2) AS m")
        .collect().head.getSeq[Double](0)
      fm shouldBe Seq(127.5, 127.5)
      val ss = s.sql("SELECT hex(stride_sample(unhex('AABBCCDDEE'), 2)) " +
        "AS t").collect().head.getString(0)
      ss shouldBe "AACCEE"
    } finally {
      s.sparkContext.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
