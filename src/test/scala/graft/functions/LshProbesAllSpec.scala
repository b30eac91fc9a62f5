package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The directed-multiprobe kernel ([[LshProbesAll]]) against brute-force
  * references: margin selection order, code bits, probe layout, codegen
  * vs interpreted agreement, and the derived-params contract that small
  * corpora keep the classic full-multiprobe path (committed fixture
  * layouts must not move). */
class LshProbesAllSpec extends AnyFunSuite with Matchers {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val T = 3; private val B = 8; private val D = 16
  private val M = 4; private val M2 = 3

  /** Plain-Scala reference: full sort by (|margin|, bit), then the same
    * probe layout the kernel emits (code, singles, pair flips). */
  private def reference(v: Array[Float], planes: Array[Float]): Seq[Int] =
    (0 until T).flatMap { t =>
      val margins = (0 until B).map { j =>
        var acc = 0.0
        for (k <- 0 until D)
          acc += v(k).toDouble * planes((t * B + j) * D + k).toDouble
        acc
      }
      val code = margins.zipWithIndex
        .collect { case (d, j) if d > 0 => 1 << j }.sum
      val sel = (0 until B).sortBy(j => (math.abs(margins(j)), j)).take(M)
      val singles = sel.map(j => code ^ (1 << j))
      val deep = sel.take(M2)
      val doubles = for (i <- 1 until deep.size; k <- 0 until i)
        yield code ^ (1 << deep(i)) ^ (1 << deep(k))
      (code +: singles) ++ doubles
    }

  test("lsh_probes_all matches the brute-force margin sort on random " +
    "vectors (codes, selection order, pair flips)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val planes = Array.fill(T * B * D)(rnd.nextGaussian().toFloat)
    val vecs = Seq.fill(40)(Array.fill(D)(rnd.nextGaussian().toFloat))
    val rows = vecs.toDF("v")
      .select(VectorExpressions.lshProbesAll(col("v"), planes,
        T, B, D, M, M2).as("p"))
      .collect().map(_.getSeq[Int](0))
    rows.length shouldBe vecs.length
    val ppt = LshProbesAll.probesPerTable(B, M, M2)
    ppt shouldBe 1 + M + M2 * (M2 - 1) / 2
    rows.zip(vecs).foreach { case (got, v) =>
      got.length shouldBe T * ppt
      got.toSeq shouldBe reference(v, planes)
    }
  }

  test("tie margins (zero vector) select the lowest bit indices " +
    "deterministically") {
    import spark.implicits._
    val planes = Array.fill(T * B * D)(0.25f)
    val rows = Seq(Array.fill(D)(0.0f)).toDF("v")
      .select(VectorExpressions.lshProbesAll(col("v"), planes,
        T, B, D, M, M2).as("p"))
      .collect().map(_.getSeq[Int](0))
    // all margins 0 -> code 0, selection = bits 0..M-1 in index order
    val singles = (0 until M).map(1 << _)
    val doubles = for (i <- 1 until M2; k <- 0 until i)
      yield (1 << i) | (1 << k)
    rows.head.toSeq shouldBe
      (0 until T).flatMap(_ => (0 +: singles) ++ doubles)
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val planes = Array.fill(T * B * D)(rnd.nextGaussian().toFloat)
    val df = Seq(Array.fill(D)(rnd.nextGaussian().toFloat)).toDF("v")
    def run(): Seq[Int] = df.select(VectorExpressions.lshProbesAll(
      col("v"), planes, T, B, D, M, M2)).collect().head.getSeq[Int](0)
    val onWS = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try run() shouldBe onWS
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("derived params keep the classic full-multiprobe path (directed " +
    "probing is opt-in only): derived and pinned-classic pair sets are " +
    "identical") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // 300 vectors with planted near-dup pairs (i, i+150): LshParams()
    // must resolve to probeBits = 0 (classic multiprobe — the r10
    // adjudication keeps directed probing caller-pinned only) and agree
    // with the pinned-classic run exactly
    val base = Seq.fill(150)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val vecs = base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      base.zipWithIndex.map { case (v, i) =>
        ((i + 150).toLong, v.map(x => x + 0.01f)) }
    val df = vecs.toDF("vec_id", "embedding")
    def pairs(p: graft.api.Graft.LshParams): Set[(Long, Long)] =
      graft.api.Graft.lshCosinePairs(df, "vec_id", "embedding",
        threshold = 0.8, p)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val derived = pairs(graft.api.Graft.LshParams())
    val classic = pairs(graft.api.Graft.LshParams(probeBits = 0))
    derived shouldBe classic
    // and the planted duplicates are found
    derived.count { case (a, b) => b == a + 150 } should be >= 140
  }

  test("directed probing returns only true-threshold pairs (exact " +
    "rerank keeps zero false positives)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val vecs = (0 until 400).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val directed = graft.api.Graft.lshCosinePairs(df, "vec_id",
      "embedding", threshold = 0.6,
      graft.api.Graft.LshParams(probeBits = 3, probeBits2 = 2))
      .collect()
    val byId = vecs.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    directed.foreach { r =>
      cos(byId(r.getLong(0)), byId(r.getLong(1))) should be >= 0.6 - 1e-9
    }
  }
}
