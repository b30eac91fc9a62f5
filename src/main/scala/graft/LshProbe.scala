package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement tool: recall/cost of the LSH pair index at a fixture
  * dir, for tuning LshParams' derivation constants (not part of the
  * library surface; SCALE.md cites its numbers). */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val exact = graft.api.Graft
      .cosinePairsExact(emb, "vec_id", "embedding", threshold = 0.45,
        maxRows = 100000L)
      .select(col("id_a"), col("id_b")).cache()
    val nExact = exact.count()
    println(s"n_exact=$nExact")
    val combos = Seq(
      "derived" -> graft.api.Graft.LshParams()) ++
      (for (t <- Seq(4, 8); b <- Seq(6, 8, 12)) yield
        s"t=$t b=$b" -> graft.api.Graft.LshParams(tables = t, bits = b))
    for ((label, p) <- combos) {
      val t0 = System.nanoTime()
      val lsh = graft.api.Graft.lshCosinePairs(emb, "vec_id", "embedding",
        threshold = 0.45, p)
        .select(col("id_a"), col("id_b"))
      val hits = lsh.join(exact, Seq("id_a", "id_b"), "left_semi").count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$label%-10s recall=${hits.toDouble / nExact}%.3f time=$secs%.2f")
    }
    spark.stop()
  }
}
