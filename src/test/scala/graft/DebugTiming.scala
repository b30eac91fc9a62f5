package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (test scope, not part of the library). */
object DebugTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[timing] $label: ${(System.nanoTime()-t0)/1e9}%.2f s")
      r
    }
    // piecewise s10: training vs encode vs ADC scan
    val emb = Tables.load(spark, sfDir, "embeddings")
    emb.persist(); emb.count()
    val cb = time("pqCodebooks train") {
      val c = graft.api.Graft.pqCodebooks(emb, "vec_id", "embedding", dim = 64)
      c.localCheckpoint(eager = true)
    }
    time("pqEncode full corpus") {
      graft.api.Graft.pqEncode(emb, "vec_id", "embedding", cb, dim = 64)
        .write.format("noop").mode("overwrite").save()
    }
    val shortlist = math.max(50L, emb.count() / 10).toInt
    time("pqTopK end-to-end") {
      graft.api.Graft.pqTopK(emb, "vec_id", "embedding",
        queryPred = col("vec_id") < 8, k = 5, dim = 64,
        shortlist = shortlist)
        .write.format("noop").mode("overwrite").save()
    }
    time("pqTopK end-to-end (2nd)") {
      graft.api.Graft.pqTopK(emb, "vec_id", "embedding",
        queryPred = col("vec_id") < 8, k = 5, dim = 64,
        shortlist = shortlist)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
