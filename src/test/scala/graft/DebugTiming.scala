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
    // piecewise s11/s12: train vs assign vs encode vs search
    val emb = Tables.load(spark, sfDir, "embeddings")
    emb.persist(); val n = emb.count()
    val nlist = math.max(5, math.round(n / 400.0).toInt)
    val cents = time("kmeansCentroids (sampled train)") {
      graft.api.Graft.kmeansCentroids(
        emb.filter(expr(
          s"pmod(conv(substring(md5(CAST(vec_id AS STRING)), 1, 8), 16, 10)," +
            s" 1000000) < ${math.max(1L, nlist * 128L * 1000000L / n)}")),
        "vec_id", "embedding", nlist = nlist, iters = 2)
        .localCheckpoint(eager = true)
    }
    time("assignToCentroids full corpus") {
      graft.api.Graft.assignToCentroids(emb, "vec_id", "embedding", cents)
        .write.format("noop").mode("overwrite").save()
    }
    time("assignToCentroids again") {
      graft.api.Graft.assignToCentroids(emb, "vec_id", "embedding", cents)
        .write.format("noop").mode("overwrite").save()
    }
    val nProbe = math.max(2, math.ceil(nlist * 0.4).toInt)
    val shortlist = math.max(50L, n / 10).toInt
    time("s11 ivfPqTopK end-to-end") {
      graft.api.Graft.ivfPqTopK(emb, "vec_id", "embedding",
        queryPred = col("vec_id") < 8, k = 5, dim = 64,
        nlist = nlist, nProbe = nProbe, shortlist = shortlist)
        .write.format("noop").mode("overwrite").save()
    }
    time("s12 annKnnJoin end-to-end") {
      graft.api.Graft.annKnnJoin(emb, "vec_id", "embedding", k = 5)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
