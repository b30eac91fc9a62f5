package graft

import org.apache.spark.sql.SparkSession

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
    // piecewise p01
    val q = SparkEntry.allDefs.find(_.name == "p01_stream_roundtrip").get
    time("p01 total") { q.run(spark, sfDir).collect() }
    time("p01 again") { q.run(spark, sfDir).collect() }
    spark.stop()
  }
}
