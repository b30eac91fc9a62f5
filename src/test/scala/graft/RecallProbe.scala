package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: print pooled recall of every ANN listing vs the exact
  * top-k at a given fixture dir — the measurement behind the committed
  * s07 floors. Run: `Test/runMain graft.RecallProbe /root/testdata/sf0.01`
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val exact = SparkEntry.allDefs.find(_.name == "s01_cosine_topk").get
      .run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val listings = Seq(
      "lsh" -> graft.ops.Vector.lshListing(spark, sfDir),
      "ivf" -> graft.ops.Vector.ivfLabelListing(spark, sfDir),
      "ivf_trained" -> graft.ops.Vector.ivfTrainedListing(spark, sfDir),
      "pq" -> graft.ops.Vector.pqListing(spark, sfDir),
      "ivfpq" -> graft.ops.Vector.ivfpqListing(spark, sfDir))
    for ((name, df) <- listings) {
      val t0 = System.nanoTime()
      val approx = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (approx & exact).size.toDouble / exact.size
      println(f"RECALL $sfDir $name%-12s $recall%.3f " +
        f"(${(System.nanoTime() - t0) / 1e9}%.1fs)")
    }
    spark.stop()
  }
}
