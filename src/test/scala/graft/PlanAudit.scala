package graft

import org.apache.spark.sql.SparkSession

/** Scratch plan-inspection main (test scope): prints formatted physical
  * plans for scale-critical queries so broadcasts/pushdown/codegen spans
  * can be eyeballed. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("a02_filter", "a04_join_agg", "a08_agg_having",
        "d04_ngram_jaccard", "s01_cosine_topk")
    names.foreach { n =>
      val q = SparkEntry.allDefs.find(_.name == n).get
      println(s"\n===== $n =====")
      println(q.run(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
