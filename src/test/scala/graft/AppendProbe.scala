package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (test scope): job-level cost of ONE ivfPqAppend /
  * ivfSqAppend micro-batch against a saved index — the per-batch fixed
  * cost the r17 frozen-literal encode exists to cut. Prints every job
  * with its first stage name so broadcast-future fan is attributable.
  *
  * Usage: sbt "Test/runMain graft.AppendProbe [pq|sq]"
  */
object AppendProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(2000000).selectExpr("sum(id * 2)").collect() // warmup

    final case class J(id: Int, start: Long, var end: Long, stage: String)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.put(e.jobId, J(e.jobId, e.time, -1L,
          e.stageInfos.headOption.map(_.name).getOrElse("?")))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.end = e.time
      }
    }

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val layout = args.headOption.getOrElse("pq")
    val dir = java.nio.file.Files
      .createTempDirectory(s"append-probe-$layout").toString
    val nlist = math.max(2, graft.api.Graft.deriveNlist(emb.count()))
    if (layout == "pq") {
      val built = graft.api.Graft.ivfPqBuild(emb, "vec_id", "embedding",
        dim = 64, nlist = nlist, m = 8, ksub = 16, iters = 1)
      graft.api.Graft.ivfPqSave(
        built.copy(enc = built.enc.filter(col("vec_id") < 40)),
        dir, buckets = 8)
    } else {
      val built = graft.api.Graft.ivfSqBuild(emb, "vec_id", "embedding",
        nlist = nlist, iters = 1)
      graft.api.Graft.ivfSqSave(
        built.copy(enc = built.enc.filter(col("vec_id") < 40)),
        dir, buckets = 8)
    }
    val batches = Seq(
      emb.filter(col("vec_id") >= 40 && col("vec_id") < 300),
      emb.filter(col("vec_id") >= 300 && col("vec_id") < 600),
      emb.filter(col("vec_id") >= 600))
    spark.sparkContext.addSparkListener(listener)
    batches.zipWithIndex.foreach { case (b, i) =>
      jobs.clear()
      val t0 = System.nanoTime()
      if (layout == "pq") graft.api.Graft.ivfPqAppend(spark, dir, b, "embedding")
      else graft.api.Graft.ivfSqAppend(spark, dir, b, "embedding")
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val js = jobs.values.asScala.toSeq.sortBy(_.start)
      System.err.println(f"\n===== $layout append batch $i: wall $wall%.2f s, ${js.size} jobs =====")
      js.foreach { j =>
        System.err.println(f"  ${math.max(0L, j.end - j.start) / 1e3}%6.3f s  ${j.stage}")
      }
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}
