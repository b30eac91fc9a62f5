package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Scratch per-job profiling main (test scope, not part of the library):
  * runs named gate queries with a listener that attributes wall time to
  * individual Spark jobs (call site + first stage name), so a
  * multi-action gate's cost decomposes without the UI.
  *
  * Usage: sbt "Test/runMain graft.QueryProfile p18_stream_pq_ingest"
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(2000000).selectExpr("sum(id * 2)").collect() // warmup

    final case class J(id: Int, start: Long, var end: Long,
        site: String, stages: Int)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse(e.stageInfos.headOption.map(_.name).getOrElse("?"))
        jobs.put(e.jobId,
          J(e.jobId, e.time, -1L, site, e.stageIds.size))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.end = e.time
      }
    }
    spark.sparkContext.addSparkListener(listener)

    args.foreach { name =>
      val q = SparkEntry.allDefs.find(_.name == name).getOrElse(
        sys.error(s"unknown query $name"))
      jobs.clear()
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      import scala.jdk.CollectionConverters._
      val js = jobs.values.asScala.toSeq.sortBy(_.start)
      val agg = js.groupBy(_.site).view.mapValues { g =>
        (g.size, g.map(j => math.max(0L, j.end - j.start)).sum / 1e3)
      }.toSeq.sortBy(-_._2._2)
      System.err.println(f"\n===== $name: wall $wall%.2f s, " +
        f"${js.size} jobs, job-time sum ${js.map(j => math.max(0L, j.end - j.start)).sum / 1e3}%.2f s =====")
      agg.take(40).foreach { case (site, (n, secs)) =>
        System.err.println(f"  $secs%7.2f s  x$n%-4d $site")
      }
      // driver-stall analysis: gaps between consecutive jobs > 300 ms
      // (planning, file IO, broker work — anything not a Spark job)
      System.err.println("  -- gaps > 0.3 s between jobs (next job's site) --")
      js.sliding(2).foreach {
        case Seq(a, b) =>
          val gap = (b.start - math.max(a.end, a.start)) / 1e3
          if (gap > 0.3)
            System.err.println(f"  gap $gap%6.2f s before ${b.site}")
        case _ =>
      }
    }
    spark.stop()
  }
}
