package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.api.Graft

/** Fault tolerance of the iterative clustering loops at cluster scale.
  *
  * The per-round materialization is a RELIABLE checkpoint whenever the
  * session has a checkpoint dir configured (r5 verdict #3: local
  * checkpoint blocks die with their executor, so on a 1000-executor job
  * one lost executor would invalidate the lineage-truncated RDD and fail
  * the run; checkpoint-dir blocks live in the shared filesystem). This
  * suite proves (a) the reliable path is actually taken and produces the
  * same answer, and (b) a task failure mid-run — the local-mode stand-in
  * for executor loss — retries and completes with correct clusters, with
  * the accumulator-based convergence checks unharmed by the retry's
  * double-counting.
  *
  * Needs task retries, so this suite owns a local[4,2] SparkContext
  * (the shared test session runs local[4] = maxFailures 1).
  */
object ClusterResilienceSpec {
  /** Set by the flaky task when the injected failure fires (local mode:
    * executors share the JVM, so this is visible to the test). */
  @volatile var failureInjected = false
}

class ClusterResilienceSpec extends AnyFunSuite with Matchers {

  private def withRetrySession(checkpointDir: Option[String])(
      body: SparkSession => Unit): Unit = {
    SparkSession.getActiveSession.foreach(_.sparkContext.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4, 2]") // 2 task attempts
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
      body(spark)
    } finally {
      spark.sparkContext.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  private def rddCheckpointDirs(root: String): Seq[File] = {
    def walk(f: File): Seq[File] =
      if (!f.isDirectory) Nil
      else f.listFiles().toSeq.flatMap(walk) :+ f
    walk(new File(root)).filter(_.getName.startsWith("rdd-"))
  }

  test("with a checkpoint dir set, clustering rounds write RELIABLE " +
    "checkpoints and still produce the right clusters") {
    val dir = Files.createTempDirectory("graft-ckpt").toString
    withRetrySession(Some(dir)) { spark =>
      import spark.implicits._
      // 9-hop chain: several rounds for propagation, >1 contraction
      // round for large-star — both loops exercise the reliable path.
      val n = 10L
      val nodes = (0L until n).toDF("nid")
      val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("x", "y")
      val got = Graft.dupClusters(nodes, "nid", pairs, "x", "y")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      got.length shouldBe n
      got.map(_._2).distinct shouldBe Array(0L)
      val gotStar = Graft
        .dupClustersLargeStar(nodes, "nid", pairs, "x", "y")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      gotStar.length shouldBe n
      gotStar.map(_._2).distinct shouldBe Array(0L)
      // the rounds really went through the checkpoint filesystem
      rddCheckpointDirs(dir) should not be empty
    }
  }

  test("observed metrics are NOT doubled by the reliable checkpoint's " +
    "write pass: observe(count) through an eager checkpoint equals a " +
    "direct count (r16 ADVICE — bpeTrain's regime gate and both " +
    "clustering loops compare observed counts against exact " +
    "thresholds, so a re-execution-inflated metric would silently " +
    "flip cost regimes / convergence)") {
    val dir = Files.createTempDirectory("graft-ckpt-obs").toString
    withRetrySession(Some(dir)) { spark =>
      // no wildcard functions._ import: its `not` shadows Matchers'
      import org.apache.spark.sql.functions.{col, count, lit}
      import spark.implicits._
      val df = (0L until 1000L).toDF("id")
        .repartition(4).filter(col("id") % 3L =!= 1L)
      val direct = df.count()
      val obs = new org.apache.spark.sql.Observation
      val ck = df.observe(obs, count(lit(1)).as("n"))
        .checkpoint(eager = true) // reliable: the dir is set
      rddCheckpointDirs(dir) should not be empty
      obs.get("n").asInstanceOf[Long] shouldBe direct
      ck.count() shouldBe direct
    }
  }

  test("a task failure mid-run (executor-loss stand-in) retries and the " +
    "clustering completes with correct clusters") {
    withRetrySession(None) { spark =>
      import spark.implicits._
      ClusterResilienceSpec.failureInjected = false
      val n = 8L
      val nodes = (0L until n).toDF("nid")
      // the flaky edge input dies once, on the first attempt of
      // partition 0, AFTER emitting some rows — the retried task must
      // not corrupt the edge set or the convergence accounting
      val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("x", "y")
        .as[(Long, Long)]
        .mapPartitions { it =>
          val tc = TaskContext.get()
          if (tc.partitionId() == 0 && tc.attemptNumber() == 0) {
            ClusterResilienceSpec.failureInjected = true
            it.take(1).toVector // consume a row, then die
            throw new RuntimeException("injected executor loss")
          }
          it
        }
        .toDF("x", "y")
      val got = Graft.dupClusters(nodes, "nid", pairs, "x", "y")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      got.map(_._2).distinct shouldBe Array(0L)
      got.length shouldBe n
      withClue("injection never fired — the test proved nothing: ")(
        ClusterResilienceSpec.failureInjected shouldBe true)
      ClusterResilienceSpec.failureInjected = false
      val gotStar = Graft
        .dupClustersLargeStar(nodes, "nid", pairs, "x", "y")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      gotStar.map(_._2).distinct shouldBe Array(0L)
      gotStar.length shouldBe n
      withClue("injection never fired — the test proved nothing: ")(
        ClusterResilienceSpec.failureInjected shouldBe true)
    }
  }
}
