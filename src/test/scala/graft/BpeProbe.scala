package graft

import org.apache.spark.sql.SparkSession

/** Scratch measurement main (test scope): the BPE pair's scale claims
  * (SCALE.md, r15 verdict items 5/6) — the corpus is touched once, the
  * merge loop is vocabulary-bounded, and the LOCAL regime reaches
  * production merge counts the distributed loop cannot (one driver
  * round-trip per merge).
  *
  * Usage: BpeProbe [sfDir] [local64|dist64|local1024|encode1024|all]
  *
  * Reports min-of-2 walls plus the corpus/vocab sizes; `dist64` is the
  * distributed control arm (localVocabMax = 0) for a same-session
  * regime comparison at K=64.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = if (args.length > 1) args(1) else "all"
    def on(m: String): Boolean = mode == "all" || mode == m

    val docs = Tables.load(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val nDocs = docs.count()
    println(s"[bpeprobe] docs=$nDocs dir=$sf")

    def time(label: String)(f: => Long): Unit = {
      val reps = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      println(f"[bpeprobe] $label: min=${reps.map(_._1).min}%.1f s " +
        f"(reps=${reps.map(r => f"${r._1}%.1f").mkString(",")} " +
        f"rows=${reps.head._2})")
    }

    if (on("local64")) time("train K=64 local") {
      graft.api.Graft.bpeTrain(docs, "text", merges = 64).count()
    }
    if (on("dist64")) time("train K=64 distributed (control)") {
      graft.api.Graft.bpeTrain(docs, "text", merges = 64,
        localVocabMax = 0L).count()
    }
    if (on("local1024")) time("train K=1024 local") {
      graft.api.Graft.bpeTrain(docs, "text", merges = 1024).count()
    }
    if (on("encode1024")) {
      val merges = graft.api.Graft.bpeTrain(docs, "text", merges = 1024)
        .localCheckpoint(eager = true)
      time("encode under the K=1024 table (chunked, 16 stages)") {
        graft.api.Graft.bpeEncode(docs, "doc_id", "text", merges)
          .agg(org.apache.spark.sql.functions
            .sum(org.apache.spark.sql.functions.col("n_tokens")))
          .head().getLong(0)
      }
    }
    spark.stop()
  }
}
