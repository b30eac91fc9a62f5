package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (test scope): where does the shingle build's
  * wall actually go — the tokenize, the per-gram interpreted
  * transform/concat lambda, or the distinct shuffle? Decides whether
  * the n-gram builder deserves the MaxAbsF32 treatment. */
object TextProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(label: String)(f: => Long): Unit = {
      val walls = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      val r = f
      println(f"[textprobe] $label: min=${walls.min}%.2f s " +
        f"(reps=${walls.map(w => f"$w%.2f").mkString(",")} rows=$r)")
    }

    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    docs.persist(); val nd = docs.count()
    println(s"[textprobe] docs=$nd dir=$sfDir")

    // SPARK_GRAFT_TEXTPROBE_ONLY=t18 skips the shingle sections (the
    // t18 adjudication at scale30/100 doesn't need to re-pay them).
    val only = sys.env.get("SPARK_GRAFT_TEXTPROBE_ONLY")
    if (only.forall(_ != "t18")) {
    // Control: tokenize + explode words (no n-gram lambda, no distinct).
    time("tokenize+explode") {
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("s"))
        .agg(count(lit(1))).head().getLong(0)
    }
    // The interpreted HOF n-gram build, NO distinct (the pre-r11 shape).
    time("hof-ngrams (no distinct)") {
      docs.select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(w)-3), " +
            "i -> concat_ws(' ', slice(w, i+1, 3)))")).as("s"))
        .agg(count(lit(1))).head().getLong(0)
    }
    // The WordNgrams kernel, NO distinct.
    time("kernel-ngrams (no distinct)") {
      docs.select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"), explode(graft.functions.TextExpressions
          .wordNgrams(col("w"), 3)).as("s"))
        .agg(count(lit(1))).head().getLong(0)
    }
    // The full shared build (kernel + distinct since r11), what d04 owns.
    time("shingles() + distinct") {
      graft.api.Graft.shingles(docs, "doc_id", "text")
        .agg(count(lit(1))).head().getLong(0)
    }
    // + the h0 hash + distinct-on-hash (what d18's hashed table is).
    time("shingles() + md5 h0 + distinct") {
      graft.api.Graft.hashShingles(
        graft.api.Graft.shingles(docs, "doc_id", "text"), "doc_id")
        .agg(count(lit(1))).head().getLong(0)
    }
    }
    // t18 adjudication (r11 verdict item 7): bpePairCounts' per-word
    // char-pair lambda is interpreted, but runs over the DISTINCT
    // vocabulary only — decompose the wall into the corpus-scaling
    // vocab build vs the vocab-scaling pair expansion, and A/B the
    // lambda against the explode-positions + native-substring shape
    // (the m09 alternative — which LOST there because payload rode the
    // explode; words are short, so it may win here).
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("wc"))
    time("t18 vocab build only") {
      vocab.agg(count(lit(1))).head().getLong(0)
    }
    time("t18 full bpePairCounts (interpreted lambda)") {
      graft.api.Graft.bpePairCounts(docs, "text", topK = 20).count()
    }
    time("t18 explode-positions + native substring") {
      vocab
        .select(col("wc"), col("word"),
          explode(expr("sequence(1, length(word) - 1)")).as("i"))
        .select(col("wc"), expr("substring(word, i, 2)").as("pair"))
        .groupBy("pair").agg(sum("wc").as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(20).count()
    }
    docs.unpersist()
    spark.stop()
  }
}
