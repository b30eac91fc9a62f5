package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Synthesizes an N-fold `documents`/`embeddings` slice from an existing
  * fixture dir (same schemas as FIXTURES.md) for empirical scale checks:
  * run the scale-critical query family at sf0.1 and at N x sf0.1 and
  * compare per-query growth against the plan-shape arguments in SCALE.md.
  *
  * Replication preserves the DISTRIBUTION, not the bytes: each replica
  * keeps the original's duplicate structure and word statistics but is
  * made disjoint from the others (every word suffixed with the replica
  * tag; embeddings jittered deterministically per (vec_id, replica,
  * component)). Naive byte-copies would pair every document with its 9
  * clones across replicas and the dedup-pair count would grow N^2-fold
  * BY CONSTRUCTION — that would measure the synthetic data, not the
  * engine. With disjoint replicas, pair counts, cluster sizes and
  * vocabulary-per-replica stay proportional, so ~linear runtime growth
  * is the correct expectation for a well-partitioned plan.
  *
  * Usage: ScaleDataGen <srcSfDir> <outDir> <factor> [embeddings|margin]
  *
  * The optional 4th arg `embeddings` skips the documents table — the
  * vectors-heavy mode for probing index-width derivations past the
  * `deriveNlist` √n crossover (2.56 M vectors needs factor ≥ 1280 from
  * sf0.1's 2 k vectors; replicating documents 1280× would dwarf the
  * vector table for no measurement value).
  *
  * `margin` generates a MARGIN-BEARING vectors-only slice instead of
  * replicating (r11 verdict item 2): factor × src-count vectors drawn
  * from 1000 well-separated cluster centers plus per-vector noise —
  * centers uniform in [-1,1]^64 (pairwise distance ≈ 6.5), noise ±0.08
  * per component (norm ≈ 0.37), so intra-cluster neighbors dominate by
  * construction, the geometry real embedding corpora have. The
  * replicated slices are near-isotropic (jitter ±0.005 over one shared
  * base set), where top-k membership is a tie lottery — right for
  * throughput walls, wrong for recall quality judgments. `label` =
  * cluster id. Everything hash-derived from (vec_id, component):
  * deterministic, no RNG state, schema identical to FIXTURES.md.
  */
object ScaleDataGen {
  def main(args: Array[String]): Unit = {
    val Array(src, out, factorStr) = args.take(3)
    val factor = factorStr.toInt
    val mode = if (args.length > 3) args(3) else ""
    val embeddingsOnly = mode == "embeddings"
    require(factor >= 1, s"factor must be >= 1: $factor")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (mode == "margin") {
      val srcN = spark.read.parquet(s"$src/embeddings.parquet").count()
      val n = srcN * factor
      val clusters = 1000
      spark.range(0, n).select(
          col("id").as("vec_id"),
          expr(s"""transform(sequence(0, 63), i -> CAST(
            (pmod(hash(pmod(hash(id), $clusters), i), 2001) - 1000) / 1000.0
            + (pmod(hash(id, i), 2001) - 1000) / 1000.0 * 0.08
            AS FLOAT))""").as("embedding"),
          pmod(hash(col("id")), lit(clusters)).as("label"))
        .repartition(32).write.mode("overwrite")
        .parquet(s"$out/embeddings.parquet")
      val ne = spark.read.parquet(s"$out/embeddings.parquet").count()
      println(s"""{"out":"$out","factor":$factor,"mode":"margin",""" +
        s""""clusters":$clusters,"embeddings":$ne}""")
      spark.stop()
      return
    }

    val IdStride = 10000000L
    val replicas = spark.range(0, factor).select(col("id").as("r"))

    if (!embeddingsOnly) {
    val docs = spark.read.parquet(s"$src/documents.parquet")
      .crossJoin(broadcast(replicas))
      .select(
        (col("doc_id") + col("r") * IdStride).as("doc_id"),
        // replica 0 keeps the original text; others suffix every word
        // with the replica tag, which keeps word/shingle counts and the
        // in-replica duplicate structure while making shingle sets
        // disjoint across replicas
        when(col("r") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1_"), col("r")))).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("bigint"))
    docs.repartition(32).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")
    }

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
      .crossJoin(broadcast(replicas))
      .select(
        (col("vec_id") + col("r") * IdStride).as("vec_id"),
        // replica 0 stays pristine (the s07 query set lives there);
        // other replicas get deterministic per-(vec_id, replica,
        // component) jitter — geometrically distinct replicas without
        // moving the distribution (|delta| <= 0.005 per component)
        when(col("r") === 0, col("embedding"))
          .otherwise(expr("transform(embedding, (x, i) -> CAST(x + " +
            "(pmod(hash(vec_id, r, i), 1000) / 1000.0 - 0.5) * 0.01 " +
            "AS FLOAT))")).as("embedding"),
        col("label"))
    emb.repartition(32).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")

    val nd =
      if (embeddingsOnly) 0L
      else spark.read.parquet(s"$out/documents.parquet").count()
    val ne = spark.read.parquet(s"$out/embeddings.parquet").count()
    println(s"""{"out":"$out","factor":$factor,"documents":$nd,"embeddings":$ne}""")
    spark.stop()
  }
}
