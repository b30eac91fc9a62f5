package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement tool for the CLUSTER-PROPAGATION dedup members —
  * d07 (min-label propagation), d10 (large-star/small-star
  * contraction) and d12 (SemDeDup) — at scaled document/embedding
  * slices (not part of the library surface; SCALE.md cites its
  * numbers, r14 verdict item 4).
  *
  * These are the iterative members: their scale risk is not the
  * per-round shuffle (hash-partitioned by id, same as every other
  * dedup member) but the ROUND COUNT — a growing diameter would bend
  * the loop super-linear even with perfectly linear rounds. So next
  * to wall time the probe records rounds-to-convergence (via the
  * loops' `onRounds` diagnostic callback) and decomposes pair
  * generation from propagation: pairs are materialized first
  * (localCheckpoint), so the clustering wall is the loop alone, not a
  * re-run of the n-gram join per measurement.
  *
  * Usage: ClusterProbe [sfDir] [prop|star|sem|decomp|all]
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = if (args.length > 1) args(1) else "all"

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    if (mode == "decomp") {
      // stage-by-stage cost split of the d04/d07 pair path
      val docs = Tables.load(spark, sf, "documents")
      val (nDocs, tScan) = timed(docs.count())
      val sh = graft.api.Graft.shingles(docs, "doc_id", "text")
      val (nSh, tSh) = timed(sh.count())
      val hashed = sh.select(col("doc_id"),
        graft.functions.TextExpressions.hexSliceLong(
          md5(col("s")), 1, 15).as("h"))
      val (_, tHash) = timed(hashed.count())
      // piecewise timings over a MATERIALIZED hashed table (the
      // ListingCache regime the gate queries run in)
      val (mat, tMat) = timed {
        val m = hashed.localCheckpoint(eager = true); (m, m.count())
      }
      val sh2 = mat._1
      val (mx, tGuard) = timed(sh2.groupBy("h")
        .agg(count(lit(1)).as("df")).agg(max(col("df"))).head().getLong(0))
      val (_, tCnt) = timed(sh2.groupBy("doc_id")
        .agg(count(lit(1)).as("n")).write.format("noop")
        .mode("overwrite").save())
      val (nInter, tInter) = timed(sh2.as("a")
        .join(sh2.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id"))
        .agg(count(lit(1)).as("i")).count())
      val pairsDf = graft.api.Graft.ngramJaccardPairsFromShingles(sh,
        "doc_id", threshold = 0.5)
      val (nPairs, tPairs) = timed(pairsDf.count())
      println(f"decomp docs=$nDocs t_scan=$tScan%.1f shingles=$nSh " +
        f"t_shingles=$tSh%.1f t_hash_pass=$tHash%.1f t_mat=$tMat%.1f " +
        f"max_df=$mx t_guard=$tGuard%.1f t_cnt=$tCnt%.1f " +
        f"inter=$nInter t_inter=$tInter%.1f " +
        f"pairs=$nPairs t_pairs_total=$tPairs%.1f")
    }

    if (mode == "prop" || mode == "star" || mode == "all") {
      val docs = Tables.load(spark, sf, "documents")
      val nDocs = docs.count()
      // materialize the d04 pair set once so each clustering wall below
      // is the loop's own cost (the gate queries fuse pair generation
      // into the first checkpoint; Bench measures that fused shape)
      val (pairs, tPairs) = timed {
        val p = graft.api.Graft.ngramJaccardPairs(docs, "doc_id", "text",
          n = 3, threshold = 0.5).localCheckpoint(eager = true)
        (p, p.count())
      }
      println(f"docs=$nDocs pairs=${pairs._2} t_pairs=$tPairs%.1f")
      for (m <- Seq("prop", "star") if mode == "all" || mode == m) {
        var rounds = -1
        val (_, t) = timed {
          val cl =
            if (m == "prop")
              graft.api.Graft.dupClusters(docs, "doc_id", pairs._1,
                "id_a", "id_b", onRounds = rounds = _)
            else
              graft.api.Graft.dupClustersLargeStar(docs, "doc_id",
                pairs._1, "id_a", "id_b", onRounds = rounds = _)
          cl.write.format("noop").mode("overwrite").save()
        }
        println(f"$m%-5s rounds=$rounds t_cluster=$t%.1f")
      }
    }

    if (mode == "sem" || mode == "all") {
      val emb = Tables.load(spark, sf, "embeddings")
      val nEmb = emb.count()
      val nlist = math.max(5, graft.api.Graft.deriveNlist(nEmb))
      val (nPairs, t) = timed {
        graft.api.Graft.semanticDedupPairs(emb, "vec_id", "embedding",
          nlist = nlist, iters = 2, threshold = 0.45).count()
      }
      println(f"sem   emb=$nEmb nlist=$nlist pairs=$nPairs t=$t%.1f")
    }
    spark.stop()
  }
}
