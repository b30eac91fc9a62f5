package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement tool: recall/cost of the LSH pair index at a fixture
  * dir, for tuning LshParams' derivation constants (not part of the
  * library surface; SCALE.md cites its numbers).
  *
  * Usage: LshProbe [sfDir] [derivedOnly]
  *
  * The exact ground-truth arm is O(n²) by definition, so past
  * `ExactCap` vectors it runs on a deterministic md5-bucket SAMPLE
  * (the sampled-contract convention of d06/d12's accuracy contracts):
  * the LSH index still runs over the FULL corpus, but recall is
  * measured on sample-restricted pairs only — an unbiased estimate of
  * global recall, at cap²/2 exact pairs no matter the corpus size.
  * Passing any second argument restricts the sweep to the derived
  * LshParams (the fixed-width combos are sf0.1 calibration rows). */
object LshProbe {
  private val ExactCap = 8000L

  def main(args: Array[String]): Unit = {
    // default 16 matches the historical readings; the 100×-slice probe
    // rows (n·T·ppt ≈ 2.4e8) want 32 so the SMJ sorts fit per task
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val derivedOnly = args.length > 1
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val n = emb.count()
    val sample =
      if (n <= ExactCap) emb
      else emb.filter(expr(
        "pmod(conv(substring(md5(CAST(vec_id AS STRING)), 1, 8), 16, 10)," +
          s" 1000000) < ${math.max(1L, ExactCap * 1000000L / n)}"))
    val nSample = sample.count()
    val exact = graft.api.Graft
      .cosinePairsExact(sample, "vec_id", "embedding", threshold = 0.45,
        maxRows = math.max(1L << 20, nSample))
      .select(col("id_a"), col("id_b")).cache()
    val nExact = exact.count()
    println(s"n=$n n_sample=$nSample n_exact=$nExact")
    // Third form: a semicolon-separated combo spec for derivation
    // tuning sweeps, e.g. "derived;t=16;t=32,occ=2,mp=0" — `t`/`b` pin
    // tables/bits (0 = derive), `occ` sets targetOccupancy, `mp=0`
    // disables hamming-1 multiprobe.
    val comboSpec = args.drop(1).headOption
      .filter(a => a.contains("=") || a == "derived")
    val combos =
      if (comboSpec.isDefined)
        comboSpec.get.split(";").toSeq.map { spec =>
          val kv = spec.split(",").filter(_.contains("="))
            .map { s => val Array(k, v) = s.split("="); k -> v.toInt }
            .toMap
          spec -> graft.api.Graft.LshParams(
            tables = kv.getOrElse("t", 0),
            bits = kv.getOrElse("b", 0),
            targetOccupancy = kv.getOrElse("occ", 8),
            probeHamming1 = kv.getOrElse("mp", 1) == 1,
            probeBits = kv.getOrElse("pb", -1),
            probeBits2 = kv.getOrElse("pb2", 0))
        }
      else (Seq(
        "derived" -> graft.api.Graft.LshParams()) ++
        (for (t <- Seq(4, 8); b <- Seq(6, 8, 12)) yield
          s"t=$t b=$b" -> graft.api.Graft.LshParams(tables = t, bits = b)))
        .take(if (derivedOnly) 1 else Int.MaxValue)
    for ((label, p) <- combos) {
      val t0 = System.nanoTime()
      val lsh = graft.api.Graft.lshCosinePairs(emb, "vec_id", "embedding",
        threshold = 0.45, p)
        .select(col("id_a"), col("id_b"))
      val hits = lsh.join(exact, Seq("id_a", "id_b"), "left_semi").count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$label%-10s recall=${hits.toDouble / nExact}%.3f time=$secs%.2f")
    }
    spark.stop()
  }
}
