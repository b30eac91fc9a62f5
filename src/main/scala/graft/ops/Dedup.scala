package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` (text) and `embeddings`
  * (vectors). Scale design notes:
  *
  *  - exact dedup: one hash-shuffle on the digest — the canonical
  *    distributed dedup; digest is computed map-side so the shuffle carries
  *    (digest, doc_id), not the text.
  *  - MinHash+LSH: signatures via a single groupBy over exploded shingles
  *    (map-side partial min), banding turns the O(n²) pair space into
  *    equality buckets — the only joins are equi-joins on (band, hash), so
  *    they shuffle-partition by bucket and never materialize the full
  *    cross product. This is the 100 TB-safe path.
  *  - SimHash: 64-bit signature via sum-aggregates (codegen), pigeonhole
  *    banding on 16-bit chunks for the candidate join.
  *  - n-gram Jaccard: exact verification via shingle equi-join (candidate
  *    pairs share >= 1 shingle; high-frequency shingles would need a
  *    frequency cap at extreme scale).
  *  - embedding cosine: explicit double-precision dot products so results
  *    are bit-identical to the DuckDB oracle.
  */
object Dedup {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  /** Deterministic md5-bucket sample of the embeddings capped at ~`cap`
    * vectors (t19's trick), plus its id set — the r7 scale story for
    * the accuracy contracts: their exact ground-truth arm is quadratic
    * BY DEFINITION, so it runs on the sample (rate 1 at every committed
    * fixture — bit-identical gate rows; ~5% at the 10× slice, bounding
    * the exact arm at cap²/2 pairs no matter how the corpus grows).
    * Recall measured on sample-restricted pairs estimates global
    * recall; false positives are checked on the same subset. */
  private def sampledVectors(emb: DataFrame, cap: Long): DataFrame = {
    // Rate derived IN-PLAN (one tiny agg broadcast onto the scan, the
    // same arithmetic as the oracle's n0 CTE) — a driver-side count()
    // here would cost one extra job per contract arm.
    val nv = emb.agg(count(lit(1)).as("nv"))
    emb.crossJoin(broadcast(nv))
      .filter(graft.functions.TextExpressions.hexSliceLong(
        md5(concat_ws(":", lit("exact"), col("vec_id").cast("string"))),
        1, 15) <
        floor(least(lit(1.0), lit(cap.toDouble) / col("nv")) *
          lit((1L << 60).toDouble)).cast("long"))
      .drop("nv")
  }

  /** DuckDB view of [[sampledVectors]] as a CTE body (same md5 bucket,
    * same double arithmetic, same 2⁶⁰ threshold). */
  private def sampledSql: String =
    "n0 AS (SELECT COUNT(*) AS nv FROM embeddings), " +
      "smp AS (SELECT vec_id, embedding FROM embeddings, n0 WHERE " +
      "CAST(concat('0x', substring(md5(concat('exact:', " +
      "CAST(vec_id AS VARCHAR))), 1, 15)) AS BIGINT) < " +
      "CAST(FLOOR(LEAST(1.0, 1000.0 / nv) * 1152921504606846976.0) " +
      "AS BIGINT))"

  /** (doc_id, s): distinct word-3-shingles per document — see
    * [[graft.api.Graft.shingles]] (documents shorter than 3 words yield
    * no rows, matching the oracle's generate_series(1, len-2)). */
  private def shingles(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.shingles(docs(s, d), "doc_id", "text")

  /** The corpus's distinct word-3-shingle table, session-shared through
    * [[ListingCache]] (r9 verdict: d04/d14/d17/d18 — and t13/t25 on the
    * text side — each re-ran the identical shingles → distinct shuffle
    * in one gate run; d18, the most expensive bench entry, spent most
    * of its wall rebuilding what its siblings had just built). d04 is
    * the OWNER: it builds fresh (reuse = false), so its bench timing
    * stays the honest full build-plus-join cost and exactly one fresh
    * build runs per suite; the consumers pass reuse = true and only
    * build when they run first. d02/d08 keep their own text-path build
    * (the minhash headline numbers stay self-contained fresh-sketch
    * costs) and d10 stays fully independent (its point is the
    * contraction path end to end). Unlike the few-thousand-row cluster
    * listings this mechanism was built for, the shingle table is
    * corpus-shingle-sized — still a fraction of the inputs it saves
    * rebuilding, and on a cluster the same mechanism lands on a
    * reliable checkpoint dir. */
  private[ops] def sharedShingles(s: SparkSession, d: String,
      reuse: Boolean = false): DataFrame =
    ListingCache.shared("doc_shingles", s, d, reuse) {
      graft.api.Graft.shingles(docs(s, d), "doc_id", "text")
    }

  /** The base corpus's h0 HASH table ([[graft.api.Graft.hashShingles]]
    * over the shared shingle listing) — the second amortizable level:
    * d18's bottom-k containment needs the hashed+distinct form, and at
    * 100 TB a curation session computes that corpus hash table once
    * and probes it many times. d18 owns the build (reuse = true only
    * skips it when a prior run this session already left it). */
  private[ops] def sharedShingleHashes(s: SparkSession, d: String,
      reuse: Boolean = false): DataFrame =
    ListingCache.shared("doc_shingle_h0", s, d, reuse) {
      graft.api.Graft.hashShingles(sharedShingles(s, d, reuse = true),
        "doc_id")
    }

  /** Sequential-fold double dot product of two float arrays (native
    * codegen expression) — bit-identical to DuckDB's list_sum over the
    * same zip, see [[graft.functions.DotProductF32]]. */
  private def dot(a: String, b: String): Column =
    graft.functions.VectorExpressions.dotF32(col(a), col(b))

  private[ops] def normed(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"),
        sqrt(dot("embedding", "embedding")).as("nrm"))

  // 24 permutations = 6 md5 digests per shingle (4 slices each). Dropped
  // from 32 after profiling: the per-slice substring + string-min
  // aggregation buffers dominate the signature stage, and k=24 cut d02
  // 5.4s -> 2.9s at sf0.1 while finding the IDENTICAL pair set as k=32
  // (and as the exact n-gram Jaccard op) with max |est-jac| = 0.058 —
  // asserted in SketchAccuracySpec.
  private val MinhashK = 24 // permutations
  private val Bands = 8     // 8 bands x 3 rows

  /** t03/t09's stopword language profiles, repeated here for the d21
    * curation pipeline (the oracle replays the same regex counts). */
  private val CurateStopwords: Seq[(String, String)] = Seq(
    "en" -> "the|a|of|and|to|in|is",
    "fr" -> "le|la|les|et|de|un|une",
    "es" -> "el|los|las|y|que|un|una",
    "de" -> "der|die|das|und|ein|zu")

  /** Min-id-per-component closure over the d04 n-gram Jaccard pair set,
    * as a DuckDB recursive CTE. Shared by d07 (label propagation) and
    * d10 (large-star contraction): both algorithms compute the same
    * function, so they share one oracle. */
  private val JaccardClustersCte: String =
    // the pair step replays the engine's hash space: the shingle join
    // key is the 60-bit md5 slice (Graft.shingleKey), so both engines
    // agree bit-for-bit even on a hash collision
    "WITH RECURSIVE toks AS (SELECT doc_id, " +
      "string_split(text, ' ') AS w FROM documents), " +
      "sh AS (SELECT DISTINCT doc_id, " +
      "array_to_string(list_slice(w, g, g+2), ' ') AS s FROM toks, " +
      "UNNEST(generate_series(1, len(w)-2)) AS t(g)), " +
      "hh AS (SELECT doc_id, CAST(concat('0x', " +
      "substring(md5(s), 1, 15)) AS BIGINT) AS h FROM sh), " +
      "cnt AS (SELECT doc_id, COUNT(*) AS n FROM hh GROUP BY doc_id), " +
      "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) " +
      "AS i FROM hh a JOIN hh b ON a.h = b.h AND a.doc_id < b.doc_id " +
      "GROUP BY 1, 2), " +
      "pairs AS (SELECT doc_a, doc_b FROM inter " +
      "JOIN cnt ca ON doc_a = ca.doc_id " +
      "JOIN cnt cb ON doc_b = cb.doc_id " +
      "WHERE CAST(i AS DOUBLE)/(ca.n + cb.n - i) >= 0.5), " +
      "edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs " +
      "UNION ALL SELECT doc_b, doc_a FROM pairs), " +
      "reach(id, lab) AS (SELECT doc_id, doc_id FROM documents " +
      "UNION SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.id) "

  private val JaccardClustersOracle: String =
    JaccardClustersCte +
      "SELECT id AS doc_id, MIN(lab) AS cluster_id FROM reach " +
      "GROUP BY id ORDER BY doc_id"

  /** d07's clusters (min-id components over d04's exact Jaccard pair
    * set), shared with d16 through [[ListingCache]] (the s07 pattern —
    * r8 verdict: d16 re-ran the whole pair generation + propagation
    * d07 had just computed, 5.4 s of pure duplicate work at sf0.1).
    * d07 always builds FRESH and leaves the materialized clusters;
    * d16 (`reuse = true`) picks them up, or builds when it runs first
    * (query order is not guaranteed). d10 deliberately does NOT share:
    * its point is exercising the large-star contraction path end to
    * end. */
  private def jaccardClusters(s: SparkSession, d: String,
      reuse: Boolean = false): DataFrame =
    ListingCache.shared("jaccard_clusters", s, d, reuse) {
      graft.api.Graft.dupClusters(
        docs(s, d), "doc_id",
        graft.api.Graft.ngramJaccardPairsFromShingles(
          sharedShingles(s, d, reuse = true), "doc_id", threshold = 0.5),
        "id_a", "id_b")
    }

  val defs: Seq[Q] = Seq(

    Q("d01_exact_dedup",
      (s, d) => graft.api.Graft.exactDedup(docs(s, d), "doc_id", "text")
        .orderBy("keep_id"),
      Some("SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dups FROM documents " +
        "GROUP BY sha256(text) ORDER BY keep_id")),

    Q("d13_incremental_dedup",
      // Incremental dedup — the production shape: the corpus is deduped
      // ONCE into a digest index; each new shard probes the index and
      // dedups within itself, so per-shard cost is shard-sized, never
      // corpus-sized. Fixture split: even doc_ids play the existing
      // corpus (their digest index = min id per digest), odd doc_ids
      // are the arriving shard. Every verdict is deterministic and the
      // oracle recomputes the whole thing relationally.
      // See [[graft.api.Graft.incrementalDedup]].
      (s, d) => {
        val all = docs(s, d)
        val prior = all.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"),
            sha2(col("text").cast("binary"), 256).as("digest"))
          .groupBy("digest").agg(min("doc_id").as("keep_id"))
        graft.api.Graft.incrementalDedup(
          all.filter(col("doc_id") % 2 === 1), "doc_id", "text", prior)
          .orderBy("doc_id")
      },
      Some("WITH d AS (SELECT doc_id, sha256(text) AS digest " +
        "FROM documents), " +
        "prior AS (SELECT digest, MIN(doc_id) AS index_keeper FROM d " +
        "WHERE doc_id % 2 = 0 GROUP BY digest), " +
        "nb AS (SELECT doc_id, digest FROM d WHERE doc_id % 2 = 1), " +
        "bk AS (SELECT digest, MIN(doc_id) AS batch_keeper FROM nb " +
        "GROUP BY digest) " +
        "SELECT nb.doc_id, nb.digest, " +
        "CASE WHEN p.index_keeper IS NOT NULL THEN 'dup_of_index' " +
        "WHEN nb.doc_id <> bk.batch_keeper THEN 'dup_in_batch' " +
        "ELSE 'kept' END AS status, " +
        "CASE WHEN p.index_keeper IS NOT NULL THEN p.index_keeper " +
        "WHEN nb.doc_id <> bk.batch_keeper THEN bk.batch_keeper " +
        "END AS dup_of " +
        "FROM nb LEFT JOIN prior p USING (digest) JOIN bk USING (digest) " +
        "ORDER BY doc_id")),

    Q("d15_bloom_dedup",
      // d13's incremental probe with a Bloom-filter pre-prune: the index
      // digests fold into one bounded sketch (distributed mergeable agg,
      // ~7 bits/item), and batch rows that are definitely-new skip the
      // corpus-sized probe join entirely — the memory-bounded membership
      // shape of a 100 TB ingest loop. Results are EXACT (false
      // positives only cost an extra probe row; false negatives cannot
      // happen), so the oracle is d13's relational recompute verbatim —
      // same fixture split, same verdicts, bloom or no bloom.
      // See [[graft.api.Graft.bloomIncrementalDedup]].
      (s, d) => {
        val all = docs(s, d)
        val prior = all.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"),
            sha2(col("text").cast("binary"), 256).as("digest"))
          .groupBy("digest").agg(min("doc_id").as("keep_id"))
        graft.api.Graft.bloomIncrementalDedup(
          all.filter(col("doc_id") % 2 === 1), "doc_id", "text", prior)
          .orderBy("doc_id")
      },
      Some("WITH d AS (SELECT doc_id, sha256(text) AS digest " +
        "FROM documents), " +
        "prior AS (SELECT digest, MIN(doc_id) AS index_keeper FROM d " +
        "WHERE doc_id % 2 = 0 GROUP BY digest), " +
        "nb AS (SELECT doc_id, digest FROM d WHERE doc_id % 2 = 1), " +
        "bk AS (SELECT digest, MIN(doc_id) AS batch_keeper FROM nb " +
        "GROUP BY digest) " +
        "SELECT nb.doc_id, nb.digest, " +
        "CASE WHEN p.index_keeper IS NOT NULL THEN 'dup_of_index' " +
        "WHEN nb.doc_id <> bk.batch_keeper THEN 'dup_in_batch' " +
        "ELSE 'kept' END AS status, " +
        "CASE WHEN p.index_keeper IS NOT NULL THEN p.index_keeper " +
        "WHEN nb.doc_id <> bk.batch_keeper THEN bk.batch_keeper " +
        "END AS dup_of " +
        "FROM nb LEFT JOIN prior p USING (digest) JOIN bk USING (digest) " +
        "ORDER BY doc_id")),

    Q("d09_normalized_dedup",
      // Normalized-content exact dedup: the t15 canonicalization
      // (lowercase, strip non-printables, collapse whitespace, trim)
      // feeding d01's digest-group dedup — catches the case/whitespace
      // re-encode variants byte-exact dedup misses, which in practice
      // is MOST web-duplicate mass. Pure composition of the public API
      // (normalizeText -> exactDedup); normalization is map work riding
      // the scan, the dedup shuffle carries (digest, id) only.
      (s, d) => graft.api.Graft.exactDedup(
        graft.api.Graft.normalizeText(docs(s, d), "doc_id", "text"),
        "doc_id", "norm_text")
        .orderBy("keep_id"),
      Some("WITH nm AS (SELECT doc_id, trim(regexp_replace(" +
        "regexp_replace(lower(text), '[^\\x20-\\x7e]', ' ', 'g'), " +
        "'\\s+', ' ', 'g')) AS norm_text FROM documents) " +
        "SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dups FROM nm " +
        "GROUP BY sha256(norm_text) ORDER BY keep_id")),

    Q("d02_minhash_lsh",
      (s, d) => {
        // k minhashes in ONE aggregation: hash the shingle under k seeds,
        // take per-doc minima (map-side partial aggregation applies).
        // The hash family is seeded md5, each digest sliced into four
        // 32-bit hashes parsed to BIGINT (native hex_slice_long; DuckDB
        // parses the identical slice with '0x...'::BIGINT) — md5 is
        // bit-identical across engines, which makes the whole operator
        // hash-checkable against the DuckDB oracle (murmur3 was
        // Spark-only). Slicing 4 hashes per md5
        // keeps it to 6 digests per shingle (32-bit slices collide with
        // ~1e-5 probability across a 45k-shingle corpus — noise next to
        // minhash's own estimation variance; at web scale with billions
        // of distinct shingles, widen the slices to 15 hex chars and pay
        // one digest per permutation); codegen CSE shares each digest
        // across its 4 slices.
        graft.api.Graft
          .minhashLshPairs(docs(s, d), "doc_id", "text",
            k = MinhashK, bands = Bands, threshold = 0.5)
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
            round(col("est_jac"), 4).as("est_jac"))
          .orderBy("doc_a", "doc_b")
      },
      Some {
        val R = MinhashK / Bands
        val minCols = (0 until MinhashK).map { i =>
          val (seed, slice) = (i / 4, i % 4)
          // numeric min of the hex slice — same order as the string min,
          // and the same BIGINT the Spark side's hex_slice_long parses
          s"MIN(CAST(concat('0x', substring(md5(concat('$seed:', s)), " +
            s"${8 * slice + 1}, 8)) AS BIGINT)) AS m$i"
        }.mkString(", ")
        val bandSelects = (0 until Bands).map { j =>
          val cols = (0 until R).map(r => s"m${j * R + r}").mkString(", ")
          s"SELECT doc_id, $j AS band, md5(concat_ws(',', $cols, '$j')) " +
            "AS bh FROM sig"
        }.mkString(" UNION ALL ")
        val agree = (0 until MinhashK).map(i =>
          s"CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END").mkString(" + ")
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w " +
          "FROM documents), " +
          "sh AS (SELECT DISTINCT doc_id, " +
          "array_to_string(list_slice(w, g, g+2), ' ') AS s FROM toks, " +
          "UNNEST(generate_series(1, len(w)-2)) AS t(g)), " +
          s"sig AS (SELECT doc_id, $minCols FROM sh GROUP BY doc_id), " +
          s"bands AS ($bandSelects), " +
          "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b " +
          "FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh " +
          "AND a.doc_id < b.doc_id), " +
          s"ag AS (SELECT doc_a, doc_b, ($agree) AS agree FROM cand " +
          "JOIN sig sa ON doc_a = sa.doc_id " +
          "JOIN sig sb ON doc_b = sb.doc_id) " +
          s"SELECT doc_a, doc_b, ROUND(CAST(agree AS DOUBLE)/$MinhashK, 4) " +
          s"AS est_jac FROM ag WHERE CAST(agree AS DOUBLE)/$MinhashK >= 0.5 " +
          "ORDER BY doc_a, doc_b"
      }),

    Q("d03_simhash",
      // Term-frequency SimHash: each word occurrence votes +/-1 on all
      // 60 bits of its hash (md5 truncated to 15 hex chars — portable,
      // hash-checked against the oracle); pigeonhole banding over 4
      // chunks of 15 bits finds ALL pairs within radius 3 exactly.
      // Pinned to words = 1: d03 IS the 60-bit arm (d19 is the wide
      // twin, and graft.api.Graft.simhashNearDupPairs' words = 0
      // default derives the width from the corpus count — the r10
      // promotion of the formerly inline construction). See
      // [[graft.api.Graft.simhashNearDupPairs]].
      (s, d) => graft.api.Graft
        .simhashNearDupPairs(docs(s, d), "doc_id", "text", radius = 3,
          words = 1)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
          col("dist"))
        .orderBy("doc_a", "doc_b"),
      Some {
        val bitSums = (0 until 60).map(i =>
          s"SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i")
          .mkString(", ")
        val packed = (0 until 60).map(i =>
          s"CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END").mkString(" + ")
        val chunkSelects = (0 until 4).map(j =>
          s"SELECT doc_id, sim, $j AS pos, (sim >> ${15 * j}) & 32767 " +
            "AS chunk FROM sig").mkString(" UNION ALL ")
        "WITH wd AS (SELECT doc_id, " +
          "CAST(concat('0x', substring(md5(word), 1, 15)) AS BIGINT) AS h " +
          "FROM documents, UNNEST(string_split(text, ' ')) AS t(word)), " +
          s"bits AS (SELECT doc_id, $bitSums FROM wd GROUP BY doc_id), " +
          s"sig AS (SELECT doc_id, ($packed) AS sim FROM bits), " +
          s"chunks AS ($chunkSelects) " +
          "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
          "CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS dist " +
          "FROM chunks a JOIN chunks b ON a.pos = b.pos " +
          "AND a.chunk = b.chunk AND a.doc_id < b.doc_id " +
          "WHERE bit_count(xor(a.sim, b.sim)) <= 3 " +
          "ORDER BY doc_a, doc_b"
      }),

    Q("d19_simhash_wide",
      // d03's term-frequency SimHash widened to 120 bits — the text
      // twin of m13's wide aHash, retiring the d03 occupancy caveat
      // (SCALE.md: 15-bit bands are n^2/2^15-class): two 60-bit
      // signature words from DISJOINT md5 slices of the same word
      // hash (chars 1-15 and 16-30), so at radius 3 the pigeonhole
      // bands are 30 bits wide (2^30 buckets) and random band
      // agreement vanishes. Same exact banding argument, the dist
      // is the two-word popcount sum; pairs are the fixture's
      // organic near-dups that survive the stricter 120-bit radius.
      // See [[graft.api.Graft.simhashWideNearDupPairs]].
      (s, d) => graft.api.Graft
        .simhashWideNearDupPairs(docs(s, d), "doc_id", "text", radius = 3)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
          col("dist"))
        .orderBy("doc_a", "doc_b"),
      Some {
        val bitSums = (0 until 120).map { i =>
          val src = if (i < 60) "h0" else "h1"
          s"SUM(CASE WHEN ($src >> ${i % 60}) & 1 = 1 THEN 1 ELSE -1 END) " +
            s"AS b$i"
        }.mkString(", ")
        def packed(lo: Int): String = (lo until lo + 60).map(i =>
          s"CASE WHEN b$i > 0 THEN ${1L << (i - lo)} ELSE 0 END")
          .mkString(" + ")
        val chunkSelects = (0 until 4).map { j =>
          val src = if (j < 2) "sim0" else "sim1"
          s"SELECT doc_id, sim0, sim1, $j AS pos, " +
            s"($src >> ${30 * (j % 2)}) & 1073741823 AS chunk FROM sig"
        }.mkString(" UNION ALL ")
        "WITH wd AS (SELECT doc_id, " +
          "CAST(concat('0x', substring(md5(word), 1, 15)) AS BIGINT) AS h0, " +
          "CAST(concat('0x', substring(md5(word), 16, 15)) AS BIGINT) AS h1 " +
          "FROM documents, UNNEST(string_split(text, ' ')) AS t(word)), " +
          s"bits AS (SELECT doc_id, $bitSums FROM wd GROUP BY doc_id), " +
          s"sig AS (SELECT doc_id, (${packed(0)}) AS sim0, " +
          s"(${packed(60)}) AS sim1 FROM bits), " +
          s"chunks AS ($chunkSelects) " +
          "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
          "CAST(bit_count(xor(a.sim0, b.sim0)) + " +
          "bit_count(xor(a.sim1, b.sim1)) AS BIGINT) AS dist " +
          "FROM chunks a JOIN chunks b ON a.pos = b.pos " +
          "AND a.chunk = b.chunk AND a.doc_id < b.doc_id " +
          "WHERE bit_count(xor(a.sim0, b.sim0)) + " +
          "bit_count(xor(a.sim1, b.sim1)) <= 3 " +
          "ORDER BY doc_a, doc_b"
      }),

    Q("d04_ngram_jaccard",
      // Owner of the session-shared shingle listing ([[sharedShingles]]):
      // builds the distinct (doc_id, s) table fresh and leaves it for
      // d14/d17/d18/t13/t25 and the cluster family, so one gate run pays
      // for exactly one shingle build instead of six (r9 verdict).
      (s, d) => graft.api.Graft
        .ngramJaccardPairsFromShingles(
          sharedShingles(s, d, reuse = false), "doc_id", threshold = 0.5)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
          round(col("jac"), 4).as("jac"))
        .orderBy("doc_a", "doc_b"),
      // hash-space replay (Graft.shingleKey): join on the 60-bit md5
      // slice exactly as the engine does
      Some("WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w " +
        "FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, " +
        "array_to_string(list_slice(w, g, g+2), ' ') AS s FROM toks, " +
        "UNNEST(generate_series(1, len(w)-2)) AS t(g)), " +
        "hh AS (SELECT doc_id, CAST(concat('0x', " +
        "substring(md5(s), 1, 15)) AS BIGINT) AS h FROM sh), " +
        "cnt AS (SELECT doc_id, COUNT(*) AS n FROM hh GROUP BY doc_id), " +
        "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) " +
        "AS i FROM hh a JOIN hh b ON a.h = b.h AND a.doc_id < b.doc_id " +
        "GROUP BY 1, 2) " +
        "SELECT doc_a, doc_b, ROUND(CAST(i AS DOUBLE)/(ca.n + cb.n - i), 4) " +
        "AS jac FROM inter JOIN cnt ca ON doc_a = ca.doc_id " +
        "JOIN cnt cb ON doc_b = cb.doc_id " +
        "WHERE CAST(i AS DOUBLE)/(ca.n + cb.n - i) >= 0.5 " +
        "ORDER BY doc_a, doc_b")),

    Q("d22_jaccard_dfcap",
      // d04's documented web-scale configuration: `maxShingleDf` drops
      // shingles hotter than the cap up front (stopword-removal
      // semantics — Jaccard over the REDUCED sets) so one hot
      // boilerplate shingle can never own an O(df²) self-join bucket.
      // The cap counts document frequency in the 60-bit shingleKey
      // hash space, exactly like the join itself; the oracle replays
      // the identical key AND the identical capped df filter, so the
      // hash-space semantics (r15 ADVICE: previously untested
      // cross-engine) are now pinned end to end. Cap 8 is sized to
      // bite at sf0.1 (drops ~61% of shingles, p99 df = 18) while
      // staying non-trivial at the small fixtures.
      (s, d) => graft.api.Graft
        .ngramJaccardPairsFromShingles(
          sharedShingles(s, d, reuse = true), "doc_id", threshold = 0.5,
          maxShingleDf = 8)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
          round(col("jac"), 4).as("jac"))
        .orderBy("doc_a", "doc_b"),
      Some("WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w " +
        "FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, " +
        "array_to_string(list_slice(w, g, g+2), ' ') AS s FROM toks, " +
        "UNNEST(generate_series(1, len(w)-2)) AS t(g)), " +
        "hh AS (SELECT doc_id, CAST(concat('0x', " +
        "substring(md5(s), 1, 15)) AS BIGINT) AS h FROM sh), " +
        "adm AS (SELECT h FROM (SELECT h, COUNT(*) AS df FROM hh " +
        "GROUP BY h) WHERE df <= 8), " +
        "hq AS (SELECT hh.doc_id, hh.h FROM hh JOIN adm USING (h)), " +
        "cnt AS (SELECT doc_id, COUNT(*) AS n FROM hq GROUP BY doc_id), " +
        "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) " +
        "AS i FROM hq a JOIN hq b ON a.h = b.h AND a.doc_id < b.doc_id " +
        "GROUP BY 1, 2) " +
        "SELECT doc_a, doc_b, ROUND(CAST(i AS DOUBLE)/(ca.n + cb.n - i), 4) " +
        "AS jac FROM inter JOIN cnt ca ON doc_a = ca.doc_id " +
        "JOIN cnt cb ON doc_b = cb.doc_id " +
        "WHERE CAST(i AS DOUBLE)/(ca.n + cb.n - i) >= 0.5 " +
        "ORDER BY doc_a, doc_b")),

    Q("d14_containment",
      // Asymmetric inclusion detection (Broder's containment, vs d04's
      // symmetric resemblance): |S(a)∩S(b)| / |S(a)| — a short document
      // quoted wholesale inside a long one scores ~0 Jaccard but 1.0
      // containment, which is the quote/boilerplate/aggregator-page
      // signal. Ordered pairs, exact and fully relational, so the
      // oracle recomputes it verbatim. Same shingle equi-join shuffle
      // as d04, reading the session-shared shingle listing
      // ([[sharedShingles]]). See [[graft.api.Graft.containmentPairs]].
      (s, d) => graft.api.Graft
        .containmentPairsFromShingles(
          sharedShingles(s, d, reuse = true), "doc_id", threshold = 0.8)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
          round(col("containment"), 4).as("containment"))
        .orderBy("doc_a", "doc_b"),
      // hash-space replay (Graft.shingleKey), as d04
      Some("WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w " +
        "FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, " +
        "array_to_string(list_slice(w, g, g+2), ' ') AS s FROM toks, " +
        "UNNEST(generate_series(1, len(w)-2)) AS t(g)), " +
        "hh AS (SELECT doc_id, CAST(concat('0x', " +
        "substring(md5(s), 1, 15)) AS BIGINT) AS h FROM sh), " +
        "cnt AS (SELECT doc_id, COUNT(*) AS n FROM hh GROUP BY doc_id), " +
        "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) " +
        "AS i FROM hh a JOIN hh b ON a.h = b.h AND a.doc_id <> b.doc_id " +
        "GROUP BY 1, 2) " +
        "SELECT doc_a, doc_b, ROUND(CAST(i AS DOUBLE)/ca.n, 4) " +
        "AS containment FROM inter JOIN cnt ca ON doc_a = ca.doc_id " +
        "WHERE CAST(i AS DOUBLE)/ca.n >= 0.8 " +
        "ORDER BY doc_a, doc_b")),

    Q("d07_dup_clusters",
      // Pairs -> groups: connected components over the n-gram Jaccard
      // near-dup pairs (d04's exact pair set), every document labeled
      // with the min doc_id reachable through the pair graph (singletons
      // label themselves) — the keep-one-per-cluster decision that
      // follows any pair-producing dedup. Min-label propagation: each
      // round is an equi-join + min-agg hash-partitioned by id, and dup
      // clusters are near-cliques so it converges in 2-3 rounds at any
      // scale; see [[graft.api.Graft.dupClusters]]. The oracle computes
      // the same closure with a recursive CTE. Builds fresh and leaves
      // the materialized clusters for d16 ([[jaccardClusters]]).
      (s, d) => jaccardClusters(s, d).orderBy("doc_id"),
      Some(JaccardClustersOracle)),

    Q("d10_dup_clusters_largestar",
      // The SAME clustering contract as d07 (min-id per component over
      // d04's pair set) computed by the O(log d) large-star/small-star
      // contraction instead of O(d) label propagation — the variant for
      // chain-shaped graphs where propagation's round count explodes.
      // Identical results by definition, so it shares d07's recursive-
      // CTE oracle; this puts the contraction path on the hash-checked
      // gate (round-4 verdict: it was the one public API entry point
      // with no CORRECTNESS row). See
      // [[graft.api.Graft.dupClustersLargeStar]].
      (s, d) => graft.api.Graft.dupClustersLargeStar(
        docs(s, d), "doc_id",
        graft.api.Graft.ngramJaccardPairs(docs(s, d), "doc_id", "text",
          n = 3, threshold = 0.5),
        "id_a", "id_b")
        .orderBy("doc_id"),
      Some(JaccardClustersOracle)),

    Q("d16_keep_best_per_cluster",
      // The keep decision after clustering: one document survives per
      // near-dup cluster (d07's components over d04's exact pair set) —
      // the longest member (max n_chars, ties to the smaller id), the
      // standard keep-longest curation heuristic. `kept = false` rows
      // are the corpus the dedup actually removes; the oracle replays
      // the recursive closure plus the same argmax window. Reuses the
      // clusters d07 materialized this session ([[jaccardClusters]] —
      // r8 verdict: the fused form re-ran the whole pair generation +
      // propagation, the bench's single most expensive query); the
      // keep pick itself is one cluster_id shuffle + row_number. See
      // [[graft.api.Graft.keepBestFromClusters]].
      (s, d) => graft.api.Graft.keepBestFromClusters(
        docs(s, d), "doc_id", "n_chars",
        jaccardClusters(s, d, reuse = true))
        .orderBy("doc_id"),
      Some(JaccardClustersCte +
        "SELECT c.id AS doc_id, c.cluster_id, " +
        "CAST(d.n_chars AS BIGINT) AS n_chars, " +
        "ROW_NUMBER() OVER (PARTITION BY c.cluster_id " +
        "ORDER BY d.n_chars DESC, c.id) = 1 AS kept " +
        "FROM (SELECT id, MIN(lab) AS cluster_id FROM reach " +
        "GROUP BY id) c JOIN documents d ON c.id = d.doc_id " +
        "ORDER BY doc_id")),

    Q("d20_dedup_impact",
      // The dedup impact report every production run emits: cluster-size
      // histogram with documents and characters removed per size bucket
      // — the "what did dedup buy us" number that decides whether the
      // pipeline stage pays for itself. chars_removed assumes d16's
      // keep-longest rule and is tie-INDEPENDENT by construction
      // (sum(n_chars) - max(n_chars) per cluster, whichever longest
      // member survives). Third consumer of the session-shared cluster
      // listing ([[jaccardClusters]]), so the report costs two tiny
      // aggregations over (doc_id, cluster_id) — cluster_id then
      // cluster_size — never a re-clustering.
      (s, d) => {
        val perCluster = jaccardClusters(s, d, reuse = true)
          .join(docs(s, d).select(col("doc_id"), col("n_chars")), "doc_id")
          .groupBy("cluster_id")
          .agg(count(lit(1)).as("cluster_size"),
            (sum(col("n_chars")) - max(col("n_chars")))
              .cast("bigint").as("chars_removed"))
        perCluster.groupBy("cluster_size")
          .agg(count(lit(1)).as("n_clusters"),
            sum(col("chars_removed")).cast("bigint").as("chars_removed"))
          .select(col("cluster_size"), col("n_clusters"),
            ((col("cluster_size") - 1) * col("n_clusters"))
              .cast("bigint").as("docs_removed"),
            col("chars_removed"))
          .orderBy("cluster_size")
      },
      Some(JaccardClustersCte +
        "SELECT CAST(cluster_size AS BIGINT) AS cluster_size, " +
        "CAST(COUNT(*) AS BIGINT) AS n_clusters, " +
        "CAST((cluster_size - 1) * COUNT(*) AS BIGINT) AS docs_removed, " +
        "CAST(SUM(chars_removed) AS BIGINT) AS chars_removed " +
        "FROM (SELECT c.cluster_id, COUNT(*) AS cluster_size, " +
        "SUM(d.n_chars) - MAX(d.n_chars) AS chars_removed " +
        "FROM (SELECT id, MIN(lab) AS cluster_id FROM reach GROUP BY id) c " +
        "JOIN documents d ON c.id = d.doc_id GROUP BY c.cluster_id) " +
        "GROUP BY cluster_size ORDER BY cluster_size")),

    Q("d08_dup_clusters_minhash",
      // The composed 100 TB dedup path end-to-end: MinHash+LSH pair
      // generation (d02) feeding connected-components clustering (d07)
      // — pairs from the sketch, groups from propagation, one keep-id
      // per group derivable downstream. Exercises the API composition
      // users actually run; the oracle rebuilds the identical pipeline
      // (d02's CTE chain + the recursive closure).
      (s, d) => graft.api.Graft.dupClusters(
        docs(s, d), "doc_id",
        graft.api.Graft.minhashLshPairs(docs(s, d), "doc_id", "text",
          k = MinhashK, bands = Bands, threshold = 0.5),
        "id_a", "id_b")
        .orderBy("doc_id"),
      Some {
        val R = MinhashK / Bands
        val minCols = (0 until MinhashK).map { i =>
          val (seed, slice) = (i / 4, i % 4)
          s"MIN(CAST(concat('0x', substring(md5(concat('$seed:', s)), " +
            s"${8 * slice + 1}, 8)) AS BIGINT)) AS m$i"
        }.mkString(", ")
        val bandSelects = (0 until Bands).map { j =>
          val cols = (0 until R).map(r => s"m${j * R + r}").mkString(", ")
          s"SELECT doc_id, $j AS band, md5(concat_ws(',', $cols, '$j')) " +
            "AS bh FROM sig"
        }.mkString(" UNION ALL ")
        val agree = (0 until MinhashK).map(i =>
          s"CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END").mkString(" + ")
        "WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') " +
          "AS w FROM documents), " +
          "sh AS (SELECT DISTINCT doc_id, " +
          "array_to_string(list_slice(w, g, g+2), ' ') AS s FROM toks, " +
          "UNNEST(generate_series(1, len(w)-2)) AS t(g)), " +
          s"sig AS (SELECT doc_id, $minCols FROM sh GROUP BY doc_id), " +
          s"bands AS ($bandSelects), " +
          "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b " +
          "FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh " +
          "AND a.doc_id < b.doc_id), " +
          s"pairs AS (SELECT doc_a, doc_b FROM cand " +
          "JOIN sig sa ON doc_a = sa.doc_id " +
          "JOIN sig sb ON doc_b = sb.doc_id " +
          s"WHERE CAST(($agree) AS DOUBLE)/$MinhashK >= 0.5), " +
          "edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs " +
          "UNION ALL SELECT doc_b, doc_a FROM pairs), " +
          "reach(id, lab) AS (SELECT doc_id, doc_id FROM documents " +
          "UNION SELECT e.d, r.lab FROM reach r JOIN edges e " +
          "ON e.s = r.id) " +
          "SELECT id AS doc_id, MIN(lab) AS cluster_id FROM reach " +
          "GROUP BY id ORDER BY doc_id"
      }),

    Q("d17_containment_minhash",
      // d14's containment by SKETCH: LSH band buckets generate the
      // candidates (the d02 machinery — no shingle self-join) and the
      // containment derives from the signature-agreement Jaccard
      // estimate plus the two exact shingle counts:
      // ĉ(A⊆B) = ĵ·(|A|+|B|) / ((1+ĵ)·|A|), capped at 1. Everything is
      // deterministic md5 arithmetic, so the oracle reproduces the
      // estimate bit-for-bit. Known recall limit for A≪B inclusions
      // (their Jaccard is small, so banding fades) — documented; d14
      // is the exact op. Reads the session-shared shingle listing
      // ([[sharedShingles]]) for both the signatures and the size
      // counts. See [[graft.api.Graft.containmentMinhashPairs]].
      (s, d) => graft.api.Graft.containmentMinhashPairsFromShingles(
        sharedShingles(s, d, reuse = true), "doc_id",
        k = MinhashK, bands = Bands, threshold = 0.8)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
          col("est_containment"))
        .orderBy("doc_a", "doc_b"),
      Some {
        val R = MinhashK / Bands
        val minCols = (0 until MinhashK).map { i =>
          val (seed, slice) = (i / 4, i % 4)
          s"MIN(CAST(concat('0x', substring(md5(concat('$seed:', s)), " +
            s"${8 * slice + 1}, 8)) AS BIGINT)) AS m$i"
        }.mkString(", ")
        val bandSelects = (0 until Bands).map { j =>
          val cols = (0 until R).map(r => s"m${j * R + r}").mkString(", ")
          s"SELECT doc_id, $j AS band, md5(concat_ws(',', $cols, '$j')) " +
            "AS bh FROM sig"
        }.mkString(" UNION ALL ")
        val agree = (0 until MinhashK).map(i =>
          s"CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END").mkString(" + ")
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') " +
          "AS w FROM documents), " +
          "sh AS (SELECT DISTINCT doc_id, " +
          "array_to_string(list_slice(w, g, g+2), ' ') AS s FROM toks, " +
          "UNNEST(generate_series(1, len(w)-2)) AS t(g)), " +
          s"sig AS (SELECT doc_id, $minCols FROM sh GROUP BY doc_id), " +
          "cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh " +
          "GROUP BY doc_id), " +
          s"bands AS ($bandSelects), " +
          "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b " +
          "FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh " +
          "AND a.doc_id < b.doc_id), " +
          "ej AS (SELECT doc_a, doc_b, " +
          s"CAST(($agree) AS DOUBLE)/$MinhashK AS est_jac FROM cand " +
          "JOIN sig sa ON doc_a = sa.doc_id " +
          "JOIN sig sb ON doc_b = sb.doc_id), " +
          "bo AS (SELECT doc_a, doc_b, est_jac FROM ej " +
          "UNION ALL SELECT doc_b, doc_a, est_jac FROM ej) " +
          "SELECT doc_a, doc_b, " +
          "ROUND(LEAST(est_jac * (ca.n + cb.n) / " +
          "((1.0 + est_jac) * ca.n), 1.0), 4) AS est_containment " +
          "FROM bo JOIN cnt ca ON doc_a = ca.doc_id " +
          "JOIN cnt cb ON doc_b = cb.doc_id " +
          "WHERE est_jac * (ca.n + cb.n) / ((1.0 + est_jac) * ca.n) " +
          ">= 0.8 ORDER BY doc_a, doc_b"
      }),

    Q("d18_containment_bottomk",
      // The TRUE asymmetric containment sketch (bottom-k — Broder;
      // Cohen & Kaplan; the Mash-Screen shape), closing d17's
      // documented small-in-big recall hole: each document keeps its k
      // smallest distinct shingle hashes and ĉ(A⊆B) = the fraction of
      // A's sketch found in B's full hash set — a verbatim inclusion
      // scores exactly 1.0 regardless of |B|/|A|, where d17's banding
      // fades as the ratio grows. The corpus is AUGMENTED with
      // constructed strict inclusions (first 12 words of every >= 40-
      // word document, id offset +1,000,000 — |A|≪|B| by construction,
      // derived deterministically from the fixture so the oracle
      // rebuilds them identically); SketchAccuracySpec asserts the
      // recall contract vs exact d14 on exactly these pairs. All md5
      // arithmetic, so the oracle replays the sketch bit for bit. See
      // [[graft.api.Graft.bottomKContainmentPairs]].
      (s, d) => {
        val base = docs(s, d).select(col("doc_id"), col("text"))
        val frags = base
          .filter(size(split(col("text"), " ")) >= 40)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"),
            concat_ws(" ", slice(split(col("text"), " "), 1, 12))
              .as("text"))
        // The augmented corpus's HASH table = the session-shared base
        // hash listing ∪ the fragments' own (small) shingle+hash build:
        // frag ids are disjoint from base ids (offset +1e6), so the
        // per-document distinct is preserved by the union. Both sides
        // are session-shared materializations (r9: the shingle listing;
        // r10 verdict item 7: the h0 hash tables on top) — the union
        // feeds FOUR consumers inside the bottom-k op (df guard,
        // per-doc counts, sketch window, full-side join), so an
        // unmaterialized frag build would re-tokenize the corpus once
        // per consumer per evaluation.
        val sh = sharedShingleHashes(s, d, reuse = true).unionByName(
          ListingCache.shared("d18_frag_h0", s, d, reuse = true) {
            graft.api.Graft.hashShingles(
              graft.api.Graft.shingles(frags, "doc_id", "text"), "doc_id")
          })
        graft.api.Graft.bottomKContainmentPairsFromHashes(
          sh, "doc_id", k = 16, threshold = 0.8)
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
            round(col("est_containment"), 4).as("est_containment"))
          .orderBy("doc_a", "doc_b")
      },
      Some(
        "WITH words AS (SELECT doc_id, string_split(text, ' ') AS w " +
          "FROM documents), " +
          "corpus AS (SELECT doc_id, text FROM documents UNION ALL " +
          "SELECT doc_id + 1000000 AS doc_id, " +
          "array_to_string(list_slice(w, 1, 12), ' ') AS text " +
          "FROM words WHERE len(w) >= 40), " +
          "toks AS (SELECT doc_id, string_split(text, ' ') AS w " +
          "FROM corpus), " +
          "sh AS (SELECT DISTINCT doc_id, " +
          "array_to_string(list_slice(w, g, g+2), ' ') AS s FROM toks, " +
          "UNNEST(generate_series(1, len(w)-2)) AS t(g)), " +
          "hashed AS (SELECT DISTINCT doc_id, " +
          "CAST(concat('0x', substring(md5(concat('0:', s)), 1, 8)) " +
          "AS BIGINT) AS h FROM sh), " +
          "cnt AS (SELECT doc_id, COUNT(*) AS nh FROM hashed " +
          "GROUP BY doc_id), " +
          "sk AS (SELECT doc_id, h FROM (SELECT doc_id, h, " +
          "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h) AS rn " +
          "FROM hashed) WHERE rn <= 16), " +
          "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
          "COUNT(*) AS i FROM sk a JOIN hashed b ON a.h = b.h " +
          "AND a.doc_id <> b.doc_id GROUP BY 1, 2) " +
          "SELECT doc_a, doc_b, " +
          "ROUND(CAST(i AS DOUBLE)/LEAST(16, c.nh), 4) " +
          "AS est_containment " +
          "FROM inter JOIN cnt c ON doc_a = c.doc_id " +
          "WHERE CAST(i AS DOUBLE)/LEAST(16, c.nh) >= 0.8 " +
          "ORDER BY doc_a, doc_b")),

    Q("d05_embed_cosine_dup",
      (s, d) => graft.api.Graft
        .cosinePairsExact(Tables.load(s, d, "embeddings"), "vec_id",
          "embedding", threshold = 0.45)
        .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"),
          round(col("cos"), 4).as("cos"))
        .orderBy("vec_a", "vec_b"),
      Some("WITH n AS (SELECT vec_id, embedding, " +
        "sqrt(list_sum(list_transform(list_zip(embedding, embedding), " +
        "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))) AS nrm " +
        "FROM embeddings), " +
        "p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, " +
        "list_sum(list_transform(list_zip(a.embedding, b.embedding), " +
        "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / " +
        "(a.nrm * b.nrm) AS cos FROM n a JOIN n b ON a.vec_id < b.vec_id) " +
        "SELECT vec_a, vec_b, ROUND(cos, 4) AS cos FROM p " +
        "WHERE cos >= 0.45 ORDER BY vec_a, vec_b")),

    Q("d11_blocked_dedup",
      // Blocking, the third candidate-cutting strategy next to LSH (d06)
      // and banding (d02): exact cosine pairs computed only WITHIN a
      // blocking key — here the embedding `label` (in practice language,
      // source, cluster id). With K balanced blocks the pair space drops
      // K-fold while staying exact and deterministic ON the blocked
      // definition; cross-block dups are the accepted miss, which is why
      // pipelines block on keys dups can't straddle. Physically one
      // equi-join shuffle-partitioned by block — no cartesian; the
      // oracle is the literal within-block definition. See
      // [[graft.api.Graft.blockedCosinePairs]].
      (s, d) => graft.api.Graft
        .blockedCosinePairs(Tables.load(s, d, "embeddings"), "vec_id",
          "embedding", "label", threshold = 0.45)
        .select(col("block").cast("bigint").as("block"),
          col("id_a").as("vec_a"), col("id_b").as("vec_b"),
          round(col("cos"), 4).as("cos"))
        .orderBy("vec_a", "vec_b"),
      Some("WITH n AS (SELECT vec_id, label, embedding, " +
        "sqrt(list_sum(list_transform(list_zip(embedding, embedding), " +
        "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))) AS nrm " +
        "FROM embeddings), " +
        "p AS (SELECT CAST(a.label AS BIGINT) AS block, " +
        "a.vec_id AS vec_a, b.vec_id AS vec_b, " +
        "list_sum(list_transform(list_zip(a.embedding, b.embedding), " +
        "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / " +
        "(a.nrm * b.nrm) AS cos FROM n a JOIN n b " +
        "ON a.label = b.label AND a.vec_id < b.vec_id) " +
        "SELECT block, vec_a, vec_b, ROUND(cos, 4) AS cos FROM p " +
        "WHERE cos >= 0.45 ORDER BY vec_a, vec_b")),

    Q("d12_semantic_dedup",
      // SemDeDup (Abbas et al. 2023): k-means clusters as the candidate
      // cutter, exact cosine only within clusters — the fourth candidate
      // strategy next to LSH (d06), banding (d02) and static blocking
      // (d11), and the one that works when no blocking key exists and
      // near-dups are SEMANTIC (paraphrases with high embedding cosine).
      // The pair list depends on the learned clustering, so like d06 the
      // gate emits the accuracy contract as one DuckDB-checkable row:
      // n_exact (DuckDB recomputes d05's pair count), false_positives=0
      // (within-cluster pairs get the exact cosine + threshold, so
      // semantic pairs ⊆ exact pairs by construction), and recall >= the
      // 0.6 floor. Gate parameters: nlist=5 with 2-probe assignment —
      // this synthetic corpus is nearly unclustered, so single-probe
      // SemDeDup loses boundary pairs (measured ~0.2-0.6 recall);
      // 2-probe lifts it to ~0.86-0.93 across fixtures (real corpora
      // cluster far better). The floor is the regression tripwire;
      // SketchAccuracySpec asserts the measured value.
      // See [[graft.api.Graft.semanticDedupPairs]].
      (s, d) => {
        val emb = Tables.load(s, d, "embeddings")
        // nlist scales with the corpus (the operator's contract — the
        // paper uses tens of thousands of clusters at web scale) via
        // graft.api.Graft.deriveNlist: ~400 vectors per cluster below
        // the 2.56M-vector crossover (keeps within-cluster pair work
        // linear-ish in n), the Faiss 4*sqrt(n) convention past it
        // (caps the assignment pass at O(n^1.5)). All committed
        // fixtures land at nlist=5; the 10x scale check exercises the
        // scaled value.
        val nlist = math.max(5, graft.api.Graft.deriveNlist(emb.count()))
        val sem = graft.api.Graft
          .semanticDedupPairs(emb, "vec_id", "embedding",
            nlist = nlist, iters = 2, threshold = 0.45)
          .select(col("id_a"), col("id_b"))
        // contract arms on the deterministic sample (see sampledVectors);
        // the operator itself ran on the full corpus above
        val sampled = sampledVectors(emb, 1000L)
        val sIds = sampled.select(col("vec_id"))
        val semS = sem
          .join(sIds.select(col("vec_id").as("id_a")), Seq("id_a"),
            "left_semi")
          .join(sIds.select(col("vec_id").as("id_b")), Seq("id_b"),
            "left_semi")
        val exact = graft.api.Graft
          .cosinePairsExact(sampled, "vec_id", "embedding",
            threshold = 0.45)
          .select(col("id_a"), col("id_b"))
        val stats = semS
          .join(exact.withColumn("hit", lit(1L)), Seq("id_a", "id_b"),
            "left")
          .agg(
            coalesce(sum(when(col("hit").isNull, 1L).otherwise(0L)),
              lit(0L)).as("false_positives"),
            coalesce(sum(col("hit")), lit(0L)).as("hits"))
        stats.crossJoin(exact.agg(count(lit(1)).as("n_exact")))
          .select(col("n_exact"), col("false_positives"),
            (col("hits") >= col("n_exact") * 0.6).as("recall_ok"))
      },
      Some("WITH " + sampledSql + ", " +
        "n AS (SELECT vec_id, embedding, " +
        "sqrt(list_sum(list_transform(list_zip(embedding, embedding), " +
        "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))) AS nrm " +
        "FROM smp), " +
        "p AS (SELECT list_sum(list_transform(" +
        "list_zip(a.embedding, b.embedding), " +
        "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / " +
        "(a.nrm * b.nrm) AS cos FROM n a JOIN n b " +
        "ON a.vec_id < b.vec_id) " +
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_exact, " +
        "CAST(0 AS BIGINT) AS false_positives, true AS recall_ok " +
        "FROM p WHERE cos >= 0.45")),

    Q("d06_embed_cosine_lsh",
      // The 100 TB version of d05: candidate pairs come from the
      // multi-table LSH index (match in ANY table on the exact code or a
      // hamming-1 probe), then ONLY candidates get the exact double-
      // precision cosine + threshold. d05's all-pairs BNLJ is O(n²) in
      // dot products; here pair generation is an equi-join on
      // (table, code) — shuffle-partitioned by bucket — and the exact
      // math runs on the short list.
      //
      // The pair list itself is approximate (candidate recall < 1), so
      // it can't be hash-compared; the gate instead emits the accuracy
      // contract rendered as one row DuckDB CAN check: n_exact (DuckDB
      // recomputes d05's pair count), false_positives = 0 (the exact
      // cosine filter runs on every candidate, so LSH pairs ⊆ exact
      // pairs by construction — a drifted threshold or broken rerank
      // makes this nonzero), and recall >= the 0.5 floor
      // SketchAccuracySpec asserts. The user-facing pair list stays
      // available via graft.api.Graft.lshCosinePairs.
      (s, d) => {
        val emb = Tables.load(s, d, "embeddings")
        // The operator under test runs on the FULL corpus; only the
        // contract's quadratic exact arm is sampled (see sampledVectors)
        val sampled = sampledVectors(emb, 1000L)
        val sIds = sampled.select(col("vec_id"))
        val lsh = graft.api.Graft
          .lshCosinePairs(emb, "vec_id", "embedding", threshold = 0.45)
          .select(col("id_a"), col("id_b"))
          .join(sIds.select(col("vec_id").as("id_a")), Seq("id_a"),
            "left_semi")
          .join(sIds.select(col("vec_id").as("id_b")), Seq("id_b"),
            "left_semi")
        val exact = graft.api.Graft
          .cosinePairsExact(sampled, "vec_id", "embedding",
            threshold = 0.45)
          .select(col("id_a"), col("id_b"))
        val stats = lsh
          .join(exact.withColumn("hit", lit(1L)), Seq("id_a", "id_b"),
            "left")
          .agg(
            coalesce(sum(when(col("hit").isNull, 1L).otherwise(0L)),
              lit(0L)).as("false_positives"),
            coalesce(sum(col("hit")), lit(0L)).as("hits"))
        stats.crossJoin(exact.agg(count(lit(1)).as("n_exact")))
          .select(col("n_exact"), col("false_positives"),
            (col("hits") >= col("n_exact") * 0.5).as("recall_ok"))
      },
      Some("WITH " + sampledSql + ", " +
        "n AS (SELECT vec_id, embedding, " +
        "sqrt(list_sum(list_transform(list_zip(embedding, embedding), " +
        "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))) AS nrm " +
        "FROM smp), " +
        "p AS (SELECT list_sum(list_transform(" +
        "list_zip(a.embedding, b.embedding), " +
        "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / " +
        "(a.nrm * b.nrm) AS cos FROM n a JOIN n b " +
        "ON a.vec_id < b.vec_id) " +
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_exact, " +
        "CAST(0 AS BIGINT) AS false_positives, true AS recall_ok " +
        "FROM p WHERE cos >= 0.45")),

    Q("d21_curate_report",
      // The end-to-end curation pipeline as ONE public-API call
      // ([[graft.api.Graft.curate]]): quality band -> language filter ->
      // exact dedup -> MinHash-LSH near-dedup (pairs -> components ->
      // keep-best) -> token-budget mixture, emitting the one-row impact
      // report a production run reads (cumulative survivor counts per
      // stage + d20's tie-independent chars-removed + the admitted
      // mix). Every stage is the operator its own gate query already
      // hash-checks (t02/t03/d01/d02/d07/d16/t23); this row proves they
      // COMPOSE — the integration a 100 TB user actually executes. The
      // oracle replays the full chain: t09's quality/langid CTEs, d01's
      // digest keeper, d08's minhash CTE stack + recursive closure
      // rebased onto the exact-deduped survivor set, d16's keep window,
      // t23's priority-window mixture.
      (s, d) => graft.api.Graft.curate(
        docs(s, d), "doc_id", "text", "n_chars", "source",
        CurateStopwords, "en", 20L, 1000L,
        Seq("src0" -> 7000L, "src1" -> 6000L, "src7" -> 5000L,
          "src19" -> 2000L),
        minhashK = MinhashK, bands = Bands, jaccardThreshold = 0.5),
      Some {
        val R = MinhashK / Bands
        val minCols = (0 until MinhashK).map { i =>
          val (seed, slice) = (i / 4, i % 4)
          s"MIN(CAST(concat('0x', substring(md5(concat('$seed:', s)), " +
            s"${8 * slice + 1}, 8)) AS BIGINT)) AS m$i"
        }.mkString(", ")
        val bandSelects = (0 until Bands).map { j =>
          val cols = (0 until R).map(r => s"m${j * R + r}").mkString(", ")
          s"SELECT doc_id, $j AS band, md5(concat_ws(',', $cols, '$j')) " +
            "AS bh FROM sig"
        }.mkString(" UNION ALL ")
        val agree = (0 until MinhashK).map(i =>
          s"CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END").mkString(" + ")
        "WITH RECURSIVE " +
          "q AS (SELECT doc_id FROM documents " +
          "WHERE len(string_split(text, ' ')) BETWEEN 20 AND 1000), " +
          "scl AS (SELECT doc_id, " +
          "len(regexp_extract_all(text, '\\b(the|a|of|and|to|in|is)\\b')) AS en, " +
          "len(regexp_extract_all(text, '\\b(le|la|les|et|de|un|une)\\b')) AS fr, " +
          "len(regexp_extract_all(text, '\\b(el|los|las|y|que|un|una)\\b')) AS es, " +
          "len(regexp_extract_all(text, '\\b(der|die|das|und|ein|zu)\\b')) AS de " +
          "FROM documents), " +
          "l AS (SELECT doc_id FROM scl WHERE " +
          "en >= fr AND en >= es AND en >= de), " +
          "s1 AS (SELECT d.doc_id, d.text, d.n_chars, d.source " +
          "FROM documents d JOIN q USING (doc_id) JOIN l USING (doc_id)), " +
          "k AS (SELECT MIN(doc_id) AS doc_id FROM s1 " +
          "GROUP BY sha256(text)), " +
          "s2 AS (SELECT s1.* FROM s1 JOIN k USING (doc_id)), " +
          "toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM s2), " +
          "sh AS (SELECT DISTINCT doc_id, " +
          "array_to_string(list_slice(w, g, g+2), ' ') AS s FROM toks, " +
          "UNNEST(generate_series(1, len(w)-2)) AS t(g)), " +
          s"sig AS (SELECT doc_id, $minCols FROM sh GROUP BY doc_id), " +
          s"bnd AS ($bandSelects), " +
          "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b " +
          "FROM bnd a JOIN bnd b ON a.band = b.band AND a.bh = b.bh " +
          "AND a.doc_id < b.doc_id), " +
          s"prs AS (SELECT doc_a, doc_b FROM cand " +
          "JOIN sig sa ON doc_a = sa.doc_id " +
          "JOIN sig sb ON doc_b = sb.doc_id " +
          s"WHERE CAST(($agree) AS DOUBLE)/$MinhashK >= 0.5), " +
          "edges AS (SELECT doc_a AS s, doc_b AS d FROM prs " +
          "UNION ALL SELECT doc_b, doc_a FROM prs), " +
          "reach(id, lab) AS (SELECT doc_id, doc_id FROM s2 " +
          "UNION SELECT e.d, r.lab FROM reach r JOIN edges e " +
          "ON e.s = r.id), " +
          "cl AS (SELECT id AS doc_id, MIN(lab) AS cluster_id FROM reach " +
          "GROUP BY id), " +
          "kb AS (SELECT cl.doc_id, cl.cluster_id, s2.n_chars, s2.source, " +
          "ROW_NUMBER() OVER (PARTITION BY cl.cluster_id " +
          "ORDER BY s2.n_chars DESC, cl.doc_id) AS rn " +
          "FROM cl JOIN s2 USING (doc_id)), " +
          "s3 AS (SELECT doc_id, n_chars, source FROM kb WHERE rn = 1), " +
          "rmv AS (SELECT cluster_id, SUM(n_chars) - MAX(n_chars) AS r " +
          "FROM kb GROUP BY cluster_id), " +
          "w(source, budget) AS (VALUES ('src0', 7000), ('src1', 6000), " +
          "('src7', 5000), ('src19', 2000)), " +
          "b AS (SELECT doc_id, s3.source, n_chars, budget, " +
          "CAST(concat('0x', substring(md5(concat('mix:', " +
          "CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS pri " +
          "FROM s3 JOIN w USING (source)), " +
          "c AS (SELECT doc_id, n_chars, budget, " +
          "SUM(n_chars) OVER (PARTITION BY source ORDER BY pri, doc_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum " +
          "FROM b), " +
          "adm AS (SELECT doc_id, n_chars FROM c WHERE cum <= budget) " +
          "SELECT " +
          "(SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_input, " +
          "(SELECT CAST(COUNT(*) AS BIGINT) FROM q) AS n_quality, " +
          "(SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_lang, " +
          "(SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n_exact, " +
          "(SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n_near, " +
          "(SELECT CAST(COALESCE(SUM(r), 0) AS BIGINT) FROM rmv) " +
          "AS chars_removed_near, " +
          "(SELECT CAST(COUNT(*) AS BIGINT) FROM adm) AS n_admitted, " +
          "(SELECT CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) FROM adm) " +
          "AS tok_admitted"
      })
  )
}
