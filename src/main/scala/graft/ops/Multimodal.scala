package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with typed metadata. The real decode step (image/audio codecs) is NOT
  * available in this container, so the decode/resize kernels are
  * clearly-marked deterministic stand-ins (`FrameMeans` frame stats,
  * `StrideSample` decimation — the seams a real codec/resample kernel
  * would fill, same BINARY-in signatures); everything Spark-side —
  * binary schema, map-only codegen'd kernels, metadata extraction with
  * built-ins — is real, declarative, and tested. As of r9 the whole
  * family is expression-based: no mapPartitions anywhere (r8 verdict).
  *
  * Fixture note: there is no binary media table in the test data, so the
  * payload is derived (`encode(text)`), which exercises the identical
  * Spark plumbing a real `content BINARY` column would.
  */
object Multimodal {

  /** The m11/m13 augmented near-dup corpus, factored OUT of the gate
    * bodies so the construction is pinned in ONE place
    * (AugmentedCorpusSpec) and fixture drift cannot silently change
    * the constructed pair set on one consumer but not the other (r14
    * verdict item 8; the r8 timestamp lesson). Every 7th document
    * (with ≥ 2 characters) re-appears under id + 1,000,000 with its
    * first and last characters swapped — a byte-SUM-preserving
    * perturbation of the UTF-8 payload, so only the aHash chunks
    * holding those characters' bytes can flip and each copy sits
    * within hamming distance 2 of its source in BOTH the 60-bit and
    * the 120-bit metric. */
  private[graft] def ahashAugmentedCorpus(s: SparkSession, d: String)
      : DataFrame = {
    val base = Tables.load(s, d, "documents")
      .filter(length(col("text")) >= 2)
      .select(col("doc_id"), col("text"))
    val perturbed = base
      .filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"),
        expr("concat(substring(text, length(text), 1), " +
          "substring(text, 2, length(text) - 2), " +
          "substring(text, 1, 1))").as("text"))
    base.unionByName(perturbed)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
  }

  /** The (stub) decoder's fixed geometry: 16-byte "frames", every 4th
    * sampled — shared by m02's declarative formulation and its oracle. */
  private object FakeDecoder {
    val FrameBytes = 16
    val SampleEvery = 4
  }

  val defs: Seq[Q] = Seq(

    Q("m01_media_meta",
      // Metadata over the opaque binary column: all codegen'd built-ins,
      // no decode needed — this is the "cheap pass" a media pipeline runs
      // first (sizing, content hashing for dedup/caching).
      (s, d) => graft.api.Graft.mediaMeta(
        Tables.load(s, d, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")),
        "doc_id", "payload")
        .orderBy("doc_id"),
      Some("SELECT doc_id, octet_length(encode(text)) AS nbytes, " +
        "md5(text) AS digest FROM documents ORDER BY doc_id")),

    Q("m02_frame_features",
      // Decode/feature-extract path, fully declarative (r8 verdict: the
      // last mapPartitions decode stub, promoted): the native FrameMeans
      // kernel emits one exact mean per 16-byte frame in a single
      // codegen'd pass, the stub's every-4th-frame sampling is an
      // indexed HOF filter over that bounded array, and the sampled
      // mean-of-means equals the stub's mean-over-sampled-bytes BIT FOR
      // BIT: frames are complete (equal weight) and each per-frame mean
      // is an integer sum over the dyadic divisor 16 — exact in doubles
      // — so sum(means)/n and sum(bytes)/(16n) are the same correctly-
      // rounded division of the same exact rational. Map-only plan
      // (PlanPropertiesSpec); the oracle rebuilds the same frame math
      // over the (ASCII) payload as a string.
      (s, d) => Tables.load(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .select(col("doc_id"),
          graft.functions.MediaExpressions
            .frameMeans(col("payload"), FakeDecoder.FrameBytes).as("fm"))
        .select(col("doc_id"),
          size(col("fm")).cast("bigint").as("n_frames"),
          expr(s"filter(fm, (x, i) -> i % ${FakeDecoder.SampleEvery} = 0)")
            .as("sm"))
        .select(col("doc_id"), col("n_frames"),
          when(size(col("sm")) === 0, lit(0.0))
            .otherwise(round(
              expr("aggregate(sm, CAST(0 AS DOUBLE), (a, x) -> a + x)") /
                size(col("sm")), 4))
            .as("mean_val"))
        .orderBy("doc_id"),
      Some("WITH p AS (SELECT doc_id, text, length(text)//16 AS nf " +
        "FROM documents), " +
        "b AS (SELECT doc_id, " +
        "unicode(substring(text, CAST(f*16+o AS BIGINT), 1)) AS v " +
        "FROM p, UNNEST(generate_series(0, nf-1, 4)) t(f), " +
        "UNNEST(generate_series(1, 16)) u(o) WHERE nf >= 1), " +
        "m AS (SELECT doc_id, ROUND(SUM(v)::DOUBLE / COUNT(*), 4) AS mv " +
        "FROM b GROUP BY doc_id) " +
        "SELECT p.doc_id, CAST(p.nf AS BIGINT) AS n_frames, " +
        "COALESCE(m.mv, 0.0) AS mean_val " +
        "FROM p LEFT JOIN m ON p.doc_id = m.doc_id ORDER BY p.doc_id")),

    Q("m03_frame_sample",
      // Frame-sampling as a relational op: slice the opaque binary payload
      // into fixed 16-byte frames, keep every 4th, and emit one row per
      // sampled frame with its digest — the explode is partition-local
      // (no shuffle), so the expansion scales with the scan exactly like
      // a video-frame sampler would. All codegen'd built-ins; the oracle
      // slices the same (ASCII) payload as a string.
      (s, d) => graft.api.Graft.frameSample(
        Tables.load(s, d, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")),
        "doc_id", "payload", frameBytes = 16, every = 4)
        .orderBy("doc_id", "frame_idx"),
      Some("WITH p AS (SELECT doc_id, text, length(text)//16 AS nf " +
        "FROM documents) " +
        "SELECT doc_id, CAST(f AS BIGINT) AS frame_idx, " +
        "md5(substring(text, CAST(f*16+1 AS BIGINT), 16)) AS frame_digest " +
        "FROM p, UNNEST(generate_series(0, nf-1, 4)) t(f) " +
        "WHERE nf >= 1 ORDER BY doc_id, frame_idx")),

    Q("m05_audio_energy",
      // Audio-frame energy over the payload read as PCM16LE: real integer
      // DSP (not a stub — PCM needs no codec), one energy row per
      // complete 16-sample window. Computed in a single byte-level pass
      // by the native codegen Pcm16WindowEnergy expression (one struct
      // per window, partition-local explode, zero shuffle); the oracle
      // recomputes the same windows via hex parse + '0x..'::BIGINT, so
      // the whole computation hash-checks.
      (s, d) => graft.api.Graft.pcm16WindowEnergy(
        Tables.load(s, d, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")),
        "doc_id", "payload", windowSamples = 16)
        .orderBy("doc_id", "win_idx"),
      Some("WITH p AS (SELECT doc_id, lower(hex(encode(text))) AS h, " +
        "octet_length(encode(text))//2 AS ns FROM documents), " +
        "s AS (SELECT doc_id, g AS s, " +
        "CAST(concat('0x', substr(h, CAST(g*4+1 AS BIGINT), 2)) AS BIGINT) + " +
        "256 * CAST(concat('0x', substr(h, CAST(g*4+3 AS BIGINT), 2)) " +
        "AS BIGINT) AS raw " +
        "FROM p, UNNEST(generate_series(0, ns-1)) t(g) WHERE ns >= 16), " +
        "a AS (SELECT doc_id, s//16 AS win_idx, " +
        "CASE WHEN raw >= 32768 THEN 65536 - raw ELSE raw END AS amp " +
        "FROM s) " +
        "SELECT doc_id, CAST(win_idx AS BIGINT) AS win_idx, " +
        "CAST(SUM(amp) AS BIGINT) AS energy " +
        "FROM a GROUP BY 1, 2 HAVING COUNT(*) = 16 " +
        "ORDER BY doc_id, win_idx")),

    Q("m06_byte_entropy",
      // Shannon byte entropy of the opaque payload: the corrupt-vs-
      // compressed-vs-text screen a media pipeline runs before spending
      // any decode budget. Real computation (single-pass histogram +
      // -Σ p·log2 p in a native codegen expression), no codec, fully
      // oracle-checked; map-only — the payload never shuffles and no
      // per-byte rows exist. See [[graft.api.Graft.byteEntropy]].
      (s, d) => graft.api.Graft.byteEntropy(
        Tables.load(s, d, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")),
        "doc_id", "payload")
        .orderBy("doc_id"),
      Some("WITH p AS (SELECT doc_id, lower(hex(encode(text))) AS hx, " +
        "octet_length(encode(text)) AS nb FROM documents), " +
        "b AS (SELECT doc_id, nb, CAST(concat('0x', " +
        "substring(hx, CAST(g*2+1 AS BIGINT), 2)) AS BIGINT) AS bv " +
        "FROM p, UNNEST(generate_series(0, nb-1)) t(g) WHERE nb >= 1), " +
        "h AS (SELECT doc_id, nb, bv, COUNT(*) AS c FROM b " +
        "GROUP BY 1, 2, 3) " +
        "SELECT doc_id, CAST(nb AS BIGINT) AS nbytes, " +
        "CAST(COUNT(*) AS BIGINT) AS n_distinct, " +
        "ROUND(-SUM((CAST(c AS DOUBLE)/nb) * log2(CAST(c AS DOUBLE)/nb)) " +
        "+ 0.0, 4) AS entropy " +
        "FROM h GROUP BY doc_id, nb ORDER BY doc_id")),

    Q("m07_stereo_energy",
      // Stereo deinterleave + per-channel window energy over the payload
      // read as interleaved 2-channel PCM16LE — the step before any
      // per-channel audio analysis. Channel membership is index
      // arithmetic (s mod 2) inside the same single-pass native
      // expression as m05: map-only, zero shuffle. Fully oracle-checked
      // like m05. See [[graft.api.Graft.pcm16ChannelWindowEnergy]].
      (s, d) => graft.api.Graft.pcm16ChannelWindowEnergy(
        Tables.load(s, d, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")),
        "doc_id", "payload", windowSamples = 16, channels = 2)
        .orderBy("doc_id", "channel", "win_idx"),
      Some("WITH p AS (SELECT doc_id, lower(hex(encode(text))) AS h, " +
        "octet_length(encode(text))//2 AS ns FROM documents), " +
        "s AS (SELECT doc_id, g AS s, " +
        "CAST(concat('0x', substr(h, CAST(g*4+1 AS BIGINT), 2)) AS BIGINT) + " +
        "256 * CAST(concat('0x', substr(h, CAST(g*4+3 AS BIGINT), 2)) " +
        "AS BIGINT) AS raw " +
        // no doc-level sample floor: window completeness is enforced
        // per (channel, window) by the HAVING below, so a doc whose
        // channel 0 alone holds a complete window still reports it
        // (the old ns >= 2*16 pre-filter silently dropped those docs)
        "FROM p, UNNEST(generate_series(0, ns-1)) t(g) WHERE ns >= 1), " +
        "a AS (SELECT doc_id, s % 2 AS channel, (s//2)//16 AS win_idx, " +
        "CASE WHEN raw >= 32768 THEN 65536 - raw ELSE raw END AS amp " +
        "FROM s) " +
        "SELECT doc_id, CAST(channel AS BIGINT) AS channel, " +
        "CAST(win_idx AS BIGINT) AS win_idx, " +
        "CAST(SUM(amp) AS BIGINT) AS energy " +
        "FROM a GROUP BY 1, 2, 3 HAVING COUNT(*) = 16 " +
        "ORDER BY doc_id, channel, win_idx")),

    Q("m09_chunk_dedup",
      // Chunk-level duplication across binary payloads (the byte-domain
      // t17 — CDC-style storage dedup / shared-intro detection): 16-byte
      // tumbling chunks, md5-keyed, duplicated when the exact bytes
      // occur >1 time corpus-wide. Payload bytes never shuffle — the
      // chunker emits digests straight off the scan. The fixture payload
      // is ASCII, so the oracle chunks the text directly (same bytes).
      // See [[graft.api.Graft.chunkDedupStats]].
      (s, d) => graft.api.Graft.chunkDedupStats(
        Tables.load(s, d, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")),
        "doc_id", "payload", chunkBytes = 16)
        .orderBy("doc_id"),
      // The oracle chunks with char-based substring while the framework
      // chunks UTF-8 bytes; d0 asserts the bytes==chars premise (pure
      // ASCII) so a fixture refresh with non-ASCII text fails with a
      // clear message instead of a confusing digest mismatch.
      Some("WITH d0 AS (SELECT doc_id, CASE WHEN length(text) = " +
        "octet_length(encode(text)) THEN text ELSE error('m09 oracle assumes " +
        "pure-ASCII documents.text (char chunking == byte chunking); " +
        "the fixture now has non-ASCII text') END AS text " +
        "FROM documents), " +
        "u AS (SELECT doc_id, " +
        "md5(substring(text, CAST(i*16+1 AS BIGINT), 16)) AS ch " +
        "FROM d0, " +
        "UNNEST(generate_series(0, CAST((length(text) + 15) // 16 " +
        "AS BIGINT) - 1)) t(i)), " +
        "f AS (SELECT ch, COUNT(*) AS occ FROM u GROUP BY 1) " +
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks, " +
        "CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_dup_chunks, " +
        "ROUND(CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS DOUBLE) " +
        "/ COUNT(*), 4) AS dup_frac " +
        "FROM u JOIN f USING (ch) GROUP BY doc_id ORDER BY doc_id")),

    Q("m10_scene_cut",
      // Temporal structure over the frame stream (vs the per-frame stats
      // of m03/m05): a scene "cut" is a frame whose mean byte value
      // jumps > 8.03125 from the previous frame — byte-level
      // histogram-difference shot detection, the pass that samples
      // training frames at scene boundaries instead of uniformly.
      // Frame means are integer sums over a dyadic divisor, so every
      // delta and comparison is exact cross-engine; the threshold sits
      // off the 1/16 grid so > can never tie.
      // See [[graft.api.Graft.frameSceneCuts]].
      (s, d) => graft.api.Graft.frameSceneCuts(
        Tables.load(s, d, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")),
        "doc_id", "payload", frameBytes = 16, threshold = 8.03125)
        .orderBy("doc_id"),
      Some("WITH p AS (SELECT doc_id, lower(hex(encode(text))) AS h, " +
        "octet_length(encode(text))//16 AS nf FROM documents), " +
        "b AS (SELECT doc_id, nf, g//16 AS f, " +
        "CAST(concat('0x', substr(h, CAST(g*2+1 AS BIGINT), 2)) " +
        "AS BIGINT) AS v " +
        "FROM p, UNNEST(generate_series(0, nf*16-1)) t(g) " +
        "WHERE nf >= 1), " +
        "m AS (SELECT doc_id, nf, f, SUM(v)/16.0 AS mv FROM b " +
        "GROUP BY 1, 2, 3), " +
        "dl AS (SELECT doc_id, nf, " +
        "ABS(mv - LAG(mv) OVER (PARTITION BY doc_id ORDER BY f)) " +
        "AS delta FROM m), " +
        "a AS (SELECT doc_id, MAX(nf) AS n_frames, " +
        "CAST(SUM(CASE WHEN delta > 8.03125 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_cuts, " +
        "ROUND(COALESCE(MAX(delta), 0.0), 4) AS max_delta " +
        "FROM dl GROUP BY doc_id) " +
        "SELECT d.doc_id, COALESCE(n_frames, 0) AS n_frames, " +
        "COALESCE(n_cuts, 0) AS n_cuts, " +
        "COALESCE(max_delta, 0.0) AS max_delta " +
        "FROM documents d LEFT JOIN a USING (doc_id) " +
        "ORDER BY d.doc_id")),

    Q("m12_keyframe_select",
      // Keyframe selection — the step AFTER m10's cut detection: keep
      // frame 0 plus the first frame of every detected shot (mean jump
      // > the off-grid threshold), the scene-boundary sampler a VLM
      // pipeline uses instead of uniform frame sampling. Same exact
      // dyadic frame math and the same single per-asset window as m10;
      // the selection is a filter over it, so the plan adds no shuffle.
      // See [[graft.api.Graft.keyframeSelect]].
      (s, d) => graft.api.Graft.keyframeSelect(
        Tables.load(s, d, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")),
        "doc_id", "payload", frameBytes = 16, threshold = 8.03125)
        .orderBy("doc_id", "kf"),
      Some("WITH p AS (SELECT doc_id, lower(hex(encode(text))) AS h, " +
        "octet_length(encode(text))//16 AS nf FROM documents), " +
        "b AS (SELECT doc_id, g//16 AS f, " +
        "CAST(concat('0x', substr(h, CAST(g*2+1 AS BIGINT), 2)) " +
        "AS BIGINT) AS v " +
        "FROM p, UNNEST(generate_series(0, nf*16-1)) t(g) " +
        "WHERE nf >= 1), " +
        "m AS (SELECT doc_id, f, SUM(v)/16.0 AS mv FROM b " +
        "GROUP BY 1, 2), " +
        "dl AS (SELECT doc_id, f, mv, " +
        "ABS(mv - LAG(mv) OVER (PARTITION BY doc_id ORDER BY f)) " +
        "AS delta FROM m) " +
        "SELECT doc_id, CAST(f AS BIGINT) AS kf, ROUND(mv, 4) AS mv " +
        "FROM dl WHERE f = 0 OR delta > 8.03125 " +
        "ORDER BY doc_id, kf")),

    Q("m08_ahash",
      // 60-bit byte-level average-hash (perceptual-hash construction):
      // the pre-decode content fingerprint that survives small byte
      // perturbations where exact digests flip, and the input to
      // hamming-banded media near-dup (Graft.ahashNearDupPairs — exact
      // pigeonhole banding, property-tested in ApiSpec; this fixture's
      // word-soup payloads are hamming-far apart, so the PAIR list
      // would be vacuously tiny here and the gate checks the 500 hash
      // VALUES instead). Bit criteria are exact integer cross-products,
      // so DuckDB reproduces every bit. Map-only, zero shuffle.
      (s, d) => graft.api.Graft.mediaAHash(
        Tables.load(s, d, "documents")
          .filter(length(col("text")) >= 1)
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")),
        "doc_id", "payload")
        .orderBy("doc_id"),
      Some {
        val bits = (0 until 60).map(i =>
          s"BOOL_OR(chunk = $i) AND SUM(CASE WHEN chunk = $i THEN bv " +
            s"ELSE 0 END) * MAX(nb) > MAX(total) * " +
            s"SUM(CASE WHEN chunk = $i THEN 1 ELSE 0 END) AS b$i")
          .mkString(", ")
        val packed = (0 until 60).map(i =>
          s"CASE WHEN b$i THEN ${1L << i} ELSE 0 END").mkString(" + ")
        "WITH p AS (SELECT doc_id, lower(hex(encode(text))) AS hx, " +
          "octet_length(encode(text)) AS nb FROM documents " +
          "WHERE length(text) >= 1), " +
          "b AS (SELECT doc_id, nb, CAST(concat('0x', " +
          "substring(hx, CAST(g*2+1 AS BIGINT), 2)) AS BIGINT) AS bv, " +
          "(g * 60) // nb AS chunk " +
          "FROM p, UNNEST(generate_series(0, nb-1)) t(g)), " +
          "tot AS (SELECT doc_id, SUM(bv) AS total FROM b GROUP BY 1), " +
          s"sig AS (SELECT b.doc_id, $bits FROM b JOIN tot " +
          "ON b.doc_id = tot.doc_id GROUP BY b.doc_id) " +
          s"SELECT doc_id, CAST($packed AS BIGINT) AS ahash FROM sig " +
          "ORDER BY doc_id"
      }),

    Q("m04_resize",
      // Resize path: STUB "decoder" downsamples the payload by a fixed
      // stride (a real codec would decode + bilinear-resample; the libs
      // aren't in this container), now as the native codegen
      // StrideSample kernel instead of a mapPartitions stub (r8
      // verdict) — BINARY in, BINARY out, map-only, the exact seam a
      // real resample kernel would fill. Digest and out_bytes come from
      // codegen'd built-ins over the sampled bytes, so the plumbing is
      // identical to a thumbnailing pass over 100 TB of images, where
      // the only shuffle is whatever the caller does with the result.
      // The oracle rebuilds the same stride-4 downsample over the
      // (ASCII) payload as a string, so even the stub is hash-checked.
      (s, d) => Tables.load(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .select(col("doc_id"),
          graft.functions.MediaExpressions
            .strideSample(col("payload"), 4).as("thumb"))
        .select(col("doc_id"),
          length(col("thumb")).cast("bigint").as("out_bytes"),
          md5(col("thumb")).as("digest"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, CAST((length(text)+3)//4 AS BIGINT) AS out_bytes, " +
        "md5(array_to_string(list_transform(" +
        "generate_series(1, length(text), 4), " +
        "i -> substring(text, CAST(i AS BIGINT), 1)), '')) AS digest " +
        "FROM documents ORDER BY doc_id"))
  ) ++ Seq(

    Q("m11_ahash_neardup",
      // Hamming-banded media near-dup join — the retrieval side of m08's
      // aHash, promoted to an oracle-checked gate (the r8 note at m08:
      // the fixture's word-soup payloads are hamming-FAR apart, so the
      // pair list over raw documents is vacuously tiny). The corpus is
      // AUGMENTED with constructed near-dups: every 7th document gets a
      // copy (id offset +1,000,000) with its first and last characters
      // swapped — a byte-SUM-preserving perturbation (the payload is
      // ASCII), so only the first and last aHash chunks can flip and
      // the copy sits within hamming distance 2 of its source by
      // construction. ahashNearDupPairs(radius=3) finds every such pair
      // by exact pigeonhole banding (4 disjoint 15-bit bands: a pair
      // within the radius MUST agree exactly on >= 1 band) — the banded
      // EQUI-join shape of d03's SimHash applied to media bytes, never
      // an all-pairs compare. Since r10 the signature WIDTH derives
      // from the corpus count (words=0 default -> deriveHammingWords:
      // 60-bit below the ~262k-item collision crossover — every
      // committed fixture — the 120-bit m13 construction above it), so
      // this gate also exercises the derivation path. All integer bit
      // math, so the DuckDB oracle rebuilds the augmented corpus, both
      // hashes, the banding AND the popcount verify bit for bit.
      (s, d) =>
        graft.api.Graft.ahashNearDupPairs(ahashAugmentedCorpus(s, d),
          "doc_id", "payload", radius = 3)
          .orderBy("id_a", "id_b"),
      Some {
        val bits = (0 until 60).map(i =>
          s"BOOL_OR(chunk = $i) AND SUM(CASE WHEN chunk = $i THEN bv " +
            s"ELSE 0 END) * MAX(nb) > MAX(total) * " +
            s"SUM(CASE WHEN chunk = $i THEN 1 ELSE 0 END) AS b$i")
          .mkString(", ")
        val packed = (0 until 60).map(i =>
          s"CASE WHEN b$i THEN ${1L << i} ELSE 0 END").mkString(" + ")
        "WITH c AS (SELECT doc_id, text FROM documents " +
          "WHERE length(text) >= 2 " +
          "UNION ALL SELECT doc_id + 1000000 AS doc_id, " +
          "substring(text, length(text), 1) || " +
          "substring(text, 2, length(text) - 2) || " +
          "substring(text, 1, 1) AS text FROM documents " +
          "WHERE length(text) >= 2 AND doc_id % 7 = 0), " +
          "p AS (SELECT doc_id, lower(hex(encode(text))) AS hx, " +
          "octet_length(encode(text)) AS nb FROM c), " +
          "b AS (SELECT doc_id, nb, CAST(concat('0x', " +
          "substring(hx, CAST(g*2+1 AS BIGINT), 2)) AS BIGINT) AS bv, " +
          "(g * 60) // nb AS chunk " +
          "FROM p, UNNEST(generate_series(0, nb-1)) t(g)), " +
          "tot AS (SELECT doc_id, SUM(bv) AS total FROM b GROUP BY 1), " +
          s"sig AS (SELECT b.doc_id, $bits FROM b JOIN tot " +
          "ON b.doc_id = tot.doc_id GROUP BY b.doc_id), " +
          s"h AS (SELECT doc_id, CAST($packed AS BIGINT) AS ahash " +
          "FROM sig), " +
          "bands AS (SELECT doc_id, ahash, j, " +
          "(ahash >> CAST(15*j AS INTEGER)) & 32767 AS bits " +
          "FROM h, UNNEST(generate_series(0, 3)) tj(j)), " +
          "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, " +
          "a.ahash AS ha, b.ahash AS hb FROM bands a JOIN bands b " +
          "ON a.j = b.j AND a.bits = b.bits AND a.doc_id < b.doc_id) " +
          "SELECT id_a, id_b, " +
          "CAST(bit_count(xor(ha, hb)) AS BIGINT) AS dist FROM cand " +
          "WHERE bit_count(xor(ha, hb)) <= 3 ORDER BY id_a, id_b"
      }),

    Q("m13_ahash_wide_neardup",
      // m11's exact hamming near-dup join over the WIDE (120-bit)
      // average-hash — the scale path SCALE.md's m11 note calls for:
      // pigeonhole banding at radius 3 over 60 bits leaves 15-bit bands
      // (2^15 buckets, an n^2/2^15 random-collision candidate class),
      // while 120 bits leave 30-bit bands (2^30 buckets), pushing
      // random band agreement past any realistic corpus so candidates
      // ~= true near-pairs and the growth class bends to ~linear. Same
      // augmented corpus as m11 (every 7th doc re-appears with first
      // and last characters swapped — byte-SUM-preserving, so only the
      // two chunks holding those bytes can flip: hamming <= 2 of the
      // source in the 120-bit metric too). All integer bit math; the
      // oracle rebuilds both 60-bit words, the 4 x 30-bit banding and
      // the two-word popcount bit for bit.
      (s, d) =>
        graft.api.Graft.ahashWideNearDupPairs(ahashAugmentedCorpus(s, d),
          "doc_id", "payload", radius = 3, words = 2)
          .orderBy("id_a", "id_b"),
      Some {
        val bits = (0 until 120).map(i =>
          s"BOOL_OR(chunk = $i) AND SUM(CASE WHEN chunk = $i THEN bv " +
            s"ELSE 0 END) * MAX(nb) > MAX(total) * " +
            s"SUM(CASE WHEN chunk = $i THEN 1 ELSE 0 END) AS b$i")
          .mkString(", ")
        val packed0 = (0 until 60).map(i =>
          s"CASE WHEN b$i THEN ${1L << i} ELSE 0 END").mkString(" + ")
        val packed1 = (60 until 120).map(i =>
          s"CASE WHEN b$i THEN ${1L << (i - 60)} ELSE 0 END")
          .mkString(" + ")
        "WITH c AS (SELECT doc_id, text FROM documents " +
          "WHERE length(text) >= 2 " +
          "UNION ALL SELECT doc_id + 1000000 AS doc_id, " +
          "substring(text, length(text), 1) || " +
          "substring(text, 2, length(text) - 2) || " +
          "substring(text, 1, 1) AS text FROM documents " +
          "WHERE length(text) >= 2 AND doc_id % 7 = 0), " +
          "p AS (SELECT doc_id, lower(hex(encode(text))) AS hx, " +
          "octet_length(encode(text)) AS nb FROM c), " +
          "b AS (SELECT doc_id, nb, CAST(concat('0x', " +
          "substring(hx, CAST(g*2+1 AS BIGINT), 2)) AS BIGINT) AS bv, " +
          "(g * 120) // nb AS chunk " +
          "FROM p, UNNEST(generate_series(0, nb-1)) t(g)), " +
          "tot AS (SELECT doc_id, SUM(bv) AS total FROM b GROUP BY 1), " +
          s"sig AS (SELECT b.doc_id, $bits FROM b JOIN tot " +
          "ON b.doc_id = tot.doc_id GROUP BY b.doc_id), " +
          s"h AS (SELECT doc_id, CAST($packed0 AS BIGINT) AS w0, " +
          s"CAST($packed1 AS BIGINT) AS w1 FROM sig), " +
          "bands AS (SELECT doc_id, w0, w1, j, " +
          "CASE WHEN j < 2 THEN (w0 >> CAST(30*j AS INTEGER)) " +
          "& 1073741823 ELSE (w1 >> CAST(30*(j-2) AS INTEGER)) " +
          "& 1073741823 END AS bits " +
          "FROM h, UNNEST(generate_series(0, 3)) tj(j)), " +
          "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, " +
          "a.w0 AS w0a, a.w1 AS w1a, b.w0 AS w0b, b.w1 AS w1b " +
          "FROM bands a JOIN bands b " +
          "ON a.j = b.j AND a.bits = b.bits AND a.doc_id < b.doc_id) " +
          "SELECT id_a, id_b, " +
          "CAST(bit_count(xor(w0a, w0b)) + bit_count(xor(w1a, w1b)) " +
          "AS BIGINT) AS dist FROM cand " +
          "WHERE bit_count(xor(w0a, w0b)) + bit_count(xor(w1a, w1b)) " +
          "<= 3 ORDER BY id_a, id_b"
      }),

    Q("m14_silence_segments",
      // VAD-style silence segmentation over m05's PCM16 window-energy
      // stream: maximal runs of >= 2 consecutive windows below 19/20
      // of the asset's own mean window energy — the trim/split step an
      // audio pipeline runs between energy analysis and transcription.
      // The threshold is an exact integer cross-product (den * energy
      // * nwin < num * total) and the islands come from the win_idx -
      // row_number identity, so DuckDB rebuilds every segment bit for
      // bit. One native energy pass map-side, one doc_id shuffle.
      // See [[graft.api.Graft.silenceSegments]].
      (s, d) => graft.api.Graft.silenceSegments(
        Tables.load(s, d, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")),
        // ASCII-as-PCM amplitude is high and flat (the fixture's text
        // bytes), so the gate tightens the fraction to 19/20 to carve
        // real islands; true audio would use the 4/5 default.
        "doc_id", "payload", windowSamples = 16,
        thresholdNum = 19, thresholdDen = 20, minWindows = 2)
        .orderBy("doc_id", "seg_start"),
      Some("WITH p AS (SELECT doc_id, lower(hex(encode(text))) AS h, " +
        "octet_length(encode(text))//2 AS ns FROM documents), " +
        "s AS (SELECT doc_id, g AS s, " +
        "CAST(concat('0x', substr(h, CAST(g*4+1 AS BIGINT), 2)) AS BIGINT) + " +
        "256 * CAST(concat('0x', substr(h, CAST(g*4+3 AS BIGINT), 2)) " +
        "AS BIGINT) AS raw " +
        "FROM p, UNNEST(generate_series(0, ns-1)) t(g) WHERE ns >= 16), " +
        "a AS (SELECT doc_id, s//16 AS win_idx, " +
        "CASE WHEN raw >= 32768 THEN 65536 - raw ELSE raw END AS amp " +
        "FROM s), " +
        "e AS (SELECT doc_id, win_idx, SUM(amp) AS energy FROM a " +
        "GROUP BY 1, 2 HAVING COUNT(*) = 16), " +
        "tot AS (SELECT doc_id, SUM(energy) AS total, COUNT(*) AS nwin " +
        "FROM e GROUP BY 1), " +
        "sil AS (SELECT e.doc_id, e.win_idx, " +
        "e.win_idx - ROW_NUMBER() OVER (PARTITION BY e.doc_id " +
        "ORDER BY e.win_idx) AS grp " +
        "FROM e JOIN tot ON e.doc_id = tot.doc_id " +
        "WHERE e.energy * 20 * tot.nwin < 19 * tot.total) " +
        "SELECT doc_id, CAST(MIN(win_idx) AS BIGINT) AS seg_start, " +
        "CAST(MAX(win_idx) AS BIGINT) AS seg_end, " +
        "CAST(COUNT(*) AS BIGINT) AS n_wins " +
        "FROM sil GROUP BY doc_id, grp HAVING COUNT(*) >= 2 " +
        "ORDER BY doc_id, seg_start"))
  )
}
