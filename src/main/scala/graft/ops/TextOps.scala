package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, over
  * the `documents` fixture table. All expressions are Catalyst built-ins
  * (whole-stage-codegen'd, no UDFs), so they scale linearly with the scan:
  * no shuffle at all for the per-document ops — partition-local map work.
  */
object TextOps {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  /** Per-language stopword profiles for the language-ID heuristic. */
  private val stopwords: Seq[(String, String)] = Seq(
    "en" -> "the|a|of|and|to|in|is",
    "fr" -> "le|la|les|et|de|un|une",
    "es" -> "el|los|las|y|que|un|una",
    "de" -> "der|die|das|und|ein|zu")

  /** Character-trigram profiles for t07 (derived from each language's
    * function words; shared verbatim with the oracle SQL). */
  private val trigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "he ", " th", "and", " of", "is "),
    "fr" -> Seq("le ", "les", " de", "de ", "et ", "une"),
    "es" -> Seq("el ", "los", " qu", "que", " y ", "una"),
    "de" -> Seq("der", "die", "und", " zu", "ein", "das"))

  val defs: Seq[Q] = Seq(

    Q("t01_token_count",
      (s, d) => graft.api.Graft.tokenCounts(docs(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some("SELECT doc_id, " +
        "len(string_split_regex(text, '\\s+')) AS n_ws, " +
        "len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) " +
        "AS n_bpe FROM documents ORDER BY doc_id")),

    Q("t02_quality",
      (s, d) => graft.api.Graft.qualityScore(docs(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some("SELECT doc_id, length(text) AS chars, " +
        "len(string_split(text, ' ')) AS words, " +
        "ROUND(CAST(length(text) - len(string_split(text, ' ')) + 1 " +
        "AS DOUBLE) / len(string_split(text, ' ')), 4) AS avg_wlen, " +
        "ROUND(CAST(len(regexp_extract_all(text, '\\b(the|a)\\b')) " +
        "AS DOUBLE) / len(string_split(text, ' ')), 4) AS stop_ratio " +
        "FROM documents ORDER BY doc_id")),

    Q("t03_langid",
      // Stopword-profile language ID (argmax with fixed tie order); the
      // oracle rebuilds the same argmax from DuckDB's regexp_extract_all
      // counts.
      (s, d) => graft.api.Graft.langId(docs(s, d), "doc_id", "text",
        stopwords).orderBy("doc_id"),
      Some("WITH sc AS (SELECT doc_id, " +
        "len(regexp_extract_all(text, '\\b(the|a|of|and|to|in|is)\\b')) AS en, " +
        "len(regexp_extract_all(text, '\\b(le|la|les|et|de|un|une)\\b')) AS fr, " +
        "len(regexp_extract_all(text, '\\b(el|los|las|y|que|un|una)\\b')) AS es, " +
        "len(regexp_extract_all(text, '\\b(der|die|das|und|ein|zu)\\b')) AS de " +
        "FROM documents) " +
        "SELECT doc_id, CASE " +
        "WHEN en >= fr AND en >= es AND en >= de THEN 'en' " +
        "WHEN fr >= es AND fr >= de THEN 'fr' " +
        "WHEN es >= de THEN 'es' ELSE 'de' END AS pred_lang " +
        "FROM sc ORDER BY doc_id")),

    Q("t07_trigram_langid",
      // Char-trigram language ID: finer-grained than t03's stopword
      // regex argmax — a 3-char window catches morphology ("sch", "ión")
      // that whole-word stopword lists miss. Single native codegen pass
      // per row with the profile compiled in: map-only, zero shuffle.
      (s, d) => graft.api.Graft.trigramLangId(docs(s, d), "doc_id", "text",
        trigramProfiles, default = "en").orderBy("doc_id"),
      Some {
        val profSql = trigramProfiles
          .flatMap { case (l, tgs) => tgs.map(t => s"('$l', '$t')") }
          .mkString(", ")
        s"WITH prof(lang, tg) AS (VALUES $profSql), " +
          "tri AS (SELECT doc_id, substring(lower(text), g, 3) AS tg " +
          "FROM documents, UNNEST(generate_series(1, length(text)-2)) " +
          "AS t(g)), " +
          "sc AS (SELECT doc_id, lang, COUNT(*) AS score FROM tri " +
          "JOIN prof USING (tg) GROUP BY 1, 2), " +
          "w AS (SELECT doc_id, lang, ROW_NUMBER() OVER " +
          "(PARTITION BY doc_id ORDER BY score DESC, lang) AS rn FROM sc) " +
          "SELECT d.doc_id, COALESCE(w.lang, 'en') AS pred_lang " +
          "FROM documents d LEFT JOIN w ON d.doc_id = w.doc_id " +
          "AND w.rn = 1 ORDER BY d.doc_id"
      }),

    Q("t06_top_terms",
      // Corpus-level term frequency: explode words, one hash-shuffle on
      // the term, global top-20. The canonical vocabulary-building pass;
      // at 100 TB the aggregation is map-side partial and only
      // (term, count) pairs shuffle.
      (s, d) => docs(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 3)
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
        .limit(20),
      Some("SELECT word, COUNT(*) AS cnt FROM " +
        "(SELECT word FROM documents, " +
        "UNNEST(string_split(text, ' ')) AS t(word) " +
        "WHERE length(word) > 3) " +
        "GROUP BY word ORDER BY cnt DESC, word LIMIT 20")),

    Q("t09_corpus_curation",
      // The end-to-end curation pass every training corpus goes through,
      // composed ENTIRELY from the reusable API: quality gate (word
      // count band) -> language filter (t03's stopword argmax) -> exact
      // dedup (keep the min doc_id per content digest). Each stage is the
      // same DataFrame transform users call directly, so this query
      // proves the API composes; the oracle rebuilds the identical
      // pipeline in SQL. All per-doc map work plus one digest shuffle.
      (s, d) => {
        val base = docs(s, d)
        val quality = graft.api.Graft
          .qualityScore(base, "doc_id", "text")
          .filter(col("words").between(20, 1000))
          .select(col("doc_id"), col("words"))
        val english = graft.api.Graft
          .langId(base, "doc_id", "text", stopwords)
          .filter(col("pred_lang") === "en")
          .select("doc_id")
        val keepIds = graft.api.Graft
          .exactDedup(base, "doc_id", "text")
          .select(col("keep_id").as("doc_id"))
        base.select("doc_id")
          .join(quality, "doc_id")
          .join(english, "doc_id")
          .join(keepIds, "doc_id")
          .orderBy("doc_id")
      },
      Some("WITH q AS (SELECT doc_id, len(string_split(text, ' ')) AS " +
        "words FROM documents), " +
        "sc AS (SELECT doc_id, " +
        "len(regexp_extract_all(text, '\\b(the|a|of|and|to|in|is)\\b')) AS en, " +
        "len(regexp_extract_all(text, '\\b(le|la|les|et|de|un|une)\\b')) AS fr, " +
        "len(regexp_extract_all(text, '\\b(el|los|las|y|que|un|una)\\b')) AS es, " +
        "len(regexp_extract_all(text, '\\b(der|die|das|und|ein|zu)\\b')) AS de " +
        "FROM documents), " +
        "l AS (SELECT doc_id, CASE " +
        "WHEN en >= fr AND en >= es AND en >= de THEN 'en' " +
        "WHEN fr >= es AND fr >= de THEN 'fr' " +
        "WHEN es >= de THEN 'es' ELSE 'de' END AS pred_lang FROM sc), " +
        "k AS (SELECT MIN(doc_id) AS doc_id FROM documents " +
        "GROUP BY sha256(text)) " +
        "SELECT d.doc_id, q.words FROM documents d " +
        "JOIN q ON d.doc_id = q.doc_id AND q.words BETWEEN 20 AND 1000 " +
        "JOIN l ON d.doc_id = l.doc_id AND l.pred_lang = 'en' " +
        "JOIN k ON d.doc_id = k.doc_id " +
        "ORDER BY d.doc_id")),

    Q("t08_pii_redact",
      // PII scrub: per-pattern match counts + the redacted text (emitted
      // as an md5 so the gate compares content without dumping the
      // corpus). The fixture text is clean, so counts are 0 and the
      // digest equals the original's — the behavioral proof on text that
      // DOES contain PII lives in ApiSpec; this binding keeps the
      // operator's full expression pipeline on the hash-checked path.
      (s, d) => graft.api.Graft.redactPii(docs(s, d), "doc_id", "text")
        .select(col("doc_id"), col("n_email"), col("n_phone"),
          col("n_ipv4"), md5(col("redacted").cast("binary")).as("red_fp"))
        .orderBy("doc_id"),
      Some {
        val Seq(em, ph, ip) = graft.api.Graft.PiiPatterns.map(_._2)
        "SELECT doc_id, " +
          s"CAST(len(regexp_extract_all(text, '$em')) AS BIGINT) AS n_email, " +
          s"CAST(len(regexp_extract_all(text, '$ph')) AS BIGINT) AS n_phone, " +
          s"CAST(len(regexp_extract_all(text, '$ip')) AS BIGINT) AS n_ipv4, " +
          s"md5(regexp_replace(regexp_replace(regexp_replace(text, " +
          s"'$em', '[EMAIL]', 'g'), '$ph', '[PHONE]', 'g'), " +
          s"'$ip', '[IPV4]', 'g')) AS red_fp " +
          "FROM documents ORDER BY doc_id"
      }),

    Q("t10_repetition",
      // Gopher-style repetition screens: duplicate-word fraction and the
      // share of word bigrams held by the single most frequent bigram —
      // the cheap boilerplate/spam filters every corpus pass runs. Two
      // partition-local explodes + aggregations; see
      // [[graft.api.Graft.repetitionSignals]].
      (s, d) => graft.api.Graft.repetitionSignals(docs(s, d), "doc_id",
        "text").orderBy("doc_id"),
      Some("WITH w AS (SELECT doc_id, word FROM documents, " +
        "UNNEST(string_split(text, ' ')) t(word)), " +
        "ws AS (SELECT doc_id, COUNT(*) AS nw, COUNT(DISTINCT word) AS ndw " +
        "FROM w GROUP BY 1), " +
        "tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
        "bg AS (SELECT doc_id, concat(w[g], ' ', w[g+1]) AS b FROM tk, " +
        "UNNEST(generate_series(1, len(w)-1)) t(g)), " +
        "bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2), " +
        "bs AS (SELECT doc_id, SUM(c) AS nbg, MAX(c) AS maxbg FROM bc " +
        "GROUP BY 1) " +
        "SELECT ws.doc_id, CAST(ws.nw AS BIGINT) AS words, " +
        "ROUND(1.0 - CAST(ndw AS DOUBLE) / nw, 4) AS dup_word_frac, " +
        "COALESCE(ROUND(CAST(maxbg AS DOUBLE) / nbg, 4), 0.0) " +
        "AS top_bigram_frac " +
        "FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id ORDER BY ws.doc_id")),

    Q("t11_tfidf",
      // Per-document top-3 TF-IDF terms: the keyword-extraction pass of
      // a curation pipeline. Corpus size rides along as a one-row
      // broadcast; document frequency is a map-side-partial aggregation;
      // the rank runs on the ROUNDED score so float ordering matches the
      // oracle bit-for-bit. See [[graft.api.Graft.tfidfTopTerms]].
      (s, d) => graft.api.Graft.tfidfTopTerms(docs(s, d), "doc_id", "text",
        k = 3, minWordLen = 4).orderBy("doc_id", "rnk"),
      Some("WITH w AS (SELECT doc_id, word FROM documents, " +
        "UNNEST(string_split(text, ' ')) t(word) WHERE length(word) >= 4), " +
        "tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY 1, 2), " +
        "dfq AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1), " +
        "sc AS (SELECT doc_id, word, ROUND(CAST(tf AS DOUBLE) * " +
        "ln(CAST((SELECT COUNT(*) FROM documents) + 1 AS DOUBLE) / " +
        "(df + 1)), 4) AS score FROM tf JOIN dfq USING (word)), " +
        "r AS (SELECT doc_id, word, score, ROW_NUMBER() OVER " +
        "(PARTITION BY doc_id ORDER BY score DESC, word) AS rnk FROM sc) " +
        "SELECT doc_id, word, score, CAST(rnk AS BIGINT) AS rnk FROM r " +
        "WHERE rnk <= 3 ORDER BY doc_id, rnk")),

    Q("t12_split_assign",
      // Deterministic train/val/test assignment: split depends only on
      // md5(salt + doc_id), so membership is stable under corpus growth
      // and re-partitioning — no eval doc ever drifts into train. Pure
      // per-row digest work, zero shuffle; the oracle parses the same
      // hex slice. See [[graft.api.Graft.deterministicSplit]].
      (s, d) => graft.api.Graft.deterministicSplit(docs(s, d), "doc_id")
        .orderBy("doc_id"),
      Some("WITH b AS (SELECT doc_id, " +
        "CAST(concat('0x', substring(md5(concat('split:', " +
        "CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 100 AS bucket " +
        "FROM documents) " +
        "SELECT doc_id, bucket, CASE WHEN bucket < 80 THEN 'train' " +
        "WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split " +
        "FROM b ORDER BY doc_id")),

    Q("t13_decontaminate",
      // Benchmark decontamination: flag corpus documents sharing word-3-
      // shingles with a (deterministic) "eval suite" — here the doc_id %
      // 97 == 0 slice stands in for a held-out benchmark. The eval
      // shingle set broadcasts; the corpus is never shuffled for the
      // overlap. Both shingle tables derive from the session-shared
      // listing ([[Dedup.sharedShingles]] — the eval slice's shingles
      // are a FILTER of the corpus table, since the eval suite is a
      // subset of the corpus here). See
      // [[graft.api.Graft.contaminationFlagsFromShingles]].
      (s, d) => {
        val sh = Dedup.sharedShingles(s, d, reuse = true)
        graft.api.Graft.contaminationFlagsFromShingles(
          docs(s, d), "doc_id", sh,
          sh.filter(col("doc_id") % 97 === 0).select("s").distinct())
          .orderBy("doc_id")
      },
      Some("WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w " +
        "FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, " +
        "array_to_string(list_slice(w, g, g+2), ' ') AS s FROM toks, " +
        "UNNEST(generate_series(1, len(w)-2)) AS t(g)), " +
        "ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0), " +
        "cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1), " +
        "sha AS (SELECT sh.doc_id, COUNT(*) AS n_shared FROM sh " +
        "JOIN ev USING (s) GROUP BY 1) " +
        "SELECT d.doc_id, CAST(COALESCE(n_shared, 0) AS BIGINT) " +
        "AS n_shared, " +
        "COALESCE(ROUND(CAST(n_shared AS DOUBLE) / n_sh, 4), 0.0) " +
        "AS contam_frac " +
        "FROM documents d LEFT JOIN cnt ON d.doc_id = cnt.doc_id " +
        "LEFT JOIN sha ON d.doc_id = sha.doc_id ORDER BY d.doc_id")),

    Q("t14_pack_assign",
      // Sequence packing for training batches: per-shard prefix-sum of
      // token counts, pack = cum-before DIV capacity — the distributed
      // approximation of greedy packing (shards pack in parallel; one
      // hash-partition shuffle total). See
      // [[graft.api.Graft.packAssignments]].
      (s, d) => graft.api.Graft.packAssignments(docs(s, d), "doc_id",
        "text", capacity = 2048, shards = 8)
        .orderBy("doc_id"),
      Some("WITH t AS (SELECT doc_id, " +
        "len(string_split_regex(text, '\\s+')) AS tokens, " +
        "doc_id % 8 AS shard FROM documents), " +
        "c AS (SELECT doc_id, shard, tokens, SUM(tokens) OVER " +
        "(PARTITION BY shard ORDER BY doc_id) AS cum FROM t) " +
        "SELECT doc_id, CAST(shard AS BIGINT) AS shard, " +
        "CAST(tokens AS BIGINT) AS tokens, " +
        "CAST((cum - tokens) // 2048 AS BIGINT) AS pack_id " +
        "FROM c ORDER BY doc_id")),

    Q("t15_normalize",
      // Canonical normalization (lowercase, control-strip, whitespace
      // collapse, trim) fingerprinted for normalized-content dedup. The
      // fixture text is already clean, so this mostly proves the full
      // expression pipeline hash-exactly; the behavioral proof on dirty
      // text lives in ApiSpec. See [[graft.api.Graft.normalizeText]].
      (s, d) => graft.api.Graft.normalizeText(docs(s, d), "doc_id", "text")
        .select(col("doc_id"),
          md5(col("norm_text").cast("binary")).as("norm_fp"),
          col("norm_chars"))
        .orderBy("doc_id"),
      Some("WITH n AS (SELECT doc_id, " +
        "trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^\\x20-\\x7e]', ' ', 'g'), '\\s+', ' ', 'g')) AS nt " +
        "FROM documents) " +
        "SELECT doc_id, md5(nt) AS norm_fp, " +
        "CAST(length(nt) AS BIGINT) AS norm_chars FROM n " +
        "ORDER BY doc_id")),

    Q("t16_corpus_stats",
      // The corpus report card every curation run ends with: per-language
      // document/token volumes and length distribution (exact
      // percentiles — at 100 TB swap in approx_percentile, the a27
      // sketch pattern). One map-side-partial aggregation; the shuffle
      // carries one row per language.
      (s, d) => docs(s, d)
        .select(col("lang"), col("n_chars"),
          size(split(col("text"), " ")).cast("bigint").as("words"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("words").as("total_words"),
          round(avg("n_chars"), 2).as("avg_chars"),
          round(expr("percentile(words, 0.5)"), 2).as("p50_words"),
          round(expr("percentile(words, 0.9)"), 2).as("p90_words"))
        .orderBy("lang"),
      Some("SELECT lang, COUNT(*) AS n_docs, " +
        "CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_words, " +
        "ROUND(AVG(n_chars), 2) AS avg_chars, " +
        "ROUND(quantile_cont(len(string_split(text, ' ')), 0.5), 2) " +
        "AS p50_words, " +
        "ROUND(quantile_cont(len(string_split(text, ' ')), 0.9), 2) " +
        "AS p90_words " +
        "FROM documents GROUP BY lang ORDER BY lang")),

    Q("t04_fingerprint",
      (s, d) => docs(s, d)
        .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id")),

    Q("t05_rolling_fp",
      // Winnowing-style rolling-hash fingerprint: min xxhash64 over all
      // 8-byte windows of the text. Content-based (shift-invariant), so
      // near-identical documents collide. Native codegen expression — a
      // single O(len) pass per document (the HOF formulation re-sliced
      // the string per position, O(len^2)); see
      // [[graft.functions.RollingMinHash64]].
      //
      // xxhash64 has no DuckDB counterpart, so the fingerprint VALUE
      // can't be hash-compared; the gate instead emits per-doc
      // invariants DuckDB can check: n_bytes (recomputed exactly) plus
      // two structural bounds that hold for ANY correct min-over-
      // rolling-windows implementation — windows(text || text) ⊇
      // windows(text) so fp(text||text) <= fp(text), and the windows of
      // a >=8-byte prefix are a subset of windows(text) so fp(prefix)
      // >= fp(text). A broken rolling update (stale packed byte, wrong
      // window bounds) flips a boolean on some doc and the 500-row hash
      // goes red. The raw fingerprint stays available via
      // graft.functions.TextExpressions.rollingMinHash64.
      (s, d) => {
        def fp(c: org.apache.spark.sql.Column) =
          graft.functions.TextExpressions.rollingMinHash64(c)
        val nBytes = octet_length(col("text"))
        docs(s, d)
          .select(col("doc_id"),
            nBytes.cast("bigint").as("n_bytes"),
            when(nBytes >= 8,
              fp(concat(col("text"), col("text"))) <= fp(col("text")))
              .otherwise(lit(true)).as("concat_bound_ok"),
            // drop the last CHARACTER (<=4 bytes); the >=12-byte guard
            // keeps the prefix >=8 bytes so its windows are a subset
            when(nBytes >= 12,
              fp(expr("substring(text, 1, length(text) - 1)")) >=
                fp(col("text")))
              .otherwise(lit(true)).as("prefix_bound_ok"))
          .orderBy("doc_id")
      },
      Some("SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes, " +
        "true AS concat_bound_ok, true AS prefix_bound_ok " +
        "FROM documents ORDER BY doc_id")),

    Q("t17_passage_dedup",
      // Duplicated-passage statistics (C4/RefinedWeb passage dedup):
      // tumbling 10-word passages, md5-keyed, a passage is duplicated
      // when its exact content occurs >1 time corpus-wide. Passage
      // construction is a per-row HOF; only (digest) rows shuffle. See
      // [[graft.api.Graft.duplicatePassageStats]].
      (s, d) => graft.api.Graft.duplicatePassageStats(
        docs(s, d), "doc_id", "text", unitWords = 10)
        .orderBy("doc_id"),
      Some("WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws " +
        "FROM documents), " +
        "u AS (SELECT doc_id, md5(array_to_string(" +
        "ws[(i*10+1):(i*10+10)], ' ')) AS uh FROM w, " +
        "UNNEST(generate_series(0, CAST((len(ws) + 9) // 10 AS BIGINT) " +
        "- 1)) t(i)), " +
        "f AS (SELECT uh, COUNT(*) AS occ FROM u GROUP BY 1) " +
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_units, " +
        "CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_dup_units, " +
        "ROUND(CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS DOUBLE) " +
        "/ COUNT(*), 4) AS dup_frac " +
        "FROM u JOIN f USING (uh) GROUP BY doc_id ORDER BY doc_id")),

    Q("t18_bpe_pairs",
      // First BPE merge iteration: corpus-wide adjacent char-pair counts
      // weighted by word frequency, top-20 deterministic. Pair expansion
      // runs over the DISTINCT vocabulary, not the corpus. See
      // [[graft.api.Graft.bpePairCounts]].
      (s, d) => graft.api.Graft.bpePairCounts(docs(s, d), "text",
        topK = 20),
      Some("WITH wds AS (SELECT UNNEST(string_split(text, ' ')) AS word " +
        "FROM documents), " +
        "v AS (SELECT word, COUNT(*) AS wc FROM wds " +
        "WHERE length(word) >= 2 GROUP BY 1), " +
        "p AS (SELECT substring(word, CAST(g AS INT), 2) AS pair, " +
        "SUM(wc) AS cnt FROM v, " +
        "UNNEST(generate_series(1, length(word) - 1)) t(g) GROUP BY 1) " +
        "SELECT pair, CAST(cnt AS BIGINT) AS cnt FROM p " +
        "ORDER BY cnt DESC, pair LIMIT 20")),

    Q("t19_stratified_sample",
      // Data mixing: deterministic per-language sampling rates (the
      // upweight/downweight step every training mix applies). Membership
      // is md5(salt:id)-driven, so both engines compute the identical
      // sample. Map-only. See [[graft.api.Graft.stratifiedSample]].
      (s, d) => graft.api.Graft.stratifiedSample(
        docs(s, d).select(col("doc_id"), col("lang")),
        "doc_id", "lang",
        rates = Seq("en" -> 0.5, "fr" -> 0.25, "es" -> 1.0,
          "de" -> 0.1, "zh" -> 0.75))
        .orderBy("doc_id"),
      // the CASE rate is CAST to DOUBLE before the multiply: DuckDB
      // would otherwise run the arithmetic in DECIMAL, whose FLOOR can
      // differ from Spark's binary-double product by a few units for
      // non-dyadic rates like 0.1 (round-4 ADVICE)
      Some("SELECT doc_id, lang FROM documents WHERE " +
        "CAST(concat('0x', substring(md5(concat('sample:', " +
        "CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) < " +
        "CAST(FLOOR(CAST(CASE lang WHEN 'en' THEN 0.5 WHEN 'fr' THEN 0.25 " +
        "WHEN 'es' THEN 1.0 WHEN 'de' THEN 0.1 WHEN 'zh' THEN 0.75 " +
        "ELSE 0.0 END AS DOUBLE) * 1152921504606846976.0) AS BIGINT) " +
        "ORDER BY doc_id")),

    Q("t20_unigram_logprob",
      // LM-filter stand-in: corpus unigram model (top-20 vocab, 0.5-count
      // OOV floor), mean token log-prob per document — the cheap fluency
      // screen where CCNet runs a trained LM. vocabSize=20 leaves 11 of
      // the fixture's 31 words OOV, so both scoring paths are on the
      // hash-checked path. See [[graft.api.Graft.unigramLogProb]].
      (s, d) => graft.api.Graft.unigramLogProb(docs(s, d), "doc_id",
        "text", vocabSize = 20)
        .orderBy("doc_id"),
      Some("WITH w AS (SELECT doc_id, UNNEST(string_split(text, ' ')) " +
        "AS word FROM documents), " +
        "c AS (SELECT word, COUNT(*) AS c FROM w GROUP BY 1), " +
        "tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS total FROM c), " +
        "v AS (SELECT word, c FROM c ORDER BY c DESC, word LIMIT 20) " +
        "SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, " +
        "ROUND(AVG(CASE WHEN v.c IS NOT NULL THEN " +
        "ln(CAST(v.c AS DOUBLE) / total) " +
        "ELSE ln(0.5 / total) END), 4) AS avg_logp " +
        "FROM w LEFT JOIN v USING (word) CROSS JOIN tot " +
        "GROUP BY w.doc_id ORDER BY doc_id")),

    Q("t21_importance_weights",
      // DSIR-style domain tilting: hashed-unigram importance weights of
      // every document against the English slice as the target domain —
      // the data-mixing step that upsamples target-like text. Feature
      // hashing is the shared md5 slice, so DuckDB reproduces the exact
      // bucket assignment, distributions and log-ratios. See
      // [[graft.api.Graft.importanceWeights]].
      (s, d) => graft.api.Graft.importanceWeights(docs(s, d), "doc_id",
        "text", targetPred = col("lang") === "en", buckets = 64)
        .orderBy("doc_id"),
      Some("WITH w AS (SELECT doc_id, lang = 'en' AS is_target, " +
        "UNNEST(string_split(text, ' ')) AS word FROM documents), " +
        "b AS (SELECT doc_id, is_target, " +
        "CAST(concat('0x', substring(md5(word), 1, 15)) AS BIGINT) % 64 " +
        "AS bucket FROM w), " +
        "c AS (SELECT bucket, COUNT(*) AS c_raw, " +
        "SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS c_tgt " +
        "FROM b GROUP BY 1), " +
        "t AS (SELECT CAST(SUM(c_raw) AS DOUBLE) AS n_raw, " +
        "CAST(SUM(c_tgt) AS DOUBLE) AS n_tgt FROM c), " +
        "r AS (SELECT bucket, " +
        "ln((c_tgt + 0.5) / (n_tgt + 0.5 * 64)) - " +
        "ln((c_raw + 0.5) / (n_raw + 0.5 * 64)) AS lr " +
        "FROM c CROSS JOIN t) " +
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, " +
        "ROUND(SUM(lr), 4) AS log_weight " +
        "FROM b JOIN r USING (bucket) " +
        "GROUP BY doc_id ORDER BY doc_id")),

    Q("t22_passage_scrub",
      // The transform counterpart of t17: REMOVE every corpus-duplicated
      // 10-word passage and reassemble each document from the survivors
      // in original order (RefinedWeb-style boilerplate scrubbing). The
      // reassembled text is hash-checked byte-for-byte against the
      // oracle's ordered string_agg. See
      // [[graft.api.Graft.scrubDuplicatePassages]].
      (s, d) => graft.api.Graft.scrubDuplicatePassages(
        docs(s, d), "doc_id", "text", unitWords = 10, maxOcc = 1)
        .orderBy("doc_id"),
      Some("WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws " +
        "FROM documents), " +
        "u AS (SELECT doc_id, i AS pos, " +
        "array_to_string(ws[(i*10+1):(i*10+10)], ' ') AS unit FROM w, " +
        "UNNEST(generate_series(0, CAST((len(ws) + 9) // 10 AS BIGINT) " +
        "- 1)) t(i)), " +
        "f AS (SELECT md5(unit) AS uh, COUNT(*) AS occ FROM u " +
        "GROUP BY 1) " +
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_units, " +
        "CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_dropped, " +
        "COALESCE(string_agg(CASE WHEN occ <= 1 THEN unit END, ' ' " +
        "ORDER BY pos), '') AS scrubbed_text " +
        "FROM u JOIN f ON md5(u.unit) = f.uh " +
        "GROUP BY doc_id ORDER BY doc_id")),

    Q("t23_mixture_budget",
      // Token-budget mixture composition: admit documents per source in
      // deterministic md5-priority order until the source's token budget
      // fills — the step that turns per-source token TARGETS ("7k chars
      // of src0, 2k of src19") into an actual training mix. Sources
      // without a budget drop; budgets sit strictly inside each source's
      // total so every listed source exercises an interior cutoff. The
      // oracle recomputes the admitted prefix with one global window per
      // source; the Spark plan gets the same rows from the two-phase
      // slice composition (no corpus-scale window partition — see
      // [[graft.api.Graft.mixtureByBudget]]).
      (s, d) => graft.api.Graft.mixtureByBudget(
        docs(s, d), "doc_id", "n_chars", "source",
        Seq("src0" -> 7000L, "src1" -> 6000L, "src7" -> 5000L,
          "src19" -> 2000L))
        .orderBy("doc_id"),
      Some("WITH w(source, budget) AS (VALUES ('src0', 7000), " +
        "('src1', 6000), ('src7', 5000), ('src19', 2000)), " +
        "b AS (SELECT doc_id, d.source, n_chars, budget, " +
        "CAST(concat('0x', substring(md5(concat('mix:', " +
        "CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS pri " +
        "FROM documents d JOIN w ON d.source = w.source), " +
        "c AS (SELECT doc_id, source, n_chars, budget, " +
        "SUM(n_chars) OVER (PARTITION BY source ORDER BY pri, doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum " +
        "FROM b) " +
        "SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_tok, " +
        "CAST(cum AS BIGINT) AS cum_tok " +
        "FROM c WHERE cum <= budget ORDER BY doc_id")),

    Q("t24_span_dedup",
      // Sliding-window exact-substring dedup signal (Lee et al.): every
      // 10-word window at every offset, flagged when its exact content
      // repeats corpus-wide, flagged windows merged into covered word
      // positions per doc. Catches the offset-shifted repeats t17's
      // tumbling passages are blind to.
      // See [[graft.api.Graft.repeatedSpanStats]].
      (s, d) => graft.api.Graft.repeatedSpanStats(
        docs(s, d), "doc_id", "text", windowWords = 10, maxOcc = 1)
        .orderBy("doc_id"),
      Some("WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws " +
        "FROM documents), " +
        "win AS (SELECT doc_id, i AS pos, " +
        "md5(array_to_string(ws[(i+1):(i+10)], ' ')) AS wh " +
        "FROM w, UNNEST(generate_series(0, len(ws) - 10)) t(i) " +
        "WHERE len(ws) >= 10), " +
        "occ AS (SELECT wh FROM win GROUP BY wh HAVING COUNT(*) > 1), " +
        "fl AS (SELECT doc_id, pos FROM win JOIN occ USING (wh)), " +
        "cov AS (SELECT doc_id, COUNT(DISTINCT p) AS n_covered FROM fl, " +
        "UNNEST(generate_series(pos, pos + 9)) u(p) GROUP BY doc_id), " +
        "nw AS (SELECT doc_id, COUNT(*) AS n_windows FROM win " +
        "GROUP BY doc_id), " +
        "nd AS (SELECT doc_id, COUNT(*) AS n_dup_windows FROM fl " +
        "GROUP BY doc_id) " +
        "SELECT d.doc_id, COALESCE(n_windows, 0) AS n_windows, " +
        "COALESCE(n_dup_windows, 0) AS n_dup_windows, " +
        "COALESCE(n_covered, 0) AS n_covered " +
        "FROM documents d LEFT JOIN nw USING (doc_id) " +
        "LEFT JOIN nd USING (doc_id) LEFT JOIN cov USING (doc_id) " +
        "ORDER BY doc_id")),

    Q("t25_ngram_novelty",
      // Per-document n-gram novelty: the fraction of a document's
      // distinct 3-gram shingles with corpus document frequency 1 — the
      // uniqueness/memorization diagnostic (near 0 = boilerplate or a
      // near-dup; near 1 = content found nowhere else). Shingles hash
      // to a 60-bit md5 slice — not the 32-bit minhash h0: df=1
      // detection is collision-sensitive and 2^32 would bias novelty
      // toward 0 at corpus scale (r9 advice) — so only 8-byte hashes
      // shuffle (two map-side-combined aggregations: by hash for df,
      // by doc for the fold — see graft.api.Graft.ngramNoveltyScores).
      // Docs under 3 words surface with n_shingles=0 and a null score
      // via the left join, so the row count is the corpus count.
      (s, d) => {
        val base = docs(s, d)
        base.select(col("doc_id"))
          .join(graft.api.Graft.ngramNoveltyScoresFromShingles(
              Dedup.sharedShingles(s, d, reuse = true), "doc_id"),
            Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
            col("novelty"))
          .orderBy("doc_id")
      },
      Some("WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w " +
        "FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, " +
        "array_to_string(list_slice(w, g, g+2), ' ') AS s FROM toks, " +
        "UNNEST(generate_series(1, len(w)-2)) AS t(g)), " +
        "hashed AS (SELECT DISTINCT doc_id, " +
        "CAST(concat('0x', substring(md5(concat('0:', s)), 1, 15)) " +
        "AS BIGINT) AS h FROM sh), " +
        "dfreq AS (SELECT h, COUNT(*) AS df FROM hashed GROUP BY h), " +
        "agg AS (SELECT doc_id, COUNT(*) AS n_shingles, " +
        "SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS n_unique " +
        "FROM hashed JOIN dfreq USING (h) GROUP BY doc_id) " +
        "SELECT d.doc_id, CAST(COALESCE(n_shingles, 0) AS BIGINT) " +
        "AS n_shingles, " +
        "ROUND(CAST(n_unique AS DOUBLE) / n_shingles, 4) AS novelty " +
        "FROM documents d LEFT JOIN agg USING (doc_id) " +
        "ORDER BY d.doc_id")),

    Q("t26_bigram_logprob",
      // Corpus bigram LM score — the step up from t20's unigram screen
      // (CCNet's actual filter is a trained n-gram LM): mean
      // log P(w_i | w_{i-1}) over each document's transitions with
      // add-0.5 smoothing against the distinct-unigram vocabulary.
      // Bigrams come from a partition-local indexed explode (no
      // window); both count tables key on 60-bit md5 hashes, so every
      // shuffle carries 8-byte keys, never word text. See
      // [[graft.api.Graft.bigramLogProb]].
      (s, d) => graft.api.Graft.bigramLogProb(docs(s, d), "doc_id",
        "text")
        .orderBy("doc_id"),
      Some("WITH t AS (SELECT doc_id, string_split(text, ' ') AS w " +
        "FROM documents), " +
        "pr AS (SELECT doc_id, " +
        "CAST(concat('0x', substring(md5(w[g]), 1, 15)) AS BIGINT) " +
        "AS hp, " +
        "CAST(concat('0x', substring(md5(w[g] || chr(1) || w[g+1]), " +
        "1, 15)) AS BIGINT) AS hb " +
        "FROM t, UNNEST(generate_series(1, len(w)-1)) s(g) " +
        "WHERE len(w) >= 2), " +
        "cb AS (SELECT hb, COUNT(*) AS cb FROM pr GROUP BY 1), " +
        "cc AS (SELECT hp, COUNT(*) AS cc FROM pr GROUP BY 1), " +
        "v AS (SELECT CAST(COUNT(DISTINCT CAST(concat('0x', " +
        "substring(md5(word), 1, 15)) AS BIGINT)) AS DOUBLE) AS nv " +
        "FROM (SELECT UNNEST(string_split(text, ' ')) AS word " +
        "FROM documents)), " +
        "sc AS (SELECT doc_id, " +
        "ln((cb + 0.5) / (cc + 0.5 * nv)) AS lp " +
        "FROM pr JOIN cb USING (hb) JOIN cc USING (hp) CROSS JOIN v), " +
        "a AS (SELECT doc_id, COUNT(*) AS nb, ROUND(AVG(lp), 4) " +
        "AS avg_logp FROM sc GROUP BY 1) " +
        "SELECT d.doc_id, CAST(COALESCE(nb, 0) AS BIGINT) AS n_bigrams, " +
        "avg_logp FROM documents d LEFT JOIN a USING (doc_id) " +
        "ORDER BY d.doc_id"))
  )
}
