package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for winnowing-style document fingerprints:
  * the minimum xxhash64 over every 8-byte rolling window of the text.
  *
  * The HOF formulation (`array_min(transform(sequence(...), i ->
  * xxhash64(substring(text, i, 8))))`) re-slices the string per position —
  * `substring` walks from the start each call, so a document costs
  * O(len^2) and materializes one array element per position. This
  * expression keeps the last 8 bytes packed in one long and rolls it
  * across the text: O(len), zero allocation, whole-stage-codegen
  * friendly — the difference between a fingerprint pass that scans 100 TB
  * once and one that effectively scans it a thousand times.
  *
  * Texts shorter than 8 bytes hash their zero-padded packed bytes once,
  * so every non-null input produces a fingerprint.
  */
case class RollingMinHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"rolling_min_hash64 requires STRING input, got $t")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_min_hash64"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    RollingMinHash64.hash(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingMinHash64.hash($c.getBytes())")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

object RollingMinHash64 {
  private val Seed = 42L

  /** O(n) rolling pass shared by eval and codegen. */
  def hash(bytes: Array[Byte]): Long = {
    val n = bytes.length
    var packed = 0L
    if (n < 8) {
      var i = 0
      while (i < n) { packed = (packed << 8) | (bytes(i) & 0xffL); i += 1 }
      return XXH64.hashLong(packed, Seed)
    }
    var min = Long.MaxValue
    var i = 0
    while (i < n) {
      packed = (packed << 8) | (bytes(i) & 0xffL)
      if (i >= 7) {
        val h = XXH64.hashLong(packed, Seed)
        if (h < min) min = h
      }
      i += 1
    }
    min
  }
}

/** Parses `len` lowercase-hex digits of `child` starting at 1-indexed
  * `start` into a LONG — the codegen replacement for
  * `CAST(conv(substring(h, start, len), 16, 10) AS BIGINT)` on fixed-width
  * digest strings. `conv` allocates a substring and runs a general-radix
  * parse per call; at 24 slices per shingle row that conversion alone
  * outweighed the md5 being sliced (measured 5.1 s vs 3.1 s on the d02
  * signature stage at sf0.1). This walks the UTF8String bytes in place:
  * zero allocation, 4 bits per digit, codegen'd.
  *
  * Digits outside the string or outside [0-9a-f] contribute 0 — inputs
  * here are md5 hex (fixed 32 lowercase chars), so the lenient path never
  * fires; it just keeps the expression total. `len` must be <= 15 so the
  * result stays non-negative.
  */
case class HexSliceToLong(child: Expression, start: Int, len: Int)
    extends UnaryExpression {
  require(start >= 1 && len >= 1 && len <= 15,
    s"hex_slice_long: need start >= 1 and 1 <= len <= 15, got ($start, $len)")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"hex_slice_long requires STRING input, got $t")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "hex_slice_long"

  override protected def nullSafeEval(input: Any): Any =
    HexSliceToLong.parse(input.asInstanceOf[UTF8String], start, len)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HexSliceToLong.parse($c, $start, $len)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object HexSliceToLong {
  def parse(s: UTF8String, start: Int, len: Int): Long = {
    val n = s.numBytes()
    var v = 0L
    var i = start - 1
    val end = i + len
    while (i < end) {
      val d =
        if (i >= 0 && i < n) {
          val c = s.getByte(i)
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else 0
        } else 0
      v = (v << 4) | d
      i += 1
    }
    v
  }
}

/** Single-pass Shannon byte statistics of a BINARY payload: returns a
  * struct (nbytes BIGINT, n_distinct BIGINT, entropy DOUBLE) computed
  * from one 256-slot histogram walk per row.
  *
  * The relational formulation (explode one row per byte -> per-(doc,
  * byte) count -> per-doc -Σ p·log2 p) materializes a row PER INPUT
  * BYTE before the first aggregation — at 100 TB of payload that is
  * 10^14 explode rows and two shuffles for what is a per-row scalar.
  * This expression is the map-only version: zero shuffle, zero
  * allocation beyond the histogram, whole-stage-codegen friendly.
  * Entropy is the raw -Σ p·log2 p (callers round/normalize); the sum
  * runs in ascending byte order, deterministic across engines.
  */
case class ByteEntropyStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"byte_entropy_stats requires BINARY input, got $t")
    }
  override def dataType: DataType = ByteEntropyStats.Schema
  override def prettyName: String = "byte_entropy_stats"

  override protected def nullSafeEval(input: Any): Any =
    ByteEntropyStats.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ByteEntropyStats.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

object ByteEntropyStats {
  val Schema: StructType = StructType(Seq(
    StructField("nbytes", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))

  private val Ln2 = java.lang.Math.log(2.0)

  def compute(bytes: Array[Byte]): InternalRow = {
    val n = bytes.length
    val hist = new Array[Long](256)
    var i = 0
    while (i < n) { hist(bytes(i) & 0xff) += 1; i += 1 }
    var distinct = 0L
    var acc = 0.0
    var b = 0
    while (b < 256) {
      val c = hist(b)
      if (c > 0) {
        distinct += 1
        val p = c.toDouble / n
        acc += p * (java.lang.Math.log(p) / Ln2)
      }
      b += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, distinct, -acc))
  }
}

/** Single-pass character-trigram language scorer: counts every 3-char
  * window of the (pre-lowercased) text against a compiled (lang,
  * trigram) profile and returns the argmax language (count desc, lang
  * asc on ties; `default` when nothing matches or the text is shorter
  * than 3 chars).
  *
  * The relational formulation (transform+explode one row per window,
  * broadcast-join the profile, per-(doc, lang) count, window argmax,
  * join back) shuffles twice and allocates a 3-char string per text
  * position. This walks the chars once with the profile packed into a
  * ~24-entry long array (3 UTF-16 chars -> one long key, linear scan —
  * smaller than any hash overhead): zero shuffle, zero per-window
  * allocation, whole-operator map-only. Windows are CODE POINT based —
  * identical to the codepoint `substring(text, i, 3)` formulation (and
  * the DuckDB oracle) on all of Unicode: a UTF-16 char walk would see
  * phantom trigrams around surrogate pairs in non-BMP text (round-4
  * ADVICE). Three 21-bit code points pack into one 63-bit long key.
  */
case class TrigramLangIdExpr(child: Expression,
    profiles: Seq[(String, Seq[String])], default: String)
    extends UnaryExpression {
  require(profiles.nonEmpty && profiles.forall(_._2.forall(
      t => t.codePointCount(0, t.length) == 3)),
    "trigram_lang_id: profiles must be non-empty 3-codepoint trigrams")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"trigram_lang_id requires STRING input, got $t")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "trigram_lang_id"

  @transient private lazy val compiled =
    TrigramLangIdExpr.compile(profiles, default)

  override protected def nullSafeEval(input: Any): Any =
    compiled.predict(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("trigramProfiles", compiled,
      classOf[TrigramLangIdExpr.Compiled].getName)
    defineCodeGen(ctx, ev, c => s"$ref.predict($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object TrigramLangIdExpr {

  def compile(profiles: Seq[(String, Seq[String])],
      default: String): Compiled = {
    // languages in ascending order so argmax strict-> keeps the
    // smallest lang on count ties (the join+window formulation's
    // ORDER BY score DESC, lang ASC)
    val langs = profiles.map(_._1).distinct.sorted
    val langIdx = langs.zipWithIndex.toMap
    // sorted by packed key so lookup is a binary search: a realistic
    // caller-supplied model (dozens of languages x hundreds of
    // trigrams) would make a linear scan O(len x |profile|) per row;
    // duplicate keys (one trigram in several languages) sit adjacent
    // and are walked from the first match
    val entries = (for {
      (l, tgs) <- profiles
      tg <- tgs.distinct
    } yield (pack(tg), langIdx(l))).sortBy(_._1)
    new Compiled(entries.map(_._1).toArray, entries.map(_._2).toArray,
      langs.map(UTF8String.fromString).toArray,
      UTF8String.fromString(default))
  }

  // three code points (each <= 0x10FFFF < 2^21) in 63 bits
  private def pack(tg: String): Long = {
    val cp0 = tg.codePointAt(0)
    val i1 = tg.offsetByCodePoints(0, 1)
    val cp1 = tg.codePointAt(i1)
    val cp2 = tg.codePointAt(tg.offsetByCodePoints(i1, 1))
    (cp0.toLong << 42) | (cp1.toLong << 21) | cp2.toLong
  }

  final class Compiled(keys: Array[Long], langOf: Array[Int],
      langs: Array[UTF8String], default: UTF8String)
      extends Serializable {
    def predict(text: UTF8String): UTF8String = {
      val s = text.toString
      val n = s.length
      val counts = new Array[Int](langs.length)
      // rolling 3-codepoint window; surrogate pairs advance by 2 chars
      // but contribute ONE window position (codepoint semantics)
      var c0 = 0L; var c1 = 0L
      var filled = 0
      var i = 0
      while (i < n) {
        val cp = s.codePointAt(i)
        i += Character.charCount(cp)
        if (filled < 2) {
          if (filled == 0) c0 = cp.toLong else c1 = cp.toLong
          filled += 1
        } else {
          val key = (c0 << 42) | (c1 << 21) | cp.toLong
          var j = java.util.Arrays.binarySearch(keys, key)
          if (j >= 0) {
            // binarySearch lands on ANY matching slot; rewind to the first
            // (a trigram shared by several languages counts for each)
            while (j > 0 && keys(j - 1) == key) j -= 1
            while (j < keys.length && keys(j) == key) {
              counts(langOf(j)) += 1
              j += 1
            }
          }
          c0 = c1; c1 = cp.toLong
        }
      }
      // short text (< 3 codepoints) counts nothing -> argmax falls
      // through to default below
      var best = -1
      var bestCount = 0
      var l = 0
      while (l < counts.length) {
        if (counts(l) > bestCount) { best = l; bestCount = counts(l) }
        l += 1
      }
      if (best < 0) default else langs(best)
    }
  }
}

/** Native word n-gram builder: from a pre-split ARRAY<STRING> of words,
  * the array of space-joined n-grams — exactly
  * `transform(sequence(0, size(w)-n), i -> concat_ws(' ', slice(w, i+1,
  * n)))`, the foundation pass of the whole shingle family (d02/d04/d14/
  * d17/d18/t13/t25 all consume [[graft.api.Graft.shingles]]).
  *
  * The HOF formulation evaluates its lambda INTERPRETED per position
  * and allocates a slice array per gram — measured 3.2 s of the shared
  * shingle build's 4.1 s at 150k docs / 7.8M grams (r11 TextProbe,
  * scale30), i.e. ~78% of the build that everything downstream shares.
  * This loop joins each window with [[UTF8String.concatWs]] — the same
  * utility Spark's own ConcatWs codegen calls, so gram bytes are
  * identical — inside whole-stage codegen.
  *
  * Inputs shorter than n words yield an empty array (call sites filter
  * `size(w) >= n` first; the HOF's sequence() would walk backwards
  * there, a domain this expression deliberately does not reproduce).
  * Null elements are skipped by concatWs, matching concat_ws. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"word_ngrams(n=$n)")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_ngrams requires ARRAY<STRING> input, got $other")
    }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    WordNgrams.ngrams(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  graft.functions.WordNgrams.ngrams($c, $n);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object WordNgrams {
  private val Space = UTF8String.fromString(" ")

  def ngrams(words: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val sz = words.numElements()
    if (sz < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val out = new Array[Any](sz - n + 1)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= sz - n) {
      var j = 0
      while (j < n) { parts(j) = words.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Native TUMBLING word-chunk builder — [[WordNgrams]]'s stride-n
  * sibling for the passage ops (t17/t22): `ceil(size(w)/unit)`
  * space-joined chunks of `unit` words each, the LAST chunk partial —
  * `transform(sequence(0, ceil(size(w)/unit)-1), i ->
  * concat_ws(' ', slice(w, i·unit+1, unit)))`, compiled.
  *
  * ONE domain divergence from that HOF (r11 advice): on an EMPTY input
  * array this returns `[]`, where the HOF's `sequence(0, -1)` counts
  * DOWN and yields two empty-string chunks. Unreachable from the
  * library's call sites (`split()` always yields >= 1 element) but
  * reachable through the registered `word_chunks` SQL function; the
  * `[]` behavior is the intended semantics. Pinned by
  * WordNgramsSpec's empty-array case. */
case class WordChunks(child: Expression, unit: Int)
    extends UnaryExpression {
  require(unit > 0, s"word_chunks(unit=$unit)")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_chunks requires ARRAY<STRING> input, got $other")
    }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_chunks"

  override protected def nullSafeEval(input: Any): Any =
    WordChunks.chunks(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      unit)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  graft.functions.WordChunks.chunks($c, $unit);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object WordChunks {
  private val Space = UTF8String.fromString(" ")

  def chunks(words: org.apache.spark.sql.catalyst.util.ArrayData,
      unit: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val sz = words.numElements()
    val n = (sz + unit - 1) / unit
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val start = i * unit
      val len = math.min(unit, sz - start)
      val parts = new Array[UTF8String](len)
      var j = 0
      while (j < len) { parts(j) = words.getUTF8String(start + j); j += 1 }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object TextExpressions {
  /** Min-of-rolling-8-byte-window xxhash64 fingerprint of a STRING column. */
  def rollingMinHash64(c: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      RollingMinHash64(org.apache.spark.sql.graft.Bridge.expression(c)))

  /** LONG value of `len` hex digits of `c` starting at 1-indexed `start`. */
  def hexSliceLong(c: Column, start: Int, len: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      HexSliceToLong(org.apache.spark.sql.graft.Bridge.expression(c),
        start, len))

  /** (nbytes, n_distinct, entropy) struct of a BINARY column, one pass. */
  def byteEntropyStats(c: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      ByteEntropyStats(org.apache.spark.sql.graft.Bridge.expression(c)))

  /** Space-joined word n-grams of a pre-split ARRAY<STRING> column. */
  def wordNgrams(c: Column, n: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      WordNgrams(org.apache.spark.sql.graft.Bridge.expression(c), n))

  /** Tumbling `unit`-word chunks (last partial) of a pre-split
    * ARRAY<STRING> column. */
  def wordChunks(c: Column, unit: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      WordChunks(org.apache.spark.sql.graft.Bridge.expression(c), unit))

  /** Argmax profile language of a pre-lowercased STRING column. */
  def trigramLangId(c: Column, profiles: Seq[(String, Seq[String])],
      default: String): Column =
    org.apache.spark.sql.graft.Bridge.column(
      TrigramLangIdExpr(org.apache.spark.sql.graft.Bridge.expression(c),
        profiles, default))
}
