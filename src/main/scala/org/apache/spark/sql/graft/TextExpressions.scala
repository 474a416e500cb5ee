package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-pipeline kernels. The HOF formulations
  * (`filter(split(...))`, `transform(sequence(...), slice/array_join)`)
  * evaluate interpreted lambdas per element — measured ~8s to shingle 5k
  * docs at sf0.1; these byte-level loops do the same work in ~0.2s and stay
  * inside whole-stage codegen via a single static call.
  *
  * Semantics contract (validated differentially against the HOF versions and
  * the DuckDB oracle): whitespace is the ASCII class of Java/RE2 `\s`
  * — space, \t, \n, , \f, \r — so
  * `tokenize(s) ≡ filter(split(s, "\\s+"), t -> t <> '')
  *             ≡ list_filter(regexp_split_to_array(s, '\s+'), x -> x <> '')`.
  * Splitting at ASCII bytes is UTF-8-safe: multi-byte code points never
  * contain bytes < 0x80.
  */
object TextKernels {
  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** The cross-engine h60 hash (first 15 hex digits of md5, parsed base 16)
    * computed without the hex-string detour: 15 hex digits are the first
    * 7.5 digest bytes, i.e. the big-endian long of bytes 0..7 shifted right
    * by one nibble. Value-identical to
    * `conv(substring(md5(c), 1, 15), 16, 10)` and the DuckDB twin. */
  def h60(s: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val h = d.digest(s.getBytes)
    (((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) | ((h(2) & 0xffL) << 40) |
      ((h(3) & 0xffL) << 32) | ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
      ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)) >>> 4
  }

  /** Maximal non-whitespace runs of `s` as an array of UTF8Strings. */
  def tokenize(s: UTF8String): ArrayData = {
    val bytes = s.getBytes // one copy; token slices wrap this array
    val n = bytes.length
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) out.add(UTF8String.fromBytes(bytes, start, i - start))
    }
    new GenericArrayData(out.toArray)
  }

  /** One-pass cleaning: every byte outside [a-z0-9 ] becomes a separator,
    * runs collapse to one space, ends trimmed. Equals
    * `trim(regexp_replace(regexp_replace(s, "[^a-z0-9 ]", " "), " +", " "))`
    * — a multi-byte code point maps to one space per byte here vs one per
    * char in the regex, but the collapse step makes both a single space, so
    * the results agree on ANY UTF-8 input (checked differentially). */
  def asciiClean(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val out = new Array[Byte](bytes.length)
    var n = 0
    var pendingSpace = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val keep = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      if (keep) {
        if (pendingSpace && n > 0) { out(n) = ' '; n += 1 }
        pendingSpace = false
        out(n) = b; n += 1
      } else pendingSpace = true
      i += 1
    }
    UTF8String.fromBytes(out, 0, n)
  }

  /** Contiguous n-token windows joined by a single space; empty when the
    * input has fewer than n tokens. Mirrors `ColumnOps.shingles` /
    * DuckDB `array_to_string(toks[i:i+n-1], ' ')`. */
  def ngrams(toks: ArrayData, n: Int): ArrayData = {
    val sz = toks.numElements()
    val m = sz - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val space = UTF8String.fromString(" ")
    val out = new Array[Any](m)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Robust winnowing (q174) in ONE pass per document: 32-bit gram hashes
    * (first 8 hex digits of md5 — bit-identical to
    * `CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT)`), the
    * (min-hash, rightmost-pos) selection per w-window via the arithmetic
    * key h·2^21 + (2^20 − pos), and the distinct-fingerprint census —
    * returning (n_grams, n_fps, fp_checksum). Replaces the
    * explode→window-min→distinct→groupBy shape: no L-row materialization,
    * no per-doc window shuffle; the whole statistic is row-local and stays
    * inside whole-stage codegen. O(m·w) inner loop (w is tiny); the
    * distinct set sorts the ≤m selected keys in place. */
  def winnowStats(s: UTF8String, k: Int, w: Int):
      org.apache.spark.sql.catalyst.InternalRow = {
    val keys = winnowKeys(s, k, w)
    if (keys == null) return null
    val m = (s.numChars() - k + 1).toLong
    var checksum = 0L
    var i = 0
    while (i < keys.length) { checksum += keys(i) / 2097152L; i += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](m, keys.length.toLong, checksum))
  }

  /** The winnowing SELECTION as a sorted distinct hash array — the variant
    * dedup pipelines join on (q189): same algorithm as [[winnowStats]], but
    * returns the distinct selected 32-bit hash VALUES, ascending. Sorted
    * output feeds [[sortedIntersectCount]] directly for exact pair
    * verification. Null below one full window. */
  def winnowFps(s: UTF8String, k: Int, w: Int): GenericArrayData = {
    val stats = winnowKeys(s, k, w)
    if (stats == null) return null
    // decode keys → hashes, dedup (keys are sorted, equal hashes adjacent
    // only if same key; different pos → same hash can repeat non-adjacent,
    // so dedup via sort of decoded hashes)
    val hs = new Array[Long](stats.length)
    var i = 0
    while (i < stats.length) { hs(i) = stats(i) / 2097152L; i += 1 }
    java.util.Arrays.sort(hs)
    var n = 0
    var j = 0
    while (j < hs.length) {
      if (j == 0 || hs(j) != hs(j - 1)) { hs(n) = hs(j); n += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, n))
  }

  /** Shared winnowing core: the sorted DISTINCT selection keys
    * (h·2^21 + (2^20 − pos)), or null when no full window fits.
    *
    * DOMAIN LIMIT: the packed key reserves 21 bits for the rightmost-wins
    * position term (2^20 − (pos+1)); a document with ≥ 2^20 grams (~1 MiB
    * of text) would drive that term negative, borrow into the hash bits,
    * and silently corrupt window-min ordering at hash boundaries. Such
    * documents return null — the same visible fail-loud contract as the
    * too-short path — rather than fingerprinting incorrectly. A 100 TB
    * corpus pipeline chunks oversized documents upstream (the span-level
    * dedup path), so the limit costs nothing in practice. */
  private def winnowKeys(s: UTF8String, k: Int, w: Int): Array[Long] = {
    val bytes = s.getBytes
    val chars = s.numChars()
    val m = chars - k + 1
    if (m < w) return null
    if (m >= 1048576) return null // >= 2^20 grams: position term would overflow
    val d = md5.get()
    val hs = new Array[Long](m)
    if (bytes.length == chars) {
      var i = 0
      while (i < m) {
        d.reset(); d.update(bytes, i, k)
        val h = d.digest()
        hs(i) = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
          ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
        i += 1
      }
    } else {
      var i = 0
      while (i < m) {
        val g = s.substring(i, i + k)
        d.reset(); d.update(g.getBytes)
        val h = d.digest()
        hs(i) = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
          ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
        i += 1
      }
    }
    val sel = new Array[Long](m - w + 1)
    var p = 0
    while (p <= m - w) {
      var best = Long.MaxValue
      var q = p
      while (q < p + w) {
        val key = hs(q) * 2097152L + (1048576L - (q + 1))
        if (key < best) best = key
        q += 1
      }
      sel(p) = best
      p += 1
    }
    java.util.Arrays.sort(sel)
    var n = 0
    var i2 = 0
    while (i2 < sel.length) {
      if (i2 == 0 || sel(i2) != sel(i2 - 1)) { sel(n) = sel(i2); n += 1 }
      i2 += 1
    }
    java.util.Arrays.copyOf(sel, n)
  }

  /** Per-document char-n-gram fingerprint in ONE pass: h60 over every
    * n-char substring (substr semantics — code points, like Spark/DuckDB
    * `substr`), returning (min hash, max hash, distinct-gram count).
    *
    * This replaces the explode→hash→groupBy(min,max,countDistinct) shape:
    * the whole statistic is per-row, so materializing L≈doc-length gram
    * rows and shuffling them (twice, with the distinct expand) buys
    * nothing. ASCII fast path digests 8-byte windows of the raw bytes with
    * no per-gram allocation; the general path slices code points. Distinct
    * counting sorts the in-place long array — L longs per doc, bounded by
    * document length, never corpus-sized. */
  def gramFingerprint(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = s.getBytes
    val chars = s.numChars()
    val m = chars - n + 1
    if (m <= 0) return null
    val d = md5.get()
    val hs = new Array[Long](m)
    if (bytes.length == chars) { // ASCII: byte windows ARE char windows
      var i = 0
      while (i < m) {
        d.reset()
        d.update(bytes, i, n)
        val h = d.digest()
        hs(i) = (((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) |
          ((h(2) & 0xffL) << 40) | ((h(3) & 0xffL) << 32) |
          ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
          ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)) >>> 4
        i += 1
      }
    } else {
      var i = 0
      while (i < m) {
        hs(i) = h60(s.substring(i, i + n))
        i += 1
      }
    }
    java.util.Arrays.sort(hs)
    var distinct = 1L
    var i = 1
    while (i < m) { if (hs(i) != hs(i - 1)) distinct += 1; i += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](hs(0), hs(m - 1), distinct))
  }

  /** Occurrences of tokens present in a constant word set — the q45
    * language-ID scoring loop as one hash-probe pass. Equals
    * `size(filter(toks, t -> t.isInCollection(words)))` (counts duplicate
    * hits, like the oracle's `len(list_filter(...))`), without the
    * interpreted per-element ArrayFilter lambda. */
  def profileHits(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    var n = 0
    var i = 0
    val m = arr.numElements()
    while (i < m) {
      if (set.contains(arr.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }
}

/** `tokenize(text)` — whitespace tokenizer as a single codegen kernel call. */
case class Tokenize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize"

  override protected def nullSafeEval(s: Any): Any =
    TextKernels.tokenize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.sql.graft.TextKernels.tokenize($s)")

  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)
}

/** `h60(text)` — the engine's cross-engine 60-bit md5 hash as one digest
  * call straight to a long (no hex-string round trip; ~2× the hashing
  * throughput of the conv(substring(md5)) formulation it equals). */
case class H60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "h60"

  override protected def nullSafeEval(s: Any): Any =
    TextKernels.h60(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.sql.graft.TextKernels.h60($s)")

  override protected def withNewChildInternal(newChild: Expression): H60 =
    copy(child = newChild)
}

/** `profile_hits(toks, words)` — count of a token array's elements present
  * in a plan-time-constant word set, as one codegen kernel call. The set
  * rides into the generated code as a reference object (one shared
  * `HashSet[UTF8String]` per expression instance — with 5 language profiles
  * that is 5 small sets per task, probed per token with no per-element
  * lambda dispatch). */
case class ProfileHits(child: Expression, words: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "profile_hits"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(4, words.size * 2))
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(arr: Any): Any =
    TextKernels.profileHits(arr.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("profileSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, arr =>
      s"org.apache.spark.sql.graft.TextKernels.profileHits($arr, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): ProfileHits =
    copy(child = newChild)
}

/** `char_gram_fingerprint(text, n)` — per-document rolling-hash fingerprint
  * struct (fp_min, fp_max, n_grams) computed in one kernel pass; null when
  * the text has fewer than n chars. n is a plan-time constant. */
case class CharGramFingerprint(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "gram size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("fp_min", LongType, nullable = false),
    StructField("fp_max", LongType, nullable = false),
    StructField("n_grams", LongType, nullable = false)))
  override def nullable: Boolean = true // short texts fingerprint to null
  override def prettyName: String = "char_gram_fingerprint"

  override protected def nullSafeEval(s: Any): Any =
    TextKernels.gramFingerprint(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // kernel returns null for short texts → emit the null-propagating form
    nullSafeCodeGen(ctx, ev, s =>
      s"""
         |${ev.value} = org.apache.spark.sql.graft.TextKernels.gramFingerprint($s, $n);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): CharGramFingerprint =
    copy(child = newChild)
}

/** `winnow_stats(text, k, w)` — robust winnowing fingerprint census (see
  * [[TextKernels.winnowStats]]); k and w are plan-time constants. */
case class WinnowStats(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1 && w >= 1, "gram size and window must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_fps", LongType, nullable = false),
    StructField("fp_checksum", LongType, nullable = false)))
  override def nullable: Boolean = true // short texts winnow to null
  override def prettyName: String = "winnow_stats"

  override protected def nullSafeEval(s: Any): Any =
    TextKernels.winnowStats(s.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""
         |${ev.value} = org.apache.spark.sql.graft.TextKernels.winnowStats($s, $k, $w);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WinnowStats =
    copy(child = newChild)
}

/** `winnow_fps(text, k, w)` — the winnowing selection as a sorted distinct
  * hash array (see [[TextKernels.winnowFps]]); feeds dedup joins and
  * [[SortedIntersectCount]] verification directly. */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1 && w >= 1, "gram size and window must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(s: Any): Any =
    TextKernels.winnowFps(s.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""
         |${ev.value} = org.apache.spark.sql.graft.TextKernels.winnowFps($s, $k, $w);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

/** `ascii_clean(text)` — one-pass normalize/collapse/trim kernel; input is
  * expected pre-lowercased (the kernel itself never changes case). */
case class AsciiClean(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "ascii_clean"

  override protected def nullSafeEval(s: Any): Any =
    TextKernels.asciiClean(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.sql.graft.TextKernels.asciiClean($s)")

  override protected def withNewChildInternal(newChild: Expression): AsciiClean =
    copy(child = newChild)
}

/** `word_ngrams(tokens, n)` — n-gram shingles of a token array (n is a
  * plan-time constant, matching the engine's shingle operators). */
case class WordNGrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "ngram size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.ngrams(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graft.TextKernels.ngrams($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}
