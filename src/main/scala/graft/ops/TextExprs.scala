package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-friendly text hashing for dedup (SURVEY §2.11).
  *
  * The HOF formulation (filter/transform/sequence/slice/array_join) is
  * interpreted in Spark — measured 10+ s for 500 docs at sf0.1 — and the
  * minhash groupBy shipped every (doc, shingle) pair through a shuffle
  * with 64 aggregate columns. Computing the whole signature per row in
  * one compiled static call makes minhash a MAP-ONLY projection: no
  * explode, no shuffle, no interpreted expression anywhere. At 100 TB
  * that is the difference between a pipeline stage and a cluster melt. */
object TextHashUtil {

  /** Tokenize: lowercase + split on non-word runs, drop empties
    * (parity with Dedup.tokens). */
  def tokens(text: UTF8String): Array[String] = {
    val parts = text.toLowerCase.toString.split("\\W+")
    var n = 0
    var i = 0
    while (i < parts.length) { if (!parts(i).isEmpty) n += 1; i += 1 }
    if (n == parts.length) parts
    else {
      val out = new Array[String](n)
      var j = 0; i = 0
      while (i < parts.length) {
        if (!parts(i).isEmpty) { out(j) = parts(i); j += 1 }
        i += 1
      }
      out
    }
  }

  /** Distinct word n-gram shingles, space-joined
    * (parity with Dedup.shinglesOf∘tokens). */
  private def shingleStrings(text: UTF8String, n: Int): Array[String] = {
    val toks = tokens(text)
    if (toks.length == 0) return EmptyStrings
    val count = math.max(toks.length - n, 0) + 1
    val seen = new java.util.LinkedHashSet[String](count * 2)
    var i = 0
    while (i < count) {
      val end = math.min(i + n, toks.length)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < end) { if (j > i) sb.append(' '); sb.append(toks(j)); j += 1 }
      if (sb.length > 0) seen.add(sb.toString)
      i += 1
    }
    seen.toArray(EmptyStrings)
  }

  private val EmptyStrings = new Array[String](0)

  def shingles(text: UTF8String, n: Int): ArrayData = {
    val arr = shingleStrings(text, n)
    val out = new Array[Any](arr.length)
    var i = 0
    while (i < arr.length) { out(i) = UTF8String.fromString(arr(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** k-wise minhash signature over n-gram shingles. Hash function i
    * replicates Spark's xxhash64(shingle, lit(i)) exactly: xxhash64
    * CHAINS its arguments — hash(shingle, seed=42) feeds as the seed for
    * hash(i) — so signatures equal the agg formulation
    * min(xxhash64(shingle, lit(i))) they replace. Returns null when the
    * document yields no shingles. */
  def minhash(text: UTF8String, n: Int, k: Int): ArrayData = {
    val arr = shingleStrings(text, n)
    if (arr.length == 0) return null
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < arr.length) {
      val bytes = arr(i).getBytes(StandardCharsets.UTF_8)
      val base = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
      var s = 0
      while (s < k) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(s, base)
        if (h < sig(s)) sig(s) = h
        s += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Winnowing-style document fingerprint: min xxhash64 over space-joined
    * token `gram`-grams, computed WITHOUT materializing gram strings.
    * Tokens contain no spaces (they are split on \W+), so in the single
    * joined buffer "t0 t1 … tn-1" every gram's joined string is exactly a
    * contiguous byte range — hash the slice, no per-gram allocation. The
    * 0x20 scan is byte-safe: UTF-8 continuation bytes are ≥ 0x80, so a
    * space byte is always the literal separator. Bit-identical with the
    * HOF formulation TextAnalysis.fingerprintOfTokens (pinned in
    * OpsSpec); documents with no tokens fall back to xxhash64(raw text),
    * matching the HOF's empty-gram branch. */
  def fingerprint(text: UTF8String, gram: Int): Long = {
    val toks = tokens(text)
    val n = toks.length
    if (n == 0)
      return org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        text.getBaseObject, text.getBaseOffset, text.numBytes, 42L)
    val buf = String.join(" ", toks: _*).getBytes(StandardCharsets.UTF_8)
    val starts = new Array[Int](n)
    val ends = new Array[Int](n)
    var ti = 0
    var p = 0
    while (p < buf.length) {
      if (buf(p) == ' ') { ends(ti) = p; ti += 1; starts(ti) = p + 1 }
      p += 1
    }
    ends(n - 1) = buf.length
    // positions 0..max(n-gram,0): shorter-than-gram docs yield ONE gram
    // of all tokens (slice semantics of the HOF)
    val count = math.max(n - gram, 0) + 1
    var min = Long.MaxValue
    var i = 0
    while (i < count) {
      val last = math.min(i + gram, n) - 1
      val off = starts(i)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        buf, Platform.BYTE_ARRAY_OFFSET + off, ends(last) - off, 42L)
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Hash of EVERY `w`-token window, in token order (array index = the
    * window's 0-based start position) — the posting kernel for
    * substring-level dedup. Same contiguous-byte-range trick as
    * [[fingerprint]]: one joined buffer, no per-window string
    * allocation; each value equals Spark's
    * `xxhash64(concat_ws(' ', slice(tokens, i+1, w)))` bit for bit
    * (seed 42, identical bytes). Docs with fewer than `w` tokens yield
    * an EMPTY array (the HOF's size-guarded sequence semantics). */
  def windowHashes(text: UTF8String, w: Int): ArrayData = {
    val toks = tokens(text)
    val n = toks.length
    if (n < w) return new GenericArrayData(new Array[Any](0))
    val buf = String.join(" ", toks: _*).getBytes(StandardCharsets.UTF_8)
    val starts = new Array[Int](n)
    val ends = new Array[Int](n)
    var ti = 0
    var p = 0
    while (p < buf.length) {
      if (buf(p) == ' ') { ends(ti) = p; ti += 1; starts(ti) = p + 1 }
      p += 1
    }
    ends(n - 1) = buf.length
    val count = n - w + 1
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      val off = starts(i)
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        buf, Platform.BYTE_ARRAY_OFFSET + off, ends(i + w - 1) - off, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash computed entirely within the row — the map-only form
    * of the explode + 64-conditional-sums groupBy (Dedup.simhash's agg
    * formulation): per token OCCURRENCE, hash h = xxhash64(token)
    * (seed 42, UTF-8 bytes — Spark's xxhash64(col) exactly); bit b of h
    * votes +1/-1 on counter b; output bit b is set iff its vote sum is
    * positive. votes_b = 2*ones_b - n, so votes_b > 0 ⟺ 2*ones_b > n.
    * Returns null for token-less documents (the agg formulation emits no
    * group for them — callers filter nulls to keep the row set equal). */
  def simhash(text: UTF8String): Any = {
    val toks = tokens(text)
    val n = toks.length
    if (n == 0) return null
    val ones = new Array[Int](64)
    var i = 0
    while (i < n) {
      val bytes = toks(i).getBytes(StandardCharsets.UTF_8)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
      var b = 0
      while (b < 64) { ones(b) += ((h >>> b) & 1L).toInt; b += 1 }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (2L * ones(b) > n) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  /** Merge sorted/unsorted hit positions into maximal covered spans —
    * the per-document reduction of substring dedup's flagged postings:
    * each hit position p covers tokens [p, p+w-1]; overlapping or
    * adjacent windows merge (next start <= current end + 1). Exactly the
    * islands the explode(sequence)+distinct+row_number formulation
    * produces: the union of the w-wide intervals is a set of maximal
    * consecutive-position runs, and each run's token count is its length.
    * Input positions are distinct by construction (one posting per
    * window position); the kernel sorts, so input order is free. */
  def mergeSpans(positions: ArrayData, w: Int): ArrayData = {
    val n = positions.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](0))
    val ps = new Array[Int](n)
    var i = 0
    while (i < n) { ps(i) = positions.getInt(i); i += 1 }
    java.util.Arrays.sort(ps)
    val out = new java.util.ArrayList[Any](8)
    var start = ps(0).toLong
    var end = ps(0).toLong + (w - 1)
    i = 1
    while (i < n) {
      val p = ps(i).toLong
      if (p <= end + 1) { val e = p + (w - 1); if (e > end) end = e }
      else {
        out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](start, end, end - start + 1)))
        start = p; end = p + (w - 1)
      }
      i += 1
    }
    out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](start, end, end - start + 1)))
    new GenericArrayData(out.toArray)
  }

  /** Per-document token occurrence counts — array<struct<t,c>> with one
    * entry per DISTINCT token (first-seen order): the map-only form of
    * explode + groupBy(doc, token).count(). Counts are exact integers,
    * so downstream arithmetic is bit-equal with the shuffle form. */
  def tokenCounts(text: UTF8String): ArrayData = {
    val toks = tokens(text)
    if (toks.length == 0) return new GenericArrayData(new Array[Any](0))
    val counts = new java.util.LinkedHashMap[String, Long](toks.length * 2)
    var i = 0
    while (i < toks.length) {
      counts.merge(toks(i), 1L, java.lang.Long.sum)
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Token bigram pairs in document order — array<struct<a, b>> with
    * a = left token, b = the space-joined bigram string (the x15 join
    * keys), one entry per OCCURRENCE: the compiled form of the
    * interpreted zip_with(slice, slice, concat_ws) HOF chain. Documents
    * with fewer than two tokens yield an empty array (explode drops
    * them, matching the n >= 2 filter of the HOF form). */
  def bigrams(text: UTF8String): ArrayData = {
    val toks = tokens(text)
    val n = toks.length
    if (n < 2) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(toks(i)),
          UTF8String.fromString(toks(i) + " " + toks(i + 1))))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-document repetition stats in ONE pass — (n_tokens,
    * dup_token_ratio, top_bigram_frac) as a struct row. Replaces a
    * per-doc bigram explode + two doc-keyed shuffles with a map-only
    * projection; value parity with the agg formulation is exact:
    * dup = 1 - distinct/n (double division, same IEEE ops), top =
    * max bigram count / (n-1) (the agg's sum(counts) IS n-1), both 0.0
    * for docs the agg path left-join-misses (n < 2 / empty). */
  def repetitionStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = tokens(text)
    val n = toks.length
    val distinct = new java.util.HashSet[String](n * 2)
    var i = 0
    while (i < n) { distinct.add(toks(i)); i += 1 }
    val dup = if (n > 0) 1.0 - distinct.size.toDouble / n else 0.0
    var top = 0.0
    if (n >= 2) {
      val counts = new java.util.HashMap[String, Int](n * 2)
      var maxC = 0
      i = 0
      while (i < n - 1) {
        val bg = toks(i) + " " + toks(i + 1)
        val c = counts.merge(bg, 1, Integer.sum)
        if (c > maxC) maxC = c
        i += 1
      }
      top = maxC.toDouble / (n - 1).toDouble
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, dup, top))
  }
}

/** array<string> of distinct word n-gram shingles; whole-stage-codegen
  * via one static call (same pattern as BucketExpr). */
final case class ShinglesExpr(child: Expression, shingleN: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingles needs string, got $t")
  }

  override protected def nullSafeEval(v: Any): Any =
    TextHashUtil.shingles(v.asInstanceOf[UTF8String], shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // static forwarder call (class name without the module '$'): Janino
    // cannot resolve the `Obj.MODULE$` spelling
    val util = TextHashUtil.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$util.shingles($c, $shingleN)")
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

/** array<long> minhash signature, computed entirely within the row —
  * null for documents with no shingles. */
final case class MinhashExpr(child: Expression, shingleN: Int, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // shingle-less docs yield null
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash needs string, got $t")
  }

  override protected def nullSafeEval(v: Any): Any =
    TextHashUtil.minhash(v.asInstanceOf[UTF8String], shingleN, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = TextHashUtil.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $util.minhash($c, $shingleN, $k);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashExpr =
    copy(child = newChild)
}

/** One-pass language-ID scoring (the kernel behind TextAnalysis.langId):
  * tokenize once, count stopword hits for all languages in one walk,
  * count CJK chars — versus the HOF formulation's four independent
  * filter(toks, isin(...)) passes plus a regexp_replace, each re-walking
  * the token array. Decision rule replicated EXACTLY (greatest over
  * (score, lang) structs = argmax score, ties to the lexicographically
  * largest language; cjkRatio > 0.05 shortcuts to zh; score 0 → und). */
object TextLangUtil {
  // langs sorted ascending — same order the HOF's greatest() compares
  private val langs: Array[String] = Array("de", "en", "es", "fr")
  private val stopSets: Array[java.util.HashSet[String]] = {
    val m = Map(
      "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "with", "was", "on", "are"),
      "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "por", "con", "para", "es"),
      "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "im", "für", "auf", "des", "ein", "eine"),
      "fr" -> Seq("le", "la", "les", "de", "des", "et", "un", "une", "du", "est", "pour", "que", "dans", "sur"))
    langs.map { l =>
      val s = new java.util.HashSet[String]()
      m(l).foreach(s.add)
      s
    }
  }
  /** The stopword lists, exposed so the HOF formulation and the kernel
    * provably score against the SAME vocabulary. */
  def stopwords: Map[String, Seq[String]] = langs.zipWithIndex.map { case (l, i) =>
    l -> {
      val it = stopSets(i).iterator(); val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }.toMap

  def langId(text: UTF8String): UTF8String = {
    // CJK ratio over the ORIGINAL text's char count (parity with
    // length(text) - length(regexp_replace(text, "[一-鿿]", "")))
    val s = text.toString
    var cjk = 0
    var chars = 0
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      if (cp >= 0x4e00 && cp <= 0x9fff) cjk += 1
      chars += 1
      ci += Character.charCount(cp)
    }
    if (chars > 0 && cjk.toDouble / chars > 0.05) return UTF8String.fromString("zh")
    // tokenize once (lower + split on non-letter runs, parity with
    // filter(split(lower(text), "[^\\p{L}]+"), len > 0)), score all
    // languages in one walk
    val toks = text.toLowerCase.toString.split("[^\\p{L}]+")
    val scores = new Array[Int](langs.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (!t.isEmpty) {
        var l = 0
        while (l < langs.length) {
          if (stopSets(l).contains(t)) scores(l) += 1
          l += 1
        }
      }
      i += 1
    }
    // greatest(struct(score, lang)): max score, ties -> larger lang name;
    // langs[] is ascending so >= picks the later (larger) language
    var best = 0
    var l = 1
    while (l < langs.length) {
      if (scores(l) >= scores(best)) best = l
      l += 1
    }
    if (scores(best) > 0) UTF8String.fromString(langs(best))
    else UTF8String.fromString("und")
  }
}

/** string language tag, computed entirely within the row. */
final case class LangIdExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lang_id"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"lang_id needs string, got $t")
  }

  override protected def nullSafeEval(v: Any): Any =
    TextLangUtil.langId(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = TextLangUtil.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$util.langId($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

/** long fingerprint, computed entirely within the row — one buffer per
  * document instead of one string per gram (the round-7 GC hot spot). */
final case class FingerprintExpr(child: Expression, gram: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "doc_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"fingerprint needs string, got $t")
  }

  override protected def nullSafeEval(v: Any): Any =
    TextHashUtil.fingerprint(v.asInstanceOf[UTF8String], gram)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = TextHashUtil.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$util.fingerprint($c, $gram)")
  }

  override protected def withNewChildInternal(newChild: Expression): FingerprintExpr =
    copy(child = newChild)
}

object TextExprs {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def shingles(text: Column, n: Int): Column = column(ShinglesExpr(expression(text), n))
  def minhash(text: Column, shingleN: Int, k: Int): Column =
    column(MinhashExpr(expression(text), shingleN, k))
  def fingerprint(text: Column, gram: Int): Column =
    column(FingerprintExpr(expression(text), gram))
  def windowHashes(text: Column, w: Int): Column =
    column(WindowHashesExpr(expression(text), w))
  def repetitionStats(text: Column): Column =
    column(RepetitionStatsExpr(expression(text)))
  def simhash(text: Column): Column = column(SimhashExpr(expression(text)))
  def mergeSpans(positions: Column, w: Int): Column =
    column(MergeSpansExpr(expression(positions), w))
  def tokenCounts(text: Column): Column =
    column(TokenCountsExpr(expression(text)))
  def bigrams(text: Column): Column = column(BigramsExpr(expression(text)))
}

/** long 64-bit simhash, computed entirely within the row — null for
  * token-less documents (parity with the agg formulation's missing
  * group; see TextHashUtil.simhash). */
final case class SimhashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // token-less docs yield null
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash needs string, got $t")
  }

  override protected def nullSafeEval(v: Any): Any =
    TextHashUtil.simhash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = TextHashUtil.getClass.getName.stripSuffix("$")
    // freshName: the expression can appear several times in one codegen
    // function (a pushed-down null filter plus the projection) — a fixed
    // local name would collide and break the whole stage's compile
    val sh = ctx.freshName("simhash")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long $sh = (java.lang.Long) $util.simhash($c);
      if ($sh == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $sh.longValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashExpr =
    copy(child = newChild)
}

/** array<struct<span_start,span_end,span_tokens>> of maximal covered
  * spans from w-wide window hit positions (see TextHashUtil.mergeSpans). */
final case class MergeSpansExpr(child: Expression, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = MergeSpansExpr.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "merge_spans"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"merge_spans needs array<int>, got $t")
  }

  override protected def nullSafeEval(v: Any): Any =
    TextHashUtil.mergeSpans(v.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = TextHashUtil.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$util.mergeSpans($c, $w)")
  }

  override protected def withNewChildInternal(newChild: Expression): MergeSpansExpr =
    copy(child = newChild)
}

object MergeSpansExpr {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("span_start", LongType, nullable = false),
    StructField("span_end", LongType, nullable = false),
    StructField("span_tokens", LongType, nullable = false))), containsNull = false)
}

/** array<struct<t,c>> per-document distinct-token occurrence counts
  * (see TextHashUtil.tokenCounts). */
final case class TokenCountsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TokenCountsExpr.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"token_counts needs string, got $t")
  }

  override protected def nullSafeEval(v: Any): Any =
    TextHashUtil.tokenCounts(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = TextHashUtil.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$util.tokenCounts($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenCountsExpr =
    copy(child = newChild)
}

object TokenCountsExpr {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("t", StringType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)
}

/** array<struct<a,b>> token bigrams in document order, b = the joined
  * bigram string (see TextHashUtil.bigrams). */
final case class BigramsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BigramsExpr.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_bigrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"token_bigrams needs string, got $t")
  }

  override protected def nullSafeEval(v: Any): Any =
    TextHashUtil.bigrams(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = TextHashUtil.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$util.bigrams($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BigramsExpr =
    copy(child = newChild)
}

object BigramsExpr {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("a", StringType, nullable = false),
    StructField("b", StringType, nullable = false))), containsNull = false)
}

/** struct(n_tokens, dup_token_ratio, top_bigram_frac) computed per row
  * in one compiled pass — the map-only repetition gate. */
final case class RepetitionStatsExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = RepetitionStatsExpr.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "repetition_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"repetition_stats needs string, got $t")
  }

  override protected def nullSafeEval(v: Any): Any =
    TextHashUtil.repetitionStats(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = TextHashUtil.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$util.repetitionStats($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

object RepetitionStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("dup_token_ratio", DoubleType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false)))
}

/** array<long> of every w-token window's hash, index = window start —
  * the substring-dedup posting kernel (whole-stage codegen, one static
  * call; bit-equal to the HOF xxhash64(concat_ws(slice)) form). */
final case class WindowHashesExpr(child: Expression, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "window_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"window_hashes needs string, got $t")
  }

  override protected def nullSafeEval(v: Any): Any =
    TextHashUtil.windowHashes(v.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = TextHashUtil.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$util.windowHashes($c, $w)")
  }

  override protected def withNewChildInternal(newChild: Expression): WindowHashesExpr =
    copy(child = newChild)
}
