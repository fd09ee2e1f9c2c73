package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the text-dedup hot path.
  *
  * The first implementation used higher-order functions (`transform` /
  * `aggregate` lambdas), which Spark evaluates INTERPRETED — at 128 hash
  * slots × shingles × join branches that dominated whole queries. These
  * expressions run tight JVM loops (one xxhash64 per shingle, then cheap
  * splitmix64 per slot) and generate code that calls the same static
  * kernels, so projections containing them stay inside whole-stage codegen.
  */
object TextHash {
  /** splitmix64 finalizer — cheap per-slot derivation from one base hash. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  @inline def hashString(s: UTF8String): Long =
    XxHash64Function.hash(s, StringType, 42L)

  /** Kernel behind `word_shingles` (also called from generated code). */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.trim.split("\\s+")
    if (toks.length < n || (toks.length == 1 && toks(0).isEmpty)) {
      return new GenericArrayData(Array.empty[Any])
    }
    val seen = mutable.LinkedHashSet.empty[String]
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen += sb.toString
      i += 1
    }
    new GenericArrayData(seen.iterator.map(UTF8String.fromString).toArray[Any])
  }

  /** Kernel behind `minhash_signature` (also called from generated code). */
  def minhashSignature(arr: ArrayData, numHashes: Int, slotSeeds: Array[Long]): ArrayData = {
    val m = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var s = 0
    while (s < m) {
      if (!arr.isNullAt(s)) {
        val h = hashString(arr.getUTF8String(s))
        var i = 0
        while (i < numHashes) {
          val v = mix(h ^ slotSeeds(i))
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      s += 1
    }
    new GenericArrayData(sig.map(Long.box).toArray[Any])
  }

  /** Kernel behind `sorted_jaccard`: linear merge-count over two ascending
    * long arrays (also called from generated code). Inputs are expected to
    * be distinct-element (hashed shingle SETS).
    */
  def sortedJaccard(a: ArrayData, b: ArrayData): Double = {
    val la = a.numElements()
    val lb = b.numElements()
    if (la == 0 && lb == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0
    var union = 0
    while (i < la && j < lb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      union += 1
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    union += (la - i) + (lb - j)
    inter.toDouble / union.toDouble
  }

  /** Kernel behind `marker_counts` (also called from generated code): one
    * tokenization pass, one membership probe per (token, vocabulary).
    */
  private val CombiningMarks = java.util.regex.Pattern.compile("\\p{M}+")

  /** Kernel behind `normalize_text` (also called from generated code):
    * Unicode NFC normalization, optional accent stripping (NFD → drop
    * combining marks → NFC recompose), optional ROOT-locale lowercasing —
    * the standard text-preprocessing normal form (CCNet-style), applied
    * BEFORE hashing/shingling so byte-different encodings of the same
    * text dedup together. SQL-oracle counterpart:
    * `lower(nfc_normalize(text))` (accent stripping is engine-variant,
    * spec-gated on Unicode fixtures instead).
    */
  def normalizeText(
      text: UTF8String, lower: Boolean, stripAccents: Boolean): UTF8String = {
    var s = java.text.Normalizer.normalize(
      text.toString, java.text.Normalizer.Form.NFC)
    if (stripAccents) {
      s = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
      s = CombiningMarks.matcher(s).replaceAll("")
      s = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    }
    if (lower) s = s.toLowerCase(java.util.Locale.ROOT)
    UTF8String.fromString(s)
  }

  def markerCounts(text: UTF8String, sets: Array[java.util.HashSet[String]]): ArrayData = {
    val counts = new Array[Int](sets.length)
    val toks = text.toString.trim.split("\\s+")
    // blank text tokenizes to [""] — no vocabulary contains "", so skipping
    // it only saves the probes; counts are all-zero either way
    if (toks.length == 1 && toks(0).isEmpty) return new GenericArrayData(counts)
    var t = 0
    while (t < toks.length) {
      var i = 0
      while (i < sets.length) {
        if (sets(i).contains(toks(t))) counts(i) += 1
        i += 1
      }
      t += 1
    }
    new GenericArrayData(counts)
  }

  /** Kernel behind `word_ngrams` (also called from generated code): like
    * [[wordShingles]] but KEEPING duplicates — the multiplicity-preserving
    * form vocabulary counting needs.
    */
  def wordNgrams(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.trim.split("\\s+")
    if (toks.length < n || (toks.length == 1 && toks(0).isEmpty)) {
      return new GenericArrayData(Array.empty[Any])
    }
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Kernel behind `top_ngram_ratio` (also called from generated code):
    * occurrences of the most frequent word n-gram over total n-grams — the
    * Gopher-style repetition signal (Rae et al. 2021, "Scaling Language
    * Models", §A1.1: "fraction of characters in the most common n-gram").
    * One tokenization pass, one HashMap; 0.0 when the text has < n tokens.
    */
  def topNgramRatio(text: UTF8String, n: Int): Double = {
    val toks = text.toString.trim.split("\\s+")
    if (toks.length < n || (toks.length == 1 && toks(0).isEmpty)) return 0.0
    val counts = new java.util.HashMap[String, Integer]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    var max = 0
    var total = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val c = counts.merge(sb.toString, 1, (a, b) => a + b)
      if (c > max) max = c
      total += 1
      i += 1
    }
    max.toDouble / total.toDouble
  }

  /** Kernel behind `linear_bow_score` (also called from generated code):
    * fixed-point linear bag-of-words logit contribution. Tokenizes to the
    * NON-EMPTY maximal `\S+` runs (blank text has zero tokens and scores
    * exactly 0 — `split(trim(x))`'s phantom `""` element used to add a
    * `md5("")`-bucket weight to every blank doc, review r11), buckets
    * each token by the first 4 bytes of its MD5 (== the first 8 hex chars,
    * so a SQL oracle reproduces it as
    * `('0x' || substr(md5(t), 1, 8))::BIGINT % D` over
    * `list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '')`),
    * and sums the bucket's integer weight — BIGINT arithmetic,
    * order-independent, bit-identical across engines. One MessageDigest
    * reused across the row's tokens.
    */
  def linearBowScore(text: UTF8String, weights: Array[Long]): Long = {
    // Java String.trim (all ASCII whitespace), like every other kernel here
    // — UTF8String.trim strips SPACES only, so a tab-only doc used to
    // survive into split(limit=-1) as ["", ""] and score 2 phantom buckets
    val toks = text.toString.trim.split("\\s+")
    if (toks.length == 1 && toks(0).isEmpty) return 0L
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = weights.length
    var sum = 0L
    var i = 0
    while (i < toks.length) {
      md.reset()
      val h = md.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val b = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      sum += weights((b % d).toInt)
      i += 1
    }
    sum
  }

  /** Kernel behind `simhash64` (also called from generated code). */
  def simhash64(arr: ArrayData): Long = {
    val m = arr.numElements()
    val counters = new Array[Int](64)
    var s = 0
    while (s < m) {
      if (!arr.isNullAt(s)) {
        val h = hashString(arr.getUTF8String(s))
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) counters(i) += 1 else counters(i) -= 1
          i += 1
        }
      }
      s += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (counters(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Kernel behind `winnow_fps` (also called from generated code): the
    * full winnowing selection (Schleimer et al. 2003) in one pass —
    * word-k-gram hashes, rightmost-min-per-window via a monotonic deque
    * (O(grams) amortized, vs O(grams·w) array churn for the HOF
    * formulation — the 500k probe measured the HOF pipeline at ~21 s
    * either hash, i.e. allocation-bound, not hash-bound), consecutive
    * dedup (the selected index is non-decreasing as the window slides,
    * so consecutive dedup IS global distinct). `portable` selects the
    * md5-prefix hash (value-identical to SQL
    * `('0x' || substr(md5(g), 1, 8))::BIGINT` — the oracle re-derivation)
    * over xxhash64. Positions are 1-based.
    */
  def winnowFingerprints(text: UTF8String, k: Int, w: Int, portable: Boolean): ArrayData = {
    val toks = text.toString.trim.split("\\s+")
    if (toks.length < k || (toks.length == 1 && toks(0).isEmpty)) {
      return new GenericArrayData(Array.empty[Any])
    }
    val n = toks.length - k + 1
    val hs = new Array[Long](n)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      if (portable) {
        val d = md5Local.get()
        d.reset()
        val b = d.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        hs(i) = ((b(0) & 0xFFL) << 24) | ((b(1) & 0xFFL) << 16) |
          ((b(2) & 0xFFL) << 8) | (b(3) & 0xFFL)
      } else {
        hs(i) = hashString(UTF8String.fromString(sb.toString))
      }
      i += 1
    }
    // monotonic deque of indices; `>=` pop keeps the RIGHTMOST min on ties
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0
    val outPos = new java.util.ArrayList[Integer]()
    val outFp = new java.util.ArrayList[java.lang.Long]()
    val firstFill = math.min(w, n)
    var idx = 0
    while (idx < firstFill) {
      while (tail > head && hs(dq(tail - 1)) >= hs(idx)) tail -= 1
      dq(tail) = idx; tail += 1
      idx += 1
    }
    val lastStart = math.max(0, n - w)
    var s = 0
    var lastSel = -1
    while (s <= lastStart) {
      while (dq(head) < s) head += 1
      val sel = dq(head)
      if (sel != lastSel) {
        outPos.add(sel + 1)
        outFp.add(hs(sel))
        lastSel = sel
      }
      if (idx < n && idx == s + w) {
        while (tail > head && hs(dq(tail - 1)) >= hs(idx)) tail -= 1
        dq(tail) = idx; tail += 1
        idx += 1
      }
      s += 1
    }
    val out = new Array[Any](outPos.size)
    var t = 0
    while (t < outPos.size) {
      out(t) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](outPos.get(t).intValue(), outFp.get(t).longValue()))
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** `word_shingles(text, n)`: distinct word n-grams (space-joined) of a
  * whitespace-tokenized string. Single pass, no regex per element.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    TextHash.wordShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.wordShingles($c, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `word_ngrams(text, n)`: ALL word n-grams (duplicates kept) of a
  * whitespace-tokenized string — [[WordShingles]] without the dedup.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n-gram size must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    TextHash.wordNgrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.wordNgrams($c, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `minhash_signature(shingles, k)`: k-slot MinHash — one xxhash64 per
  * shingle, k splitmix64-derived slot values, running minima.
  */
case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes >= 1, "numHashes must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  private lazy val slotSeeds: Array[Long] =
    Array.tabulate(numHashes)(i => TextHash.mix(0xC0FFEEL + i.toLong))

  override def nullSafeEval(input: Any): Any =
    TextHash.minhashSignature(input.asInstanceOf[ArrayData], numHashes, slotSeeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seeds = ctx.addReferenceObj("slotSeeds", slotSeeds, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.minhashSignature($c, $numHashes, $seeds);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `sorted_jaccard(a, b)`: jaccard similarity of two ASCENDING long arrays
  * via a single allocation-free merge pass — the cheap exact verify for
  * hashed shingle sets (string-array `array_intersect`/`array_union` builds
  * per-pair hash sets of UTF8Strings; at millions of candidate pairs that
  * dominated whole dedup queries).
  */
case class SortedArrayJaccard(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_jaccard"

  override def nullSafeEval(l: Any, r: Any): Any =
    TextHash.sortedJaccard(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextHash.sortedJaccard($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `marker_counts(text)`: per-vocabulary marker-word hit counts in ONE
  * tokenization pass — the hot kernel of n-gram-free language ID. The HOF
  * formulation (`size(filter(split(...), isin(...)))` per language) is
  * interpreted per element and re-splits the text per language; this runs
  * the whole profile in a single codegen'd call.
  */
/** `linear_bow_score(text)`: fixed-point hashed bag-of-words logit — the
  * sum over whitespace tokens of `weights[md5_bucket(token) mod D]`. The
  * scoring half of a fastText/CCNet-style linear quality classifier; see
  * [[TextHash.linearBowScore]] for the oracle-reproducible bucket rule.
  */
case class LinearBowScore(child: Expression, weights: Array[Long])
    extends UnaryExpression {
  require(weights.nonEmpty, "weights must be non-empty")
  override def dataType: DataType = LongType
  override def prettyName: String = "linear_bow_score"

  override def nullSafeEval(input: Any): Any =
    TextHash.linearBowScore(input.asInstanceOf[UTF8String], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("bowWeights", weights, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.linearBowScore($c, $w);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `normalize_text(text)`: Unicode NFC + optional accent strip + optional
  * ROOT-locale lowercase; see [[TextHash.normalizeText]].
  */
/** `winnow_fps(text, k, w[, portable])`: winnowing fingerprint selection
  * (Schleimer et al. 2003) as one codegen'd kernel call — array of
  * `struct<pos:int, fp:long>`, positions 1-based. See
  * [[TextHash.winnowFingerprints]] for the algorithm and hash contract.
  */
case class WinnowFingerprints(
    child: Expression, k: Int, w: Int, portable: Boolean)
  extends UnaryExpression {
  require(k >= 1, "k must be >= 1")
  require(w >= 1, "w must be >= 1")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(input: Any): Any =
    TextHash.winnowFingerprints(input.asInstanceOf[UTF8String], k, w, portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.winnowFingerprints($c, $k, $w, $portable);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class NormalizeText(child: Expression, lower: Boolean, stripAccents: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(input: Any): Any =
    TextHash.normalizeText(input.asInstanceOf[UTF8String], lower, stripAccents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.normalizeText($c, $lower, $stripAccents);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class MarkerCounts(child: Expression, vocabularies: Seq[Seq[String]])
    extends UnaryExpression {
  require(vocabularies.nonEmpty, "at least one vocabulary required")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "marker_counts"

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    vocabularies.map { vs =>
      val s = new java.util.HashSet[String]()
      vs.foreach(s.add)
      s
    }.toArray

  override def nullSafeEval(input: Any): Any =
    TextHash.markerCounts(input.asInstanceOf[UTF8String], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("markerSets", sets, "java.util.HashSet[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.markerCounts($c, $setsRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `top_ngram_ratio(text, n)`: share of the most frequent word n-gram among
  * all n-grams — the Gopher-style repetition quality signal. One pass, one
  * map; codegen keeps it inside whole-stage projections like the other
  * text kernels.
  */
case class TopNgramRatio(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n-gram size must be >= 1")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "top_ngram_ratio"

  override def nullSafeEval(input: Any): Any =
    TextHash.topNgramRatio(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.topNgramRatio($c, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `simhash64(tokens)`: 64-bit SimHash — one xxhash64 per token, 64 signed
  * bit counters, sign bits form the fingerprint.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    TextHash.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.simhash64($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
