package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass sketch kernels as Catalyst expressions.
  *
  * Why expressions and not higher-order-function compositions: Spark's
  * lambda functions (`transform`/`aggregate`) evaluate interpreted, one
  * boxed element at a time, and a nested `transform(seeds, transform(
  * shingles, …))` recomputes the shingle stream per seed — measured
  * 228 s for 5 000 docs at sf0.1. These kernels do the same math in a
  * tight JVM loop over the UTF-8 bytes: signature build is ~ms per
  * thousand docs and the operator stays embarrassingly map-side, which
  * is the property that matters at 100 TB (signature cost scales with
  * executors; no shuffle until the band explode).
  */
object SketchFunctions {

  def minhash(c: Column, k: Int, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c), k, numHashes))

  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))

  def jaccard(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def shingles(c: Column, k: Int): Column =
    ColumnBridge.column(ShingleSet(ColumnBridge.expression(c), k))

  def shingleHashes(c: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(c), k))

  def overlapCoeff(a: Column, b: Column): Column =
    ColumnBridge.column(OverlapCoeffSorted(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def minhashAgree(a: Column, b: Column): Column =
    ColumnBridge.column(MinHashAgree(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def bloomMightContainBcast(v: Column,
      bc: org.apache.spark.broadcast.Broadcast[Array[Byte]]): Column =
    ColumnBridge.column(BloomMightContainBcast(ColumnBridge.expression(v), bc))

  def rollingMinK(c: Column, window: Int, k: Int): Column =
    ColumnBridge.column(RollingMinK(ColumnBridge.expression(c), window, k))
}

/** Distinct k-character shingles of a string as an array, one pass —
  * identical set to `array_distinct(transform(sequence(0, max(len-k,0)),
  * i -> substr(s, i+1, k)))` (character-indexed; strings shorter than k
  * contribute one whole-string shingle), without the interpreted
  * per-shingle lambda calls. First-occurrence order. */
case class ShingleSet(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val n = s.numChars()
    val nShingles = math.max(n - k + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String](nShingles * 2)
    var i = 0
    while (i < nShingles) {
      seen.add(s.substringSQL(i + 1, k)) // 1-based char semantics of substr
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): ShingleSet = copy(child = c)
}

/** [[ShingleSet]]'s hashed form: the distinct char k-shingles each
  * xxhash64'd to a long, emitted SORTED. For candidate-pair rescoring
  * joins the payload drops from ~20 bytes per 3-char shingle (UTF8
  * bytes + array offsets) to 8, and sortedness turns pair
  * intersection into a linear merge ([[OverlapCoeffSorted]]) instead
  * of a hash probe per element. Collision risk over a ≤10⁵-shingle
  * universe is ~10⁻¹⁰ per pair — the DedupSpec full-value gate
  * recomputes from the raw strings, so a collision would be a red
  * suite, not silent drift. */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val n = s.numChars()
    val nShingles = math.max(n - k + 1, 1)
    val seen = new java.util.HashSet[Long](nShingles * 2)
    var i = 0
    while (i < nShingles) {
      seen.add(org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        s.substringSQL(i + 1, k), org.apache.spark.sql.types.StringType, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
}

/** Overlap coefficient |A∩B| / min(|A|,|B|) over two SORTED long
  * arrays ([[ShingleHashes]] output) — one linear merge per candidate
  * pair, no per-element hashing, no intermediate intersection array
  * (`size(array_intersect(...))` builds one per pair). */
case class OverlapCoeffSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_overlap_coeff"
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val b = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    val mn = math.min(na, nb)
    if (mn == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val (x, y) = (a.getLong(i), b.getLong(j))
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / mn
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): OverlapCoeffSorted =
    copy(left = l, right = r)
}

/** Fraction of positions where two equal-length long arrays agree —
  * the unbiased MinHash Jaccard estimate, one unboxed loop per
  * candidate pair (replaces `size(filter(zip_with(a, b, ==), v)) / n`,
  * which made three interpreted lambda passes per pair). */
case class MinHashAgree(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_minhash_agree"
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val b = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) eq += 1; i += 1 }
    eq.toDouble / n
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinHashAgree =
    copy(left = l, right = r)
}

/** |A ∩ B| / |A ∪ B| over two string arrays (inputs assumed distinct,
  * as shingle arrays are). Set-semantics identical to
  * `size(array_intersect)/size(array_union)`, but one hash-set pass per
  * pair instead of interpreted HOF evaluation — this sits inside an
  * all-candidate-pairs join, the hottest loop of the verify stage. */
case class JaccardSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_jaccard"
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val b = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    val set = new java.util.HashSet[UTF8String](na * 2)
    var i = 0
    while (i < na) { set.add(a.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < nb) { if (set.contains(b.getUTF8String(i))) inter += 1; i += 1 }
    inter.toDouble / (na + nb - inter)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
}

/** MinHash signature over k-byte shingles of the input string.
  *
  * sig[j] = min over shingles x of mix64(fnv1a64(x) + GOLDEN·j).
  * Duplicated shingles don't affect a min, so no distinct pass is
  * needed. Strings shorter than k contribute one whole-string shingle
  * (mirrors `substr(norm, i, k)` truncation semantics).
  */
case class MinHashSig(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && numHashes > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[UTF8String].getBytes
    val n = b.length
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val nShingles = math.max(n - k + 1, 1)
    var i = 0
    while (i < nShingles) {
      val h = HashFunctions.fnv1a64Bytes(b, i, math.min(i + k, n))
      var j = 0
      while (j < numHashes) {
        val m = HashFunctions.mix64(h + 0x9e3779b97f4a7c15L * j)
        if (m < sig(j)) sig(j) = m
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** 64-bit SimHash over whitespace-delimited tokens: bit j of the
  * output is set iff the sum over tokens of ±1 (sign chosen by bit j
  * of the token's fnv1a64) is positive. Frequency-weighted (each
  * occurrence votes). */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[UTF8String].getBytes
    val counts = new Array[Int](64)
    // Tokenize.isSpace is the repo-wide whitespace contract (Java \s,
    // including \x0B) — SimHash64 must split exactly like every other
    // token kernel so direct graft_simhash64(col) SQL use agrees with
    // the documented semantics.
    Tokenize.foreachToken(b) { (start, end) =>
      val h = HashFunctions.fnv1a64Bytes(b, start, end)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** Bottom-k rolling-hash document fingerprint (the MOSS/winnowing
  * family, Schleimer et al. 2003): a polynomial rolling hash (base
  * 257, natural 2⁶⁴ wraparound) slides a `window`-byte window over the
  * UTF-8 bytes in ONE pass; the fingerprint is the k smallest distinct
  * window hashes, ascending. Shared substrings produce shared window
  * hashes, so fingerprint overlap estimates containment — robust to
  * edits in a way whole-document digests are not, and O(k) per doc
  * regardless of document size (map-side; the candidate join on
  * exploded fingerprint values is bucketed like every other sketch).
  * Inputs shorter than the window hash as a single whole-string
  * window; empty input → empty fingerprint. */
case class RollingMinK(child: Expression, window: Int, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(window >= 1 && k >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rolling_mink"

  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    RollingMinK.sketch(bytes, window, k)
  }
  override protected def withNewChildInternal(c: Expression): RollingMinK =
    copy(child = c)
}

object RollingMinK {
  final val Base = 257L

  /** Reference-shared kernel: specs pin the expression against direct
    * calls of this same logic on arbitrary strings. */
  def sketch(bytes: Array[Byte], window: Int, k: Int): GenericArrayData = {
    if (bytes.isEmpty) return new GenericArrayData(Array.empty[Any])
    val w = math.min(window, bytes.length)
    // base^(w-1) for the outgoing byte, 2^64 wraparound
    var pow = 1L
    var p = 1
    while (p < w) { pow *= Base; p += 1 }
    val heap = new java.util.TreeSet[java.lang.Long]()
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * Base + (bytes(i) & 0xff)
      if (i >= w) h -= ((bytes(i - w) & 0xff) * pow) * Base
      if (i >= w - 1) {
        heap.add(h)
        if (heap.size > k) heap.remove(heap.last)
      }
      i += 1
    }
    val out = new Array[Any](heap.size)
    val it = heap.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }
}

/** The large-filter twin of Spark's [[org.apache.spark.sql.catalyst
  * .expressions.BloomFilterMightContain]]: the serialized filter rides
  * a TorrentBroadcast instead of a plan literal, so a gigabyte-scale
  * history filter (10⁹ digests at 1% fpp ≈ 1.2 GB) ships once per
  * executor rather than inside every task's serialized plan (and every
  * explain string). Deserialized lazily once per executor JVM; the
  * child must be the same 64-bit hash the filter was built over.
  * Equivalence with the literal path is pinned in DedupSpec. */
case class BloomMightContainBcast(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[Array[Byte]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_bloom_might_contain_bcast"

  @transient private lazy val filter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bc.value))

  override protected def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def withNewChildInternal(c: Expression): BloomMightContainBcast =
    copy(child = c)
}
