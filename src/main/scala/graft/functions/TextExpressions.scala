package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native minhash-signature expression.
  *
  * Semantically identical to composing
  * `array_min(transform(sh, s -> conv(substr(md5(s), 1+8*band, 8), 16, 10)))`
  * per band (the DuckDB-oracle contract: band hashes are the four
  * disjoint 8-hex-digit slices of one MD5), but one pass: a single
  * digest per shingle, band minima folded from the raw digest bytes —
  * no hex string, no string→decimal conv, no per-band re-walk. The
  * composed form costs ~4 digests + 8 string conversions per shingle
  * through interpreted higher-order lambdas; on the near-dup path this
  * expression is the difference between the signature stage being
  * scan-bound and hash-bound (measured ~4× on the sf0.1 bench).
  */
case class MinHashSlices(child: Expression, nBands: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(nBands >= 1 && nBands <= 4, "an MD5 digest yields 4 32-bit slices")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_slices"

  /** Always nullable: an EMPTY input array yields null (matching
    * `array_min` on empty input), independent of child nullability.
    * Inheriting the child's nullability here would let the optimizer
    * elide null handling — and UnaryExpression's non-nullable codegen
    * branch assigns `isNull` without declaring it, a compile failure
    * that silently falls back to the interpreted path.
    */
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    MinHash.compute(v.asInstanceOf[ArrayData], nBands)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHash.compute($c, $nBands);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHash {
  /** One MD5 instance per thread: `MessageDigest.getInstance` is a
    * provider lookup + allocation, measurable when a scan calls the
    * digest once per ROW (hash32) rather than once per array. Shared by
    * [[MinHash.compute]] and [[Hash32Ops.compute]]; `reset()` before
    * every use makes reuse sound.
    */
  private[functions] val localMd5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Band minima over one-digest-per-element MD5 slices; null for an
    * empty array (matching `array_min`/DuckDB `list_aggregate 'min'` on
    * empty input).
    */
  def compute(arr: ArrayData, nBands: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val md = MinHash.localMd5.get()
    val mins = new Array[Long](nBands)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      md.reset()
      val digest = md.digest(arr.getUTF8String(i).getBytes)
      var b = 0
      while (b < nBands) {
        val o = 4 * b
        val v = ((digest(o) & 0xffL) << 24) | ((digest(o + 1) & 0xffL) << 16) |
          ((digest(o + 2) & 0xffL) << 8) | (digest(o + 3) & 0xffL)
        if (v < mins(b)) mins(b) = v
        b += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Native 32-bit-range MD5 hash: the first 4 digest bytes read
  * big-endian as an unsigned 32-bit value in a long — BIT-IDENTICAL to
  * the declarative contract `conv(substring(md5(s), 1, 8), 16, 10)
  * .cast("long")` (the first 8 hex digits ARE the first 4 bytes), which
  * is how every oracle replays it (`CAST(('0x' || substr(md5(s),1,8))
  * AS BIGINT)` in DuckDB). One digest + a 4-byte fold per call; the
  * declarative form materializes the 32-char hex STRING, substrings it,
  * and string-parses the slice through `conv` — measured ~2.3 s for
  * 2.4 M calls at sf0.1 (q26's cents-hash projection), almost all of it
  * the hex formatting and conv parse. hash32 feeds dedup fingerprints,
  * split assignment, PPS sampling, Bloom double-hashing, count-min and
  * the text-index bucket map, so the per-call cost is a surface-wide
  * constant factor (guide §1.2 step 2: per-task work, after the plan
  * shape is right).
  */
case class Hash32(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hash32"

  override def nullSafeEval(v: Any): Any =
    Hash32Ops.compute(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash32Ops.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Hash32Ops {
  /** First 4 MD5 bytes of the string's UTF-8 form, big-endian unsigned. */
  def compute(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = MinHash.localMd5.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}

/** Native word n-gram shingling: m tokens → m−n+1 space-joined n-grams,
  * EMPTY array when m < n (the short-document contract of
  * [[graft.text.TextFunctions.shingles]], whose declarative form this
  * replaces on hot paths).
  *
  * Semantically identical to
  * `transform(sequence(0, size-n), i -> concat_ws(' ', toks[i+1..i+n]))`
  * under the size guard — but one tight loop per row instead of an
  * interpreted higher-order lambda doing n `element_at` probes and a
  * varargs concat per element. The shingle projection runs TWICE per
  * near-dup pass (signature stage + exact-Jaccard stage), so it is the
  * scan-side cost floor of d05/d06/d19.
  */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "shingle length must be >= 1")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override def nullSafeEval(v: Any): Any =
    ShingleOps.compute(v.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleOps {
  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  /** Single merge pass over two ascending-sorted arrays. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    val out = new Array[Any](m - n + 1)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Intersection size of two SORTED string arrays by a single merge pass —
  * O(n+m) comparisons, zero allocation — the alternative to
  * `size(array_intersect(a, b))`, which builds a hash set per CALL.
  * Inputs must be sorted ascending under UTF8String binary order
  * (`array_sort` on a distinct array); duplicates on either side would
  * be counted per occurrence, so feed distinct arrays.
  *
  * WHEN to prefer it: pair-dense workloads — candidate pairs >> distinct
  * documents — where per-pair hash-set builds dominate and the one-off
  * corpus-wide sort amortizes. At d06's sf0.1 densities the built-in
  * array_intersect measured FASTER (the extra array_sort dominated), so
  * the oracle dedup path keeps the built-in; this expression is the
  * documented escape hatch, pinned by TextContractSpec.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    ShingleOps.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ShingleOps.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native BPE word segmentation under a FIXED ordered merge list (the
  * trained artifact, inlined like a broadcast codebook): characters,
  * then each merge fused greedy left-to-right in training order — the
  * exact semantics of [[graft.text.BpeTrainer.segmentWord]]'s
  * declarative fold chain, which d74's oracle replays recursively.
  * The declarative form nests one interpreted `aggregate` lambda PER
  * MERGE inside a per-word `transform`; at a realistic merge count
  * that is the whole encode cost (measured ~10 s for 3 merges at
  * sf0.1 vs ~1 s native — and a production tokenizer carries tens of
  * thousands of merges, where the fold chain would not even
  * construct). Here: one digest-free imperative pass per word per
  * merge, codegen'd via a reference-object merge table.
  */
case class BpeSegment(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_segment"

  @transient private lazy val flat: Array[org.apache.spark.unsafe.types.UTF8String] =
    merges.flatMap { case (a, b) =>
      Seq(org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
    }.toArray

  override def nullSafeEval(v: Any): Any =
    BpeOps.segment(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], flat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", flat,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeOps.segment($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeOps {
  import org.apache.spark.unsafe.types.UTF8String

  /** Character split + greedy left-to-right fusion per merge pair, in
    * order. `flat` holds the merges as [a0, b0, a1, b1, ...]. Char
    * boundaries are UTF8String CHARACTER substrings — the same
    * semantics as `substr(w, i, 1)` on both engines.
    */
  def segment(w: UTF8String, flat: Array[UTF8String]): ArrayData = {
    val n = w.numChars()
    var cur = new Array[UTF8String](n)
    var i = 0
    while (i < n) { cur(i) = w.substring(i, i + 1); i += 1 }
    var m = 0
    while (m < flat.length) {
      val a = flat(m)
      val b = flat(m + 1)
      val out = new Array[UTF8String](cur.length)
      var k = 0 // write cursor
      var j = 0 // read cursor
      while (j < cur.length) {
        if (j + 1 < cur.length && cur(j).equals(a) && cur(j + 1).equals(b)) {
          out(k) = UTF8String.concat(a, b)
          j += 2
        } else {
          out(k) = cur(j)
          j += 1
        }
        k += 1
      }
      cur = java.util.Arrays.copyOf(out, k)
      m += 2
    }
    new GenericArrayData(cur.asInstanceOf[Array[Any]])
  }
}

/** Single-pass multi-pattern substring counting via an Aho–Corasick
  * automaton — the blocklist/contamination-phrase scan a training
  * pipeline runs over every document. P regex or `replace`-count
  * passes cost P scans of the corpus; this is ONE scan per document
  * regardless of blocklist size, emitting one occurrence count per
  * pattern (every match position counts, overlapping included — the
  * standard AC output, and the semantics the oracle states
  * position-by-position).
  *
  * The automaton is built ONCE on the driver from the constant pattern
  * list and shipped to generated code as a reference object (the
  * [[BpeSegment]] pattern), so the per-row cost is a byte loop over
  * the text: `state = delta(state)(b)`, then bump the counts of every
  * pattern ending at that state. Matching is on UTF-8 BYTES — exact
  * for substring equality, since a pattern's leading byte can never
  * match a continuation byte mid-codepoint.
  *
  * The goto function is precomputed into a dense 256-wide DFA
  * (fail links folded at build time), trading memory
  * (~1 KB per trie node) for a branchless scan loop — right for the
  * bounded blocklists this models (thousands of phrases); a
  * million-pattern dictionary would want sorted-edge nodes instead.
  */
case class AhoCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "aho_counts needs a non-empty list of non-empty patterns")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "aho_counts"

  @transient private lazy val automaton: AhoAutomaton =
    new AhoAutomaton(patterns.map(_.getBytes("UTF-8")).toArray)

  override def nullSafeEval(v: Any): Any =
    automaton.counts(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ahoAutomaton", automaton,
      classOf[AhoAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$ref.counts($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Byte-level Aho–Corasick automaton with the goto function folded
  * into a dense DFA at build time. Build: trie insert, BFS fail
  * links, output lists merged down fail chains, transitions completed
  * so the scan never consults a fail link.
  */
final class AhoAutomaton(patterns: Array[Array[Byte]]) extends Serializable {
  private val nPatterns = patterns.length

  // Trie build with growable dense nodes.
  private var cap = math.max(16, patterns.map(_.length).sum + 1)
  private var delta = Array.ofDim[Int](cap, 256)
  private var ends: Array[List[Int]] = Array.fill(cap)(Nil)
  private var nNodes = 1
  locally { // inserts: delta holds raw trie edges (0 = absent; node 0 = root)
    var p = 0
    while (p < nPatterns) {
      val bytes = patterns(p)
      var s = 0
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        if (delta(s)(b) == 0) {
          if (nNodes == cap) {
            cap *= 2
            delta = delta ++ Array.ofDim[Int](cap - nNodes, 256)
            ends = ends ++ Array.fill(cap - nNodes)(List.empty[Int])
          }
          delta(s)(b) = nNodes
          nNodes += 1
        }
        s = delta(s)(b)
        i += 1
      }
      ends(s) = p :: ends(s)
      p += 1
    }
  }

  // BFS: fail links, merged outputs, and DFA completion in one order.
  private val out: Array[Array[Int]] = {
    val fail = new Array[Int](nNodes)
    val o = new Array[Array[Int]](nNodes)
    o(0) = ends(0).toArray
    val queue = new java.util.ArrayDeque[Int]()
    var b = 0
    while (b < 256) {
      val c = delta(0)(b)
      if (c != 0) { fail(c) = 0; queue.add(c) }
      b += 1
    }
    while (!queue.isEmpty) {
      val s = queue.poll()
      o(s) = (ends(s) ++ o(fail(s)).toList).toArray
      var b2 = 0
      while (b2 < 256) {
        val c = delta(s)(b2)
        if (c != 0) {
          fail(c) = delta(fail(s))(b2)
          queue.add(c)
        } else {
          delta(s)(b2) = delta(fail(s))(b2) // fold the fail transition
        }
        b2 += 1
      }
    }
    o
  }

  ends = null // build-only state; never ships to executors

  /** One pass over the text's UTF-8 bytes; one count per pattern. */
  def counts(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val res = new Array[Long](nPatterns)
    val bytes = text.getBytes
    var s = 0
    var i = 0
    while (i < bytes.length) {
      s = delta(s)(bytes(i) & 0xff)
      val hits = out(s)
      var j = 0
      while (j < hits.length) { res(hits(j)) += 1L; j += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(res)
  }
}

object text {
  /** Array of `nBands` minhash values for a string-array column. */
  def minhashSlices(shingles: Column, nBands: Int = 4): Column =
    ColumnBridge.column(MinHashSlices(ColumnBridge.expression(shingles), nBands))

  /** Native 32-bit-range md5 hash (first 8 hex digits as a long). */
  def hash32(c: Column): Column =
    ColumnBridge.column(Hash32(ColumnBridge.expression(c)))

  /** Native BPE segmentation of a word column under fixed merges. */
  def bpeSegment(word: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeSegment(ColumnBridge.expression(word), merges))

  /** Native word n-gram shingles over a token-array column. */
  def shingles(toks: Column, n: Int): Column =
    ColumnBridge.column(Shingles(ColumnBridge.expression(toks), n))

  /** Merge-count intersection of two sorted-distinct string arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Per-pattern overlapping substring counts in one Aho–Corasick pass. */
  def ahoCounts(textCol: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(AhoCounts(ColumnBridge.expression(textCol), patterns))
}
