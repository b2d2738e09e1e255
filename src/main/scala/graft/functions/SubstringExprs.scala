package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for substring-level dedup ([[graft.text.Substrings]]):
  * per-position k-gram md5s and winnowing fingerprint selection.
  *
  * Both keep md5-of-the-literal-gram as the hash so any SQL engine (and
  * the DuckDB oracle) can recompute every value; the win over the
  * declarative `transform(sequence(...), p => md5(substring(text, p, k)))`
  * twins is constant-factor — one tight loop per row, no materialized
  * k-char substring array, digest bytes sliced straight from the UTF-8
  * buffer on ASCII text — not a different algorithm. Semantics pinned to
  * the twins by SubstringsSpec.
  */
object SubstringExprs {
  private val HexDigits = "0123456789abcdef".toCharArray.map(_.toByte)

  /** Lowercase hex of a digest as a UTF8String — matches Spark's and
    * DuckDB's `md5(...)` output byte-for-byte. */
  private[functions] def hexUtf8(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xF)
      out(2 * i + 1) = HexDigits(d(i) & 0xF)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** All md5 digests of the `numGrams` k-CHAR grams of `s`, in position
    * order. On pure-ASCII text the digest input is sliced directly from
    * the UTF-8 buffer; otherwise each gram goes through a char-substring
    * (same bytes Spark's `md5(substring(s, p, k))` hashes, since a char
    * substring of well-formed UTF-8 re-encodes to the same bytes). */
  private[functions] def gramDigests(s: UTF8String, k: Int): Array[Array[Byte]] = {
    val md = TextExprs.md5.get()
    val bytes = s.getBytes
    val numChars = s.numChars()
    val n = numChars - k + 1
    if (n <= 0) return Array.empty
    val out = new Array[Array[Byte]](n)
    if (bytes.length == numChars) { // ASCII: byte offset == char offset
      var p = 0
      while (p < n) {
        md.reset()
        md.update(bytes, p, k)
        out(p) = md.digest()
        p += 1
      }
    } else {
      val str = s.toString
      var p = 0
      while (p < n) {
        // String is UTF-16; offsets here are Java chars. Spark counts
        // codepoints, so go through offsetByCodePoints for correctness
        // on supplementary characters.
        val lo = str.offsetByCodePoints(0, p)
        val hi = str.offsetByCodePoints(lo, k)
        md.reset()
        md.update(str.substring(lo, hi).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out(p) = md.digest()
        p += 1
      }
    }
    out
  }

  /** XXH64 (seed 42 — Spark's `xxhash64` builtin seed) of every k-char
    * gram of `s`, in position order — the 8-byte census key for the
    * production hash mode ([[graft.text.Substrings.stageGramCensus]]
    * `hash = "xxh64"`): 4× smaller than the 32-char md5 hex both on the
    * census shuffle and at rest. Values match
    * `xxhash64(substring(s, p, k))` bit-for-bit (SubstringsSpec pins
    * it), so the declarative twin stays expressible — but NOT
    * recomputable by DuckDB, which is why md5 remains the default for
    * oracle-pinned fixtures. */
  private[functions] def gramHashes64(s: UTF8String, k: Int): Array[Long] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.Platform
    val bytes = s.getBytes
    val numChars = s.numChars()
    val n = numChars - k + 1
    if (n <= 0) return Array.empty
    val out = new Array[Long](n)
    if (bytes.length == numChars) { // ASCII: byte offset == char offset
      var p = 0
      while (p < n) {
        out(p) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + p, k, 42L)
        p += 1
      }
    } else {
      val str = s.toString
      var p = 0
      while (p < n) {
        val lo = str.offsetByCodePoints(0, p)
        val hi = str.offsetByCodePoints(lo, k)
        val b = str.substring(lo, hi)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out(p) = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
        p += 1
      }
    }
    out
  }

  /** Unsigned lexicographic digest compare == hex-string compare. */
  private[functions] def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = (a(i) & 0xFF) - (b(i) & 0xFF)
      if (x != 0) return x
      i += 1
    }
    a.length - b.length
  }
}

/** md5 hex of every k-char gram of the input string, positions 1..len−k+1
  * (empty array below k chars). The exact-substring-dedup scan column. */
case class GramMd5s(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "k must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"gram_md5s expects string, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = compute(input)

  def compute(input: Any): ArrayData = {
    val ds = SubstringExprs.gramDigests(input.asInstanceOf[UTF8String], k)
    val out = new Array[Any](ds.length)
    var i = 0
    while (i < ds.length) { out(i) = SubstringExprs.hexUtf8(ds(i)); i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramMd5s", this, classOf[GramMd5s].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def prettyName: String = "gram_md5s"
  override protected def withNewChildInternal(newChild: Expression): GramMd5s =
    copy(child = newChild)
}

/** xxhash64 (seed 42) of every k-char gram of the input string, positions
  * 1..len−k+1 (empty array below k chars) — [[GramMd5s]] with the 8-byte
  * production census key instead of the 32-char oracle-recomputable hex
  * (see [[SubstringExprs.gramHashes64]]). */
case class GramXxh64s(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "k must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"gram_xxh64s expects string, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = compute(input)

  def compute(input: Any): ArrayData = {
    val hs = SubstringExprs.gramHashes64(input.asInstanceOf[UTF8String], k)
    val out = new Array[Any](hs.length)
    var i = 0
    while (i < hs.length) { out(i) = hs(i); i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramXxh64s", this, classOf[GramXxh64s].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def prettyName: String = "gram_xxh64s"
  override protected def withNewChildInternal(newChild: Expression): GramXxh64s =
    copy(child = newChild)
}

/** Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken,
  * SIGMOD '03 "robust winnowing", leftmost-tie variant): over the k-gram
  * md5s of the input, select in every window of `G = guarantee − k + 1`
  * consecutive positions the gram whose rank `(md5, position)` is
  * minimal. Returns `array<struct<pos int, h string>>`, 1-based
  * positions, ascending, each selected position once.
  *
  * The contract that makes this the scale path of substring dedup: ANY
  * two documents sharing a substring of at least `guarantee` chars
  * select at least one common gram inside the shared region —
  * position-independent, because a full window fits inside the shared
  * region and rank comparison inside it depends only on shared content
  * (md5s equal ⇒ ties fall back to position order, which both sides
  * agree on relative to the region). Expected density 2/(G+1) of
  * positions — the census shuffle shrinks by that factor vs the exact
  * all-grams path.
  *
  * Docs with fewer grams than one window select their single overall
  * rank-min (a short doc still fingerprints); below k chars the result
  * is empty. O(L) selection via a monotonic deque over the digests.
  */
case class WinnowAnchors(child: Expression, k: Int, guarantee: Int)
  extends UnaryExpression {
  require(k >= 1, "k must be >= 1")
  require(guarantee >= k, "guarantee must be >= k")
  private val G = guarantee - k + 1

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"winnow_anchors expects string, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("h", StringType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any = compute(input)

  def compute(input: Any): ArrayData = {
    val hs = SubstringExprs.gramDigests(input.asInstanceOf[UTF8String], k)
    val L = hs.length
    if (L == 0) return new GenericArrayData(Array.empty[Any])
    val sel = new java.util.ArrayList[Int]()
    if (L <= G) {
      var best = 0
      var p = 1
      while (p < L) { // strict <: ties keep the leftmost
        if (SubstringExprs.cmp(hs(p), hs(best)) < 0) best = p
        p += 1
      }
      sel.add(best)
    } else {
      // deque of positions with strictly increasing rank (h, pos); the
      // front is the current window's minimum
      val dq = new java.util.ArrayDeque[Int]()
      var p = 0
      while (p < L) {
        // a new position evicts strictly-larger ranks from the back;
        // an equal digest at an earlier position outranks it, so stays
        while (!dq.isEmpty && SubstringExprs.cmp(hs(dq.peekLast), hs(p)) > 0)
          dq.pollLast()
        dq.addLast(p)
        val winStart = p - G + 1
        if (winStart >= 0) {
          while (dq.peekFirst < winStart) dq.pollFirst()
          val m = dq.peekFirst
          if (sel.isEmpty || sel.get(sel.size - 1) != m) sel.add(m)
        }
        p += 1
      }
    }
    val out = new Array[Any](sel.size)
    var i = 0
    while (i < sel.size) {
      val p = sel.get(i)
      out(i) = new GenericInternalRow(Array[Any](p + 1, SubstringExprs.hexUtf8(hs(p))))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowAnchors", this, classOf[WinnowAnchors].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def prettyName: String = "winnow_anchors"
  override protected def withNewChildInternal(newChild: Expression): WinnowAnchors =
    copy(child = newChild)
}

/** [[WinnowAnchors]] ranking and keying by xxhash64 (seed 42) instead of
  * md5 — the PRODUCTION rank hash for the anchored census
  * ([[graft.text.Substrings.stageAnchorCensus]] `hash = "xxh64"`):
  * 8-byte census keys, one 64-bit hash per gram instead of a full md5
  * digest. Selection DIFFERS from the md5 variant (winnowing picks the
  * rank-min of each window, and rank order depends on the hash), but
  * the window guarantee is hash-independent: any two documents sharing
  * a substring of ≥ `guarantee` chars still select at least one common
  * gram inside the shared region, because a full window fits inside it
  * and rank comparison there depends only on shared content.
  * SubstringsSpec pins the guarantee as a property under BOTH hashes;
  * md5 stays the oracle-recomputable fixture default. Rank order is
  * UNSIGNED 64-bit (ties keep the leftmost position, as with md5).
  * Returns `array<struct<pos int, h bigint>>`. */
case class WinnowAnchors64(child: Expression, k: Int, guarantee: Int)
  extends UnaryExpression {
  require(k >= 1, "k must be >= 1")
  require(guarantee >= k, "guarantee must be >= k")
  private val G = guarantee - k + 1

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"winnow_anchors64 expects string, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any = compute(input)

  def compute(input: Any): ArrayData = {
    val hs = SubstringExprs.gramHashes64(input.asInstanceOf[UTF8String], k)
    val L = hs.length
    if (L == 0) return new GenericArrayData(Array.empty[Any])
    val sel = new java.util.ArrayList[Int]()
    if (L <= G) {
      var best = 0
      var p = 1
      while (p < L) { // strict <: ties keep the leftmost
        if (java.lang.Long.compareUnsigned(hs(p), hs(best)) < 0) best = p
        p += 1
      }
      sel.add(best)
    } else {
      val dq = new java.util.ArrayDeque[Int]()
      var p = 0
      while (p < L) {
        while (!dq.isEmpty &&
            java.lang.Long.compareUnsigned(hs(dq.peekLast), hs(p)) > 0)
          dq.pollLast()
        dq.addLast(p)
        val winStart = p - G + 1
        if (winStart >= 0) {
          while (dq.peekFirst < winStart) dq.pollFirst()
          val m = dq.peekFirst
          if (sel.isEmpty || sel.get(sel.size - 1) != m) sel.add(m)
        }
        p += 1
      }
    }
    val out = new Array[Any](sel.size)
    var i = 0
    while (i < sel.size) {
      val p = sel.get(i)
      out(i) = new GenericInternalRow(Array[Any](p + 1, hs(p)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowAnchors64", this, classOf[WinnowAnchors64].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def prettyName: String = "winnow_anchors64"
  override protected def withNewChildInternal(newChild: Expression): WinnowAnchors64 =
    copy(child = newChild)
}
