package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the shingling hot path — the
  * `transform(sequence(...), i => ...)` formulations in
  * [[graft.text.Shingles]] interpret the lambda per ELEMENT (per
  * shingle), which at corpus scale is the dominant cost of the near-dup
  * pipeline's first stage. One tight loop per row instead; semantics
  * pinned to the HOF versions by TextExprsSpec.
  */
object TextExprs {
  private[functions] val Space = UTF8String.fromString(" ")

  /** Generated-code references are shared across tasks — digest state
    * must be per-thread. */
  private[functions] val md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Modulus of the minhash permutation family — prime, > 2^28 (the
    * seed-hash range) and < 2^31, so a_k·x + b_k < 2^56 never overflows
    * a 64-bit engine. */
  val MinHashP: Long = 1000000007L
}

/** Word n-grams over a word array: element j (0-based) joins words
  * j..j+n-1 with a single space. Matches
  * `transform(sequence(1, greatest(size(w)-(n-1), 1)), i => concat(...))`
  * with `try_element_at`: a doc with fewer than n words yields exactly
  * one NULL shingle, and a NULL word NULL-propagates into its shingles.
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def nullSafeEval(input: Any): Any = compute(input)

  def compute(input: Any): ArrayData = {
    val w = input.asInstanceOf[ArrayData]
    val size = w.numElements()
    val m = math.max(size - (n - 1), 1)
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      if (j + n <= size) {
        var ok = true
        val parts = new Array[UTF8String](2 * n - 1)
        var o = 0
        while (ok && o < n) {
          if (w.isNullAt(j + o)) ok = false
          else {
            if (o > 0) parts(2 * o - 1) = TextExprs.Space
            parts(2 * o) = w.getUTF8String(j + o)
          }
          o += 1
        }
        if (ok) out(j) = UTF8String.concat(parts: _*)
      }
      // else: shingle stays NULL (doc shorter than n words)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordNGrams", this, classOf[WordNGrams].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def prettyName: String = "word_ngrams"
  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

/** All minhashes of a shingle ARRAY in one pass — no explode, no
  * distinct, no per-doc aggregate. Each non-NULL shingle is md5-hashed
  * ONCE; its first 7 hex digits (28 bits) seed the permutation family
  * `h_k(x) = (a_k·x + b_k) mod p` (each injective on [0, p): a_k <
  * p = [[TextExprs.MinHashP]]), and element k of the result is the min
  * of h_k over the shingle set — min over the multiset is min over the
  * distinct set, so skipping dedup is exact. All arithmetic stays below
  * 2^56 (28-bit hash × <2^28 coefficient), exactly reproducible in any
  * 64-bit-integer SQL engine:
  * `min((a_k * CAST(('0x'||substr(md5(s),1,7)) AS BIGINT) + b_k) % p)`.
  * NULL result (filter it) when the array is NULL, empty, or all-NULL —
  * matching a doc that contributed no rows after
  * `explode + filter(isNotNull)`.
  *
  * This makes the signature stage a NARROW projection costing ONE
  * digest per shingle (the seed-prefixed-md5-per-k formulation cost
  * numHashes digests per shingle and an explode → distinct → aggregate
  * shuffle chain) — at 100 TB the near-dup pipeline's first exchange is
  * the band bucket aggregation.
  */
case class MinHashSigs(child: Expression, coeffs: IndexedSeq[(Long, Long)])
    extends UnaryExpression {
  require(coeffs.nonEmpty, "need at least one permutation")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val as: Array[Long] = coeffs.map(_._1).toArray
  @transient private lazy val bs: Array[Long] = coeffs.map(_._2).toArray

  override def nullSafeEval(input: Any): Any = compute(input)

  def compute(input: Any): ArrayData = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = as.length
    val md = TextExprs.md5.get()
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        any = true
        md.reset()
        val d = md.digest(arr.getUTF8String(j).getBytes)
        // first 7 hex digits == top 28 bits of the first 4 digest bytes
        val h = ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
          ((d(2) & 0xffL) << 4) | ((d(3) & 0xf0L) >> 4)
        var i = 0
        while (i < k) {
          val v = (as(i) * h + bs(i)) % TextExprs.MinHashP
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (!any) return null // no non-NULL shingle at all
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSigs", this, classOf[MinHashSigs].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}$$r =
         |  (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);
         |if (${ev.value}$$r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}$$r; }""".stripMargin)
  }

  override def prettyName: String = "minhash_sigs"
  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

/** All ordered pairs (a < b) of an array's DISTINCT elements —
  * `array<T>` → `array<struct<id_a:T, id_b:T>>` for an orderable
  * atomic T. Replaces the bucket self-join of LSH candidate
  * extraction: `groupBy(bucket).agg(collect_list(id))` + this
  * expression is ONE exchange where the join formulation needed the
  * census aggregate, the census join, and the self-join (3-4
  * exchanges over the same key). The caller caps bucket size BEFORE
  * expansion, so output stays O(cap²) per bucket. NULL elements are
  * ignored; NULL input → empty array.
  */
case class SortedPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType | IntegerType | ShortType | ByteType |
                   StringType | DoubleType | FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sorted_pairs expects an array of an orderable scalar, got ${t.sql}")
  }

  private def elemType = child.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id_a", elemType), StructField("id_b", elemType))),
    containsNull = false)

  @transient private lazy val ordering: Ordering[Any] =
    org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(elemType)

  override def nullSafeEval(input: Any): Any = compute(input)

  def compute(input: Any): ArrayData = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf = new scala.collection.mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) { if (!arr.isNullAt(i)) buf += arr.get(i, elemType); i += 1 }
    val sorted = buf.distinct.sorted(ordering)
    val m = sorted.length
    val out = new Array[Any](m * (m - 1) / 2)
    var p = 0
    var a = 0
    while (a < m) {
      var b = a + 1
      while (b < m) {
        out(p) = InternalRow(sorted(a), sorted(b))
        p += 1
        b += 1
      }
      a += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedPairs", this, classOf[SortedPairs].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def prettyName: String = "sorted_pairs"
  override protected def withNewChildInternal(newChild: Expression): SortedPairs =
    copy(child = newChild)
}

/** Character k-shingles over a string: element j (0-based) is the
  * k-char window at 1-based position j+1. Matches
  * `transform(sequence(1, greatest(length(t)-(k-1), 1)), i =>
  * substring(t, i, k))` — a string shorter than k yields one shingle
  * (its whole self), exactly like SQL substring. */
case class CharShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "k must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_shingles expects string, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = compute(input)

  def compute(input: Any): ArrayData = {
    val t = input.asInstanceOf[UTF8String]
    val len = t.numChars()
    val m = math.max(len - (k - 1), 1)
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      out(j) = t.substringSQL(j + 1, k)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charShingles", this, classOf[CharShingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def prettyName: String = "char_shingles"
  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

/** Min-md5 fingerprint + EXACT distinct-shingle count of a shingle
  * array in one pass — `struct<fingerprint: string, n_shingles:
  * bigint>`, NULL when the array is NULL, empty, or all-NULL (matching
  * a doc that contributed no rows after `explode`). Replaces the
  * fingerprint stage's explode → per-doc hash aggregate — one shuffle
  * of |docs|×|shingles| rows — with a NARROW projection; and since min
  * over the multiset is min over the distinct set, each DISTINCT
  * shingle is digested exactly once (the exploded plan hashed every
  * duplicate too). Digests compare unsigned-bytewise, which equals the
  * lexicographic order of their lowercase-hex form — the form any SQL
  * oracle's `min(md5(s))` compares.
  */
case class ShingleStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_stats expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("fingerprint", StringType, nullable = false),
    StructField("n_shingles", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = compute(input)

  def compute(input: Any): InternalRow = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = TextExprs.md5.get()
    val seen = new java.util.HashSet[UTF8String]()
    var min: Array[Byte] = null
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        // clone: the returned UTF8String may alias a buffer the row
        // reader reuses; the set must own stable bytes
        val s = arr.getUTF8String(j).clone()
        if (seen.add(s)) {
          md.reset()
          val d = md.digest(s.getBytes)
          if (min == null || java.util.Arrays.compareUnsigned(d, min) < 0) min = d
        }
      }
      j += 1
    }
    if (min == null) return null
    val hex = new java.lang.StringBuilder(32)
    min.foreach { b =>
      hex.append(Character.forDigit((b >> 4) & 0xF, 16))
      hex.append(Character.forDigit(b & 0xF, 16))
    }
    InternalRow(UTF8String.fromString(hex.toString), seen.size.toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleStats", this, classOf[ShingleStats].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""org.apache.spark.sql.catalyst.InternalRow ${ev.value}$$r =
         |  (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c);
         |if (${ev.value}$$r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}$$r; }""".stripMargin)
  }

  override def prettyName: String = "shingle_stats"
  override protected def withNewChildInternal(newChild: Expression): ShingleStats =
    copy(child = newChild)
}

/** Token-multiset repetition statistics in one pass:
  * (n_total, n_distinct, top_count) — total non-NULL elements, distinct
  * values, and the highest multiplicity of any single value. These are
  * the raw signals of the Gopher-family repetition quality filters
  * (duplicate-word fraction, most-common-word fraction), kept as exact
  * integers so any SQL engine reproduces them (`count(*)`,
  * `count(DISTINCT tok)`, `max(count(*)) OVER token group`).
  *
  * Replaces the explode(tokens) → per-(doc, token) count → per-doc
  * re-aggregate formulation (two shuffles over one row per token
  * OCCURRENCE) with a narrow projection — zero shuffles; the hash map
  * is per-document, bounded by the tokenizer's input cap. NULL elements
  * are ignored on both sides (unnest drops nothing, but the oracle
  * filters `tok IS NOT NULL`); empty/all-NULL input → NULL, callers
  * filter on the cheap `size(tokens) > 0` predicate.
  */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_stats expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_total", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = compute(input)

  def compute(input: Any): InternalRow = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, java.lang.Long]()
    var total = 0L
    var top = 0L
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        // clone: the returned UTF8String may alias a reused buffer
        val s = arr.getUTF8String(j).clone()
        val prev = counts.get(s)
        val c = if (prev == null) 1L else prev.longValue() + 1L
        counts.put(s, c)
        if (c > top) top = c
        total += 1
      }
      j += 1
    }
    if (total == 0) return null
    InternalRow(total, counts.size.toLong, top)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenStats", this, classOf[TokenStats].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""org.apache.spark.sql.catalyst.InternalRow ${ev.value}$$r =
         |  (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c);
         |if (${ev.value}$$r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}$$r; }""".stripMargin)
  }

  override def prettyName: String = "token_stats"
  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

/** [[TokenStats]] plus CHAR-MASS accounting in the same single hashmap
  * pass — the Gopher A1.2 n-gram repetition metrics need how many
  * characters sit in repeated or dominant n-grams, not just counts:
  *  - `top_chars`   = count·len of the most frequent element (ties →
  *    the lexicographically smallest, a total order any engine agrees
  *    on);
  *  - `dup_chars`   = Σ count·len over elements occurring ≥ 2 times;
  *  - `total_chars` = Σ count·len over all elements.
  * Char mass is over the element MULTISET (every occurrence counts its
  * full length; overlapping positions are not unioned — positional
  * union at gram level is [[graft.text.Substrings]]' job). NULL
  * elements are skipped; empty/all-NULL input → NULL struct.
  */
case class TokenCharStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_char_stats expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_total", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("top_chars", LongType, nullable = false),
    StructField("dup_chars", LongType, nullable = false),
    StructField("total_chars", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = compute(input)

  def compute(input: Any): InternalRow = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, java.lang.Long]()
    var total = 0L
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j).clone()
        val prev = counts.get(s)
        counts.put(s, if (prev == null) 1L else prev.longValue() + 1L)
        total += 1
      }
      j += 1
    }
    if (total == 0) return null
    var topCount = 0L
    var topGram: UTF8String = null
    var topChars = 0L
    var dupChars = 0L
    var totalChars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.longValue()
      val len = e.getKey.numChars().toLong
      totalChars += c * len
      if (c >= 2) dupChars += c * len
      if (c > topCount ||
        (c == topCount && (topGram == null || e.getKey.compareTo(topGram) < 0))) {
        topCount = c
        topGram = e.getKey
        topChars = c * len
      }
    }
    InternalRow(total, counts.size.toLong, topCount, topChars, dupChars, totalChars)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenCharStats", this, classOf[TokenCharStats].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""org.apache.spark.sql.catalyst.InternalRow ${ev.value}$$r =
         |  (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c);
         |if (${ev.value}$$r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}$$r; }""".stripMargin)
  }

  override def prettyName: String = "token_char_stats"
  override protected def withNewChildInternal(newChild: Expression): TokenCharStats =
    copy(child = newChild)
}

/** `bits`-wide SimHash over a token MULTISET in one pass: bit j of a
  * token's hash is bit (3 − j%4) of hex digit j/4 of md5(token) —
  * equivalently bit (7 − j%8) of digest byte j/8 — and the document bit
  * is the strict-majority vote over ALL tokens (a NULL token counts
  * toward the total but sets no bits, matching the exploded twin's
  * sum-ignores-null / count-counts-row semantics). NULL or empty input
  * → NULL, mirroring the exploded plan emitting no row for a token-less
  * doc (callers filter on the CHEAP input predicate, never on this
  * column). Bits pack little-endian into one long (bits ≤ 64; bit 63
  * lands in the sign bit — band extraction must mask after shifting).
  *
  * Replaces the explode(tokens) × explode(bits) → two hash-aggregate
  * formulation: the signature becomes a narrow projection — ZERO
  * shuffles over the corpus — pinned equal to the exploded twin by
  * ExprsSpec. 16 bits is the compact signature surfaced as
  * `graft_simhash`; 64 bits drives the banded near-dup candidate
  * pipeline ([[graft.text.Dedup.simhashCandidates]]).
  */
case class SimHashN(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 64, "bits must be in [1, 64]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = compute(input)

  def compute(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val ones = new Array[Int](bits)
    val md = TextExprs.md5.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < bits) {
          if (((d(j >>> 3) >> (7 - (j & 7))) & 1) == 1) ones(j) += 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (2 * ones(j) > n) sig |= 1L << j
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHashN", this, classOf[SimHashN].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""java.lang.Long ${ev.value}$$r = (java.lang.Long) $ref.compute($c);
         |if (${ev.value}$$r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}$$r.longValue(); }""".stripMargin)
  }

  override def prettyName: String = s"simhash$bits"
  override protected def withNewChildInternal(newChild: Expression): SimHashN =
    copy(child = newChild)
}

/** Shannon CHARACTER entropy of a string in one hashmap pass — the
  * compressibility quality signal (degenerate pages — repeated chars,
  * padding, ascii art — score low; natural prose sits near its
  * language's ~2.3–2.9 nats): H = Σ_c (n_c/L)·ln(L/n_c) over the
  * code-point census.
  *
  * Exactness convention of [[graft.text.TextFunctions.unigramSurprisal]]:
  * each distinct character's −ln(n_c/L) is floored to integer
  * MILLI-NATS first, then weighted by the integer count n_c and
  * integer-summed, so engines agree exactly (residual ln-ulp caveat on
  * the quantization itself, documented there). Code-POINT census, not
  * UTF-16 units — matches `substr(text, i, 1)`/`len()` in both Spark
  * and DuckDB.
  *
  * Output struct: (n_chars, total_mnats, entropy_nats) where
  * entropy_nats = total_mnats / 1000.0 / n_chars (one fixed IEEE tree).
  * NULL for the empty string (no census → entropy undefined).
  *
  * Scale shape: a pure codegen'd projection — zero shuffles, zero
  * joins; the declarative twin (explode + two aggregates) costs two
  * corpus-sized shuffles, which is exactly why this is native. */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_entropy expects string, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("total_mnats", LongType, nullable = false),
    StructField("entropy_nats", DoubleType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = compute(input)

  def compute(input: Any): InternalRow = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new java.util.HashMap[Integer, java.lang.Long]()
    var total = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val key = Integer.valueOf(cp)
      val prev = counts.get(key)
      counts.put(key, if (prev == null) 1L else prev.longValue() + 1L)
      total += 1
      i += Character.charCount(cp)
    }
    if (total == 0) return null
    var mnats = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val n = it.next().longValue()
      // the one fixed IEEE tree per level: a double division, one ln,
      // scale, floor — mirrored verbatim by the SQL twin
      mnats += n * math.floor(-1000.0 * math.log(n.toDouble / total)).toLong
    }
    InternalRow(total, mnats, mnats.toDouble / 1000.0 / total)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charEntropy", this, classOf[CharEntropy].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""org.apache.spark.sql.catalyst.InternalRow ${ev.value}$$r =
         |  (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c);
         |if (${ev.value}$$r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}$$r; }""".stripMargin)
  }

  override def prettyName: String = "char_entropy"
  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}
