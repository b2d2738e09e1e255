package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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
