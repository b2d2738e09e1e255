package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE ENCODE of one word under a trained, ordered merge list — the
  * whole replay as a single codegen'd projection.
  *
  * The declarative replay ([[graft.text.Bpe.applyMerge]] once per
  * learned merge) is the right shape for the TRAINER, where each round
  * must see the global pair census before choosing the next merge. At
  * ENCODE time the merge list is already fixed, and replaying it as k
  * chained window stages costs one Spark job per `localCheckpoint`
  * cadence — invisible at k = 8, but a 32k-merge production model
  * would pay ~10⁴ scheduler round-trips PER BATCH, the same
  * cadence-not-data cost the driver-local trainer removed from
  * training. Here the full replay runs per WORD inside one expression:
  * greedy left-to-right per merge in rank order (identical semantics —
  * BpeSpec pins this against the window-algebra fold), O(len · k)
  * worst-case per word with an early exit once the word is a single
  * symbol, all inside WholeStageCodegen.
  *
  * Returns the word's TOKEN COUNT (what [[graft.text.Bpe.encode]]
  * aggregates); symbols split by Unicode code point (Spark `substring`
  * semantics, the trainer's convention). NULL word → NULL.
  */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count expects a string word, got ${t.sql}")
  }

  override def dataType: DataType = IntegerType

  // the model as arrays for the hot loop (built once per executor ref)
  @transient private lazy val ls: Array[String] = merges.map(_._1).toArray
  @transient private lazy val rs: Array[String] = merges.map(_._2).toArray

  override def nullSafeEval(input: Any): Any = compute(input)

  def compute(input: Any): Int = {
    val w = input.asInstanceOf[UTF8String].toString
    // code-point symbol array
    var syms: Array[String] =
      w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    var m = 0
    while (m < ls.length && syms.length > 1) {
      val l = ls(m); val r = rs(m)
      // greedy left-to-right, in place into a builder only when a
      // match exists (the common case is no match for this merge)
      var i = 0
      var hit = false
      while (!hit && i < syms.length - 1) {
        if (syms(i) == l && syms(i + 1) == r) hit = true else i += 1
      }
      if (hit) {
        val out = Array.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
            out += (l + r); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
      }
      m += 1
    }
    syms.length
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTokenCount", this,
      classOf[BpeTokenCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def prettyName: String = "bpe_token_count"
  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}
