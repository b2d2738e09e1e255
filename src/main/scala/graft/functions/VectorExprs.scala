package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path.
  *
  * The declarative formulations (`transform` / `zip_with` / `aggregate`)
  * are higher-order functions, which Spark evaluates INTERPRETED — every
  * array element walks an expression tree with boxed lambda variables,
  * and the enclosing stage loses whole-stage codegen. For per-PAIR
  * scoring (the similarity join in [[graft.ml.Similarity]]) that tax is
  * paid candidates × dims times: the dominant cost of the embedding
  * near-dup queries at sf0.1 was lambda interpretation, not arithmetic.
  *
  * Each expression here evaluates in one tight primitive loop per row
  * and participates in whole-stage codegen via a single generated call
  * (`ctx.addReferenceObj` + `compute(...)`) — no per-element
  * interpretation, no boxing on the fast path, no codegen fallback.
  * Semantics (incl. NULL behavior) are pinned to the HOF formulations
  * they replace by VectorExprsSpec, and the DuckDB oracle SQL is
  * unchanged.
  */
object VectorExprs {
  /** Fast-path check: any NULL element in `arr`? */
  @inline private[functions] def hasNull(arr: ArrayData, n: Int): Boolean = {
    var i = 0
    while (i < n) { if (arr.isNullAt(i)) return true; i += 1 }
    false
  }
}

/** floor(x · scale) per coordinate: array<float|double> → array<long>.
  * NULL elements stay NULL (matching `transform(a, x => floor(x * s))`).
  */
case class QuantizeVec(child: Expression, scale: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantize_vec expects array<float> or array<double>, got ${t.sql}")
  }

  private def elemContainsNull = child.dataType.asInstanceOf[ArrayType].containsNull
  override def dataType: DataType = ArrayType(LongType, containsNull = elemContainsNull)
  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = compute(input)

  /** Public so generated code can call it through a reference object. */
  def compute(input: Any): ArrayData = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (elemContainsNull && VectorExprs.hasNull(arr, n)) {
      // slow path: preserve NULL elements positionally
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          out(i) = math.floor(x * scale).toLong
        }
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        out(i) = math.floor(x * scale).toLong
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantizeVec", this, classOf[QuantizeVec].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def prettyName: String = "quantize_vec"
  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
}

/** Integer dot product of two already-quantized long vectors.
  * NULL semantics match `aggregate(zip_with(a, b, _*_), 0L, _+_)`:
  * NULL if either array is NULL, if lengths differ (zip_with pads with
  * NULL), or if any overlapping element is NULL. */
case class DotQ(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_q expects two array<bigint>, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    compute(a, b)
  }

  /** Boxed so a NULL (length-mismatch / NULL-element) result survives
    * the generated-code call. */
  def compute(la: Any, rb: Any): java.lang.Long = {
    val a = la.asInstanceOf[ArrayData]
    val b = rb.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dotQ", this, classOf[DotQ].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Long ${ev.value}$$r = $ref.compute($a, $b);
         |if (${ev.value}$$r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}$$r.longValue(); }""".stripMargin)
  }

  override def prettyName: String = "dot_q"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotQ =
    copy(left = newLeft, right = newRight)
}

/** Sign-bit LSH bucket over a QUANTIZED vector: bit h is set when
  * Σ_i signs(h)(i)·x_i > 0. All `bits` projections run in ONE pass over
  * the vector. Matches the per-bit HOF formulation exactly, including:
  * any NULL element → every projection is NULL → no bit set (bucket 0);
  * a vector longer than the sign matrix fails loudly (the HOF version
  * indexed past the literal array under ANSI). */
case class LshSignBits(child: Expression, signs: IndexedSeq[IndexedSeq[Long]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_sign_bits expects array<bigint> (quantized), got ${t.sql}")
  }

  override def dataType: DataType = LongType

  @transient private lazy val mat: Array[Array[Long]] = signs.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = compute(input)

  def compute(input: Any): Long = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val dims = if (mat.isEmpty) 0 else mat(0).length
    if (n > dims) throw new IllegalArgumentException(
      s"lsh_sign_bits: vector has $n dims but the sign matrix has $dims")
    if (VectorExprs.hasNull(arr, n)) return 0L
    var bucket = 0L
    var h = 0
    while (h < mat.length) {
      val row = mat(h)
      var dot = 0L
      var i = 0
      while (i < n) { dot += row(i) * arr.getLong(i); i += 1 }
      if (dot > 0) bucket |= (1L << h)
      h += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshSignBits", this, classOf[LshSignBits].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def prettyName: String = "lsh_sign_bits"
  override protected def withNewChildInternal(newChild: Expression): LshSignBits =
    copy(child = newChild)
}
