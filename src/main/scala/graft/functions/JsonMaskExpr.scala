package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, TextNode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Field masking over TRULY DYNAMIC documents — the schema-free half of
  * T4 (reference mask.go:23-49 walks a `bson.D` whose shape is only
  * known per document; SURVEY §2.12 "dynamic documents"). The
  * schema-KNOWN half lives in [[graft.ops.Mask]] as a pure
  * `withField`/`transform` Column rewrite; this expression covers the
  * remaining case — a JSON-string column whose rows have heterogeneous
  * shapes, where no DataFrame schema exists to drive the rewrite.
  *
  * One Jackson parse → dotted-path walk → re-serialize per row, with
  * EXACTLY [[graft.ops.Mask]]'s traversal semantics, pinned by
  * MaskSpec's equivalence test (same doc through both paths):
  *  - the path descends object fields AND arrays of objects (an array
  *    step applies the remaining path to every OBJECT element,
  *    mask.go:39-45; nested arrays / scalar elements pass through like
  *    the typed rewrite's non-struct array case);
  *  - a terminal string is masked; terminal non-strings pass through;
  *  - a missing path step is a per-document no-op (maskDoc's silent
  *    return) — THE point of the dynamic variant: shape A's rows mask,
  *    shape B's rows pass, in the same column;
  *  - non-JSON rows pass through unchanged (no poison-row abort).
  *
  * Deterministic methods only (`default` | `partial` |
  * `hex_deterministic`): a random hex inside a row-level expression
  * would break retry idempotence — Spark may re-execute a task and
  * produce a different row than the lost copy.
  *
  * Masking is code-point faithful to [[graft.ops.Mask.maskedValue]]:
  * `[a-zA-Z0-9]` is ASCII-only (multi-byte code points pass through)
  * and `partial`'s last-4 window counts CODE POINTS like Spark's
  * `length`/`substr`, not UTF-16 units.
  */
case class JsonMask(child: Expression, path: Seq[String], method: String)
    extends UnaryExpression {
  require(path.nonEmpty && path.forall(_.nonEmpty),
    "mask path must be a non-empty dotted field path")
  require(JsonMask.Methods(method),
    s"json mask method must be one of ${JsonMask.Methods.mkString("|")}, got '$method'")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_mask_json expects a string (JSON) column, got ${t.sql}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = compute(input)

  def compute(input: Any): UTF8String = {
    val s = input.asInstanceOf[UTF8String].toString
    // parse the WHOLE row: a valid JSON prefix with trailing content
    // ('{"a":1}{"b":2}', '42 text') is NOT a JSON document — treating
    // it as one would silently truncate the row to its first value on
    // re-serialization. readTree alone stops at the first value, so the
    // trailing-token check is explicit.
    val root = try {
      val p = JsonMask.mapper.createParser(s)
      try {
        val t = p.readValueAsTree[JsonNode]()
        if (t != null && p.nextToken() == null) t else null
      } finally p.close()
    } catch {
      case _: java.io.IOException => null
    }
    if (root == null) input.asInstanceOf[UTF8String] // non-JSON: pass through
    else UTF8String.fromString(JsonMask.walk(root, path.toList, method).toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonMask", this, classOf[JsonMask].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def prettyName: String = "graft_mask_json"
  override protected def withNewChildInternal(newChild: Expression): JsonMask =
    copy(child = newChild)
}

object JsonMask {
  val Methods: Set[String] =
    Set(graft.ops.Mask.Default, graft.ops.Mask.Partial,
      graft.ops.Mask.HexDeterministic)

  /** ObjectMapper is thread-safe after construction; shared across
    * tasks like [[TextExprs.md5]]'s digest pool shares its factory. */
  private val mapper = new ObjectMapper()

  /** The [[graft.ops.Mask]].rewrite recursion over JsonNodes. */
  private def walk(n: JsonNode, rest: List[String], method: String): JsonNode =
    (n, rest) match {
      case (t: TextNode, Nil) => TextNode.valueOf(maskString(t.textValue(), method))
      case (_, Nil) => n // terminal non-string: pass through
      case (o: ObjectNode, next :: tail) =>
        if (o.has(next)) o.set(next, walk(o.get(next), tail, method)): JsonNode
        else o // missing path: per-document no-op
      case (a: ArrayNode, _) =>
        // arrays: the remaining path applies to every OBJECT element —
        // exactly Mask.rewrite's ArrayType(StructType) case. Nested
        // arrays and scalar elements pass through, matching the typed
        // rewrite's `case _ => c` (an array-of-arrays is out of the
        // dotted-path contract on BOTH halves, so neither masks it)
        var i = 0
        while (i < a.size()) {
          a.get(i) match {
            case o: ObjectNode => a.set(i, walk(o, rest, method)); ()
            case _ => ()
          }
          i += 1
        }
        a
      case _ => n // scalar mid-path: pass through
    }

  /** Driver-visible twin of [[graft.ops.Mask.maskedValue]] for plain
    * Java strings, code-point faithful (MaskSpec pins the equality). */
  def maskString(s: String, method: String): String = method match {
    case graft.ops.Mask.Partial =>
      val n = s.codePointCount(0, s.length)
      if (n > 4) {
        val cut = s.offsetByCodePoints(0, n - 4)
        maskAlnum(s.substring(0, cut)) + s.substring(cut)
      } else maskAlnum(s)
    case graft.ops.Mask.HexDeterministic =>
      val d = TextExprs.md5.get()
      d.reset()
      val h = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      h.take(12).map("%02x".format(_)).mkString // 24 hex chars
    case _ => maskAlnum(s)
  }

  private def maskAlnum(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val alnum = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9')
      b.append(if (alnum) 'X' else c)
      i += 1
    }
    b.toString
  }
}
