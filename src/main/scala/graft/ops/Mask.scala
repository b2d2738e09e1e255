package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Field masking — T1/T2/T3/T4 (reference mask.go:23-66).
  *
  * Spark-first: every method compiles to built-in codegen'd expressions
  * (`regexp_replace` / `md5` / `uuid`), and nested dotted paths become a
  * schema-driven rewrite with `withField` (structs) and `transform`
  * (arrays of structs) — no UDF, no row-at-a-time traversal, so the whole
  * mask stays inside WholeStageCodegen and costs one projection.
  *
  * Reference semantics preserved exactly (mask_test.go goldens):
  *  - `default`: every `[a-zA-Z0-9]` → `X`       ("555-66-7878" → "XXX-XX-XXXX")
  *  - `partial`: mask all but the last 4 chars for strings LONGER than 4;
  *    shorter strings are fully masked (mask.go:54-56 falls through)
  *  - `hex`:     replaced by a fresh random 24-hex id (non-deterministic,
  *    mask.go:57-58). We also offer `hexDeterministic` (`md5` prefix) for
  *    testability — divergence documented in SURVEY §7.4.
  *  - non-string values and arrays of primitives pass through unchanged
  *  - a dotted path descends structs AND arrays of structs; missing paths
  *    are a no-op.
  */
object Mask {
  val Default = "default"
  val Hex = "hex"
  val Partial = "partial"
  /** Engine extension: deterministic variant of `hex` for reproducible
    * pipelines (SURVEY §7.4 hard-part 4). */
  val HexDeterministic = "hex_deterministic"

  private val AlNum = "[a-zA-Z0-9]"

  /** Mask a single string-typed Column. */
  def maskedValue(c: Column, method: String): Column = method match {
    case Partial =>
      when(length(c) > 4,
        concat(
          regexp_replace(c.substr(lit(1), length(c) - 4), AlNum, "X"),
          c.substr(length(c) - 3, lit(4))))
        .otherwise(regexp_replace(c, AlNum, "X"))
    case Hex =>
      // fresh random 24-hex per row, like primitive.NewObjectID().Hex();
      // uuid() is Catalyst-native non-deterministic — no UDF needed.
      substring(regexp_replace(uuid(), "-", ""), 1, 24)
    case HexDeterministic =>
      substring(md5(c), 1, 24)
    case _ =>
      regexp_replace(c, AlNum, "X")
  }

  /** Apply masks (dotted paths) to a DataFrame — the wired version of the
    * reference's unwired MaskFields (mask.go:23-49). */
  def maskFields(df: DataFrame, fields: Seq[String], method: String): DataFrame =
    fields.foldLeft(df) { (d, f) => maskField(d, f, method) }

  def maskField(df: DataFrame, path: String, method: String): DataFrame = {
    val parts = path.split('.').toList
    parts match {
      case top :: rest =>
        df.schema.fields.find(_.name == top) match {
          case None => df // missing path: no-op, like maskDoc's silent return
          case Some(f) =>
            df.withColumn(top, rewrite(col(top), f.dataType, rest, method))
        }
      case Nil => df
    }
  }

  /** Mask a dotted path inside a JSON-STRING column — the DYNAMIC
    * documents case (SURVEY §2.12): rows carry heterogeneous shapes, so
    * no DataFrame schema exists for [[maskField]]'s `withField` rewrite.
    * One native expression per row ([[graft.functions.JsonMask]]) with
    * the same traversal semantics as [[rewrite]]; deterministic methods
    * only (task retries must reproduce the row). */
  def maskJson(c: Column, path: String, method: String): Column =
    org.apache.spark.sql.graftbridge.ExprBridge.column(
      graft.functions.JsonMask(
        org.apache.spark.sql.graftbridge.ExprBridge.expression(c),
        path.split('.').toSeq, method))

  /** Recursive schema-driven rewrite of one path step. */
  private def rewrite(c: Column, dt: DataType, rest: List[String], method: String): Column =
    (dt, rest) match {
      case (StringType, Nil) => maskedValue(c, method)
      case (_, Nil) => c // terminal non-string: pass through (mask.go:63-64)
      case (st: StructType, next :: tail) =>
        st.fields.find(_.name == next) match {
          case None => c
          case Some(f) =>
            c.withField(next, rewrite(c.getField(next), f.dataType, tail, method))
        }
      case (ArrayType(st: StructType, _), path @ (next :: _)) =>
        // arrays of structs: descend into each element (mask.go:39-45)
        st.fields.find(_.name == path.head) match {
          case None => c
          case Some(_) =>
            transform(c, x => rewrite(x, st, path, method))
        }
      case _ => c // array of primitives / mismatched path: pass through
    }
}
