package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import java.sql.Timestamp
import java.time.Instant
import scala.jdk.CollectionConverters._

/** Compiles a MongoDB query document (the reference's per-namespace `filter`
  * config — /root/reference/includes.go:15, applied at scan in
  * /root/reference/task.go:54-57) into a Catalyst `Column` predicate.
  *
  * Spark-first rationale: producing a declarative `Column` (instead of an
  * interpreted row filter) lets Catalyst push the predicate into the parquet
  * scan (`PushedFilters`), prune partitions, and keep the whole pipeline in
  * whole-stage codegen — essential at 100 TB where a non-pushed filter means
  * reading every byte.
  *
  * Supported operator subset (everything the reference's test configs use —
  * e.g. `$in` in testdata/data-only.json, `$gte` + extended-JSON `$date` in
  * testdata/quickstart.json — plus the standard comparison/logic set):
  * `$eq $ne $gt $gte $lt $lte $in $nin $exists $not $and $or $nor $regex`,
  * implicit top-level conjunction, dotted paths into structs, and extended
  * JSON scalars `$date`, `$oid`, `$numberLong`, `$numberInt`,
  * `$numberDouble`, `$numberDecimal`.
  */
object MongoPredicate {
  private val mapper = new ObjectMapper()

  /** Parse a Mongo query-doc JSON string into a Spark predicate Column. */
  def compile(json: String): Column = {
    val root = mapper.readTree(json)
    require(root != null && root.isObject, s"filter must be a JSON object: $json")
    compileDoc(root)
  }

  /** Top level / nested query document: implicit AND over its entries. */
  private def compileDoc(doc: JsonNode): Column = {
    val preds = doc.properties().asScala.toSeq.map { e =>
      (e.getKey, e.getValue) match {
        case ("$and", arr) => combine(arr, _ && _)
        case ("$or", arr)  => combine(arr, _ || _)
        case ("$nor", arr) => !combine(arr, _ || _)
        case ("$not", sub) => !compileDoc(sub)
        case (field, spec) => compileField(field, spec)
      }
    }
    preds.reduceOption(_ && _).getOrElse(lit(true))
  }

  private def combine(arr: JsonNode, op: (Column, Column) => Column): Column = {
    require(arr.isArray && arr.size() > 0, "$and/$or/$nor take a non-empty array")
    arr.elements().asScala.map(compileDoc).reduce(op)
  }

  /** One `field: spec` entry. The spec is either an operator doc
    * (`{"$gt": 5}`), an extended-JSON scalar (`{"$date": ...}` — equality),
    * or a literal (equality). */
  private def compileField(field: String, spec: JsonNode): Column = {
    val c = col(field)
    extScalar(spec) match {
      case Some(v) => c === lit(v)
      case None if spec.isObject && spec.properties().asScala.exists(_.getKey.startsWith("$")) =>
        spec.properties().asScala.toSeq.map { e =>
          val v = e.getValue
          e.getKey match {
            case "$eq"  => c === lit(literal(v))
            case "$ne"  => !(c <=> lit(literal(v)))
            case "$gt"  => c > lit(literal(v))
            case "$gte" => c >= lit(literal(v))
            case "$lt"  => c < lit(literal(v))
            case "$lte" => c <= lit(literal(v))
            case "$in"  => c.isin(literalArray(v): _*)
            case "$nin" => !c.isin(literalArray(v): _*) || c.isNull
            case "$exists" =>
              // DOCUMENTED DIVERGENCE from MongoDB: a relational schema
              // cannot distinguish a field explicitly set to null from an
              // absent field — both surface as SQL NULL. Mongo's $exists
              // matches {f: null} docs ({$exists:true} is true for them);
              // here {$exists:true} ≡ IS NOT NULL, {$exists:false} ≡
              // IS NULL. This is the faithful mapping for columnar data
              // (parquet/lake), where "absent" and "null" are one state.
              if (v.asBoolean()) c.isNotNull else c.isNull
            case "$not" => !compileField(field, v)
            case "$regex" => c.rlike(v.asText())
            case op => throw new IllegalArgumentException(
              s"unsupported Mongo operator $op on field $field")
          }
        }.reduce(_ && _)
      case None => c === lit(literal(spec))
    }
  }

  private def literalArray(arr: JsonNode): Seq[Any] = {
    require(arr.isArray, "$in/$nin take an array")
    arr.elements().asScala.toSeq.map(literal)
  }

  /** JSON scalar (or extended-JSON wrapper) → Scala literal value. */
  private def literal(n: JsonNode): Any = extScalar(n).getOrElse {
    if (n.isTextual) n.asText()
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isFloatingPointNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else if (n.isNull) null
    else throw new IllegalArgumentException(s"unsupported literal: $n")
  }

  /** MongoDB extended-JSON scalar wrappers (`{"$date": ...}` etc.). */
  private def extScalar(n: JsonNode): Option[Any] = {
    if (!n.isObject || n.size() != 1) return None
    val e = n.properties().asScala.head
    e.getKey match {
      case "$date" =>
        val v = e.getValue
        val inst =
          if (v.isNumber) Instant.ofEpochMilli(v.asLong())
          else if (v.isObject && v.has("$numberLong"))
            Instant.ofEpochMilli(v.get("$numberLong").asText().toLong)
          else Instant.parse(v.asText())
        Some(Timestamp.from(inst))
      case "$oid"           => Some(e.getValue.asText())
      case "$numberLong"    => Some(e.getValue.asText().toLong)
      case "$numberInt"     => Some(e.getValue.asText().toInt)
      case "$numberDouble"  => Some(e.getValue.asText().toDouble)
      case "$numberDecimal" => Some(BigDecimal(e.getValue.asText()))
      case _ => None
    }
  }
}
