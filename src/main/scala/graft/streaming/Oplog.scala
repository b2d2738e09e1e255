package graft.streaming

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.databind.node.{JsonNodeFactory, ObjectNode}
import graft.config.{MigratorConfig, Namespaces}
import org.apache.spark.sql.types._

/** Change-log record — the reference's Oplog struct
  * (oplog_streamer.go:48-57). Documents ride as extended-JSON strings
  * (SURVEY §1.3 two-tier design: opaque payload for copy fidelity, no
  * schema inference on the change path — the Spark analog of the
  * reference's zero-copy `bson.Raw` relay, task.go:72-74).
  *
  * `ts` is the BSON Timestamp packed into one long (`t<<32 | i`) for total
  * ordering (SURVEY §1.2).
  */
final case class Oplog(
    ts: Long,
    op: String,     // i | u | d | c | n
    ns: String,     // db.coll
    o: String,      // JSON: insert doc / update spec / delete filter / applyOps
    o2: String,     // JSON: update/replace key filter {_id: ...}; may be null
    h: Long = 0L,
    t: Long = 0L,
    v: Int = 2)

/** One compiled write operation — the reference's OplogWriteModel
  * (oplog_utils.go:79-85). `kind` ∈ insert|replace|update|delete; for
  * update, `spec` is a normalized Mongo update doc
  * ({"$set":...}/{"$unset":...}/{"$inc":...}). `id` is the document key
  * serialized as canonical JSON text (handles int/string/oid uniformly —
  * SURVEY §7.4 heterogeneous-key mitigation).
  *
  * `seq` breaks ts ties: entries unwrapped from one `applyOps`
  * transaction all inherit the commit ts, but the reference applies them
  * in array order (ordered bulk writes) — `seq` carries that array
  * position so the per-key fold reproduces it (0 outside transactions). */
final case class WriteOp(ns: String, ts: Long, kind: String, id: String, spec: String,
    seq: Int = 0)

object Oplog {
  /** Spark schema of a change-log parquet/json source. */
  val schema: StructType = StructType(Seq(
    StructField("ts", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("ns", StringType, nullable = false),
    StructField("o", StringType, nullable = true),
    StructField("o2", StringType, nullable = true),
    StructField("h", LongType, nullable = true),
    StructField("t", LongType, nullable = true),
    StructField("v", IntegerType, nullable = true)))

  def packTs(t: Long, i: Int): Long = (t << 32) | (i & 0xffffffffL)

  // USE_BIG_DECIMAL_FOR_FLOATS: oplog payloads carry Decimal128 values
  // as high-precision JSON numbers; the default double parse would
  // silently round them during compile/apply re-serialization
  // exact big decimals: the default node factory strips trailing zeros
  // (re-rendering 1025750.0 as 1.02575E+6); withExactBigDecimals keeps
  // the parsed scale so re-serialized numbers match their input text
  @transient private lazy val mapper = new ObjectMapper()
    .configure(DeserializationFeature.USE_BIG_DECIMAL_FOR_FLOATS, true)
    .setNodeFactory(JsonNodeFactory.withExactBigDecimals(true))

  /** P4 — SkipOplog (oplog_utils.go:40-76): drop system DBs and empty
    * namespaces; for `$cmd` inspect the command and apply the namespace
    * include filter to the affected namespace; keep unknowns. */
  def skip(oplog: Oplog, cfg: MigratorConfig): Boolean = {
    val (db, coll) = Namespaces.split(oplog.ns)
    if (db.isEmpty || db == "local" || db == "config") return true
    if (coll == "$cmd") {
      val obj = parseObject(oplog.o).getOrElse(return false)
      val it = obj.properties().iterator()
      while (it.hasNext) {
        val e = it.next()
        e.getKey match {
          case "dropDatabase" => return cfg.skipNamespace(s"$db.*")
          case "create" | "createIndexes" | "drop" | "renameCollection" =>
            return cfg.skipNamespace(s"$db.${e.getValue.asText()}")
          case "applyOps" =>
            val arr = e.getValue
            if (arr.isArray && arr.size() > 0) {
              val first = arr.get(0)
              if (first.has("ns")) return cfg.skipNamespace(first.get("ns").asText())
            }
            return false // unknown, keep for further investigation
          case _ =>
        }
      }
      false // unknown command, keep it
    } else cfg.skipNamespace(oplog.ns)
  }

  /** ST6 — recursively flatten `applyOps` transaction entries
    * (oplog_utils.go:212-236). Non-command ops pass through. */
  def unwrap(oplog: Oplog): Seq[Oplog] = oplog.op match {
    case "c" =>
      parseObject(oplog.o) match {
        case Some(obj) if obj.has("applyOps") && obj.get("applyOps").isArray =>
          val arr = obj.get("applyOps")
          (0 until arr.size()).flatMap { i =>
            val n = arr.get(i)
            val inner = Oplog(
              // transaction entries share the commit ts
              ts = if (n.has("ts")) n.get("ts").asLong() else oplog.ts,
              op = if (n.has("op")) n.get("op").asText() else "n",
              ns = if (n.has("ns")) n.get("ns").asText() else "",
              o = if (n.has("o")) n.get("o").toString else null,
              o2 = if (n.has("o2")) n.get("o2").toString else null)
            unwrap(inner)
          }
        case _ => Nil
      }
    case _ => Seq(oplog)
  }

  /** T5 — GetWriteModels (oplog_utils.go:208-281), with the target-ns
    * rename applied. Returns Nil for `n` no-ops and unrecognized ops. */
  def compile(oplog: Oplog, cfg: MigratorConfig): Seq[WriteOp] = {
    val ns = cfg.toNamespace(oplog.ns)
    oplog.op match {
      // stamp each unwrapped transaction entry with its array position so
      // same-_id ops inside one transaction keep their order in the fold
      // (unwrap flattens nested applyOps, so entries are never "c" again)
      case "c" => unwrap(oplog).zipWithIndex.flatMap { case (inner, i) =>
        compile(inner, cfg).map(_.copy(seq = i))
      }
      case "n" => Nil
      case "i" =>
        idOf(oplog.o).map(id => WriteOp(ns, oplog.ts, "insert", id, oplog.o)).toSeq
      case "d" =>
        // delete filter is the Object itself (oplog_utils.go:236-239)
        idOf(oplog.o).map(id => WriteOp(ns, oplog.ts, "delete", id, oplog.o)).toSeq
      case "u" =>
        val id = idOf(oplog.o2).getOrElse(return Nil)
        parseObject(oplog.o) match {
          case Some(obj) if obj.has("diff") && obj.get("diff").isObject =>
            // update v2 (oplog_utils.go:248-264): u/i sections → $set,
            // d → $unset. The reference returns on the FIRST matching
            // section, silently dropping the $unset half of a combined
            // {"diff":{"u":...,"d":...}} op; a v2 diff can carry both, so
            // we accumulate every section into ONE $set+$unset update
            // (behavioral superset, flagged in round-1 review).
            val diff = obj.get("diff")
            val set = mapper.createObjectNode()
            val unset = mapper.createObjectNode()
            val it = diff.properties().iterator()
            while (it.hasNext) {
              val e = it.next()
              (e.getKey, e.getValue) match {
                case ("u" | "i", v: ObjectNode) => set.setAll[ObjectNode](v): Unit
                case ("d", v: ObjectNode) => unset.setAll[ObjectNode](v): Unit
                case _ =>
              }
            }
            val spec = mapper.createObjectNode()
            if (set.size > 0) spec.set[ObjectNode]("$set", set)
            if (unset.size > 0) spec.set[ObjectNode]("$unset", unset)
            if (spec.size == 0) Nil
            else Seq(WriteOp(ns, oplog.ts, "update", id, spec.toString))
          case Some(obj) =>
            // update v1 (oplog_utils.go:265-271): first $-prefixed key
            // (except $v) passes through as the update doc
            val it = obj.properties().iterator()
            while (it.hasNext) {
              val e = it.next()
              if (e.getKey != "$v" && e.getKey.startsWith("$"))
                return Seq(WriteOp(ns, oplog.ts, "update", id,
                  s"""{"${e.getKey}":${e.getValue.toString}}"""))
            }
            // plain doc → full replace (oplog_utils.go:273-276)
            Seq(WriteOp(ns, oplog.ts, "replace", id, oplog.o))
          case None => Nil
        }
      case _ => Nil
    }
  }

  /** Extract `_id` from a JSON doc as canonical JSON text. */
  def idOf(json: String): Option[String] =
    parseObject(json).filter(_.has("_id")).map(_.get("_id").toString)

  private def parseObject(json: String): Option[ObjectNode] =
    if (json == null) None
    else mapper.readTree(json) match {
      case o: ObjectNode => Some(o)
      case _ => None
    }
}

/** Mongo-style JSON document mutation — the tiny interpreter behind
  * `update` ops. Supports `$set`/`$unset`/`$inc` with dotted paths (the
  * operator set the reference's simulator generates — sim.go:178-239 uses
  * `$inc`; v1/v2 oplogs produce `$set`/`$unset`). */
object JsonDocOps {
  // big-decimal floats: an update to ANY field re-serializes the whole
  // doc — Decimal128 neighbors must survive that byte-for-byte
  @transient private lazy val mapper = new ObjectMapper()
    .configure(DeserializationFeature.USE_BIG_DECIMAL_FOR_FLOATS, true)
    .setNodeFactory(JsonNodeFactory.withExactBigDecimals(true))

  def applyOp(doc: Option[String], op: WriteOp): Option[String] = op.kind match {
    case "insert" | "replace" => Some(op.spec)
    case "delete" => None
    case "update" =>
      doc.map { d =>
        val base = mapper.readTree(d).asInstanceOf[ObjectNode]
        val update = mapper.readTree(op.spec).asInstanceOf[ObjectNode]
        val it = update.properties().iterator()
        while (it.hasNext) {
          val e = it.next()
          e.getKey match {
            case "$set" =>
              e.getValue.properties().forEach(f => setPath(base, f.getKey, f.getValue))
            case "$unset" =>
              e.getValue.properties().forEach(f => unsetPath(base, f.getKey))
            case "$inc" =>
              e.getValue.properties().forEach { f =>
                val cur = getPath(base, f.getKey)
                val add = f.getValue
                val sum: Any =
                  if ((cur != null && cur.isFloatingPointNumber) || add.isFloatingPointNumber)
                    (if (cur == null) 0.0 else cur.asDouble()) + add.asDouble()
                  else (if (cur == null) 0L else cur.asLong()) + add.asLong()
                sum match {
                  case d: Double => setPath(base, f.getKey, mapper.getNodeFactory.numberNode(d))
                  case l: Long => setPath(base, f.getKey, mapper.getNodeFactory.numberNode(l))
                }
              }
            case _ => // unsupported update operator: ignore (parity: server would)
          }
        }
        base.toString
      }
    case _ => doc
  }

  /** Sequentially fold a ts-ordered op list onto a base doc — the
    * per-key sequential-apply semantics the reference gets from ordered
    * bulk writes (oplog_utils.go:116-196), reproduced per key inside one
    * shuffle. */
  def fold(base: Option[String], ops: Seq[WriteOp]): Option[String] =
    ops.sortBy(o => (o.ts, o.seq)).foldLeft(base)(applyOp)

  private def setPath(node: ObjectNode, path: String, value: com.fasterxml.jackson.databind.JsonNode): Unit = {
    val parts = path.split('.')
    var cur = node
    parts.dropRight(1).foreach { p =>
      cur = cur.get(p) match {
        case o: ObjectNode => o
        case _ => cur.putObject(p)
      }
    }
    // NB: set[T] is generic on its return — an inferred T=Unit would make
    // Jackson cast its `return this` to BoxedUnit and throw; pin T.
    cur.set[com.fasterxml.jackson.databind.JsonNode](parts.last, value)
    ()
  }

  private def unsetPath(node: ObjectNode, path: String): Unit = {
    val parts = path.split('.')
    var cur: ObjectNode = node
    for (p <- parts.dropRight(1)) {
      cur.get(p) match {
        case o: ObjectNode => cur = o
        case _ => return
      }
    }
    cur.remove(parts.last): Unit
  }

  private def getPath(node: ObjectNode, path: String): com.fasterxml.jackson.databind.JsonNode = {
    var cur: com.fasterxml.jackson.databind.JsonNode = node
    for (p <- path.split('.')) {
      if (cur == null || !cur.isObject) return null
      cur = cur.get(p)
    }
    cur
  }
}
