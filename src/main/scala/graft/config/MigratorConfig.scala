package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column

import scala.jdk.CollectionConverters._

/** One per-namespace job spec — the reference's `Include`
  * (/root/reference/includes.go:14-21): filter (Mongo query doc), limit,
  * masks + method, namespace (wildcards `db.*` / `*.coll` allowed), and
  * target-namespace rename `to`.
  *
  * The filter is kept as raw extended JSON and compiled lazily into a
  * Catalyst `Column` ([[MongoPredicate]]) so the engine stays declarative:
  * Catalyst pushes the compiled predicate into the source scan.
  */
final case class IncludeSpec(
    namespace: String,
    filterJson: String = "{}",
    limit: Long = 0L,
    masks: Seq[String] = Nil,
    method: String = "",
    to: String = "") {

  def predicate: Column = MongoPredicate.compile(filterJson)

  def hasFilter: Boolean = filterJson.trim.nonEmpty && filterJson.trim != "{}"

  /** Target namespace after rename (reference GetToNamespace,
    * /root/reference/migrator.go:254-262). */
  def toNamespace: String = if (to.nonEmpty) to else namespace
}

/** The full migration "query" a user submits — the reference's `Migrator`
  * config (/root/reference/migrator.go:22-34), parsed from extended JSON
  * with the same validation + defaulting rules
  * (/root/reference/migrator.go:278-311).
  *
  * `tail: true` keeps `-start`/`-resume` following the change stream
  * after catch-up instead of exiting — the reference's flagship
  * deployment shape (LiveStreamOplogs never returns,
  * /root/reference/oplog_streamer.go:270-323); the process then runs
  * until stopped (SIGTERM → clean stream shutdown → exit 0).
  *
  * `buckets` (ours, no reference analog — the reference's per-document
  * server writes need no layout help) selects the sink's hash-bucketed
  * incremental-merge layout: 0 = plain table (each streaming micro-batch
  * rewrites the whole table — fine for small targets), B > 0 = B
  * `graft_bucket=` partition dirs where a merge rewrites only touched
  * buckets. Size B so one bucket ≈ one comfortable task, e.g.
  * 100 TB / 256 MB ≈ 4·10⁵ buckets ([[graft.sources.ParquetCatalog]]).
  */
final case class MigratorConfig(
    command: String,
    source: String,
    target: String,
    block: Int = MigratorConfig.MaxBlockSize,
    isDrop: Boolean = false,
    includes: Seq[IncludeSpec] = Nil,
    port: Int = MigratorConfig.DefaultPort,
    spool: String = MigratorConfig.DefaultSpool,
    workers: Int = MigratorConfig.NumberWorkers,
    buckets: Int = 0,
    tail: Boolean = false,
    compareMode: String = MigratorConfig.CompareBucketed,
    verbose: Boolean = false) {

  private lazy val included: Map[String, IncludeSpec] =
    includes.map(i => i.namespace -> i).toMap

  /** Namespace include/exclude with `db.*` / `*.coll` wildcards — P3,
    * reference SkipNamespace /root/reference/migrator.go:237-251.
    * Empty include list means "migrate everything". */
  def skipNamespace(namespace: String): Boolean = {
    if (included.isEmpty) return false
    val (db, coll) = Namespaces.split(namespace)
    !(included.contains(namespace) ||
      included.contains(s"$db.*") ||
      included.contains(s"*.$coll"))
  }

  /** Target-namespace rename — T6, reference GetToNamespace
    * /root/reference/migrator.go:254-262. */
  def toNamespace(ns: String): String =
    included.get(ns).map(_.toNamespace).getOrElse(ns)
}

object MigratorConfig {
  // Defaults mirror /root/reference/neutrino.go:14-24.
  val DefaultSpool = "./spool"
  val MaxBlockSize = 10000
  val MaxNumberWorkers = 16
  val NumberWorkers = 8
  val DefaultPort = 3629

  val CommandAll = "all"
  val CommandConfig = "config"
  val CommandData = "data"
  val CommandDataOnly = "data-only"
  val CommandIndex = "index"
  val Commands: Set[String] =
    Set(CommandAll, CommandConfig, CommandData, CommandDataOnly, CommandIndex)

  val MaskDefault = "default"
  val MaskHex = "hex"
  val MaskPartial = "partial"

  /** `-compare` strategies: `bucketed` = sketch short-circuit (two scans
    * when in sync); `chunked` = splitter-block walk in BSON key order,
    * block size = `block` (inspectable chunk by chunk, the reference
    * comparator's unit of work). */
  val CompareBucketed = "bucketed"
  val CompareChunked = "chunked"

  private val mapper = new ObjectMapper()

  /** Parse + validate a migrator config JSON string (reference
    * ReadMigratorConfig + ValidateMigratorConfig,
    * /root/reference/migrator.go:265-311 — same error cases, same
    * defaulting). */
  def parse(json: String): MigratorConfig = {
    val n = mapper.readTree(json)
    require(n != null && n.isObject, "config must be a JSON object")
    def str(f: String, dflt: String = ""): String =
      if (n.has(f)) n.get(f).asText() else dflt
    def int(f: String, dflt: Int): Int =
      if (n.has(f)) n.get(f).asInt() else dflt
    def bool(f: String): Boolean = n.has(f) && n.get(f).asBoolean()

    val includes: Seq[IncludeSpec] =
      if (!n.has("includes")) Nil
      else n.get("includes").elements().asScala.map(parseInclude).toSeq

    val cfg = MigratorConfig(
      command = str("command"),
      source = str("source"),
      target = str("target"),
      block = int("block", 0) match { case b if b <= 0 => MaxBlockSize; case b => b },
      isDrop = bool("drop"),
      includes = includes,
      port = int("port", 0) match { case p if p <= 0 => DefaultPort; case p => p },
      spool = str("spool") match { case "" => DefaultSpool; case s => s },
      workers = int("workers", 0) match { case w if w < 1 => NumberWorkers; case w => w },
      buckets = int("buckets", 0),
      tail = bool("tail"),
      compareMode = str("compare_mode") match {
        case "" => CompareBucketed; case m => m
      },
      verbose = bool("verbose"))
    validate(cfg)
    cfg
  }

  /** Parse one include entry (reference GetInclude,
    * /root/reference/includes.go:49-68 + ConfigureMaskOption 71-82). */
  def parseInclude(n: JsonNode): IncludeSpec = {
    require(n.has("namespace") && n.get("namespace").asText().nonEmpty,
      "invalid namespace")
    val masks =
      if (!n.has("masks")) Nil
      else n.get("masks").elements().asScala.map(_.asText()).toSeq
    val spec = IncludeSpec(
      namespace = n.get("namespace").asText(),
      filterJson = if (n.has("filter")) n.get("filter").toString else "{}",
      limit = if (n.has("limit")) n.get("limit").asLong() else 0L,
      masks = masks,
      method = if (n.has("method")) n.get("method").asText() else "",
      to = if (n.has("to")) n.get("to").asText() else "")
    if (masks.nonEmpty) configureMaskOption(spec) else spec
  }

  private def configureMaskOption(spec: IncludeSpec): IncludeSpec = {
    val (db, coll) = Namespaces.split(spec.namespace)
    require(db != "*" && coll != "*",
      s"${spec.namespace}, wildcard is not supported with masking")
    spec.method match {
      case "" => spec.copy(method = MaskDefault)
      case m if m == MaskDefault || m == MaskHex || m == MaskPartial => spec
      case m => throw new IllegalArgumentException(s"invalid mask method $m")
    }
  }

  private def validate(cfg: MigratorConfig): Unit = {
    require(cfg.command.nonEmpty, "command is required")
    require(Commands.contains(cfg.command), s"invalid command ${cfg.command}")
    require(cfg.source.nonEmpty && cfg.target.nonEmpty,
      "source and target must have valid connection strings")
    require(cfg.workers <= MaxNumberWorkers,
      s"number of workers must be between 1 and $MaxNumberWorkers")
    require(!(cfg.isDrop && (cfg.command == CommandData || cfg.command == CommandDataOnly)),
      s"""cannot set {"drop": true} when command is ${cfg.command}""")
    require(cfg.buckets >= 0, "buckets must be >= 0")
    require(cfg.compareMode == CompareBucketed || cfg.compareMode == CompareChunked,
      s"invalid compare_mode ${cfg.compareMode}")
  }
}

/** Namespace (`db.coll`) helpers — reference mdb.SplitNamespace usage at
  * /root/reference/task.go:51. */
object Namespaces {
  /** Split on the FIRST dot: collection names may contain dots. */
  def split(ns: String): (String, String) = ns.indexOf('.') match {
    case -1 => (ns, "")
    case i => (ns.substring(0, i), ns.substring(i + 1))
  }
}
