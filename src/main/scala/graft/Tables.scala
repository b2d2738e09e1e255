package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver-provided parquet fixtures (TESTDATA.md).
  *
  * Each "namespace" (reference: `db.coll`, split by mdb.SplitNamespace —
  * /root/reference/task.go:51) maps to one parquet table under the
  * scale-factor directory. All reads go through here so that the scan is a
  * plain `spark.read.parquet` — Catalyst pushes filters and prunes columns
  * into the parquet scan for free (SURVEY.md §4).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Read one table from a scale-factor directory. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** µs-since-epoch from an event-time column, whatever physical type
    * the fixture generation chose for it: parquet TIMESTAMP(NANOS) reads
    * as ns-long under `nanosAsLong` (divide), TIMESTAMP(MICROS) reads as
    * timestamp[_ntz] (unix_micros; the NTZ→TZ cast is the identity
    * instant under the session's pinned UTC zone). Twin of DuckDB's
    * `epoch_us(ts)`, which applies the same µs truncation to either
    * physical type — every event-time operator must extract time through
    * here or the two engines diverge on the fixture vintage. */
  def tsUs(df: DataFrame, c: String = "ts"): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    df.schema(c).dataType match {
      case LongType => expr(s"$c DIV 1000")
      case TimestampType | TimestampNTZType => unix_micros(col(c).cast(TimestampType))
      case t => throw new IllegalArgumentException(
        s"unsupported event-time type for column $c: $t")
    }
  }

  /** Exact integer FLOOR division as a SQL fragment — the portable twin
    * of DuckDB/Python `//`. Spark's `DIV` truncates toward zero, so a
    * negative (pre-1970) epoch value buckets one step late vs the
    * oracle; `(a - pmod(a, b)) DIV b` floors in pure integer arithmetic
    * at any magnitude (no double rounding; Resample.scala applies the
    * same correction). `b` must be a positive literal. */
  def floorDivSql(a: String, b: Long): String = {
    require(b > 0, "floorDivSql divisor must be positive")
    s"((($a) - pmod(($a), $b)) DIV $b)"
  }

  def floorDiv(a: String, b: Long): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr(floorDivSql(a, b))

  /** The primary key ("_id" analog) per table — used by the range
    * splitter (X1), idempotent sinks (K1) and the compare job (J1). */
  val keys: Map[String, String] = Map(
    "region" -> "r_regionkey", "nation" -> "n_nationkey",
    "customer" -> "c_custkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey", "orders" -> "o_orderkey",
    "events" -> "event_id", "documents" -> "doc_id",
    "embeddings" -> "vec_id")
}

/** One SparkSession configuration point so Verify/Bench/tests agree.
  * local[32]-oriented: 32 shuffle partitions, AQE on, UTC. */
object GraftSession {
  def create(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      // the SQL function surface (external users: spark.sql.extensions=
      // graft.GraftExtensions, or GraftFunctions.register on a live session)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // FAIR, not FIFO: streaming micro-batches (200ms triggers) must
      // not queue behind long batch stages when jobs share the session —
      // the production stream+batch cohabitation shape, and what keeps
      // the short-trigger streaming specs from starving under suite
      // parallelism
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
      // rejects; read as Long (ns since epoch) = DuckDB's epoch_ns().
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
