package graft.sim

import graft.streaming.Oplog
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Workload simulator / data generator — the reference's `-sim` surface
  * (G1–G5) and `DocGen` (T11, sim.go:305-333), re-expressed as Spark
  * expression pipelines over `spark.range` so generation itself is
  * distributed (a 10^9-doc corpus generates in parallel with no driver
  * loop — the Go generator is a single-threaded client loop,
  * sim.go:125-175).
  *
  * Everything is DETERMINISTIC: the reference salts docs with
  * `primitive.NewObjectID()` / `time.Now()` / random UUIDs; we derive all
  * of those from the row index so tests and oracles can reproduce
  * byte-identical output (the same trade the T3 deterministic hex mask
  * makes, SURVEY §7.4.4).
  */
object Simgen {

  /** Rainbow palette, sim.go:22-24. */
  val Rainbow: Seq[String] =
    Seq("red", "orange", "yellow", "green", "blue", "indigo", "violet")

  /** Default port constant folded into numeric fields (neutrino.go:21,
    * `Port = 3629`, used by DocGen's `num`). */
  val Port = 3629

  /** Default oplogs per pacing interval (sim.go:28,
    * `DefaultNumOplogs = 300`). */
  val DefaultNumOplogs = 300

  /** Deterministic 24-hex pseudo-ObjectID for row `i` — stands in for
    * `primitive.NewObjectID()` (sim.go:308). */
  def oid(i: Column): Column =
    substring(md5(concat(lit("oid|"), i.cast("string"))), 1, 24)

  /** Deterministic 32-hex payload standing in for the random UUID bytes
    * (sim.go:322-331); `subtype` tags mirror BSON binary subtypes 1-4. */
  private def bin(i: Column, subtype: Int): Column =
    struct(lit(subtype).as("subtype"),
      md5(concat(lit(s"bin$subtype|"), i.cast("string"))).as("hex"))

  /** T11 — the DocGen full type palette (sim.go:305-333): ObjectID,
    * string, float64, int64, int seq, datetime, int array, self-nested
    * subdoc, ~2.5KB filler, binary subtypes 1-4. Returned as one typed
    * struct column (to_json of it is the document's extended-JSON-ish
    * wire form used by the change-log / apply pipeline).
    */
  def docStruct(i: Column, port: Int = Port): Column = {
    val n = i + lit(1001L)
    val num = n * n + lit(port.toLong)
    // n*n - n over 101..109, sim.go:317-320
    val arrVals = transform(sequence(lit(101), lit(109)), x => x * x - x)
    def coreFields: Seq[Column] = Seq(
      oid(i).as("_id"),
      element_at(
        array(Rainbow.map(lit): _*), (i % Rainbow.size).cast("int") + 1).as("color"),
      num.cast("double").as("float64"),
      num.as("int64"),
      i.as("seq"),
      format_string("%06d-%d-%d-%d", i + 1, num, n, num).as("string"),
      // deterministic datetime: fixed epoch base + i seconds (vs time.Now())
      timestamp_seconds(lit(1600000000L) + i).as("ts"),
      arrVals.as("array"))
    // field order follows DocGen exactly (sim.go:305-332): subdoc embeds
    // the doc AS APPENDED SO FAR (core + array — filler and binaries are
    // appended after the subdoc), then filler, then the five binary
    // fields, all sharing one 16-byte payload (auuid)
    struct(coreFields ++ Seq(
      struct(struct(coreFields: _*).as("level1")).as("subdoc"),
      concat(n.cast("string"), repeat(lit("G"), 2500)).as("filler"),
      bin(i, 4).as("binary"), // the raw uuid value, sim.go:327
      bin(i, 1).as("bin1"),
      bin(i, 2).as("bin2"),
      bin(i, 3).as("bin3"),
      bin(i, 4).as("uuid"),
      // Decimal128 carrier (SURVEY §1.2 maps it to DECIMAL(38,…)) — the
      // Go palette has no decimal field, so this is appended AFTER the
      // reference-ordered fields to keep the sim.go:305-332 prefix
      // parity untouched. 17+ significant digits by construction: a
      // double round-trip anywhere in the apply path would visibly
      // corrupt it, which is what pins the fold's decimal fidelity.
      format_string("%d%d.%06d", num, n, i)
        .cast(org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6))
        .as("decimal128")): _*)
  }

  /** G5 — DataGen: `n` docs as (_id, doc-json) rows (sim.go:336-344). */
  def docs(spark: SparkSession, n: Long, port: Int = Port): DataFrame =
    spark.range(n).select(
      oid(col("id")).as("_id"),
      to_json(docStruct(col("id"), port)).as("doc"))

  // ------------------------------------------------------------------
  // Change-log generation (the oplog volume the -sim loops produce)
  // ------------------------------------------------------------------

  /** Pack an op row into the Oplog wire schema. */
  private def oplogRow(ts: Column, op: Column, ns: Column, o: Column, o2: Column) =
    Seq(ts.as("ts"), op.as("op"), ns.as("ns"), o.as("o"), o2.as("o2"),
      lit(0L).as("h"), lit(0L).as("t"), lit(2).as("v"))

  private def packTs(t: Column, inc: Column): Column =
    shiftleft(t, 32) + inc.cast("long")

  /** G2+G3+G5 — a deterministic change-log over `n` generated docs in
    * namespace `ns`:
    *
    *  - `i` insert of DocGen(i) for every i            (ts = T0+i, inc 0)
    *  - v2-diff `u` update (`diff.u.int64 = i+1`) for i%3==0  (T0+n+i)
    *    — the UpdateOne/UpdateMany `$inc int64` load of sim.go:205-216
    *      compiled to its oplog v2 wire form
    *  - v1 `$inc` update (`{"$inc":{"seq":10}}`) for i%5==0   (T0+2n+i)
    *  - `d` delete for i%7==0                                 (T0+3n+i)
    *  - `c` applyOps transaction for i%11==0: one `u` ($set
    *    birth_year=1963, the DataGenMulti txn update sim.go:365) and one
    *    `d` of the NEXT doc (i+1, mirroring the txn's paired delete,
    *    sim.go:374-390), both sharing the commit ts  (T0+4n+i)
    *  - skip-fodder every 13th i: an insert into `local.junk` plus an
    *    `n` no-op — P4/compile must drop both
    *
    * All rows conform to [[Oplog.schema]]; write with
    * `.write.parquet(dir)` to feed [[graft.streaming.ApplyJob]].
    */
  def changeLog(spark: SparkSession, n: Long, ns: String,
      t0: Long = 1700000000L, port: Int = Port): DataFrame = {
    val r = spark.range(n)
    val i = col("id")
    val nsC = lit(ns)
    val db = ns.takeWhile(_ != '.')

    val inserts = r.select(oplogRow(
      packTs(lit(t0) + i, lit(0)), lit("i"), nsC,
      to_json(docStruct(i, port)), lit(null).cast("string")): _*)

    val v2Updates = r.filter(i % 3 === 0).select(oplogRow(
      packTs(lit(t0 + n) + i, lit(0)), lit("u"), nsC,
      to_json(struct(struct(struct((i + 1).as("int64")).as("u")).as("diff"))),
      to_json(struct(oid(i).as("_id")))): _*)

    val v1Updates = r.filter(i % 5 === 0).select(oplogRow(
      packTs(lit(t0 + 2 * n) + i, lit(0)), lit("u"), nsC,
      lit("""{"$v":1,"$inc":{"seq":10}}"""),
      to_json(struct(oid(i).as("_id")))): _*)

    val deletes = r.filter(i % 7 === 0).select(oplogRow(
      packTs(lit(t0 + 3 * n) + i, lit(0)), lit("d"), nsC,
      to_json(struct(oid(i).as("_id"))), lit(null).cast("string")): _*)

    // applyOps entries have heterogeneous `o` shapes (update-diff vs
    // delete-filter), so the JSON is assembled textually rather than via
    // to_json over a (necessarily homogeneous) array<struct>.
    val txns = r.filter(i % 11 === 0 && i < n - 1).select(oplogRow(
      packTs(lit(t0 + 4 * n) + i, lit(0)), lit("c"), lit(s"$db.$$cmd"),
      format_string(
        """{"applyOps":[{"op":"u","ns":"%s","o":{"diff":{"u":{"birth_year":1963}}},"o2":{"_id":"%s"}},""" +
          """{"op":"d","ns":"%s","o":{"_id":"%s"},"o2":{"_id":"%s"}}]}""",
        nsC, oid(i), nsC, oid(i + 1), oid(i + 1)),
      lit(null).cast("string")): _*)

    val noise = r.filter(i % 13 === 0).select(oplogRow(
      packTs(lit(t0 + 5 * n) + i, lit(0)), lit("i"), lit("local.junk"),
      lit("""{"_id":"junk"}"""), lit(null).cast("string")): _*)
    val noops = r.filter(i % 13 === 0).select(oplogRow(
      packTs(lit(t0 + 5 * n) + i, lit(1)), lit("n"), lit(""),
      lit(null).cast("string"), lit(null).cast("string")): _*)

    inserts.unionByName(v2Updates).unionByName(v1Updates)
      .unionByName(deletes).unionByName(txns)
      .unionByName(noise).unionByName(noops)
  }

  /** G1-G4 — the rate-paced load driver (`-sim` thread loops,
    * sim.go:83-122,125-239): emit `batches` change-log file batches into
    * `dir`, `docsPerBatch` docs each, pausing `pauseMs` between batches
    * (the reference's 1 Hz pacing, pauseRemainedSecond sim.go:295-302).
    * Each batch carries the same insert/update/delete/txn mix as
    * [[changeLog]] — the SAME doc ids churned repeatedly (CRUD churn,
    * exactly what the reference's Insert/Modify loops do to their id
    * ring buffer) with strictly increasing ts per batch, each landing as
    * its own mod-time-ordered file — a live feed for
    * [[graft.Migrate.liveTail]] to chase.
    *
    * G4 — when `readFrom` is given, each interval ALSO runs the
    * reference's read load against the live target (the Find loop,
    * sim.go:240-293): an `_id $in` find over the first
    * min(docsPerBatch/2, 102) ids of the churn ring, plus the
    * sample + group-by-color aggregate (the `$sample`/`$group`
    * pipeline). Reads race the tail's atomic table swaps by design —
    * a transiently-missing table is retried next interval, exactly the
    * concurrent read pressure the reference applies. */
  def liveFeed(spark: SparkSession, dir: String, ns: String, batches: Int,
      docsPerBatch: Int, pauseMs: Long = 1000L,
      t0: Long = 1700000000L,
      readFrom: Option[graft.sources.Catalog] = None): FeedStats = {
    var emitted = 0L
    var finds = 0L
    var groups = 0L
    for (b <- 0 until batches) {
      val log = changeLog(spark, docsPerBatch.toLong, ns,
        t0 = t0 + b.toLong * 10 * docsPerBatch)
      emitted += log.count()
      log.coalesce(1).write.mode("append").parquet(dir)
      readFrom.foreach { cat =>
        val samples = math.min(docsPerBatch / 2, 102)
        // sink ids are canonical-JSON text (Oplog.idOf) — quoted hex
        val ids = (0 until samples).map(i => "\"" + oidHex(i.toLong) + "\"")
        scala.util.Try {
          if (cat.dataExists(ns)) {
            val live = cat.read(ns)
            finds += live.filter(col("id").isin(ids: _*)).count()
            groups += live.sample(0.5)
              .select(get_json_object(col("doc"), "$.color").as("color"))
              .groupBy("color").count().count()
          }
        }
        ()
      }
      if (b < batches - 1) Thread.sleep(pauseMs)
    }
    FeedStats(emitted, finds, groups)
  }

  /** What one [[liveFeed]] run did: oplog rows emitted, rows matched by
    * the interval finds, and groups returned by the interval aggregates
    * (the latter two are 0 without a `readFrom` target). */
  final case class FeedStats(emitted: Long, findsMatched: Long, aggregateGroups: Long)

  /** Driver-side mirror of [[oid]] for building find filters. */
  def oidHex(i: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"oid|$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 24)
  }
}
