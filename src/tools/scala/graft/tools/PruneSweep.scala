package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicLong

/** Zone-map pruning measurement: the evidence behind `-optimize` /
  * SCALE.md's Z-order claims. Writes the events table three ways —
  * unordered, 1-D sorted on user_id, and Z-ordered on (user, day) via
  * the same ZOrder+BinPack path the CLI uses — then runs point/range
  * predicates on EACH dimension and reports the parquet ROWS the scan
  * actually materialized (`recordsRead` task metric: row groups whose
  * min/max exclude the pushed predicate are never read, and these
  * per-bin files are single-row-group, so records-read ≈ zone-map
  * effectiveness). Expected shape: the 1-D layout prunes on its sort
  * column only; the Z layout prunes on BOTH dimensions; the unordered
  * layout prunes on neither.
  *
  * Builder-side tooling — not part of the driver contract. */
object PruneSweep {

  private val records = new AtomicLong(0)

  private def measure(spark: SparkSession, df: DataFrame): Long = {
    records.set(0)
    df.foreach(_ => ()) // full action through the scan
    // block until the async listener bus has delivered every task-end
    // event — a fixed sleep undercounts under load. The counter still
    // assumes no CONCURRENT jobs on this session (single-threaded main;
    // noted in the output contract).
    org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
    records.get()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(
      sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) records.addAndGet(m.inputMetrics.recordsRead): Unit
      }
    })
    val out = java.nio.file.Files.createTempDirectory("prune").toString
    val raw = Tables.load(spark, sfDir, "events")
    val ev = raw.select(col("event_id"), col("user_id"),
        Tables.tsUs(raw).as("ts_us"))
      .select(col("event_id"), col("user_id"),
        expr("ts_us DIV 86400000000").as("day"))
      .localCheckpoint(true)
    val files = 32
    val rowsPerFile = math.max(1L, ev.count() / files)

    ev.repartition(files).write.parquet(s"$out/flat")
    ev.repartitionByRange(files, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.parquet(s"$out/by_user")
    val b = ev.agg(min("user_id"), max("user_id"), min("day"), max("day")).head()
    val z = graft.ops.ZOrder.zvalue(
      graft.ops.ZOrder.quantize(col("user_id"), b.getLong(0), b.getLong(1), 16),
      graft.ops.ZOrder.quantize(col("day"), b.getLong(2), b.getLong(3), 16),
      16)
    graft.ops.BinPack.assignBinsInOrder(
        ev.withColumn("__sz", lit(1L)), z, "event_id", "__sz",
        targetBytes = rowsPerFile, shardShift = 22)
      .drop("__sz")
      .repartition(col("bin"))
      .sortWithinPartitions(z)
      .write.partitionBy("bin").parquet(s"$out/zorder")

    val (uMid, dMid) = {
      val r = ev.agg(expr("CAST(percentile(user_id, 0.5) AS LONG)"),
        expr("CAST(percentile(day, 0.5) AS LONG)")).head()
      (r.getLong(0), r.getLong(1))
    }
    val preds: Seq[(String, DataFrame => DataFrame)] = Seq(
      ("user_point", _.filter(col("user_id") === uMid)),
      ("day_point", _.filter(col("day") === dMid)),
      ("user_range", _.filter(col("user_id").between(uMid, uMid + 3))),
      ("day_range", _.filter(col("day").between(dMid, dMid + 3))))
    Seq("flat", "by_user", "zorder").foreach { lay =>
      val t = spark.read.parquet(s"$out/$lay")
      val total = measure(spark, t.select("event_id"))
      preds.foreach { case (name, p) =>
        val read = measure(spark, p(t).select("event_id", "user_id", "day"))
        println(s"""{"layout":"$lay","predicate":"$name",""" +
          s""""records_read":$read,"records_total":$total}""")
      }
    }
    spark.stop()
  }
}
