package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Verified-admission scaling: the measured evidence behind the
  * round-16 claim that `admitNearStream`'s Jaccard-verify stage is
  * BATCH-proportional against a store-texts band index — per-batch
  * verify wall FLAT as the admitted corpus grows — where the legacy
  * surface (refTexts + an `outPath` re-scan per micro-batch) grows
  * linearly with everything ever admitted.
  *
  * Protocol per (mode, mult): stage the reference band index over the
  * sf0.1 documents (storeTexts on for `store`, off for `legacy`), then
  * GROW the admitted state to `mult`× the base corpus — salted copies
  * appended into the index exactly as the gate's own appends would
  * land them (texts riding the ids/ rows in store mode) and written to
  * the out parquet (the legacy re-scan surface) — and finally drain
  * ONE fixed-size micro-batch through `admitNearStream` with
  * `verifyJaccard = 0.8`, timing the drain wall. Two reps with
  * distinct batches, min (fresh batch ids — the first drain admits its
  * batch, so a repeat would trip the new-ids guard). The batch's
  * collision surface is constant across multiples (tail-mutated copies
  * of mult-0 docs, the ProbeSweep discipline).
  *
  * What the numbers must show: `store` drain wall ~flat in `mult`
  * (the verify fetch reads only candidate id buckets of `ids/`);
  * `legacy` drain wall growing with `mult` (two corpus-proportional
  * text scans per micro-batch). Builder-side tooling — not part of the
  * driver contract.
  *
  * Usage: runMain graft.tools.VerifySweep [sfDir]
  *   SPARK_GRAFT_SWEEP_MODES=store,legacy   modes to run
  *   SPARK_GRAFT_SWEEP_MULTS=1,3,10,30      admitted-growth multiples
  *   SPARK_GRAFT_SWEEP_BUCKETS=64           band/id bucket count
  *   SPARK_GRAFT_SWEEP_BATCH_DIV=5          probe batch = 1-in-DIV of
  *                                          the base corpus (a large
  *                                          DIV shrinks the batch so
  *                                          the per-batch corpus-scan
  *                                          term stands out of the
  *                                          fixed drain cost)
  */
object VerifySweep {

  /** Salted admitted-corpus copies: copy k's tokens are prefixed so
    * multiples are genuinely distinct documents (no cross-multiple
    * near-dups), ids offset into a disjoint range per copy. Built as
    * ONE crossJoin against a range frame — the per-copy union of
    * earlier rounds explodes the plan at 1000+ branches. Copy ids
    * start at 1e11 (the probe batches sit at 4e9+rep·1e8; the r15
    * union put copies at (k+1)·1e7, which would collide with the
    * probe range from k ≈ 399 on). */
  private def grown(base: DataFrame, mult: Int): DataFrame =
    base.crossJoin(
        base.sparkSession.range(mult.toLong).select(col("id").as("__k")))
      .select(
        (col("doc_id") + lit(100000000000L) + col("__k") * 10000000L)
          .as("doc_id"),
        regexp_replace(col("text"), lit("(\\S+)"),
          concat(lit("adm"), col("__k"), lit("_$1"))).as("text"))

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = GraftSession.create(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val buckets = sys.env.getOrElse("SPARK_GRAFT_SWEEP_BUCKETS", "64").toInt
    val mults = sys.env.get("SPARK_GRAFT_SWEEP_MULTS")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 3, 10, 30))
    val modes = sys.env.get("SPARK_GRAFT_SWEEP_MODES")
      .map(_.split(",").map(_.trim).toSeq).getOrElse(Seq("store", "legacy"))

    val base = Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull).select(col("doc_id"), col("text"))
      .localCheckpoint(true)

    // the FIXED probe batch maker: tail-mutated copies of 1-in-DIV base
    // docs (collide with the staged refs; Jaccard decides), rep-salted
    // ids so the second rep's drain clears the new-ids guard
    val batchDiv = sys.env.getOrElse("SPARK_GRAFT_SWEEP_BATCH_DIV", "5").toInt
    def batch(rep: Int): DataFrame = base.filter(col("doc_id") % batchDiv === 0)
      .select((col("doc_id") + 4000000000L + rep * 100000000L).as("doc_id"),
        concat(col("text"), lit(" probe batch tail")).as("text"))

    // warm-up: one tiny store-mode lifecycle so codegen/JIT for the
    // probe+verify plans lands outside the timed region
    locally {
      val w = java.nio.file.Files.createTempDirectory("vswarm").toString
      graft.text.Dedup.stageBandIndex(base.limit(500), "doc_id",
        col("text"), s"$w/idx", buckets = buckets, storeTexts = true)
      drain(spark, batch(9).limit(200), s"$w/idx", s"$w/out", s"$w/ck",
        refTexts = None)
    }

    for (mode <- modes; mult <- mults) {
      spark.catalog.clearCache()
      System.gc()
      val root = java.nio.file.Files
        .createTempDirectory(s"vs_${mode}_$mult").toString
      val idx = s"$root/idx"
      val out = s"$root/out"
      graft.text.Dedup.stageBandIndex(base, "doc_id", col("text"), idx,
        buckets = buckets, storeTexts = mode == "store")
      // grow the admitted state: index appends exactly as the gate's
      // own appends land (texts ride along in store mode), plus the
      // out parquet the legacy surface re-scans
      // spread the grown frame before materializing: the crossJoin
      // inherits the tiny base's partition count, which would sign
      // 15M docs on a handful of cores at 3000x
      val adm = grown(base, mult)
        .repartition(math.min(256, math.max(32, mult)))
        .localCheckpoint(true)
      graft.text.Dedup.appendBandIndex(adm, "doc_id", col("text"), idx,
        assumeNewIds = true)
      adm.write.mode("overwrite").parquet(out)
      graft.text.Dedup.compactBandIndex(spark, idx)
      val nAdmitted = adm.count()
      val refTexts = if (mode == "legacy") Some(base) else None
      val secs = (1 to 2).map { rep =>
        time(drain(spark, batch(rep), idx, out, s"$root/ck$rep", refTexts))
      }
      println(f"""{"mode":"$mode","mult":$mult,"n_admitted":$nAdmitted,""" +
        f""""drain_sec":${secs.min}%.3f,"drain_reps":[${secs.map(s => f"$s%.3f").mkString(",")}],""" +
        f""""buckets":$buckets,"batch_div":$batchDiv}""")
    }
    spark.stop()
  }

  /** One verified-admission drain of `b` (written as a single-file
    * feed) through the gate — the exact production entry point. */
  private def drain(spark: SparkSession, b: DataFrame, idx: String,
      out: String, ck: String, refTexts: Option[DataFrame]): Unit = {
    val feed = java.nio.file.Files.createTempDirectory("vsfeed").toString
    b.repartition(1).write.mode("overwrite").parquet(feed)
    graft.streaming.DocStream.admitNearStream(
        spark.readStream.schema(spark.read.parquet(feed).schema)
          .parquet(feed),
        "doc_id", "text", idx, out, ck,
        verifyJaccard = Some(0.8), refTexts = refTexts,
        rejectsPath = Some(s"$out.rejects"))
      .awaitTermination()
  }
}
