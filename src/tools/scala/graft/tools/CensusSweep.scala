package graft.tools

import graft.{GraftSession, Tables}
import graft.text.Substrings
import org.apache.spark.sql.functions._

/** Census hash-mode measurement: stage the SAME reference corpus as an
  * md5 (32-hex-char key) and an xxh64 (8-byte long key) gram census,
  * probe the same batch through both, and print corpus chars, at-rest
  * census bytes, bytes/char, and probe wall-clock — the measured
  * evidence behind SCALE.md's "4× smaller census keys" claim for the
  * production hash (`stageGramCensus(hash = "xxh64")`), measured over
  * BOTH disciplines: the exact census (one row per corpus char; spans
  * pinned identical across hashes by SubstringsSpec) and the anchored
  * census (winnow-selected rows at ~2/(G+1) density; the hash also
  * RANKS the selection, so row counts differ slightly between modes —
  * the window guarantee is the invariant, pinned as a ScalaCheck
  * property). This tool measures the PRICE side of the trade.
  * Builder-side tooling — not part of the driver contract.
  *
  * Usage: runMain graft.tools.CensusSweep [sfDir]
  */
object CensusSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create("local[32]")
    val base = Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull).select(col("doc_id"), col("text"))
    val ref = base.filter(col("doc_id") % 3 =!= 1).localCheckpoint()
    val batch = base.filter(col("doc_id") % 3 === 1).localCheckpoint()
    val chars = ref.agg(sum(length(col("text")))).head().getLong(0)

    def du(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        else f.length()
      walk(new java.io.File(p))
    }
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    println(f"reference: ${ref.count()} docs, $chars%,d chars ($dir)")
    for (mode <- Seq("exact", "anchored");
         hash <- Seq(Substrings.HashMd5, Substrings.HashXxh64)) {
      val idx = java.nio.file.Files
        .createTempDirectory(s"census_${mode}_$hash").toString
      val tStage = time(
        if (mode == "anchored")
          Substrings.stageAnchorCensus(ref, "doc_id", col("text"),
            k = 40, guarantee = 64, dir = idx, buckets = 64, hash = hash)
        else
          Substrings.stageGramCensus(ref, "doc_id", col("text"),
            k = 40, dir = idx, buckets = 64, hash = hash))
      val bytes = du(s"$idx/census")
      val tProbe = time((if (mode == "anchored")
          Substrings.newAnchorSpans(batch, "doc_id", col("text"), idx)
        else
          Substrings.newDupSpans(batch, "doc_id", col("text"), idx)).count())
      val nGrams = spark.read.parquet(s"$idx/census")
        .agg(sum(col("n"))).head().getLong(0)
      println(f"$mode%-8s $hash%-6s census: $bytes%,d bytes at rest " +
        f"(${bytes.toDouble / chars}%.2f B/char, $nGrams%,d gram rows), " +
        f"stage ${tStage}%.1f s, probe ${tProbe}%.1f s")
    }
    spark.stop()
  }
}
