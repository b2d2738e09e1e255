package graft.util

import graft.SparkSpec

import java.nio.file.{Files, Path, Paths}

/** Pins [[DirSwap.replace]]'s crash-safety contract: a complete layout
  * exists on disk at every instant, and re-running after ANY crash
  * point recovers (the old layout is authoritative until the new one is
  * fully in place). Crash states are ARRANGED on disk exactly as an
  * interrupted run leaves them — the ParquetCatalog crash-point
  * discipline. */
class DirSwapSpec extends SparkSpec {

  private def mk(parent: Path, name: String, marker: String): Unit = {
    val d = parent.resolve(name)
    Files.createDirectories(d)
    Files.writeString(d.resolve("part-0.parquet"), marker): Unit
  }
  private def markerOf(parent: Path, name: String): String =
    new String(Files.readAllBytes(
      parent.resolve(name).resolve("part-0.parquet")))

  test("replace swaps in the new layout and removes every scratch dir") {
    val p = Files.createTempDirectory("dirswap")
    mk(p, "census", "old")
    DirSwap.replace(spark, p.toString, "census") { tmp =>
      mk(Paths.get(tmp).getParent, Paths.get(tmp).getFileName.toString, "new")
    }
    assert(markerOf(p, "census") == "new")
    assert(!Files.exists(p.resolve("census.__old__")))
    assert(!Files.exists(p.resolve("census.__compact__")))
  }

  test("a crash between the two renames rolls BACK on the next run, then redoes") {
    val p = Files.createTempDirectory("dirswap_crash")
    // the exact on-disk state of a run that died after moving live
    // aside but before publishing the complete new layout:
    mk(p, "census.__old__", "old")      // live was moved aside…
    mk(p, "census.__compact__", "half") // …new layout present (complete or not)
    assert(!Files.exists(p.resolve("census")))
    var wrote = 0
    DirSwap.replace(spark, p.toString, "census") { tmp =>
      wrote += 1
      // recovery must have restored the OLD layout as live before the
      // writer runs — the write reads it
      assert(markerOf(p, "census") == "old")
      mk(Paths.get(tmp).getParent, Paths.get(tmp).getFileName.toString, "new")
    }
    assert(wrote == 1)
    assert(markerOf(p, "census") == "new")
    assert(!Files.exists(p.resolve("census.__old__")))
    assert(!Files.exists(p.resolve("census.__compact__")))
  }

  test("a crash DURING the tmp write leaves live untouched; re-run discards the stray") {
    val p = Files.createTempDirectory("dirswap_tmp")
    mk(p, "census", "old")
    mk(p, "census.__compact__", "stray") // died mid-write: live intact
    DirSwap.replace(spark, p.toString, "census") { tmp =>
      assert(!Files.exists(Paths.get(tmp)), "stray tmp must be cleared first")
      mk(Paths.get(tmp).getParent, Paths.get(tmp).getFileName.toString, "new")
    }
    assert(markerOf(p, "census") == "new")
  }

  test("a write that produces nothing aborts BEFORE touching the live layout") {
    val p = Files.createTempDirectory("dirswap_empty")
    mk(p, "census", "old")
    intercept[IllegalArgumentException] {
      DirSwap.replace(spark, p.toString, "census") { _ => () }
    }
    assert(markerOf(p, "census") == "old")
  }

  test("a stranded mid-swap state surfaces recovery guidance at the PROBE, not a raw FileNotFound") {
    // the manifest stays valid through compaction by design, so a crash
    // between DirSwap's two renames (live gone, .__old__ present) would
    // otherwise fail probes with an opaque missing-path error —
    // IndexManifest.validate names the recovery verb instead
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = Files.createTempDirectory("dirswap_probe").toString
    val docs = Seq((1L, "a tiny corpus with one repeated run of text here"),
        (2L, "another tiny document sharing one repeated run of text here"))
      .toDF("doc_id", "text")
    graft.text.Substrings.stageGramCensus(docs, "doc_id", col("text"),
      k = 12, dir = dir, buckets = 2)
    // arrange the exact crash state: live renamed aside, nothing published
    Files.move(Paths.get(dir, "census"), Paths.get(dir, "census.__old__"))
    val e = intercept[IllegalArgumentException] {
      graft.text.Substrings.openIndex(spark, dir)
    }
    assert(e.getMessage.contains("interrupted compaction") &&
      e.getMessage.contains("compact"))
    // the named verb recovers: compaction rolls back and redoes the swap
    graft.text.Substrings.compactCensus(spark, dir)
    val spans = graft.text.Substrings.newDupSpans(docs, "doc_id",
      col("text"), dir, maxChars = 0, selfDups = true)
    assert(spans.count() > 0)
  }
}
