package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IndexManifestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox naps under the shady tree"),
    (3L, "a completely different document about spark engines")
  ).toDF("doc_id", "text")

  test("write/read roundtrip, describe, typed params") {
    val dir = tmp("idxmf-rt")
    IndexManifest.write(spark, dir, "bm25",
      Map("buckets" -> "64", "id_col" -> "doc_id"),
      Map("n_docs" -> 3L))
    val mf = IndexManifest.read(spark, dir)
    assert(mf.kind == "bm25" && mf.version == IndexManifest.CurrentVersion)
    assert(mf.params == Map("buckets" -> "64", "id_col" -> "doc_id"))
    assert(mf.counts == Map("n_docs" -> 3L))
    assert(mf.paramInt("buckets") == 64)
    assert(mf.stagedAtMs > 0L)
    val d = IndexManifest.describe(mf)
    assert(d.contains("kind=bm25") && d.contains("buckets=64")
      && d.contains("n_docs=3"))
    intercept[IllegalArgumentException] { mf.paramInt("nope") }
  }

  test("read: missing / corrupt / future-version manifests fail loudly") {
    val none = tmp("idxmf-none")
    val e1 = intercept[IllegalArgumentException] { IndexManifest.read(spark, none) }
    assert(e1.getMessage.contains("not a graft index"))
    val corrupt = tmp("idxmf-corrupt")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(corrupt))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(corrupt, IndexManifest.FileName),
      """{"kind":"bm25","version":999}""".getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException] { IndexManifest.read(spark, corrupt) }
    assert(e2.getMessage.contains("version 999"))
  }

  test("validate: wrong kind and mismatched params name what is wrong") {
    val dir = tmp("idxmf-val")
    IndexManifest.write(spark, dir, "gram_census",
      Map("k" -> "40", "buckets" -> "64"), Map.empty)
    val e1 = intercept[IllegalArgumentException] {
      IndexManifest.validate(spark, dir, "bm25")
    }
    assert(e1.getMessage.contains("'gram_census'"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      IndexManifest.validate(spark, dir, "gram_census", Map("k" -> "24"))
    }
    assert(e2.getMessage.contains("k=24") && e2.getMessage.contains("40"),
      e2.getMessage)
    // matching expectation passes
    IndexManifest.validate(spark, dir, "gram_census", Map("k" -> "40"))
  }

  test("invalidate-first protocol: no stale manifest survives a dead restage") {
    val dir = tmp("idxmf-inv")
    IndexManifest.write(spark, dir, "bm25", Map("buckets" -> "64"), Map.empty)
    // a restage invalidates before touching the layout; if it dies
    // mid-rewrite, read() must fail loudly rather than validate stale
    // params against a half-rewritten layout
    IndexManifest.invalidate(spark, dir)
    intercept[IllegalArgumentException] { IndexManifest.read(spark, dir) }
    IndexManifest.invalidate(spark, dir) // idempotent on a bare dir
    // write is tmp+rename: no .tmp residue after a successful write
    IndexManifest.write(spark, dir, "bm25", Map("buckets" -> "128"), Map.empty)
    assert(IndexManifest.read(spark, dir).paramInt("buckets") == 128)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, IndexManifest.FileName + ".tmp")))
  }

  test("all three stagers write the shared manifest; probes refuse a wrong dir") {
    val bm = tmp("idxmf-bm25")
    graft.text.Retrieval.stageBm25(docs, "doc_id", col("text"), bm, buckets = 8)
    val mfBm = IndexManifest.read(spark, bm)
    assert(mfBm.kind == IndexManifest.KindBm25
      && mfBm.paramInt("buckets") == 8 && mfBm.counts("n_docs") == 3L)

    val gc = tmp("idxmf-census")
    graft.text.Substrings.stageGramCensus(docs, "doc_id", col("text"),
      k = 10, dir = gc, buckets = 8)
    val mfGc = IndexManifest.read(spark, gc)
    assert(mfGc.kind == IndexManifest.KindGramCensus
      && mfGc.paramInt("k") == 10 && mfGc.counts("n_docs") == 3L)

    val pq = tmp("idxmf-ivfpq")
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)), (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)), (4L, Seq(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    graft.ml.Similarity.stageIvfPq(vecs, "vec_id", "embedding",
      numCentroids = 2, m = 2, ksub = 2, dir = pq)
    val mfPq = IndexManifest.read(spark, pq)
    assert(mfPq.kind == IndexManifest.KindIvfPq
      && mfPq.counts("n_vectors") == 4L)

    // cross-kind probes fail by NAME, not by downstream schema error
    intercept[IllegalArgumentException] {
      graft.text.Substrings.appendGramCensus(docs, "doc_id", col("text"), bm)
    }
    intercept[IllegalArgumentException] {
      graft.text.Retrieval.stagedBm25TopK(spark, gc, docs, "doc_id", col("text"))
    }
    intercept[IllegalArgumentException] {
      graft.ml.Similarity.appendIvfPq(vecs, "vec_id", "embedding", bm)
    }
  }
}
