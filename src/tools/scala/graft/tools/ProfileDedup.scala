package graft.tools

import graft.{GraftSession, Tables}
import graft.text.Dedup
import org.apache.spark.sql.functions._

/** Stage-by-stage wall-clock profile of the near-dup pipeline (narrow
  * minhash → bands → LSH candidates → doc-pruned Jaccard verify →
  * cluster resolution) so regressions are attributed to a stage, not
  * guessed at from query totals. Usage: runMain graft.tools.ProfileDedup <sfDir> */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val d = Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"))
    val corpus = d.unionByName(
      d.filter(col("doc_id") % 5 === 0).select(
        (col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" near duplicate tail")).as("text")))
    println(s"  corpus=${corpus.count()} docs")

    time("warm-up scan") { corpus.count() }
    val mh = Dedup.minhashNarrow(corpus, "doc_id", col("text"), 16)
    time("minhashNarrow count") { mh.count() }
    time("minhashNarrow AGAIN") { mh.count() }
    val bands = Dedup.bandSignatures(mh, "doc_id", 16, 2)
    time("bands count (incl. minhash)") { bands.count() }
    val cand = time("lshCandidates (materialized)") {
      Dedup.lshCandidates(corpus, "doc_id", col("text"))
    }
    println(s"  pairs=${cand.count()}")
    val ver = time("jaccardVerify (materialized)") {
      Dedup.jaccardVerify(corpus, cand, "doc_id", col("text"))
    }
    val verified = ver.filter(col("jaccard") >= 0.6).select("id_a", "id_b")
    time("resolveClusters (materialized)") {
      Dedup.resolveClusters(corpus.select("doc_id"), verified).count()
    }
    spark.catalog.clearCache()
    time("cold end-to-end (as bench)") {
      val c2 = Dedup.lshCandidates(corpus, "doc_id", col("text"))
      Dedup.jaccardVerify(corpus, c2, "doc_id", col("text")).count()
    }
    spark.stop()
  }
}
