package graft.tools

import graft.{GraftSession, Tables}
import graft.text.Dedup
import org.apache.spark.sql.functions._

/** Stage-by-stage wall-clock profile of the near-dup pipeline
  * (shingles → minhash → bands → LSH candidates → Jaccard verify) so
  * regressions are attributed to a stage, not guessed at from query
  * totals. Usage: runMain graft.tools.ProfileDedup <sfDir> */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val d = Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"))
    val corpus = d.unionByName(
      d.filter(col("doc_id") % 5 === 0).select(
        (col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" near duplicate tail")).as("text")))

    val sh = Dedup.shingles(corpus, "doc_id", col("text")).persist()
    time("shingles (persist+count)") { println(s"  rows=${sh.count()}") }
    val mh = Dedup.minhashArray(sh, "doc_id", 16)
    time("minhashArray count") { mh.count() }
    val bands = Dedup.bandSignatures(Dedup.minhashArray(sh, "doc_id", 16), "doc_id", 16, 2)
    time("bandSignatures count") { bands.count() }
    val cand = Dedup.lshCandidatesFromShingles(sh, "doc_id").persist()
    time("lshCandidates (persist+count)") { println(s"  pairs=${cand.count()}") }
    val ver = Dedup.jaccardVerifyFromShingles(sh, cand, "doc_id")
    time("jaccardVerify count") { ver.count() }
    time("jaccardVerify AGAIN (warm)") { ver.count() }
    // full end-to-end as the bench sees it: fresh lineage, lazy persists
    spark.catalog.clearCache()
    time("cold end-to-end (as bench)") {
      val sh2 = Dedup.shingles(corpus, "doc_id", col("text")).persist()
      val cand2 = Dedup.lshCandidatesFromShingles(sh2, "doc_id").persist()
      Dedup.jaccardVerifyFromShingles(sh2, cand2, "doc_id").count()
    }
    spark.stop()
  }
}
