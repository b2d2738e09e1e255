package graft.tools

import graft.{GraftSession, Tables}
import graft.text.Bpe
import org.apache.spark.sql.functions._

/** BPE trainer-path sweep: times the driver-local merge trainer
  * against the distributed window-algebra fold on the SAME capped
  * word-frequency table, at increasing merge counts, and prints the
  * per-merge cost of each path plus the 32k-vocabulary extrapolation —
  * the measured evidence behind SCALE.md's merge-cadence claim.
  *
  * The fixture vocabulary is tiny (31 distinct words at sf0.01 —
  * merge capacity ~90), so the sweep derives a deep word table from
  * the fixture rows: each token INSTANCE md5-keyed to a distinct
  * 32-hex-char word. That preserves what the measurement is about —
  * per-merge loop cost at a real vocabulary size — while every byte
  * still derives from the driver-provided parquet.
  * Builder-side tooling — not part of the driver contract.
  *
  * Usage: runMain graft.tools.BpeSweep [sfDir] [maxWords]
  */
object BpeSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val maxWords = args.lift(1).map(_.toInt).getOrElse(32768)
    val spark = GraftSession.create("local[32]")
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val deep = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        posexplode(graft.text.TextFunctions.whitespaceTokens(lower(col("text")))))
      .select(md5(concat_ws(":", col("doc_id"), col("pos"), col("col")))
        .as("word"))
    val words = Bpe.wordFreq(deep, col("word"), maxWords).localCheckpoint()
    val n = words.count()

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both code paths once so JIT/codegen cost lands outside
    Bpe.trainMergesLocal(words, 4)._1.collect()
    Bpe.trainMergesDistributed(words, 4)._1.collect()

    for (k <- Seq(64, 256, 1024)) {
      val tl = time(Bpe.trainMergesLocal(words, k)._1.collect())
      // distributed only to 64 merges — beyond that the cadence is the
      // story and each extra point costs minutes
      val td = if (k <= 64) Some(time(
        Bpe.trainMergesDistributed(words, k)._1.collect())) else None
      println(f"""{"words":$n,"k":$k,"local_sec":$tl%.3f""" +
        td.map(t => f""","dist_sec":$t%.3f,"dist_per_merge_sec":${t / k}%.4f""")
          .getOrElse("") +
        f""","local_per_merge_sec":${tl / k}%.5f,""" +
        f""""local_32k_est_sec":${tl / k * 32768}%.1f""" +
        td.map(t => f""","dist_32k_est_sec":${t / k * 32768}%.1f""")
          .getOrElse("") + "}")
    }
    spark.stop()
  }
}
