package graft.tools

import graft.GraftSession
import graft.sources.ParquetCatalog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Merge-cost sweep: measures the streaming-apply sink's flagship scale
  * claim — with a bucketed layout, merging a fixed-size micro-batch
  * costs work proportional to the TOUCHED BUCKETS, not the table; an
  * unbucketed sink rewrites the whole table per batch.
  *
  * Setup that makes the effect visible at laptop scale: tables of
  * 1M/4M/16M ~250-byte docs; a 1 000-key batch confined to ONE of the
  * 64 hash buckets (micro-batches against a bucketed sink only pay for
  * buckets their keys land in — the experiment pins the touched set to
  * 1/64 of the table). Expect plain merge seconds to grow ~linearly
  * with the table and bucketed to stay ~flat. Builder-side tooling.
  */
object MergeSweep {
  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-mergesweep-$tag").toString

  private val filler = "x" * 200

  private def seed(spark: SparkSession, cat: ParquetCatalog, rows: Long): Unit = {
    val df = spark.range(rows).select(
      col("id").cast("string").as("id"),
      concat(lit("""{"_id":"""), col("id"), lit(""","v":"""), col("id") % 997,
        lit(s""","pad":"$filler"}""")).as("doc"))
    cat.upsert("app.t", df, "id"): Unit
  }

  /** 1 000 existing keys confined to one bucket of 256 (hence also one
    * bucket of 64: 256 = 4·64, bucket 0 mod 256 ⊂ bucket 0 mod 64). */
  private def batch(spark: SparkSession, rows: Long) =
    spark.range(rows)
      .select(col("id").cast("string").as("id"))
      .filter(pmod(xxhash64(col("id")), lit(256L)) === 0)
      .limit(1000)
      .select(col("id"), lit("""{"_id":0,"v":-1}""").as("doc"))

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    // 256 buckets at 16M demonstrates the sizing rule: bucket SIZE (not
    // count) is what the merge pays per touched bucket, so bucket count
    // scales with the table to keep merges flat
    for (rows <- Seq(1000000L, 4000000L, 16000000L); b <- Seq(0, 64, 256)) {
      val cat = new ParquetCatalog(spark, freshDir(s"r$rows-b$b"), buckets = b)
      seed(spark, cat, rows)
      val up = batch(spark, rows).cache()
      up.count(): Unit
      // warm merge (file listing, codegen), then time steady state
      cat.merge("app.t", up, up.select("id").limit(0), "id"): Unit
      val t0 = System.nanoTime()
      cat.merge("app.t", up, up.select("id").limit(0), "id"): Unit
      val sec = (System.nanoTime() - t0) / 1e9
      up.unpersist()
      println(f"""{"rows":$rows,"buckets":$b,"merge_sec":$sec%.3f}""")
    }
    spark.stop()
  }
}
