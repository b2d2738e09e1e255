package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Scratch experiment: does a parallelism-floor repartition after a
  * single-row-group parquet scan pay for itself on heavy per-row work?
  * Usage: runMain graft.tools.SpreadExp <sfDir> */
object SpreadExp {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create()
    def time[A](label: String)(f: => A): Unit = {
      f // warm
      val runs = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[exp] $label%-40s min=${runs.min}%6.2f s runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    val orders = Tables.load(spark, dir, "orders")
    val docs = Tables.load(spark, dir, "documents")
    println(s"orders parts=${orders.rdd.getNumPartitions} docs parts=${docs.rdd.getNumPartitions} defPar=${spark.sparkContext.defaultParallelism}")

    time("profile orders (as-is)") {
      graft.ops.Profile.report(orders).count()
    }
    time("profile orders (spread 32)") {
      graft.ops.Profile.report(orders.repartition(32)).count()
    }
    time("gramRows docs k=40 (as-is)") {
      graft.text.Substrings.gramRows(docs, "doc_id", col("text"), 40).count()
    }
    time("gramRows docs k=40 (spread 32)") {
      graft.text.Substrings.gramRows(docs.repartition(32), "doc_id", col("text"), 40).count()
    }
    time("minhash docs (as-is)") {
      graft.text.Dedup.minhashNarrow(docs, "doc_id", col("text"), 16).count()
    }
    time("minhash docs (spread 32)") {
      graft.text.Dedup.minhashNarrow(docs.repartition(32), "doc_id", col("text"), 16).count()
    }
    val l = Tables.load(spark, dir, "lineitem")
    time("q1-style agg lineitem (as-is)") {
      l.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("s"), count(lit(1)).as("n")).count()
    }
    time("q1-style agg lineitem (spread 32)") {
      l.repartition(32).groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("s"), count(lit(1)).as("n")).count()
    }
    spark.stop()
  }
}
