package graft.tools

import graft.{GraftSession, SparkEntry}

/** Time named SparkEntry queries in one session, clearing the cache
  * between queries (order-independent numbers).
  * Usage: runMain graft.tools.TimeQuery <sfDir> <query> [query...] */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.create()
    try { SparkEntry.queries("q1_agg")(spark, dir).count(); () }
    catch { case _: Throwable => }
    spark.catalog.clearCache()
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, dir).count()
      println(f"[time] $n%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$cnt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
