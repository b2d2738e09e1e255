package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan review: print the formatted physical plan for named queries.
  * Usage: runMain graft.tools.Explain <sfDir> <query> [query...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.create()
    names.foreach { n =>
      println(s"==== $n ====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
