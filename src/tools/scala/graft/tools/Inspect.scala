package graft.tools

import graft.{GraftSession, Tables}

/** Debug utility: print schema + a few rows for each fixture table.
  * Usage: runMain graft.tools.Inspect <sfDir> [table...] */
object Inspect {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val tables = if (args.length > 1) args.drop(1).toSeq else Tables.all
    val spark = GraftSession.create()
    tables.foreach { t =>
      val df = Tables.load(spark, dir, t)
      println(s"== $t ==")
      df.printSchema()
      df.show(3, truncate = 60)
    }
    spark.stop()
  }
}
