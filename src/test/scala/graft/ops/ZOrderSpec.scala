package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** reference interleave on the driver */
  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zvalue matches the bit-interleave reference on known values") {
    val df = Seq((0L, 0L), (5L, 3L), (65535L, 0L), (0L, 65535L),
      (65535L, 65535L), (12345L, 54321L), (70000L, 3L) /* masked */)
      .toDF("x", "y")
    val got = df.select(col("x"), col("y"),
        ZOrder.zvalue(col("x"), col("y"), 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == morton(x & 0xFFFF, y & 0xFFFF, 16), s"($x, $y)")
    }
  }

  test("zvalueSql is the engine-exact twin of zvalue (evaluated by Spark SQL)") {
    val df = spark.range(2000).select(
      (($"id" * 7919) % 100000).as("x"), (($"id" * 104729) % 100000).as("y"))
    val both = df.select(
      ZOrder.zvalue(col("x"), col("y"), 16).as("a"),
      expr(ZOrder.zvalueSql("x", "y", 16)).as("b"))
    assert(both.filter(col("a") =!= col("b")).count() == 0)
  }

  test("z-order layout gives tight per-zone ranges in BOTH dimensions") {
    // 64×64 grid; a 1-D sort on x would make per-zone y ranges full-width
    val grid = spark.range(64L * 64).select(
      ($"id" % 64).as("x"), ($"id" / 64).cast("long").as("y"))
    val stats = ZOrder.zoneStats(grid, col("x"), col("y"), bits = 6,
      zoneShift = 6).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      val (xw, yw) = (r.getAs[Long]("x_max") - r.getAs[Long]("x_min"),
        r.getAs[Long]("y_max") - r.getAs[Long]("y_min"))
      // each zone of 2^6 = 64 cells is an 8×8 tile of the grid
      assert(xw <= 7 && yw <= 7, s"zone ${r.get(0)}: xw=$xw yw=$yw")
    }
    // zones tile the space: counts sum to the input
    assert(stats.map(_.getAs[Long]("n_rows")).sum == 64L * 64)
  }

  test("quantize fills the bit budget from the top and clamps the domain") {
    val df = Seq(-5L, 0L, 1L, 2L, 3L, 99L).toDF("v")
    val got = df.select(ZOrder.quantize(col("v"), 0L, 3L, 16).as("q"))
      .collect().map(_.getLong(0)).toSeq
    // range 4 over 16 bits: values land at 0, 1/4, 2/4, 3/4 of the
    // space (TOP two bits vary — the property that makes the narrow
    // dimension prunable after interleave); out-of-range clamps
    assert(got == Seq(0L, 0L, 16384L, 32768L, 49152L, 49152L))
    // monotone over a wide domain
    val wide = spark.range(1000).select(($"id" * 37).as("v"))
    val qs = wide.select(ZOrder.quantize(col("v"), 0L, 36963L, 16).as("q"))
      .collect().map(_.getLong(0)).toSeq
    assert(qs == qs.sorted && qs.head == 0L && qs.last >= 65530L &&
      qs.last <= 65535L)
    intercept[IllegalArgumentException] {
      ZOrder.quantize(col("v"), 0L, 1L << 40, 16)
    }
  }

  test("layout orders rows by the Morton code within partitions") {
    val grid = spark.range(1024).select(($"id" % 32).as("x"), ($"id" / 32).cast("long").as("y"))
    val laid = ZOrder.layout(grid, col("x"), col("y"), bits = 5, partitions = 4)
    val zs = laid.select(ZOrder.zvalue(col("x"), col("y"), 5).as("z"))
      .mapPartitions(it => Iterator.single(it.map(_.getLong(0)).toSeq))
      .collect()
    zs.foreach(p => assert(p == p.sorted, "each partition sorted by z"))
  }
}
