package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CohortSpec extends SparkSpec {
  import spark.implicits._

  private val day = 86400000000L

  test("retention counts distinct users per (cohort, offset)") {
    // u1 first day 0, active 0,1,3; u2 first day 0, active 0,1;
    // u3 first day 1, active 1; duplicate events must not double-count
    val ev = Seq(
      (1L, 0L), (1L, 0L), (1L, day + 5L), (1L, 3 * day),
      (2L, 10L), (2L, day), (2L, day + 99L),
      (3L, day)
    ).toDF("user_id", "t_us")
    val out = Cohort.retention(ev, col("user_id"), col("t_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(
      (0L, 0L, 2L), // cohort day-0: u1, u2
      (0L, 1L, 2L), // both back on day 1
      (0L, 3L, 1L), // only u1 on day 3
      (1L, 0L, 1L)  // cohort day-1: u3
    ))
  }

  test("k=0 rows carry each cohort's size; volume skew does not matter") {
    val s = spark
    import s.implicits._
    // u7 has 1000 events on one day — still one active user
    val noisy = s.range(1000).select(lit(7L).as("user_id"),
        ($"id" % 1000).as("t_us"))
      .unionByName(Seq((8L, day)).toDF("user_id", "t_us"))
    val out = Cohort.retention(noisy, col("user_id"), col("t_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((0L, 0L, 1L), (1L, 0L, 1L)))
  }
}
