package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  // key 1: obs at t=105, 128, 131; key 2: one obs at exactly a grid line
  private def obs = Seq(
    (1L, 105L, 11L, 1.5), (1L, 128L, 12L, 2.5), (1L, 131L, 13L, 3.5),
    (2L, 120L, 21L, 9.0)
  ).toDF("k", "t", "oid", "v")

  test("forwardFill: span-aligned grid, carry at-or-before, leading null") {
    val out = Resample.forwardFill(obs, "k", "t", tieCol = "oid",
        payload = Seq("oid", "v"), stepUs = 10L)
      .orderBy("k", "t")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long])))
    // key 1 grid: 100,110,120,130 (start ⌊105/10⌋·10, end ≤ 131)
    // 100 → null (before first obs); 110,120 → obs@105; 130 → obs@128
    assert(out.toSeq == Seq(
      (1L, 100L, None), (1L, 110L, Some(11L)), (1L, 120L, Some(11L)),
      (1L, 130L, Some(12L)),
      (2L, 120L, Some(21L)))) // obs exactly ON the line fills it
  }

  test("forwardFill floors the grid start for negative (pre-1970) times") {
    val neg = Seq((3L, -105L, 31L, 1.0), (3L, -95L, 32L, 2.0))
      .toDF("k", "t", "oid", "v")
    val out = Resample.forwardFill(neg, "k", "t", "oid", Seq("oid"), 10L)
      .orderBy("t")
      .collect()
      .map(r => (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long])))
    // ⌊−105/10⌋·10 = −110 (DIV would give −100 and skip the lead-in)
    assert(out.toSeq == Seq((-110L, None), (-100L, Some(31L))))
  }

  test("forwardFill raises loudly on a runaway grid") {
    val e = intercept[IllegalArgumentException] {
      Resample.forwardFill(obs, "k", "t", "oid", Seq("v"),
        stepUs = 1L, maxPoints = 10L)
    }
    assert(e.getMessage.contains("grid points"))
  }

  test("forwardFill plans zero joins (asofLast union+carry)") {
    val out = Resample.forwardFill(obs, "k", "t", "oid", Seq("v"), 10L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"no join expected:\n$plan")
  }
}
