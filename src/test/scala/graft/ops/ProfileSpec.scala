package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("report profiles nulls, distincts, and canonical min/max per type") {
    val df = Seq(
      (Some(10L), Some(1.5), Some("b")),
      (Some(9L), Some(-2.25), Some("a")),
      (None, None, Some("a"))
    ).toDF("k", "x", "s")
    val out = Profile.report(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))).toMap
    // numeric min is NUMERIC (9 < 10 — a string min would say "10")
    assert(out("k") == ((1L, 2L, "9", "10")))
    // doubles milli-quantized: floor(-2.25*1000) = -2250
    assert(out("x") == ((1L, 2L, "-2250", "1500")))
    assert(out("s") == ((0L, 2L, "a", "b")))
  }

  test("all-null columns report null min/max and zero distinct") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("k", "s")
    val row = Profile.report(df).filter(col("column") === "s").head()
    assert(row.getLong(1) == 2L && row.getLong(2) == 0L)
    assert(row.isNullAt(3) && row.isNullAt(4))
  }

  test("unsupported column types fail loudly") {
    val df = Seq((1L, Seq(1, 2))).toDF("k", "arr")
    intercept[IllegalArgumentException] { Profile.report(df) }
  }
}
