package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Parity goldens from the reference's mask_test.go. */
class MaskSpec extends SparkSpec {
  import spark.implicits._

  // the reference test doc (mask_test.go:13-18), flattened to a DataFrame row
  private lazy val df = Seq(
    ("555-66-7878", "555-66-7878", Seq("555-66-7878", "555-66-7878"),
      Seq("a", "b", "c"), Seq(1, 2, 3))
  ).toDF("ssn", "l2ssn", "arrssn", "strings", "numbers")
    .select(
      $"ssn",
      struct($"l2ssn".as("ssn")).as("level2"),
      transform($"arrssn", s => struct(s.as("ssn"))).as("array"),
      $"strings", $"numbers")

  test("default masks top-level string (TestMaskFields)") {
    val out = Mask.maskField(df, "ssn", Mask.Default)
    assert(out.select("ssn").as[String].head() == "XXX-XX-XXXX")
  }

  test("partial keeps last 4 (TestGetMaskedValuePartial)") {
    val out = Mask.maskField(df, "ssn", Mask.Partial)
    assert(out.select("ssn").as[String].head() == "XXX-XX-7878")
  }

  test("partial fully masks strings of length <= 4 (mask.go:54 fallthrough)") {
    val short = Seq("ab1", "abcd", "abcde").toDF("s")
    val out = short.select(Mask.maskedValue($"s", Mask.Partial).as("s")).as[String].collect()
    assert(out.toSeq == Seq("XXX", "XXXX", "Xbcde"))
  }

  test("hex yields fresh 24-hex per row (TestGetMaskedValueUnique)") {
    val out = spark.range(100).select(Mask.maskedValue(lit("x"), Mask.Hex).as("h"))
      .as[String].collect()
    assert(out.forall(h => h.length == 24 && h.matches("[0-9a-f]{24}")))
    assert(out.distinct.length == 100)
  }

  test("hex deterministic variant is stable") {
    val out = Seq("555-66-7878").toDF("s")
      .select(Mask.maskedValue($"s", Mask.HexDeterministic).as("h")).as[String].head()
    assert(out.length == 24 && out.matches("[0-9a-f]{24}"))
    val again = Seq("555-66-7878").toDF("s")
      .select(Mask.maskedValue($"s", Mask.HexDeterministic).as("h")).as[String].head()
    assert(out == again)
  }

  test("dotted path descends struct (TestMaskFieldsSubDocument)") {
    val out = Mask.maskField(df, "level2.ssn", Mask.Default)
    assert(out.select("level2.ssn").as[String].head() == "XXX-XX-XXXX")
    // sibling untouched
    assert(out.select("ssn").as[String].head() == "555-66-7878")
  }

  test("dotted path descends array of structs (TestMaskFieldsDocumentArray)") {
    val out = Mask.maskField(df, "array.ssn", Mask.Default)
    val rows = out.select("array").head().getSeq[Row](0)
    assert(rows.map(_.getString(0)) == Seq("XXX-XX-XXXX", "XXX-XX-XXXX"))
  }

  test("primitive arrays and non-strings pass through (TestMaskFieldsPrimitiveArray)") {
    val out = Mask.maskFields(df, Seq("strings", "numbers"), Mask.Default)
    assert(out.select("strings").head().getSeq[String](0) == Seq("a", "b", "c"))
    assert(out.select("numbers").head().getSeq[Int](0) == Seq(1, 2, 3))
  }

  test("missing path is a no-op") {
    val out = Mask.maskFields(df, Seq("nope", "level2.nope", "ssn.deeper"), Mask.Default)
    assert(out.collect().toSeq == df.collect().toSeq)
  }

  test("multiple fields at once (MaskFields loop)") {
    val out = Mask.maskFields(df, Seq("ssn", "level2.ssn", "array.ssn"), Mask.Partial)
    assert(out.select("ssn").as[String].head() == "XXX-XX-7878")
    assert(out.select("level2.ssn").as[String].head() == "XXX-XX-7878")
  }
}
