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

  // ---- dynamic documents (§2.12): the JSON-string path must traverse
  // and mask EXACTLY like the schema-driven rewrite ----

  test("maskJson equals the schema-known rewrite on the same doc, all methods") {
    // the reference test doc as a JSON column; compare field-for-field
    // against maskField over the typed twin
    for (m <- Seq(Mask.Default, Mask.Partial, Mask.HexDeterministic)) {
      val typed = Mask.maskFields(df, Seq("ssn", "level2.ssn", "array.ssn"), m)
        .select($"ssn", $"level2.ssn".as("l2"),
          transform($"array", x => x.getField("ssn")).as("arr"))
        .head()
      val json = df.select(to_json(struct($"ssn", $"level2", $"array")).as("j"))
      val masked = json.select(
        Mask.maskJson(Mask.maskJson(Mask.maskJson(
          $"j", "ssn", m), "level2.ssn", m), "array.ssn", m).as("j"))
      val got = masked.select(
          get_json_object($"j", "$.ssn"),
          get_json_object($"j", "$.level2.ssn"),
          get_json_object($"j", "$.array[0].ssn"),
          get_json_object($"j", "$.array[1].ssn"))
        .as[(String, String, String, String)].head()
      assert(got._1 == typed.getString(0), s"method $m: top-level")
      assert(got._2 == typed.getString(1), s"method $m: nested")
      assert(Seq(got._3, got._4) == typed.getSeq[String](2), s"method $m: array")
    }
  }

  test("maskJson: heterogeneous shapes — mask, no-op, and array rows coexist") {
    val docs = Seq(
      (1L, """{"user":{"ssn":"555-66-7878","name":"ann"}}"""),
      (2L, """{"user":{"name":"bob"}}"""),
      (3L, """{"user":[{"ssn":"111-22-3333"},{"ssn":"a1"},{"age":9}]}"""),
      (4L, """{"user":{"ssn":42}}"""),   // non-string terminal passes
      (5L, """not json at all"""),       // non-JSON row passes through
      (6L, null: String)
    ).toDF("id", "j")
    val out = docs.select($"id", Mask.maskJson($"j", "user.ssn", Mask.Default).as("j"))
      .orderBy("id").as[(Long, String)].collect().toMap
    assert(out(1L) == """{"user":{"ssn":"XXX-XX-XXXX","name":"ann"}}""")
    assert(out(2L) == """{"user":{"name":"bob"}}""")
    assert(out(3L) == """{"user":[{"ssn":"XXX-XX-XXXX"},{"ssn":"XX"},{"age":9}]}""")
    assert(out(4L) == """{"user":{"ssn":42}}""")
    assert(out(5L) == "not json at all")
    assert(out(6L) == null)
  }

  test("maskJson: trailing content after a JSON prefix is NOT a document") {
    // re-serializing just the first value would silently truncate the
    // row; such rows must pass through byte-identical
    val docs = Seq(
      (1L, """{"ssn":"12-34"}{"ssn":"56-78"}"""), // concatenated JSON
      (2L, """42 trailing-text"""),
      (3L, """{"ssn":"12-34"}   """)              // trailing blanks ARE fine
    ).toDF("id", "j")
    val out = docs.select($"id", Mask.maskJson($"j", "ssn", Mask.Default).as("j"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == """{"ssn":"12-34"}{"ssn":"56-78"}""")
    assert(out(2L) == """42 trailing-text""")
    assert(out(3L) == """{"ssn":"XX-XX"}""")
  }

  test("maskJson: nested arrays pass through, matching the typed rewrite") {
    // ArrayType(ArrayType(StructType)) is outside the dotted-path
    // contract on the SCHEMA-KNOWN half (rewrite's `case _`): the JSON
    // half must not silently mask more
    val typed = Seq(Tuple1(Seq(Seq("555-66-7878"))))
      .toDF("arr")
      .select(transform($"arr", a => transform(a, s => struct(s.as("ssn"))))
        .as("user"))
    val t = Mask.maskField(typed, "user.ssn", Mask.Default)
      .select(to_json($"user")).as[String].head()
    assert(t.contains("555-66-7878"), s"typed rewrite changed: $t")
    val j = Seq("""{"user":[[{"ssn":"555-66-7878"}]]}""").toDF("j")
      .select(Mask.maskJson($"j", "user.ssn", Mask.Default)).as[String].head()
    assert(j == """{"user":[[{"ssn":"555-66-7878"}]]}""")
  }

  test("maskJson refuses non-deterministic methods (retry idempotence)") {
    intercept[IllegalArgumentException] {
      Seq("{}").toDF("j").select(Mask.maskJson($"j", "ssn", Mask.Hex)).collect()
    }
  }
}
