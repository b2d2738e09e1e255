package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("qualityStats pins empty / whitespace-only docs to NULL ratios") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "real text here")).toDF("doc_id", "text")
    val out = TextFunctions.qualityStats(df, col("text"))
      .select("doc_id", "n_len", "n_tokens", "alpha_ratio", "avg_token_len", "quality_score")
      .collect().map(r => r.getLong(0) -> r).toMap
    // empty doc: zero length → every ratio NULL, score NULL (not Inf/NaN)
    assert(out(1L).isNullAt(3) && out(1L).isNullAt(4) && out(1L).isNullAt(5))
    // whitespace-only: length > 0 but zero tokens → avg_token_len NULL
    assert(!out(2L).isNullAt(3) && out(2L).isNullAt(4) && out(2L).isNullAt(5))
    // normal doc: everything defined
    assert(!out(3L).isNullAt(3) && !out(3L).isNullAt(4) && !out(3L).isNullAt(5))
  }

  test("languageId marker counts drive the argmax with fixed tie-break") {
    val df = Seq(
      (1L, "the cat and the dog is a pet of the house"),
      (2L, "le chat et les chiens des villes"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextFunctions.languageId(df, col("text"))
      .select("doc_id", "pred_lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en" && out(2L) == "fr")
    assert(out(3L) == "en") // all-zero counts tie-break to en
  }
}
