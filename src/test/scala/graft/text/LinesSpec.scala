package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinesSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "Shared header line.\nAlpha beta gamma delta epsilon.\nShared footer."),
    (2L, "Shared header line.\nUnique second doc body line here.\nShared footer."),
    // within-doc repeat + a blank and whitespace-only line
    (3L, "Repeat me.\n\n   \nRepeat me.\nShared header line."),
    (4L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("lineDedup keeps each distinct line once, at its min (id, pos) occurrence") {
    val out = Lines.lineDedup(corpus, "doc_id", col("text"))
      .orderBy("doc_id").as[(Long, String, Long)].collect()
    assert(out.toSeq == Seq(
      // doc 1 is first occurrence of header, its body, and footer
      (1L, "Shared header line.\nAlpha beta gamma delta epsilon.\nShared footer.", 3L),
      // doc 2 loses header+footer to doc 1, keeps its unique body
      (2L, "Unique second doc body line here.", 1L),
      // doc 3: within-doc repeat collapses to the first; blanks dropped;
      // header already claimed by doc 1
      (3L, "Repeat me.", 1L)))
  }

  test("lineDedup drops documents whose every line was claimed elsewhere") {
    val c = Seq((1L, "Only line."), (2L, "Only line.")).toDF("doc_id", "text")
    val out = Lines.lineDedup(c, "doc_id", col("text"))
    assert(out.count() == 1 && out.select("doc_id").as[Long].head() == 1L)
  }

  test("lineFilter keeps >=minWords lines ending in terminal punctuation") {
    val c = Seq(
      (1L, "Alpha beta gamma delta epsilon.\nshort line.\nno terminal punctuation here at all\nIs this a proper question?\nQuote ends here like so \"")
    ).toDF("doc_id", "text")
    val out = Lines.lineFilter(c, "doc_id", col("text"))
      .as[(Long, String, Long, Long)].head()
    assert(out == ((1L,
      "Alpha beta gamma delta epsilon.\nIs this a proper question?\nQuote ends here like so \"",
      2L + 1L, 5L)))
  }

  test("lineFilter emits a row (empty text) when nothing survives, and no shuffle") {
    val c = Seq((7L, "tiny.\nall lines too short")).toDF("doc_id", "text")
    val out = Lines.lineFilter(c, "doc_id", col("text"))
    assert(out.as[(Long, String, Long, Long)].head() == ((7L, "", 0L, 2L)))
    // narrow: the optimized plan has no Exchange
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("lineDedup plan aggregates on the line hash with partial aggregation, no window") {
    val plan = Lines.lineDedup(corpus, "doc_id", col("text"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), "hot-line skew: dedup must not window over the line hash")
  }

  test("lineRepetitionStats: hand-computed line and paragraph excess, no shuffle") {
    val c = Seq(
      (1L, "X\nY\n\nX\nZ"),                 // dup line X, no dup para
      (2L, "A\n\nB\nC\n\nB\nC\n\nA"),       // dup lines AND dup paras
      (3L, "only\none\ncopy\nof\neach"),    // clean
      (4L, null: String)
    ).toDF("doc_id", "text")
    val out = Lines.lineRepetitionStats(c, "doc_id", col("text"))
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val rows = out.orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    // doc 1: lines X,Y,X,Z → 1000*(4-3)/4 = 250 count & char; paras 0
    assert(rows(0) == ((1L, 4L, 250L, 250L, 2L, 0L, 0L)))
    // doc 2: lines A,B,C,B,C,A → 500; paras "A","B\nC","B\nC","A" → 500
    // para char mass counts the interior \n: 1+3+3+1=8 vs 4 → 500
    assert(rows(1) == ((2L, 6L, 500L, 500L, 4L, 500L, 500L)))
    assert(rows(2) == ((3L, 5L, 0L, 0L, 1L, 0L, 0L)))
    assert(rows.length == 3) // null doc dropped
  }
}
