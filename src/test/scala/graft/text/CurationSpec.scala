package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  test("funnel counts equal the sequentially-filtered pipeline's counts") {
    val d = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val corpus = d.unionByName(
      d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"), col("text")))

    val f = Curation.funnel(corpus, "doc_id", col("text")).collect().head

    // the same gates applied as actual sequential stages
    val keep = Dedup.exact(corpus, "doc_id", col("text"))
      .select(col("keep_id").as("doc_id"))
    val deduped = corpus.join(keep, Seq("doc_id"), "left_semi")
    val stats = TextFunctions.languageId(
      TextFunctions.qualityStats(deduped, col("text")), col("text"))
    val afterQ = stats.filter(col("quality_score") >= 3)
    val afterL = afterQ.filter(col("pred_lang") === "en")
    val splits = Sampling.hashSplit(afterL, col("doc_id"), "42",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(f.getLong(0) == corpus.filter(col("text").isNotNull).count())
    assert(f.getLong(1) == deduped.count())
    assert(f.getLong(2) == afterQ.count())
    assert(f.getLong(3) == afterL.count())
    assert(f.getLong(4) == splits.getOrElse("train", 0L))
    assert(f.getLong(5) == splits.getOrElse("val", 0L))
    assert(f.getLong(6) == splits.getOrElse("test", 0L))
    assert(f.getLong(3) > 0, "funnel must not be empty on the fixture")
  }

  test("gopherGate applies the seven shape rules with integer arithmetic") {
    import spark.implicits._
    val good = (("the data be to of and that have with it works fine " * 5) +
      "end").trim // 61 words, all alphabetic, plenty of stop words
    val bullets = (1 to 60).map(i => s"• item $i").mkString("\n") // 100% bullets
    val symbols = ("word " * 60).trim + " " + ("#" * 20) +
      " ... ... ... ... ... ... ..." // 68 words, 27 symbols
    val nonAlpha = (("123 456 789 " * 20) + "the be").trim // 62 words, 2 alpha
    val corpus = Seq(
      (1L, good), (2L, bullets), (3L, symbols), (4L, nonAlpha),
      (5L, "too short to pass the word count but the stop words be here"),
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Curation.gopherGate(corpus, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_rules_passed"), r.getAs[Long]("keep")))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L)) // null text dropped
    assert(out(1L) == ((7L, 1L)), s"good doc must pass all rules: ${out(1L)}")
    assert(out(2L)._2 == 0L) // bullet rule fails
    assert(out(3L)._2 == 0L) // symbol ratio fails
    assert(out(4L)._2 == 0L) // alpha-word fraction fails
    assert(out(5L)._2 == 0L) // word count fails
    // cross-check two counters on the symbol doc: 20 '#' + 7 '...'
    val sym = Curation.gopherGate(corpus, "doc_id", col("text"))
      .filter(col("doc_id") === 3L).collect().head
    assert(sym.getAs[Long]("n_symbols") == 27L)
    assert(sym.getAs[Long]("n_words") == 68L)
  }

  test("perplexityBuckets splits each language into surprisal terciles") {
    val d = Tables.load(spark, sf0001, "documents")
    val out = Curation.perplexityBuckets(d, "doc_id", col("text"), col("lang"))
    val n = out.count()
    assert(n == d.filter(col("text").isNotNull).count())
    // per lang: every bucket label appears for languages with >= 3 docs,
    // and head <= middle <= tail in mnpt (tercile ordering)
    val byLang = out.groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n"), min("mnpt").as("lo"), max("mnpt").as("hi"))
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    val langs = byLang.map(_._1).distinct
    langs.foreach { l =>
      val b = byLang.filter(_._1 == l).map(t => t._2 -> (t._3, t._4, t._5)).toMap
      (b.get("head"), b.get("middle"), b.get("tail")) match {
        case (Some(h), Some(m), Some(t)) =>
          assert(h._3 <= m._2 && m._3 <= t._2,
            s"lang $l tercile ranges overlap: $b")
          // terciles are roughly balanced (within a distinct-value tie
          // of a third each)
          val tot = h._1 + m._1 + t._1
          assert(h._1 <= tot * 2 / 3 + 1 && t._1 <= tot * 2 / 3 + 1)
        case _ => // a tiny language may collapse a tercile on ties
      }
    }
    // deterministic: a second run assigns identical buckets
    val again = Curation.perplexityBuckets(d, "doc_id", col("text"), col("lang"))
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }
}
