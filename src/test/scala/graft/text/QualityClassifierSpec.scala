package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("tokenStats counts doc frequencies per label with per-doc dedup") {
    val train = Seq(
      (1L, "good good clean prose", 1),
      (2L, "clean prose here", 1),
      (3L, "spam spam spam junk", 0)).toDF("id", "text", "y")
    val stats = QualityClassifier.tokenStats(train, col("text"), col("y"))
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // "good" appears twice in doc 1 but counts once (presence, not tf)
    assert(stats("good") == (1L, 0L))
    assert(stats("clean") == (2L, 0L))
    assert(stats("spam") == (0L, 1L))
    assert(stats("junk") == (0L, 1L))
  }

  test("vocabulary weight is the add-one-smoothed good fraction in per-mille") {
    val stats = Seq(("a", 3L, 1L), ("b", 0L, 4L), ("rare", 1L, 0L))
      .toDF("token", "n_good", "n_bad")
    val v = QualityClassifier.vocabulary(stats, minDf = 2, vocabSize = 10)
      .select("token", "w_permille").as[(String, Long)].collect().toMap
    assert(!v.contains("rare")) // df 1 < minDf
    assert(v("a") == 1000L * 4 / 6) // (3+1)/(3+1+2) = 666
    assert(v("b") == 1000L * 1 / 6) // (0+1)/(4+2)   = 166
  }

  test("vocabulary cap keeps the highest-df tokens, ties by token") {
    val stats = Seq(("z", 5L, 0L), ("a", 5L, 0L), ("m", 9L, 0L))
      .toDF("token", "n_good", "n_bad")
    val kept = QualityClassifier.vocabulary(stats, minDf = 1, vocabSize = 2)
      .select("token").as[String].collect().toSet
    assert(kept == Set("m", "a")) // df 9 first, then tie a < z
  }

  test("baseRatePermille is the smoothed positive fraction") {
    val train = Seq((1L, 1), (2L, 1), (3L, 0)).toDF("id", "y")
    // (2+1)*1000 / (3+2) = 600
    assert(QualityClassifier.baseRatePermille(train, col("y")) == 600L)
  }

  test("scoreDocs is the mean centered contribution; no-hit docs score 0") {
    val vocab = Seq(("clean", 800L), ("spam", 100L))
      .toDF("token", "w_permille")
    val docs = Seq(
      (1L, "clean clean text"), // one distinct hit: 1000*300/1
      (2L, "spam and clean"), // (300-400)*1000/2 = -50000
      (3L, "nothing matches"), // 0 hits
      (4L, "")).toDF("id", "text")
    val out = QualityClassifier.scoreDocs(docs, "id", col("text"), vocab, 500L)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 1L, 300000L)))
    assert(out(2L) == ((2L, 2L, -50000L)))
    assert(out(3L) == ((3L, 0L, 0L)))
    assert(out(4L) == ((4L, 0L, 0L)))
    assert(out.size == 4)
  }

  test("trainedThreshold is the midpoint of integer class means") {
    val scored = Seq((1L, 100L, 1), (2L, 301L, 1), (3L, -100L, 0), (4L, -50L, 0))
      .toDF("id", "score", "y")
    // mean_good = 401/2 = 200 (trunc), mean_bad = -150/2 = -75, mid = 62
    assert(QualityClassifier.trainedThreshold(scored, col("y")) == 62L)
    // truncation toward zero on negatives (DuckDB // and Spark DIV agree)
    val neg = Seq((1L, -3L, 1), (2L, -8L, 0)).toDF("id", "score", "y")
    assert(QualityClassifier.trainedThreshold(neg, col("y")) == -5L) // (-3 + -8)/2
  }

  test("distill on the documents fixture learns a text-derived label") {
    val docs = Tables.load(spark, sf0001, "documents")
    def label = array_contains(
      QualityClassifier.featureTokens(col("text")), "vector").cast("int")
    val train = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text"), label.as("label"))
    val out = QualityClassifier.distill(docs, "doc_id", col("text"),
      train, col("text"), col("label")).cache()
    assert(out.count() == docs.count())
    // both classes predicted, and held-out accuracy well above the
    // positive base rate (~77%)
    assert(out.filter(col("pred_good") === 1).count() > 0)
    assert(out.filter(col("pred_good") === 0).count() > 0)
    val heldOut = docs.filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"), label.as("truth"))
    val agree = out.join(heldOut, Seq("doc_id"))
      .filter(col("pred_good") === col("truth")).count()
    assert(agree.toDouble / heldOut.count() > 0.85)
    out.unpersist()
  }
}
