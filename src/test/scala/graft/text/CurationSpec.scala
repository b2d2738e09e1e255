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
}
