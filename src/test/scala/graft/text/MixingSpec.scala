package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MixingSpec extends SparkSpec {
  import spark.implicits._

  // (id, stratum, tokens, quality): "en" has 3 quality levels with 300
  // tokens each; "fr" tiny; "xx" has no budget
  private def corpus = (
    (1L to 30L).map(i => (i, "en", 10L, (i % 3 + 1).toInt)) ++
    Seq((101L, "fr", 50L, 4), (102L, "fr", 50L, 1)) ++
    Seq((201L, "xx", 99L, 4))
  ).toDF("doc_id", "stratum", "n_tokens", "quality")

  test("budgetSelect admits top levels fully, cuts the boundary level, drops the rest") {
    val out = Mixing.budgetSelect(corpus, "doc_id", col("stratum"),
      col("n_tokens"), col("quality"),
      Seq("en" -> 150L, "fr" -> 50L, "zz" -> 10L)).cache()
    val en = out.filter(col("stratum") === "en")
    // en: level 3 holds 100 tokens (10 docs) → fully admitted; level 2
    // is the boundary (needs 50 of 100 → ~half by hash bucket); level 1
    // excluded
    assert(en.filter(col("quality") === 3).count() == 10)
    assert(en.filter(col("quality") === 1).count() == 0)
    val boundary = en.filter(col("quality") === 2).count()
    assert(boundary > 0 && boundary < 10, s"boundary admitted $boundary of 10")
    // fr: budget 50 covers exactly the quality-4 doc; quality-1 excluded
    assert(out.filter(col("stratum") === "fr").select("doc_id")
      .as[Long].collect().toSet == Set(101L))
    // xx has no budget → absent entirely
    assert(out.filter(col("stratum") === "xx").count() == 0)
    out.unpersist()
  }

  test("temperatureSample damps large strata and matches hand-computed weights") {
    // skewed strata: 160 "web", 40 "niche" → N=200
    val skewed = ((1L to 160L).map(i => (i, "web")) ++
      (201L to 240L).map(i => (i, "niche"))).toDF("doc_id", "stratum")
    val out = Mixing.temperatureSample(skewed, "doc_id", col("stratum"),
      targetTotal = 100).cache()
    // hand-compute the exact rule the scaladoc promises
    def ppm(n: Long, tot: Long): Long =
      math.floor(1000000.0 * math.sqrt(n.toDouble / tot)).toLong
    val wWeb = ppm(160, 200); val wNiche = ppm(40, 200)
    val sumW = wWeb + wNiche
    val tWeb = 100L * wWeb / sumW; val tNiche = 100L * wNiche / sumW
    val row = out.filter(col("stratum") === "web")
      .select("weight_ppm", "target_docs").distinct().as[(Long, Long)].head()
    assert(row == ((wWeb, tWeb)))
    val rowN = out.filter(col("stratum") === "niche")
      .select("weight_ppm", "target_docs").distinct().as[(Long, Long)].head()
    assert(rowN == ((wNiche, tNiche)))
    // damping: the small stratum keeps a strictly HIGHER fraction of its
    // docs than the large one (α=1/2 compresses the ratio 4:1 → 2:1)
    assert(tNiche.toDouble / 40 > tWeb.toDouble / 160)
    // admitted counts land within bucket resolution of the targets
    val kept = out.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(math.abs(kept("web") - tWeb) <= 8, s"web kept ${kept("web")} vs $tWeb")
    assert(math.abs(kept("niche") - tNiche) <= 8)
    // deterministic: a re-run selects the identical doc set
    val again = Mixing.temperatureSample(skewed, "doc_id", col("stratum"), 100)
    assert(out.select("doc_id").except(again.select("doc_id")).count() == 0)
    out.unpersist()
  }

  test("temperatureSample keeps a whole stratum when its damped target exceeds it") {
    // 3 docs vs 300: the tiny stratum's target (≈ √-damped share of 150)
    // exceeds 3 → frac caps at the full granularity, all 3 kept
    val df = ((1L to 300L).map(i => (i, "big")) ++
      Seq((901L, "tiny"), (902L, "tiny"), (903L, "tiny"))).toDF("doc_id", "stratum")
    val out = Mixing.temperatureSample(df, "doc_id", col("stratum"), 150)
    assert(out.filter(col("stratum") === "tiny").count() == 3)
  }

  test("budgetSelect admits everything when the budget exceeds the stratum") {
    val out = Mixing.budgetSelect(corpus, "doc_id", col("stratum"),
      col("n_tokens"), col("quality"), Seq("en" -> 100000L))
    assert(out.count() == 30)
  }

  test("budgetSelect: parquet-staging path returns the persist path's exact rows") {
    val dir = java.nio.file.Files.createTempDirectory("mix-stage").toString
    try {
      def run(staging: Option[String]) = Mixing.budgetSelect(corpus, "doc_id",
          col("stratum"), col("n_tokens"), col("quality"),
          Seq("en" -> 150L, "fr" -> 50L), stagingDir = staging)
        .collect().toSet
      assert(run(Some(dir)) == run(None))
      // the staged intermediate really was written
      assert(new java.io.File(s"$dir/mix_ann").exists())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("budgetSelect is deterministic and shuffle-light (no corpus sort)") {
    val docs = Tables.load(spark, sf001, "documents").filter(col("text").isNotNull)
    val stats = TextFunctions.qualityStats(docs, col("text"))
    def run() = Mixing.budgetSelect(stats, "doc_id", col("lang"),
      col("n_tokens"), col("quality_score"), Seq("en" -> 4000L, "fr" -> 1500L))
    val a = run(); val b = run()
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // the corpus-sized side is never sorted: every Sort in the plan
    // belongs to the tiny histogram window
    val plan = run().queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"corpus must not sort-merge join:\n$plan")
  }
}
