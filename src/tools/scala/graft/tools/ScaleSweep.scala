package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-sweep harness: times the scan-proportional text pipelines at
  * 1×/3×/10× synthetic multiples of the sf0.1 `documents` table and
  * prints one JSON line per (pipeline, multiple) — the measured
  * evidence behind SCALE.md's "runs at scan speed" claims. A pipeline
  * whose seconds grow super-linearly in the multiple has a hidden
  * all-pairs or global-window stage.
  *
  * Each copy's text is salted with a copy-specific md5 token so copies
  * are DISTINCT documents (an unsalted union would make every doc a
  * 10-way duplicate and measure dedup-output explosion, not operator
  * scaling). Builder-side tooling — not part of the driver contract.
  */
object ScaleSweep {
  /** `mult` copies of the documents table. Every TOKEN of copy k > 0 is
    * prefixed with the copy id, so copies are genuinely distinct
    * documents (zero shared shingles): a tail-only salt would leave the
    * copies near-dups of each other and any near-dup measurement would
    * see an m-clique per original — quadratic OUTPUT growth by fixture
    * construction, not by operator behavior. */
  private def corpus(spark: SparkSession, dir: String, mult: Int): DataFrame = {
    val d = Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"))
    (0 until mult).map { k =>
      val t = if (k == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", s"c${k}_$$1")
      d.select((col("doc_id") + k * 10000000L).as("doc_id"), t.as("text"))
    }.reduce(_ unionByName _)
  }

  /** Corpus with a SCALE-INVARIANT near-dup rate: every copy plants
    * tail-mutated dups of 20% of its own docs (dups never span copies),
    * so candidate pairs grow linearly with the multiple — the shape a
    * real crawl has, and the one that distinguishes "bucketed join
    * scales" from "pair output explodes". */
  private def nearDupCorpus(spark: SparkSession, dir: String, mult: Int): DataFrame = {
    val base = corpus(spark, dir, mult)
    base.unionByName(
      base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000000L).as("doc_id"),
          concat(col("text"), lit(" near duplicate tail")).as("text")))
  }

  /** Shared word-basket fixture for the itemsets/triangles pipelines:
    * each doc's first 32 distinct token hashes. */
  private def wordBaskets(c: DataFrame): DataFrame =
    c.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(slice(array_distinct(
        graft.text.TextFunctions.whitespaceTokens(lower(col("text")))),
        1, 32)).as("w"))
      .select(col("doc_id"), pmod(xxhash64(col("w")), lit(100000L)).as("w"))

  private def time(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = f
    ((System.nanoTime() - t0) / 1e9, n)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    import graft.text._
    val pipelines: Seq[(String, DataFrame => Long)] = Seq(
      "exact_dedup" -> (c => Dedup.exact(c, "doc_id", col("text")).count()),
      "fingerprint" -> (c => TextFunctions.fingerprint(c, "doc_id", col("text")).count()),
      "simhash64" -> (c => c.filter(col("text").isNotNull)
        .select(col("doc_id"), TextFunctions.whitespaceTokens(col("text")).as("t"))
        .filter(size(col("t")) > 0)
        .select(TextFunctions.simhash64Col(col("t"))).count()),
      "repetition" -> (c => TextFunctions.repetitionStats(c, "doc_id", col("text")).count()),
      "pii_scrub" -> (c => c.select(Pii.scrub(col("text"))).count()),
      "split_pack" -> (c => {
        val sp = Sampling.hashSplit(
          TextFunctions.qualityStats(c.filter(col("text").isNotNull), col("text"))
            .select(col("doc_id"), col("n_tokens")),
          col("doc_id"), "42", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .withColumn("shard", col("bucket") % 64)
        Packing.packManifest(sp, "doc_id", col("n_tokens"),
          Seq(col("split"), col("shard")), 2048).count()
      }),
      "vocabulary" -> (c => TextFunctions.vocabulary(c, "doc_id", col("text"), 1000).count()),
      "surprisal" -> (c => TextFunctions.unigramSurprisal(c, "doc_id", col("text")).count()),
      // round-7 additions: line-level curation, the epoch shuffle, tf-idf
      // keywords, and the Bloom admission check (batch = odd ids,
      // reference = even ids of the same corpus)
      "line_dedup" -> (c => Lines.lineDedup(
        c.select(col("doc_id"),
          regexp_replace(col("text"), " (the|table) ", ".\n").as("text")),
        "doc_id", col("text")).count()),
      "c4_filter" -> (c => Lines.lineFilter(
        c.select(col("doc_id"),
          regexp_replace(col("text"), " (the|table) ", ".\n").as("text")),
        "doc_id", col("text")).count()),
      "shuffle_manifest" -> (c => Sampling.shuffleManifest(
        c.select("doc_id"), "doc_id", "ep1", 64).count()),
      "tfidf_topk" -> (c => TextFunctions.tfIdfTopK(c, "doc_id", col("text")).count()),
      "bloom_admission" -> (c => Dedup.exactNewBloom(
        c.filter(col("doc_id") % 2 === 1), c.filter(col("doc_id") % 2 === 0),
        "doc_id", col("text")).count()),
      "mix_budget" -> (c => Mixing.budgetSelect(
        TextFunctions.qualityStats(c.filter(col("text").isNotNull), col("text")),
        "doc_id", substring(col("text"), 1, 2).as("st"), col("n_tokens"),
        col("quality_score"), Seq("ke" -> 5000L, "ba" -> 2000L, "sm" -> 100000L))
        .count()),
      "cap_per_group" -> (c => Sampling.capPerGroup(
        c.select(col("doc_id"), substring(col("text"), 1, 2).as("domain")),
        col("domain"), col("doc_id"), 500L).count()),
      "sentence_chunks" -> (c => Chunking.sentenceChunks(
        c.filter(col("text").isNotNull).select(col("doc_id"),
          regexp_replace(col("text"), " (the|table) ", ". ").as("text")),
        "doc_id", col("text"), 16).count()),
      "bm25" -> (c => {
        val spark = c.sparkSession
        import spark.implicits._
        val qs = Seq((1L, "key table scan"), (2L, "fast merge batch window"),
          (3L, "customer order part")).toDF("query_id", "qtext")
        Retrieval.bm25TopK(c, "doc_id", col("text"), qs,
          "query_id", col("qtext")).count()
      }),
      // round-9: substring-level dedup — copies are token-salted, so
      // each copy only duplicates against itself: dup output grows
      // linearly with the multiple, and seconds must track the gram
      // census (one row per char), never corpus²
      "substr_spans" -> (c => Substrings.dupSpans(
        c, "doc_id", col("text"), k = 40).count()),
      "substr_anchors" -> (c => Substrings.anchorSpans(
        c, "doc_id", col("text"), k = 40, guarantee = 64).count()),
      // round-9 late additions: curriculum order, CCNet buckets, and
      // blocked record linkage (names = text prefixes, regions hashed
      // from the id; the salt token keeps blocks within one copy)
      "curriculum" -> (c => Sampling.curriculumManifest(
        c.filter(col("text").isNotNull)
          .select(col("doc_id"),
            (length(col("text")).cast("long") / 500L).cast("long").as("b")),
        "doc_id", col("b"), "cur1", 64).count()),
      "ccnet_buckets" -> (c => Curation.perplexityBuckets(
        c.withColumn("lang", (col("doc_id") % 4).cast("string")),
        "doc_id", col("text"), col("lang")).count()),
      "linkage" -> (c => {
        val recs = c.filter(col("text").isNotNull)
          .select(col("doc_id"), substring(col("text"), 1, 24).as("nm"),
            (col("doc_id") % 64).cast("string").as("rg"))
        val passes = Seq(
          concat(col("rg"), lit("|"), substring(col("nm"), 1, 8)),
          concat(col("rg"), lit("|"), substring(col("nm"), 9, 8)))
        val cand = graft.ops.Linkage.candidates(recs, "doc_id", passes)
        graft.ops.Linkage.verifyEdit(recs, cand, "doc_id", col("nm"), 4)
          .count()
      }),
      // word co-occurrence baskets: each doc's first 32 distinct token
      // hashes; itemsets/triangles are output-sensitive on this
      // fixture (shared vocabulary ⇒ pair density grows with corpus)
      "itemsets" -> (c =>
        graft.ops.Itemsets.frequentPairs(wordBaskets(c), col("doc_id"),
          col("w"), minItemSupport = 50, minPairSupport = 50,
          maxBasket = 64).count()),
      "triangles" -> (c => {
        val edges = graft.ops.Itemsets.frequentPairs(wordBaskets(c),
          col("doc_id"), col("w"), minItemSupport = 50,
          minPairSupport = 50, maxBasket = 64)
        graft.ops.Graph.triangleStats(edges, col("item_a"), col("item_b"))
          .select("n_triangles").count()
      }))
    // the bucketed near-dup candidate pipelines, on the dup-rate-
    // invariant corpus: output (and so seconds) may grow linearly, but
    // never quadratically — the banded-join contract
    val dupPipelines: Seq[(String, DataFrame => Long)] = Seq(
      "minhash_lsh" -> (c => Dedup.lshCandidates(c, "doc_id", col("text")).count()),
      "simhash_band" -> (c => Dedup.simhashCandidates(c, "doc_id", col("text")).count()))
    // builder-side subset filter (comma-separated pipeline names)
    val only = sys.env.get("SPARK_GRAFT_SWEEP_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def keep(kv: (String, DataFrame => Long)) = only.forall(_.contains(kv._1))
    val selP = pipelines.filter(keep)
    val selD = dupPipelines.filter(keep)
    // warm-up at 1x so codegen/JIT is out of the timed region
    val warm = corpus(spark, dir, 1)
    selP.foreach { case (_, f) => f(warm); () }
    val warmDup = nearDupCorpus(spark, dir, 1)
    selD.foreach { case (_, f) => f(warmDup); () }
    for (mult <- Seq(1, 3, 10)) {
      for ((name, f) <- selP) {
        spark.catalog.clearCache()
        val c = corpus(spark, dir, mult)
        val (s1, n) = time(f(c))
        spark.catalog.clearCache()
        val (s2, _) = time(f(c))
        println(f"""{"pipeline":"$name","mult":$mult,"sec":${math.min(s1, s2)}%.3f,"rows":$n}""")
      }
      for ((name, f) <- selD) {
        spark.catalog.clearCache()
        val c = nearDupCorpus(spark, dir, mult)
        val (s1, n) = time(f(c))
        spark.catalog.clearCache()
        val (s2, _) = time(f(c))
        println(f"""{"pipeline":"$name","mult":$mult,"sec":${math.min(s1, s2)}%.3f,"rows":$n}""")
      }
    }
    spark.stop()
  }
}
