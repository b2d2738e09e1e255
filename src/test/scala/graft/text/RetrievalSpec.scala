package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25TopK: term hits rank above misses, rarity beats commonality, dl normalizes") {
    val corpus = Seq(
      (1L, "apple banana cherry"),             // hits 'apple' (rare-ish)
      (2L, "apple apple apple apple"),         // higher tf, same term
      (3L, "banana cherry date"),               // no query term
      (4L, "apple " + ("filler " * 50).trim)) // long doc: dl-penalized
      .toDF("doc_id", "text")
    val qs = Seq((1L, "apple")).toDF("query_id", "qtext")
    val out = Retrieval.bm25TopK(corpus, "doc_id", col("text"), qs,
      "query_id", col("qtext"), k = 10)
      .orderBy("rank").as[(Long, Int, Long, Long, Long)].collect().toSeq
    // doc 3 never appears (no query term)
    assert(!out.exists(_._3 == 3L))
    // higher tf ranks doc 2 first; the 51-token doc is length-penalized
    // below the 3-token doc
    assert(out.head._3 == 2L)
    assert(out.map(_._3).indexOf(1L) < out.map(_._3).indexOf(4L))
    // every score positive, every hit count 1 (one query term)
    assert(out.forall(r => r._4 > 0 && r._5 == 1))
  }

  test("bm25TopK: multi-term queries sum per-term partials; ties break on doc id") {
    val corpus = Seq(
      (1L, "red green"), (2L, "red green"), (3L, "red"), (4L, "blue"))
      .toDF("doc_id", "text")
    val qs = Seq((7L, "red green")).toDF("query_id", "qtext")
    val out = Retrieval.bm25TopK(corpus, "doc_id", col("text"), qs,
      "query_id", col("qtext"), k = 4)
      .orderBy("rank").as[(Long, Int, Long, Long, Long)].collect().toSeq
    // both-term docs outrank the single-term doc; identical docs tie
    // and break on doc_id
    assert(out.map(_._3) == Seq(1L, 2L, 3L))
    assert(out(0)._4 == out(1)._4 && out(0)._5 == 2)
  }

  test("hybridTopK: items retrieved by both rankers outrank single-ranker items") {
    val corpus = Seq(
      (1L, "red apple pie"),     // lexical hit for 'apple'
      (2L, "green apple tart"),  // lexical hit
      (3L, "blue berry jam"))    // lexical miss
      .toDF("doc_id", "text")
    // embeddings: query 10's vector is closest to item 2, then 3, then 1
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.4f, 0.6f)), (10L, Array(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val qs = Seq((10L, "apple")).toDF("query_id", "qtext")
    val out = Retrieval.hybridTopK(corpus, "doc_id", col("text"),
        emb, "vec_id", "embedding", qs, "query_id", col("qtext"),
        k = 3, poolK = 3)
      .orderBy("rank").as[(Long, Int, Long, Long, Long)].collect().toSeq
    // item 2 is in BOTH pools (lexical 'apple' + dense nearest) → rank 1
    assert(out.head._3 == 2L && out.head._5 == 2L)
    // single-ranker items follow; every fused score positive
    assert(out.forall(_._4 > 0))
    assert(out.map(_._3).toSet == Set(1L, 2L, 3L))
  }

  test("saltedTopK == single global window when one group owns every candidate") {
    // group 1 is the "ubiquitous term" shape: all 500 candidates belong
    // to it; group 2 is a normal small pool
    val cands = ((1 to 500).map(i => (1L, i.toLong, (i % 37).toLong)) ++
        Seq((2L, 1L, 5L), (2L, 2L, 9L), (2L, 3L, 1L)))
      .toDF("query_id", "doc_id", "score")
    val order = Seq(col("score").desc, col("doc_id"))
    val salted = Retrieval.saltedTopK(cands, col("query_id"), col("doc_id"),
        order, k = 7)
      .select("query_id", "rank", "doc_id", "score")
      .collect().toSet
    val single = cands.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(order: _*)))
      .filter(col("rank") <= 7)
      .select("query_id", "rank", "doc_id", "score")
      .collect().toSet
    assert(salted == single)
  }

  test("bm25TopK: salted two-level == single-window on a ubiquitous-term corpus") {
    // every doc contains 'the', so the query's candidate list is the
    // whole corpus — the shape that made the old single window a
    // one-reducer funnel
    val corpus = (1L to 300L)
      .map(i => (i, s"the filler$i ${if (i % 7 == 0) "zebra" else "word"}"))
      .toDF("doc_id", "text")
    val qs = Seq((1L, "the zebra")).toDF("query_id", "qtext")
    def run(salts: Int) = Retrieval.bm25TopK(corpus, "doc_id", col("text"),
        qs, "query_id", col("qtext"), k = 10, salts = salts)
      .collect().toSet
    assert(run(Retrieval.TopKSalts) == run(1))
  }

  test("bm25TopK: parquet-staging path returns the persist path's exact rows") {
    val corpus = (1L to 50L)
      .map(i => (i, s"alpha beta$i ${if (i % 5 == 0) "gamma" else "delta"}"))
      .toDF("doc_id", "text")
    val qs = Seq((1L, "alpha gamma")).toDF("query_id", "qtext")
    val dir = java.nio.file.Files.createTempDirectory("bm25-stage").toString
    try {
      def run(staging: Option[String]) = Retrieval.bm25TopK(corpus, "doc_id",
          col("text"), qs, "query_id", col("qtext"), k = 8,
          stagingDir = staging)
        .collect().toSet
      assert(run(Some(dir)) == run(None))
      assert(new java.io.File(s"$dir/bm25_tf").exists())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("stagedBm25TopK == bm25TopK, and the postings scan prunes buckets") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val corpus = Tables.load(spark, sf0001, "documents").limit(200)
      .select("doc_id", "text").localCheckpoint(true)
    val qs = Seq((1L, "key table scan"), (2L, "fast merge batch"))
      .toDF("query_id", "qtext")
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    Retrieval.stageBm25(corpus, "doc_id", col("text"), dir, buckets = 32)
    val staged = Retrieval.stagedBm25TopK(spark, dir, qs, "query_id",
      col("qtext"), k = 5)
    val direct = Retrieval.bm25TopK(corpus, "doc_id", col("text"), qs,
      "query_id", col("qtext"), k = 5)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Int, Long, Long, Long)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
    assert(norm(staged) == norm(direct) && norm(staged).nonEmpty)
    // the postings/df scans carry partition filters on `bkt`
    val plan = staged.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val bucketed = plan.collect { case s: FileSourceScanExec => s }
      .filter(_.metadata.get("Location").exists(l =>
        l.contains("postings") || l.contains("/df")))
    assert(bucketed.nonEmpty, s"no bucketed scan in:\n$plan")
    assert(bucketed.forall(_.partitionFilters.nonEmpty),
      s"a bucketed scan reads every partition:\n$plan")
  }

  test("appendBm25: stage half + append half == stage all; compact is query-invisible") {
    val corpus = Tables.load(spark, sf0001, "documents").limit(200)
      .select("doc_id", "text").localCheckpoint(true)
    val qs = Seq((1L, "key table scan"), (2L, "fast merge batch"))
      .toDF("query_id", "qtext")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Int, Long, Long, Long)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
    val full = java.nio.file.Files.createTempDirectory("bm25full").toString
    Retrieval.stageBm25(corpus, "doc_id", col("text"), full, buckets = 16)
    val want = norm(Retrieval.stagedBm25TopK(spark, full, qs, "query_id",
      col("qtext"), k = 5))
    // incremental: stage even ids, append odds in TWO batches — df rows
    // accumulate per term and (n, avgdl) shift with every batch, so
    // equality pins the reader-side df sum AND the dl-derived stats
    val inc = java.nio.file.Files.createTempDirectory("bm25inc").toString
    Retrieval.stageBm25(corpus.filter($"doc_id" % 2 === 0), "doc_id",
      col("text"), inc, buckets = 16)
    Retrieval.appendBm25(corpus.filter($"doc_id" % 4 === 1), "doc_id",
      col("text"), inc)
    Retrieval.appendBm25(corpus.filter($"doc_id" % 4 === 3), "doc_id",
      col("text"), inc)
    val got = norm(Retrieval.stagedBm25TopK(spark, inc, qs, "query_id",
      col("qtext"), k = 5))
    assert(got == want && got.nonEmpty)
    // compaction: one file per bucket again, scores unchanged, counts true
    def filesPer(sub: String): Map[String, Int] = {
      val root = new java.io.File(s"$inc/$sub")
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("bkt="))
        .map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    }
    assert(filesPer("postings").values.max > 1, "appends should stack files")
    Retrieval.compactBm25(spark, inc)
    assert(filesPer("postings").values.forall(_ == 1), filesPer("postings").toString)
    assert(filesPer("df").values.forall(_ == 1), filesPer("df").toString)
    assert(norm(Retrieval.stagedBm25TopK(spark, inc, qs, "query_id",
      col("qtext"), k = 5)) == want)
    val mf = graft.util.IndexManifest.read(spark, inc)
    assert(mf.counts("n_docs") ==
      corpus.filter($"text".isNotNull).count())
    // the refreshed stats frame matches a fresh stage's bit-for-bit
    val stFull = spark.read.parquet(s"$full/stats")
      .as[(Long, Double, Long)].collect().head
    val stInc = spark.read.parquet(s"$inc/stats")
      .as[(Long, Double, Long)].collect().head
    assert(stInc == stFull)
    // an append with the wrong id column is refused by the manifest
    intercept[IllegalArgumentException] {
      Retrieval.appendBm25(corpus.withColumnRenamed("doc_id", "k2"), "k2",
        col("text"), inc)
    }
  }

  test("appendBm25: a batch containing an already-indexed id is refused") {
    val corpus = Tables.load(spark, sf0001, "documents").limit(40)
      .select("doc_id", "text").localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("bm25guard").toString
    Retrieval.stageBm25(corpus.filter($"doc_id" % 2 === 0), "doc_id",
      col("text"), dir, buckets = 4)
    // one overlapping id poisons the whole batch — nothing is written
    val dirty = corpus.filter($"doc_id" % 2 === 1)
      .unionByName(corpus.filter($"doc_id" % 2 === 0).limit(1))
    val before = spark.read.parquet(s"$dir/dl").count()
    val e = intercept[IllegalArgumentException] {
      Retrieval.appendBm25(dirty, "doc_id", col("text"), dir)
    }
    assert(e.getMessage.contains("already-indexed"))
    assert(spark.read.parquet(s"$dir/dl").count() == before,
      "the refused append must leave the index untouched")
    // the explicit escape hatch skips the guard (caller asserts
    // disjointness); a genuinely new batch passes the guard unaided
    Retrieval.appendBm25(corpus.filter($"doc_id" % 2 === 1), "doc_id",
      col("text"), dir)
    val qs = Seq((1L, "key table scan")).toDF("query_id", "qtext")
    val got = Retrieval.stagedBm25TopK(spark, dir, qs, "query_id",
      col("qtext"), k = 3).count()
    assert(got > 0)
    Retrieval.appendBm25(corpus.filter($"doc_id" % 2 === 0).limit(1)
      .withColumn("doc_id", $"doc_id" + 1000000), "doc_id", col("text"),
      dir, assumeNewIds = true)
  }

  test("hybridTopK: IVF dense side (centroids supplied) fuses like the brute side") {
    val corpus = Seq(
      (1L, "red apple pie"), (2L, "green apple tart"), (3L, "blue berry jam"))
      .toDF("doc_id", "text")
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.4f, 0.6f)), (10L, Array(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val qs = Seq((10L, "apple")).toDF("query_id", "qtext")
    val cents = graft.ml.Similarity.ivfCentroids(emb, "vec_id", "embedding", 2)
    val ivf = Retrieval.hybridTopK(corpus, "doc_id", col("text"),
        emb, "vec_id", "embedding", qs, "query_id", col("qtext"),
        k = 3, poolK = 3, denseCentroids = Some(cents), nprobe = 2)
      .orderBy("rank").as[(Long, Int, Long, Long, Long)].collect().toSeq
    // nprobe = numCentroids probes every list → the dense pool equals
    // the brute pool, so the fusion must match the brute-side test:
    // item 2 retrieved by both rankers, everything fused positive
    assert(ivf.head._3 == 2L && ivf.head._5 == 2L)
    assert(ivf.map(_._3).toSet == Set(1L, 2L, 3L))
    assert(ivf.forall(_._4 > 0))
    val brute = Retrieval.hybridTopK(corpus, "doc_id", col("text"),
        emb, "vec_id", "embedding", qs, "query_id", col("qtext"),
        k = 3, poolK = 3)
      .orderBy("rank").as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(ivf == brute)
  }

  test("saltedTopK plan: the query-only window ranks only partial-top-k survivors") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window => LWindow}
    val cands = Seq((1L, 1L, 2L)).toDF("query_id", "doc_id", "score")
    val out = Retrieval.saltedTopK(cands, col("query_id"), col("doc_id"),
      Seq(col("score").desc, col("doc_id")), k = 5)
    val windows = out.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.size == 2, windows.mkString("\n"))
    val fin = windows.filter(_.partitionSpec.size == 1)
    assert(fin.size == 1, "expected exactly one query-only window")
    // the query-only window must sit above a rank filter that sits
    // above the (query, salt)-sharded window — never over the raw set
    val guarded = fin.head.child.collect {
      case f: Filter if f.collectFirst {
        case w: LWindow if w.partitionSpec.size == 2 => w
      }.nonEmpty => f
    }
    assert(guarded.nonEmpty, fin.head.toString)
  }

  test("bm25TopK plan: nothing corpus-sized broadcasts") {
    val docs = Tables.load(spark, sf001, "documents")
    val qs = Seq((1L, "key table")).toDF("query_id", "qtext")
    val out = Retrieval.bm25TopK(docs, "doc_id", col("text"), qs,
      "query_id", col("qtext"))
    assert(out.count() > 0)
  }
}
