package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the Sennrich et al. 2016 worked example: {low:5, lower:2,
  // newest:6, widest:3}
  private def sennrich = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "widest widest widest")).toDF("doc_id", "text")

  test("trainMerges reproduces the Sennrich worked example, ties lexicographic") {
    val (merges, _) = Bpe.trainMerges(sennrich, col("text"), 5, 100)
    val got = merges.orderBy("rank")
      .as[(Int, String, String, Long)].collect().toSeq
    // rank1: (e,s)=9 ties (s,t)=9 → lex picks (e,s); rank3: (l,o)=7
    // ties (o,w)=7 → (l,o); rank5: three-way tie at 6 → (e,w)
    assert(got == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L),
      (4, "lo", "w", 7L), (5, "e", "w", 6L)))
  }

  test("fertility: learned words cost their token count, unseen words their chars") {
    val (_, syms) = Bpe.trainMerges(sennrich, col("text"), 5, 100)
    // low→[low]=1, lower→[low,e,r]=3, newest→[n,ew,est]=3,
    // widest→[w,i,d,est]=4
    val extra = sennrich.union(Seq((5L, "zq newest")).toDF("doc_id", "text"))
    val f = Bpe.fertility(extra, "doc_id", col("text"), syms)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(f == Seq((1L, 5L, 5L), (2L, 2L, 6L), (3L, 6L, 18L),
      (4L, 3L, 12L), (5L, 2L, 5L))) // zq unseen → 2 chars, newest → 3
  }

  test("BpeTokenCount expression == the window-algebra merge fold, per word") {
    import org.apache.spark.sql.graftbridge.ExprBridge
    val (merges, _) = Bpe.trainMerges(sennrich, col("text"), 5, 100)
    val ms = Bpe.mergeSeq(merges)
    // seen, unseen-but-mergeable, runs, single char, non-ASCII
    val words = Seq("lowest", "newest", "wider", "low", "aaaa", "l", "née")
      .toDF("word").withColumn("freq", lit(1L))
    var syms = Bpe.initSymbols(words).localCheckpoint()
    for ((l, r) <- ms) syms = Bpe.applyMerge(syms, l, r)
    val expected = syms.groupBy("word").count()
      .as[(String, Long)].collect().toMap
    val got = words.select($"word",
        ExprBridge.column(graft.functions.BpeTokenCount(
          ExprBridge.expression($"word"), ms)).as("n"))
      .as[(String, Int)].collect().toMap
    assert(got.view.mapValues(_.toLong).toMap == expected)
    // encode job count must not scale with the merge count anymore
    def jobs(ms2: Seq[(String, String)], tag: String): Int = {
      val g = s"bpe-encode-jobs-$tag"
      spark.sparkContext.setJobGroup(g, g)
      try Bpe.encode(sennrich, "doc_id", col("text"), ms2).count()
      finally spark.sparkContext.clearJobGroup()
      spark.sparkContext.statusTracker.getJobIdsForGroup(g).length
    }
    assert(jobs(ms, "k5") == jobs(ms.take(1), "k1"),
      "encode job count grew with the merge count")
  }

  test("run-parity: greedy left-to-right merging inside same-symbol runs") {
    val df = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
    val (merges, syms) = Bpe.trainMerges(df, col("text"), 1, 100)
    assert(merges.as[(Int, String, String, Long)].collect().toSeq ==
      Seq((1, "a", "a", 5L))) // 3 pairs in aaaa + 2 in aaa
    val toks = syms.orderBy("word", "pos")
      .select("word", "sym").as[(String, String)].collect().toSeq
    assert(toks == Seq(("aaa", "aa"), ("aaa", "a"),
      ("aaaa", "aa"), ("aaaa", "aa")))
  }

  test("merge table is partitioning-independent; k too large throws") {
    val (a, _) = Bpe.trainMerges(sennrich.repartition(7), col("text"), 4, 100)
    val (b, _) = Bpe.trainMerges(sennrich, col("text"), 4, 100)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // 'ab'×1 supports exactly one merge
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Bpe.trainMerges(tiny, col("text"), 2, 100)
    }
  }

  test("encode replays learned merges over unseen words") {
    val (mergesDf, _) = Bpe.trainMerges(sennrich, col("text"), 5, 100)
    val merges = Bpe.mergeSeq(mergesDf)
    // lowest: (e,s)→l,o,w,es,t; (es,t)→l,o,w,est; (l,o)→lo,w,est;
    // (lo,w)→low,est = 2 tokens — an UNSEEN word still merges.
    // zq: no merges apply → 2 tokens. low: 1 token.
    val batch = Seq((10L, "lowest low zq")).toDF("id", "text")
    val out = Bpe.encode(batch, "id", col("text"), merges)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((10L, 3L, 5L)))
  }

  test("scale shapes: fertility broadcasts the learned table; loop stages stay per-word") {
    val words = Seq(("low", 5L), ("newest", 6L)).toDF("word", "freq")
    val syms = Bpe.initSymbols(words)
    // pair census: map-side-combined hash aggregate, windows per word —
    // nothing funnels through one partition
    val pc = Bpe.pairCounts(syms).queryExecution.executedPlan.toString
    assert(pc.contains("HashAggregate") && !pc.contains("SinglePartition"),
      s"pairCounts lost its shape:\n$pc")
    val am = Bpe.applyMerge(syms, "e", "s").queryExecution.executedPlan.toString
    assert(!am.contains("SinglePartition"), s"applyMerge funnels:\n$am")
    // fertility: the join is unhinted — a capped learned table still
    // auto-broadcasts under the threshold (while a 10⁸-word model may
    // shuffle instead of OOMing a forced broadcast build)
    val f = Bpe.fertility(sennrich, "doc_id", col("text"), syms)
      .queryExecution.executedPlan.toString
    assert(f.contains("BroadcastHashJoin") && !f.contains("SortMergeJoin"),
      s"fertility lost its auto-broadcast join:\n$f")
  }

  test("local trainer is pinned IDENTICAL to the distributed fold") {
    // same word table through both paths: same ordered merge list
    // (ranks, pairs, counts) AND same final symbol table — on the
    // worked example and on real fixture text with a deeper k
    for ((corpus, k, cap) <- Seq((sennrich, 5, 100),
        (graft.Tables.load(spark, sf0001, "documents")
          .select(col("doc_id"), col("text")), 12, 200))) {
      val words = Bpe.wordFreq(corpus, col("text"), cap).localCheckpoint()
      val (ml, sl) = Bpe.trainMergesLocal(words, k)
      val (md, sd) = Bpe.trainMergesDistributed(words, k)
      assert(ml.orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
        == md.orderBy("rank").as[(Int, String, String, Long)].collect().toSeq)
      val a = sl.orderBy("word", "pos")
        .as[(String, Long, Int, String)].collect().toSeq
      val b = sd.orderBy("word", "pos")
        .as[(String, Long, Int, String)].collect().toSeq
      assert(a == b, s"final symbol tables diverged (k=$k)")
    }
  }

  test("trainMerges runs ZERO Spark jobs inside the merge loop under the cap") {
    // the auto-switch: below LocalTrainWordCap the loop is driver-local
    // — job count must not scale with k
    def jobs(k: Int): Int = {
      val g = s"bpe-jobcount-$k"
      spark.sparkContext.setJobGroup(g, g)
      try Bpe.trainMerges(sennrich, col("text"), k, 100)
      finally spark.sparkContext.clearJobGroup()
      spark.sparkContext.statusTracker.getJobIdsForGroup(g).length
    }
    val j2 = jobs(2)
    val j5 = jobs(5)
    assert(j5 <= j2 + 1, s"job count grew with k: k=2 → $j2, k=5 → $j5")
  }

  test("wordFreq caps to maxWords by (freq desc, word asc)") {
    val wf = Bpe.wordFreq(sennrich, col("text"), 2)
      .orderBy(col("freq").desc, col("word"))
      .as[(String, Long)].collect().toSeq
    assert(wf == Seq(("newest", 6L), ("low", 5L)))
  }
}
