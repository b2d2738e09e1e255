package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, sf0001, "documents")

  test("exact dedup groups planted copies under one hash") {
    val d = docs.select(col("doc_id"), col("text"))
    val corpus = d.unionByName(
      d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"), col("text")))
    val out = Dedup.exact(corpus, "doc_id", col("text"))
    val planted = d.filter(col("doc_id") % 7 === 0).count()
    assert(out.filter(col("dup_count") === 2).count() == planted)
    // keep_id is always the original (smaller) id
    assert(out.filter(col("keep_id") >= 200000L).count() == 0)
  }

  test("narrow minhash path equals the exploded-aggregate path on real docs") {
    val d = docs.select(col("doc_id"), col("text"))
    // adversarial additions: empty doc, sub-3-word doc (NULL-only
    // shingles -> absent from BOTH paths), exact dup of a real doc
    val corpus = d.unionByName(Seq(
      (900001L, ""), (900002L, "two words"),
      (900003L, "a b c d e f g")).toDF("doc_id", "text"))
    val viaAgg = Dedup.minhashArray(
      Dedup.shingles(corpus, "doc_id", col("text")), "doc_id", 16)
    val viaNarrow = Dedup.minhashNarrow(corpus, "doc_id", col("text"), 16)
    assert(viaNarrow.count() == viaAgg.count())
    val joined = viaAgg.select(col("doc_id"), col("mh").as("mh_a"))
      .join(viaNarrow.select(col("doc_id"), col("mh").as("mh_n")), Seq("doc_id"), "full_outer")
    assert(joined.where(not(col("mh_a") <=> col("mh_n"))).count() == 0)
    // the NULL-shingle-only docs are absent from both
    assert(viaNarrow.filter(col("doc_id").isin(900001L, 900002L)).count() == 0)
  }

  test("LSH candidates recover every planted near-dup pair (recall 1.0 here)") {
    val d = docs.select(col("doc_id"), col("text"))
    val corpus = d.unionByName(
      d.filter(col("doc_id") % 5 === 0).select(
        (col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" near duplicate tail")).as("text")))
    val cand = Dedup.lshCandidates(corpus, "doc_id", col("text")).cache()
    val planted = d.filter(col("doc_id") % 5 === 0).count()
    val truePairs = cand.filter(col("id_b") - col("id_a") === 100000L).count()
    assert(truePairs == planted, s"expected all $planted planted pairs, got $truePairs")
    // and LSH is selective: candidates ≪ all-pairs
    val n = corpus.count()
    assert(cand.count() < n * 3, "candidate set should be far below |docs|²")
    cand.unpersist()
  }

  test("jaccardVerify ranks planted near-dups near 1.0 and false positives lower") {
    val d = docs.select(col("doc_id"), col("text"))
    val corpus = d.unionByName(
      d.filter(col("doc_id") % 5 === 0).select(
        (col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" near duplicate tail")).as("text")))
    val cand = Dedup.lshCandidates(corpus, "doc_id", col("text"))
    val verified = Dedup.jaccardVerify(corpus, cand, "doc_id", col("text")).cache()
    // the 3-word tail dilutes a ~9-word doc to J ≈ 0.6, so 0.5 is the
    // right floor for "same doc + small edit" at this fixture's lengths
    val planted = verified.filter(col("id_b") - col("id_a") === 100000L)
    assert(planted.filter(col("jaccard") < 0.5).count() == 0)
    // verification separates true dups from bucket-collision noise in
    // aggregate (tiny-vocab fixture docs can be genuinely similar, so a
    // handful of non-planted pairs may legitimately score high)
    val fp = verified.filter(col("id_b") - col("id_a") =!= 100000L)
    val avgPlanted = planted.agg(avg("jaccard")).head().getDouble(0)
    val avgFp = fp.agg(avg("jaccard")).head().getDouble(0)
    assert(avgPlanted > avgFp,
      s"planted avg $avgPlanted should exceed collision avg $avgFp")
    verified.unpersist()
  }

  test("degenerate bucket cap bounds the self-join; near-dups still found") {
    // 100 byte-identical boilerplate docs share EVERY band bucket — the
    // quadratic hazard the cap exists for — plus one genuine near-dup pair
    val boiler = spark.range(100).select(col("id").as("doc_id"),
      lit("the same boilerplate text repeated verbatim across the whole corpus forever").as("text"))
    val pair = Seq(
      (1000L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
      (1001L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo"))
      .toDF("doc_id", "text")
    val corpus = boiler.unionByName(pair)

    val uncapped = Dedup.lshCandidates(corpus, "doc_id", col("text"), maxBucket = 1000000)
    assert(uncapped.count() >= 100L * 99 / 2, "uncapped degenerate bucket is quadratic")

    val capped = Dedup.lshCandidates(corpus, "doc_id", col("text"), maxBucket = 50)
    assert(capped.filter(col("id_a") === 1000L && col("id_b") === 1001L).count() == 1,
      "small-bucket near-dup pair must survive the cap")
    assert(capped.count() < 10, "degenerate bucket pairs must be dropped")

    // no silent truncation: the census reports what the cap dropped
    val dropped = Dedup.bucketSizes(corpus, "doc_id", col("text")).filter(col("n") > 50)
    assert(dropped.count() > 0)
    assert(dropped.agg(max("n")).head().getLong(0) == 100L)
  }

  test("resolveClusters: min-label propagation over chains and singletons") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    // a 3-chain (diameter 2: needs >1 round), a 2-clique, a singleton
    // smallEdgeCap = -1 forces the DISTRIBUTED loop
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val roots = Dedup.resolveClusters(nodes, pairs, smallEdgeCap = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(roots == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("resolveClusters converges in O(log diameter) rounds (pointer jumping)") {
    // a 64-node chain has diameter 63: plain neighbor-min propagation
    // needs 63 rounds, path halving needs ~log2(63)+2 — maxIter=10
    // converging at all IS the logarithmic-contraction proof.
    // smallEdgeCap = -1 forces the DISTRIBUTED loop
    val n = 64L
    val nodes = (1L to n).toDF("doc_id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val roots = Dedup.resolveClusters(nodes, pairs, maxIter = 10, smallEdgeCap = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(roots == (1L to n).map(_ -> 1L).toMap)
  }

  test("resolveClusters small-graph fast path equals the distributed loop") {
    // chain + clique + singletons, shuffled edge directions
    val nodes = (1L to 40L).toDF("doc_id")
    val pairs = ((1L until 20L).map(i => (i + 1, i)) ++
      Seq((30L, 35L), (35L, 31L), (31L, 30L))).toDF("id_a", "id_b")
    val viaDriver = Dedup.resolveClusters(nodes, pairs) // cap default: driver path
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLoop = Dedup.resolveClusters(nodes, pairs, smallEdgeCap = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == viaLoop)
    assert(viaDriver(20L) == 1L && viaDriver(35L) == 30L && viaDriver(40L) == 40L)

    // string ids: min is Spark's string ordering on both paths
    val snodes = Seq("b", "a", "c", "z").toDF("id")
    val spairs = Seq(("b", "c"), ("c", "a")).toDF("id_a", "id_b")
    val sDriver = Dedup.resolveClusters(snodes, spairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val sLoop = Dedup.resolveClusters(snodes, spairs, smallEdgeCap = -1L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sDriver == sLoop)
    assert(sDriver == Map("a" -> "a", "b" -> "a", "c" -> "a", "z" -> "z"))
  }

  test("simhash: near-identical docs land within small hamming distance") {
    val d = docs.select(col("doc_id"), col("text")).limit(50)
    val corpus = d.unionByName(d.select(
      (col("doc_id") + 100000L).as("doc_id"),
      concat(col("text"), lit(" tail")).as("text")))
    val sig = TextFunctions.simhash(corpus, "doc_id", col("text"))
    val a = sig.select(col("doc_id").as("id_a"), col("simhash").as("sig_a"))
    val b = sig.select(col("doc_id").as("id_b"), col("simhash").as("sig_b"))
    val joined = a.join(b, col("id_b") === col("id_a") + 100000L)
      .select(TextFunctions.hamming(col("sig_a"), col("sig_b")).as("d"))
    val avg = joined.agg(org.apache.spark.sql.functions.avg("d")).as[Double].head()
    assert(avg <= 3.0, s"avg hamming distance of near-identical docs was $avg")
  }

  test("wordNGrams yields len-n+1 shingles and NULL for sub-n docs") {
    val df = Seq((1L, "a b c d"), (2L, "x y")).toDF("id", "t")
    val sh = df.select(col("id"), explode(Shingles.wordNGrams(col("t"), 3)).as("s"))
    assert(sh.filter(col("id") === 1).count() == 2)
    assert(sh.filter(col("id") === 1 && col("s").isNull).count() == 0)
    assert(sh.filter(col("id") === 2).collect().map(_.isNullAt(1)).toSeq == Seq(true))
  }

  test("simhashCandidates banding is lossless vs all-pairs (pigeonhole, hamming<=3)") {
    val d = docs.select(col("doc_id"), col("text"))
    val corpus = d.unionByName(d.filter(col("doc_id") % 4 === 0).select(
      (col("doc_id") + 100000L).as("doc_id"),
      concat(col("text"), lit(" tail")).as("text")))
    // ground truth: brute-force all-pairs hamming over the signatures
    val sig = corpus.filter(col("text").isNotNull)
      .select(col("doc_id"), TextFunctions.whitespaceTokens(col("text")).as("__tok"))
      .filter(size(col("__tok")) > 0)
      .select(col("doc_id"), TextFunctions.simhash64Col(col("__tok")).as("sig"))
    val a = sig.select(col("doc_id").as("id_a"), col("sig").as("sa"))
    val b = sig.select(col("doc_id").as("id_b"), col("sig").as("sb"))
    val brute = a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("int").as("hamming"))
      .filter(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // banded path with an effectively-unbounded bucket cap = exact recall
    val banded = Dedup.simhashCandidates(corpus, "doc_id", col("text"),
        maxHamming = 3, maxBucket = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute && banded.nonEmpty)
    // every planted tail-copy pair qualifies somewhere in the set
    assert(banded.exists { case (x, y, _) => y - x == 100000L })
  }

  test("simhashCandidates rejects maxHamming >= bands (banding would lose pairs)") {
    intercept[IllegalArgumentException] {
      Dedup.simhashCandidates(docs, "doc_id", col("text"), maxHamming = 4, bands = 4)
    }
  }

  test("exactNew admits only unseen content, collapsing in-batch dups first") {
    val reference = Seq((1L, "seen before"), (2L, "also seen")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "seen before"),   // rejected: in reference
      (11L, "brand new"),     // admitted
      (12L, "brand new"),     // in-batch dup of 11 → collapsed away
      (13L, "another fresh")) // admitted
      .toDF("doc_id", "text")
    val out = Dedup.exactNew(batch, reference, "doc_id", col("text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(11L, 13L))
  }

  test("exactNewBloom equals exactNew exactly, and the prefilter thins the reference") {
    val d = docs.select(col("doc_id"), col("text"))
    val reference = d.filter(col("doc_id") % 2 === 0)
    val batch = d.filter(col("doc_id") % 2 === 1)
      .unionByName(d.filter(col("doc_id") % 6 === 0)
        .select((col("doc_id") + 800000L).as("doc_id"), col("text")))
    val viaBloom = Dedup.exactNewBloom(batch, reference, "doc_id", col("text"))
    val viaSet = Dedup.exactNew(batch, reference, "doc_id", col("text"))
    assert(viaBloom.exceptAll(viaSet).isEmpty && viaSet.exceptAll(viaBloom).isEmpty)
    // tiny filter, disjoint probe content: nearly everything is rejected
    // by the bits alone (each key tests 5 bits of 2^20 — FP ~ 0)
    val disjointRef = d.select((col("doc_id") + 700000L).as("doc_id"),
      concat(lit("unrelated "), col("text")).as("text"))
    val none = Dedup.exactNewBloom(batch, disjointRef, "doc_id", col("text"))
    assert(none.count() == batch.select(md5(col("text"))).distinct().count())
  }

  test("lshNewCandidates pairs batch docs with reference near-dups only") {
    val d = docs.select(col("doc_id"), col("text"))
    val reference = d.filter(col("doc_id") % 2 === 0)
    // batch: tail-mutated copies of some reference docs + fresh docs
    val batch = reference.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"),
        concat(col("text"), lit(" near duplicate tail")).as("text"))
      .unionByName(Seq((600001L, "totally unrelated fresh content here today"))
        .toDF("doc_id", "text"))
    val pairs = Dedup.lshNewCandidates(batch, reference, "doc_id", col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // every planted copy finds its reference original
    val planted = batch.filter(col("doc_id") >= 500000L && col("doc_id") < 600000L)
      .count()
    val selfHits = pairs.count { case (b, ref) => b - 500000L == ref }
    assert(selfHits == planted, s"found $selfHits of $planted planted pairs")
    // batch ids only on the left, reference ids only on the right
    assert(pairs.forall { case (b, ref) => b >= 500000L && ref < 500000L })
    // the fresh doc pairs with nothing
    assert(!pairs.exists(_._1 == 600001L))
  }

  test("staged band index: probe == direct; append == restage; guard + compact + pruning") {
    val d = docs.select(col("doc_id"), col("text"))
    val reference = d.filter(col("doc_id") % 2 === 0)
    val batch = reference.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"),
        concat(col("text"), lit(" near duplicate tail")).as("text"))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    val want = norm(Dedup.lshNewCandidates(batch, reference, "doc_id", col("text")))
    // stage half + append half == the direct two-sided run
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    Dedup.stageBandIndex(reference.filter(col("doc_id") % 4 === 0),
      "doc_id", col("text"), dir)
    Dedup.appendBandIndex(reference.filter(col("doc_id") % 4 === 2),
      "doc_id", col("text"), dir)
    val staged = Dedup.lshNewCandidatesStaged(batch, "doc_id", col("text"), dir)
    assert(norm(staged) == want && want.nonEmpty)
    // the pruned bands scan carries partition filters on bkt
    val plan = staged.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .filter(_.metadata.get("Location").exists(_.contains("bands")))
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty),
      s"bands scan reads every partition:\n$plan")
    // the new-ids guard probes the doc-count-sized ids frame with
    // STATIC pruning to the batch's id buckets — never the
    // 8-rows-per-doc bands table (batch-proportional guard cost)
    val gids = batch.select(col("doc_id").as("ref_id")).distinct()
      .localCheckpoint(true)
    val guard = Dedup.bandIndexSeenIds(gids, dir, 16L)
    val gplan = guard.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    val gscans = gplan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .filter(_.metadata.get("Location").exists(_.contains("ids")))
    assert(gscans.nonEmpty && gscans.forall(_.partitionFilters.nonEmpty),
      s"ids guard scan reads every partition:\n$gplan")
    assert(guard.count() == 0, "disjoint batch must clear the guard")
    // an overlapping-id batch is refused before anything is written
    val before = spark.read.parquet(s"$dir/bands").count()
    val e = intercept[IllegalArgumentException] {
      Dedup.appendBandIndex(reference.limit(1), "doc_id", col("text"), dir)
    }
    assert(e.getMessage.contains("already-indexed"))
    assert(spark.read.parquet(s"$dir/bands").count() == before)
    // compaction: one file per bucket, probe-identical, count refreshed
    def maxFiles(): Int = {
      val root = new java.io.File(s"$dir/bands")
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("bkt="))
        .map(_.listFiles().count(_.getName.endsWith(".parquet"))).max
    }
    assert(maxFiles() > 1, "append should stack files in a touched bucket")
    Dedup.compactBandIndex(spark, dir)
    assert(maxFiles() == 1)
    assert(norm(Dedup.lshNewCandidatesStaged(batch, "doc_id", col("text"), dir))
      == want)
    val mf = graft.util.IndexManifest.read(spark, dir)
    // every signed reference doc counts once (short docs sign nothing)
    val signed = Dedup.minhashNarrow(reference, "doc_id", col("text"), 16).count()
    assert(mf.counts("n_docs") == signed)
    // a wrong-kind directory is refused by the manifest
    intercept[IllegalArgumentException] {
      Dedup.lshNewCandidatesStaged(batch, "doc_id", col("text"),
        java.nio.file.Files.createTempDirectory("nonidx").toString)
    }
    // a pre-ids layout (valid manifest, no ids/) is refused LOUDLY on
    // append — even with assumeNewIds, whose write would otherwise
    // CREATE a partial ids frame that silently disarms the guard —
    // and on compaction, which would otherwise die on a raw read
    def rmIds(): Unit = {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(s"$dir/ids"))
    }
    rmIds()
    val e2 = intercept[IllegalArgumentException] {
      Dedup.appendBandIndex(batch, "doc_id", col("text"), dir,
        assumeNewIds = true)
    }
    assert(e2.getMessage.contains("pre-ids"))
    val e3 = intercept[IllegalArgumentException] {
      Dedup.compactBandIndex(spark, dir)
    }
    assert(e3.getMessage.contains("pre-ids"))
    // probes need no ids frame: the pre-ids index still answers
    assert(norm(Dedup.lshNewCandidatesStaged(batch, "doc_id", col("text"),
      dir)) == want)
  }

  test("store-texts band index: bucket-pruned text fetch; appends carry texts; compact preserves") {
    val d = docs.select(col("doc_id"), col("text"))
    val reference = d.filter(col("doc_id") % 2 === 0)
    val dir = java.nio.file.Files.createTempDirectory("lshtexts").toString
    Dedup.stageBandIndex(reference.filter(col("doc_id") % 4 === 0),
      "doc_id", col("text"), dir, storeTexts = true)
    Dedup.appendBandIndex(reference.filter(col("doc_id") % 4 === 2),
      "doc_id", col("text"), dir)
    // texts are probe-invisible: the staged probe still equals the
    // direct two-sided run
    val batch = reference.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"),
        concat(col("text"), lit(" near duplicate tail")).as("text"))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    assert(norm(Dedup.lshNewCandidatesStaged(batch, "doc_id", col("text"), dir))
      == norm(Dedup.lshNewCandidates(batch, reference, "doc_id", col("text"))))
    // the fetch returns exactly the SIGNED requested docs' texts (an
    // unsigned short doc has no near-dup identity, hence no text row;
    // an unknown id returns nothing)
    val signed = Dedup.minhashNarrow(reference, "doc_id", col("text"), 16)
      .select("doc_id").as[Long].collect().toSet
    val someSigned = signed.toSeq.sorted.take(5)
    val want = reference.filter(col("doc_id").isin(someSigned: _*))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val ids = (someSigned :+ 999999999L)
      .toDF("ref_id").localCheckpoint(true)
    val got = Dedup.bandIndexTexts(ids, dir)
    assert(got.collect().map(r => (r.getLong(0), r.getString(1))).toSet == want)
    // the ids scan is statically pruned to the requested id buckets
    val plan = got.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .filter(_.metadata.get("Location").exists(_.contains("ids")))
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty),
      s"text fetch reads every id bucket:\n$plan")
    // the new-ids guard never reads the text payload: its scan prunes
    // to the ref_id/idb columns alone
    val guard = Dedup.bandIndexSeenIds(ids, dir, 16L)
    val gplan = guard.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    val gscans = gplan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .filter(_.metadata.get("Location").exists(_.contains("ids")))
    assert(gscans.nonEmpty &&
      gscans.forall(!_.schema.fieldNames.contains("text")),
      s"guard scan reads text bytes:\n$gplan")
    // crash-recovery duplicate ids rows (assumeNewIds re-append)
    // collapse on compact with the text preserved — one row per id
    val dup = reference.filter(col("doc_id") === someSigned.head)
    Dedup.appendBandIndex(dup, "doc_id", col("text"), dir, assumeNewIds = true)
    Dedup.compactBandIndex(spark, dir)
    val one = Dedup.bandIndexTexts(
      Seq(someSigned.head).toDF("ref_id").localCheckpoint(true), dir)
    assert(one.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == want.toSeq.filter(_._1 == someSigned.head))
    assert(graft.util.IndexManifest.read(spark, dir).counts("n_docs")
      == signed.size)
    // fetch still exact after compact
    assert(Dedup.bandIndexTexts(ids, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == want)
    // a plain (no-texts) index refuses the fetch loudly
    val plain = java.nio.file.Files.createTempDirectory("lshplain").toString
    Dedup.stageBandIndex(reference, "doc_id", col("text"), plain)
    val e = intercept[IllegalArgumentException] {
      Dedup.bandIndexTexts(ids, plain)
    }
    assert(e.getMessage.contains("storeTexts"))
  }

  test("migrateBandIndexTexts: legacy index adopts store-texts, identical to a fresh stage; doc set guarded") {
    val d = docs.select(col("doc_id"), col("text"))
    val corpus = d.filter(col("doc_id") % 4 === 0)
    val admitted = d.filter(col("doc_id") % 4 === 2) // the gate's out rows
    val dir = java.nio.file.Files.createTempDirectory("lshmigr").toString
    // a LEGACY deployment: staged text-less, then admitted batches
    // appended by the gate
    Dedup.stageBandIndex(corpus, "doc_id", col("text"), dir,
      numHashes = 16, rowsPerBand = 2, shingleWords = 3, buckets = 8)
    Dedup.appendBandIndex(admitted, "doc_id", col("text"), dir)
    // guard 1: migrating with the corpus alone would DROP the admitted
    // ids' state — refused before anything is touched, index intact
    val e1 = intercept[IllegalArgumentException] {
      Dedup.migrateBandIndexTexts(corpus.localCheckpoint(true), "doc_id",
        col("text"), dir)
    }
    assert(e1.getMessage.contains("missing from the supplied frame"))
    assert(graft.util.IndexManifest.read(spark, dir)
      .params.get("store_texts").contains("0"), "refusal must not mutate")
    // guard 2: a frame with signing docs the index never saw would
    // silently WIDEN the doc set — refused too
    val tooWide = corpus.unionByName(admitted)
      .unionByName(d.filter(col("doc_id") % 4 === 1))
    val e2 = intercept[IllegalArgumentException] {
      Dedup.migrateBandIndexTexts(tooWide.localCheckpoint(true), "doc_id",
        col("text"), dir)
    }
    assert(e2.getMessage.contains("never saw"))
    // the id_col contract is checked like every band verb
    intercept[IllegalArgumentException] {
      Dedup.migrateBandIndexTexts(
        corpus.withColumnRenamed("doc_id", "other_id"), "other_id",
        col("text"), dir)
    }
    // the exact doc set (staged corpus UNION admitted out) migrates
    val frame = corpus.unionByName(admitted).localCheckpoint(true)
    Dedup.migrateBandIndexTexts(frame, "doc_id", col("text"), dir)
    val mf = graft.util.IndexManifest.read(spark, dir)
    assert(mf.params.get("store_texts").contains("1"))
    assert(mf.params.get("buckets").contains("8") &&
      mf.params.get("num_hashes").contains("16"), "recipe preserved")
    // identical to a FRESH storeTexts stage of the same frame: both
    // sublayouts' row sets match exactly, so every probe, guard and
    // census is unchanged by construction
    val fresh = java.nio.file.Files.createTempDirectory("lshfresh").toString
    Dedup.stageBandIndex(frame, "doc_id", col("text"), fresh,
      numHashes = 16, rowsPerBand = 2, shingleWords = 3, buckets = 8,
      storeTexts = true)
    def bandRows(ix: String) = spark.read.parquet(s"$ix/bands")
      .select(col("ref_id"), col("band"), col("bsig"),
        col("bkt").cast("long")) // partition cols re-infer as int
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .sorted.toSeq
    def idRows(ix: String) = spark.read.parquet(s"$ix/ids")
      .select(col("ref_id"), col("text"), col("idb").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq
    assert(bandRows(dir) == bandRows(fresh) && idRows(dir) == idRows(fresh))
    // the verify fetch now works from the index itself...
    val someId = idRows(dir).head._1
    val fetched = Dedup.bandIndexTexts(
      Seq(someId).toDF("ref_id").localCheckpoint(true), dir)
    assert(fetched.collect().map(_.getLong(0)).toSeq == Seq(someId))
    // ...and the gate REFUSES a redundant refTexts on the migrated
    // index (the two-authorities guard — fires at setup, pre-stream)
    val e3 = intercept[IllegalArgumentException] {
      graft.streaming.DocStream.admitNearStream(frame, "doc_id", "text",
        dir, "/tmp/unused-out", "/tmp/unused-ckpt",
        verifyJaccard = Some(0.8), refTexts = Some(frame))
    }
    assert(e3.getMessage.contains("two text authorities"))
    graft.util.LocalCkpt.release(frame)
  }

  test("staged fingerprints: probe == direct; append folds in; compact dedups; pruning") {
    val d = docs.select(col("doc_id"), col("text"))
    val reference = d.filter(col("doc_id") % 2 === 0)
    val batch = d.filter(col("doc_id") % 2 === 1)
      .unionByName(d.filter(col("doc_id") % 6 === 0)
        .select((col("doc_id") + 800000L).as("doc_id"), col("text")))
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = ids(Dedup.exactNew(batch, reference, "doc_id", col("text")))
    // stage half + append half == the direct two-sided run
    val dir = java.nio.file.Files.createTempDirectory("fpidx").toString
    Dedup.stageFingerprints(reference.filter(col("doc_id") % 4 === 0),
      col("text"), dir, buckets = 8)
    Dedup.appendFingerprints(reference.filter(col("doc_id") % 4 === 2),
      col("text"), dir)
    val staged = Dedup.exactNewStaged(batch, "doc_id", col("text"), dir)
    assert(ids(staged) == want && want.nonEmpty)
    // the pruned fp scan carries partition filters on fpb (inspected
    // through the LAZY probe frame — exactNewStaged's result is
    // eagerly materialized, so its own plan is an RDD scan)
    val bh = batch.select(col("doc_id"), col("text").as("__text"),
      md5(col("text")).as("__ch")).localCheckpoint(true)
    val seen = Dedup.fingerprintSeen(bh, dir, 8L, forceBroadcast = true)
    val plan = seen.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .filter(_.metadata.get("Location").exists(_.contains("fp")))
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty),
      s"fp scan reads every partition:\n$plan")
    // id-free append is idempotent at the PROBE (duplicate hash rows
    // are semi-join-invisible), and compaction removes them physically
    Dedup.appendFingerprints(reference.filter(col("doc_id") % 4 === 2),
      col("text"), dir)
    assert(ids(Dedup.exactNewStaged(batch, "doc_id", col("text"), dir)) == want)
    val distinctFp = spark.read.parquet(s"$dir/fp").select("ch")
      .distinct().count()
    assert(spark.read.parquet(s"$dir/fp").count() > distinctFp,
      "the duplicate append should stack duplicate hash rows")
    Dedup.compactFingerprints(spark, dir)
    assert(spark.read.parquet(s"$dir/fp").count() == distinctFp)
    assert(ids(Dedup.exactNewStaged(batch, "doc_id", col("text"), dir)) == want)
    val mf = graft.util.IndexManifest.read(spark, dir)
    assert(mf.counts("n_fingerprints") == distinctFp)
    // admitting a batch then appending its fingerprints rejects a replay
    Dedup.appendFingerprints(
      Dedup.exactNewStaged(batch, "doc_id", col("text"), dir),
      col("text"), dir)
    assert(ids(Dedup.exactNewStaged(batch, "doc_id", col("text"), dir)).isEmpty)
    // a wrong-kind directory is refused by the manifest
    intercept[IllegalArgumentException] {
      Dedup.exactNewStaged(batch, "doc_id", col("text"),
        java.nio.file.Files.createTempDirectory("nonfp").toString)
    }
  }

  test("staging a corpus where nothing signs a band succeeds and stays appendable") {
    // every doc below the shingle window (or empty): the single-pass
    // writer emits ZERO rows for both sublayouts — staging must still
    // produce a valid, probeable, appendable index (the read-back of
    // the just-written bands parquet used to die on schema inference)
    val dir = java.nio.file.Files.createTempDirectory("lshempty").toString
    val unsigned = Seq((1L, "too short"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    Dedup.stageBandIndex(unsigned, "doc_id", col("text"), dir)
    val batch = docs.select(col("doc_id"), col("text")).limit(20)
    assert(Dedup.lshNewCandidatesStaged(batch, "doc_id", col("text"), dir)
      .count() == 0)
    // a signing append onto the empty layout works and becomes probeable
    Dedup.appendBandIndex(batch, "doc_id", col("text"), dir)
    val copies = batch.select((col("doc_id") + 900000L).as("doc_id"), col("text"))
    assert(Dedup.lshNewCandidatesStaged(copies, "doc_id", col("text"), dir)
      .count() > 0)
    // the fingerprint kind has the same degenerate corner: an all-null
    // corpus stages an empty fp/ that must probe as "nothing seen"
    val fpDir = java.nio.file.Files.createTempDirectory("fpempty").toString
    Dedup.stageFingerprints(
      Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      col("text"), fpDir, buckets = 4)
    val direct = Dedup.exactNew(batch, docs.filter(lit(false)),
      "doc_id", col("text")).count()
    assert(direct > 0 && Dedup.exactNewStaged(batch, "doc_id", col("text"),
      fpDir).count() == direct)
  }

  test("band append crash window: stranded ids fail closed, recovery converges") {
    // the single-pass append moves ids into place BEFORE bands; a crash
    // between the moves leaves ids rows whose band rows never landed.
    // Pin the contract: a retry refuses loudly (fail closed), explicit
    // assumeNewIds recovery + compaction converge to the restage state.
    val d = docs.select(col("doc_id"), col("text"))
    val ref = d.filter(col("doc_id") % 4 === 0)
    val batch = d.filter(col("doc_id") % 4 === 2)
    val probe = ref.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 700000L).as("doc_id"),
        concat(col("text"), lit(" crash window tail")).as("text"))
    val dir = java.nio.file.Files.createTempDirectory("bandcrash").toString
    Dedup.stageBandIndex(ref, "doc_id", col("text"), dir)
    def bandFiles(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/bands"))
        .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSet
    }
    val before = bandFiles()
    Dedup.appendBandIndex(batch, "doc_id", col("text"), dir)
    // the append leaves no staging residue behind
    assert(!new java.io.File(s"$dir/_append.tmp").exists())
    val appended = bandFiles() diff before
    assert(appended.nonEmpty)
    // simulate the crash window: ids landed, this append's bands did not
    appended.foreach(f => assert(new java.io.File(f).delete()))
    val e = intercept[IllegalArgumentException] {
      Dedup.appendBandIndex(batch, "doc_id", col("text"), dir)
    }
    assert(e.getMessage.contains("already-indexed"))
    // explicit recovery: re-append under upstream proof, then compact
    // (dedups the duplicate ids rows) — probe-identical to a restage
    Dedup.appendBandIndex(batch, "doc_id", col("text"), dir,
      assumeNewIds = true)
    Dedup.compactBandIndex(spark, dir)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    val want = norm(Dedup.lshNewCandidates(probe, ref.unionByName(batch),
      "doc_id", col("text")))
    assert(norm(Dedup.lshNewCandidatesStaged(probe, "doc_id", col("text"),
      dir)) == want && want.nonEmpty)
    // compaction restored one ids row per signed doc
    val mf = graft.util.IndexManifest.read(spark, dir)
    assert(spark.read.parquet(s"$dir/ids").count() == mf.counts("n_docs"))
  }

  test("band append crash mid-bands-move: partially-landed buckets converge via compact") {
    // the harder crash shape: SOME of the append's bands files moved
    // before the crash. The assumeNewIds recovery re-appends everything,
    // so the already-moved buckets carry their rows TWICE (double-counted
    // in the maxBucket census) until compactBandIndex's distinct
    // collapses the copies — the documented recovery is assumeNewIds
    // FOLLOWED BY compact, and the result must equal a clean restage.
    val d = docs.select(col("doc_id"), col("text"))
    val ref = d.filter(col("doc_id") % 4 === 0)
    val batch = d.filter(col("doc_id") % 4 === 2)
    val probe = ref.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 700000L).as("doc_id"),
        concat(col("text"), lit(" partial move tail")).as("text"))
    val dir = java.nio.file.Files.createTempDirectory("bandpartial").toString
    Dedup.stageBandIndex(ref, "doc_id", col("text"), dir)
    def bandFiles(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/bands"))
        .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSet
    }
    val before = bandFiles()
    Dedup.appendBandIndex(batch, "doc_id", col("text"), dir)
    val appended = (bandFiles() diff before).toSeq.sorted
    assert(appended.size >= 2, "need >= 2 buckets to simulate a partial move")
    // crash window: HALF this append's bucket files landed, half did not
    appended.drop(appended.size / 2)
      .foreach(f => assert(new java.io.File(f).delete()))
    val e = intercept[IllegalArgumentException] {
      Dedup.appendBandIndex(batch, "doc_id", col("text"), dir)
    }
    assert(e.getMessage.contains("already-indexed"))
    Dedup.appendBandIndex(batch, "doc_id", col("text"), dir,
      assumeNewIds = true)
    Dedup.compactBandIndex(spark, dir)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    val want = norm(Dedup.lshNewCandidates(probe, ref.unionByName(batch),
      "doc_id", col("text")))
    assert(norm(Dedup.lshNewCandidatesStaged(probe, "doc_id", col("text"),
      dir)) == want && want.nonEmpty)
    // the duplicated buckets' rows collapsed: bands == a clean restage
    val clean = java.nio.file.Files.createTempDirectory("bandclean").toString
    Dedup.stageBandIndex(ref.unionByName(batch), "doc_id", col("text"), clean)
    assert(spark.read.parquet(s"$dir/bands").count() ==
      spark.read.parquet(s"$clean/bands").count())
  }

  test("admission probes: shuffle path (cap=0) equals the broadcast path") {
    // the adaptive discipline of exactNewStaged / bandIndexSeenIds: a
    // bulk backfill above the broadcast cap must take shuffle joins and
    // return the SAME rows. cap=0 forces every row down the bulk path.
    val d = docs.select(col("doc_id"), col("text"))
    val reference = d.filter(col("doc_id") % 2 === 0)
    val batch = d.filter(col("doc_id") % 2 === 1)
      .unionByName(d.filter(col("doc_id") % 6 === 0)
        .select((col("doc_id") + 800000L).as("doc_id"), col("text")))
    val dir = java.nio.file.Files.createTempDirectory("fpadapt").toString
    Dedup.stageFingerprints(reference, col("text"), dir, buckets = 8)
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val viaBroadcast = Dedup.exactNewStaged(batch, "doc_id", col("text"), dir)
    val viaShuffle = Dedup.exactNewStaged(batch, "doc_id", col("text"), dir,
      broadcastCap = 0L)
    assert(ids(viaShuffle) == ids(viaBroadcast) && ids(viaShuffle).nonEmpty)
    // band-id guard: both strategies see the same already-indexed ids,
    // and the bulk path's plan carries NO forced-broadcast hint (its
    // joins are free to shuffle co-partitioned on the id)
    val bdir = java.nio.file.Files.createTempDirectory("bandadapt").toString
    Dedup.stageBandIndex(reference, "doc_id", col("text"), bdir)
    val probeIds = reference.limit(20)
      .select(col("doc_id").as("ref_id")).distinct()
      .unionByName(Seq(999999999L).toDF("ref_id"))
      .localCheckpoint(true)
    def guard(cap: Long) = Dedup.bandIndexSeenIds(probeIds, bdir, 16L,
      broadcastCap = cap)
    def hinted(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collectFirst {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
            if j.hint.leftHint.exists(_.strategy.isDefined) ||
              j.hint.rightHint.exists(_.strategy.isDefined) => j
      }.isDefined
    assert(hinted(guard(Dedup.AdmitBroadcastCap)) && !hinted(guard(0L)))
    def seenIds(cap: Long): Seq[Long] =
      guard(cap).collect().map(_.getLong(0)).sorted.toSeq
    val viaB = seenIds(Dedup.AdmitBroadcastCap)
    assert(seenIds(0L) == viaB && viaB.nonEmpty &&
      !viaB.contains(999999999L))
  }

  test("contaminated flags docs embedding a benchmark n-gram, not clean docs") {
    val words = (1 to 40).map(i => s"w$i").mkString(" ")
    val benchText = (1 to 15).map(i => s"bench$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$words $benchText trailing content here"), // embeds all 15 bench words
      (2L, words),                                      // clean
      (3L, s"prefix $benchText"),                       // embeds too
      (4L, "short doc")).toDF("doc_id", "text")         // < 13 words: no grams
    val bench = Seq((100L, benchText)).toDF("bench_id", "text")
    val out = Dedup.contaminated(corpus, "doc_id", bench, "bench_id", col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set(1L, 3L))
    // a 15-word benchmark doc has 3 distinct 13-grams; both hits embed
    // the full text, so all 3 grams match
    assert(out(1L) == ((3L, 100L)) && out(3L) == ((3L, 100L)))
  }

  test("boilerplateShare measures the repeated-phrase fraction per doc") {
    val footer = "this site uses cookies to work" // 6 words → 2 5-gram windows
    val corpus = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta $footer"),
      (2L, s"one two three four five six seven $footer"),
      (3L, s"red orange yellow green blue indigo $footer"),
      (4L, "totally unique content with no repeats at all"),
      (5L, "too short")).toDF("doc_id", "text") // < 5 words: no grams
    val out = Dedup.boilerplateShare(corpus, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // only the 2 windows fully inside the 6-word footer repeat in all
    // three docs (df=3 ≥ minDf); windows straddling the doc-specific
    // prefix do not. doc 1: 6+6 words → 8 windows, 2 boilerplate.
    assert(out(1L) == ((8L, 2L, 1000L * 2 / 8)))
    assert(out(2L) == ((9L, 2L, 1000L * 2 / 9))) // 13 words → 9 windows
    assert(out(3L)._2 == 2L)
    assert(out(4L) == ((4L, 0L, 0L))) // 8 words → 4 windows, none repeated
    assert(out(5L) == ((0L, 0L, 0L)))
  }

  test("dupSpans merges overlapping duplicated grams into maximal spans") {
    val corpus = Seq(
      (1L, "w1 w2 w3 junka w4 w5 w6"),
      (2L, "w1 w2 w3 junkb w4 w5 w6"),
      (3L, "p q r s p q r s"), // within-doc repeat: one whole-doc span
      (4L, "totally unique text nothing repeats here"),
      (5L, "x y")).toDF("doc_id", "text") // sub-n doc: no grams
    val out = Dedup.dupSpans(corpus, "doc_id", col("text"), n = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // docs 1/2 share "w1 w2 w3" (pos 0) and "w4 w5 w6" (pos 4): the gap
    // (4 > n=3) keeps them as TWO spans of 3 tokens each
    assert(out(1L) == ((7L, 2L, 6L, 1000L * 6 / 7)))
    assert(out(2L) == ((7L, 2L, 6L, 1000L * 6 / 7)))
    // doc 3's repeat duplicates grams at pos 0,1,4,5 — all gaps ≤ n, so
    // they merge into ONE span covering the whole doc: 5 - 0 + 3 = 8
    assert(out(3L) == ((8L, 1L, 8L, 1000L)))
    assert(out(4L) == ((6L, 0L, 0L, 0L)))
    assert(out(5L) == ((2L, 0L, 0L, 0L)))
  }

  test("containmentPairs finds embedded quotes that Jaccard dilutes") {
    // each line carries its own vocabulary so the source's shingle set
    // is ~5× the quote's — the asymmetric shape containment is for
    val srcLines = (1 to 5).map(i =>
      s"line $i " + (1 to 20).map(j => s"w${i}x$j").mkString(" "))
    val src = srcLines.mkString("\n")
    val quote = srcLines.slice(1, 3).mkString("\n") // lines 2-3 embedded
    val corpus = (Seq(
      (1L, src), (2L, quote),
      (3L, "totally unrelated content\nwith its own lines")) ++
      // 5 docs sharing one line: above maxBucket=3, bucket dropped
      (10L to 14L).map(i => (i, s"shared boilerplate line\nunique $i")))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(corpus, "doc_id", col("text"),
      minPermille = 500, maxBucket = 3)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    // the quote pair survives with high containment...
    assert(rows.contains((1L, 2L)), s"expected (1,2) in ${rows.keySet}")
    assert(rows((1L, 2L)) >= 900L)
    // ...while its symmetric Jaccard is diluted by the source's tail
    val jac = Dedup.jaccardVerify(corpus,
        Seq((1L, 2L)).toDF("id_a", "id_b"), "doc_id", col("text"))
      .collect().head.getAs[Double]("jaccard")
    assert(jac < 0.5, s"jaccard should be diluted, got $jac")
    // the over-cap boilerplate bucket produced no pairs
    assert(!rows.keySet.exists { case (a, b) => a >= 10L && b <= 14L })
  }

  test("jaccardVerify: parquet-staging path returns the persist path's exact rows") {
    val corpus = Seq(
      (1L, (1 to 30).map(i => s"w$i").mkString(" ")),
      (2L, (1 to 30).map(i => s"w$i").mkString(" ") + " tail"),
      (3L, "totally different content with many words here")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val dir = java.nio.file.Files.createTempDirectory("jac-stage").toString
    try {
      def run(staging: Option[String]) = Dedup.jaccardVerify(corpus, pairs,
          "doc_id", col("text"), stagingDir = staging).collect().toSet
      assert(run(Some(dir)) == run(None))
      assert(new java.io.File(s"$dir/jaccard_ssets").exists())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("containmentPairs: parquet-staging path returns the persist path's exact rows") {
    val srcLines = (1 to 5).map(i =>
      s"line $i " + (1 to 20).map(j => s"w${i}x$j").mkString(" "))
    val corpus = Seq(
      (1L, srcLines.mkString("\n")),
      (2L, srcLines.slice(1, 3).mkString("\n")),
      (3L, "totally unrelated content\nwith its own lines"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("cont-stage").toString
    try {
      def run(staging: Option[String]) = Dedup.containmentPairs(corpus,
          "doc_id", col("text"), minPermille = 500, stagingDir = staging)
        .collect().toSet
      assert(run(Some(dir)) == run(None))
      assert(new java.io.File(s"$dir/containment_ssets").exists())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("dupSpans matches a sequential reference on real docs with planted copies") {
    val d = docs.select(col("doc_id"), col("text"))
    val corpus = d.unionByName(
      d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"), col("text")))
    val n = 13
    val rows = corpus.collect().map(r => r.getLong(0) ->
      Option(r.getString(1)).map(_.toLowerCase.split(" ", -1).take(4096))
        .getOrElse(Array.empty[String]))
    // sequential reference: global occurrence census → dup positions →
    // island merge (gap > n starts a new span)
    val occ = scala.collection.mutable.HashMap.empty[String, Int]
    val gramsOf = rows.toMap.view.mapValues { w =>
      (0 to math.max(w.length - n, 0)).filter(_ + n <= w.length)
        .map(i => w.slice(i, i + n).mkString(" "))
    }.toMap
    gramsOf.values.foreach(_.foreach(g => occ(g) = occ.getOrElse(g, 0) + 1))
    val expect = rows.map { case (id, w) =>
      val dupPos = gramsOf(id).zipWithIndex.collect {
        case (g, p) if occ(g) >= 2 => p
      }
      var spans = List.empty[(Int, Int)] // (first, last) gram starts
      dupPos.foreach { p =>
        spans match {
          case (f, l) :: rest if p - l <= n => spans = (f, p) :: rest
          case _ => spans = (p, p) :: spans
        }
      }
      val dupTokens = spans.map { case (f, l) => l - f + n }.sum
      val permille = if (w.nonEmpty) 1000L * dupTokens / w.length else 0L
      id -> ((w.length.toLong, spans.size.toLong, dupTokens.toLong, permille))
    }.toMap
    val got = Dedup.dupSpans(corpus, "doc_id", col("text"), n = n)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect)
  }
}
