package graft.ml

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.load(spark, sf0001, "embeddings")

  private def quantized(n: Int): Map[Long, IndexedSeq[Long]] =
    emb.filter(col("vec_id") < n)
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
      .as[(Long, Array[Long])].collect()
      .map { case (id, q) => id -> q.toIndexedSeq }.toMap

  test("pqCodebook slices the ksub lowest-id vectors into m subspaces") {
    val book = Similarity.pqCodebook(emb, "vec_id", "embedding", m = 4, ksub = 8)
    val base = quantized(8)
    assert(book.size == 4 && book.forall(_.size == 8))
    val dims = base(0L).size
    val sub = dims / 4
    for (j <- 0 until 4; c <- 0 until 8)
      assert(book(j)(c) == base(c.toLong).slice(j * sub, (j + 1) * sub))
  }

  test("pqTopK adist matches a driver-side encode + ADC reconstruction") {
    val corpus = emb.filter(col("vec_id") < 60)
    val queries = corpus.filter(col("vec_id") < 5)
    val m = 4; val ksub = 8
    val book = Similarity.pqCodebook(corpus, "vec_id", "embedding", m, ksub)
    val sub = book.head.head.size
    val base = quantized(60)
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // driver-side encode: per subspace, the first min-distance codeword
    def codeOf(v: IndexedSeq[Long], j: Int): Int = {
      val s = v.slice(j * sub, (j + 1) * sub)
      val ds = book(j).map(c => d2(s, c))
      ds.indexOf(ds.min)
    }
    val got = Similarity.pqTopK(queries, corpus, "vec_id", "embedding",
        k = 3, m = m, ksub = ksub)
      .select("query_id", "neighbor_id", "adist", "rank")
      .as[(Long, Long, Long, Int)].collect()
    assert(got.length == 5 * 3)
    got.foreach { case (q, n, adist, _) =>
      val want = (0 until m).map { j =>
        d2(base(q).slice(j * sub, (j + 1) * sub), book(j)(codeOf(base(n), j)))
      }.sum
      assert(adist == want, s"query $q neighbor $n")
    }
    // ranks are 1..k ascending in adist per query
    got.groupBy(_._1).values.foreach { rows =>
      val byRank = rows.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1 to 3))
      assert(byRank.map(_._3).toSeq == byRank.map(_._3).sorted.toSeq)
    }
  }

  test("salted two-level PQ top-k equals the single-window plan") {
    val corpus = emb.filter(col("vec_id") < 100)
    val queries = corpus.filter(col("vec_id") < 5)
    def run(salts: Int) = Similarity.pqTopK(queries, corpus, "vec_id",
        "embedding", k = 4, m = 4, ksub = 8, salts = salts)
      .select("query_id", "rank", "neighbor_id", "adist")
      .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(run(1) == run(16))
  }

  test("ivfPqTopK with nprobe = numCentroids degenerates to pqTopK") {
    val corpus = emb.filter(col("vec_id") < 100)
    val queries = corpus.filter(col("vec_id") < 5)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id", "adist")
        .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val full = norm(Similarity.ivfPqTopK(queries, corpus, "vec_id",
      "embedding", k = 3, numCentroids = 4, nprobe = 4, m = 4, ksub = 8))
    val pq = norm(Similarity.pqTopK(queries, corpus, "vec_id",
      "embedding", k = 3, m = 4, ksub = 8))
    assert(full == pq)
  }

  test("ivfPqTopK scores only candidates from probed lists") {
    val corpus = emb.filter(col("vec_id") < 100)
    val queries = corpus.filter(col("vec_id") < 5)
    val cents = Similarity.ivfCentroids(corpus, "vec_id", "embedding", 4)
    // every returned neighbor must live in one of its query's 2 probed lists
    val probed = queries
      .select(col("vec_id").as("query_id"),
        Similarity.ivfProbes(Similarity.quantize(col("embedding")), cents, 2)
          .as("lists"))
    val asgn = corpus.select(col("vec_id").as("neighbor_id"),
      Similarity.ivfAssign(Similarity.quantize(col("embedding")), cents)
        .as("list"))
    val out = Similarity.ivfPqTopK(queries, corpus, "vec_id", "embedding",
      k = 3, numCentroids = 4, nprobe = 2, m = 4, ksub = 8)
    val bad = out.join(probed, Seq("query_id")).join(asgn, Seq("neighbor_id"))
      .filter(!array_contains(col("lists"), col("list")))
    assert(bad.count() == 0)
  }

  test("staged IVF-PQ index matches the direct scan and prunes partitions") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val corpus = emb.filter(col("vec_id") < 100)
    val queries = corpus.filter(col("vec_id") < 2)
    val dir = java.nio.file.Files.createTempDirectory("pqidx").toString
    Similarity.stageIvfPq(corpus, "vec_id", "embedding",
      numCentroids = 8, m = 4, ksub = 8, dir = dir)
    val staged = Similarity.stagedIvfPqTopK(spark, dir, queries,
      "vec_id", "embedding", k = 3, nprobe = 2)
    val direct = Similarity.ivfPqTopK(queries, corpus, "vec_id", "embedding",
      k = 3, numCentroids = 8, nprobe = 2, m = 4, ksub = 8)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id", "adist")
        .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(norm(staged) == norm(direct))
    // static pruning: the codes scan carries a partition filter on `list`
    val plan = staged.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val codeScans = plan.collect { case s: FileSourceScanExec => s }
      .filter(_.metadata.get("Location").exists(_.contains("codes")))
    assert(codeScans.nonEmpty, s"no codes scan in:\n$plan")
    assert(codeScans.forall(_.partitionFilters.nonEmpty),
      s"codes scan reads every partition:\n$plan")
  }

  test("appendIvfPq against frozen metadata equals a full restage") {
    val corpus = emb.filter(col("vec_id") < 100)
    val queries = corpus.filter(col("vec_id") < 3)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id", "adist")
        .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val full = java.nio.file.Files.createTempDirectory("pqfull").toString
    Similarity.stageIvfPq(corpus, "vec_id", "embedding",
      numCentroids = 8, m = 4, ksub = 8, dir = full)
    val incr = java.nio.file.Files.createTempDirectory("pqincr").toString
    // first half carries the 8 lowest ids, so the frozen metadata is
    // identical to the full stage's — append must then change nothing
    Similarity.stageIvfPq(corpus.filter(col("vec_id") < 40), "vec_id",
      "embedding", numCentroids = 8, m = 4, ksub = 8, dir = incr)
    Similarity.appendIvfPq(corpus.filter(col("vec_id") >= 40), "vec_id",
      "embedding", dir = incr)
    val a = norm(Similarity.stagedIvfPqTopK(spark, full, queries,
      "vec_id", "embedding", k = 3, nprobe = 2))
    val b = norm(Similarity.stagedIvfPqTopK(spark, incr, queries,
      "vec_id", "embedding", k = 3, nprobe = 2))
    assert(a == b && a.nonEmpty)
  }

  test("appendIvfPq: a batch containing an already-indexed id is refused") {
    val corpus = emb.filter(col("vec_id") < 60)
    val dir = java.nio.file.Files.createTempDirectory("pqguard").toString
    Similarity.stageIvfPq(corpus.filter(col("vec_id") < 30), "vec_id",
      "embedding", numCentroids = 4, m = 4, ksub = 8, dir = dir)
    // one overlapping id poisons the whole batch — nothing is written
    val dirty = corpus.filter(col("vec_id") >= 30)
      .unionByName(corpus.filter(col("vec_id") === 5))
    val before = spark.read.parquet(s"$dir/codes").count()
    val e = intercept[IllegalArgumentException] {
      Similarity.appendIvfPq(dirty, "vec_id", "embedding", dir = dir)
    }
    assert(e.getMessage.contains("already-indexed"))
    assert(spark.read.parquet(s"$dir/codes").count() == before,
      "the refused append must leave the index untouched")
    // a genuinely new batch passes the guard unaided; the explicit
    // escape hatch skips the scan (caller asserts disjointness)
    Similarity.appendIvfPq(corpus.filter(col("vec_id") >= 30), "vec_id",
      "embedding", dir = dir)
    Similarity.appendIvfPq(
      emb.filter(col("vec_id") >= 60 && col("vec_id") < 63),
      "vec_id", "embedding", dir = dir, assumeNewIds = true)
    assert(spark.read.parquet(s"$dir/codes").count() == corpus.count() + 3)
  }

  test("compactIvfPq: one file per list, query-identical, count refreshed") {
    val corpus = emb.filter(col("vec_id") < 100)
    val queries = corpus.filter(col("vec_id") < 3)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id", "adist")
        .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val dir = java.nio.file.Files.createTempDirectory("pqcpt").toString
    Similarity.stageIvfPq(corpus.filter(col("vec_id") < 40), "vec_id",
      "embedding", numCentroids = 8, m = 4, ksub = 8, dir = dir)
    Similarity.appendIvfPq(
      corpus.filter(col("vec_id") >= 40 && col("vec_id") < 70),
      "vec_id", "embedding", dir = dir)
    Similarity.appendIvfPq(corpus.filter(col("vec_id") >= 70), "vec_id",
      "embedding", dir = dir)
    def filesPerList(): Map[String, Int] = {
      val root = new java.io.File(s"$dir/codes")
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("list="))
        .map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    }
    val before = norm(Similarity.stagedIvfPqTopK(spark, dir, queries,
      "vec_id", "embedding", k = 3, nprobe = 2))
    assert(filesPerList().values.max > 1, "appends should stack files")
    Similarity.compactIvfPq(spark, dir)
    assert(filesPerList().values.forall(_ == 1),
      s"compaction must leave one file per list: ${filesPerList()}")
    val after = norm(Similarity.stagedIvfPqTopK(spark, dir, queries,
      "vec_id", "embedding", k = 3, nprobe = 2))
    assert(after == before && after.nonEmpty)
    // the manifest count appends leave stale is refreshed to the truth
    val mf = graft.util.IndexManifest.read(spark, dir)
    assert(mf.counts("n_vectors") == corpus.count())
    assert(mf.kind == graft.util.IndexManifest.KindIvfPq)
  }

  test("pqTopK with ksub = corpus size degenerates to exact L2 top-k") {
    // every corpus vector is its own codeword → reconstruction is
    // exact → adist is the true quantized squared L2
    val n = 32
    val corpus = emb.filter(col("vec_id") < n)
    val queries = corpus.filter(col("vec_id") < 3)
    val base = quantized(n)
    def l2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val got = Similarity.pqTopK(queries, corpus, "vec_id", "embedding",
        k = 4, m = 4, ksub = n)
      .select("query_id", "rank", "neighbor_id", "adist")
      .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val want = (0L until 3L).flatMap { q =>
      (0L until n.toLong).filter(_ != q)
        .map(v => (v, l2(base(q), base(v))))
        .sortBy { case (v, d) => (d, v) }.take(4).zipWithIndex
        .map { case ((v, d), i) => (q, i + 1, v, d) }
    }
    assert(got == want)
  }

  test("pqTopK excludes self-pairs and respects the id filter") {
    val corpus = emb.filter(col("vec_id") < 40)
    val out = Similarity.pqTopK(corpus.filter(col("vec_id") < 3), corpus,
      "vec_id", "embedding", k = 2, m = 2, ksub = 4)
    assert(out.filter(col("query_id") === col("neighbor_id")).count() == 0)
    assert(out.filter(col("neighbor_id") >= 40).count() == 0)
  }

  private def fullProbeOf(dir: String,
      queries: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long, Long)] =
    Similarity.stagedIvfPqTopK(spark, dir, queries, "vec_id", "embedding",
        k = 5, nprobe = 4)
      .select("query_id", "rank", "neighbor_id", "adist")
      .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("reclusterIvfPq: drift re-balances lists; codes verbatim; full-probe results invariant") {
    import graft.util.IndexManifest
    def vec(f: Int => Float): Array[Float] = Array.tabulate(8)(f)
    def axis(i: Int) = vec(j => if (j == i) 1f else 0f)
    // anchors in the e7/e8 plane give subspace 3 real codewords, so a
    // drifted row's RECONSTRUCTION lands in the drifted region (with
    // all-zero subspace-3 codewords the reconstructions would collapse
    // to zero and no coarse geometry could separate them)
    val anchors = Seq(
      (4L, vec(j => if (j == 6) 1f else 0f)),
      (5L, vec(j => if (j == 7) 1f else 0f)),
      (6L, vec(j => if (j == 6) 0.7f else if (j == 7) 0.7f else 0f)),
      (7L, vec(j => if (j == 6) 0.9f else if (j == 7) 0.45f else 0f)))
    val staged = ((0 until 4).map(i => (i.toLong, axis(i))) ++ anchors)
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("pqrecl").toString
    Similarity.stageIvfPq(staged, "vec_id", "embedding",
      numCentroids = 4, m = 4, ksub = 8, dir = dir)
    // drift: 40 vectors on the e7–e8 arc — orthogonal to every frozen
    // centroid (the 4 axes), so all tie at dot 0 and pile into list 1
    val arc = (0 until 40).map { i =>
      val phi = i * (math.Pi / 2) / 39
      (100L + i, vec(j =>
        if (j == 6) math.cos(phi).toFloat
        else if (j == 7) math.sin(phi).toFloat else 0f))
    }.toDF("vec_id", "embedding")
    Similarity.appendIvfPq(arc, "vec_id", "embedding", dir = dir)
    val codesBefore = spark.read.parquet(s"$dir/codes").select("id", "code")
      .as[(Long, Seq[Int])].collect().toMap
    val queries = staged.filter(col("vec_id") < 2)
    val before = Similarity.listSkew(spark, dir)
    assert(before.maxList >= 40, s"drift did not pile up: $before")
    val resultsBefore = fullProbeOf(dir, queries)
    assert(resultsBefore.nonEmpty)
    Similarity.reclusterIvfPq(spark, dir, iters = 3)
    val after = Similarity.listSkew(spark, dir)
    assert(after.nVectors == before.nVectors && after.centroids == 4)
    assert(after.maxList < before.maxList && after.skew < before.skew,
      s"recluster did not rebalance: $before -> $after")
    val mf = IndexManifest.validate(spark, dir, IndexManifest.KindIvfPq)
    assert(mf.params.get("gen").contains("1") &&
      mf.counts.get("n_vectors").contains(48L))
    // codes carried VERBATIM — recluster moves rows between lists,
    // never re-encodes (the codebook is frozen, see the scaladoc)
    val codesAfter = spark.read.parquet(s"$dir/codes.g1").select("id", "code")
      .as[(Long, Seq[Int])].collect().toMap
    assert(codesAfter == codesBefore)
    // ADC scores are geometry-independent: a full probe (nprobe = all
    // lists) returns bit-identical results across the recluster
    assert(fullProbeOf(dir, queries) == resultsBefore)
    // every row is assigned under the PUBLISHED centroids to its
    // reconstruction's argmax list (vecs-free geometry consistency)
    val meta = spark.read.parquet(s"$dir/meta.g1").collect()
    val cents = meta.filter(_.getString(0) == "cent")
      .sortBy(_.getInt(2)).map(_.getSeq[Long](3)).toIndexedSeq
    val byJ = meta.filter(_.getString(0) == "code").groupBy(_.getInt(1))
    val book = (0 until byJ.size).map(j =>
      byJ(j).sortBy(_.getInt(2)).map(_.getSeq[Long](3).toIndexedSeq).toIndexedSeq)
    def dot(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    def recon(code: Seq[Int]): Seq[Long] =
      code.zipWithIndex.flatMap { case (c, j) => book(j)(c - 1) }
    val rows = spark.read.parquet(s"$dir/codes.g1").select("code", "list")
      .as[(Seq[Int], Int)].collect()
    assert(rows.length == 48 && rows.forall { case (code, l) =>
      val dots = cents.map(c => dot(recon(code), c))
      dots.indexOf(dots.max) + 1 == l
    })
    // compaction consolidates the LIVE generation, query-invisible
    Similarity.compactIvfPq(spark, dir)
    assert(fullProbeOf(dir, queries) == resultsBefore)
    // grace copy survives; appends keep working on the new geometry
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "codes")) &&
      fs.exists(new org.apache.hadoop.fs.Path(dir, "meta")))
    Similarity.appendIvfPq(Seq((500L, axis(3))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir = dir)
    assert(Similarity.listSkew(spark, dir).nVectors == 49L)
  }

  test("reclusterIvfPq crash windows and reapIvfGrace: stale generations cleared, grace reclaimed early") {
    import graft.util.IndexManifest
    val corpus = emb.filter(col("vec_id") < 40)
    val dir = java.nio.file.Files.createTempDirectory("pqreclcrash").toString
    Similarity.stageIvfPq(corpus, "vec_id", "embedding",
      numCentroids = 4, m = 4, ksub = 8, dir = dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(n: String) = new org.apache.hadoop.fs.Path(dir, n)
    // a recluster that died BEFORE its manifest flip leaves the live
    // index fully intact; nothing reads the half-written next gen
    fs.mkdirs(p("codes.g1")): Unit
    fs.mkdirs(p("meta.g1")): Unit
    fs.mkdirs(p("codes.__recluster__")): Unit
    assert(IndexManifest.validate(spark, dir, IndexManifest.KindIvfPq)
      .params.get("gen").isEmpty)
    val queries = corpus.filter(col("vec_id") < 2)
    val live = fullProbeOf(dir, queries)
    assert(live.nonEmpty)
    // reap clears the stale generation dirs too (a crashed flip is
    // "not the live pair"), live pair and manifest untouched
    assert(Similarity.reapIvfGrace(spark, dir) == Seq("codes.g1", "meta.g1"))
    assert(fullProbeOf(dir, queries) == live)
    Similarity.reclusterIvfPq(spark, dir, iters = 1)
    assert(!fs.exists(p("codes.__recluster__")))
    assert(IndexManifest.read(spark, dir).params.get("gen").contains("1"))
    // generation 0 survives as the read-grace copy until reaped
    assert(fs.exists(p("codes")) && fs.exists(p("meta")))
    assert(fullProbeOf(dir, queries) == live)
    assert(Similarity.reapIvfGrace(spark, dir) == Seq("codes", "meta"))
    assert(!fs.exists(p("codes")) && !fs.exists(p("meta")))
    // post-reap probes read the live generation; reap is idempotent
    assert(fullProbeOf(dir, queries) == live)
    assert(Similarity.reapIvfGrace(spark, dir).isEmpty)
    // appends and compaction keep working after a reap
    Similarity.appendIvfPq(
      emb.filter(col("vec_id") >= 40 && col("vec_id") < 45),
      "vec_id", "embedding", dir = dir)
    Similarity.compactIvfPq(spark, dir)
    assert(Similarity.listSkew(spark, dir).nVectors == 45L)
    // reap refuses a non-IVF kind loudly (no generation layout there)
    val other = java.nio.file.Files.createTempDirectory("notivf").toString
    IndexManifest.write(spark, other, IndexManifest.KindBm25,
      Map.empty, Map.empty)
    val e = intercept[IllegalArgumentException] {
      Similarity.reapIvfGrace(spark, other)
    }
    assert(e.getMessage.contains("no generation layout"))
  }

  test("reclusterIvfPq is reader-atomic: concurrent staged probes never observe a half-published index") {
    val corpus = emb.filter(col("vec_id") < 60)
    val dir = java.nio.file.Files.createTempDirectory("pqreclconc").toString
    Similarity.stageIvfPq(corpus, "vec_id", "embedding",
      numCentroids = 4, m = 4, ksub = 8, dir = dir)
    val queries = corpus.filter(col("vec_id") < 2).localCheckpoint(true)
    // a FULL probe's results are geometry-independent (codes verbatim,
    // every list scanned) — the invariant that must hold through the
    // flip: any mixed-geometry read would misprune or misscore
    val expect = fullProbeOf(dir, queries)
    assert(expect.nonEmpty)
    @volatile var failure: Option[Throwable] = None
    val probes = new java.util.concurrent.atomic.AtomicInteger(0)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val t = new Thread(() => {
      while (!stop.get()) {
        try {
          val got = fullProbeOf(dir, queries)
          if (got != expect) throw new IllegalStateException(
            s"probe diverged mid-recluster: $got")
          probes.incrementAndGet(): Unit
        } catch {
          case e: Throwable => failure = Some(e); stop.set(true)
        }
      }
    })
    t.start()
    try {
      while (probes.get() < 2 && failure.isEmpty) Thread.sleep(50)
      Similarity.reclusterIvfPq(spark, dir, iters = 1)
      val after = probes.get()
      while (probes.get() < after + 2 && failure.isEmpty) Thread.sleep(50)
    } finally { stop.set(true); t.join() }
    assert(failure.isEmpty, s"concurrent probe threw: $failure")
    graft.util.LocalCkpt.release(queries)
  }
}
