package graft.ml

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.load(spark, sf0001, "embeddings")

  test("quantizedDot is symmetric, exact, and matches a driver-side computation") {
    val two = emb.filter(col("vec_id").isin(0, 1))
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    val want = two(0L).zip(two(1L))
      .map { case (a, b) =>
        math.floor(a.toDouble * 1000).toLong * math.floor(b.toDouble * 1000).toLong }
      .sum
    val got = emb.filter(col("vec_id") === 0)
      .crossJoin(emb.filter(col("vec_id") === 1).select(col("embedding").as("e2")))
      .select(Similarity.quantizedDot(col("embedding"), col("e2")).as("d"))
      .as[Long].head()
    assert(got == want)
  }

  test("cosine of a vector with its positive scaling is ~1") {
    val d = emb.limit(5)
      .select(Similarity.cosine(col("embedding"),
        transform(col("embedding"), x => x * 2.0f)).as("c"))
      .as[Double].collect()
    d.foreach(c => assert(math.abs(c - 1.0) < 1e-9))
  }

  test("bruteForceTopK returns k ranked neighbors per query, no self-pairs") {
    val out = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", 3).cache()
    assert(out.count() == 5 * 3)
    assert(out.filter(col("query_id") === col("neighbor_id")).count() == 0)
    assert(out.groupBy("query_id").agg(max("rank").as("m"))
      .filter(col("m") =!= 3).count() == 0)
    out.unpersist()
  }

  test("ivfAssign matches a driver-side argmax over the centroid set") {
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 8)
    val rows = emb.limit(20)
      .select(col("vec_id"),
        Similarity.ivfAssign(Similarity.quantize(col("embedding")), cents).as("list"),
        Similarity.quantize(col("embedding")).as("q"))
      .as[(Long, Int, Array[Long])].collect()
    rows.foreach { case (id, list, q) =>
      val dots = cents.map(c => c.zip(q).map { case (x, y) => x * y }.sum)
      assert(list == dots.indexOf(dots.max) + 1, s"vec $id")
    }
  }

  test("ivfProbes are ordered best-first and ivfTopK(nprobe=all) == bruteForceTopK") {
    val corpus = emb.filter(col("vec_id") < 200)
    val queries = corpus.filter(col("vec_id") < 10)
    val cents = Similarity.ivfCentroids(corpus, "vec_id", "embedding", 8)
    // probes: first probe IS the assignment, and all probes distinct
    val pr = corpus.limit(20).select(
        Similarity.ivfAssign(Similarity.quantize(col("embedding")), cents).as("a"),
        Similarity.ivfProbes(Similarity.quantize(col("embedding")), cents, 3).as("p"))
      .as[(Int, Array[Int])].collect()
    pr.foreach { case (a, p) =>
      assert(p.length == 3 && p.distinct.length == 3 && p.head == a)
    }
    // probing every list degenerates to exact brute force
    val ivf = Similarity.ivfTopK(queries, corpus, "vec_id", "embedding",
        k = 3, numCentroids = 8, nprobe = 8)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val brute = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 3)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(ivf.toSeq == brute.toSeq)
  }

  test("ivfRefine is deterministic, centers lists on their members, and preserves exactness at nprobe=all") {
    val corpus = emb.filter(col("vec_id") < 200)
    val init = Similarity.ivfCentroids(corpus, "vec_id", "embedding", 8)
    val r1 = Similarity.ivfRefine(corpus, "embedding", init, 2)
    val r2 = Similarity.ivfRefine(corpus, "embedding", init, 2)
    assert(r1 == r2) // integer Lloyd: exactly reproducible
    assert(r1 != init) // something actually moved on this fixture
    // each refined centroid is the integer mean of its assigned members
    import spark.implicits._
    val assigned = corpus.select(
        Similarity.ivfAssign(Similarity.quantize(col("embedding")),
          Similarity.ivfRefine(corpus, "embedding", init, 1)).as("list"),
        Similarity.quantize(col("embedding")).as("q"))
      .as[(Int, Array[Long])].collect()
    val byList = assigned.groupBy(_._1)
    // recompute round 2's centers on the driver from round 1's assignment
    val want = Similarity.ivfRefine(corpus, "embedding", init, 2)
    byList.foreach { case (list, members) =>
      val n = members.length.toLong
      val mean = members.map(_._2).transpose.map(c => Math.floorDiv(c.sum, n))
      assert(want(list - 1) == mean.toSeq, s"list $list center mismatch")
    }
    // refined index, every list probed → still exactly brute force
    val queries = corpus.filter(col("vec_id") < 5)
    val ivf = Similarity.ivfTopK(queries, corpus, "vec_id", "embedding",
        k = 3, numCentroids = 8, nprobe = 8, centroids = Some(r1))
      .orderBy("query_id", "rank").collect().toSeq
    val brute = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 3)
      .orderBy("query_id", "rank").collect().toSeq
    assert(ivf == brute)
  }

  test("ivfTopK candidates come only from probed lists (recall contract)") {
    val corpus = emb.filter(col("vec_id") < 200)
    val queries = corpus.filter(col("vec_id") < 10)
    val cents = Similarity.ivfCentroids(corpus, "vec_id", "embedding", 8)
    val assigned = corpus.select(col("vec_id"),
        Similarity.ivfAssign(Similarity.quantize(col("embedding")), cents).as("list"))
      .as[(Long, Int)].collect().toMap
    val probes = queries.select(col("vec_id"),
        Similarity.ivfProbes(Similarity.quantize(col("embedding")), cents, 2).as("p"))
      .as[(Long, Array[Int])].collect().toMap
    Similarity.ivfTopK(queries, corpus, "vec_id", "embedding",
        k = 5, numCentroids = 8, nprobe = 2)
      .collect().foreach { r =>
        val (qid, nid) = (r.getLong(0), r.getLong(1))
        assert(probes(qid).contains(assigned(nid)), s"$nid not in $qid's probed lists")
      }
  }

  test("recallAtK: 1.0 at nprobe=all, in (0,1] at nprobe=1, never above 1") {
    val corpus = emb.filter(col("vec_id") < 200)
    val queries = corpus.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 5)
    val full = Similarity.ivfTopK(queries, corpus, "vec_id", "embedding",
      k = 5, numCentroids = 8, nprobe = 8)
    val narrow = Similarity.ivfTopK(queries, corpus, "vec_id", "embedding",
      k = 5, numCentroids = 8, nprobe = 1)
    val rFull = Similarity.recallAtK(exact, full)
      .select("recall").as[Double].collect()
    assert(rFull.length == 20 && rFull.forall(_ == 1.0))
    val rNarrow = Similarity.recallAtK(exact, narrow)
      .select("recall").as[Double].collect()
    assert(rNarrow.forall(r => r >= 0.0 && r <= 1.0))
    // nprobe=1 on 8 lists must lose SOMETHING on this fixture — if it
    // didn't, the recall metric couldn't distinguish the two configs
    assert(rNarrow.sum < rFull.sum)
  }

  test("nearDupPairs finds planted scaled copies and nothing else at fixture scale") {
    val corpus = emb.unionByName(
      emb.filter(col("vec_id") % 10 === 0).select(
        (col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), x => (x.cast("double") * 1.1).cast("float"))
          .as("embedding"),
        col("label")))
    val pairs = Similarity.nearDupPairs(corpus, "vec_id", "embedding", "label").cache()
    val planted = emb.filter(col("vec_id") % 10 === 0).count()
    assert(pairs.filter(col("id_b") - col("id_a") === 100000L).count() == planted)
    assert(pairs.count() == planted) // random vectors don't pass cos ≥ 0.9
    pairs.unpersist()
  }

  test("driver-side planeSign matches the md5-hex-parity rule the oracle uses") {
    // recompute a sample of signs through Spark's md5 expression — the
    // SQL form any oracle mirrors — and compare to the precomputed matrix
    val got = spark.range(0, 4).selectExpr("id AS h")
      .crossJoin(spark.range(1, 65).selectExpr("id AS i"))
      .selectExpr("h", "i",
        """CASE WHEN conv(substring(md5(concat(cast(h AS string), '|', cast(i AS string))), 1, 1),
          |16, 10) % 2 = 0 THEN 1L ELSE -1L END AS s""".stripMargin)
      .as[(Long, Long, Long)].collect()
    got.foreach { case (h, i, s) =>
      assert(Similarity.planeSign(h.toInt, i.toInt) == s, s"sign mismatch at ($h,$i)")
    }
  }

  test("lshBucket is deterministic and bucketedTopK finds same-bucket neighbors") {
    val bucketed = emb.withColumn("bkt", Similarity.lshBucket(col("embedding"), 4, 64)).cache()
    val again = emb.withColumn("bkt", Similarity.lshBucket(col("embedding"), 4, 64))
    assert(bucketed.select("vec_id", "bkt").except(again.select("vec_id", "bkt")).count() == 0)
    val nBuckets = bucketed.select("bkt").distinct().count()
    assert(nBuckets > 1 && nBuckets <= 16)
    val out = Similarity.bucketedTopK(
      bucketed.filter(col("vec_id") < 5), bucketed, "vec_id", "embedding", "bkt", 3)
    // every returned neighbor shares the query's bucket, ranks are 1..k
    assert(out.filter(col("rank") > 3).count() == 0 && out.count() > 0)
    bucketed.unpersist()
  }

  test("semanticDedup keeps one representative per planted near-dup component") {
    // two orthogonal clusters (centroids = ids 1,2); 3≈1 and 4≈2 are
    // planted near-dups; 5 is anti-parallel to cluster 1's axis, so its
    // best dot lands in cluster 2 with dot ~0 — never a dup edge
    val vecs = Seq(
      (1L, Array(10f, 0f)), (2L, Array(0f, 10f)),
      (3L, Array(10.1f, 0.05f)), (4L, Array(0.05f, 9.9f)),
      (5L, Array(-10f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(vecs, "vec_id", "embedding",
      numCentroids = 2).cache()
    val byId = out.select("vec_id", "root_id", "keep")
      .as[(Long, Long, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byId(1L) == ((1L, 1)) && byId(3L) == ((1L, 0)))
    assert(byId(2L) == ((2L, 1)) && byId(4L) == ((2L, 0)))
    assert(byId(5L) == ((5L, 1))) // singleton keeps itself
    // filter(keep = 1) IS the deduped corpus
    assert(out.filter(col("keep") === 1).count() == 3)
    // clusters: 1,3 share one; 2,4 share the other
    val cl = out.select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(cl(1L) == cl(3L) && cl(2L) == cl(4L) && cl(1L) != cl(2L))
    out.unpersist()
  }

  test("sq8 quantization is scale-invariant and sq8TopK's salted pass equals salts=1") {
    // a 2x-scaled copy quantizes to the IDENTICAL int8 array (scaling by
    // a power of two commutes with IEEE rounding, and the per-vector
    // max-abs scale doubles with the data) -> its sq8 cosine vs the
    // original is ~10^6 micro-units (within a few ulps of the division
    // chain) and it ranks first
    val corpus = emb.limit(50).unionByName(
      emb.filter(col("vec_id") === 3).select(
        (col("vec_id") + 7000L).as("vec_id"),
        transform(col("embedding"), x => x * 2.0f).as("embedding"),
        col("label")))
    val q3 = Similarity.sq8Index(
        corpus.filter(col("vec_id").isin(3L, 7003L)), "vec_id", "embedding")
      .select("vec_id", "q8").as[(Long, Seq[Byte])].collect().toMap
    assert(q3(3L) == q3(7003L))
    val top = Similarity.sq8TopK(
      corpus.filter(col("vec_id") === 3), corpus, "vec_id", "embedding", 5)
    val first = top.filter(col("rank") === 1)
      .select("neighbor_id", "score_micro").as[(Long, Long)].head()
    assert(first._1 == 7003L && first._2 >= 999998L)
    // the salted two-level top-k is plan shape, not semantics
    val single = Similarity.sq8TopK(
      corpus.filter(col("vec_id") === 3), corpus, "vec_id", "embedding", 5,
      salts = 1)
    assert(top.orderBy("query_id", "rank").collect()
      .sameElements(single.orderBy("query_id", "rank").collect()))
  }

  test("contaminatedDense flags planted eval copies and nothing else") {
    val base = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val ev = base.filter(col("vec_id") >= 450).select("vec_id", "embedding")
    // corpus: disjoint vectors + scaled copies of 10 eval items
    val planted = ev.filter(col("vec_id") % 5 === 0).select(
      (col("vec_id") + 200000L).as("vec_id"),
      transform(col("embedding"), x => (x.cast("double") * 1.1).cast("float"))
        .as("embedding"))
    val corpus = base.filter(col("vec_id") < 450)
      .select("vec_id", "embedding").unionByName(planted)
    val out = Similarity.contaminatedDense(corpus, "vec_id", "embedding",
      ev, "vec_id", "embedding")
    val flagged = out.collect().map(r =>
      r.getLong(0) -> (r.getAs[Long]("best_eval_id"), r.getAs[Long]("best_cos_micro"))).toMap
    // every planted copy is flagged, matched to ITS source, cosine ~1
    val plantedIds = planted.select("vec_id").as[Long].collect()
    assert(plantedIds.nonEmpty)
    plantedIds.foreach { id =>
      assert(flagged.contains(id), s"planted $id not flagged")
      assert(flagged(id)._1 == id - 200000L, s"planted $id matched ${flagged(id)._1}")
      assert(flagged(id)._2 > 999000L, s"planted $id cos ${flagged(id)._2}")
    }
    // the fixture's independent vectors must not cross 0.9
    assert(out.filter(col("vec_id") < 450).count() == 0)
    // the eval side broadcasts: no shuffle of the corpus for the join
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"eval side not broadcast:\n$plan")
  }

  test("prototypicality: per-cluster keep quota honored, deterministic, zero-norm excluded") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") < 600).select("vec_id", "embedding")
    // plant a zero vector — it must be excluded, not crash the cosine
    val dims = e.head().getSeq[Float](1).size
    val zero = Seq((9999L, Seq.fill(dims)(0.0f))).toDF("vec_id", "embedding")
    val df = e.unionByName(zero)
    val out = Similarity.prototypicality(df, "vec_id", "embedding",
      numCentroids = 8, keepPermille = 700)
    assert(out.filter(col("vec_id") === 9999L).count() == 0)
    // per cluster: kept == (700 * n) / 1000 exactly (integer floor)
    val perCluster = out.groupBy("cluster")
      .agg(count(lit(1)).as("n"), sum(col("keep")).as("kept"))
      .collect()
    perCluster.foreach { r =>
      assert(r.getAs[Long]("kept") == 700L * r.getAs[Long]("n") / 1000L,
        s"cluster ${r.getInt(0)}: ${r.getAs[Long]("kept")} of ${r.getAs[Long]("n")}")
    }
    // kept examples are the LEAST prototypical: every kept score <=
    // every dropped score within a cluster (modulo the boundary level)
    val agg = out.groupBy("cluster").agg(
      max(when(col("keep") === 1, col("proto_micro"))).as("max_kept"),
      min(when(col("keep") === 0, col("proto_micro"))).as("min_dropped"))
      .filter(col("min_dropped").isNotNull)
    assert(agg.filter(col("max_kept") > col("min_dropped")).count() == 0)
    // deterministic across recomputation
    val again = Similarity.prototypicality(df, "vec_id", "embedding",
      numCentroids = 8, keepPermille = 700)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }
}
