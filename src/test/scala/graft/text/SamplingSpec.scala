package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, sf001, "documents")

  test("hashSplit covers every row, respects weights, and is deterministic") {
    val out = Sampling.hashSplit(docs.select("doc_id"), col("doc_id"), "42",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val total = docs.count()
    val counts = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == total) // no row unassigned
    assert(counts.keySet == Set("train", "val", "test"))
    // binomial(500, 0.8) is within ±4 sigma of 400 → loose bounds
    assert(counts("train") > total * 0.7 && counts("train") < total * 0.9)
    // a re-run (fresh plan) assigns identically — the rand() contrast
    val again = Sampling.hashSplit(docs.select("doc_id"), col("doc_id"), "42",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("a different salt draws an independent re-split") {
    def assign(salt: String) =
      Sampling.hashSplit(docs.select("doc_id"), col("doc_id"), salt,
        Seq("train" -> 0.5, "test" -> 0.5))
        .select("doc_id", "split")
    val moved = assign("a").withColumnRenamed("split", "s1")
      .join(assign("b").withColumnRenamed("split", "s2"), Seq("doc_id"))
      .filter(col("s1") =!= col("s2")).count()
    assert(moved > 0, "salting must actually re-draw membership")
  }

  test("sampleByHash is stable and consistent across tables sharing the key") {
    val frac = 0.3
    val sampled = Sampling.sampleByHash(docs, col("doc_id"), frac, "s1")
    val n = sampled.count().toDouble
    val total = docs.count().toDouble
    assert(math.abs(n / total - frac) < 0.1, s"got ${n / total}")
    // consistency: sampling a DIFFERENT projection of the same table by
    // the same (key, salt) selects exactly the same ids
    val other = Sampling.sampleByHash(docs.select("doc_id", "source"),
      col("doc_id"), frac, "s1")
    assert(sampled.select("doc_id").exceptAll(other.select("doc_id")).isEmpty)
    assert(other.select("doc_id").exceptAll(sampled.select("doc_id")).isEmpty)
  }

  test("sampleByWeight keeps rows in proportion to weight, exactly at the caps") {
    val s = spark
    import s.implicits._
    // weights 0, wCap/2, wCap, 2*wCap across many keys
    val df = s.range(4000).select($"id".as("k"),
      (($"id" % 4) * 1000).as("w")) // 0, 1000, 2000, 3000 with wCap 2000
    val kept = Sampling.sampleByWeight(df, col("k"), col("w"), wCap = 2000L,
      salt = "t")
    val byW = kept.groupBy("w").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!byW.contains(0L), "zero weight never kept")
    assert(byW(2000L) == 1000L, "weight == wCap always kept")
    assert(byW(3000L) == 1000L, "weight > wCap always kept")
    val half = byW(1000L).toDouble / 1000
    assert(math.abs(half - 0.5) < 0.1, s"~half expected, got $half")
    // deterministic membership
    val again = Sampling.sampleByWeight(df, col("k"), col("w"), 2000L, "t")
    assert(kept.select("k").exceptAll(again.select("k")).isEmpty)
    assert(again.select("k").exceptAll(kept.select("k")).isEmpty)
  }

  test("sampleByWeight raises loudly beyond the weight domain") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1L << 31)).toDF("k", "w")
    val e = intercept[Exception] {
      Sampling.sampleByWeight(df, col("k"), col("w"), 2000L, "t").count()
    }
    assert(e.getMessage != null)
  }

  test("capPerGroup thins only over-quota groups, deterministically, without windows") {
    val hot = (1L to 1000L).map(i => (i, "hot"))
    val cold = (2001L to 2005L).map(i => (i, "cold"))
    val df = (hot ++ cold).toDF("doc_id", "domain")
    val out = Sampling.capPerGroup(df, col("domain"), col("doc_id"), 100L).cache()
    // under-quota group passes untouched
    assert(out.filter(col("domain") === "cold").count() == 5)
    // over-quota group lands near the cap (binomial(1000, 0.1): ±4σ ≈ ±38)
    val kept = out.filter(col("domain") === "hot").count()
    assert(kept > 60 && kept < 140, s"hot group kept $kept of 1000 (cap 100)")
    // deterministic across re-runs
    val again = Sampling.capPerGroup(df, col("domain"), col("doc_id"), 100L)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    // no per-group window anywhere in the plan
    assert(!again.queryExecution.executedPlan.toString.contains("Window"))
    out.unpersist()
  }

  test("shuffleManifest emits an exact global permutation matching the md5 order") {
    val out = Sampling.shuffleManifest(docs.select("doc_id"), "doc_id", "ep1", 8)
    val n = docs.count()
    val rows = out.orderBy("pos")
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect()
    assert(rows.map(_._3).toSeq == (0L until n).toSeq, "pos must be 0..n-1 exactly")
    // pos order == global md5 rank-key order (the single-sort definition)
    val byMd5 = docs.select(col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit("#ep1"))).as("rk"))
      .orderBy("rk", "doc_id").select("doc_id").as[Long].collect()
    assert(rows.map(_._1).toSeq == byMd5.toSeq)
    // shards are contiguous pos ranges (range partition of the rank key)
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq)
    // a different salt draws a different permutation
    val other = Sampling.shuffleManifest(docs.select("doc_id"), "doc_id", "ep2", 8)
    val moved = out.select("doc_id", "pos")
      .join(other.select(col("doc_id"), col("pos").as("p2")), Seq("doc_id"))
      .filter(col("pos") =!= col("p2")).count()
    assert(moved > 0)
  }

  test("shuffleManifest plan: per-shard windows only, offsets broadcast") {
    val plan = Sampling.shuffleManifest(docs.select("doc_id"), "doc_id", "ep1", 8)
      .queryExecution.executedPlan.toString
    // the corpus-sized window partitions by shard; the only global
    // (empty-partition-spec) window is the prefix sum over the
    // `shards`-row size aggregate
    val globalWindows = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains(", [], ["))
      .size
    assert(globalWindows <= 1, s"corpus window must partition by shard:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"offsets must broadcast:\n$plan")
  }

  test("curriculumManifest walks bins ascending, pseudorandom within each bin") {
    val d = docs.select(col("doc_id"), expr("n_chars DIV 500").as("b"))
    val out = Sampling.curriculumManifest(d, "doc_id", col("b"), "cur1", 8)
    val n = d.count()
    val rows = out.orderBy("pos")
      .select("doc_id", "bin", "shard", "pos").as[(Long, Long, Int, Long)]
      .collect()
    assert(rows.map(_._4).toSeq == (0L until n).toSeq, "pos must be 0..n-1 exactly")
    // bins are non-decreasing along the order; within a bin, order is
    // the (md5 rank-key, key) order — the single-sort definition
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq)
    val byDef = d.select(col("doc_id"), col("b"),
        md5(concat(col("doc_id").cast("string"), lit("#cur1"))).as("rk"))
      .orderBy("b", "rk", "doc_id").select("doc_id").as[Long].collect()
    assert(rows.map(_._1).toSeq == byDef.toSeq)
    // same salt, bins dropped → plain shuffleManifest order differs
    // (the curriculum is load-bearing, not cosmetic)
    val flat = Sampling.shuffleManifest(d, "doc_id", "cur1", 8)
    val moved = out.select("doc_id", "pos")
      .join(flat.select(col("doc_id"), col("pos").as("p2")), Seq("doc_id"))
      .filter(col("pos") =!= col("p2")).count()
    assert(moved > 0)
  }

  test("stratifiedExactN takes exactly n per stratum in md5 order") {
    val d = docs.select(col("doc_id"), col("lang"))
    val out = Sampling.stratifiedExactN(d, col("lang"), col("doc_id"),
      n = 3, salt = "st1")
    val sizes = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val avail = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    avail.foreach { case (l, n) =>
      assert(sizes(l) == math.min(3L, n), s"lang $l: ${sizes.get(l)}")
    }
    // equals the single-window reference rank
    val w = Window.partitionBy("lang")
      .orderBy(md5(concat(col("doc_id").cast("string"), lit("#st1"))),
        col("doc_id"))
    val ref = d.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
    assert(out.exceptAll(ref).isEmpty && ref.exceptAll(out).isEmpty)
  }

  test("curriculumManifest keeps null-bin rows, ordered first") {
    val d = Seq[(Long, java.lang.Long)]((1L, 5L), (2L, null), (3L, 0L),
      (4L, null)).toDF("doc_id", "b")
    val out = Sampling.curriculumManifest(d, "doc_id", col("b"), "s1", 4)
      .orderBy("pos")
      .select("doc_id", "pos").as[(Long, Long)].collect().toSeq
    assert(out.map(_._2) == Seq(0L, 1L, 2L, 3L), s"pos not a permutation: $out")
    // the two null-bin docs occupy positions 0 and 1
    assert(out.take(2).map(_._1).toSet == Set(2L, 4L))
  }

  test("curriculumManifest plan: windows partition by (bin, shard)") {
    val d = docs.select(col("doc_id"), expr("n_chars DIV 500").as("b"))
    val plan = Sampling.curriculumManifest(d, "doc_id", col("b"), "cur1", 8)
      .queryExecution.executedPlan.toString
    val globalWindows = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains(", [], ["))
      .size
    assert(globalWindows <= 1, s"corpus window must partition by (bin, shard):\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"offsets must broadcast:\n$plan")
  }

  test("splitBucket stays a narrow pushdown-friendly projection (no shuffle)") {
    val plan = Sampling.hashSplit(docs.select("doc_id"), col("doc_id"), "42",
      Seq("train" -> 0.8, "val" -> 0.2))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
