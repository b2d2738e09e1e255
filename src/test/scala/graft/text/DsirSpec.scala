package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("importanceScores ranks target-like docs above off-distribution docs") {
    // target vocabulary: alpha/beta/gamma; noise vocabulary: disjoint
    val target = (1L to 8L)
      .map(i => (i, "alpha beta gamma alpha beta delta epsilon"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (101L, "alpha beta gamma alpha beta"), // on-distribution
      (102L, "alpha beta zzq wwx"),          // mixed
      (103L, "zzq wwx vvy uuz zzq wwx"),     // off-distribution
      (104L, null.asInstanceOf[String]))     // drops (no features)
      .toDF("doc_id", "text")
    val out = Dsir.importanceScores(raw, target, "doc_id", col("text"),
        buckets = 256)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(101L, 102L, 103L))
    assert(out(101L)._3 > out(102L)._3,
      s"on-distribution should outrank mixed: $out")
    assert(out(102L)._3 > out(103L)._3,
      s"mixed should outrank off-distribution: $out")
    // 5 unigrams + 4 bigrams
    assert(out(101L)._1 == 9L)
    // integer milli-nat sum and the double average agree
    val (n, mn, avg) = out(101L)
    assert(math.abs(avg - mn.toDouble / 1000.0 / n) < 1e-12)
  }

  test("importanceScores matches a driver-side reference computation") {
    val buckets = 64
    def feats(text: String): Seq[String] = {
      val w = """\S+""".r.findAllIn(text.toLowerCase).toSeq
      val bi =
        if (w.size >= 2) w.sliding(2).map(_.mkString(" ")).toSeq else Seq.empty
      w ++ bi
    }
    def bucket(f: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest((f + ":dsir").getBytes("UTF-8"))
      val hex = md.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % buckets
    }
    val rawDocs = Seq(1L -> "a b c a", 2L -> "c d", 3L -> "e")
    val tgtDocs = Seq(10L -> "a b a b", 11L -> "c")
    val cq = rawDocs.flatMap(d => feats(d._2)).groupBy(bucket)
      .view.mapValues(_.size.toLong).toMap
    val ct = tgtDocs.flatMap(d => feats(d._2)).groupBy(bucket)
      .view.mapValues(_.size.toLong).toMap
    val tq = cq.values.sum; val tt = ct.values.sum
    def lr(b: Long): Long = math.floor(1000.0 * math.log(
      ((ct.getOrElse(b, 0L) + 1L).toDouble * (tq + buckets).toDouble) /
        ((cq(b) + 1L).toDouble * (tt + buckets).toDouble))).toLong
    val expected = rawDocs.map { case (id, t) =>
      val bs = feats(t).map(bucket)
      id -> (bs.size.toLong, bs.map(lr).sum)
    }.toMap
    val out = Dsir.importanceScores(
        rawDocs.toDF("doc_id", "text"), tgtDocs.toDF("doc_id", "text"),
        "doc_id", col("text"), buckets = buckets)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == expected, s"engine $out vs reference $expected")
  }

  test("importanceScores plan: no corpus-sized sort, ratio join broadcasts") {
    val raw = (1L to 50L).map(i => (i, s"tok$i alpha beta")).toDF("doc_id", "text")
    val tgt = (1L to 5L).map(i => (i, "alpha beta")).toDF("doc_id", "text")
    val out = Dsir.importanceScores(raw, tgt, "doc_id", col("text"), buckets = 32)
    // localCheckpoint collapses lineage; assert on the result instead:
    // every raw doc scored, deterministic across two runs
    val a = out.collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    val b = Dsir.importanceScores(raw, tgt, "doc_id", col("text"), buckets = 32)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(a == b && a.size == 50)
  }

  test("importanceScores: parquet-staging path returns the persist path's exact rows") {
    val raw = (1L to 40L).map(i => (i, s"tok$i alpha beta")).toDF("doc_id", "text")
    val tgt = (1L to 5L).map(i => (i, "alpha beta")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("dsir-stage").toString
    try {
      def run(staging: Option[String]) = Dsir.importanceScores(raw, tgt,
          "doc_id", col("text"), buckets = 32, stagingDir = staging)
        .collect().toSet
      assert(run(Some(dir)) == run(None))
      assert(new java.io.File(s"$dir/dsir_bucket_counts").exists())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
