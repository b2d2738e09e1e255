package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("manifest lays docs end-to-end per group and cuts at capacity") {
    val docs = Seq(
      (1L, "a", 1000L), (2L, "a", 1500L), (3L, "a", 700L),
      (4L, "b", 100L)).toDF("doc_id", "grp", "n")
    val out = Packing.packManifest(docs, "doc_id", col("n"),
        Seq(col("grp")), capacity = 2048)
      .select("doc_id", "start_tok", "seq_idx", "seq_offset")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((0L, 0L, 0L)))
    assert(out(2L) == ((1000L, 0L, 1000L)))  // starts in seq 0, straddles into 1
    assert(out(3L) == ((2500L, 1L, 452L)))   // 2500 = 1·2048 + 452
    assert(out(4L) == ((0L, 0L, 0L)))        // independent group
  }

  test("layout is a pure function of (group, id, counts) — partitioning-independent") {
    val base = (1 to 200).map(i => (i.toLong, s"g${i % 3}", (i * 37 % 500 + 1).toLong))
    val a = Packing.packManifest(base.toDF("doc_id", "grp", "n"),
      "doc_id", col("n"), Seq(col("grp")), 1024)
    val b = Packing.packManifest(
      scala.util.Random.shuffle(base).toDF("doc_id", "grp", "n").repartition(7),
      "doc_id", col("n"), Seq(col("grp")), 1024)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("packNoSplit: next-fit keeps docs intact, oversize docs get their own sequence") {
    val docs = Seq( // shard s: capacity 10
      (1L, "s", 4L), (2L, "s", 5L),  // seq 0: 4+5=9
      (3L, "s", 2L),                 // doesn't fit (9+2>10) → seq 1
      (4L, "s", 25L),                // oversize → seq 2 alone
      (5L, "s", 1L),                 // after oversize → seq 3
      (6L, "t", 10L), (7L, "t", 10L) // exact fits: seq 0, seq 1
    ).toDF("doc_id", "shard", "n")
    val out = Packing.packNoSplit(docs, "doc_id", col("n"), col("shard"), 10L)
      .orderBy("doc_id")
      .select("doc_id", "seq_idx", "seq_offset").as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      (1L, 0L, 0L), (2L, 0L, 4L), (3L, 1L, 0L), (4L, 2L, 0L), (5L, 3L, 0L),
      (6L, 0L, 0L), (7L, 1L, 0L)))
    // no sequence holds more than capacity unless a single doc exceeds it
    val byCap = Packing.packNoSplit(docs, "doc_id", col("n"), col("shard"), 10L)
      .groupBy("shard", "seq_idx")
      .agg(sum("n_tokens").as("tot"), count(lit(1)).as("ndocs"))
      .filter(col("tot") > 10 && col("ndocs") > 1)
    assert(byCap.count() == 0)
    // partitioning-independent
    val again = Packing.packNoSplit(docs.repartition(5), "doc_id", col("n"),
      col("shard"), 10L)
    val first = Packing.packNoSplit(docs, "doc_id", col("n"), col("shard"), 10L)
    assert(first.exceptAll(again).isEmpty && again.exceptAll(first).isEmpty)
  }
}
