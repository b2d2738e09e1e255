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
}
