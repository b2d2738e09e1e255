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

  test("bm25TopK plan: nothing corpus-sized broadcasts") {
    val docs = Tables.load(spark, sf001, "documents")
    val qs = Seq((1L, "key table")).toDF("query_id", "qtext")
    val out = Retrieval.bm25TopK(docs, "doc_id", col("text"), qs,
      "query_id", col("qtext"))
    assert(out.count() > 0)
  }
}
