package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("sentences: maximal terminator runs, trimmed, empties dropped") {
    val df = Seq((1L, "One two. Three four! Five? .. "),
      (2L, "no terminator at all"),
      (3L, "")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), Chunking.sentences(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("One two.", "Three four!", "Five?", ".."))
    assert(out(2L) == Seq("no terminator at all"))
    assert(out(3L).isEmpty)
  }

  test("sentenceChunks: boundary rule, straddle, coverage") {
    // sentences of 4 tokens each; target 8 → two sentences per chunk
    val text = (1 to 6).map(i => s"s$i a b c.").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val out = Chunking.sentenceChunks(df, "doc_id", col("text"), 8)
      .orderBy("chunk_idx")
      .as[(Long, Long, String, Long, Long)].collect().toSeq
    assert(out.map(_._2) == Seq(0L, 1L, 2L))
    assert(out.forall(c => c._4 == 2 && c._5 == 8))
    assert(out.head._3 == "s1 a b c. s2 a b c.")
    // a single over-long sentence gets its own chunk, never split
    val long = Seq((2L, "one giant sentence with very many tokens exceeding target."))
      .toDF("doc_id", "text")
    val lout = Chunking.sentenceChunks(long, "doc_id", col("text"), 3)
      .as[(Long, Long, String, Long, Long)].collect()
    assert(lout.length == 1 && lout.head._4 == 1)
    // coverage: chunk tokens sum to the doc's token count
    val total = Chunking.sentenceChunks(df, "doc_id", col("text"), 8)
      .agg(sum("chunk_tokens")).as[Long].head()
    assert(total == 24)
  }

  test("sentenceChunks plan: the cumulative window partitions by document") {
    val df = Seq((1L, "a. b. c.")).toDF("doc_id", "text")
    val plan = Chunking.sentenceChunks(df, "doc_id", col("text"), 8)
      .queryExecution.executedPlan.toString
    val globalWindows = plan.linesIterator
      .count(l => l.contains("Window") && l.contains(", [], ["))
    assert(globalWindows == 0, s"window must partition by doc:\n$plan")
  }
}
