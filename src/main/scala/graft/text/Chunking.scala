package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window chunking — split documents into ≤`targetTokens`-sized
  * chunks at SENTENCE boundaries: the retrieval/embedding prep step
  * (embedding models take bounded windows, and cutting mid-sentence
  * costs retrieval quality). The sibling of [[Packing]]: packing lays
  * whole documents into training sequences; this splits one document
  * into semantically-aligned windows.
  *
  * Chunk rule: sentences are maximal `[^.!?]+[.!?]*` runs (a regex both
  * Java and RE2 engines parse identically — no lookbehind, so the
  * DuckDB oracle recomputes it verbatim); a sentence starts a new chunk
  * when the tokens BEFORE it reach the next `targetTokens` multiple —
  * i.e. `chunk_idx = floor(cum_before / target)`. A single sentence
  * longer than the target gets its own chunk (never split — the
  * documented straddle rule). Deterministic: layout is a pure function
  * of (text, target).
  *
  * Scale shape: one narrow sentence-explode, one cumulative-sum window
  * PARTITIONED BY DOCUMENT (millions of small independent windows —
  * never global), one regroup by (doc, chunk). |rows| = sentences, all
  * map-side-combinable aggregation. */
object Chunking {

  /** Sentence array of `text` — trimmed, empties dropped. */
  def sentences(text: Column): Column =
    filter(transform(regexp_extract_all(text, lit("[^.!?]+[.!?]*"), lit(0)),
      s => trim(s)), s => length(s) > 0)

  /** Chunk manifest: (idCol, chunk_idx, text_chunk, n_sentences,
    * chunk_tokens). */
  def sentenceChunks(df: DataFrame, idCol: String, text: Column,
      targetTokens: Int): DataFrame = {
    require(targetTokens > 0, "targetTokens must be positive")
    val sents = df.filter(text.isNotNull)
      .select(col(idCol), posexplode(sentences(text)).as(Seq("pos", "sent")))
      .withColumn("__nt",
        size(TextFunctions.whitespaceTokens(col("sent"))).cast("long"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val chunked = sents
      .withColumn("__before",
        coalesce(sum(col("__nt")).over(w) - col("__nt"), lit(0L)))
      .withColumn("chunk_idx", floor(col("__before") / targetTokens).cast("long"))
    chunked.groupBy(col(idCol), col("chunk_idx"))
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("sent")))),
          x => x.getField("sent")), " ").as("text_chunk"),
        count(lit(1)).as("n_sentences"),
        sum(col("__nt")).as("chunk_tokens"))
  }
}
