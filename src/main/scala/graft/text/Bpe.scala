package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") as a
  * distributed pipeline stage — the step that turns a curated corpus
  * into the subword vocabulary the packing/tokenizing stages consume.
  *
  * Scale shape (the point): the only corpus-sized work is ONE
  * map-side-combined token `groupBy` (the word-frequency table) at the
  * start and ONE broadcast join (learned word → token count) at the
  * end. The merge-learning loop in between runs on the word-frequency
  * table, which is bounded by `maxWords` — and even uncapped it is
  * vocabulary-sized, not corpus-sized (a 100 TB corpus has ~10⁷–10⁸
  * distinct head words, each a handful of symbol rows). Every per-word
  * operation is a window PARTITIONED BY WORD: thousands of independent,
  * individually-tiny windows, never a global sort.
  *
  * Merge application is expressed with windows, not a sequential fold,
  * via the run-parity rule: a position pair-matches when
  * `(sym, next) = (left, right)`; consecutive matching positions can
  * only occur inside a same-symbol run (a match at j and j+1 forces
  * `left = right`), and greedy left-to-right merging takes exactly the
  * EVEN offsets within each maximal run of consecutive matches
  * ("aaaa" + (a,a) → "aa"·"aa", "aaa" → "aa"·"a"). That makes the
  * whole trainer window/aggregate algebra, so a SQL oracle can
  * reproduce it stage-for-stage (`q_bpe_merges` unrolls the loop as
  * CTE stages).
  *
  * Determinism contract: pair counts are integer word-frequency sums;
  * the winning pair is `max (count) / min (left, right)` — ties broken
  * lexicographically — and the `maxWords` cap ranks by
  * `(freq DESC, word ASC)`. The learned merge list is a pure function
  * of the corpus' word multiset: same on any partitioning, any retry,
  * any engine.
  */
object Bpe {

  /** Word-frequency table (word, freq): whitespace tokens of
    * `lower(text)` (the [[TextFunctions.vocabulary]] convention),
    * capped to the `maxWords` most frequent words — the classic BPE
    * trimming, and the bound that keeps the training loop
    * vocabulary-sized. The cap routes through [[Retrieval.saltedTopK]]
    * (per-shard partial top-k, then a ≤ salts·k final window), never a
    * global sort of the distinct-word table. */
  def wordFreq(df: DataFrame, text: Column, maxWords: Int): DataFrame = {
    val wf = df.filter(text.isNotNull)
      .select(explode(TextFunctions.whitespaceTokens(lower(text))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))
    Retrieval.saltedTopK(wf, lit(1), col("word"),
        Seq(col("freq").desc, col("word")), maxWords)
      .select("word", "freq")
  }

  /** Initial symbol table (word, freq, pos, sym): one row per
    * CHARACTER of each distinct word — the per-word symbol sequences
    * BPE folds. Character indexing (`substring`) matches the oracle's
    * `substr` exactly, code point for code point. */
  def initSymbols(words: DataFrame): DataFrame =
    words
      .withColumn("pos", explode(sequence(lit(1), length(col("word")))))
      .select(col("word"), col("freq"), (col("pos") - 1).cast("int").as("pos"),
        expr("substring(word, pos, 1)").as("sym"))

  /** Adjacent-pair frequencies (l, r, cnt) of a symbol table: one
    * `lead` window per word, then a map-side-combined integer
    * aggregate. */
  def pairCounts(syms: DataFrame): DataFrame = {
    val w = Window.partitionBy("word").orderBy("pos")
    syms.withColumn("nxt", lead(col("sym"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("sym").as("l"), col("nxt").as("r"), col("freq"))
      .groupBy("l", "r")
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Apply ONE merge `(left, right)` to a symbol table, greedy
    * left-to-right, via the run-parity rule (see object doc): mark
    * matches, island consecutive match runs (`pos − cumulative-match-
    * count` is constant within a run), keep odd (1-based) positions
    * within each island, drop the consumed right halves, renumber. */
  def applyMerge(syms: DataFrame, left: String, right: String): DataFrame = {
    val w = Window.partitionBy("word").orderBy("pos")
    val wg = Window.partitionBy("word", "grp").orderBy("pos")
    syms
      .withColumn("nxt", lead(col("sym"), 1).over(w))
      .withColumn("m", col("sym") === left && col("nxt") === right)
      .withColumn("grp", when(col("m"),
        col("pos") - sum(when(col("m"), 1).otherwise(0)).over(w)))
      .withColumn("idx", when(col("m"), row_number().over(wg)))
      .withColumn("merged", col("m") && col("idx") % 2 === 1)
      .withColumn("consumed", coalesce(lag(col("merged"), 1).over(w), lit(false)))
      .filter(!col("consumed"))
      .select(col("word"), col("freq"),
        (row_number().over(w) - 1).cast("int").as("pos"),
        when(col("merged"), concat(col("sym"), col("nxt")))
          .otherwise(col("sym")).as("sym"))
  }

  /** Learn `k` merges. Returns (merges, finalSymbols): merges is the
    * ordered merge table (rank, left_sym, right_sym, pair_count) — the
    * tokenizer model — and finalSymbols the word table after all `k`
    * merges (its per-word row count is the word's token count, i.e.
    * the corpus is already encoded as a side effect of training, the
    * classic BPE property). Each iteration `collect`s exactly ONE row
    * (the argmax pair) — driver-side control flow à la
    * [[graft.ops.Graph.pageRankInt]], with `localCheckpoint` cutting
    * the window-chain lineage every second round (each argmax action
    * then re-executes at most one un-checkpointed merge chain — half
    * the materializations of a per-round cut). Requires the corpus to
    * support `k` merges (throws otherwise, so the unrolled SQL twin
    * can never silently diverge on an early stop). */
  def trainMerges(df: DataFrame, text: Column, k: Int,
      maxWords: Int): (DataFrame, DataFrame) = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    var syms = initSymbols(wordFreq(df, text, maxWords)).localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (i <- 1 to k) {
      val top = pairCounts(syms)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      require(top.nonEmpty,
        s"corpus exhausted after ${i - 1} merges; lower k (= $k)")
      val row = top.head
      val (l, r) = (row.getString(0), row.getString(1))
      merges += ((i, l, r, row.getLong(2)))
      syms = applyMerge(syms, l, r)
      if (i % 2 == 0 || i == k) syms = syms.localCheckpoint()
    }
    val mergesDf = merges.result()
      .toDF("rank", "left_sym", "right_sym", "pair_count")
    (mergesDf, syms)
  }

  /** The driver-local merge list of a [[trainMerges]] output — the
    * 8-or-so-row model in the form [[encode]] replays. */
  def mergeSeq(merges: DataFrame): Seq[(String, String)] =
    merges.orderBy("rank").select("left_sym", "right_sym").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  /** ENCODE a new corpus under a trained model: replay the learned
    * merge list, in rank order, over the batch's distinct words — the
    * actual BPE tokenize step, where an UNSEEN word still merges by
    * the learned rules ("lowest" → low·est under the Sennrich model,
    * not six characters). Returns (idCol, n_words, n_tokens).
    *
    * Scale shape: the merge replay runs on the batch's DISTINCT-word
    * table (per-word windows, k rounds, zero collects — the model is
    * already a local list); the batch itself is touched twice — once
    * to build that table, once for the final word→token-count join.
    * That join shuffles on the word key (the distinct-word table of an
    * arbitrary batch has no broadcast guarantee); AQE downgrades it to
    * a broadcast when the batch is small. */
  def encode(df: DataFrame, idCol: String, text: Column,
      merges: Seq[(String, String)]): DataFrame = {
    val words = df.filter(text.isNotNull)
      .select(explode(TextFunctions.whitespaceTokens(lower(text))).as("word"))
      .distinct()
      .withColumn("freq", lit(1L))
    var syms = initSymbols(words).localCheckpoint()
    for (((l, r), i) <- merges.zipWithIndex) {
      syms = applyMerge(syms, l, r)
      if (i % 2 == 1 || i == merges.size - 1) syms = syms.localCheckpoint()
    }
    val ntok = syms.groupBy("word").agg(count(lit(1)).as("__ntok"))
    df.filter(text.isNotNull)
      .select(col(idCol),
        explode(TextFunctions.whitespaceTokens(lower(text))).as("word"))
      .join(ntok, Seq("word")) // inner: every batch word is in the table
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("__ntok")).as("n_tokens"))
  }

  /** Per-document tokenization cost under a trained model: (doc_id,
    * n_words, n_tokens) where each word costs its learned token count,
    * or — for words outside the trained table — its character count
    * (the fully-unmerged fallback, exactly what BPE encode does to
    * unseen words before any merge applies). The join is deliberately
    * UNHINTED (the [[encode]] discipline): a capped word table
    * auto-broadcasts under the threshold, while a 10⁶–10⁸-word model —
    * the scale the object doc advertises — must shuffle on the word
    * key rather than OOM a forced broadcast build. */
  def fertility(df: DataFrame, idCol: String, text: Column,
      finalSymbols: DataFrame): DataFrame = {
    val ntok = finalSymbols.groupBy("word")
      .agg(count(lit(1)).as("__ntok"))
    df.filter(text.isNotNull)
      .select(col(idCol),
        explode(TextFunctions.whitespaceTokens(lower(text))).as("word"))
      .join(ntok, Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("__ntok"), length(col("word")).cast("long")))
          .as("n_tokens"))
  }
}
