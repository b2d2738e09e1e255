package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ExprBridge

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

  /** Word-count cap under which [[trainMerges]] routes to the
    * driver-local trainer: 2²⁰ words × a handful of symbols each is a
    * few-hundred-MB driver working set — comfortably in-heap, and the
    * classic BPE `maxWords` trim lands far below it anyway. */
  val LocalTrainWordCap: Long = 1L << 20

  /** Learn `k` merges. Returns (merges, finalSymbols): merges is the
    * ordered merge table (rank, left_sym, right_sym, pair_count) — the
    * tokenizer model — and finalSymbols the word table after all `k`
    * merges (its per-word row count is the word's token count, i.e.
    * the corpus is already encoded as a side effect of training, the
    * classic BPE property).
    *
    * The corpus-sized work is [[wordFreq]] — one distributed token
    * groupBy — regardless of path. The merge LOOP then auto-switches on
    * a probed word count (the `Dedup.resolveClusters` discipline):
    * below [[LocalTrainWordCap]] the capped word-frequency table is
    * collected ONCE and all `k` merges are learned in memory with
    * incremental pair-count deltas ([[trainMergesLocal]] — the
    * sentencepiece shape: zero Spark jobs inside the loop, so a 32k
    * vocabulary costs zero scheduling cadence); above it the
    * window-algebra fold ([[trainMergesDistributed]]) runs, one
    * single-row argmax collect per merge. Both paths are pinned
    * IDENTICAL (BpeSpec equivalence; `q_bpe_merges`' unrolled SQL twin
    * pins the local path since the fixture sits under the cap). */
  def trainMerges(df: DataFrame, text: Column, k: Int,
      maxWords: Int): (DataFrame, DataFrame) = {
    require(k > 0, "k must be positive")
    val words = wordFreq(df, text, maxWords).localCheckpoint()
    if (words.count() <= LocalTrainWordCap) trainMergesLocal(words, k)
    else trainMergesDistributed(words, k)
  }

  /** The distributed merge loop over a (word, freq) table — the
    * uncapped path. Each iteration `collect`s exactly ONE row (the
    * argmax pair) — driver-side control flow à la
    * [[graft.ops.Graph.pageRankInt]], with `localCheckpoint` cutting
    * the window-chain lineage every second round (each argmax action
    * then re-executes at most one un-checkpointed merge chain — half
    * the materializations of a per-round cut). Requires the corpus to
    * support `k` merges (throws otherwise, so the unrolled SQL twin
    * can never silently diverge on an early stop). One Spark job per
    * merge: correct at any word-table size, but at a 32k-merge
    * production vocabulary the scheduling cadence alone is hours —
    * which is why [[trainMerges]] prefers [[trainMergesLocal]]
    * whenever the table fits the driver. */
  def trainMergesDistributed(words: DataFrame, k: Int): (DataFrame, DataFrame) = {
    require(k > 0, "k must be positive")
    val spark = words.sparkSession
    import spark.implicits._
    var syms = initSymbols(words).localCheckpoint()
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

  /** Driver-local merge trainer over a capped (word, freq) table — the
    * sentencepiece discipline. Collects the vocab-sized table once,
    * then learns all `k` merges in memory: a pair→count map and a
    * pair→words inverted index give O(affected-words · word-length)
    * per merge with NO Spark job inside the loop. The per-merge argmax
    * is a SCAN of the live pair-count map — it only holds pairs with
    * positive counts (bounded by distinct adjacent symbol pairs, tens
    * of thousands at worst), so a scan beats a lazy-deletion priority
    * queue, whose stale entries grow with UPDATE volume
    * (words × word-length per merge on a hot-pair corpus — measured
    * 10× slower via tools/BpeSweep). Determinism is bit-identical to
    * [[trainMergesDistributed]]: greedy left-to-right application (the
    * run-parity rule collapses to the plain scan locally), argmax by
    * (count desc, left, right) with string order as UNSIGNED UTF-8
    * byte comparison (Spark's UTF8String order — Java's UTF-16
    * compareTo would diverge on supplementary planes), symbols split
    * by Unicode CODE POINT (Spark `substring` semantics). */
  def trainMergesLocal(words: DataFrame, k: Int): (DataFrame, DataFrame) = {
    require(k > 0, "k must be positive")
    val spark = words.sparkSession
    import spark.implicits._
    val table = words.select("word", "freq").as[(String, Long)].collect()
    val syms: Array[Array[String]] = table.map { case (w, _) =>
      w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    }

    def utf8Cmp(a: String, b: String): Int = java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    val cnt = collection.mutable.HashMap.empty[(String, String), Long]
    val occ = collection.mutable.HashMap
      .empty[(String, String), collection.mutable.Set[Int]]
    def bump(p: (String, String), d: Long, wi: Int): Unit = {
      val n = cnt.getOrElse(p, 0L) + d
      if (n <= 0L) { cnt.remove(p); () }
      else {
        cnt(p) = n
        if (d > 0)
          occ.getOrElseUpdate(p, collection.mutable.Set.empty).add(wi)
      }
    }
    for (wi <- table.indices; j <- 0 until syms(wi).length - 1)
      bump((syms(wi)(j), syms(wi)(j + 1)), table(wi)._2, wi)

    def greedy(s: Array[String], l: String, r: String): Array[String] = {
      val out = Array.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += s(i); i += 1 }
      }
      out.result()
    }

    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (i <- 1 to k) {
      // argmax by (count desc, l asc, r asc) over the LIVE map — the
      // utf8 tie-break only runs among equal-count pairs
      var bl: String = null; var br: String = null; var bc = 0L
      cnt.foreachEntry { case ((l, r), n) =>
        if (n > bc) { bl = l; br = r; bc = n }
        else if (n == bc && bl != null) {
          val cl = utf8Cmp(l, bl)
          if (cl < 0 || (cl == 0 && utf8Cmp(r, br) < 0)) { bl = l; br = r }
        }
      }
      require(bl != null,
        s"corpus exhausted after ${i - 1} merges; lower k (= $k)")
      val (l, r, c) = (bl, br, bc)
      merges += ((i, l, r, c))
      // re-derive each affected word's pair multiset before/after —
      // the greedy merge removes every (l, r) adjacency, so the pair
      // can never win again with a stale count
      for (wi <- occ.getOrElse((l, r), Nil).toArray.sorted) {
        val before = syms(wi)
        val after = greedy(before, l, r)
        val f = table(wi)._2
        for (j <- 0 until before.length - 1)
          bump((before(j), before(j + 1)), -f, wi)
        syms(wi) = after
        for (j <- 0 until after.length - 1)
          bump((after(j), after(j + 1)), f, wi)
      }
    }
    val mergesDf = merges.result()
      .toDF("rank", "left_sym", "right_sym", "pair_count")
    val finalSyms = table.indices.flatMap { wi =>
      syms(wi).zipWithIndex.map { case (s, p) =>
        (table(wi)._1, table(wi)._2, p, s)
      }
    }.toDF("word", "freq", "pos", "sym")
    (mergesDf, finalSyms)
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
    * Scale shape: the whole merge replay is ONE native codegen'd
    * projection per distinct word ([[graft.functions.BpeTokenCount]] —
    * greedy left-to-right per merge in rank order, pinned equal to the
    * window-algebra [[applyMerge]] fold in BpeSpec). The k-stage
    * declarative replay this replaces cost one Spark job per
    * checkpoint cadence — the training cadence problem all over again
    * at encode time once k is a real vocabulary. The batch is touched
    * twice — once for the distinct-word table, once for the final
    * word→token-count join. That join shuffles on the word key (the
    * distinct-word table of an arbitrary batch has no broadcast
    * guarantee); AQE downgrades it to a broadcast when the batch is
    * small. */
  def encode(df: DataFrame, idCol: String, text: Column,
      merges: Seq[(String, String)]): DataFrame = {
    val ntok = df.filter(text.isNotNull)
      .select(explode(TextFunctions.whitespaceTokens(lower(text))).as("word"))
      .distinct()
      .select(col("word"), ExprBridge.column(graft.functions.BpeTokenCount(
        ExprBridge.expression(col("word")), merges)).as("__ntok"))
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
