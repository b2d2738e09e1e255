package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is one operator from SURVEY.md §2 (or a §7.1-10
  * LLM-pipeline extension), expressed Spark-first. `oracleSql` carries the
  * DuckDB-equivalent ANSI SQL for the driver's hash compare; aggregate
  * columns are cast to DECIMAL before summing on BOTH sides so the result is
  * exact and order-independent (double summation order would otherwise
  * diverge between engines).
  */
object SparkEntry {
  import Tables.load

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** Materialize `out` eagerly (localCheckpoint = executor-resident
    * blocks + lineage cut), then RELEASE the intermediate caches it was
    * built from. Query closures that persist intermediates must return
    * through this: a returned-lazy DataFrame would pin its persists
    * forever (the caller never sees them to unpersist), leaking cache
    * across every later query — the round-3 bench-irreproducibility
    * defect. */
  private def materialized(out: DataFrame, temps: DataFrame*): DataFrame =
    try out.localCheckpoint(true)
    finally temps.foreach(_.unpersist(false))

  /** Scratch dir for the lifecycle queries (T6/K1/S4/D4) that exercise a
    * real catalog sink: unique per invocation so Verify and Bench repeats
    * never collide, deleted on JVM exit. */
  private def scratchDir(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_$tag")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(p.toFile)
    }))
    p.toString
  }

  /** A CLONED session for a micro-batch GATE stream, its
    * `spark.sql.shuffle.partitions` sized to MICRO-BATCH volume instead
    * of the session's scan parallelism (guide §2.5 applied to
    * streaming): a gate's per-batch joins/aggregates move a few
    * thousand rows, and running every one of them through
    * scan-parallelism-many shuffle partitions is pure per-task
    * scheduling (and, for stateful gates, per-batch state-store
    * delta+CRC fsync) overhead — the dominant streaming lifecycle cost
    * once the plans themselves are lean. Parameterized, not a local[32]
    * constant: `SPARK_GRAFT_STREAM_SHUFFLE` overrides (production sets
    * it from expected per-trigger volume / target partition size —
    * e.g. a 100 GB-per-trigger feed wants hundreds of partitions);
    * the default 8 fits the few-thousand-key micro-batches these
    * fixtures drive at every bench SF. Cloning keeps the narrowed
    * setting out of session-global conf: nothing leaks into other
    * queries' plans and there is no restore race. Stage/compact/probe
    * steps stay on the CALLER's session — they are corpus-sized, not
    * micro-batch-sized. */
  private def streamSession(s: SparkSession): SparkSession = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_STREAM_SHUFFLE", "8"))
    ss
  }

  /** BPE training depth / word-table cap for `q_bpe_*` — small enough
    * that the oracle's unrolled CTE stages stay cheap, large enough to
    * exercise multi-char merge chains on the sf corpus. */
  private val BpeK = 8
  private val BpeMaxWords = 2000

  /** Sequence capacity shared by the no-split packing manifest and the
    * padding harness tuned against it (q_pack_nosplit / q_pack_eval,
    * Spark AND oracle sides) — one dial, no drift. */
  private val PackCapacity = 2048L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A1: hash aggregate (status group-count shape, TPC-H Q1 style) ----
    // map-side partial aggregation; one shuffle on the (2-value) group keys.
    "q1_agg" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- P1: per-namespace user filter from a Mongo query doc ----
    // ($in + comparison, as in reference testdata/data-only.json), compiled
    // to a Column so Catalyst pushes it into the parquet scan.
    "q_filter_in" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .filter(config.MongoPredicate.compile(
          """{"l_returnflag": {"$in": ["R"]}, "l_quantity": {"$gt": 45}}"""))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- P1 + extended-JSON $date filter (reference testdata/quickstart.json) ----
    "q_filter_date" -> ((s, dir) => {
      load(s, dir, "orders")
        .filter(config.MongoPredicate.compile(
          """{"o_orderdate": {"$gte": {"$date": "1999-01-01T00:00:00Z"}},
             "$or": [{"o_orderstatus": "F"}, {"o_totalprice": {"$lt": 1000}}]}"""))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // ---- S1: filtered range scan — user filter AND key∈[lo,hi] ----
    // (task.go:54-57); both predicates reach PushedFilters in the scan.
    "q_s1_range_scan" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .filter(config.MongoPredicate.compile("""{"l_returnflag": "R"}""")
          && col("l_orderkey").between(1000, 3000))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- P7: limit (unwired in the reference; wired here) ----
    // deterministic via sort; becomes TakeOrderedAndProject (no full sort).
    "q_p7_limit" -> ((s, dir) => {
      load(s, dir, "orders")
        .orderBy("o_orderkey")
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }),

    // ---- T1: default mask — every [a-zA-Z0-9] → X (mask.go:60-63) ----
    "q_t1_mask_default" -> ((s, dir) => {
      val df = load(s, dir, "customer")
      df.select(col("c_custkey"),
          ops.Mask.maskedValue(col("c_name"), ops.Mask.Default).as("name_masked"),
          col("c_mktsegment"))
        .orderBy("c_custkey")
    }),

    // ---- T2: partial mask — keep last 4 chars (mask.go:54-56) ----
    "q_t2_mask_partial" -> ((s, dir) => {
      val df = load(s, dir, "customer")
      df.select(col("c_custkey"),
          ops.Mask.maskedValue(col("c_name"), ops.Mask.Partial).as("name_masked"))
        .orderBy("c_custkey")
    }),

    // ---- T3: hex mask, deterministic variant (md5-prefix; SURVEY §7.4.4) ----
    "q_t3_mask_hash" -> ((s, dir) => {
      val df = load(s, dir, "customer")
      df.select(col("c_custkey"),
          ops.Mask.maskedValue(col("c_name"), ops.Mask.HexDeterministic).as("name_hex"))
        .orderBy("c_custkey")
    }),

    // ---- X1: range splitter — block-sized [first,last] bounds + counts ----
    // (splitter.go:76-102). Exact window variant; the scale path is
    // RangeSplitter.repartitionByKeyRange (sampling, no global sort).
    "q_x1_split_bounds" -> ((s, dir) =>
      ops.RangeSplitter.exactBounds(load(s, dir, "orders"), "o_orderkey", 1000)),

    // ---- A2: count-by-filter (task.go:96 reconciliation count) ----
    "q_a2_count" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .agg(count(lit(1)).as("cnt"))
    }),

    // ---- A4: sample + group (sim.go:244-247) ----
    // deterministic mod-sample so the oracle can reproduce it exactly;
    // production variant is df.sample(fraction).
    "q_a4_sample_group" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .filter(col("l_orderkey") % 10 === 3)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("total"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // ---- J1: cluster diff (-compare) — full-outer join + row fingerprint ----
    // (compare.go:13-31). Target derived from source with deterministic
    // perturbations (drops, mutations, extras); output = per-status counts.
    // The shared source lineage is cached so the scan feeds both sides.
    "q_j1_compare" -> ((s, dir) => {
      val (src, tgt) = compareFixture(s, dir)
      materialized(
        verify.Compare.diff(src, tgt, "k")
          .groupBy("status").agg(count(lit(1)).as("n"))
          .orderBy("status"),
        src)
    }),

    // ---- J1 scale path: bucket-sketch short-circuit diff — identical
    // buckets are declared all-match from a tiny pre-aggregation; only
    // rows of disagreeing buckets enter the row-level full-outer join.
    // The fixture diverges SPARSELY (a handful of keys), the case the
    // short-circuit exists for: nearly every bucket matches and skips
    // row-level work entirely. Dense-divergence correctness is pinned by
    // CompareSpec (diffBucketed == diff at several bucket counts).
    "q_j1_bucketed" -> ((s, dir) => {
      val o = load(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"))
        .persist()
      o.count(): Unit // eager: three subtrees reference o concurrently
      val kept = o.filter(col("k") % 9941 =!= 0)
      val tgt = kept
        .withColumn("o_totalprice",
          when(col("k") % 9973 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
        .unionByName(o.filter(col("k") % 9941 === 0)
          .withColumn("k", col("k") + 10000000L))
      materialized(
        verify.Compare.diffBucketed(o, tgt, "k", buckets = 512)
          .orderBy("status"),
        o)
    }),

    // ---- J2: dup-key reconciliation semi-join (task.go:95-97) ----
    "q_j2_semi" -> ((s, dir) => {
      val orders = load(s, dir, "orders")
      val batch = orders.filter(col("o_orderkey") <= 2000)
      val target = orders.filter(col("o_orderkey") % 2 === 0)
      verify.Compare.existingKeys(batch, target, "o_orderkey").orderBy("o_orderkey")
    }),

    // ================= LLM-data-pipeline operators (SURVEY §7.1-10) =====

    // ---- exact dedup: hash-groupBy over a corpus with planted duplicate
    // copies (no natural dups in the fixture). One map-side-combined
    // aggregate; the 100 TB plan is the same plan.
    "q_dedup_exact" -> ((s, dir) => {
      val d = load(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = d.unionByName(
        d.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 200000L).as("doc_id"), col("text")))
      text.Dedup.exact(corpus, "doc_id", col("text")).orderBy("content_hash")
    }),

    // ---- MinHash+LSH near-dup candidates: word-3-gram shingles → 16
    // seed-prefixed md5 minhashes → 8 bands of 2 → band-bucket self-join
    // (never all-pairs). Near-dups planted as text+tail copies.
    // lshCandidates* returns a materialized pair list with its own
    // intermediates already released (see Dedup scaladoc).
    "q_dedup_minhash" -> ((s, dir) =>
      text.Dedup.lshCandidates(nearDupCorpus(load(s, dir, "documents")),
        "doc_id", col("text")).orderBy("id_a", "id_b")),

    // ---- exact n-gram Jaccard verification of the LSH candidates — the
    // verify stage of the near-dup pipeline; cost is candidates×shingles.
    // Candidates come off the NARROW signature path (no shingle rows
    // materialized at all); the verify stage then shingles ONLY the docs
    // that appear in a candidate pair.
    "q_ngram_jaccard" -> ((s, dir) => {
      val corpus = nearDupCorpus(load(s, dir, "documents"))
      val cand = text.Dedup.lshCandidates(corpus, "doc_id", col("text"))
      text.Dedup.jaccardVerify(corpus, cand, "doc_id", col("text"))
        .orderBy("id_a", "id_b")
    }),

    // ---- dedup-harness twin of q_ann_recall: banding efficiency —
    // candidate volume vs exact-Jaccard-verified true pairs at the 0.6
    // threshold, integer per-mille precision. The number the LSH
    // (bands, rows) trade is tuned against ----
    "q_dedup_eval" -> ((s, dir) => {
      val corpus = nearDupCorpus(load(s, dir, "documents"))
      val cand = text.Dedup.lshCandidates(corpus, "doc_id", col("text"))
      text.Dedup.jaccardVerify(corpus, cand, "doc_id", col("text"))
        .agg(count(lit(1)).as("n_candidates"),
          sum((col("jaccard") >= 0.6).cast("long")).as("n_verified"))
        .withColumn("precision_permille",
          expr("(1000 * n_verified) DIV n_candidates"))
    }),

    // ---- cluster resolution: verified near-dup pairs → connected
    // components via min-label propagation — the step that turns pairs
    // into a deduped corpus (keep the component root, drop the rest).
    "q_dedup_resolve" -> ((s, dir) => {
      val corpus = nearDupCorpus(load(s, dir, "documents"))
      val cand = text.Dedup.lshCandidates(corpus, "doc_id", col("text"))
      // jaccardVerify output is materialized, so the edge set (read twice
      // by resolveClusters) and the propagation loop never re-derive it
      val verified = text.Dedup.jaccardVerify(corpus, cand, "doc_id", col("text"))
        .filter(col("jaccard") >= 0.6)
        .select("id_a", "id_b")
      text.Dedup.resolveClusters(corpus.select("doc_id"), verified)
        .select(col("id").as("doc_id"), col("root").as("cluster_root"),
          (col("id") === col("root")).cast("int").as("keep"))
        .orderBy("doc_id")
    }),

    // ---- brute-force top-k similarity (ANN baseline): broadcast query
    // set × corpus, QUANTIZED integer dot product (exact, engine-
    // agnostic), per-query window top-k.
    "q_sim_topk" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      ml.Similarity.bruteForceTopK(
          emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding", 5)
        .orderBy("query_id", "rank")
    }),

    // ---- SQ8 int8-quantized ANN: q_i = floor(127·x_i/max|x|) per
    // vector; the per-vector scale cancels in the cosine, so the
    // integer-micro score is a pure function of the int8 arrays — the
    // memory-bandwidth scale path (¼ the bytes of float32 per scanned
    // corpus vector) ----
    "q_ann_sq8" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      ml.Similarity.sq8TopK(emb.filter(col("vec_id") < 10), emb,
          "vec_id", "embedding", 5)
        .orderBy("query_id", "rank")
    }),

    // ---- embedding near-dup: quantized-cosine ≥ 0.9 pairs within a
    // label bucket (IVF-style candidate pruning); near-dups planted as
    // 1.1-scaled copies (cosine 1.0 with their original).
    "q_embed_neardup" -> ((s, dir) => {
      val e = load(s, dir, "embeddings").filter(col("vec_id") < 2000)
      val corpus = e.unionByName(
        e.filter(col("vec_id") % 10 === 0).select(
          (col("vec_id") + 100000L).as("vec_id"),
          transform(col("embedding"), x => (x.cast("double") * 1.1).cast("float"))
            .as("embedding"),
          col("label")))
      ml.Similarity.nearDupPairs(corpus, "vec_id", "embedding", "label")
        .select("id_a", "id_b", "dot_q").orderBy("id_a", "id_b")
    }),

    // ---- ANN scale path: sign-bit LSH buckets (IVF-style nprobe=1) ----
    // integer-exact hyperplane projections → bucket id; scoring only
    // within the query's bucket. The recall-vs-cost trade is the point:
    // candidates per query scale with bucket occupancy, not corpus size.
    "q_ann_lsh" -> ((s, dir) => {
      val e = load(s, dir, "embeddings").filter(col("vec_id") < 500)
        .withColumn("bucket", ml.Similarity.lshBucket(col("embedding"), 8, 64))
      ml.Similarity.bucketedTopK(
          e.filter(col("vec_id") < 50), e, "vec_id", "embedding", "bucket", 3)
        .orderBy("query_id", "rank")
    }),

    // ---- ANN scale path 2: IVF — deterministic coarse quantizer (the
    // numCentroids lowest-id vectors), corpus assigned by one narrow
    // literal-matrix projection, queries probe their nprobe nearest
    // lists. nprobe=numCentroids would reproduce brute force exactly.
    "q_ann_ivf" -> ((s, dir) => {
      val e = load(s, dir, "embeddings").filter(col("vec_id") < 1000)
      ml.Similarity.ivfTopK(e.filter(col("vec_id") < 50), e, "vec_id", "embedding",
          k = 3, numCentroids = 16, nprobe = 2)
        .orderBy("query_id", "rank")
    }),

    // ---- ANN scale path 3: product quantization (ADC scan) — corpus
    // stored as m=4 codeword ids (4 bytes/vector vs 256 float32), query
    // scores = m table lookups; codebook = deterministic init (the 16
    // lowest-id vectors' subvectors) so the oracle reproduces the index.
    "q_ann_pq" -> ((s, dir) => {
      val e = load(s, dir, "embeddings").filter(col("vec_id") < 1000)
      ml.Similarity.pqTopK(e.filter(col("vec_id") < 50), e, "vec_id",
          "embedding", k = 3, m = 4, ksub = 16)
        .orderBy("query_id", "rank")
    }),

    // ---- ANN scale path 4: IVF-PQ (the full FAISS recipe) — IVF list
    // pruning bounds WHICH candidates are scored, PQ ADC bounds the
    // bytes per scored candidate; one narrow corpus projection computes
    // both the list and the code ----
    "q_ann_ivfpq" -> ((s, dir) => {
      val e = load(s, dir, "embeddings").filter(col("vec_id") < 1000)
      ml.Similarity.ivfPqTopK(e.filter(col("vec_id") < 50), e, "vec_id",
          "embedding", k = 3, numCentroids = 8, nprobe = 2, m = 4, ksub = 16)
        .orderBy("query_id", "rank")
    }),

    // ---- materialized IVF-PQ: stage (id, code) parquet PARTITIONED BY
    // the IVF list + a kilobytes meta frame, then answer the query batch
    // from the index alone — the codes scan prunes to the probed lists
    // (PartitionFilters), the index-reuse shape of a retrieval service.
    // Same oracle as q_ann_ivfpq: staging must not change a single row.
    "q_ann_ivfpq_staged" -> ((s, dir) => {
      val e = load(s, dir, "embeddings").filter(col("vec_id") < 1000)
      val idx = scratchDir("ivfpq")
      ml.Similarity.stageIvfPq(e, "vec_id", "embedding",
        numCentroids = 8, m = 4, ksub = 16, dir = idx)
      ml.Similarity.stagedIvfPqTopK(s, idx, e.filter(col("vec_id") < 50),
          "vec_id", "embedding", k = 3, nprobe = 2)
        .orderBy("query_id", "rank")
    }),

    // ---- Lloyd-refined IVF: one integer Lloyd iteration (assign by
    // literal-matrix argmax, re-center by floorDiv of coordinate sums)
    // before the probe/scan — the production coarse quantizer; the
    // oracle unrolls the iteration component-wise with exact floor
    // division, pinning the refinement arithmetic end-to-end ----
    "q_ann_ivf_refined" -> ((s, dir) => {
      val e = load(s, dir, "embeddings").filter(col("vec_id") < 1000)
      val init = ml.Similarity.ivfCentroids(e, "vec_id", "embedding", 8)
      val cents = ml.Similarity.ivfRefine(e, "embedding", init, iters = 1)
      ml.Similarity.ivfTopK(e.filter(col("vec_id") < 50), e, "vec_id",
          "embedding", k = 3, numCentroids = 8, nprobe = 2,
          centroids = Some(cents))
        .orderBy("query_id", "rank")
    }),

    // ---- incremental index maintenance: stage the index on the first
    // half of the corpus, APPEND the second half against the frozen
    // centroids/codebook, query — must be row-identical to the direct
    // full-corpus scan (same oracle). Batch-proportional append cost;
    // existing codes untouched ----
    "q_ann_index_incr" -> ((s, dir) => {
      val e = load(s, dir, "embeddings").filter(col("vec_id") < 1000)
      val idx = scratchDir("ivfpq_incr")
      ml.Similarity.stageIvfPq(e.filter(col("vec_id") < 500), "vec_id",
        "embedding", numCentroids = 8, m = 4, ksub = 16, dir = idx)
      ml.Similarity.appendIvfPq(e.filter(col("vec_id") >= 500), "vec_id",
        "embedding", dir = idx)
      ml.Similarity.stagedIvfPqTopK(s, idx, e.filter(col("vec_id") < 50),
          "vec_id", "embedding", k = 3, nprobe = 2)
        .orderBy("query_id", "rank")
    }),

    // ---- streaming index ingest: bootstrap the index on the first
    // half, then drain the second half through a real Structured
    // Streaming source (2 files, 1 per micro-batch) via the SHARED
    // ingest entry point (DocStream.ingestStream — kind-dispatched on
    // the manifest, per-batch appendIvfPq) — the live-ingest shape of
    // a retrieval service. Same oracle as the direct full scan:
    // micro-batching must not change a row ----
    "q_st_index" -> ((s, dir) => {
      val e = load(s, dir, "embeddings").filter(col("vec_id") < 1000)
      val idx = scratchDir("ivfpq_st")
      val feed = scratchDir("ivfpq_feed")
      ml.Similarity.stageIvfPq(e.filter(col("vec_id") < 500), "vec_id",
        "embedding", numCentroids = 8, m = 4, ksub = 16, dir = idx)
      e.filter(col("vec_id") >= 500 && col("vec_id") < 750)
        .repartition(1).write.mode("append").parquet(s"$feed/in")
      e.filter(col("vec_id") >= 750)
        .repartition(1).write.mode("append").parquet(s"$feed/in")
      // gate stream on a micro-batch-sized-shuffle session (streamSession)
      streaming.DocStream.ingestStream(
          streamSession(s).readStream.schema(e.schema)
            .option("maxFilesPerTrigger", 1).parquet(s"$feed/in"),
          "vec_id", "embedding", idx, s"$feed/ckpt")
        .awaitTermination()
      ml.Similarity.stagedIvfPqTopK(s, idx, e.filter(col("vec_id") < 50),
          "vec_id", "embedding", k = 3, nprobe = 2)
        .orderBy("query_id", "rank")
    }),

    // ---- ANN quality harness on the declared surface: per-query recall
    // of the IVF index against the exact top-k — the number nprobe /
    // numCentroids are tuned against ----
    "q_ann_recall" -> ((s, dir) => {
      val e = load(s, dir, "embeddings").filter(col("vec_id") < 1000)
      val qs = e.filter(col("vec_id") < 50)
      val exact = ml.Similarity.bruteForceTopK(qs, e, "vec_id", "embedding", 3)
      val approx = ml.Similarity.ivfTopK(qs, e, "vec_id", "embedding",
        k = 3, numCentroids = 16, nprobe = 2)
      ml.Similarity.recallAtK(exact, approx).orderBy("query_id")
    }),

    // ---- learned quality gate: train token-level integer weights +
    // decision threshold on a labeled 1-in-3 split, then score EVERY
    // doc — the fastText-style classifier-filtering recipe (mean
    // centered token contribution, trained midpoint threshold),
    // ln/sigmoid-free so it is engine-exact. Supervision is a
    // text-derived deterministic label (token 'vector' present) — the
    // fixture's metadata labels are independent of its token soup; any
    // 0/1 column (human labels, an LLM judge) plugs in identically ----
    "q_quality_clf" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), col("text"),
          array_contains(text.QualityClassifier.featureTokens(col("text")),
            "vector").cast("int").as("label"))
      text.QualityClassifier.distill(docs, "doc_id", col("text"),
          train, col("text"), col("label"), minDf = 5, vocabSize = 512)
        .orderBy("doc_id")
    }),

    // ---- text quality statistics + integer quality score ----
    "q_text_stats" -> ((s, dir) =>
      text.TextFunctions.qualityStats(load(s, dir, "documents"), col("text"))
        .select("doc_id", "n_len", "n_tokens", "n_bpeish", "n_alpha", "n_digit",
          "alpha_ratio", "avg_token_len", "quality_score")
        .orderBy("doc_id")),

    // ---- character-entropy quality signal: one-pass native census
    // projection (zero shuffles); milli-nat quantization per LEVEL so
    // the per-doc sum is exact integer arithmetic ----
    "q_entropy" -> ((s, dir) =>
      load(s, dir, "documents")
        .filter(col("text").isNotNull && length(col("text")) > 0)
        .select(col("doc_id"),
          text.TextFunctions.charEntropyCol(col("text")).as("__e"))
        .select(col("doc_id"), col("__e.n_chars").as("n_chars"),
          col("__e.total_mnats").as("total_mnats"),
          col("__e.entropy_nats").as("entropy_nats"))
        .orderBy("doc_id")),

    // ---- language-ID: stopword-marker argmax heuristic ----
    "q_lang_id" -> ((s, dir) =>
      text.TextFunctions.languageId(load(s, dir, "documents"), col("text"))
        .select("doc_id", "lang", "en_n", "fr_n", "es_n", "de_n", "pred_lang")
        .orderBy("doc_id")),

    // ---- document fingerprint: min-md5 over the 12-char shingle set ----
    "q_fingerprint" -> ((s, dir) =>
      text.TextFunctions.fingerprint(load(s, dir, "documents"), "doc_id", col("text"))
        .orderBy("doc_id")),

    // ---- 16-bit SimHash signatures over the token multiset ----
    "q_simhash" -> ((s, dir) =>
      text.TextFunctions.simhash(load(s, dir, "documents"), "doc_id", col("text"))
        .orderBy("doc_id")),

    // ---- SimHash near-dup: 64-bit signature, 4×16-bit bands, exact
    // hamming ≤ 3 verify — banding is LOSSLESS by pigeonhole (3 flipped
    // bits dirty ≤ 3 of 4 bands). The cheapest near-dup family: one
    // 64-bit signature per doc, no shingle set ----
    "q_simhash_neardup" -> ((s, dir) =>
      text.Dedup.simhashCandidates(nearDupCorpus(load(s, dir, "documents")),
        "doc_id", col("text")).orderBy("id_a", "id_b")),

    // ---- deterministic train/val/test split: membership is a pure
    // function of (key, salt) — stable under retries, re-runs, and
    // appends, unlike rand()/randomSplit ----
    "q_split_assign" -> ((s, dir) =>
      text.Sampling.hashSplit(load(s, dir, "documents").select("doc_id"),
          col("doc_id"), "42",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "bucket", "split")
        .orderBy("doc_id")),

    // ---- Gopher-family repetition quality signals: dup-word, top-word
    // and dup-2-gram ratios in one narrow TokenStats pass per doc ----
    "q_repetition" -> ((s, dir) =>
      text.TextFunctions.repetitionStats(load(s, dir, "documents"),
          "doc_id", col("text"))
        .orderBy("doc_id")),

    // ---- corpus statistics: per-language doc counts, EXACT token-count
    // percentiles, mean quality — the profiling pass that sizes a
    // training corpus before filtering. Exact percentile is the oracle
    // anchor; the 100 TB paths are approx_percentile (t-digest, any
    // metric, ±error — pinned within tolerance by TextFunctionsSpec) or
    // ops.Quantiles.exactQuantiles (exact, integer metrics,
    // histogram-bounded — q_len_quantiles), same one-exchange shape ----
    "q_corpus_stats" -> ((s, dir) => {
      val d = text.TextFunctions.languageId(
        text.TextFunctions.qualityStats(load(s, dir, "documents"), col("text")),
        col("text"))
      d.groupBy("pred_lang", "quality_score").agg(
          count(lit(1)).as("n_docs"),
          percentile(col("n_tokens"), lit(0.5)).as("p50_tokens"),
          percentile(col("n_tokens"), lit(0.9)).as("p90_tokens"),
          percentile(col("n_tokens"), lit(0.99)).as("p99_tokens"),
          // avg over LONGS: the sum is exact integer arithmetic in any
          // engine (< 2^53), so the single division is deterministic —
          // an avg over doubles would be summation-order-dependent
          avg(col("n_bpeish")).as("avg_bpeish"))
        .orderBy("pred_lang", "quality_score")
    }),

    // ---- PII detect + scrub over free text; deterministic planted PII
    // (email/IP/phone derived from doc_id) on top of the fixture text ----
    "q_pii_scrub" -> ((s, dir) => {
      val d = load(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" contact u"), col("doc_id"), lit("@example.com ip 10.0."),
          col("doc_id") % 256, lit("."), col("doc_id") % 100,
          lit(" tel 555-123-4567")).as("text"))
      d.select(col("doc_id"),
          text.Pii.piiCounts(col("text")).as("__p"),
          text.Pii.scrub(col("text")).as("scrubbed"))
        .select(col("doc_id"),
          col("__p").getField("n_emails").as("n_emails"),
          col("__p").getField("n_ips").as("n_ips"),
          col("__p").getField("n_phones").as("n_phones"),
          col("scrubbed"))
        .orderBy("doc_id")
    }),

    // ---- the registered SQL surface: the same pipeline expressed in
    // pure spark.sql over GraftExtensions-registered functions — pins
    // the FunctionRegistry arg binding end-to-end against the oracle ----
    "q_sql_surface" -> ((s, dir) => {
      GraftFunctions.register(s) // idempotent; covers sessions graft didn't build
      load(s, dir, "documents").createOrReplaceTempView("graft_sql_docs")
      s.sql("""
        |SELECT doc_id,
        |  graft_fingerprint(text, 12).fingerprint AS fingerprint,
        |  graft_fingerprint(text, 12).n_shingles AS n_shingles,
        |  CAST(size(graft_tokens(text)) AS BIGINT) AS n_tokens,
        |  graft_simhash64(text) AS simhash64,
        |  graft_split_bucket(doc_id, '42') AS bucket,
        |  graft_token_stats(graft_tokens(text)).top_count AS top_tok_count,
        |  graft_mask(source, 'partial') AS source_masked
        |FROM graft_sql_docs
        |WHERE text IS NOT NULL
        |ORDER BY doc_id""".stripMargin)
    }),

    // ---- K2/T5/ST6/P4: change-log apply — the batch core of the
    // streaming pipeline (BulkWriteOplogs, oplog_utils.go:88-205). A
    // deterministic change-log derived from `orders` (inserts, v2-diff
    // updates, v1 $inc, an applyOps transaction, deletes, plus skip-
    // fodder P4 must drop) is compiled and folded onto the base state;
    // output is the final typed state. The streaming wiring around this
    // same code path (readStream → foreachBatch → checkpoint) is
    // exercised by ApplyJobSpec's kill-restart test.
    "q_k2_apply" -> ((s, dir) => {
      import s.implicits._
      val cfg = config.MigratorConfig(command = "data", source = "src", target = "tgt")
      val orders = load(s, dir, "orders")
      val k = col("o_orderkey")
      val base = orders.select(
        k.cast("string").as("id"),
        to_json(struct(k.as("_id"), col("o_custkey").as("custkey"),
          col("o_orderstatus").as("status"), col("o_totalprice").as("price"))).as("doc"))
      val ns = lit("app.orders_state")
      def op(ts: Long, opc: String, nsCol: org.apache.spark.sql.Column,
          o: org.apache.spark.sql.Column, o2: org.apache.spark.sql.Column) = Seq(
        lit(ts).as("ts"), lit(opc).as("op"), nsCol.as("ns"), o.as("o"), o2.as("o2"),
        lit(0L).as("h"), lit(0L).as("t"), lit(2).as("v"))
      val nullS = lit(null).cast("string")
      // insert ids offset far beyond any fixture's key range: at SF>=1
      // o_orderkey reaches 6e6, so a 5e6 offset would collide with base
      // keys and diverge from the oracle's UNION ALL
      val inserts = orders.filter(k % 10 === 0).select(op(1L, "i", ns,
        to_json(struct((k + 100000000L).as("_id"), col("o_custkey").as("custkey"),
          lit("N").as("status"), lit(1.5).as("price"))), nullS): _*)
      val v2Updates = orders.filter(k % 3 === 0).select(op(2L, "u", ns,
        to_json(struct(struct(struct(lit("X").as("status")).as("u")).as("diff"))),
        to_json(struct(k.as("_id")))): _*)
      val v1Incs = orders.filter(k % 5 === 0).select(op(3L, "u", ns,
        lit("""{"$v":1,"$inc":{"price":10}}"""), to_json(struct(k.as("_id")))): _*)
      val txns = orders.filter(k % 11 === 0).select(op(4L, "c", lit("app.$cmd"),
        format_string(
          """{"applyOps":[{"op":"u","ns":"app.orders_state","o":{"diff":{"u":{"custkey":%d}}},"o2":{"_id":%d}}]}""",
          col("o_custkey") + 1000000L, k), nullS): _*)
      val deletes = orders.filter(k % 7 === 0).select(op(5L, "d", ns,
        to_json(struct(k.as("_id"))), nullS): _*)
      // P4 skip-fodder: system-db insert + empty-ns no-op, both dropped
      val noise = orders.filter(k % 13 === 0).select(op(6L, "i", lit("local.junk"),
        lit("""{"_id":1}"""), nullS): _*)
      val noops = orders.filter(k % 13 === 0).select(op(6L, "n", lit(""),
        nullS, nullS): _*)
      val changelog = inserts.unionByName(v2Updates).unionByName(v1Incs)
        .unionByName(txns).unionByName(deletes).unionByName(noise).unionByName(noops)
      val ops = streaming.ApplyJob.compileOps(changelog.as[streaming.Oplog], cfg)
      streaming.ApplyJob.foldDocs(base, ops)
        .filter(col("doc").isNotNull)
        .select(
          get_json_object(col("doc"), "$._id").cast("long").as("k"),
          get_json_object(col("doc"), "$.custkey").cast("long").as("custkey"),
          get_json_object(col("doc"), "$.status").as("status"),
          get_json_object(col("doc"), "$.price").cast("double").as("price"))
        .orderBy("k")
    }),

    // ---- §7 streaming analytics: tumbling event-time window counts ----
    // the same code path runs under readStream with this watermark
    // (EventStreamSpec proves stream==batch); batch shape is the oracle.
    "q_w1_tumbling" -> ((s, dir) =>
      streaming.EventStream.tumblingCounts(load(s, dir, "events"))
        .orderBy("window_start", "event_type")),

    // ---- §7 streaming analytics: sliding windows (1h length, 15m
    // slide — each event in exactly 4 windows) ----
    "q_w3_sliding" -> ((s, dir) =>
      streaming.EventStream.slidingCounts(load(s, dir, "events"))
        .orderBy("window_start", "event_type")),

    // ---- §7 streaming analytics: per-user outlier counts in exact
    // squared-form arithmetic — no mean/stddev/sqrt, so the boundary
    // flags are bit-identical in any engine ----
    "q_outliers" -> ((s, dir) =>
      streaming.EventStream.outlierCounts(load(s, dir, "events"),
          col("user_id"), col("value"))
        .orderBy("user_id")),

    // ---- §7 streaming analytics: behavioral step funnel — users
    // completing signup, then click AFTER signup, then purchase AFTER
    // that click. One conditional aggregate per step + key joins; no
    // per-user sort/window (a bot user costs its aggregate rows only).
    // µs-truncated event times on both sides (DuckDB reads parquet ns
    // as µs) ----
    "q_funnel_steps" -> ((s, dir) => {
      val ev = load(s, dir, "events")
      streaming.EventStream.stepFunnel(ev,
        col("user_id"), col("event_type"), Tables.tsUs(ev),
        Seq("signup", "click", "purchase"))
    }),

    // ---- §7 streaming analytics: gap sessionization via
    // flatMapGroupsWithState (O(1) state per user; closed sessions emit
    // exactly once across micro-batches) ----
    "q_w2_sessions" -> ((s, dir) => {
      import s.implicits._
      val raw = load(s, dir, "events")
      val ev = raw
        .select(col("user_id"), Tables.tsUs(raw).as("tsUs"))
        .as[streaming.EventStream.SessionEvent]
      streaming.EventStream.sessionize(ev, gapUs = 3600L * 1000000).toDF()
        .orderBy("user_id", "session_start_us")
    }),

    // ---- T7: extJSON stringify (utils.go:17-23) — document wire form ----
    // to_json over the full row struct; byte-identical JSON in DuckDB for
    // the int/string column classes this table carries.
    "q_t7_stringify" -> ((s, dir) => {
      val n = load(s, dir, "nation")
      n.select(col("n_nationkey"),
          to_json(struct(n.columns.map(col).toIndexedSeq: _*)).as("doc"))
        .orderBy("n_nationkey")
    }),

    // ---- T4: nested-path mask traversal (structs + arrays of structs),
    // built from customer in-query since the fixture is flat; output is
    // canonical JSON so the oracle compares the full shape ----
    "q_t4_mask_nested" -> ((s, dir) => {
      val c = load(s, dir, "customer")
      val nested = c.select(col("c_custkey"),
        struct(col("c_name").as("name"),
          struct(col("c_mktsegment").as("segment"), col("c_name").as("contact"))
            .as("info")).as("doc"),
        array(struct(col("c_name").as("alias")),
          struct(col("c_mktsegment").as("alias"))).as("aliases"))
      val masked = ops.Mask.maskFields(nested,
        Seq("doc.info.contact", "aliases.alias"), ops.Mask.Default)
      masked.select(col("c_custkey"), to_json(col("doc")).as("doc_json"),
          to_json(col("aliases")).as("aliases_json"))
        .orderBy("c_custkey")
    }),

    // ---- T4, DYNAMIC half (SURVEY §2.12): masking a dotted path inside
    // a JSON-STRING column whose rows carry heterogeneous shapes — no
    // DataFrame schema exists, so the withField rewrite can't apply.
    // Three shapes share one column: user.ssn present / absent / ssn
    // under an ARRAY of objects. One native expression per row
    // (functions/JsonMask — Jackson walk, Mask.rewrite semantics);
    // outputs re-EXTRACT from the masked JSON so the oracle pins the
    // traversal (masked where present, no-op where absent, siblings
    // untouched) without comparing serialization bytes ----
    "q_mask_dynamic" -> ((s, dir) => {
      val c = load(s, dir, "customer")
      val doc = when(pmod(col("c_custkey"), lit(3)) === 0,
          to_json(struct(
            struct(col("c_name").as("ssn"), col("c_name").as("name")).as("user"),
            col("c_mktsegment").as("seg"))))
        .when(pmod(col("c_custkey"), lit(3)) === 1,
          to_json(struct(
            struct(col("c_name").as("name")).as("user"),
            col("c_mktsegment").as("seg"))))
        .otherwise(
          to_json(struct(
            array(struct(col("c_name").as("ssn")),
              struct(col("c_mktsegment").as("ssn"))).as("accounts"),
            col("c_mktsegment").as("seg"))))
      val masked = ops.Mask.maskJson(
        ops.Mask.maskJson(doc, "user.ssn", ops.Mask.Default),
        "accounts.ssn", ops.Mask.Default)
      c.select(col("c_custkey"), masked.as("__m"))
        .select(col("c_custkey"),
          get_json_object(col("__m"), "$.user.ssn").as("ssn_masked"),
          get_json_object(col("__m"), "$.user.name").as("name_kept"),
          get_json_object(col("__m"), "$.accounts[0].ssn").as("acct0_masked"),
          get_json_object(col("__m"), "$.accounts[1].ssn").as("acct1_masked"),
          get_json_object(col("__m"), "$.seg").as("seg_kept"))
        .orderBy("c_custkey")
    }),

    // ---- skew mitigation correctness: the salted join and the
    // two-level salted aggregate must produce EXACTLY the plain
    // join/groupBy results (the oracle computes the unsalted form) ----
    "q_skew_join" -> ((s, dir) => {
      val o = load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey").as("custkey"))
      val c = load(s, dir, "customer")
        .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
      ops.Skew.saltedJoin(o, c, Seq("custkey"), buckets = 8,
          saltCols = Seq(col("o_orderkey")))
        .select(col("o_orderkey"), col("custkey"), col("c_mktsegment"))
        .orderBy("o_orderkey")
    }),

    "q_skew_agg" -> ((s, dir) => {
      val c = load(s, dir, "customer")
      ops.Skew.saltedAggregate(c, "c_mktsegment", buckets = 8,
          partial = Seq(collect_list(col("c_custkey")).as("__part"),
            count(lit(1)).as("__n")),
          merge = Seq(
            md5(concat_ws(",", array_sort(flatten(collect_list(col("__part"))))))
              .as("keys_md5"),
            sum(col("__n")).as("n")),
          saltCols = Seq(col("c_custkey")))
        .orderBy("c_mktsegment")
    }),

    // ---- the BSON cross-type ordering invariant: mixed int/string
    // canonical-JSON ids rank numbers-before-strings, numerically within
    // the number band ("2" < "150") — the default splitter/compare order ----
    "q_bson_order" -> ((s, dir) => {
      val c = load(s, dir, "customer")
      val ids = c.select(
        when(col("c_custkey") % 2 === 0, col("c_custkey").cast("string"))
          .otherwise(concat(lit("\""), col("c_name"), lit("\""))).as("id"))
      ids.withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(
            ops.BsonKey.sortKey(col("id")))))
        .orderBy("id")
    }),

    // ---- T8/T9: lenient casts + URI redaction as engine expressions ----
    "q_convert" -> ((s, dir) => {
      val o = load(s, dir, "orders")
      o.select(col("o_orderkey"),
          // "1-URGENT" → substr "1" parses; the full value doesn't
          util.Convert.toFloat64Col(
            substring(col("o_orderpriority"), 1, 1)).as("f_pri"),
          isnan(util.Convert.toFloat64Col(col("o_orderpriority"))).as("bad_is_nan"),
          util.Convert.toInt64Col(col("o_orderkey").cast("string")).as("key_back"),
          util.Convert.redactedUriCol(concat(lit("mongodb://user"),
            col("o_custkey").cast("string"),
            lit(":secret@cluster0.example.net:27017/admin"))).as("uri_redacted"))
        .orderBy("o_orderkey")
    }),

    // ---- T10: spool-file timestamp formatting over event times ----
    "q_t10_stamp" -> ((s, dir) => {
      val ev = load(s, dir, "events").filter(col("event_id") < 2000)
      ev.select(col("event_id"),
          util.Convert.stampCol(timestamp_micros(Tables.tsUs(ev))).as("stamp"))
        .orderBy("event_id")
    }),

    // ================= multimodal / binary payload operators ============
    // The fixture has no native binary column, so the payload is the
    // utf-8 bytes of `text` (cast to binary) — all-ASCII in this fixture,
    // so the DuckDB oracle computes the same bytes from the varchar side.

    // ---- typed metadata over an opaque binary payload ----
    "q_mm_meta" -> ((s, dir) => {
      val d = load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      mm.BinaryOps.withMetadata(d, col("payload"))
        .select("doc_id", "n_bytes", "content_hash", "magic_hex", "n_chunks")
        .orderBy("doc_id")
    }),

    // ---- binary content-hash exact dedup (planted duplicate payloads) ----
    "q_mm_binary_dedup" -> ((s, dir) => {
      val d = load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      val corpus = d.unionByName(d.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 300000L).as("doc_id"), col("payload")))
      mm.BinaryOps.contentDedup(corpus, "doc_id", col("payload"))
        .orderBy("content_hash")
    }),

    // ---- chunk-level dedup: fixed 256-byte chunks, shared across docs ----
    "q_mm_chunk_dedup" -> ((s, dir) => {
      val d = load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      val corpus = d.unionByName(d.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 300000L).as("doc_id"), col("payload")))
      mm.BinaryOps.chunks(corpus, "doc_id", col("payload"), 256)
        .groupBy("chunk_md5")
        .agg(count(lit(1)).as("n_refs"), min("doc_id").as("first_doc"))
        .filter(col("n_refs") > 1)
        .orderBy("chunk_md5")
    }),

    // ---- multimodal: keyframe sampling — every 3rd 128-byte frame,
    // fingerprinted, no decode ----
    "q_mm_frames" -> ((s, dir) => {
      val d = load(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      mm.BinaryOps.frameSample(d, "doc_id", col("payload"), 128, 3)
        .select("doc_id", "frame_idx", "frame_md5", "frame_bytes")
        .orderBy("doc_id", "frame_idx")
    }),

    // ---- multimodal: resize planning over decoded metadata (integer
    // box arithmetic; pixel work stays in the codec seam) ----
    "q_mm_resize" -> ((s, dir) => {
      val d = load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      mm.BinaryOps.resizeSpec(
          mm.BinaryOps.decodeStub(d, "doc_id", col("payload")), 512)
        .select(col("doc_id"), col("width"), col("height"),
          col("target_width"), col("target_height"))
        .orderBy("doc_id")
    }),

    // ---- multimodal: REAL image decode (javax.imageio, JDK-only)
    // over REAL synthetic PNGs — the engine must parse actual PNG
    // headers to recover the dimensions the oracle recomputes
    // arithmetically from the generator's id → (w, h) rule; a decode
    // that didn't read the bytes could not match ----
    "q_mm_decode_real" -> ((s, dir) => {
      val ids = load(s, dir, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 300)
        .withColumn("w", lit(16L) + pmod(col("doc_id") * 7, lit(97L)))
        .withColumn("h", lit(16L) + pmod(col("doc_id") * 11, lit(83L)))
      val pngs = mm.BinaryOps.syntheticPngs(ids, "doc_id", col("w"), col("h"))
      mm.BinaryOps.decodeWith(pngs, "doc_id", col("payload"))(
          mm.BinaryOps.imageIoCodec _).toDF()
        .select(col("id").as("doc_id"), col("width"), col("height"),
          col("format"), col("decode_ok"))
        .orderBy("doc_id")
    }),

    // ---- multimodal: REAL image resize (ImageIO decode → bilinear
    // Graphics2D scale → PNG re-encode) — the resized bytes are
    // RE-DECODED and their pixel dimensions must equal the resizeSpec
    // target box the oracle computes arithmetically: the pin that
    // actual pixel work happened, not just box planning ----
    "q_mm_resize_real" -> ((s, dir) => {
      val ids = load(s, dir, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 300)
        .withColumn("w", lit(16L) + pmod(col("doc_id") * 7, lit(97L)))
        .withColumn("h", lit(16L) + pmod(col("doc_id") * 11, lit(83L)))
      val pngs = mm.BinaryOps.syntheticPngs(ids, "doc_id", col("w"), col("h"))
      val rs = mm.BinaryOps.resizeImages(pngs, "doc_id", col("payload"),
        maxDim = 64).toDF()
      val redec = mm.BinaryOps.decodeWith(rs, "id", col("png"))(
          mm.BinaryOps.imageIoCodec _).toDF()
        .select(col("id").as("doc_id"), col("width").as("out_width"),
          col("height").as("out_height"))
      rs.select(col("id").as("doc_id"), col("width"), col("height"),
          col("target_width"), col("target_height"))
        .join(redec, Seq("doc_id"))
        .orderBy("doc_id")
    }),

    // ---- multimodal: REAL audio/video container metadata (JDK-only
    // byte walks — graft.mm.AvOps): the engine chunk-walks real RIFF
    // WAV bytes and box-walks real ISO-BMFF MP4 bytes (generated from
    // id → metadata rules, samples/mdat skipped by length) to recover
    // duration / sample rate / channels / display dims; the oracle
    // recomputes the rules arithmetically — equality proves the walks
    // read the actual containers. The imageIoCodec header-only
    // discipline extended to the other two media families ----
    "q_mm_av_meta" -> ((s, dir) => {
      val ids = load(s, dir, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 400)
        .withColumn("kind",
          when(col("doc_id") % 2 === 0, "wav").otherwise("mp4"))
        .withColumn("a", when(col("kind") === "wav",
            lit(8000L) + pmod(col("doc_id") * 13, lit(32L)) * 250L)
          .otherwise(lit(160L) + pmod(col("doc_id") * 7, lit(481L))))
        .withColumn("b", when(col("kind") === "wav",
            lit(1L) + (pmod(col("doc_id"), lit(4L)) / 2).cast("long"))
          .otherwise(lit(90L) + pmod(col("doc_id") * 11, lit(271L))))
        .withColumn("c", when(col("kind") === "wav",
            lit(400L) + pmod(col("doc_id") * 17, lit(1200L)))
          .otherwise(lit(1000L) + pmod(col("doc_id") * 19, lit(60000L))))
      val av = mm.AvOps.syntheticAv(ids, "doc_id", col("kind"),
        col("a"), col("b"), col("c"))
      mm.AvOps.metaWith(av, "doc_id", col("payload"))(
          mm.AvOps.avMetaCodec _).toDF()
        .select(col("id").as("doc_id"), col("container"),
          col("duration_ms"), col("sample_rate"), col("channels"),
          col("width"), col("height"), col("decode_ok"))
        .orderBy("doc_id")
    }),

    // ---- multimodal: stub feature extraction → the ANN pipeline's
    // exact quantized-integer norm (the embedding column any real
    // extractor would feed into ml.Similarity unchanged) ----
    "q_mm_features" -> ((s, dir) => {
      val d = load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      mm.BinaryOps.featureStub(d, "doc_id", col("payload"), 8)
        .select(col("doc_id"),
          ml.Similarity.dotQ(ml.Similarity.quantize(col("embedding")),
            ml.Similarity.quantize(col("embedding"))).as("qnorm"))
        .orderBy("doc_id")
    }),

    // ---- multimodal: content-defined chunking — boundaries are a pure
    // function of LOCAL bytes (md5-window rule, native one-pass
    // expression), so chunks re-synchronize after insertions and a
    // shifted copy still shares its tail chunks, where fixed-width
    // chunking (q_mm_chunk_dedup) shares nothing. Fixture plants
    // prefix-shifted copies; output = chunks shared across docs ----
    "q_mm_cdc" -> ((s, dir) => {
      val base = load(s, dir, "documents").filter(col("text").isNotNull)
      val corpus = base
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .unionByName(base.filter(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 300000L).as("doc_id"),
            concat(lit("SHIFT: "), col("text")).cast("binary").as("payload")))
      mm.BinaryOps.cdcChunks(corpus, "doc_id", col("payload"))
        .groupBy("chunk_md5")
        .agg(count(lit(1)).as("n_refs"), min("doc_id").as("first_doc"),
          min("chunk_len").as("chunk_len"))
        .filter(col("n_refs") > 1)
        .orderBy("chunk_md5")
    }),

    // ---- vocabulary building: top-1000 tokens by corpus frequency with
    // exact document frequencies (the 100 TB swap-in for doc_freq is
    // approx_count_distinct; see scaladoc) ----
    "q_vocab" -> ((s, dir) =>
      text.TextFunctions.vocabulary(load(s, dir, "documents"), "doc_id",
          col("text"), 1000)
        .orderBy(col("n").desc, col("tok"))),

    // ---- held-out surprisal: unigram model FROZEN on the train split,
    // Laplace-smoothed scoring of val — the cross-split perplexity-eval
    // shape the self-trained q_surprisal defers to callers ----
    "q_surprisal_heldout" -> ((s, dir) => {
      val sp = text.Sampling.hashSplit(load(s, dir, "documents"),
        col("doc_id"), "42", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      text.TextFunctions.unigramSurprisalFrozen(
          sp.filter(col("split") === "train"),
          sp.filter(col("split") === "val"), "doc_id", col("text"))
        .orderBy("doc_id")
    }),

    // ---- CCNet-style perplexity bucketing (Wenzek et al. 2020): each
    // language's docs split into head/middle/tail surprisal terciles —
    // "keep the head, sample the middle, drop the tail". Integer
    // milli-nats per token, tercile cuts via the grouped HISTOGRAM
    // quantile route (never a per-language row sort), integer label
    // rule → identical buckets in any engine (Curation.perplexityBuckets). ----
    "q_ccnet_buckets" -> ((s, dir) =>
      text.Curation.perplexityBuckets(load(s, dir, "documents"), "doc_id",
          col("text"), col("lang"))
        .orderBy("doc_id")),

    // ---- Zipf rank-frequency fit: least squares over the log-log
    // top-1000 vocabulary (micro-nat quantized, decimal-exact sums,
    // one fixed IEEE tree) — corpus-health next to q_vocab_drift ----
    "q_zipf" -> ((s, dir) =>
      text.TextFunctions.zipfFit(load(s, dir, "documents"), "doc_id",
        col("text"), 1000)),

    // ---- BPE tokenizer training (Sennrich et al. 2016): distributed
    // merge learning — corpus-sized work is ONE token groupBy + ONE
    // broadcast join; the k-round loop runs on the capped
    // word-frequency table with per-WORD windows (run-parity greedy
    // merge, no sequential fold). The oracle unrolls the loop as CTE
    // stages ----
    "q_bpe_merges" -> ((s, dir) => {
      val (merges, _) = text.Bpe.trainMerges(load(s, dir, "documents"),
        col("text"), BpeK, BpeMaxWords)
      merges.orderBy("rank")
    }),
    "q_bpe_fertility" -> ((s, dir) => {
      val d = load(s, dir, "documents")
      val (_, syms) = text.Bpe.trainMerges(d, col("text"), BpeK, BpeMaxWords)
      text.Bpe.fertility(d, "doc_id", col("text"), syms).orderBy("doc_id")
    }),
    // ---- tokenize a DIFFERENT table under the documents-trained model:
    // the learned merge list replays over the batch's distinct words
    // (unseen words still merge by the learned rules) ----
    "q_bpe_encode" -> ((s, dir) => {
      val (mergesDf, _) = text.Bpe.trainMerges(load(s, dir, "documents"),
        col("text"), BpeK, BpeMaxWords)
      val merges = text.Bpe.mergeSeq(mergesDf)
      text.Bpe.encode(
          load(s, dir, "part").filter(col("p_partkey") % 7 === 0),
          "p_partkey", col("p_name"), merges)
        .orderBy("p_partkey")
    }),

    // ---- benchmark decontamination: corpus docs sharing a 13-word
    // n-gram with the benchmark set (every 50th doc plays the leaked
    // eval doc); benchmark n-grams broadcast, corpus never shuffles ----
    "q_decontaminate" -> ((s, dir) => {
      val d = load(s, dir, "documents")
      val bench = d.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("bench_id"), col("text"))
      text.Dedup.contaminated(d, "doc_id", bench, "bench_id", col("text"))
        .orderBy("doc_id")
    }),

    // ---- corpus boilerplate share: df census over per-doc distinct
    // word-5-grams (≥3 docs ⇒ boilerplate), probed back co-partitioned
    // on the gram key — the repeated-phrase gate; share is exact
    // integer per-mille ----
    "q_boilerplate" -> ((s, dir) =>
      text.Dedup.boilerplateShare(load(s, dir, "documents"), "doc_id",
          col("text"))
        .orderBy("doc_id")),

    // ---- duplicated-span detection (suffix-array-style substring dedup
    // at word-13-gram granularity): census exchange + semi-join back,
    // gaps-and-islands span merge under a per-doc (bounded) window ----
    "q_dup_spans" -> ((s, dir) => {
      val d = load(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = d.unionByName(
        d.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 200000L).as("doc_id"), col("text")))
      text.Dedup.dupSpans(corpus, "doc_id", col("text")).orderBy("doc_id")
    }),

    // ---- Gopher document-quality rules: seven shape heuristics as one
    // codegen'd projection, every ratio cross-multiplied to integers ----
    "q_gopher_gate" -> ((s, dir) =>
      text.Curation.gopherGate(load(s, dir, "documents"), "doc_id",
          col("text"))
        .orderBy("doc_id")),

    // ---- quote-inclusion containment: candidates share a
    // non-ubiquitous LINE (bucket-capped, output-sensitive); verify is
    // one-way shingle containment — the asymmetric near-dup Jaccard
    // dilutes. Planted excerpts (lines 3-5 of every 11th doc) are the
    // embedded-quote fixture ----
    "q_containment" -> ((s, dir) => {
      val base = lineCorpus(load(s, dir, "documents"))
      val corpus = base.unionByName(
        base.filter(col("doc_id") % 11 === 0 && col("doc_id") < 300000)
          .select((col("doc_id") + 400000L).as("doc_id"),
            array_join(slice(split(col("text"), "\n"), 3, 3), "\n")
              .as("text")))
      text.Dedup.containmentPairs(corpus, "doc_id", col("text"),
          minPermille = 500, maxBucket = 100)
        .orderBy("id_a", "id_b")
    }),

    // ---- exact token-length quantiles via the histogram route: no
    // corpus-sized sort or buffer anywhere; the only unpartitioned
    // window runs over DISTINCT lengths (bounded cardinality) ----
    "q_len_quantiles" -> ((s, dir) =>
      ops.Quantiles.exactQuantiles(
          load(s, dir, "documents").filter(col("text").isNotNull),
          size(text.TextFunctions.whitespaceTokens(col("text"))),
          Seq(250, 500, 750, 900, 950, 990, 1000))
        .orderBy("q_mille")),

    // ---- vocabulary drift between snapshots (KL(a||b), add-one
    // smoothed, integer-quantized): two token counts meet in one
    // full-outer term join; totals ride a broadcast 1-row stats join ----
    "q_vocab_drift" -> ((s, dir) => {
      val d = load(s, dir, "documents")
      text.TextFunctions.vocabDrift(
          d.filter(col("lang") === "en"), d.filter(col("lang") =!= "en"),
          col("text"))
        .orderBy("term")
    }),

    // ---- curation funnel (the data-card counts): every gate evaluated
    // as an annotation, ONE aggregation folds the whole funnel — one
    // corpus scan instead of a count per stage ----
    "q_funnel" -> ((s, dir) => {
      val d = load(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = d.unionByName(
        d.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 200000L).as("doc_id"), col("text")))
      text.Curation.funnel(corpus, "doc_id", col("text"))
    }),

    // ---- incremental exact dedup: which docs of a new batch are
    // genuinely new vs an existing reference corpus — batch-internal
    // dups collapse to the min id first, then one anti-join on the
    // content hash (the new-crawl admission check) ----
    "q_dedup_new" -> ((s, dir) => {
      val d = load(s, dir, "documents").select(col("doc_id"), col("text"))
      val reference = d.filter(col("doc_id") % 2 === 0)
      // batch: copies of reference docs (%6==0 — must be rejected),
      // odd-id docs (absent from reference — admitted), and an
      // in-batch duplicate pair (+900000 copies — one admitted)
      val batch = d.filter(col("doc_id") % 2 === 1)
        .unionByName(d.filter(col("doc_id") % 6 === 0)
          .select((col("doc_id") + 800000L).as("doc_id"), col("text")))
        .unionByName(d.filter(col("doc_id") % 2 === 1 && col("doc_id") % 7 === 0)
          .select((col("doc_id") + 900000L).as("doc_id"), col("text")))
      text.Dedup.exactNew(batch, reference, "doc_id", col("text"))
        .select("doc_id").orderBy("doc_id")
    }),

    // ---- incremental NEAR-dup probe: batch band signatures probe the
    // reference band index — batch×reference pairs only, never
    // batch×batch or reference×reference; probe cost scales with the
    // batch. Fixture: tail-mutated copies of every 10th reference doc ----
    "q_dedup_new_lsh" -> ((s, dir) => {
      val d = load(s, dir, "documents").select(col("doc_id"), col("text"))
      val reference = d.filter(col("doc_id") % 2 === 0)
      val batch = reference.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 500000L).as("doc_id"),
          concat(col("text"), lit(" near duplicate tail")).as("text"))
      text.Dedup.lshNewCandidates(batch, reference, "doc_id", col("text"))
        .orderBy("batch_id", "ref_id")
    }),

    // ---- the STAGED band index: the reference band table materialized
    // under a frozen signature recipe (the fourth staged kind — BM25
    // postings, gram census, IVF-PQ codes, minhash bands), half staged
    // + half appended (new-ids guard live), probed at batch-
    // proportional cost with the bands scan pruned to the batch's
    // bucket partitions. SAME oracle as q_dedup_new_lsh: staging,
    // appending, and pruning must not change a candidate pair ----
    "q_dedup_new_lsh_staged" -> ((s, dir) => {
      val d = load(s, dir, "documents").select(col("doc_id"), col("text"))
      val reference = d.filter(col("doc_id") % 2 === 0)
      val batch = reference.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 500000L).as("doc_id"),
          concat(col("text"), lit(" near duplicate tail")).as("text"))
      val idx = scratchDir("lshidx")
      text.Dedup.stageBandIndex(reference.filter(col("doc_id") % 4 === 0),
        "doc_id", col("text"), dir = idx)
      text.Dedup.appendBandIndex(reference.filter(col("doc_id") % 4 === 2),
        "doc_id", col("text"), idx)
      text.Dedup.lshNewCandidatesStaged(batch, "doc_id", col("text"), idx)
        .orderBy("batch_id", "ref_id")
    }),

    // ---- the STAGED fingerprint set: the reference content hashes
    // materialized as the FIFTH staged kind (the StagedIndex trait's
    // cheap-fifth-kind proof), half staged + half appended, driven
    // through the real -index CLI (build/append/query), probed at
    // batch-proportional cost with the fp scan pruned to the batch's
    // hash buckets. SAME oracle as q_dedup_new: staging, appending,
    // and pruning must not change an admission decision ----
    "q_dedup_new_staged" -> ((s, dir) => {
      val d = load(s, dir, "documents").select(col("doc_id"), col("text"))
      val reference = d.filter(col("doc_id") % 2 === 0)
      val batch = d.filter(col("doc_id") % 2 === 1)
        .unionByName(d.filter(col("doc_id") % 6 === 0)
          .select((col("doc_id") + 800000L).as("doc_id"), col("text")))
        .unionByName(d.filter(col("doc_id") % 2 === 1 && col("doc_id") % 7 === 0)
          .select((col("doc_id") + 900000L).as("doc_id"), col("text")))
      val src = scratchDir("fpidx")
      val idx = s"$src/fpidx"
      reference.filter(col("doc_id") % 4 === 0)
        .write.parquet(s"$src/ref1.parquet")
      reference.filter(col("doc_id") % 4 === 2)
        .write.parquet(s"$src/ref2.parquet")
      batch.write.parquet(s"$src/probe.parquet")
      def cli(name: String, json: String): Unit = {
        val p = java.nio.file.Files.write(
          java.nio.file.Paths.get(src, s"$name.json"),
          json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        require(Main.run(Seq("-index", p.toString), () => s) == 0,
          s"-index $name failed")
      }
      cli("build", s"""{"index":"$idx","action":"build","source":"$src",""" +
        s""""namespace":"local.ref1","kind":"fp","buckets":16}""")
      cli("append", s"""{"index":"$idx","action":"append","source":"$src",""" +
        s""""namespace":"local.ref2","kind":"fp"}""")
      cli("query", s"""{"index":"$idx","action":"query","source":"$src",""" +
        s""""namespace":"local.probe","kind":"fp","out":"$src/admitted"}""")
      s.read.parquet(s"$src/admitted").select("doc_id").orderBy("doc_id")
    }),

    // ---- the staged fingerprint probe on its BULK path: broadcastCap
    // = 0 forces the shuffle-semi-join strategy a backfill batch above
    // the adaptive cap takes (the small path broadcasts) — SAME oracle
    // as the direct/Bloom/staged runs: the join strategy must not
    // change an admission decision ----
    "q_dedup_new_staged_bulk" -> ((s, dir) => {
      val d = load(s, dir, "documents").select(col("doc_id"), col("text"))
      val reference = d.filter(col("doc_id") % 2 === 0)
      val batch = d.filter(col("doc_id") % 2 === 1)
        .unionByName(d.filter(col("doc_id") % 6 === 0)
          .select((col("doc_id") + 800000L).as("doc_id"), col("text")))
        .unionByName(d.filter(col("doc_id") % 2 === 1 && col("doc_id") % 7 === 0)
          .select((col("doc_id") + 900000L).as("doc_id"), col("text")))
      val idx = scratchDir("fpbulk")
      text.Dedup.stageFingerprints(reference.filter(col("doc_id") % 4 === 0),
        col("text"), idx, buckets = 16)
      text.Dedup.appendFingerprints(
        reference.filter(col("doc_id") % 4 === 2), col("text"), idx)
      text.Dedup.exactNewStaged(batch, "doc_id", col("text"), idx,
          broadcastCap = 0)
        .select("doc_id").orderBy("doc_id")
    }),

    // ---- the same admission check through the Bloom-prefiltered
    // reference scan — SAME exact answer (the oracle is identical),
    // constant-size broadcast instead of the batch-hash set ----
    "q_dedup_new_bloom" -> ((s, dir) => {
      val d = load(s, dir, "documents").select(col("doc_id"), col("text"))
      val reference = d.filter(col("doc_id") % 2 === 0)
      val batch = d.filter(col("doc_id") % 2 === 1)
        .unionByName(d.filter(col("doc_id") % 6 === 0)
          .select((col("doc_id") + 800000L).as("doc_id"), col("text")))
        .unionByName(d.filter(col("doc_id") % 2 === 1 && col("doc_id") % 7 === 0)
          .select((col("doc_id") + 900000L).as("doc_id"), col("text")))
      text.Dedup.exactNewBloom(batch, reference, "doc_id", col("text"))
        .select("doc_id").orderBy("doc_id")
    }),

    // ---- unigram-LM surprisal (CCNet-style quality signal): per-token
    // −log p quantized to integer milli-nats before the per-doc sum, so
    // the aggregate is engine-exact; the model broadcasts ----
    "q_surprisal" -> ((s, dir) =>
      text.TextFunctions.unigramSurprisal(load(s, dir, "documents"),
          "doc_id", col("text"))
        .orderBy("doc_id")),

    // ---- bigram-LM surprisal: each token scored by p(w_i | w_{i-1})
    // from a corpus-trained bigram model (first token backs off to the
    // unigram model), milli-nat quantized before the per-doc sum.
    // The prev token is carried NARROW from the token array — no
    // positions self-join ----
    "q_surprisal_bigram" -> ((s, dir) =>
      text.TextFunctions.bigramSurprisal(load(s, dir, "documents"),
          "doc_id", col("text"))
        .orderBy("doc_id")),

    // ---- DSIR importance weighting: hashed unigram+bigram histogram
    // log-ratios (target = the 'en' slice vs the raw pool), per-bucket
    // ratio quantized to integer milli-nats BEFORE the per-doc sum —
    // engine-exact; histograms and ratio table broadcast ----
    "q_dsir" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      text.Dsir.importanceScores(docs, docs.filter(col("lang") === "en"),
          "doc_id", col("text"), buckets = 1024)
        .orderBy("doc_id")
    }),

    // ---- temperature-scaled domain sampling (α = 1/2): skewed strata
    // (8:4:2:1:1 over doc_id%16) damped toward balance under one global
    // document budget; weights floor(10⁶·√(n/N)) are IEEE-exact in any
    // engine, targets/thresholds are pure integer arithmetic, admission
    // is the md5 hash bucket — no corpus shuffle, no sort ----
    "q_mix_temperature" -> ((s, dir) => {
      val domain = when(col("doc_id") % 16 < 8, "web")
        .when(col("doc_id") % 16 < 12, "books")
        .when(col("doc_id") % 16 < 14, "code")
        .when(col("doc_id") % 16 < 15, "wiki")
        .otherwise("academic")
      text.Mixing.temperatureSample(load(s, dir, "documents"),
          "doc_id", domain, targetTotal = 150)
        .orderBy("doc_id")
    }),

    // ---- semantic dedup (SemDeDup): IVF-cluster the embedding space,
    // quantized-cosine ≥ 0.9 pairs WITHIN each cluster, keep the min-id
    // root per connected component; near-dups planted as 1.1-scaled
    // copies (cosine 1.0 with their original) ----
    "q_semantic_dedup" -> ((s, dir) => {
      val e = load(s, dir, "embeddings").filter(col("vec_id") < 1500)
        .select("vec_id", "embedding")
      val corpus = e.unionByName(
        e.filter(col("vec_id") % 7 === 0).select(
          (col("vec_id") + 100000L).as("vec_id"),
          transform(col("embedding"), x => (x.cast("double") * 1.1).cast("float"))
            .as("embedding")))
      ml.Similarity.semanticDedup(corpus, "vec_id", "embedding", numCentroids = 8)
        .orderBy("vec_id")
    }),

    // ---- embedding-level decontamination: corpus items sitting on top
    // of an eval-set vector (quantized cosine ≥ 0.9, integer
    // cross-multiplied test) — the dense sibling of q_decontaminate's
    // 13-gram rule, for paraphrased leaks that share no gram. Eval set
    // broadcasts; the corpus never shuffles; best match per item is an
    // algebraic max(struct), no window ----
    "q_decontam_dense" -> ((s, dir) => {
      val base = load(s, dir, "embeddings")
      val ev = base.filter(col("vec_id") >= 450 && col("vec_id") < 500)
        .select(col("vec_id"), col("embedding"))
      val corpus = base.filter(col("vec_id") < 450)
        .select(col("vec_id"), col("embedding"))
        .unionByName(ev.filter(col("vec_id") % 5 === 0).select(
          (col("vec_id") + 200000L).as("vec_id"),
          transform(col("embedding"), x => (x.cast("double") * 1.1).cast("float"))
            .as("embedding")))
      ml.Similarity.contaminatedDense(corpus, "vec_id", "embedding",
          ev, "vec_id", "embedding")
        .orderBy("vec_id")
    }),

    // ---- SSL-prototype data pruning (Sorscher et al. '22): cosine to
    // the own-cluster centroid as an IEEE-exact micro score, keep the
    // 70% least prototypical per cluster via a (cluster, score)
    // histogram — cumulative window over score LEVELS, never a
    // per-cluster sort of the corpus ----
    "q_prototype" -> ((s, dir) => {
      val e = load(s, dir, "embeddings").filter(col("vec_id") < 1500)
        .select("vec_id", "embedding")
      ml.Similarity.prototypicality(e, "vec_id", "embedding",
          numCentroids = 16, keepPermille = 700)
        .orderBy("vec_id")
    }),

    // ---- NO-SPLIT sequence packing: docs land intact, next-fit per
    // shard — the attention-mask-respecting packing. The one deliberate
    // per-group fold on the surface (next-fit's reset is sequential);
    // shards bound memory and give the parallelism ----
    "q_pack_nosplit" -> ((s, dir) =>
      packNoSplitDf(s, dir).orderBy("doc_id")),

    // ---- packing-efficiency harness: per-split padding permille of
    // the no-split layout — the number `capacity` (and the oversize
    // truncation policy) is tuned against, next to q_ann_recall /
    // q_dedup_eval in the tuning-harness family ----
    "q_pack_eval" -> ((s, dir) => {
      val seqs = packNoSplitDf(s, dir)
        .groupBy(col("shard"), col("seq_idx"))
        .agg(sum("n_tokens").as("fill"), count(lit(1)).as("ndocs"))
      seqs.groupBy(substring_index(col("shard"), ":", 1).as("split"))
        .agg(sum("ndocs").as("n_docs"), count(lit(1)).as("n_seqs"),
          sum(when(col("fill") > PackCapacity, 1L).otherwise(0L))
            .as("n_oversize"),
          sum("fill").as("total_tokens"),
          sum(when(col("fill") <= PackCapacity, lit(PackCapacity) - col("fill"))
            .otherwise(0L)).as("pad"))
        .select(col("split"), col("n_docs"), col("n_seqs"),
          col("n_oversize"), col("total_tokens"),
          expr(s"(1000 * pad) DIV nullif($PackCapacity * (n_seqs - n_oversize), 0)")
            .as("padding_permille"))
        .orderBy("split")
    }),

    // ---- sequence packing manifest: split + shard + windowed cumsum —
    // where every doc lands in the fixed-capacity training sequences.
    // Sharding by the split bucket keeps windows small and parallel
    // (a global window would be one reducer at 100 TB) ----
    "q_pack" -> ((s, dir) => {
      val d = text.TextFunctions.qualityStats(
          load(s, dir, "documents").filter(col("text").isNotNull), col("text"))
        .select(col("doc_id"), col("n_tokens"))
      val sp = text.Sampling.hashSplit(d, col("doc_id"), "42",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .withColumn("shard", col("bucket") % 8)
      text.Packing.packManifest(sp, "doc_id", col("n_tokens"),
          Seq(col("split"), col("shard")), 2048)
        .select("doc_id", "split", "shard", "n_tokens",
          "start_tok", "seq_idx", "seq_offset")
        .orderBy("doc_id")
    }),

    // ---- G2/G3/G5: the change-log generator's op mix, timestamp
    // packing, and non-insert payloads, recomputed independently by
    // DuckDB from the generation rules (insert per i; u for i%3 and
    // i%5; d for i%7; txn for i%11; skip-fodder for i%13; ts =
    // (t0 + phase·n + i) << 32). Insert payloads are the T11 palette
    // (pinned by q_t11_docgen), so they stay out of the string min/max ----
    "q_g2_changelog" -> ((s, dir) =>
      sim.Simgen.changeLog(s, 2000, "app.gen")
        .groupBy("op", "ns")
        .agg(count(lit(1)).as("n_ops"),
          min("ts").as("min_ts"), max("ts").as("max_ts"),
          min(when(col("op") =!= "i", col("o"))).as("min_o"),
          max(when(col("op") =!= "i", col("o"))).as("max_o"))
        .orderBy("op", "ns")),

    // ---- BM25 retrieval: top-5 docs per query — the search half of
    // the toolbox (retrieval evals, hard-negative mining). idf in
    // integer milli-nats and per-term scores in integer micro-units
    // before the sum, so ranking is engine-exact; nothing corpus-sized
    // broadcasts ----
    "q_bm25" -> ((s, dir) => {
      import s.implicits._
      val qs = Seq((1L, "key table scan"), (2L, "fast merge batch window"),
        (3L, "customer order part")).toDF("query_id", "qtext")
      text.Retrieval.bm25TopK(load(s, dir, "documents"), "doc_id", col("text"),
          qs, "query_id", col("qtext"), k = 5)
        .orderBy("query_id", "rank")
    }),

    // ---- materialized inverted index: stage (doc, term, tf) postings
    // PARTITIONED BY a term hash bucket (+ df/dl/stats frames), then
    // answer the query batch from the index alone — postings and df
    // scans prune statically to the query vocabulary's buckets. The
    // sparse twin of q_ann_ivfpq_staged; same oracle as q_bm25 ----
    "q_bm25_staged" -> ((s, dir) => {
      import s.implicits._
      val qs = Seq((1L, "key table scan"), (2L, "fast merge batch window"),
        (3L, "customer order part")).toDF("query_id", "qtext")
      val idx = scratchDir("bm25idx")
      text.Retrieval.stageBm25(load(s, dir, "documents"), "doc_id",
        col("text"), dir = idx, buckets = 64)
      text.Retrieval.stagedBm25TopK(s, idx, qs, "query_id", col("qtext"), k = 5)
        .orderBy("query_id", "rank")
    }),

    // ---- the APPENDABLE inverted index, end-to-end: stage the even
    // half, fold the odd half in via appendBm25 (batch-proportional —
    // the staged half is never re-tokenized), query the merged index.
    // The oracle is the SAME full-corpus BM25 SQL as q_bm25: df summed
    // per term and (n, avgdl) derived from dl make append ≡ restage
    // exact, so the scores must equal a from-scratch stage over
    // everything. The retrieval-service ingest discipline, the sparse
    // twin of q_ann_index_incr ----
    "q_bm25_incr" -> ((s, dir) => {
      import s.implicits._
      val qs = Seq((1L, "key table scan"), (2L, "fast merge batch window"),
        (3L, "customer order part")).toDF("query_id", "qtext")
      val idx = scratchDir("bm25incr")
      val docs = load(s, dir, "documents")
      // 16 buckets: the subject is append ≡ restage, not pruning width
      // (that is q_bm25_staged's) — 64 dirs × {postings, df} × {stage,
      // append} is pure tiny-file overhead at fixture scale
      text.Retrieval.stageBm25(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", col("text"), dir = idx, buckets = 16)
      text.Retrieval.appendBm25(docs.filter(col("doc_id") % 2 === 1),
        "doc_id", col("text"), idx)
      text.Retrieval.stagedBm25TopK(s, idx, qs, "query_id", col("qtext"), k = 5)
        .orderBy("query_id", "rank")
    }),

    // ---- streaming BM25 ingest: bootstrap the inverted index on the
    // even half, drain the odd half through a real Structured Streaming
    // source (2 files, 1 per micro-batch) via the SHARED ingest entry
    // point (DocStream.ingestStream, per-batch appendBm25) — the
    // retrieval-service live-ingest shape, completing the
    // streamed-ingest triptych (census: q_st_substr, IVF-PQ:
    // q_st_index). The new-ids guard runs LIVE inside each micro-batch
    // (dl semi-join — both batches are genuinely new, so it passes and
    // its cost is part of the honest ingest price), and the drain ends
    // with compactBm25 so the full lifecycle (stage → streamed appends
    // → compact → query) sits under the oracle. Same full-corpus SQL
    // as q_bm25: micro-batching + compaction must not change a score ----
    "q_st_bm25" -> ((s, dir) => {
      import s.implicits._
      val qs = Seq((1L, "key table scan"), (2L, "fast merge batch window"),
        (3L, "customer order part")).toDF("query_id", "qtext")
      val idx = scratchDir("bm25_st")
      val feed = scratchDir("bm25_feed")
      val docs = load(s, dir, "documents").select(col("doc_id"), col("text"))
      // 16 buckets: the subject is streamed append ≡ restage (see
      // q_bm25_incr's bucket note)
      text.Retrieval.stageBm25(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", col("text"), dir = idx, buckets = 16)
      docs.filter(col("doc_id") % 4 === 1)
        .repartition(1).write.mode("append").parquet(s"$feed/in")
      docs.filter(col("doc_id") % 4 === 3)
        .repartition(1).write.mode("append").parquet(s"$feed/in")
      // gate stream on a micro-batch-sized-shuffle session (streamSession)
      streaming.DocStream.ingestStream(
          streamSession(s).readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1).parquet(s"$feed/in"),
          "doc_id", "text", idx, s"$feed/ckpt")
        .awaitTermination()
      text.Retrieval.compactBm25(s, idx)
      text.Retrieval.stagedBm25TopK(s, idx, qs, "query_id", col("qtext"), k = 5)
        .orderBy("query_id", "rank")
    }),

    // ---- streaming EXACT-admission gate against the staged
    // fingerprint index: run 1 drains wave 1; run 2 drains wave 2 with
    // a FRESH checkpoint and a fresh feed dir — wave-2 copies of
    // wave-1-admitted docs are still rejected, proving the admission
    // state lives IN THE INDEX (fingerprints appended per micro-batch),
    // not in the checkpoint. Wave 2 also carries reference copies
    // (rejected vs the staged set) and an in-batch duplicate pair
    // (min-id winner admitted). compactFingerprints closes the
    // lifecycle. The out rows carry the FULL feed schema (admitStream
    // semi-joins admitted ids back onto the micro-batch), pinned here
    // by the lang metadata column surviving to the result. DuckDB
    // recomputes admission from the arrival order ----
    "q_st_fp" -> ((s, dir) => {
      val out = scratchDir("stfp")
      val d = load(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), col("text"), col("lang"))
      val idx = s"$out/fpidx"
      text.Dedup.stageFingerprints(d.filter(col("doc_id") % 2 === 0),
        col("text"), idx, buckets = 16)
      val w1 = d.filter(col("doc_id") % 4 === 1)
      val w2 = d.filter(col("doc_id") % 4 === 3)
        .unionByName(w1.filter(col("doc_id") % 5 === 1)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
            col("lang")))
        .unionByName(d.filter(col("doc_id") % 6 === 0)
          .select((col("doc_id") + 800000L).as("doc_id"), col("text"),
            col("lang")))
        .unionByName(d.filter(col("doc_id") % 4 === 3 && col("doc_id") % 7 === 0)
          .select((col("doc_id") + 900000L).as("doc_id"), col("text"),
            col("lang")))
      def drain(wave: org.apache.spark.sql.DataFrame, i: Int): Unit = {
        wave.repartition(1).write.parquet(s"$out/feed$i")
        // gate stream on a micro-batch-sized-shuffle session
        streaming.DocStream.admitStream(
            streamSession(s).readStream.schema(wave.schema)
              .parquet(s"$out/feed$i"),
            "doc_id", "text", idx, s"$out/admitted", s"$out/ckpt$i")
          .awaitTermination()
      }
      drain(w1, 1)
      drain(w2, 2) // fresh checkpoint: the index IS the state
      text.Dedup.compactFingerprints(s, idx)
      s.read.parquet(s"$out/admitted").select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    // ---- streaming NEAR-DUP admission gate against the staged band
    // index — admitStream's LSH twin: wave 1 admits against the staged
    // reference bands and appends its winners' signatures; wave 2
    // (fresh checkpoint + fresh feed) carries near-copies of wave-1
    // admitted docs, which must be rejected — proving the near-dup
    // state lives IN THE INDEX — plus near-copies of reference docs
    // (rejected vs the staged set). compactBandIndex closes the
    // lifecycle; out carries the full feed schema (lang survives).
    // DuckDB recomputes both waves' LSH admission from arrival order ----
    "q_st_lsh" -> ((s, dir) => {
      val out = scratchDir("stlsh")
      val d = load(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), col("text"), col("lang"))
      val idx = s"$out/bandidx"
      text.Dedup.stageBandIndex(d.filter(col("doc_id") % 2 === 0),
        "doc_id", col("text"), dir = idx)
      val w1 = d.filter(col("doc_id") % 4 === 1)
      val w2 = d.filter(col("doc_id") % 4 === 3)
        .unionByName(w1.filter(col("doc_id") % 5 === 1)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(col("text"), lit(" near duplicate tail")).as("text"),
            col("lang")))
        .unionByName(d.filter(col("doc_id") % 6 === 0)
          .select((col("doc_id") + 800000L).as("doc_id"),
            concat(col("text"), lit(" near duplicate tail")).as("text"),
            col("lang")))
      def drain(wave: org.apache.spark.sql.DataFrame, i: Int): Unit = {
        wave.repartition(1).write.parquet(s"$out/feed$i")
        // gate stream on a micro-batch-sized-shuffle session
        streaming.DocStream.admitNearStream(
            streamSession(s).readStream.schema(wave.schema)
              .parquet(s"$out/feed$i"),
            "doc_id", "text", idx, s"$out/admitted", s"$out/ckpt$i")
          .awaitTermination()
      }
      drain(w1, 1)
      drain(w2, 2) // fresh checkpoint: the index IS the state
      text.Dedup.compactBandIndex(s, idx)
      s.read.parquet(s"$out/admitted").select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    // ---- streaming near-dup admission with JACCARD-VERIFIED
    // rejection + rejects audit: the gate's production knobs. A band
    // collision only rejects if the exact word-trigram Jaccard vs the
    // MATCHED doc is >= 0.8 — the 10-word tail puts short docs' copies
    // BELOW the threshold (collision-only near-misses, admitted here,
    // rejected by candidate-keyed q_st_lsh) and long docs' copies
    // above it (still rejected). The matched side's text comes from
    // THE INDEX ITSELF (storeTexts staging: texts ride the id-bucketed
    // ids/ rows, and the gate's own appends carry the admitted texts),
    // so each micro-batch's verify fetch reads only the candidate ids'
    // bucket partitions — candidate-proportional, never a corpus
    // re-scan. DuckDB recomputes both waves' candidates AND their
    // Jaccards from arrival order ----
    "q_st_lsh_verified" -> ((s, dir) => {
      val out = scratchDir("stlshv")
      val d = load(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), col("text"), col("lang"))
      val idx = s"$out/bandidx"
      val refs = d.filter(col("doc_id") % 2 === 0)
      text.Dedup.stageBandIndex(refs, "doc_id", col("text"), dir = idx,
        storeTexts = true)
      val tail = lit(VerifiedTail)
      val w1 = d.filter(col("doc_id") % 4 === 1)
      val w2 = d.filter(col("doc_id") % 4 === 3)
        .unionByName(w1.filter(col("doc_id") % 5 === 1)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(col("text"), tail).as("text"), col("lang")))
        .unionByName(d.filter(col("doc_id") % 6 === 0)
          .select((col("doc_id") + 800000L).as("doc_id"),
            concat(col("text"), tail).as("text"), col("lang")))
      def drain(wave: org.apache.spark.sql.DataFrame, i: Int): Unit = {
        wave.repartition(1).write.parquet(s"$out/feed$i")
        // gate stream on a micro-batch-sized-shuffle session
        streaming.DocStream.admitNearStream(
            streamSession(s).readStream.schema(wave.schema)
              .parquet(s"$out/feed$i"),
            "doc_id", "text", idx, s"$out/admitted", s"$out/ckpt$i",
            verifyJaccard = Some(0.8),
            rejectsPath = Some(s"$out/rejects"))
          .awaitTermination()
      }
      drain(w1, 1)
      drain(w2, 2) // fresh checkpoint: the index IS the state
      text.Dedup.compactBandIndex(s, idx)
      s.read.parquet(s"$out/admitted").select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    // ---- streaming SEMANTIC admission gate against the staged
    // IVF-flat index (the SIXTH staged kind: raw quantized vectors
    // partitioned by IVF list — the exact-threshold admission tier
    // next to the PQ retrieval tier): wave 1 admits vectors with no
    // staged neighbor of cosine >= 0.9 in their nprobe probed lists
    // and appends its winners; wave 2 (fresh checkpoint) carries exact
    // copies of wave-1 vectors (rejected iff their original was
    // admitted — the state lives IN THE INDEX) and copies of staged
    // vectors (rejected vs the staged set). compactIvfFlat closes the
    // lifecycle; label survives to the result (full-schema out).
    // DuckDB recomputes both waves' admission in integer arithmetic ----
    "q_st_vec" -> ((s, dir) => {
      val out = scratchDir("stvec")
      val e = load(s, dir, "embeddings")
        .filter(col("embedding").isNotNull && col("vec_id") < 1000)
        .select(col("vec_id"), col("embedding"), col("label"))
      val idx = s"$out/flatidx"
      ml.Similarity.stageIvfFlat(e.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", numCentroids = 8, dir = idx)
      val w1 = e.filter(col("vec_id") % 4 === 1)
      val w2 = e.filter(col("vec_id") % 4 === 3)
        .unionByName(w1.filter(col("vec_id") % 5 === 1)
          .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"),
            col("label")))
        .unionByName(e.filter(col("vec_id") % 6 === 0)
          .select((col("vec_id") + 20000L).as("vec_id"), col("embedding"),
            col("label")))
      def drain(wave: org.apache.spark.sql.DataFrame, i: Int): Unit = {
        wave.repartition(1).write.parquet(s"$out/feed$i")
        // gate stream on a micro-batch-sized-shuffle session
        streaming.DocStream.admitVecStream(
            streamSession(s).readStream.schema(wave.schema)
              .parquet(s"$out/feed$i"),
            "vec_id", "embedding", idx, s"$out/admitted", s"$out/ckpt$i",
            minCosPermille = 900, nprobe = 2)
          .awaitTermination()
      }
      drain(w1, 1)
      drain(w2, 2) // fresh checkpoint: the index IS the state
      ml.Similarity.compactIvfFlat(s, idx)
      s.read.parquet(s"$out/admitted").select("vec_id", "label")
        .orderBy("vec_id")
    }),

    // ---- hybrid retrieval: BM25 ∪ dense ANN fused by reciprocal-rank
    // fusion in integer micro-units — the two-tower retrieval stack as
    // one composition (queries share the corpus id space: query k's
    // embedding is embeddings[vec_id=k]) ----
    "q_hybrid_rrf" -> ((s, dir) => {
      import s.implicits._
      val qs = Seq((1L, "key table scan"), (2L, "fast merge batch window"),
        (3L, "customer order part")).toDF("query_id", "qtext")
      text.Retrieval.hybridTopK(
        load(s, dir, "documents"), "doc_id", col("text"),
        load(s, dir, "embeddings"), "vec_id", "embedding",
        qs, "query_id", col("qtext"), k = 5, poolK = 20)
        .orderBy("query_id", "rank")
    }),

    // ---- context-window chunking: split docs into ≤16-token chunks at
    // sentence boundaries (retrieval/embedding prep). One per-document
    // cumulative window (millions of small partitions at scale, never
    // global); the fixture gains sentence structure by cutting at
    // " the "/" table " ----
    "q_chunk_sentences" -> ((s, dir) => {
      val d = load(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"),
          regexp_replace(col("text"), " (the|table) ", ". ").as("text"))
      text.Chunking.sentenceChunks(d, "doc_id", col("text"), targetTokens = 16)
        .orderBy("doc_id", "chunk_idx")
    }),

    // ---- per-group document cap (anti-spam: no domain over `cap`
    // docs) with NO per-group window: group sizes from one map-side
    // aggregate, over-quota groups get an integer hash-bucket admission
    // fraction, one broadcast filter — en (218 docs at sf0.01) is the
    // over-quota group here ----
    "q_cap_domain" -> ((s, dir) =>
      text.Sampling.capPerGroup(
          load(s, dir, "documents").select("doc_id", "lang", "source"),
          col("lang"), col("doc_id"), 100L)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")),

    // ---- corpus mixing: budget-constrained per-stratum selection —
    // highest-quality docs per language until the token budget is
    // spent, WITHOUT a per-stratum sort: (stratum, score) histogram →
    // prefix-sum admission rule → broadcast filter; the boundary score
    // admits an integer hash-bucket fraction (engine-exact). en/fr
    // budgets cut mid-level, zh's admits everything, es/de have no
    // budget → excluded ----
    "q_mix_budget" -> ((s, dir) => {
      val d = load(s, dir, "documents").filter(col("text").isNotNull)
      val stats = text.TextFunctions.qualityStats(d, col("text"))
      text.Mixing.budgetSelect(stats, "doc_id", col("lang"), col("n_tokens"),
          col("quality_score"), Seq("en" -> 4000L, "fr" -> 1500L, "zh" -> 100000L))
        .orderBy("doc_id")
    }),

    // ---- the end-to-end curation pipeline: exact dedup → quality +
    // language filter → deterministic split assignment, composed from
    // the operators above into the corpus manifest a training run
    // consumes. Every stage is a narrow projection or one map-side-
    // combined aggregate — the composition adds no shape the pieces
    // don't have ----
    "q_pipeline_corpus" -> ((s, dir) => {
      val d = load(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = d.unionByName(
        d.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 200000L).as("doc_id"), col("text")))
      // dedup first (min-id winner over the full corpus), then filter.
      // Winner via a window over the content hash — ONE exchange; the
      // aggregate+semi-join formulation gets pushed through the corpus
      // union by Catalyst and re-computes the dedup aggregate per branch
      val keepW = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val deduped = corpus.withColumn("__rn", row_number().over(keepW))
        .filter(col("__rn") === 1).drop("__rn")
      val stats = text.TextFunctions.languageId(
        text.TextFunctions.qualityStats(deduped, col("text")),
        col("text"))
      val kept = stats.filter(col("quality_score") >= 3 && col("pred_lang") === "en")
      text.Sampling.hashSplit(kept, col("doc_id"), "42",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "n_tokens", "quality_score", "split")
        .orderBy("doc_id")
    }),

    // ---- the INCREMENTAL curation pipeline end-to-end through the real
    // CLI: stage a frozen gram census from the reference third, then
    // `-curate` an incoming feed (the held-out third + planted slices of
    // reference docs) with `substrIndex` — dedup → index cut
    // (newDupSpans rule: in-reference OR repeated-in-batch) → quality +
    // language gates → split manifest. The reference corpus is never
    // re-scanned by the curate job; the oracle recomputes the manifest
    // from scratch in SQL ----
    "q_pipeline_incr" -> ((s, dir) => {
      val base = load(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      val src = scratchDir("pincr")
      val idx = s"$src/refidx"
      // xxh64 = the production census hash; -curate derives it from the
      // index's manifest, and the oracle pins spans by gram equality
      // (see q_substr_new)
      text.Substrings.stageGramCensus(base.filter(col("doc_id") % 3 === 0),
        "doc_id", col("text"), k = 40, dir = idx, buckets = 64,
        hash = text.Substrings.HashXxh64)
      // %21==0 implies %3==0: every planted row slices a REFERENCE doc,
      // so index hits are guaranteed on top of the natural cross-third dups
      base.filter(col("doc_id") % 3 === 1)
        .unionByName(base
          .filter(col("doc_id") % 21 === 0 && length(col("text")) >= 240)
          .select((col("doc_id") + 500000L).as("doc_id"),
            concat(lit("NEW:"), col("doc_id").cast("string"), lit(" "),
              expr("substring(text, 61, 150)")).as("text")))
        .write.mode("overwrite").parquet(s"$src/feed.parquet")
      val cfg = java.nio.file.Files.write(
        java.nio.file.Paths.get(src, "curate.json"),
        (s"""{"source":"$src","namespace":"local.feed",""" +
          s""""out":"$src/manifest","substrIndex":"$idx"}""")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      require(Main.run(Seq("-curate", cfg.toString), () => s) == 0,
        "curate pipeline failed")
      s.read.parquet(s"$src/manifest").orderBy("doc_id")
    }),

    // ---- corpus-loss accounting through the real CLI: -curate with
    // "audit" writes one (id, fate) row for EVERY namespace document —
    // kept, or the FIRST pipeline stage that dropped it (stage-order
    // precedence: null text → dedup → quality → language). The corpus
    // plants byte-identical copies (dedup losers) on top of the natural
    // quality/language drops; DuckDB recomputes every fate from
    // scratch. The operational "where did my corpus go" surface ----
    "q_curate_audit" -> ((s, dir) => {
      import s.implicits._
      val src = scratchDir("caudit")
      val d = load(s, dir, "documents").select(col("doc_id"), col("text"))
      // plants guaranteeing every fate appears: a low-alpha doc
      // (quality), a French doc (language), a null text — the sf corpus
      // itself passes all gates, so without these the audit would only
      // ever exercise kept/dropped_duplicate
      // 900004 pins the NULL-quality corner: a dedup WINNER (unique
      // text) whose whitespace-only scored text yields quality_score
      // NULL — the pipeline's >= gate drops it, so the audit must say
      // dropped_quality, not dropped_duplicate
      val plants = Seq(
        (900001L, "a b c 1 2 3 4 5 6 7 8 9"),
        (900002L, "le la et les des le la et les des le la et les des"),
        (900003L, null.asInstanceOf[String]),
        (900004L, "   "))
        .toDF("doc_id", "text")
      d.unionByName(d.filter(col("doc_id") % 7 === 0 && col("text").isNotNull)
          .select((col("doc_id") + 200000L).as("doc_id"), col("text")))
        .unionByName(plants)
        .write.mode("overwrite").parquet(s"$src/feed.parquet")
      val cfg = java.nio.file.Files.write(
        java.nio.file.Paths.get(src, "curate.json"),
        (s"""{"source":"$src","namespace":"local.feed",""" +
          s""""out":"$src/manifest","audit":"$src/audit"}""")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      require(Main.run(Seq("-curate", cfg.toString), () => s) == 0,
        "curate audit run failed")
      s.read.parquet(s"$src/audit").orderBy("doc_id")
    }),

    // ---- the -curate STREAMING CLI branch through the real CLI: two
    // arrival waves drained by two runs of the SAME config over one
    // checkpoint. Wave 2 carries byte-identical copies of wave-1 docs
    // under new ids — a fresh-state run 2 would KEEP them (they are
    // unique within wave 2), so their absence from the manifest pins
    // the cross-run dedup state surviving via the checkpoint, and the
    // second drain processing ONLY the new file pins the incremental
    // file-source contract. DuckDB recomputes the final manifest from
    // the arrival order (wave-1 winner on every cross-run collision).
    // Feed waves are internally pre-deduped so first-arrival-wins is
    // deterministic for the oracle ----
    "q_curate_stream" -> ((s, dir) => {
      val src = scratchDir("cstream")
      val keepW = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val base = load(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), col("text"))
        .withColumn("__rn", row_number().over(keepW))
        .filter(col("__rn") === 1).drop("__rn")
      val w1 = base.filter(col("doc_id") % 3 === 1)
      val w2 = base.filter(col("doc_id") % 3 === 2)
        .unionByName(w1.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 700000L).as("doc_id"), col("text")))
      // event times inside one minute: the watermark never expires
      // dedup state mid-fixture (the gate is q_st_curate's subject)
      def stamp(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("event_ts",
          timestamp_seconds(lit(1700000000L) + pmod(col("doc_id"), lit(60))))
      val cfg = java.nio.file.Files.write(
        java.nio.file.Paths.get(src, "curate.json"),
        (s"""{"source":"$src","namespace":"local.feed",""" +
          s""""out":"$src/manifest","stream":{""" +
          s""""checkpoint":"$src/ckpt","timeCol":"event_ts"}}""")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      stamp(w1).coalesce(1).write.mode("append").parquet(s"$src/feed.parquet")
      require(Main.run(Seq("-curate", cfg.toString), () => s) == 0,
        "curate stream run 1 failed")
      stamp(w2).coalesce(1).write.mode("append").parquet(s"$src/feed.parquet")
      require(Main.run(Seq("-curate", cfg.toString), () => s) == 0,
        "curate stream run 2 failed")
      s.read.parquet(s"$src/manifest")
        .select("doc_id", "n_tokens", "quality_score", "pred_lang",
          "split", "scrubbed")
        .orderBy("doc_id")
    }),

    // ---- deterministic epoch shuffle: a pseudorandom TOTAL ORDER over
    // the corpus without a global sort — shard = range partition of the
    // md5 rank key's prefix, per-shard row_number windows + broadcast
    // shard offsets reconstruct the exact global permutation ----
    "q_shuffle" -> ((s, dir) =>
      text.Sampling.shuffleManifest(
          load(s, dir, "documents").select("doc_id"), "doc_id", "ep1", 8)
        .orderBy("doc_id")),

    // ---- per-document top-3 keywords by tf-idf; idf quantized to
    // integer milli-nats before the tf×idf product so ranking is exact
    // integer arithmetic in any engine ----
    "q_tfidf" -> ((s, dir) =>
      text.TextFunctions.tfIdfTopK(load(s, dir, "documents"), "doc_id",
          col("text"), k = 3)
        .orderBy("doc_id", "rank")),

    // ---- canonical-form dedup: exact dedup over NORMALIZED text
    // (lowercase, control chars → space, runs collapsed, trimmed) —
    // groups the case/whitespace variants raw byte-hashing misses;
    // fixture plants tab-prefixed uppercased double-spaced copies ----
    "q_normalize_dedup" -> ((s, dir) => {
      val d = load(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = d.unionByName(d.filter(col("doc_id") % 6 === 0)
        .select((col("doc_id") + 400000L).as("doc_id"),
          concat(lit("\t"), upper(regexp_replace(col("text"), " ", "  ")))
            .as("text")))
      text.Dedup.exact(corpus, "doc_id",
          text.TextFunctions.normalizeCol(col("text")))
        .orderBy("content_hash")
    }),

    // ---- C4-family line-level curation: corpus-wide duplicate-LINE
    // removal. Boilerplate (headers, footers, nav text) repeats across
    // millions of pages — document hashes never match, but the lines
    // are byte-identical. Winner per distinct line is min(struct(id,
    // pos, line)): algebraic, map-side combined, so a line repeated a
    // billion times collapses before the exchange — no window over the
    // line hash, no join-back ----
    "q_line_dedup" -> ((s, dir) =>
      text.Lines.lineDedup(lineCorpus(load(s, dir, "documents")),
          "doc_id", col("text"))
        .orderBy("doc_id")),

    // ---- C4-style per-line quality gate: ≥5 words AND terminal
    // punctuation — a pure narrow array expression per document (no
    // explode, no shuffle; runs at scan speed) ----
    "q_c4_filter" -> ((s, dir) =>
      text.Lines.lineFilter(lineCorpus(load(s, dir, "documents")),
          "doc_id", col("text"))
        .orderBy("doc_id")),

    // ---- the FULL Gopher A1.2 n-gram repetition table: char mass of
    // the dominant 2/3/4-gram and of repeated 5..10-grams, integer
    // per-mille — nine one-pass hashmap expressions inside ONE
    // codegen'd projection, zero shuffles ----
    "q_rep_ngrams" -> ((s, dir) =>
      text.TextFunctions.repetitionCharStats(
          repNgramCorpus(load(s, dir, "documents")), "doc_id", col("text"))
        .orderBy("doc_id")),

    // ---- Gopher within-doc structural repetition: duplicate-line and
    // duplicate-paragraph excess (count + char mass) as integer
    // per-mille — pure narrow array expressions (array_distinct +
    // array_join give the excess char mass with no per-element
    // counting), zero shuffles, runs at scan speed ----
    "q_rep_lines" -> ((s, dir) =>
      text.Lines.lineRepetitionStats(paraCorpus(load(s, dir, "documents")),
          "doc_id", col("text"))
        .orderBy("doc_id")),

    // ---- streaming census ingest: bootstrap the gram census on a
    // third of the corpus, drain another third through a real
    // Structured Streaming source (2 files, DELIBERATELY 1 per
    // micro-batch — two appends is exactly the multi-batch ingest under
    // test) via the SHARED ingest entry point (DocStream.ingestStream,
    // per-batch appendGramCensus), then probe the
    // held-out third against the final index — the live-ingest shape of
    // a curation service. Micro-batching must not change a span: the
    // index converges to the same census a full restage gives. The
    // bench cost here is the bootstrap stage + probe (the intrinsic
    // exact-census price, same as q_substr_new), not trigger cadence ----
    "q_st_substr" -> ((s, dir) => {
      val base = load(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      val idx = scratchDir("gramidx_st")
      val feed = scratchDir("gram_feed")
      // 16 buckets: each append writes one file per TOUCHED bucket, so
      // 64 dirs at fixture scale is 3× the file count for zero pruning
      // benefit (a whole-corpus-third batch touches every bucket).
      // xxh64 census: the PRODUCTION hash mode, exercised end-to-end
      // through stage → streamed appends → probe (appends/probes derive
      // it from the manifest). Oracle-neutral: the oracle pins spans by
      // gram EQUALITY (DuckDB-side md5 on both sides), never by the
      // Spark census key — and 4× smaller keys halve the stage+probe
      // cost this fixture pays per repeat (tools/CensusSweep).
      text.Substrings.stageGramCensus(base.filter(col("doc_id") % 3 === 0),
        "doc_id", col("text"), k = 40, dir = idx, buckets = 16,
        hash = text.Substrings.HashXxh64)
      base.filter(col("doc_id") % 3 === 2 && col("doc_id") % 2 === 0)
        .repartition(1).write.mode("append").parquet(s"$feed/in")
      base.filter(col("doc_id") % 3 === 2 && col("doc_id") % 2 === 1)
        .repartition(1).write.mode("append").parquet(s"$feed/in")
      // the SHARED ingest entry point opens the index handle ONCE and
      // appends each micro-batch through it (the continuous-ingest
      // discipline — no per-batch manifest/stats reads); gate stream on
      // a micro-batch-sized-shuffle session
      streaming.DocStream.ingestStream(
          streamSession(s).readStream.schema(base.schema)
            .option("maxFilesPerTrigger", 1).parquet(s"$feed/in"),
          "doc_id", "text", idx, s"$feed/ckpt")
        .awaitTermination()
      val censusIdx = text.Substrings.openIndex(s, idx)
      // compact after the streamed appends: one file per bucket again,
      // refreshed manifest count — probe-invisible by construction, so
      // the oracle (which recomputes spans from the raw corpus) pins
      // the whole stage → streamed-append → compact → probe lifecycle
      text.Substrings.compactCensus(s, idx)
      text.Substrings.newDupSpans(base.filter(col("doc_id") % 3 === 1),
          "doc_id", col("text"), censusIdx, maxChars = 0, selfDups = true)
        .orderBy("doc_id", "span_start")
    }),

    // ---- Substring-level exact dedup (Lee et al. 2022 ExactSubstr):
    // maximal verbatim-duplicated char spans ≥ k, alignment-independent
    // — the corpus ∪ interior-slice copies fixture plants cross-aligned
    // shared regions document hashes and fixed-stride chunks both miss.
    // Census is one map-side-combined groupBy(h) + a shuffle join back;
    // span-merge windows are per-document ----
    // xxh64 keys the ephemeral census (the production hash, ~2× faster
    // census — tools/CensusSweep); oracle-neutral: spans are equality-
    // of-key facts, the oracle's md5 is its own key on its own side
    "q_substr_spans" -> ((s, dir) =>
      text.Substrings.dupSpans(substrCorpus(load(s, dir, "documents")),
          "doc_id", col("text"), k = 40, maxChars = 0,
          hash = text.Substrings.HashXxh64)
        .orderBy("doc_id", "span_start")),

    // ---- the per-document report + the cut step: span counts, integer
    // per-mille duplicated, and the md5 of the text with every
    // duplicated span removed (pinned by hash — the oracle rebuilds the
    // cleaned text independently) ----
    "q_substr_stats" -> ((s, dir) =>
      text.Substrings.dupStats(substrCorpus(load(s, dir, "documents")),
          "doc_id", col("text"), k = 40, maxChars = 0,
          hash = text.Substrings.HashXxh64)
        .orderBy("doc_id")),

    // ---- the tuning harness for the 100 TB path: winnowing anchors
    // (SIGMOD '03; ~2/(G+1) of gram positions, any shared run ≥
    // guarantee chars still caught) vs the exact span surface — the
    // number (k, guarantee) is tuned against, like q_ann_recall for
    // nprobe and q_dedup_eval for (bands, rows) ----
    "q_substr_eval" -> ((s, dir) =>
      text.Substrings.coverageEval(substrCorpus(load(s, dir, "documents")),
        "doc_id", col("text"), k = 40, guarantee = 64, maxChars = 0,
        hash = text.Substrings.HashXxh64)),

    // ---- incremental substring dedup: stage the reference corpus'
    // gram census ONCE (bucket-partitioned parquet), then probe an
    // incoming batch against the frozen index — batch chars duplicating
    // the reference or repeated within the batch get spanned; nothing
    // reference-sized shuffles, and the census scan prunes to the
    // batch's hash buckets. The substring analog of q_dedup_new ----
    "q_substr_new" -> ((s, dir) => {
      val base = load(s, dir, "documents").filter(col("text").isNotNull)
      val idx = scratchDir("gramidx")
      // xxh64 = the production census hash (4× smaller keys, ~2× faster
      // stage+probe — tools/CensusSweep); oracle-neutral: spans are
      // pinned by gram equality (the oracle's md5 is its own key on
      // both of its sides), the Spark census key never reaches the
      // output. md5-mode staged coverage lives in SubstringsSpec's
      // xxh64 ≡ md5 span pin.
      text.Substrings.stageGramCensus(base.filter(col("doc_id") % 3 =!= 1),
        "doc_id", col("text"), k = 40, dir = idx, buckets = 64,
        hash = text.Substrings.HashXxh64)
      val batch = base.filter(col("doc_id") % 3 === 1)
        .select(col("doc_id"), col("text"))
        .unionByName(base
          .filter(col("doc_id") % 21 === 0 && length(col("text")) >= 240)
          .select((col("doc_id") + 500000L).as("doc_id"),
            concat(lit("NEW:"), col("doc_id").cast("string"), lit(" "),
              expr("substring(text, 61, 150)")).as("text")))
      text.Substrings.newDupSpans(batch, "doc_id", col("text"), idx)
        .orderBy("doc_id", "span_start")
    }),

    // ---- the ANCHORED staged census, end-to-end: stage the reference's
    // winnow-selected gram census (~2/(G+1) of the exact census' rows —
    // the 100 TB staged default), probe the same incoming batch with its
    // own anchors. Anchored on BOTH sides, so the winnowing guarantee
    // composes: any batch run sharing >= 64 chars with the reference
    // still collides. The oracle recomputes BOTH winnow selections with
    // the declarative nearest-smaller-rank formulation ----
    "q_substr_new_anchored" -> ((s, dir) => {
      val base = load(s, dir, "documents").filter(col("text").isNotNull)
      val idx = scratchDir("anchidx")
      text.Substrings.stageAnchorCensus(base.filter(col("doc_id") % 3 =!= 1),
        "doc_id", col("text"), k = 40, guarantee = 64, dir = idx, buckets = 64)
      val batch = base.filter(col("doc_id") % 3 === 1)
        .select(col("doc_id"), col("text"))
        .unionByName(base
          .filter(col("doc_id") % 21 === 0 && length(col("text")) >= 240)
          .select((col("doc_id") + 500000L).as("doc_id"),
            concat(lit("NEW:"), col("doc_id").cast("string"), lit(" "),
              expr("substring(text, 61, 150)")).as("text")))
      text.Substrings.newAnchorSpans(batch, "doc_id", col("text"), idx)
        .orderBy("doc_id", "span_start")
    }),

    // ---- T11: the DocGen full type palette, oracle-pinned — every
    // scalar the generator derives (oid, rainbow color, num fields,
    // formatted string, epoch time, int array, self-nested subdoc,
    // filler, binary hexes, Decimal128) recomputed independently by
    // DuckDB over the same row ids. Generation is distributed
    // (spark.range, no driver loop) ----
    "q_t11_docgen" -> ((s, dir) => {
      val d = s.range(2000).select(col("id"), sim.Simgen.docStruct(col("id")).as("d"))
      d.select(
        col("id"),
        col("d._id").as("oid"),
        col("d.color").as("color"),
        col("d.float64").as("float64"),
        col("d.int64").as("int64"),
        col("d.seq").as("seq"),
        col("d.string").as("str"),
        unix_micros(col("d.ts")).as("ts_us"),
        // list/decimal flattened to strings: every other declared query
        // emits scalar columns only, so the driver's hash-compare never
        // needs to define list/decimal hashing semantics
        concat_ws(",", col("d.array").cast("array<string>")).as("arr"),
        col("d.subdoc.level1._id").as("subdoc_oid"),
        length(col("d.filler")).cast("long").as("filler_len"),
        substring(col("d.filler"), 1, 12).as("filler_prefix"),
        col("d.binary.hex").as("bin4_hex"),
        col("d.bin1.hex").as("bin1_hex"),
        col("d.uuid.subtype").as("uuid_subtype"),
        col("d.decimal128").cast("string").as("decimal128"))
        .orderBy("id")
    }),

    // ---- J3: last-write-wins per-key compaction (oplog apply ordering) ----
    // the micro-batch compaction inside K2's foreachBatch, run as a batch
    // query over the events change-log table.
    "q_j3_compaction" -> ((s, dir) => {
      // Compact at µs precision, whatever the fixture's physical ts type
      // (Tables.tsUs) — DuckDB coerces parquet timestamps to µs, and
      // ordering must use the same precision on both sides or tie-breaks
      // diverge.
      val ev = load(s, dir, "events")
      val tsUs = Tables.tsUs(ev)
      val w = Window.partitionBy("user_id").orderBy(tsUs.desc, col("event_id").desc)
      ev
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), tsUs.as("ts_us"))
        .orderBy("user_id")
    }),

    // ---- T6: namespace rename through the full copy lifecycle
    // (GetToNamespace, migrator.go:254-262) — plan → preflight → copy
    // `src.nation` into a fresh sink under `tgt.nation_xl`, read back
    // UNDER THE NEW NAMESPACE. The oracle recomputes the expected table
    // straight from `nation`; the sink_ns / old_ns_gone literals pin
    // that the rename actually routed the write (a copy under the old
    // name would fail both). ----
    "q_t6_rename" -> ((s, dir) => {
      val out = scratchDir("t6")
      val source = new sources.ParquetCatalog(s, dir, db = "src")
      val sink = new sources.ParquetCatalog(s, out, db = "tgt")
      val cfg = config.MigratorConfig(command = "data", source = dir, target = out,
        includes = Seq(config.IncludeSpec(namespace = "src.nation", to = "tgt.nation_xl")))
      copy.CopyJob.run(cfg, source, sink)
      sink.read("tgt.nation_xl")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .withColumn("sink_ns", lit(sink.listNamespaces().mkString(",")))
        .withColumn("old_ns_gone", lit(!sink.dataExists("tgt.nation")))
        .orderBy("n_nationkey")
    }),

    // ---- K1: idempotent batched upsert (the reference's bulk upsert
    // write path, data_copier.go) — seed a sink from `customer`, apply
    // one mixed update+insert batch TWICE, read the final state back.
    // The oracle recomputes the expected post-merge table;
    // total_after_first/rerun pin that the re-run is a no-op (same
    // total, no duplicated keys). ----
    "q_k1_upsert" -> ((s, dir) => {
      val out = scratchDir("k1")
      val sink = new sources.ParquetCatalog(s, out, db = "tgt")
      val base = load(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
          col("c_nationkey").cast("long").as("c_nationkey"))
      sink.write("tgt.customer", base)
      val updates = base.filter(col("c_custkey") % 3 === 0)
        .withColumn("c_name", concat(col("c_name"), lit("#u")))
      val inserts = base.filter(col("c_custkey") % 10 === 0)
        .withColumn("c_custkey", col("c_custkey") + lit(100000000L))
      val batch = updates.unionByName(inserts)
      val n1 = sink.upsert("tgt.customer", batch, "c_custkey")
      val n2 = sink.upsert("tgt.customer", batch, "c_custkey")
      sink.read("tgt.customer")
        .withColumn("total_after_first", lit(n1))
        .withColumn("total_after_rerun", lit(n2))
        .orderBy("c_custkey")
    }),

    // ---- S4: gz-BSON spool reader (BSONReader, bson_reader.go:17-44)
    // — a deterministic spool file is framed+gzipped from `nation`
    // rows, then read back through the REAL path (binaryFile source →
    // gzip → frame splitter). The oracle recomputes frame_seq (write
    // order), round-tripped payload, and frame length (4-byte header +
    // payload) straight from `nation`. ----
    "q_s4_spool" -> ((s, dir) => {
      val out = scratchDir("s4")
      val rows = load(s, dir, "nation")
        .select(col("n_nationkey").cast("long"), col("n_name"))
        .orderBy("n_nationkey").collect() // 25 rows: fixture-sized by construction
      val payloads = rows.toIndexedSeq
        .map(r => s"${r.getLong(0)}|${r.getString(1)}".getBytes("UTF-8"))
      sources.Spool.write(s"$out/nation.bson.gz", payloads)
      sources.Spool.read(s, s"$out/*.bson.gz")
        .select(col("frame_seq"),
          expr("CAST(substring(frame, 5, length(frame) - 4) AS STRING)").as("payload"),
          length(col("frame")).cast("long").as("frame_len"))
        .orderBy("frame_seq")
    }),

    // ---- ST2/ST4/K5: streaming catch-up, end-to-end through the REAL
    // stream machinery (readStream file source → foreachBatch →
    // checkpoint → exactly-once marker merge) — the q_k2 change-log
    // reshaped so each key is touched by AT MOST ONE op class: ops then
    // commute across micro-batches, so the drained state is independent
    // of how the file source slices the backlog (here: 6 files,
    // maxFilesPerTrigger=2 → 3 micro-batches). The oracle recomputes
    // the final state from `orders`. ----
    "q_st2_catchup" -> ((s, dir) => {
      val out = scratchDir("st2")
      val sink = new sources.ParquetCatalog(s, s"$out/sink", db = "app")
      val cfg = config.MigratorConfig(command = "data", source = dir, target = out)
      val orders = load(s, dir, "orders")
      val k = col("o_orderkey")
      sink.write("app.orders_state", orders.select(
        k.cast("string").as("id"),
        to_json(struct(k.as("_id"), col("o_custkey").as("custkey"),
          col("o_orderstatus").as("status"), col("o_totalprice").as("price"))).as("doc")))
      val ns = lit("app.orders_state")
      def op(ts: Long, opc: String, nsCol: org.apache.spark.sql.Column,
          o: org.apache.spark.sql.Column, o2: org.apache.spark.sql.Column) = Seq(
        lit(ts).as("ts"), lit(opc).as("op"), nsCol.as("ns"), o.as("o"), o2.as("o2"),
        lit(0L).as("h"), lit(0L).as("t"), lit(2).as("v"))
      val nullS = lit(null).cast("string")
      // disjoint key classes (each key in exactly one file ⇒ batch-order
      // independent): %3 v2-update; %5∖%3 $inc; %7∖%3,5 delete;
      // %11∖%3,5,7 applyOps txn; inserts land in a fresh key space
      val inserts = orders.filter(k % 10 === 0).select(op(1L, "i", ns,
        to_json(struct((k + 100000000L).as("_id"), col("o_custkey").as("custkey"),
          lit("N").as("status"), lit(1.5).as("price"))), nullS): _*)
      val v2Updates = orders.filter(k % 3 === 0).select(op(2L, "u", ns,
        to_json(struct(struct(struct(lit("X").as("status")).as("u")).as("diff"))),
        to_json(struct(k.as("_id")))): _*)
      val v1Incs = orders.filter(k % 5 === 0 && k % 3 =!= 0).select(op(3L, "u", ns,
        lit("""{"$v":1,"$inc":{"price":10}}"""), to_json(struct(k.as("_id")))): _*)
      val deletes = orders.filter(k % 7 === 0 && k % 3 =!= 0 && k % 5 =!= 0)
        .select(op(4L, "d", ns, to_json(struct(k.as("_id"))), nullS): _*)
      val txns = orders
        .filter(k % 11 === 0 && k % 3 =!= 0 && k % 5 =!= 0 && k % 7 =!= 0)
        .select(op(5L, "c", lit("app.$cmd"), format_string(
          """{"applyOps":[{"op":"u","ns":"app.orders_state","o":{"diff":{"u":{"custkey":%d}}},"o2":{"_id":%d}}]}""",
          col("o_custkey") + 1000000L, k), nullS): _*)
      val noise = orders.filter(k % 13 === 0).select(op(6L, "i", lit("local.junk"),
        lit("""{"_id":1}"""), nullS): _*)
      val logDir = s"$out/changelog"
      // ONE write job emits all six op-class files (range partition on a
      // class tag = one file per class) instead of six scan+write jobs —
      // the classes are key-disjoint, so file packing can't affect the
      // converged state (that independence is this query's subject)
      Seq(inserts, v2Updates, v1Incs, deletes, txns, noise).zipWithIndex
        .map { case (df, i) => df.withColumn("__f", lit(i)) }
        .reduce(_.unionByName(_))
        .repartitionByRange(6, col("__f")).drop("__f")
        .write.mode("append").parquet(logDir)
      // 3 files per trigger over 6 files = TWO micro-batches: still the
      // multi-batch cut-independence under test (disjoint key classes),
      // one fewer full sink-upsert cycle of pure fixture cadence
      streaming.ApplyJob.catchUp(s, logDir, sink, cfg, s"$out/ckpt",
        maxFilesPerTrigger = 3)
      sink.read("app.orders_state")
        .select(
          get_json_object(col("doc"), "$._id").cast("long").as("k"),
          get_json_object(col("doc"), "$.custkey").cast("long").as("custkey"),
          get_json_object(col("doc"), "$.status").as("status"),
          get_json_object(col("doc"), "$.price").cast("double").as("price"))
        .orderBy("k")
    }),

    // ---- ST1: the copy/stream-overlap handoff — the reference starts
    // oplog capture BEFORE the data copy, so cached ops overlap what the
    // copy already read (oplog_streamer.go:112-158: CacheOplogs runs
    // from the start; ApplyCachedOplogs replays the full cache after the
    // copy). Here the copied snapshot ALREADY reflects every logged op
    // (set-updates on part %3, deletes on %7∖%3, inserts on a fresh key
    // space), then the FULL backlog replays on top of it. The idempotent
    // op classes (insert=replace, $set, delete) make the replay converge
    // to the same state — the at-least-once handoff discipline, pinned:
    // the oracle recomputes the post-op state straight from `part`. ----
    "q_st1_overlap" -> ((s, dir) => {
      val out = scratchDir("st1")
      val sink = new sources.ParquetCatalog(s, s"$out/sink", db = "app")
      val cfg = config.MigratorConfig(command = "data", source = dir, target = out)
      val p = load(s, dir, "part")
      val k = col("p_partkey")
      val ns = lit("app.part_state")
      def op(ts: Long, opc: String, o: org.apache.spark.sql.Column,
          o2: org.apache.spark.sql.Column) = Seq(
        lit(ts).as("ts"), lit(opc).as("op"), ns.as("ns"), o.as("o"), o2.as("o2"),
        lit(0L).as("h"), lit(0L).as("t"), lit(2).as("v"))
      val nullS = lit(null).cast("string")
      // the change log captured while the copy ran
      val updates = p.filter(k % 3 === 0).select(op(1L, "u",
        to_json(struct(struct(struct(lit("X").as("brand")).as("u")).as("diff"))),
        to_json(struct(k.as("_id")))): _*)
      val deletes = p.filter(k % 7 === 0 && k % 3 =!= 0)
        .select(op(2L, "d", to_json(struct(k.as("_id"))), nullS): _*)
      val inserts = p.filter(k % 10 === 0).select(op(3L, "i",
        to_json(struct((k + 100000000L).as("_id"), lit("NEW").as("brand"),
          lit(9.99).as("retail"))), nullS): _*)
      val logDir = s"$out/changelog"
      // one write job for all three op classes (they replay in ONE
      // micro-batch below anyway — see the maxFilesPerTrigger note)
      Seq(updates, deletes, inserts).zipWithIndex
        .map { case (df, i) => df.withColumn("__f", lit(i)) }
        .reduce(_.unionByName(_))
        .repartitionByRange(3, col("__f")).drop("__f")
        .write.mode("append").parquet(logDir)
      // the copy lands AFTER those ops: snapshot = post-op state
      val surviving = p.filter(!(k % 7 === 0 && k % 3 =!= 0))
        .select(k.cast("string").as("id"),
          to_json(struct(k.as("_id"),
            when(k % 3 === 0, lit("X")).otherwise(col("p_brand")).as("brand"),
            col("p_retailprice").as("retail"))).as("doc"))
      val insertedRows = p.filter(k % 10 === 0)
        .select((k + 100000000L).cast("string").as("id"),
          to_json(struct((k + 100000000L).as("_id"), lit("NEW").as("brand"),
            lit(9.99).as("retail"))).as("doc"))
      sink.write("app.part_state", surviving.unionByName(insertedRows))
      val nBefore = sink.read("app.part_state").count()
      // ST1 handoff: replay the FULL backlog over the copied snapshot.
      // One micro-batch (maxFilesPerTrigger = all 3 files): the shape
      // under test is replay-over-converged-snapshot idempotence;
      // batch-CUT independence is q_st2_catchup's subject (2 files per
      // trigger there), and each extra trigger here costs a full sink
      // upsert cycle for no additional coverage
      streaming.ApplyJob.catchUp(s, logDir, sink, cfg, s"$out/ckpt",
        maxFilesPerTrigger = 3)
      sink.read("app.part_state")
        .select(
          get_json_object(col("doc"), "$._id").cast("long").as("k"),
          get_json_object(col("doc"), "$.brand").as("brand"),
          get_json_object(col("doc"), "$.retail").cast("double").as("retail"))
        .withColumn("n_before", lit(nBefore))
        .orderBy("k")
    }),

    // ---- ST3: live tail — the stream runs under Trigger.ProcessingTime
    // (LiveStreamOplogs, oplog_streamer.go:300-323) while new change-log
    // files land BEHIND it, and the replication-lag metric (now − newest
    // applied ts, :308-316) is read off the running Handle. Key classes
    // are disjoint, so the final state is batch-cut independent; the
    // oracle recomputes it from `customer` plus pins the applied-op
    // total and a sane-lag flag (event times sit at a fixed past epoch,
    // so lag must land in (0, 1e9) s). ----
    "q_st3_tail" -> ((s, dir) => {
      val out = scratchDir("st3")
      val sink = new sources.ParquetCatalog(s, s"$out/sink", db = "app")
      val cfg = config.MigratorConfig(command = "data", source = dir, target = out)
      val c = load(s, dir, "customer")
      val k = col("c_custkey")
      sink.write("app.cust_state", c.select(
        k.cast("string").as("id"),
        to_json(struct(k.as("_id"), col("c_acctbal").as("bal"),
          col("c_mktsegment").as("seg"))).as("doc")))
      val ns = lit("app.cust_state")
      // BSON-Timestamp packing: epoch seconds ride in the high 32 bits
      val t0 = 1700000000L << 32
      def op(ts: Long, opc: String, o: org.apache.spark.sql.Column,
          o2: org.apache.spark.sql.Column) = Seq(
        lit(ts).as("ts"), lit(opc).as("op"), ns.as("ns"), o.as("o"), o2.as("o2"),
        lit(0L).as("h"), lit(0L).as("t"), lit(2).as("v"))
      val nullS = lit(null).cast("string")
      val updates = c.filter(k % 3 === 0).select(op(t0 + 1, "u",
        to_json(struct(struct(struct(lit("GOLD").as("seg")).as("u")).as("diff"))),
        to_json(struct(k.as("_id")))): _*)
      val deletes = c.filter(k % 7 === 0 && k % 3 =!= 0)
        .select(op(t0 + 2, "d", to_json(struct(k.as("_id"))), nullS): _*)
      val inserts = c.filter(k % 10 === 0).select(op(t0 + 3, "i",
        to_json(struct((k + 100000000L).as("_id"), lit(0.0).as("bal"),
          lit("NEW").as("seg"))), nullS): _*)
      val expected =
        c.filter(k % 3 === 0).count() +
          c.filter(k % 7 === 0 && k % 3 =!= 0).count() +
          c.filter(k % 10 === 0).count()
      val logDir = s"$out/changelog"
      // wave 1 is on disk before the stream starts (the backlog)…
      updates.coalesce(1).write.mode("append").parquet(logDir)
      // 250 ms trigger + 50 ms polls: the subject is the LIVE tail (ops
      // landing behind a running stream + the lag metric), not trigger
      // idle time — tighter cadence trims pure wait from the fixture
      val h = streaming.ApplyJob.stream(s, logDir, sink, cfg, s"$out/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger
          .ProcessingTime("250 milliseconds"),
        maxFilesPerTrigger = 2)
      try {
        // …waves 2 and 3 land while the tail is live
        deletes.coalesce(1).write.mode("append").parquet(logDir)
        inserts.coalesce(1).write.mode("append").parquet(logDir)
        val deadline = System.currentTimeMillis() + 120000
        while (h.counts.total < expected &&
            System.currentTimeMillis() < deadline)
          Thread.sleep(50)
      } finally h.stop()
      val lagOk = h.lagSeconds > 0 && h.lagSeconds < 1e9
      sink.read("app.cust_state")
        .select(
          get_json_object(col("doc"), "$._id").cast("long").as("k"),
          get_json_object(col("doc"), "$.bal").cast("double").as("bal"),
          get_json_object(col("doc"), "$.seg").as("seg"))
        .withColumn("applied_total", lit(h.counts.total))
        .withColumn("lag_ok", lit(lagOk))
        .orderBy("k")
    }),

    // ---- S5/S6/P5: catalog scans — databases, namespaces, and the
    // system-collection filter (ListDatabaseNames/ListCollectionNames +
    // the system.* skip, mongo_utils.go) — over a freshly-seeded
    // multi-db catalog: system DBS (admin/config/local) and system.*
    // collections (except system.js, like the reference) are hidden. ----
    "q_s5_catalog" -> ((s, dir) => {
      import s.implicits._
      val out = scratchDir("s5")
      val cat = new sources.MultiDbParquetCatalog(s, out)
      val one = Seq((1L, "x")).toDF("id", "v")
      Seq("app.users", "app.items", "app.system.profile", "app.system.js",
        "web.sessions", "admin.junk", "config.chunks", "local.oplog")
        .foreach(ns => cat.write(ns, one))
      val dbs = cat.listDatabases()
      cat.listNamespaces().map(ns => (ns, cat.keyOf(ns), dbs.mkString(",")))
        .toDF("ns", "key", "dbs").orderBy("ns")
    }),

    // ---- A3: parent count rollup via `observe` (the reference's
    // per-task inserted counter, data_copier.go:142-176) — one copy,
    // counts taken from the EXECUTED plan's observation, no second
    // scan; the oracle recomputes both from the source table. ----
    "q_a3_observe" -> ((s, dir) => {
      import s.implicits._
      val out = scratchDir("a3")
      val source = new sources.ParquetCatalog(s, dir, db = "src")
      val sink = new sources.ParquetCatalog(s, s"$out/sink", db = "src")
      val r = copy.CopyJob.copyNamespace(source, sink, "src.part", None)
      Seq((r.namespace, r.to, r.rowsRead, r.rowsInTarget))
        .toDF("ns", "to_ns", "rows_read", "rows_in_target")
    }),

    // ---- D1/D2 + P3/T6 on DDL: manifest capture → include-filter →
    // rename → persist as catalog rows → load back (collection options
    // + index defs, collection_creator.go:19-86 / index_copier.go:14-62,
    // degraded to the namespace+pk sections a parquet source carries).
    // The oracle is the expected round-tripped manifest. ----
    "q_d1_manifest" -> ((s, dir) => {
      import s.implicits._
      val out = scratchDir("d1")
      val source = new sources.ParquetCatalog(s, dir, db = "src")
      val sink = new sources.ParquetCatalog(s, s"$out/sink", db = "tgt")
      val cfg = config.MigratorConfig(command = "config", source = dir, target = out,
        includes = Seq(config.IncludeSpec(namespace = "src.nation", to = "tgt.nation2"),
          config.IncludeSpec(namespace = "src.region")))
      val m = ddl.Manifest.capture(source).filtered(cfg).withRenames(cfg)
      ddl.Manifest.persist(s, sink, m)
      val back = ddl.Manifest.load(s, sink)
      (back.collections.map(c => ("collection", c.ns, "")) ++
        back.indexes.map(i => ("index", i.ns, i.keysJson)))
        .toDF("section", "ns", "detail").orderBy("section", "ns")
    }),

    // ---- O6: resume an interrupted copy (Resume, migrator.go / the
    // reference's queue repair) — the target starts HALF-written
    // (supplier keys %2); resume reruns the copy fan-out, whose
    // idempotent upsert (K1) completes the table without duplicating
    // the half already there. The oracle is simply the full source. ----
    "q_o6_resume" -> ((s, dir) => {
      val out = scratchDir("o6")
      val source = new sources.ParquetCatalog(s, dir, db = "src")
      val sink = new sources.ParquetCatalog(s, s"$out/sink", db = "src")
      val cfg = config.MigratorConfig(command = "data", source = dir, target = out,
        includes = Seq(config.IncludeSpec(namespace = "src.supplier"),
          config.IncludeSpec(namespace = "src.region")))
      sink.write("src.supplier",
        load(s, dir, "supplier").filter(col("s_suppkey") % 2 === 0))
      Migrate.resume(s, cfg, source, sink, s"$out/ckpt")
      sink.read("src.supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
        .withColumn("n_region", lit(sink.read("src.region").count()))
        .orderBy("s_suppkey")
    }),

    // ---- D4: chunk map → partition plan (config_copier.go:244-342's
    // pre-split/move collapses into repartitionByRange(n) at write
    // time) — one chunk spec per distinct customer nation, persisted
    // through the sink catalog as manifest rows, loaded back, and the
    // suggested partition count derived from the ROUND-TRIPPED chunk
    // map. The oracle recomputes bounds and count from `customer`. ----
    "q_d4_partitions" -> ((s, dir) => {
      import s.implicits._
      val out = scratchDir("d4")
      val source = new sources.ParquetCatalog(s, dir, db = "src")
      val sink = new sources.ParquetCatalog(s, out, db = "tgt")
      val bounds = load(s, dir, "customer")
        .select(col("c_nationkey").cast("long")).distinct()
        .orderBy(col("c_nationkey")).as[Long]
        .collect().toIndexedSeq // ≤25 values: the chunk map is driver-sized metadata
      val chunks = bounds.zipWithIndex.map { case (b, i) =>
        val hi = if (i + 1 < bounds.length) bounds(i + 1).toString else "+inf"
        ddl.ChunkSpec("src.customer", s"""{"c_nationkey":$b}""",
          s"""{"c_nationkey":"$hi"}""", s"shard${i % 3}")
      }
      ddl.Manifest.persist(s, sink, ddl.Manifest.capture(source).copy(chunks = chunks))
      val back = ddl.Manifest.load(s, sink)
      val n = ddl.Manifest.suggestedPartitions(back, "src.customer").getOrElse(-1)
      val unchunkedNone = ddl.Manifest.suggestedPartitions(back, "src.orders").isEmpty
      back.chunks.filter(_.ns == "src.customer")
        .map { c =>
          val lo = c.minJson.stripPrefix("""{"c_nationkey":""").stripSuffix("}").toLong
          (lo, c.maxJson, c.shard)
        }
        .sortBy(_._1)
        .toDF("min_key", "max_json", "shard")
        .withColumn("suggested", lit(n))
        .withColumn("unchunked_is_none", lit(unchunkedNone))
        .orderBy("min_key")
    }),

    // ---- S8/D3: sharding-config replication — the four decisions the
    // reference replays against a sharded target (config_copier.go:
    // 89-102 primary mapping incl. its overwrite quirk, :132-158 zone
    // pairing, :244-297 split selection, :299-336 round-robin moves) as
    // pure arithmetic (ddl/Sharding.scala) over a metadata fixture
    // derived from region/nation: source shards = the 5 region names,
    // target shards = the 3 regions with key < 3 ("-T" suffix), chunk
    // mins = the 25 nation names. The chunk/sharded sections round-trip
    // through the REAL manifest persist/load (the S8 state-store scan)
    // before the arithmetic reads them back. Shard lists and chunk maps
    // are config-sized metadata — driver-resident by nature, exactly as
    // the reference collects them. ----
    "q_d3_shards" -> ((s, dir) => {
      import s.implicits._
      val out = scratchDir("d3")
      val sink = new sources.ParquetCatalog(s, s"$out/sink", db = "tgt")
      val sourceShards = load(s, dir, "region")
        .select(col("r_name")).as[String].collect().sorted.toIndexedSeq
      val targetShards = load(s, dir, "region")
        .filter(col("r_regionkey") < 3)
        .select(col("r_name")).as[String].collect().sorted
        .map(_ + "-T").toIndexedSeq
      val chunkMins = load(s, dir, "nation")
        .select(col("n_name")).as[String].collect().sorted.toIndexedSeq
      // persist the sharding sections through the catalog, then act on
      // the LOADED manifest (min keys ride as opaque strings)
      val m = ddl.Manifest(
        shardedCollections = Seq(
          ddl.ShardedCollectionSpec("app.customer", """{"c_custkey":1}""")),
        chunks = chunkMins.zipWithIndex.map { case (mn, i) =>
          ddl.ChunkSpec("app.customer", mn,
            if (i + 1 < chunkMins.size) chunkMins(i + 1) else "$maxKey",
            sourceShards(i % sourceShards.size))
        })
      ddl.Manifest.persist(s, sink, m)
      val back = ddl.Manifest.load(s, sink)
      val mins = back.chunks.filter(_.ns == "app.customer")
        .map(_.minJson).sorted
      val splits = ddl.Sharding.splitPoints(mins, targetShards.size)
      val rows =
        ddl.Sharding.primaryMap(sourceShards, targetShards).toSeq
          .map { case (a, b) => ("primary", a, b) } ++
        ddl.Sharding.zoneAssignments(
            sourceShards.map(n => n -> Seq(s"zone_$n")),
            sourceShards.map(_ + "-T"))
          .map { case (t, z) => ("zone", t, z) } ++
        back.shardedCollections.map(sc => ("sharded", sc.ns, sc.keyJson)) ++
        splits.map(("split", "app.customer", _)) ++
        ddl.Sharding.chunkMoves(mins.head +: splits, targetShards)
          .map { case (mn, sh) => ("move", mn, sh) }
      rows.toDF("section", "k", "v").orderBy("section", "k", "v")
    }),

    // ---- P3/X3: wildcard include expansion through the REAL copy
    // fan-out (SkipNamespace wildcards, migrator.go:237-251; per-ns
    // fan-out, data_copier.go:71-107) — `*.nation` expands while an
    // exact include renames `src.region`; each expansion must land
    // under its OWN name (a wildcard's literal `db.*` string must
    // never become a write target). The oracle recomputes per-ns row
    // counts and the expected sink namespace list. ----
    "q_p3_wildcards" -> ((s, dir) => {
      import s.implicits._
      val out = scratchDir("p3")
      val source = new sources.ParquetCatalog(s, dir, db = "src")
      val sink = new sources.ParquetCatalog(s, out, db = "src")
      val cfg = config.MigratorConfig(command = "data", source = dir, target = out,
        includes = Seq(config.IncludeSpec(namespace = "*.nation"),
          config.IncludeSpec(namespace = "src.region", to = "src.region2")))
      val res = copy.CopyJob.run(cfg, source, sink)
      val sinkNs = sink.listNamespaces().sorted.mkString(",")
      res.map(r => (r.namespace, r.to, r.rowsRead))
        .toDF("ns", "to_ns", "rows_read")
        .withColumn("sink_ns", lit(sinkNs))
        .orderBy("ns")
    }),

    // ---- A5: apply-result counters (BulkWriteOplogsResult,
    // oplog_utils.go:79-85) — one applyBatch over a change-log with
    // disjoint op classes against a seeded state table; the counters
    // come from the SAME fold that writes the merge (no second pass).
    // The oracle recomputes inserted/modified/deleted from `orders`.
    // Skip-fodder (`local.junk` + empty-ns noops) must not count. ----
    "q_a5_counters" -> ((s, dir) => {
      import s.implicits._
      val out = scratchDir("a5")
      val sink = new sources.ParquetCatalog(s, s"$out/sink", db = "app")
      val cfg = config.MigratorConfig(command = "data", source = dir, target = out)
      val orders = load(s, dir, "orders")
      val k = col("o_orderkey")
      sink.write("app.orders_state", orders.select(
        k.cast("string").as("id"),
        to_json(struct(k.as("_id"), col("o_custkey").as("custkey"),
          col("o_orderstatus").as("status"), col("o_totalprice").as("price"))).as("doc")))
      val ns = lit("app.orders_state")
      def op(ts: Long, opc: String, nsCol: org.apache.spark.sql.Column,
          o: org.apache.spark.sql.Column, o2: org.apache.spark.sql.Column) = Seq(
        lit(ts).as("ts"), lit(opc).as("op"), nsCol.as("ns"), o.as("o"), o2.as("o2"),
        lit(0L).as("h"), lit(0L).as("t"), lit(2).as("v"))
      val nullS = lit(null).cast("string")
      val inserts = orders.filter(k % 10 === 0).select(op(1L, "i", ns,
        to_json(struct((k + 100000000L).as("_id"), col("o_custkey").as("custkey"),
          lit("N").as("status"), lit(1.5).as("price"))), nullS): _*)
      val v2Updates = orders.filter(k % 3 === 0).select(op(2L, "u", ns,
        to_json(struct(struct(struct(lit("X").as("status")).as("u")).as("diff"))),
        to_json(struct(k.as("_id")))): _*)
      val v1Incs = orders.filter(k % 5 === 0 && k % 3 =!= 0).select(op(3L, "u", ns,
        lit("""{"$v":1,"$inc":{"price":10}}"""), to_json(struct(k.as("_id")))): _*)
      val deletes = orders.filter(k % 7 === 0 && k % 3 =!= 0 && k % 5 =!= 0)
        .select(op(4L, "d", ns, to_json(struct(k.as("_id"))), nullS): _*)
      val noise = orders.filter(k % 13 === 0).select(op(5L, "i", lit("local.junk"),
        lit("""{"_id":1}"""), nullS): _*)
      val noops = orders.filter(k % 13 === 0).select(op(5L, "n", lit(""),
        nullS, nullS): _*)
      val batch = inserts.unionByName(v2Updates).unionByName(v1Incs)
        .unionByName(deletes).unionByName(noise).unionByName(noops)
      val res = streaming.ApplyJob.applyBatch(batch.as[streaming.Oplog], sink, cfg)
      res.counts.toSeq.map { case (n, c) =>
        (n, c.inserted, c.modified, c.deleted, c.total) }
        .toDF("ns", "inserted", "modified", "deleted", "total")
        .orderBy("ns")
    }),

    // ---- K4/S9: the status log sink + its read-back scan
    // (Workspace.Log → _neutrino.logs, workspace.go:125-133;
    // FindAllParentTasks-style state reads, workspace.go:312-331) —
    // three lifecycle statuses appended through the real Workspace,
    // read back in (ts, seq) append order. Wall-clock columns stay
    // internal; the pinned output is the ordinal + status. ----
    "q_k4_logs" -> ((s, dir) => {
      import s.implicits._
      val out = scratchDir("k4")
      val sink = new sources.ParquetCatalog(s, out, db = "meta")
      val ws = new sources.Workspace(s, sink)
      ws.log("copy started")
      ws.log("copy completed")
      ws.log("stream caught up")
      val w = Window.orderBy(col("ts"), col("seq"))
      ws.logs() // tiny meta table: the global window is 3 rows
        .withColumn("ordinal", row_number().over(w).cast("long"))
        .select("ordinal", "status")
        .orderBy("ordinal")
    }),

    // ---- D5/D6: the drop + pre-flight guard lifecycle
    // (DoesDataExist, config_copier.go:114-130; DropCollections,
    // migrator.go:155-193) — a half-seeded target WITHOUT drop must be
    // refused (and stay untouched: the guard validates every namespace
    // before mutating any); the same config WITH drop replaces it with
    // the full copy. The oracle recomputes both counts from `nation`. ----
    "q_d5_guard" -> ((s, dir) => {
      import s.implicits._
      val out = scratchDir("d5")
      val source = new sources.ParquetCatalog(s, dir, db = "src")
      val sink = new sources.ParquetCatalog(s, s"$out/sink", db = "src")
      sink.write("src.nation",
        load(s, dir, "nation").filter(col("n_nationkey") % 2 === 0))
      val cfg = config.MigratorConfig(command = "data", source = dir, target = out,
        includes = Seq(config.IncludeSpec(namespace = "src.nation")))
      val refused =
        try { copy.CopyJob.run(cfg, source, sink); false }
        catch { case _: IllegalStateException => true }
      val intact = sink.read("src.nation").count()
      copy.CopyJob.run(cfg.copy(isDrop = true), source, sink)
      val recopied = sink.read("src.nation").count()
      Seq((refused, intact, recopied))
        .toDF("refused", "intact_rows", "recopied_rows")
    }),

    // ---- Streaming curation chain end-to-end (DocStream.curateStream:
    // exact-dup gate → quality/lang filter → PII scrub → hash split)
    // driven through a REAL file stream under Trigger.AvailableNow, with
    // every gate recomputed by DuckDB. The feed is first reduced to the
    // min-id representative per content hash (sf0.1 has natural dup
    // texts whose first-wins winner would be arrival-order-dependent),
    // then planted duplicates are BYTE-IDENTICAL rows — so the gate's
    // output is arrival-order-independent at any scale factor: exactly
    // one survivor per content key whichever copy wins. ----
    "q_st_curate" -> ((s, dir) => {
      val out = scratchDir("stc")
      val keepW = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val d = load(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("__rn", row_number().over(keepW))
        .filter(col("__rn") === 1).drop("__rn")
      val corpus = d.unionByName(d.filter(col("doc_id") % 7 === 0))
        .withColumn("event_ts",
          timestamp_seconds(lit(1700000000L) + col("doc_id")))
      corpus.write.parquet(s"$out/feed")
      // state stores sized to key volume, not core count (see
      // q_st_curate_index), via the shared cloned-session helper
      val ss = streamSession(s)
      val docs = ss.readStream.schema(corpus.schema).parquet(s"$out/feed")
      streaming.DocStream.curateStream(docs, "doc_id",
          col("text"), "event_ts", "1 hour")
        .writeStream.format("parquet")
        .option("path", s"$out/curated")
        .option("checkpointLocation", s"$out/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()
      s.read.parquet(s"$out/curated")
        .select("doc_id", "n_tokens", "quality_score", "pred_lang",
          "split", "scrubbed")
        .orderBy("doc_id")
    }),

    // ---- streaming curation CUT AGAINST A FROZEN CENSUS — the
    // on-arrival form of q_pipeline_incr: every arriving micro-batch has
    // its reference-duplicating substrings removed (reference-only probe
    // — each doc's cut depends on (doc, index) alone, so the result is
    // micro-batch-invariant; DocStreamSpec pins stream ≡ batch), then
    // gates/scrub/split run on the CUT text. Feed is pre-deduped so the
    // watermark gate's first-arrival winner is deterministic for the
    // oracle (the gate itself is q_st_curate's subject) ----
    "q_st_curate_index" -> ((s, dir) => {
      val out = scratchDir("stci")
      val keepW = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val base = load(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), col("text"))
        .withColumn("__rn", row_number().over(keepW))
        .filter(col("__rn") === 1).drop("__rn")
      val idx = s"$out/refidx"
      // a 1/6 reference slice and 16 buckets: the fixture's subject is
      // the per-micro-batch CUT, not the one-time stage — stage cost and
      // tiny-file listing are kept out of the way (64 bucket dirs at
      // sf0.1 are pure metadata overhead). xxh64 = the production census
      // hash, end-to-end through the streaming cut (probes derive it
      // from the manifest); oracle-neutral — spans are pinned by gram
      // equality, the census key never reaches the output
      text.Substrings.stageGramCensus(base.filter(col("doc_id") % 6 === 0),
        "doc_id", col("text"), k = 40, dir = idx, buckets = 16,
        hash = text.Substrings.HashXxh64)
      val feed = base.filter(col("doc_id") % 3 === 1)
        .withColumn("event_ts",
          timestamp_seconds(lit(1700000000L) + col("doc_id")))
      // one job, two files (range partition on parity) = two micro-batches
      feed.withColumn("__f", col("doc_id") % 2)
        .repartitionByRange(2, col("__f")).drop("__f")
        .write.mode("append").parquet(s"$out/feed")
      // state-store partitioning sized to the KEY VOLUME, not the core
      // count — the production streaming discipline: shuffle.partitions
      // at query start fixes the dedup gate's state-store count for the
      // checkpoint's lifetime (OffsetSeqMetadata), and 32 stores ×
      // (delta + CRC) fsyncs per micro-batch is pure lifecycle cost
      // when the horizon holds a few thousand keys. Scoped via the
      // shared cloned-session helper (streamSession).
      val ss = streamSession(s)
      val src = ss.readStream.schema(feed.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$out/feed")
      streaming.DocStream.curateStreamAgainstIndex(src, "doc_id",
          "text", "event_ts", "1 hour", idx, s"$out/curated", s"$out/ckpt")
        .awaitTermination()
      s.read.parquet(s"$out/curated")
        .select(col("doc_id"), col("n_tokens"), col("quality_score"),
          col("pred_lang"), col("split"), md5(col("text")).as("clean_md5"))
        .orderBy("doc_id")
    }),

    // ---- streaming curation with APPEND-AFTER-CUT: each micro-batch is
    // cut against the index, then its RAW grams are appended, so a LATER
    // batch repeating this batch's text collides and gets cut —
    // cross-batch substring dedup, first-arrival-wins. The output is
    // batch-ORDER-dependent, so the three feed files carry explicit
    // mod-times (the file source processes them oldest-first) and the
    // oracle recomputes the per-batch census states from scratch.
    // Batches 2 and 3 carry PLANTED near-copies (unique filler + the
    // first 120 chars of an earlier batch's doc): the copied region
    // collides with the appended grams and is cut, the filler survives.
    // compactEvery=2 compacts the census mid-stream (after batch 2,
    // before batch 3's probe) — the oracle thereby pins streaming
    // compaction as probe-invisible, not just spec-pinned. ----
    "q_st_curate_append" -> ((s, dir) => {
      val out = scratchDir("stcap")
      val keepW = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val base = load(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), col("text"))
        .withColumn("__rn", row_number().over(keepW))
        .filter(col("__rn") === 1).drop("__rn")
      val idx = s"$out/refidx"
      text.Substrings.stageGramCensus(base.filter(col("doc_id") % 6 === 0),
        "doc_id", col("text"), k = 40, dir = idx, buckets = 16,
        hash = text.Substrings.HashXxh64)
      val fd = base.filter(col("doc_id") % 3 === 1)
      val b0 = fd.filter(col("doc_id") % 2 === 1)
      val b1org = fd.filter(col("doc_id") % 2 === 0)
      // a planted near-copy: first 120 chars of the source doc + a
      // filler unique per doc (id interleaved) — the copy region collides
      // with the source's appended grams, the filler passes the gates
      def plant(src: DataFrame, m: Int, offset: Long, mid: String,
          tail: String): DataFrame =
        src.filter(col("doc_id") % 5 === m)
          .select((col("doc_id") + offset).as("doc_id"),
            concat(substring(col("text"), 1, 120), lit(mid),
              col("doc_id").cast("string"), lit(tail)).as("text"))
      val b1 = b1org.unionByName(plant(b0, 1, 1000000L,
        " planted first copy about doc ",
        " where the quick brown fox jumps over the lazy dog"))
      val b2 = plant(b1org, 2, 2000000L,
          " second planted copy about doc ",
          " pack the box with five dozen liquor jugs")
        .unionByName(plant(b0, 3, 3000000L,
          " third planted copy about doc ",
          " we all live in a yellow submarine today"))
      // event times all inside one minute: the dedup gate's watermark
      // never expires state mid-feed at any scale factor, and the gate
      // itself is q_st_curate's subject (feed is pre-deduped + plants
      // are unique, so it drops nothing here)
      def stamp(df: DataFrame): DataFrame = df.withColumn("event_ts",
        timestamp_seconds(lit(1700000000L) + pmod(col("doc_id"), lit(60))))
      // one file per batch with EXPLICIT, strictly increasing mod-times
      // (and matching path order): append-after-cut output depends on
      // arrival order, so the order is pinned, not left to write timing
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
        val tmp = s"$out/tmp$i"
        stamp(b).coalesce(1).write.parquet(tmp)
        val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
          .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
        val dst = new org.apache.hadoop.fs.Path(s"$out/feed/b$i.parquet")
        fs.mkdirs(dst.getParent)
        require(fs.rename(part, dst), s"failed to place $dst")
        fs.setTimes(dst, 1700000000000L + i * 60000L, -1)
      }
      val feedSchema = s.read.parquet(s"$out/feed").schema
      // state stores sized to key volume (see q_st_curate_index),
      // scoped via the shared cloned-session helper (streamSession)
      val ss = streamSession(s)
      val src = ss.readStream.schema(feedSchema)
        .option("maxFilesPerTrigger", 1).parquet(s"$out/feed")
      streaming.DocStream.curateStreamAgainstIndex(src, "doc_id",
          "text", "event_ts", "1 hour", idx, s"$out/curated",
          s"$out/ckpt", appendAfterCut = true, compactEvery = 2)
        .awaitTermination()
      s.read.parquet(s"$out/curated")
        .select(col("doc_id"), col("n_tokens"), col("quality_score"),
          col("pred_lang"), col("split"), md5(col("text")).as("clean_md5"))
        .orderBy("doc_id")
    }),

    // ---- O5: progress + ETA monitor — a REAL tracked copy fan-out
    // (scheduler-fed listener, Wait loop data_copier.go:142-176) pinned
    // by its invariants (tasks observed, all completed, none failed,
    // zero ETA at completion; rows copied recounted by DuckDB), plus the
    // reference's elapsed×(1−p)/p ETA arithmetic recomputed by DuckDB
    // over fixture snapshots. Raw task counts are scheduler-dependent
    // (partitioning, AQE), so the pin is on the invariants, not the
    // counts. ----
    "q_o5_progress" -> ((s, dir) => {
      import s.implicits._
      val out = scratchDir("o5")
      val source = new sources.ParquetCatalog(s, dir, db = "src")
      val sink = new sources.ParquetCatalog(s, s"$out/sink", db = "src")
      val cfg = config.MigratorConfig(command = "data", source = dir, target = out,
        includes = Seq(config.IncludeSpec(namespace = "src.nation"),
          config.IncludeSpec(namespace = "src.region")))
      val (res, snap) = copy.CopyJob.runTracked(copy.CopyJob.plan(cfg, source),
        source, sink)
      val copied = res.map(_.rowsRead).sum
      val live = snap.total > 0 && snap.completed == snap.total &&
        snap.failed == 0 && snap.etaMs.contains(0L)
      val fixtures = Seq((100L, 25L, 5L, 60000L), (8L, 1L, 0L, 1000L),
        (10L, 0L, 0L, 500L), (4L, 4L, 0L, 2000L))
      fixtures.map { case (t, c, f, e) =>
        val sn = monitor.Progress.Snapshot(t, c, f, e)
        (t, c, f, sn.etaMs, t - c - f, copied, live)
      }.toDF("total", "completed", "failed", "eta_ms", "pending",
        "rows_copied", "live_run_ok")
        .orderBy("total")
    }),

    // ---- §7 time-series: as-of (backward temporal) join — each click
    // picks up the user's latest at-or-before purchase. Union + tagged
    // per-key running window (ops/AsofJoin.scala): ONE hash exchange on
    // user_id, zero joins — never the quadratic non-equi join Spark
    // would plan for `r.t <= p.t`. ----
    "q_asof" -> ((s, dir) => {
      val raw = load(s, dir, "events")
      val ev = raw
        .select(col("event_id"), col("user_id"),
          Tables.tsUs(raw).as("ts_us"), col("event_type"), col("value"))
      val probes = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts_us")
      val refs = ev
        .filter(col("event_type") === "purchase" && col("value").isNotNull)
        .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
      ops.AsofJoin.asofLast(probes, refs, key = "user_id",
          timeCol = "ts_us", tieCol = "event_id",
          payload = Seq("event_id", "value"))
        .orderBy("event_id")
    }),

    // ---- §7 time-series: FORWARD as-of join — each click picks up the
    // user's earliest at-or-after purchase (smallest event_id on time
    // ties), with the matched purchase TIME in the payload. Same
    // union+carry single-exchange shape as q_asof, run over negated
    // times (ops/AsofJoin.asofNext). ----
    "q_asof_next" -> ((s, dir) => {
      val raw = load(s, dir, "events")
      val ev = raw
        .select(col("event_id"), col("user_id"),
          Tables.tsUs(raw).as("ts_us"), col("event_type"), col("value"))
      val probes = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts_us")
      val refs = ev
        .filter(col("event_type") === "purchase" && col("value").isNotNull)
        .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
      ops.AsofJoin.asofNext(probes, refs, key = "user_id",
          timeCol = "ts_us", tieCol = "event_id",
          payload = Seq("ts_us", "event_id", "value"))
        .orderBy("event_id")
    }),

    // ---- §7 time-series: TOLERANCE-bounded as-of join — each click
    // picks up the user's latest at-or-before purchase, but only if it
    // happened within the last hour (pandas merge_asof(tolerance=…) /
    // attribution-horizon semantics). Same single-exchange union+carry
    // plan as q_asof; the gate is one narrow integer projection
    // (ops/AsofJoin.asofWithin) — no extra shuffle, join, or window. ----
    "q_asof_within" -> ((s, dir) => {
      val raw = load(s, dir, "events")
      val ev = raw
        .select(col("event_id"), col("user_id"),
          Tables.tsUs(raw).as("ts_us"), col("event_type"), col("value"))
      val probes = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts_us")
      val refs = ev
        .filter(col("event_type") === "purchase" && col("value").isNotNull)
        .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
      ops.AsofJoin.asofWithin(probes, refs, key = "user_id",
          timeCol = "ts_us", tieCol = "event_id",
          payload = Seq("event_id", "value"), toleranceUs = 3600000000L)
        .orderBy("event_id")
    }),

    // ---- §7 stream-stream attribution join, pinned through its batch
    // twin (identical code path; the watermark node is eliminated for
    // batch inputs): every purchase within [view_ts, view_ts + 1h) per
    // user. The equality key (user_id) carries the shuffle; the range
    // condition is a narrow residual — and in streaming it is the
    // load-bearing state-eviction bound (EventStream.attributionJoin;
    // EventStreamSpec pins stream == batch across a micro-batch split). ----
    "q_attribution" -> ((s, dir) =>
      streaming.EventStream.attributionJoin(
          load(s, dir, "events"), openType = "view", pointType = "purchase")
        .orderBy("open_id", "point_id")),

    // ---- §7 time-series resampling: each user's purchases forward-
    // filled onto a daily grid. Grid = per-key span/step rows (loud
    // guard on runaway spans); the fill IS AsofJoin.asofLast — the
    // audited zero-join union+carry plan (ops/Resample.scala). ----
    "q_resample" -> ((s, dir) => {
      val raw = load(s, dir, "events")
      val obs = raw
        .filter(col("event_type") === "purchase" && col("value").isNotNull)
        .select(col("user_id"), Tables.tsUs(raw).as("ts_us"),
          col("event_id"), col("value"))
      ops.Resample.forwardFill(obs, "user_id", "ts_us", tieCol = "event_id",
          payload = Seq("event_id", "value"), stepUs = 86400000000L)
        .orderBy("user_id", "ts_us")
    }),

    // ---- §7 time-series: bucketed interval join — clicks attributed to
    // the purchase window [purchase_ts, purchase_ts + 1h). Intervals
    // explode to ≤2 hour-buckets, the join is a plain equi-join on
    // (user, bucket) + exact residual (ops/RangeJoin.scala) — no
    // per-key cross product, no BroadcastNestedLoop. ----
    "q_range_join" -> ((s, dir) => {
      val raw = load(s, dir, "events")
      val ev = raw
        .select(col("event_id"), col("user_id"),
          Tables.tsUs(raw).as("ts_us"), col("event_type"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("t_us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts_us").as("start_us"),
          (col("ts_us") + lit(3600000000L)).as("end_us"))
      val hits = ops.RangeJoin.intervalJoin(clicks, purchases,
        key = "user_id", t = "t_us", start = "start_us", end = "end_us",
        bucketWidth = 3600000000L)
      val counts = hits.groupBy("purchase_id")
        .agg(count(lit(1)).as("n_clicks"), min("t_us").as("first_click_us"))
      purchases.select("purchase_id")
        .join(counts, Seq("purchase_id"), "left")
        .na.fill(0L, Seq("n_clicks"))
        .orderBy("purchase_id")
    }),

    // ---- §4 layout: Z-order zone-map statistics — Morton-interleave
    // (user, day), bucket by Z-prefix, emit per-zone min/max exactly as
    // a parquet footer would carry them (ops/ZOrder.scala). Pure integer
    // shift/mask arithmetic → bit-identical in DuckDB via
    // ZOrder.zvalueSql; the write-side layout operator
    // (ZOrder.layout) is one repartitionByRange on the same code. ----
    "q_zorder" -> ((s, dir) => {
      val raw = load(s, dir, "events")
      val ev = raw.select(col("user_id").as("u"), Tables.tsUs(raw).as("ts_us"))
        .select(col("u"), Tables.floorDiv("ts_us", 86400000000L).as("d"))
      ops.ZOrder.zoneStats(ev, col("u"), col("d"), bits = 16, zoneShift = 8)
        .orderBy("zone")
    }),

    // ---- §4 layout: the RANGE-NORMALIZED Z-code the -optimize path
    // uses (ZOrder.quantize ∘ zvalue): both dims fill their bit budget
    // from the top, so zone stats are tight in BOTH dimensions even at
    // wildly different cardinalities (user ~1500 values, day ~30). The
    // quantize arithmetic is exact-double floor division, pinned here
    // bit-for-bit against DuckDB. ----
    "q_zorder_norm" -> ((s, dir) => {
      val raw = load(s, dir, "events")
      val ev = raw.select(col("user_id").as("u"), Tables.tsUs(raw).as("ts_us"))
        .select(col("u"), Tables.floorDiv("ts_us", 86400000000L).as("d"))
      val b = ev.agg(min("u"), max("u"), min("d"), max("d")).head()
      val z = ops.ZOrder.zvalue(
        ops.ZOrder.quantize(col("u"), b.getLong(0), b.getLong(1), 16),
        ops.ZOrder.quantize(col("d"), b.getLong(2), b.getLong(3), 16), 16)
      ev.select(shiftrightunsigned(z, 26).as("zone"), col("u"), col("d"))
        .groupBy("zone")
        .agg(count(lit(1)).as("n_rows"),
          min("u").as("u_min"), max("u").as("u_max"),
          min("d").as("d_min"), max("d").as("d_max"))
        .orderBy("zone")
    }),

    // ---- §7 SQL surface: ROLLUP grouping sets with GROUPING id — the
    // hierarchy subtotal shape (per flag+status, per flag, grand total)
    // in ONE pass: Spark expands grouping sets map-side, so the plan is
    // a single hash aggregate + one exchange, not three scans. ----
    "q_rollup" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(grouping_id().cast("long").as("gid"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          count(lit(1)).as("n_items"))
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n_items")
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
    }),

    // ---- §7 SQL surface: full CUBE grouping sets — all four subtotal
    // combinations (flag×status, flag, status, grand total) in the
    // same one-pass map-side-expanded aggregate as q_rollup. ----
    "q_cube" -> ((s, dir) => {
      load(s, dir, "orders")
        .cube("o_orderpriority", "o_orderstatus")
        .agg(grouping_id().cast("long").as("gid"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"),
          count(lit(1)).as("n_orders"))
        .select("o_orderpriority", "o_orderstatus", "gid", "sum_price",
          "n_orders")
        .orderBy(col("gid"), col("o_orderpriority"), col("o_orderstatus"))
    }),

    // ---- §7 grouped top-k as a first-class operator: most frequent
    // terms per language. The per-group candidate set (one row per
    // (lang, term)) is unbounded, so the rank runs through the SAME
    // salted two-level top-k that bounds BM25 (Retrieval.saltedTopK) —
    // never a raw per-group window over corpus-sized candidates. ----
    "q_topk_group" -> ((s, dir) => {
      val counts = load(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("lang"),
          explode(text.TextFunctions.whitespaceTokens(lower(col("text"))))
            .as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("n"))
      text.Retrieval.saltedTopK(counts, col("lang"), col("tok"),
          Seq(col("n").desc, col("tok")), k = 5)
        .select(col("lang"), col("rank").cast("long").as("rank"),
          col("tok"), col("n"))
        .orderBy("lang", "rank")
    }),

    // ---- §7 warehouse surface: SCD-2 history build — per-user runs of
    // equal event_type collapsed to [valid_from, valid_to) validity
    // intervals (gaps-and-islands; ops/Scd2.scala). Two per-key window
    // passes + one aggregate; bounded per key, no global op. ----
    "q_scd2" -> ((s, dir) => {
      val raw = load(s, dir, "events")
      val ev = raw.select(col("user_id"), Tables.tsUs(raw).as("ts_us"),
        col("event_id"), col("event_type"))
      ops.Scd2.intervals(ev, key = "user_id", time = col("ts_us"),
          tieCol = "event_id", value = "event_type")
        .orderBy("user_id", "valid_from")
    }),

    // ---- §4 layout: size-aware output binning (small-files fix) — docs
    // packed into ≈16 KiB bins over a deterministic md5 order via the
    // sharded prefix-sum (ops/BinPack.scala: per-shard running sums +
    // a shards-row offset table, never a global sort/reducer). Pinned
    // via per-bin stats; all integer md5 arithmetic → engine-exact. ----
    "q_binpack" -> ((s, dir) => {
      val d = load(s, dir, "documents").select(col("doc_id"), col("n_chars"))
      ops.BinPack.assignBins(d, "doc_id", "n_chars", targetBytes = 16384L,
          salt = "v0", shards = 64)
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("bytes"))
        .orderBy("bin")
    }),

    // ---- §7 SQL surface: anti-join (NOT EXISTS) — parts never shipped
    // in a quantity-50 line. left_anti is the one-sided hash join Spark
    // plans for NOT EXISTS; no count/distinct pre-pass. ----
    "q_anti" -> ((s, dir) => {
      val p = load(s, dir, "part").select(col("p_partkey"))
      val l = load(s, dir, "lineitem").filter(col("l_quantity") > 49)
        .select(col("l_partkey"))
      p.join(l, p("p_partkey") === l("l_partkey"), "left_anti")
        .orderBy("p_partkey")
    }),

    // ---- §7 SQL surface: set operations — INTERSECT/EXCEPT with
    // set (distinct) semantics on both engines. Each leg is one
    // hash-partitioned distinct + join; tagged union for one output. ----
    "q_setops" -> ((s, dir) => {
      val o = load(s, dir, "orders")
      val f = o.filter(col("o_orderstatus") === "F").select("o_custkey")
      val open = o.filter(col("o_orderstatus") === "O").select("o_custkey")
      f.intersect(open).withColumn("tag", lit("both"))
        .unionByName(f.except(open).withColumn("tag", lit("f_only")))
        .orderBy("tag", "o_custkey")
    }),

    // ---- §6 sketches: HLL++ approximate distinct with an ENGINE-EXACT
    // gate — the oracle cannot replay Spark's HLL, so the pinned output
    // is the exact count plus a tolerance flag (|est − exact| ≤ 5%):
    // if the sketch ever drifts out of tolerance the flag flips and the
    // hash compare fails. At 100 TB the sketch replaces the exact
    // distinct's full shuffle with constant-size mergeable state. ----
    "q_approx_distinct" -> ((s, dir) => {
      load(s, dir, "documents")
        .groupBy("lang")
        .agg(countDistinct(col("doc_id")).as("n_exact"),
          approx_count_distinct(col("doc_id"), 0.02).as("__est"))
        .select(col("lang"), col("n_exact"),
          (abs(col("__est") - col("n_exact")) <=
            col("n_exact") * lit(0.05)).as("approx_ok"))
        .orderBy("lang")
    }),

    // ---- §7 composition: session-duration stats — the gap-session
    // operator feeding the HISTOGRAM percentile route in one chain
    // (operators compose; nothing is a dead end). Durations quantize to
    // integer ms (bounded distinct values), so p50/p90 ride
    // ops.Quantiles.exactQuantiles — no corpus-sized single-group sort
    // aggregate anywhere (PlanAuditSpec bans global `percentile` on the
    // declared surface) — and still pin bit-for-bit as integer
    // milli-ms. ----
    "q_session_stats" -> ((s, dir) => {
      val sessions = streaming.EventStream.sessionizeBatch(
          load(s, dir, "events"), gapUs = 3600L * 1000000)
        .select(expr("(session_end_us - session_start_us) DIV 1000")
          .as("dur_ms"), col("n_events"))
      val quants = ops.Quantiles.exactQuantiles(
          sessions, col("dur_ms"), Seq(500, 900))
        .agg(
          max(when(col("q_mille") === 500, col("value_milli")))
            .as("dur_p50_milli_ms"),
          max(when(col("q_mille") === 900, col("value_milli")))
            .as("dur_p90_milli_ms"))
      sessions
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events"),
          max(col("dur_ms")).as("dur_max_ms"))
        .crossJoin(broadcast(quants))
        .select(col("n_sessions"), col("dur_p50_milli_ms"),
          col("dur_p90_milli_ms"), col("n_events"), col("dur_max_ms"))
    }),

    // ---- §7 windowed distinct: exact unique users per hour — the
    // expand-shuffle exact path; the constant-state scale path is the
    // HLL gate (q_approx_distinct). ----
    "q_window_users" -> ((s, dir) => {
      val raw = load(s, dir, "events")
      raw.select(Tables.tsUs(raw).as("ts_us"), col("user_id"))
        .select(Tables.floorDiv("ts_us", 3600000000L).as("hour"), col("user_id"))
        .groupBy("hour")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("hour")
    }),

    // ---- §7 validation: table profiling (ANALYZE-TABLE shape) — per
    // column the null count, exact distinct count, and canonical
    // min/max, in ONE scan (ops/Profile.scala). Canonical = never a
    // float/timestamp rendered to text: doubles go out milli-quantized,
    // timestamps as epoch µs. ----
    "q_profile" -> ((s, dir) =>
      ops.Profile.report(load(s, dir, "orders")).orderBy("column")),

    // ---- §7 validation at 100 TB: the sketch-profiled twin — HLL++
    // distinct counts (no EXPAND row multiplication, constant mergeable
    // state) gated against the exact profile with the q_approx_distinct
    // tolerance discipline: the pinned output is the EXACT count plus a
    // within-5% flag, so sketch drift flips a boolean and fails the
    // hash compare. ----
    "q_profile_approx" -> ((s, dir) => {
      val o = load(s, dir, "orders")
      val exact = ops.Profile.report(o)
      val est = ops.Profile.report(o, approxRsd = Some(0.02))
        .select(col("column"), col("n_distinct").as("__est"))
      exact.join(est, Seq("column"))
        .select(col("column"), col("n_null"), col("n_distinct"),
          col("min_canon"), col("max_canon"),
          (abs(col("__est") - col("n_distinct")) <=
            col("n_distinct") * lit(0.05)).as("approx_ok"))
        .orderBy("column")
    }),

    // ---- §7 product analytics: cohort retention — users grouped by
    // first-seen day, counted again k days later (ops/Cohort.scala).
    // Distinct user-day activity first, so event-count skew dies at
    // step 1; no windows, no sorts, integer arithmetic only. ----
    "q_retention" -> ((s, dir) => {
      val raw = load(s, dir, "events")
      ops.Cohort.retention(raw, col("user_id"), Tables.tsUs(raw))
        .orderBy("cohort", "k")
    }),

    // ---- §7 calendar surface: per-month order stats + an integer
    // weekday histogram. Weekday comes from epoch-day arithmetic
    // ((day + 4) % 7, 0 = Sunday) — Spark's dayofweek() and DuckDB's
    // differ in origin convention, so the portable form is the pure
    // integer one. year()/month() agree as-is. ----
    "q_calendar" -> ((s, dir) => {
      val o = load(s, dir, "orders")
        .select(col("o_orderdate").cast("timestamp").as("ts"),
          col("o_totalprice").cast("decimal(18,2)").as("price"))
        .withColumn("epoch_day", Tables.floorDiv("unix_micros(ts)", 86400000000L))
      o.groupBy(year(col("ts")).as("y"), month(col("ts")).as("m"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("price")).cast("double").as("sum_price"),
          sum((expr("pmod(epoch_day + 4, 7)") === 0).cast("long")).as("n_sunday"),
          sum((expr("pmod(epoch_day + 4, 7)").isin(0, 6)).cast("long"))
            .as("n_weekend"))
        .orderBy("y", "m")
    }),

    // ---- §7 time-series downsampling: OHLC bars per (user, hour) —
    // open/close via algebraic min/max(struct) (no per-key sort or
    // window), values milli-quantized before aggregation so every
    // field is engine-exact. ----
    "q_ohlc" -> ((s, dir) =>
      streaming.EventStream.ohlcBars(load(s, dir, "events"))
        .orderBy("user_id", "bar")),

    // ---- §7 ETL refresh: incremental aggregate maintenance — a
    // materialized per-key state folded with a delta batch
    // (ops/IncrementalAgg.scala); cost scales with |delta| + |state|,
    // never the history. The oracle is the FULL recompute, so the
    // algebraic-merge identity is what the gate pins. ----
    "q_incr_agg" -> ((s, dir) => {
      val ev = load(s, dir, "events").select("user_id", "event_id")
      val base = ev.filter(col("event_id") % 4 =!= 0)
      val delta = ev.filter(col("event_id") % 4 === 0)
      val st = ops.IncrementalAgg.state(base, col("user_id"), col("event_id"))
      ops.IncrementalAgg.merge(st, delta, col("user_id"), col("event_id"))
        .orderBy("key")
    }),

    // ---- §7 iterative computation: integer PageRank over the
    // customer↔part interaction graph (ops/Graph.scala) — N short
    // join+aggregate jobs with lineage cuts, floor arithmetic only, so
    // the trajectory pins bit-for-bit against the oracle's unrolled
    // twin. The missing workload family: loops. ----
    "q_pagerank" -> ((s, dir) => {
      val o = load(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = load(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      // no .distinct() here: pageRankInt dedups after the bidirectional
      // union anyway — a pre-distinct would just add a second full
      // exchange over the edge list
      val edges = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("p"), col("l_partkey")).as("dst"))
      ops.Graph.pageRankInt(edges, iterations = 2).orderBy("node")
    }),

    // ---- §7 SQL surface: "above the group average" (the correlated-
    // subquery shape) decorrelated into one aggregate + key join, with
    // the comparison denominator-cleared into exact DECIMAL
    // (bal·n > Σbal) — no double average whose last ulp could flip a
    // boundary row between engines. ----
    "q_above_avg" -> ((s, dir) => {
      val c = load(s, dir, "customer")
        .select(col("c_nationkey"),
          col("c_acctbal").cast("decimal(18,2)").as("bal"))
      val stats = c.groupBy("c_nationkey")
        .agg(sum(col("bal")).as("s"), count(lit(1)).as("n_c"))
      c.join(stats, Seq("c_nationkey"))
        .filter(col("bal") * col("n_c") > col("s"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_above"))
        .orderBy("c_nationkey")
    }),

    // ---- §7 SQL surface: the window-function suite (lag/lead/ntile/
    // running count) over per-customer order sequences — bounded
    // per-key partitions, one exchange + one sort. ----
    "q_window_suite" -> ((s, dir) => {
      val o = load(s, dir, "orders").select("o_custkey", "o_orderkey")
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      o.select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).cast("long").as("rn"),
          lag("o_orderkey", 1).over(w).as("prev_key"),
          lead("o_orderkey", 1).over(w).as("next_key"),
          ntile(4).over(w).cast("long").as("quartile"),
          count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding, 0))
            .as("running_n"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ---- §7 SQL surface: exact grouped percentiles — Spark's
    // `percentile` interpolates identically to DuckDB's quantile_cont,
    // so the values pin bit-for-bit. This is the exact (per-group sort
    // aggregate) ANCHOR; the 100 TB shape for integer metrics is the
    // grouped histogram route, which lives on the same surface as
    // q_group_quantiles_hist (pinned equal by QuantilesSpec). ----
    "q_group_quantiles" -> ((s, dir) => {
      load(s, dir, "documents")
        .groupBy("lang")
        .agg(expr("percentile(n_chars, 0.5)").as("p50"),
          expr("percentile(n_chars, 0.9)").as("p90"),
          count(lit(1)).as("n"))
        .orderBy("lang")
    }),

    // ---- §7 the grouped HISTOGRAM quantile route — the 100 TB shape
    // q_group_quantiles' scaladoc points at, as code: per-(lang, value)
    // histogram, cumulative window per group over DISTINCT values, rank
    // targets equi-joined back. QuantilesSpec pins it equal to the
    // per-group `percentile` sort aggregate. ----
    "q_group_quantiles_hist" -> ((s, dir) =>
      ops.Quantiles.exactQuantilesBy(
          load(s, dir, "documents"), "lang", col("n_chars"), Seq(500, 900))
        .orderBy("lang", "q_mille")),

    // ---- §7 the histogram PERCENTILE-RANK annotator — "normalize each
    // doc's length to a corpus percentile" without percent_rank()'s
    // global row sort (one reducer holding every row). One map-side
    // histogram, a cumulative window over DISTINCT values only, an
    // equi-join back on the value; ranks are exact integers (rank_lt,
    // ppm via integer division) so any engine agrees bit-for-bit
    // (ops/Quantiles.percentileRanks). ----
    "q_pct_rank" -> ((s, dir) =>
      ops.Quantiles.percentileRanks(
          load(s, dir, "documents").select("doc_id", "n_chars")
            // the op passes null metrics through with null ranks; the
            // SQL twin drops them — pin the same (non-null) row set
            .filter(col("n_chars").isNotNull),
          col("n_chars"))
        .select("doc_id", "n_chars", "rank_lt", "n_rows", "pr_ppm")
        .orderBy("doc_id")),

    // ---- §7 path analysis: the event-type TRANSITION MATRIX (Markov
    // bigrams) — what users do next. One lead() window per user (the
    // per-key sort is bounded by per-user volume; a bot-heavy feed
    // caps users via Sampling.capPerGroup first — same discipline as
    // AsofJoin's key-granularity contract), then a map-side-combined
    // (from, to) count. ----
    "q_transitions" -> ((s, dir) => {
      val raw = load(s, dir, "events")
      val e = raw.select(col("user_id"), col("event_id"), col("event_type"),
        Tables.tsUs(raw).as("us"))
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      e.withColumn("__next", lead(col("event_type"), 1).over(w))
        .filter(col("__next").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("__next").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("from_type", "to_type")
    }),

    // ---- §7 classic 3-way join analytics (TPC-H Q3 shape): segment
    // customers ⨝ open orders ⨝ shipped lineitems, top-10 orders by
    // revenue. Revenue is per-row centi-quantized BEFORE the sum
    // (floor(ep·(1−disc)·100) — one fixed IEEE product, then exact
    // integer aggregation), so any engine ranks identically. The join
    // keys carry the shuffles; dates filter at the scan. ----
    "q_tpch3" -> ((s, dir) => {
      val cut = 883612800000000L // 1998-01-01 UTC, epoch µs
      val c = load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val oRaw = load(s, dir, "orders")
      val o = oRaw.select(col("o_orderkey"), col("o_custkey"),
          Tables.tsUs(oRaw, "o_orderdate").as("order_us"))
        .filter(col("order_us") < cut)
      val lRaw = load(s, dir, "lineitem")
      val l = lRaw.select(col("l_orderkey"),
          Tables.tsUs(lRaw, "l_shipdate").as("__ship_us"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * lit(100)).cast("long").as("__rev"))
        .filter(col("__ship_us") > cut)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "order_us")
        .agg(sum("__rev").as("revenue_centi"))
        .orderBy(col("revenue_centi").desc, col("l_orderkey"))
        .limit(10)
    }),

    // ---- §7 classic 6-way join analytics (TPC-H Q5 shape): revenue by
    // nation for one region, suppliers LOCAL to the customer's nation.
    // nation/region broadcast (constant-size dims); the fact joins
    // shuffle on their keys; same centi-quantized exact revenue. ----
    "q_tpch5" -> ((s, dir) => {
      val n = load(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val r = load(s, dir, "region").filter(col("r_name") === "ASIA")
        .select("r_regionkey")
      val localNations = broadcast(
        n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name"))
      val c = load(s, dir, "customer").select("c_custkey", "c_nationkey")
      val o = load(s, dir, "orders").select("o_orderkey", "o_custkey")
      val sup = load(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val l = load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * lit(100)).cast("long").as("__rev"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .join(localNations, col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum("__rev").as("revenue_centi"))
        .orderBy(col("revenue_centi").desc, col("n_name"))
    }),

    // ---- §7 frequent-itemset mining (a-priori first rungs): parts
    // co-ordered in the same order, support-pruned at the ITEM level
    // before any pair expansion — the per-basket self-join runs on
    // pruned baskets only, cost Σk² bounded by basket size, never
    // corpus² (ops/Itemsets.scala). ----
    "q_itemsets" -> ((s, dir) =>
      ops.Itemsets.frequentPairs(load(s, dir, "lineitem"),
          col("l_orderkey"), col("l_partkey"),
          minItemSupport = 10, minPairSupport = 2)
        .orderBy("item_a", "item_b")),

    // ---- §7 snapshot profile drift — the data-contract monitor: two
    // one-scan profiles joined column-wise (reports-sized metadata)
    // surfacing schema changes and null/distinct/bounds drift between
    // a table and its next drop (ops/Profile.drift). ----
    "q_profile_drift" -> ((s, dir) => {
      val n = load(s, dir, "nation")
      ops.Profile.drift(n, n.filter(col("n_nationkey") < 20))
        .orderBy("column")
    }),

    // ---- §7 sketch-as-data incremental distinct: one HLL sketch per
    // day (mergeable binary state — the thing a 100 TB pipeline
    // PERSISTS so "distinct users ever" costs |days| sketch rows, not
    // a history rescan), union-merged and gated against the exact
    // count with the q_profile_approx tolerance discipline: the pinned
    // output is exact integers + a within-5% flag, so sketch drift
    // flips a boolean and fails the hash compare. ----
    "q_hll_daily" -> ((s, dir) => {
      val raw = load(s, dir, "events")
      val e = raw.select(col("user_id"), Tables.tsUs(raw).as("us"))
        .select(col("user_id"), Tables.floorDiv("us", 86400000000L).as("day"))
      val daily = e.groupBy("day")
        .agg(expr("hll_sketch_agg(user_id)").as("__sk"))
      val merged = daily.agg(count(lit(1)).as("n_days"),
        expr("hll_sketch_estimate(hll_union_agg(__sk))").as("__est"))
      val exact = e.agg(countDistinct(col("user_id")).as("exact_users"))
      merged.crossJoin(broadcast(exact))
        .select(col("n_days"), col("exact_users"),
          (abs(col("__est") - col("exact_users")) * 100 <=
            col("exact_users") * 5).as("merged_within_5pct"))
    }),

    // ---- §7 exact triangle census over the co-order graph: edges
    // point from the lower-(degree, id) endpoint to the higher, so the
    // wedge self-join runs on O(√m)-wide oriented out-lists even on a
    // power-law graph — two equi-joins, no windows
    // (ops/Graph.triangleStats; edges = the a-priori frequent pairs). ----
    "q_triangles" -> ((s, dir) => {
      val edges = ops.Itemsets.frequentPairs(load(s, dir, "lineitem"),
        col("l_orderkey"), col("l_partkey"),
        minItemSupport = 10, minPairSupport = 2)
      ops.Graph.triangleStats(edges, col("item_a"), col("item_b"))
    }),

    // ---- §7 association rules over the frequent pairs: directed
    // confidences as exact integer ppm, lift through the fixed-IEEE-
    // tree discipline (integers → double → one multiply/divide/floor
    // chain — engine-exact, overflow-free at any corpus size). ----
    "q_assoc_rules" -> ((s, dir) =>
      ops.Itemsets.rules(load(s, dir, "lineitem"),
          col("l_orderkey"), col("l_partkey"),
          minItemSupport = 10, minPairSupport = 3)
        .orderBy("item_a", "item_b")),

    // ---- §7 correlation profiling: the exact Pearson matrix over
    // integer-quantized metrics (deci-value × hour × portable weekday),
    // ALL pairs in ONE map-side-combined scan; r_ppm derives from the
    // exact integer sums through a fixed IEEE tree, so even the floored
    // coefficient is engine-exact (ops/Profile.correlations; the
    // dataset-search sketch of ICDE'22 is the sub-scan approximation,
    // this is its exact anchor). ----
    "q_correlation" -> ((s, dir) => {
      val raw = load(s, dir, "events")
      val base = raw.select(col("value"), Tables.tsUs(raw).as("us"))
        .select(floor(col("value") * 10).as("vd"),
          expr(s"(${Tables.floorDivSql("us", 3600000000L)}) % 24").as("hr"),
          expr(s"((${Tables.floorDivSql("us", 86400000000L)}) + 4) % 7").as("wd"))
      ops.Profile.correlations(base, Seq(
          "value_deci" -> col("vd"), "hour" -> col("hr"),
          "weekday" -> col("wd")))
        .orderBy("x_name", "y_name")
    }),

    // ---- §7 record linkage / entity resolution: near-identical
    // customers via multi-pass blocking (nation + two different
    // name-digit windows — a typo missed by one window still collides
    // on the other) + edit-distance verify per CANDIDATE pair. Each
    // pass is one equi-self-join on its block key, hot blocks capped by
    // census — never an all-pairs comparison (ops/Linkage.scala). ----
    "q_linkage" -> ((s, dir) => {
      val c = load(s, dir, "customer")
      val passes = Seq(
        concat(col("c_nationkey").cast("string"), lit("|"),
          substring(col("c_name"), 16, 3)),
        concat(col("c_nationkey").cast("string"), lit("|"),
          substring(col("c_name"), 14, 3)))
      val cand = ops.Linkage.candidates(c, "c_custkey", passes, maxBlock = 1000)
      ops.Linkage.verifyEdit(c, cand, "c_custkey", col("c_name"), maxDist = 2)
        .orderBy("c_custkey", "id2")
    }),

    // ---- §7 the linkage blocking-pass census — the "no silent caps"
    // dial for q_linkage: per pass, how many blocks exist, the hottest
    // block, and how many rows an over-cap block would drop
    // (ops/Linkage.blockCensus; one groups-sized aggregate per pass). ----
    "q_linkage_census" -> ((s, dir) => {
      val c = load(s, dir, "customer")
      val passes = Seq(
        concat(col("c_nationkey").cast("string"), lit("|"),
          substring(col("c_name"), 16, 3)),
        concat(col("c_nationkey").cast("string"), lit("|"),
          substring(col("c_name"), 14, 3)))
      ops.Linkage.blockCensus(c, "c_custkey", passes, maxBlock = 100)
        .withColumn("pass", col("pass").cast("long"))
        .orderBy("pass")
    }),

    // ---- §7 multi-field linkage scoring (Fellegi–Sunter): the same
    // blocked candidate set as q_linkage, but verified across FOUR
    // field comparisons — name within edit 2, account-balance
    // thousand-bucket, market segment, nation — each contributing an
    // integer log-odds weight; pairs keep when the summed score clears
    // the threshold. Cost tracks candidates (two hash joins +
    // codegen'd banded edit distances), never corpus²
    // (ops/Linkage.scoreFields). ----
    "q_linkage_score" -> ((s, dir) => {
      val c = load(s, dir, "customer")
      val passes = Seq(
        concat(col("c_nationkey").cast("string"), lit("|"),
          substring(col("c_name"), 16, 3)),
        concat(col("c_nationkey").cast("string"), lit("|"),
          substring(col("c_name"), 14, 3)))
      val cand = ops.Linkage.candidates(c, "c_custkey", passes, maxBlock = 1000)
      ops.Linkage.scoreFields(c, cand, "c_custkey", Seq(
          ops.Linkage.FieldRule("name", col("c_name"), 2, 6, -2),
          ops.Linkage.FieldRule("bal",
            floor(col("c_acctbal") / 1000).cast("long").cast("string"), 0, 2, -1),
          ops.Linkage.FieldRule("seg", col("c_mktsegment"), 0, 1, -1),
          ops.Linkage.FieldRule("nat", col("c_nationkey").cast("string"), 0, 1, -3)),
        minScore = 6)
        .orderBy("c_custkey", "id2")
    }),

    // ---- §7 curriculum training order: bins ascend (length-curriculum
    // here — shorter docs first), pseudorandom within each bin; the
    // global permutation index comes from per-(bin, shard) row_number
    // windows plus a metadata-sized offset prefix-sum — never a global
    // sort (text/Sampling.curriculumManifest). ----
    "q_curriculum" -> ((s, dir) =>
      text.Sampling.curriculumManifest(
          load(s, dir, "documents"), "doc_id",
          expr("n_chars DIV 500"), salt = "cur1",
          shards = 8)
        .orderBy("doc_id")),

    // ---- §7 grouped percentile ranks — each doc's length percentile
    // WITHIN its language (per-language normalization before a
    // cross-language gate); identical histogram algebra partitioned by
    // the group (ops/Quantiles.percentileRanksBy). ----
    "q_pct_rank_by" -> ((s, dir) =>
      ops.Quantiles.percentileRanksBy(
          load(s, dir, "documents").select("doc_id", "lang", "n_chars")
            .filter(col("n_chars").isNotNull),
          "lang", col("n_chars"))
        .select("doc_id", "lang", "n_chars", "rank_lt", "n_group", "pr_ppm")
        .orderBy("doc_id")),

    // ---- §7 deterministic EXACT-n stratified sample: 5 docs per
    // language in md5(key#salt) order, forever stable — ranked through
    // the salted two-level top-k, never a raw per-stratum window
    // (text/Sampling.stratifiedExactN). ----
    "q_stratified" -> ((s, dir) =>
      text.Sampling.stratifiedExactN(
          load(s, dir, "documents").select("doc_id", "lang"),
          col("lang"), col("doc_id"), n = 5, salt = "st1")
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("lang", "rank")),

    // ---- §7 sampling: weight-proportional Bernoulli (importance
    // sampling by document length) — keep P = min(1, n_chars/wCap),
    // decided by integer md5 arithmetic (Sampling.sampleByWeight): a
    // narrow filter, no rand(), engine-exact membership. ----
    "q_weighted_sample" -> ((s, dir) => {
      val d = load(s, dir, "documents")
      text.Sampling.sampleByWeight(d, col("doc_id"), col("n_chars"),
          wCap = 2000L, salt = "ws1")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("chars_kept"))
        .orderBy("lang")
    }),

    // ---- §7 dedup verify: edit distance on candidate pairs — the
    // expensive exact metric runs ONLY on already-blocked pairs (the
    // planted near-dup copies), over a bounded 64-char suffix window
    // (levenshtein is O(n·m) per pair — never corpus × corpus, never
    // unbounded strings). ----
    "q_edit_distance" -> ((s, dir) => {
      val corpus = nearDupCorpus(load(s, dir, "documents"))
        .withColumn("sfx",
          expr("substr(text, greatest(length(text) - 63, 1), 64)"))
      val orig = corpus.filter(col("doc_id") < 100000L)
        .select(col("doc_id"), col("sfx").as("t_a"))
      val mut = corpus.filter(col("doc_id") >= 100000L)
        .select((col("doc_id") - 100000L).as("doc_id"), col("sfx").as("t_b"))
      orig.join(mut, Seq("doc_id"))
        .select(col("doc_id"),
          levenshtein(col("t_a"), col("t_b")).cast("long").as("dist"))
        .orderBy("doc_id")
    }),

    // ---- §7 validation: declarative data-quality report — N rules in
    // ONE conditional-aggregation scan (ops/Checks.scala); uniqueness
    // as exact count − count(DISTINCT), everything else as narrow
    // predicate counters. The pre-training gate over any table. ----
    "q_dq_checks" -> ((s, dir) => {
      val o = load(s, dir, "orders")
      ops.Checks.report(o, Seq(
        ops.Checks.uniqueRule("orderkey_unique", col("o_orderkey")),
        ops.Checks.rowRule("orderkey_not_null", col("o_orderkey").isNotNull),
        ops.Checks.rowRule("totalprice_positive", col("o_totalprice") > 0),
        ops.Checks.rowRule("status_domain",
          col("o_orderstatus").isin("F", "O", "P")),
        ops.Checks.rowRule("date_in_range",
          col("o_orderdate") >= lit("1992-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("2000-01-01").cast("timestamp"))))
        .orderBy("rule")
    }),

    // ---- §7 semi-structured surface: JSON property extraction over the
    // events `props` column — get_json_object is a codegen'd narrow
    // projection (no UDF, no parse-twice); aggregates run in exact
    // integer arithmetic. ----
    "q_json_extract" -> ((s, dir) => {
      load(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")
    }),

    // ---- §7 diagnostics: heavy-hitter census — the keys that would
    // melt a reducer, as data: per-key counts (map-side combined) +
    // the salted two-level global top-k, so even the census of a
    // pathological key distribution never funnels one reducer. ----
    "q_heavy_hitters" -> ((s, dir) => {
      val counts = load(s, dir, "events")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
      text.Retrieval.saltedTopK(counts, lit(1), col("user_id"),
          Seq(col("n").desc, col("user_id")), k = 10)
        .select(col("rank").cast("long").as("rank"), col("user_id"), col("n"))
        .orderBy("rank")
    }),

    // ---- §6 sketches: Count-Min frequency estimation with the
    // q_profile_approx gate discipline — the pinned rows are the exact
    // census top-k; the CMS estimate only surfaces as the contract
    // flag n ≤ est ≤ n + ⌊eps·N⌋ (fixed seed → deterministic) ----
    "q_cms_topk" -> ((s, dir) =>
      ops.Sketches.cmsHeavyHitters(load(s, dir, "events"), col("user_id"),
          k = 10, eps = 0.01, confidence = 0.99, seed = 42)
        .orderBy("rank")),

    // ---- §6 sketches: approximate percentiles with an ENGINE-EXACT
    // gate — exact `percentile` (interpolation-identical to DuckDB's
    // quantile_cont) is the pinned value; the KLL-style
    // approx_percentile estimate only surfaces as a tolerance flag, so
    // sketch drift beyond ±5% of the exact value flips the hash. At
    // 100 TB the sketch's constant-size mergeable state replaces the
    // exact path's per-group sort. ----
    "q_approx_quantile" -> ((s, dir) => {
      val qs = Seq(0.25, 0.5, 0.9, 0.99)
      val d = load(s, dir, "documents")
      val aggs = qs.flatMap { q =>
        val tag = (q * 100).toInt
        Seq(expr(s"percentile(n_chars, $q)").as(s"p$tag"),
          expr(s"approx_percentile(n_chars, $q, 10000)").as(s"__a$tag"))
      }
      val row = d.agg(aggs.head, aggs.tail: _*)
      val out = qs.map { q =>
        val tag = (q * 100).toInt
        (abs(col(s"__a$tag") - col(s"p$tag")) <=
          abs(col(s"p$tag")) * lit(0.05) + lit(1.0)).as(s"ok$tag")
      }
      row.select(qs.map(q => col(s"p${(q * 100).toInt}")) ++ out: _*)
    }),

    // ---- §7 SQL surface: pivot (wide conditional aggregation) — event
    // counts per day × type. The value list is PINNED, so no
    // distinct-collect pre-pass runs (at 100 TB an unpinned pivot's
    // domain scan is a full extra job); the plan is one hash aggregate
    // over day with 5 conditional counts. ----
    "q_pivot" -> ((s, dir) => {
      val raw = load(s, dir, "events")
      raw
        .select(Tables.tsUs(raw).as("ts_us"), col("event_type"))
        .select(Tables.floorDiv("ts_us", 86400000000L).as("day"), col("event_type"))
        .groupBy("day")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("click", "error", "purchase", "signup", "view"))
        .orderBy("day")
    })
  )

  /** Shared compare fixture: source = 4 columns of orders (persisted
    * eagerly — the scan feeds src AND both branches of the derived
    * target), target = source with deterministic drops (k%97), mutations
    * (k%101), and extras. Reproduced verbatim in the q_j1_* oracle SQL.
    * Callers release the returned source via [[materialized]]. */
  private def compareFixture(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val o = load(s, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
      .persist()
    o.count(): Unit
    val kept = o.filter(col("k") % 97 =!= 0)
    val tgt = kept
      .withColumn("o_totalprice",
        when(col("k") % 101 === 0, col("o_totalprice") + 1).otherwise(col("o_totalprice")))
      .unionByName(o.filter(col("k") % 97 === 0).withColumn("k", col("k") + 10000000L))
    (o, tgt)
  }

  /** Shared near-dup corpus: documents ∪ tail-mutated copies of every
    * 5th doc (id+100000) — deterministic, reproduced verbatim in the
    * oracle CTEs. */
  private def nearDupCorpus(d: DataFrame): DataFrame = {
    val base = d.select(col("doc_id"), col("text"))
    base.unionByName(
      base.filter(col("doc_id") % 5 === 0).select(
        (col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" near duplicate tail")).as("text")))
  }

  /** Shared multi-line fixture for the line-level operators: every
    * document gets a shared header + footer (cross-corpus boilerplate),
    * a unique intro line, a no-terminal-punct draft line, and its body
    * cut into lines at " the "/" table " separators; docs %9 add a full
    * duplicate page at +300000. Reproduced verbatim in the q_line_dedup
    * / q_c4_filter oracle CTEs ([[lineCorpusCte]]). */
  private def lineCorpus(d: DataFrame): DataFrame = {
    val built = d.filter(col("text").isNotNull).select(col("doc_id"),
      concat(
        lit("Shared corpus header boilerplate line.\n"),
        lit("Doc "), col("doc_id").cast("string"), lit(" unique intro line.\n"),
        regexp_replace(col("text"), " (the|table) ", ".\n"), lit(".\n"),
        lit("trailing draft line without terminal punct\n"),
        lit("Shared footer contact line.")).as("text"))
    built.unionByName(built.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + 300000L).as("doc_id"), col("text")))
  }

  /** Repetition-planted fixture for the n-gram char-share table: every
    * 6th doc gains a degenerate "buy now" loop (dominant 2-gram),
    * every 8th-mod-1 doc is doubled (every n-gram duplicated).
    * Mirrored verbatim in [[repNgramOracle]]. */
  private def repNgramCorpus(d: DataFrame): DataFrame =
    d.filter(col("text").isNotNull).select(col("doc_id"),
      when(col("doc_id") % 6 === 0,
          concat(col("text"), lit(" buy now buy now buy now buy now")))
        .when(col("doc_id") % 8 === 1, concat(col("text"), lit(" "), col("text")))
        .otherwise(col("text")).as("text"))

  /** Oracle twin of q_rep_ngrams: per n ∈ 2..10, explode the n-grams,
    * count per (doc, gram), then char masses — total, dup (count ≥ 2)
    * and the (count desc, gram asc)-first element's. Generated per n. */
  private lazy val repNgramOracle: String = {
    val ns = 2 to 10
    val frags = ns.map { n =>
      s"""g$n AS (
         |  SELECT doc_id, ${gramN(n)} AS gram
         |  FROM arr, LATERAL (SELECT unnest(generate_series(
         |    1, greatest(len(w) - ${n - 1}, 1))) AS i) u),
         |c$n AS (SELECT doc_id, gram, count(*) AS c
         |        FROM g$n WHERE gram IS NOT NULL GROUP BY 1, 2),
         |s$n AS (SELECT doc_id, sum(c * length(gram)) AS total_chars,
         |          sum(CASE WHEN c >= 2 THEN c * length(gram) ELSE 0 END)
         |            AS dup_chars
         |        FROM c$n GROUP BY 1),
         |t$n AS (SELECT doc_id, c * length(gram) AS top_chars FROM (
         |          SELECT doc_id, gram, c, row_number() OVER (
         |            PARTITION BY doc_id ORDER BY c DESC, gram) AS rn
         |          FROM c$n) WHERE rn = 1)""".stripMargin
    }
    val topCols = (2 to 4).map { n =>
      s"""  CAST(CASE WHEN coalesce(s$n.total_chars, 0) > 0
         |    THEN 1000 * t$n.top_chars // s$n.total_chars
         |    ELSE 0 END AS BIGINT) AS top_${n}gram_char_permille""".stripMargin
    }
    val dupCols = (5 to 10).map { n =>
      s"""  CAST(CASE WHEN coalesce(s$n.total_chars, 0) > 0
         |    THEN 1000 * s$n.dup_chars // s$n.total_chars
         |    ELSE 0 END AS BIGINT) AS dup_${n}gram_char_permille""".stripMargin
    }
    val joins = ns.map(n => s"LEFT JOIN s$n ON s$n.doc_id = arr.doc_id") ++
      (2 to 4).map(n => s"LEFT JOIN t$n ON t$n.doc_id = arr.doc_id")
    s"""WITH corpus AS (
       |  SELECT doc_id, CASE
       |    WHEN doc_id % 6 = 0 THEN text || ' buy now buy now buy now buy now'
       |    WHEN doc_id % 8 = 1 THEN text || ' ' || text
       |    ELSE text END AS text
       |  FROM documents WHERE text IS NOT NULL),
       |arr AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS w
       |  FROM corpus),
       |${frags.mkString(",\n")}
       |SELECT arr.doc_id, CAST(len(w) AS BIGINT) AS n_words,
       |${(topCols ++ dupCols).mkString(",\n")}
       |FROM arr
       |${joins.mkString("\n")}
       |ORDER BY arr.doc_id""".stripMargin
  }

  /** Paragraph-structured fixture for the within-doc repetition
    * operator: shared intro/footer paragraphs, body cut into paragraphs
    * at " table " and into lines at " the ", plus a duplicated
    * paragraph for every 4th doc and a twice-repeated line (inside ONE
    * paragraph) for every 5th — so line- and paragraph-level metrics
    * separate. Mirrored verbatim in the q_rep_lines oracle. */
  private def paraCorpus(d: DataFrame): DataFrame =
    d.filter(col("text").isNotNull).select(col("doc_id"),
      concat(
        lit("Shared intro paragraph.\n\n"),
        regexp_replace(regexp_replace(col("text"), " table ", ".\n\n"),
          " the ", ".\n"),
        lit("\n\nShared footer paragraph."),
        when(col("doc_id") % 4 === 0, lit("\n\nShared intro paragraph."))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit("\n\nRepeat line.\nRepeat line."))
          .otherwise(lit(""))).as("text"))

  /** Shared substring-dedup fixture: documents ∪ an interior 170-char
    * slice of every 7th long-enough doc behind a variable-length
    * "COPY:<id> " prefix (id+400000) — a shared region at a DIFFERENT
    * alignment in source and copy, the case substring dedup exists for.
    * Reproduced verbatim in [[substrCorpusCte]]. */
  private def substrCorpus(d: DataFrame): DataFrame = {
    val base = d.filter(col("text").isNotNull).select(col("doc_id"), col("text"))
    base.unionByName(
      base.filter(col("doc_id") % 7 === 0 && length(col("text")) >= 240)
        .select((col("doc_id") + 400000L).as("doc_id"),
          concat(lit("COPY:"), col("doc_id").cast("string"), lit(" "),
            expr("substring(text, 31, 170)")).as("text")))
  }

  /** Oracle twin of [[substrCorpus]] + the exact dup-span chain
    * (k = 40): all gram positions, the >1-occurrence census, and the
    * per-document cumulative-max span merge — mirrors
    * [[graft.text.Substrings.dupSpans]] stage for stage. */
  private val substrCorpusCte: String =
    """WITH base AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
      |corpus AS (
      |  SELECT doc_id, text FROM base
      |  UNION ALL
      |  SELECT doc_id + 400000,
      |    'COPY:' || CAST(doc_id AS VARCHAR) || ' ' || substring(text, 31, 170)
      |  FROM base WHERE doc_id % 7 = 0 AND length(text) >= 240),
      |g AS (
      |  SELECT doc_id, u.p AS p, md5(substring(text, u.p, 40)) AS h
      |  FROM corpus, LATERAL (SELECT unnest(generate_series(
      |    1, length(text) - 39)) AS p) u
      |  WHERE length(text) >= 40),
      |dup AS (
      |  SELECT doc_id, p, p + 39 AS e FROM g
      |  WHERE h IN (SELECT h FROM g GROUP BY h HAVING count(*) > 1)),
      |mrk AS (
      |  SELECT doc_id, p, e,
      |    CASE WHEN p > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY p
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
      |      THEN 1 ELSE 0 END AS brk
      |  FROM dup),
      |spans AS (
      |  SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
      |    CAST(max(e) AS BIGINT) AS span_end
      |  FROM (SELECT doc_id, p, e,
      |          sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS gid
      |        FROM mrk)
      |  GROUP BY doc_id, gid)
      |""".stripMargin

  /** Oracle twin of [[lineCorpus]] + the line split (0-based `pos`,
    * matching posexplode). */
  private val lineCorpusCte: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    'Shared corpus header boilerplate line.' || chr(10) ||
      |    'Doc ' || CAST(doc_id AS VARCHAR) || ' unique intro line.' || chr(10) ||
      |    regexp_replace(text, ' (the|table) ', '.' || chr(10), 'g') || '.' || chr(10) ||
      |    'trailing draft line without terminal punct' || chr(10) ||
      |    'Shared footer contact line.' AS text
      |  FROM documents WHERE text IS NOT NULL),
      |corpus AS (
      |  SELECT doc_id, text FROM base
      |  UNION ALL
      |  SELECT doc_id + 300000, text FROM base WHERE doc_id % 9 = 0),
      |ls AS (
      |  SELECT doc_id,
      |    unnest(string_split(text, chr(10))) AS line,
      |    unnest(generate_series(0, len(string_split(text, chr(10))) - 1)) AS pos
      |  FROM corpus)
      |""".stripMargin

  /** Oracle fragment: the minhash/LSH CTE chain shared by
    * q_dedup_minhash and q_ngram_jaccard (must mirror Dedup.scala). */
  /** Oracle: the two-sided (reference index + batch probe) minhash
    * chain of q_dedup_new_lsh (mirrors Dedup.lshNewCandidates). */
  /** The exact incremental-admission answer, shared by the direct run
    * (q_dedup_new), the Bloom-prefiltered run (q_dedup_new_bloom), and
    * the staged fingerprint probe (q_dedup_new_staged): all three are
    * physical strategies for the same semantics. */
  private val exactNewSql: String =
    """WITH reference AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
      |batch AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
      |  UNION ALL
      |  SELECT doc_id + 800000, text FROM documents WHERE doc_id % 6 = 0
      |  UNION ALL
      |  SELECT doc_id + 900000, text FROM documents
      |  WHERE doc_id % 2 = 1 AND doc_id % 7 = 0),
      |collapsed AS (
      |  SELECT doc_id, text FROM (
      |    SELECT doc_id, text,
      |      row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |    FROM batch) WHERE rn = 1)
      |SELECT c.doc_id FROM collapsed c
      |WHERE NOT EXISTS (SELECT 1 FROM reference r WHERE md5(r.text) = md5(c.text))
      |ORDER BY c.doc_id""".stripMargin

  private val lshNewCandidatesSql: String = {
    val coeffTable = text.Dedup.minhashCoeffs(16).zipWithIndex
      .map { case ((a, b), k) => s"($k,$a,$b)" }.mkString(",")
    s"""WITH reference AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
       |batch AS (
       |  SELECT doc_id + 500000 AS doc_id, text || ' near duplicate tail' AS text
       |  FROM reference WHERE doc_id % 10 = 0),
       |alld AS (
       |  SELECT 'r' AS side, doc_id, text FROM reference
       |  UNION ALL
       |  SELECT 'b', doc_id, text FROM batch),
       |words AS (SELECT side, doc_id,
       |  list_slice(str_split(lower(text), ' '), 1, 4096) AS w FROM alld),
       |sh AS (
       |  SELECT DISTINCT side, doc_id, w[u.i] || ' ' || w[u.i+1] || ' ' || w[u.i+2] AS s
       |  FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(w)-2, 1))) AS i) u
       |  WHERE w[u.i] || ' ' || w[u.i+1] || ' ' || w[u.i+2] IS NOT NULL),
       |hs AS (
       |  SELECT side, doc_id, CAST(('0x' || substr(md5(s),1,7)) AS BIGINT) AS h FROM sh),
       |mh AS (
       |  SELECT side, doc_id, k.k, min((k.a * h + k.b) % ${text.Dedup.MinHashP}) AS minh
       |  FROM hs, (VALUES $coeffTable) k(k,a,b) GROUP BY 1, 2, 3),
       |sig AS (
       |  SELECT side, doc_id, CAST(floor(k/2) AS INT) AS band,
       |         md5(string_agg(CAST(minh AS VARCHAR), '|' ORDER BY k)) AS bsig
       |  FROM mh GROUP BY 1, 2, 3),
       |ok AS (SELECT band, bsig FROM sig WHERE side = 'r'
       |       GROUP BY 1, 2 HAVING count(*) <= 1000)
       |SELECT DISTINCT b.doc_id AS batch_id, r.doc_id AS ref_id
       |FROM sig b
       |JOIN sig r ON r.side = 'r' AND b.side = 'b'
       |  AND b.band = r.band AND b.bsig = r.bsig
       |JOIN ok ON ok.band = r.band AND ok.bsig = r.bsig
       |ORDER BY batch_id, ref_id""".stripMargin
  }

  /** Oracle: the streaming near-dup admission gate (q_st_lsh) — both
    * waves' LSH admission recomputed from arrival order: wave 1 probes
    * the reference band surface; wave 2 probes reference + wave-1
    * ADMITTED signatures (the engine appends each wave's winners into
    * the index, so the oracle's wave-2 surface — and its maxBucket
    * census — must include them). Same minhash chain as
    * [[lshNewCandidatesSql]]. */
  private val admitNearSql: String = {
    val coeffTable = text.Dedup.minhashCoeffs(16).zipWithIndex
      .map { case ((a, b), k) => s"($k,$a,$b)" }.mkString(",")
    s"""WITH d AS (SELECT doc_id, text, lang FROM documents
       |           WHERE text IS NOT NULL),
       |ref AS (SELECT doc_id, text FROM d WHERE doc_id % 2 = 0),
       |w1 AS (SELECT doc_id, text, lang FROM d WHERE doc_id % 4 = 1),
       |w2 AS (
       |  SELECT doc_id, text, lang FROM d WHERE doc_id % 4 = 3
       |  UNION ALL
       |  SELECT doc_id + 1000000, text || ' near duplicate tail', lang
       |  FROM w1 WHERE doc_id % 5 = 1
       |  UNION ALL
       |  SELECT doc_id + 800000, text || ' near duplicate tail', lang
       |  FROM d WHERE doc_id % 6 = 0),
       |alld AS (
       |  SELECT 'r' AS side, doc_id, text FROM ref
       |  UNION ALL
       |  SELECT '1', doc_id, text FROM w1
       |  UNION ALL
       |  SELECT '2', doc_id, text FROM w2),
       |words AS (SELECT side, doc_id,
       |  list_slice(str_split(lower(text), ' '), 1, 4096) AS w FROM alld),
       |sh AS (
       |  SELECT DISTINCT side, doc_id, w[u.i] || ' ' || w[u.i+1] || ' ' || w[u.i+2] AS s
       |  FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(w)-2, 1))) AS i) u
       |  WHERE w[u.i] || ' ' || w[u.i+1] || ' ' || w[u.i+2] IS NOT NULL),
       |hs AS (
       |  SELECT side, doc_id, CAST(('0x' || substr(md5(s),1,7)) AS BIGINT) AS h FROM sh),
       |mh AS (
       |  SELECT side, doc_id, k.k, min((k.a * h + k.b) % ${text.Dedup.MinHashP}) AS minh
       |  FROM hs, (VALUES $coeffTable) k(k,a,b) GROUP BY 1, 2, 3),
       |sig AS (
       |  SELECT side, doc_id, CAST(floor(k/2) AS INT) AS band,
       |         md5(string_agg(CAST(minh AS VARCHAR), '|' ORDER BY k)) AS bsig
       |  FROM mh GROUP BY 1, 2, 3),
       |ok1 AS (SELECT band, bsig FROM sig WHERE side = 'r'
       |        GROUP BY 1, 2 HAVING count(*) <= 1000),
       |rej1 AS (
       |  SELECT DISTINCT b.doc_id FROM sig b
       |  JOIN sig r ON r.side = 'r' AND b.side = '1'
       |    AND b.band = r.band AND b.bsig = r.bsig
       |  JOIN ok1 ON ok1.band = r.band AND ok1.bsig = r.bsig),
       |adm1 AS (SELECT doc_id, lang FROM w1
       |         WHERE doc_id NOT IN (SELECT doc_id FROM rej1)),
       |isig AS (
       |  SELECT band, bsig FROM sig WHERE side = 'r'
       |  UNION ALL
       |  SELECT band, bsig FROM sig
       |  WHERE side = '1' AND doc_id IN (SELECT doc_id FROM adm1)),
       |ok2 AS (SELECT band, bsig FROM isig
       |        GROUP BY 1, 2 HAVING count(*) <= 1000),
       |rej2 AS (
       |  SELECT DISTINCT b.doc_id FROM sig b
       |  JOIN isig r ON b.side = '2'
       |    AND b.band = r.band AND b.bsig = r.bsig
       |  JOIN ok2 ON ok2.band = r.band AND ok2.bsig = r.bsig),
       |adm2 AS (SELECT doc_id, lang FROM w2
       |         WHERE doc_id NOT IN (SELECT doc_id FROM rej2))
       |SELECT doc_id, lang FROM adm1
       |UNION ALL
       |SELECT doc_id, lang FROM adm2
       |ORDER BY doc_id""".stripMargin
  }

  /** The 10-word tail q_st_lsh_verified appends to its near-copies:
    * 10 new trigram shingles, so a copy of an n-word doc verifies at
    * jaccard (n−2)/(n+8) — below the 0.8 threshold for docs under ~42
    * words (admitted: collision-only near-miss) and above it for
    * longer docs (still rejected). Shared by the query fixture and
    * the oracle SQL so the two can never drift. */
  private val VerifiedTail =
    " zebra quill vortex amber nimbus cedar onyx prism tundra willow"

  /** Oracle: the JACCARD-VERIFIED streaming near-dup gate
    * (q_st_lsh_verified) — [[admitNearSql]]'s chain (same minhash /
    * band / maxBucket census, same two-wave surface) extended with the
    * verify stage: a candidate pair only rejects when the exact
    * word-trigram Jaccard of the two texts (distinct shingle sets,
    * |A∩B| / (|A|+|B|−|A∩B|)) is ≥ 0.8 — recomputed per (batch doc,
    * matched doc) pair, wave 2 against reference ∪ wave-1 winners. */
  private val admitNearVerifiedSql: String = {
    val coeffTable = text.Dedup.minhashCoeffs(16).zipWithIndex
      .map { case ((a, b), k) => s"($k,$a,$b)" }.mkString(",")
    s"""WITH d AS (SELECT doc_id, text, lang FROM documents
       |           WHERE text IS NOT NULL),
       |ref AS (SELECT doc_id, text FROM d WHERE doc_id % 2 = 0),
       |w1 AS (SELECT doc_id, text, lang FROM d WHERE doc_id % 4 = 1),
       |w2 AS (
       |  SELECT doc_id, text, lang FROM d WHERE doc_id % 4 = 3
       |  UNION ALL
       |  SELECT doc_id + 1000000, text || '$VerifiedTail', lang
       |  FROM w1 WHERE doc_id % 5 = 1
       |  UNION ALL
       |  SELECT doc_id + 800000, text || '$VerifiedTail', lang
       |  FROM d WHERE doc_id % 6 = 0),
       |alld AS (
       |  SELECT 'r' AS side, doc_id, text FROM ref
       |  UNION ALL
       |  SELECT '1', doc_id, text FROM w1
       |  UNION ALL
       |  SELECT '2', doc_id, text FROM w2),
       |words AS (SELECT side, doc_id,
       |  list_slice(str_split(lower(text), ' '), 1, 4096) AS w FROM alld),
       |sh AS (
       |  SELECT DISTINCT side, doc_id, w[u.i] || ' ' || w[u.i+1] || ' ' || w[u.i+2] AS s
       |  FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(w)-2, 1))) AS i) u
       |  WHERE w[u.i] || ' ' || w[u.i+1] || ' ' || w[u.i+2] IS NOT NULL),
       |sz AS (SELECT side, doc_id, count(*) AS n FROM sh GROUP BY 1, 2),
       |hs AS (
       |  SELECT side, doc_id, CAST(('0x' || substr(md5(s),1,7)) AS BIGINT) AS h FROM sh),
       |mh AS (
       |  SELECT side, doc_id, k.k, min((k.a * h + k.b) % ${text.Dedup.MinHashP}) AS minh
       |  FROM hs, (VALUES $coeffTable) k(k,a,b) GROUP BY 1, 2, 3),
       |sig AS (
       |  SELECT side, doc_id, CAST(floor(k/2) AS INT) AS band,
       |         md5(string_agg(CAST(minh AS VARCHAR), '|' ORDER BY k)) AS bsig
       |  FROM mh GROUP BY 1, 2, 3),
       |ok1 AS (SELECT band, bsig FROM sig WHERE side = 'r'
       |        GROUP BY 1, 2 HAVING count(*) <= 1000),
       |cp1 AS (
       |  SELECT DISTINCT b.doc_id AS bid, r.doc_id AS rid
       |  FROM sig b
       |  JOIN sig r ON r.side = 'r' AND b.side = '1'
       |    AND b.band = r.band AND b.bsig = r.bsig
       |  JOIN ok1 ON ok1.band = r.band AND ok1.bsig = r.bsig),
       |ji1 AS (
       |  SELECT c.bid, c.rid, count(*) AS n_inter
       |  FROM cp1 c
       |  JOIN sh a ON a.side = '1' AND a.doc_id = c.bid
       |  JOIN sh r ON r.side = 'r' AND r.doc_id = c.rid AND r.s = a.s
       |  GROUP BY 1, 2),
       |rej1 AS (
       |  SELECT DISTINCT c.bid AS doc_id
       |  FROM cp1 c
       |  JOIN sz a ON a.side = '1' AND a.doc_id = c.bid
       |  JOIN sz r ON r.side = 'r' AND r.doc_id = c.rid
       |  LEFT JOIN ji1 j ON j.bid = c.bid AND j.rid = c.rid
       |  WHERE CAST(coalesce(j.n_inter, 0) AS DOUBLE)
       |        / (a.n + r.n - coalesce(j.n_inter, 0)) >= 0.8),
       |adm1 AS (SELECT doc_id, lang FROM w1
       |         WHERE doc_id NOT IN (SELECT doc_id FROM rej1)),
       |isig AS (
       |  SELECT side, doc_id, band, bsig FROM sig WHERE side = 'r'
       |  UNION ALL
       |  SELECT side, doc_id, band, bsig FROM sig
       |  WHERE side = '1' AND doc_id IN (SELECT doc_id FROM adm1)),
       |ok2 AS (SELECT band, bsig FROM isig
       |        GROUP BY 1, 2 HAVING count(*) <= 1000),
       |cp2 AS (
       |  SELECT DISTINCT b.doc_id AS bid, r.side AS rside, r.doc_id AS rid
       |  FROM sig b
       |  JOIN isig r ON b.side = '2'
       |    AND b.band = r.band AND b.bsig = r.bsig
       |  JOIN ok2 ON ok2.band = r.band AND ok2.bsig = r.bsig),
       |ji2 AS (
       |  SELECT c.bid, c.rside, c.rid, count(*) AS n_inter
       |  FROM cp2 c
       |  JOIN sh a ON a.side = '2' AND a.doc_id = c.bid
       |  JOIN sh r ON r.side = c.rside AND r.doc_id = c.rid AND r.s = a.s
       |  GROUP BY 1, 2, 3),
       |rej2 AS (
       |  SELECT DISTINCT c.bid AS doc_id
       |  FROM cp2 c
       |  JOIN sz a ON a.side = '2' AND a.doc_id = c.bid
       |  JOIN sz r ON r.side = c.rside AND r.doc_id = c.rid
       |  LEFT JOIN ji2 j ON j.bid = c.bid AND j.rside = c.rside AND j.rid = c.rid
       |  WHERE CAST(coalesce(j.n_inter, 0) AS DOUBLE)
       |        / (a.n + r.n - coalesce(j.n_inter, 0)) >= 0.8),
       |adm2 AS (SELECT doc_id, lang FROM w2
       |         WHERE doc_id NOT IN (SELECT doc_id FROM rej2))
       |SELECT doc_id, lang FROM adm1
       |UNION ALL
       |SELECT doc_id, lang FROM adm2
       |ORDER BY doc_id""".stripMargin
  }

  /** Oracle: the streaming semantic admission gate (q_st_vec) — both
    * waves' IVF-flat admission recomputed from arrival order in exact
    * integer arithmetic (quantize → floor(x·1000); centroids = first 8
    * staged vectors by id; assign = argmax dot, ties lower index;
    * probe = top-2 by the same order; reject iff a surface vector in a
    * probed list passes the cos ≥ 0.9 integer test: dot > 0 ∧
    * 10⁶·dot² ≥ 81·10⁴·n2_q·n2_r in HUGEINT). Wave 2's surface — like
    * [[admitNearSql]]'s — is staged ∪ wave-1 winners, lists assigned
    * under the frozen centroids. The ref CTE mirrors the engine's
    * `vecAdmissible` (quantized norm > 0, not just non-null): the
    * staged surface AND the centroid draw both exclude zero-quantized
    * vectors, so a fixture vector with every component in [0, 0.001)
    * must not diverge oracle from engine. */
  private val admitVecSql: String =
    """WITH e AS (SELECT vec_id, embedding, label FROM embeddings
      |           WHERE embedding IS NOT NULL AND vec_id < 1000),
      |ref AS (SELECT vec_id, embedding FROM e WHERE vec_id % 2 = 0
      |        AND (SELECT sum(u * u) FROM (SELECT unnest(
      |              list_transform(embedding, x ->
      |                CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))) AS u))
      |            > 0),
      |w1 AS (SELECT vec_id, embedding, label FROM e WHERE vec_id % 4 = 1),
      |w2 AS (
      |  SELECT vec_id, embedding, label FROM e WHERE vec_id % 4 = 3
      |  UNION ALL
      |  SELECT vec_id + 10000, embedding, label FROM w1 WHERE vec_id % 5 = 1
      |  UNION ALL
      |  SELECT vec_id + 20000, embedding, label FROM e WHERE vec_id % 6 = 0),
      |allv AS (
      |  SELECT 'r' AS side, vec_id, embedding FROM ref
      |  UNION ALL SELECT '1', vec_id, embedding FROM w1
      |  UNION ALL SELECT '2', vec_id, embedding FROM w2),
      |qv AS (SELECT side, vec_id,
      |         list_transform(embedding,
      |           x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
      |       FROM allv),
      |n2 AS (SELECT side, vec_id, q,
      |         (SELECT CAST(sum(u * u) AS BIGINT)
      |          FROM (SELECT unnest(q) AS u)) AS n2
      |       FROM qv),
      |cent AS (SELECT row_number() OVER (ORDER BY vec_id) AS cidx,
      |           list_transform(embedding,
      |             x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS cq
      |         FROM (SELECT * FROM ref ORDER BY vec_id LIMIT 8) t),
      |cd AS (SELECT v.side, v.vec_id, c.cidx,
      |         (SELECT CAST(sum(x.u1 * x.u2) AS BIGINT)
      |          FROM (SELECT unnest(v.q) AS u1, unnest(c.cq) AS u2) x) AS dot
      |       FROM qv v, cent c),
      |asgn AS (SELECT side, vec_id, cidx AS list FROM (
      |          SELECT side, vec_id, cidx,
      |            row_number() OVER (PARTITION BY side, vec_id
      |                 ORDER BY dot DESC, cidx) AS rn
      |          FROM cd) t WHERE rn = 1),
      |probe AS (SELECT side, vec_id, cidx AS list FROM (
      |          SELECT side, vec_id, cidx,
      |            row_number() OVER (PARTITION BY side, vec_id
      |                 ORDER BY dot DESC, cidx) AS rn
      |          FROM cd) t WHERE rn <= 2),
      |pairs1 AS (
      |  SELECT b.vec_id AS qid, b.n2 AS bn2, r.n2 AS rn2,
      |    (SELECT CAST(sum(x.u1 * x.u2) AS BIGINT)
      |     FROM (SELECT unnest(b.q) AS u1, unnest(r.q) AS u2) x) AS dot
      |  FROM probe p
      |  JOIN asgn a ON a.side = 'r' AND a.list = p.list
      |  JOIN n2 b ON b.side = '1' AND b.vec_id = p.vec_id
      |  JOIN n2 r ON r.side = 'r' AND r.vec_id = a.vec_id
      |  WHERE p.side = '1'),
      |rej1 AS (SELECT DISTINCT qid AS vec_id FROM pairs1
      |  WHERE dot > 0 AND 1000000 * CAST(dot AS HUGEINT) * dot
      |          >= 810000 * CAST(bn2 AS HUGEINT) * rn2),
      |adm1 AS (SELECT vec_id, label FROM w1
      |         WHERE vec_id NOT IN (SELECT vec_id FROM rej1)
      |           AND vec_id IN (SELECT vec_id FROM n2
      |                          WHERE side = '1' AND n2 > 0)),
      |isurf AS (
      |  SELECT a.vec_id, a.list, v.q, v.n2
      |  FROM asgn a JOIN n2 v ON v.side = a.side AND v.vec_id = a.vec_id
      |  WHERE a.side = 'r'
      |     OR (a.side = '1' AND a.vec_id IN (SELECT vec_id FROM adm1))),
      |pairs2 AS (
      |  SELECT b.vec_id AS qid, b.n2 AS bn2, i.n2 AS rn2,
      |    (SELECT CAST(sum(x.u1 * x.u2) AS BIGINT)
      |     FROM (SELECT unnest(b.q) AS u1, unnest(i.q) AS u2) x) AS dot
      |  FROM probe p
      |  JOIN isurf i ON i.list = p.list
      |  JOIN n2 b ON b.side = '2' AND b.vec_id = p.vec_id
      |  WHERE p.side = '2'),
      |rej2 AS (SELECT DISTINCT qid AS vec_id FROM pairs2
      |  WHERE dot > 0 AND 1000000 * CAST(dot AS HUGEINT) * dot
      |          >= 810000 * CAST(bn2 AS HUGEINT) * rn2),
      |adm2 AS (SELECT vec_id, label FROM w2
      |         WHERE vec_id NOT IN (SELECT vec_id FROM rej2)
      |           AND vec_id IN (SELECT vec_id FROM n2
      |                          WHERE side = '2' AND n2 > 0))
      |SELECT vec_id, label FROM adm1
      |UNION ALL
      |SELECT vec_id, label FROM adm2
      |ORDER BY vec_id""".stripMargin

  private val minhashCtes: String = {
    // the permutation table, embedded literally from the SAME constants
    // the engine uses (Dedup.minhashCoeffs)
    val coeffTable = text.Dedup.minhashCoeffs(16).zipWithIndex
      .map { case ((a, b), k) => s"($k,$a,$b)" }.mkString(",")
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100000, text || ' near duplicate tail'
       |  FROM documents WHERE doc_id % 5 = 0),
       |words AS (SELECT doc_id,
       |  list_slice(str_split(lower(text), ' '), 1, 4096) AS w FROM corpus),
       |sh AS (
       |  SELECT DISTINCT doc_id, w[u.i] || ' ' || w[u.i+1] || ' ' || w[u.i+2] AS s
       |  FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(w)-2, 1))) AS i) u
       |  WHERE w[u.i] || ' ' || w[u.i+1] || ' ' || w[u.i+2] IS NOT NULL),
       |hs AS (
       |  SELECT doc_id, CAST(('0x' || substr(md5(s),1,7)) AS BIGINT) AS h FROM sh),
       |mh AS (
       |  SELECT doc_id, k.k, min((k.a * h + k.b) % ${text.Dedup.MinHashP}) AS minh
       |  FROM hs, (VALUES $coeffTable) k(k,a,b) GROUP BY 1, 2),
       |sig AS (
       |  SELECT doc_id, CAST(floor(k/2) AS INT) AS band,
       |         md5(string_agg(CAST(minh AS VARCHAR), '|' ORDER BY k)) AS bsig
       |  FROM mh GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM sig a
       |  JOIN (SELECT band, bsig FROM sig GROUP BY 1, 2 HAVING count(*) <= 1000) ok
       |    ON ok.band = a.band AND ok.bsig = a.bsig
       |  JOIN sig b ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id)
       |""".stripMargin
  }

  /** Oracle fragment: the exact-Jaccard verify chain over `cand`/`sh`
    * (mirrors Dedup.jaccardVerify) — appended after [[minhashCtes]]. */
  private val jaccardCtes: String =
    """, sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |inter AS (
      |  SELECT c.id_a, c.id_b, count(*) AS n_inter
      |  FROM cand c
      |  JOIN sh sa ON sa.doc_id = c.id_a
      |  JOIN sh sb ON sb.doc_id = c.id_b AND sb.s = sa.s
      |  GROUP BY 1, 2),
      |jac AS (
      |  SELECT c.id_a, c.id_b,
      |    coalesce(i.n_inter, 0) AS n_inter,
      |    sa.n + sb.n - coalesce(i.n_inter, 0) AS n_union,
      |    CAST(coalesce(i.n_inter, 0) AS DOUBLE)
      |      / (sa.n + sb.n - coalesce(i.n_inter, 0)) AS jaccard
      |  FROM cand c
      |  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
      |  JOIN sizes sa ON sa.doc_id = c.id_a
      |  JOIN sizes sb ON sb.doc_id = c.id_b)
      |""".stripMargin

  /** Oracle fragment: quantized integer dot product of two embedding
    * lists (mirrors Similarity.quantizedDot). */
  private def dotQ(a: String, b: String): String =
    s"""(SELECT CAST(sum(CAST(floor(CAST(x.u1 AS DOUBLE)*1000) AS BIGINT) *
       |                 CAST(floor(CAST(x.u2 AS DOUBLE)*1000) AS BIGINT)) AS BIGINT)
       | FROM (SELECT unnest($a) AS u1, unnest($b) AS u2) x)""".stripMargin

  /** Oracle fragment: an n-word-gram over the capped word array `w` at
    * 1-based index `u.i` (mirrors Shingles.wordNGramsOf(w, n)). */
  private def gramN(n: Int): String =
    (0 until n).map(o => if (o == 0) "w[u.i]" else s"w[u.i+$o]")
      .mkString(" || ' ' || ")
  private val gram13: String = gramN(13)

  /** The no-split packed manifest pipeline shared by q_pack_nosplit and
    * q_pack_eval: token counts → deterministic split/shard → per-shard
    * next-fit fold. */
  private def packNoSplitDf(s: SparkSession, dir: String): DataFrame = {
    val d = text.TextFunctions.qualityStats(
        load(s, dir, "documents").filter(col("text").isNotNull), col("text"))
      .select(col("doc_id"), col("n_tokens"))
    val sp = text.Sampling.hashSplit(d, col("doc_id"), "42",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .withColumn("shard", concat(col("split"), lit(":"),
        (col("bucket") % 8).cast("string")))
    text.Packing.packNoSplit(sp, "doc_id", col("n_tokens"),
      col("shard"), PackCapacity)
  }

  /** Next-fit unrolled as a recursive CTE stepping one doc per shard at
    * a time — mirrors `Packing.packNoSplit`'s fold exactly (reset only
    * when the sequence already holds something). Shared by
    * q_pack_nosplit (the manifest) and q_pack_eval (the padding
    * harness). */
  private lazy val packNoSplitCte: String =
    """WITH RECURSIVE d AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8)) AS BIGINT)
      |      % 10000 AS bucket
      |  FROM documents WHERE text IS NOT NULL),
      |docs AS (
      |  SELECT (CASE WHEN bucket < 8000 THEN 'train'
      |               WHEN bucket < 9000 THEN 'val' ELSE 'test' END)
      |           || ':' || CAST(bucket % 8 AS VARCHAR) AS shard,
      |    doc_id, n_tokens,
      |    row_number() OVER (PARTITION BY (CASE WHEN bucket < 8000 THEN 'train'
      |      WHEN bucket < 9000 THEN 'val' ELSE 'test' END)
      |      || ':' || CAST(bucket % 8 AS VARCHAR) ORDER BY doc_id) AS rn
      |  FROM d),
      |step AS (
      |  SELECT shard, rn, doc_id, n_tokens,
      |    CAST(0 AS BIGINT) AS seq_idx, CAST(0 AS BIGINT) AS seq_offset,
      |    n_tokens AS fill
      |  FROM docs WHERE rn = 1
      |  UNION ALL
      |  SELECT nx.shard, nx.rn, nx.doc_id, nx.n_tokens,
      |    CASE WHEN s.fill > 0 AND s.fill + nx.n_tokens > __CAP__
      |      THEN s.seq_idx + 1 ELSE s.seq_idx END,
      |    CASE WHEN s.fill > 0 AND s.fill + nx.n_tokens > __CAP__
      |      THEN CAST(0 AS BIGINT) ELSE s.fill END,
      |    CASE WHEN s.fill > 0 AND s.fill + nx.n_tokens > __CAP__
      |      THEN nx.n_tokens ELSE s.fill + nx.n_tokens END
      |  FROM step s JOIN docs nx ON nx.shard = s.shard AND nx.rn = s.rn + 1)
      |""".stripMargin.replace("__CAP__", PackCapacity.toString)

  /** Oracle twin of [[graft.text.Bpe]]: the k-round merge-learning
    * loop unrolled as CTE stages — per stage i: `x` (lead pairs), `b`
    * (argmax pair, ties lexicographic), `g/h/j/e` (run-parity greedy
    * merge marks), `s` (renumbered symbol table). Shared prefix of
    * q_bpe_merges and q_bpe_fertility. */
  private def bpeXSql(i: Int, p: String): String =
    s"""${p}x$i AS (SELECT word, freq, pos, sym,
       |  lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM $p${i - 1})""".stripMargin

  /** Apply the already-defined winning pair `b_i` to `<p>{i-1}` →
    * `<p>{i}` (run-parity greedy merge). Training uses p = "s"; the
    * encode replay reuses the SAME b_i CTEs over p = "t". */
  private def bpeRestSql(i: Int, p: String): String =
    s"""${p}g$i AS (SELECT x.*, (x.sym = b.l AND x.nxt = b.r) AS m
       |  FROM ${p}x$i x CROSS JOIN b$i b),
       |${p}h$i AS (SELECT *, CASE WHEN m THEN pos - sum(CASE WHEN m THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY word ORDER BY pos) END AS grp FROM ${p}g$i),
       |${p}j$i AS (SELECT *, CASE WHEN m THEN row_number()
       |    OVER (PARTITION BY word, grp ORDER BY pos) END AS idx FROM ${p}h$i),
       |${p}e$i AS (SELECT *, (m AND idx % 2 = 1) AS merged,
       |  coalesce(lag(m AND idx % 2 = 1) OVER (PARTITION BY word ORDER BY pos),
       |    FALSE) AS consumed FROM ${p}j$i),
       |$p$i AS (SELECT word, freq,
       |  row_number() OVER (PARTITION BY word ORDER BY pos) - 1 AS pos,
       |  CASE WHEN merged THEN sym || nxt ELSE sym END AS sym
       |  FROM ${p}e$i WHERE NOT consumed)""".stripMargin

  private lazy val bpeStagesSql: String = {
    val stages = (1 to BpeK).map { i =>
      bpeXSql(i, "s") + ",\n" +
        s"""b$i AS (SELECT sym AS l, nxt AS r, sum(freq) AS cnt FROM sx$i
           |  WHERE nxt IS NOT NULL GROUP BY 1, 2 ORDER BY cnt DESC, l, r LIMIT 1),
           |""".stripMargin +
        bpeRestSql(i, "s")
    }.mkString(",\n")
    s"""WITH toks AS (
       |  SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS word
       |  FROM documents WHERE text IS NOT NULL),
       |wf AS (SELECT word, count(*) AS freq FROM toks GROUP BY 1),
       |words AS (SELECT word, freq FROM (
       |  SELECT word, freq, row_number() OVER (ORDER BY freq DESC, word) AS rk
       |  FROM wf) WHERE rk <= $BpeMaxWords),
       |s0 AS (SELECT word, freq, i - 1 AS pos, substr(word, i, 1) AS sym
       |  FROM words, LATERAL (SELECT unnest(generate_series(1, len(word))) AS i) u),
       |$stages""".stripMargin
  }

  /** Shared by q_bm25 and q_bm25_staged — the materialized inverted
    * index must return row-identical results to the direct pipeline. */
  private lazy val bm25Oracle: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS term
      |  FROM documents WHERE text IS NOT NULL),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      |qs AS (SELECT CAST(query_id AS BIGINT) AS query_id, qtext
      |       FROM (VALUES (1, 'key table scan'),
      |        (2, 'fast merge batch window'), (3, 'customer order part'))
      |       v(query_id, qtext)),
      |qterms AS (
      |  SELECT DISTINCT query_id, unnest(regexp_extract_all(lower(qtext), '\S+')) AS term
      |  FROM qs),
      |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
      |stats AS (SELECT count(*) AS n,
      |            CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
      |dfreq AS (
      |  SELECT term, count(*) AS df FROM tf
      |  WHERE term IN (SELECT term FROM qterms) GROUP BY 1),
      |scored AS (
      |  SELECT q.query_id, t.doc_id,
      |    CAST(floor(
      |      CAST(floor(1000.0 * ln((CAST(s.n AS DOUBLE) - f.df + 0.5) / (f.df + 0.5) + 1.0)) AS BIGINT)
      |        * t.tf * 2.2 / (t.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl)) * 1000.0
      |    ) AS BIGINT) AS s_micro
      |  FROM tf t
      |  JOIN qterms q ON q.term = t.term
      |  JOIN dfreq f ON f.term = t.term
      |  JOIN dl d ON d.doc_id = t.doc_id, stats s),
      |agg AS (
      |  SELECT query_id, doc_id, CAST(sum(s_micro) AS BIGINT) AS score_micro,
      |    count(*) AS n_terms_hit
      |  FROM scored GROUP BY 1, 2)
      |SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY score_micro DESC, doc_id) AS INT) AS rank,
      |  doc_id, score_micro, n_terms_hit
      |FROM agg QUALIFY rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** Shared by q_ann_ivfpq and q_ann_ivfpq_staged — the materialized
    * index must return row-identical results to the direct scan. */
  private lazy val ivfPqOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000),
       |cent AS (SELECT row_number() OVER (ORDER BY vec_id) AS ccidx, embedding
       |         FROM (SELECT * FROM e ORDER BY vec_id LIMIT 8)),
       |cd AS (SELECT v.vec_id, c.ccidx,
       |         ${dotQ("v.embedding", "c.embedding")} AS dot
       |       FROM e v, cent c),
       |asgn AS (SELECT vec_id, ccidx FROM (
       |           SELECT vec_id, ccidx,
       |             row_number() OVER (PARTITION BY vec_id
       |                  ORDER BY dot DESC, ccidx) AS rn
       |           FROM cd) WHERE rn = 1),
       |probe AS (SELECT vec_id, ccidx FROM (
       |           SELECT vec_id, ccidx,
       |             row_number() OVER (PARTITION BY vec_id
       |                  ORDER BY dot DESC, ccidx) AS rn
       |           FROM cd WHERE vec_id < 50) WHERE rn <= 2),
       |x AS (SELECT vec_id, u.i AS i, CAST((u.i - 1) // 16 AS INT) AS j,
       |        CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 1000) AS BIGINT) AS xq
       |      FROM e, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) u),
       |cwid AS (SELECT row_number() OVER (ORDER BY vec_id) AS cidx, vec_id
       |         FROM (SELECT vec_id FROM e ORDER BY vec_id LIMIT 16)),
       |cw AS (SELECT w.cidx, x.j, x.i, x.xq AS cq
       |       FROM cwid w JOIN x ON x.vec_id = w.vec_id),
       |d2 AS (SELECT v.vec_id, v.j, c.cidx,
       |         CAST(sum((v.xq - c.cq) * (v.xq - c.cq)) AS BIGINT) AS d2
       |       FROM x v JOIN cw c ON c.i = v.i
       |       GROUP BY 1, 2, 3),
       |enc AS (SELECT vec_id, j, cidx AS code FROM (
       |          SELECT vec_id, j, cidx,
       |            row_number() OVER (PARTITION BY vec_id, j
       |                 ORDER BY d2, cidx) AS rn
       |          FROM d2) WHERE rn = 1),
       |pairs AS (SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id
       |          FROM probe p JOIN asgn a
       |            ON a.ccidx = p.ccidx AND a.vec_id <> p.vec_id),
       |score AS (SELECT pr.query_id, pr.neighbor_id,
       |            CAST(sum(qd.d2) AS BIGINT) AS adist
       |          FROM pairs pr
       |          JOIN enc v ON v.vec_id = pr.neighbor_id
       |          JOIN d2 qd ON qd.vec_id = pr.query_id
       |            AND qd.j = v.j AND qd.cidx = v.code
       |          GROUP BY 1, 2)
       |SELECT query_id,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |       ORDER BY adist, neighbor_id) AS INT) AS rank,
       |  neighbor_id, adist
       |FROM score QUALIFY rank <= 3
       |ORDER BY query_id, rank""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_ann_ivfpq_staged" -> ivfPqOracle,
    "q_ann_index_incr" -> ivfPqOracle,
    "q_st_index" -> ivfPqOracle,
    "q_ann_ivf_refined" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000),
         |x AS (SELECT vec_id, u.i AS i,
         |        CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 1000) AS BIGINT) AS xq
         |      FROM e, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) u),
         |c0id AS (SELECT row_number() OVER (ORDER BY vec_id) AS cidx, vec_id
         |         FROM (SELECT vec_id FROM e ORDER BY vec_id LIMIT 8)),
         |c0 AS (SELECT g.cidx, x.i, x.xq AS cq
         |       FROM c0id g JOIN x ON x.vec_id = g.vec_id),
         |cd0 AS (SELECT v.vec_id, c.cidx, sum(v.xq * c.cq) AS dot
         |        FROM x v JOIN c0 c ON c.i = v.i GROUP BY 1, 2),
         |a0 AS (SELECT vec_id, cidx FROM (
         |         SELECT vec_id, cidx, row_number() OVER (PARTITION BY vec_id
         |              ORDER BY dot DESC, cidx) AS rn FROM cd0) WHERE rn = 1),
         |c1s AS (SELECT a0.cidx, x.i, sum(x.xq) AS s, count(*) AS n
         |        FROM a0 JOIN x ON x.vec_id = a0.vec_id GROUP BY 1, 2),
         |c1f AS (SELECT c0.cidx, c0.i,
         |          coalesce((c1s.s - (((c1s.s % c1s.n) + c1s.n) % c1s.n)) // c1s.n,
         |                   c0.cq) AS cq
         |        FROM c0 LEFT JOIN c1s ON c1s.cidx = c0.cidx AND c1s.i = c0.i),
         |cd1 AS (SELECT v.vec_id, c.cidx, sum(v.xq * c.cq) AS dot
         |        FROM x v JOIN c1f c ON c.i = v.i GROUP BY 1, 2),
         |asgn AS (SELECT vec_id, cidx FROM (
         |           SELECT vec_id, cidx, row_number() OVER (PARTITION BY vec_id
         |                ORDER BY dot DESC, cidx) AS rn FROM cd1) WHERE rn = 1),
         |probe AS (SELECT vec_id, cidx FROM (
         |           SELECT vec_id, cidx, row_number() OVER (PARTITION BY vec_id
         |                ORDER BY dot DESC, cidx) AS rn
         |           FROM cd1 WHERE vec_id < 50) WHERE rn <= 2),
         |pairs AS (
         |  SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
         |    ${dotQ("q.embedding", "n.embedding")} AS dot_q
         |  FROM probe p
         |  JOIN asgn a ON a.cidx = p.cidx AND a.vec_id <> p.vec_id
         |  JOIN e q ON q.vec_id = p.vec_id
         |  JOIN e n ON n.vec_id = a.vec_id)
         |SELECT query_id, neighbor_id, dot_q,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |       ORDER BY dot_q DESC, neighbor_id) AS INT) AS rank
         |FROM pairs QUALIFY rank <= 3
         |ORDER BY query_id, rank""".stripMargin,
    "q_t11_docgen" ->
      """WITH g AS (SELECT CAST(range AS BIGINT) AS id FROM range(0, 2000)),
        |d AS (SELECT id, id + 1001 AS n,
        |        (id + 1001) * (id + 1001) + 3629 AS num FROM g)
        |SELECT id,
        |  substr(md5('oid|' || CAST(id AS VARCHAR)), 1, 24) AS oid,
        |  ['red','orange','yellow','green','blue','indigo','violet']
        |    [CAST(id % 7 AS INT) + 1] AS color,
        |  CAST(num AS DOUBLE) AS float64,
        |  num AS int64,
        |  id AS seq,
        |  printf('%06d-%d-%d-%d', id + 1, num, n, num) AS str,
        |  (1600000000 + id) * 1000000 AS ts_us,
        |  array_to_string([x * x - x FOR x IN generate_series(101, 109)], ',') AS arr,
        |  substr(md5('oid|' || CAST(id AS VARCHAR)), 1, 24) AS subdoc_oid,
        |  CAST(length(CAST(n AS VARCHAR)) + 2500 AS BIGINT) AS filler_len,
        |  substr(CAST(n AS VARCHAR) || repeat('G', 2500), 1, 12) AS filler_prefix,
        |  md5('bin4|' || CAST(id AS VARCHAR)) AS bin4_hex,
        |  md5('bin1|' || CAST(id AS VARCHAR)) AS bin1_hex,
        |  4 AS uuid_subtype,
        |  CAST(CAST(printf('%d%d.%06d', num, n, id) AS DECIMAL(38,6)) AS VARCHAR) AS decimal128
        |FROM d ORDER BY id""".stripMargin,
    "q_shuffle" ->
      """WITH r AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || '#ep1') AS rk
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(floor(CAST(('0x' || substr(rk, 1, 4)) AS BIGINT) * 8 / 65536) AS INT) AS shard,
        |  CAST(row_number() OVER (ORDER BY rk, doc_id) - 1 AS BIGINT) AS pos
        |FROM r ORDER BY doc_id""".stripMargin,
    "q_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
        |  FROM documents WHERE text IS NOT NULL),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfq AS (SELECT tok, count(*) AS doc_freq FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents WHERE text IS NOT NULL),
        |sc AS (
        |  SELECT t.doc_id, t.tok, t.tf, d.doc_freq,
        |    t.tf * CAST(floor(1000.0 * ln(CAST(n.n AS DOUBLE) / d.doc_freq)) AS BIGINT)
        |      AS score_mnats
        |  FROM tf t JOIN dfq d USING (tok), n)
        |SELECT doc_id,
        |  CAST(row_number() OVER (PARTITION BY doc_id
        |       ORDER BY score_mnats DESC, tok) AS INT) AS rank,
        |  tok, tf, doc_freq, score_mnats
        |FROM sc QUALIFY rank <= 3
        |ORDER BY doc_id, rank""".stripMargin,
    "q_normalize_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 400000, chr(9) || upper(replace(text, ' ', '  '))
        |  FROM documents WHERE doc_id % 6 = 0),
        |n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[\x00-\x1f\x7f\xa0]', ' ', 'g'), ' +', ' ', 'g')) AS t
        |  FROM corpus)
        |SELECT md5(t) AS content_hash, min(doc_id) AS keep_id,
        |  count(*) AS dup_count
        |FROM n GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_line_dedup" -> (lineCorpusCte +
      """, nz AS (SELECT * FROM ls WHERE trim(line) <> ''),
        |w AS (
        |  SELECT doc_id, pos, line,
        |    row_number() OVER (PARTITION BY md5(line) ORDER BY doc_id, pos) AS rn
        |  FROM nz)
        |SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_dedup,
        |  count(*) AS n_kept
        |FROM w WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "q_c4_filter" -> (lineCorpusCte +
      """, k AS (
        |  SELECT doc_id, pos, line FROM ls
        |  WHERE len(regexp_split_to_array(trim(line), '\s+')) >= 5
        |    AND right(trim(line), 1) IN ('.', '!', '?', '"')),
        |agg AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_kept,
        |    count(*) AS n_kept
        |  FROM k GROUP BY doc_id)
        |SELECT c.doc_id, coalesce(a.text_kept, '') AS text_kept,
        |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(len(string_split(c.text, chr(10))) AS BIGINT) AS n_lines
        |FROM corpus c LEFT JOIN agg a ON a.doc_id = c.doc_id
        |ORDER BY c.doc_id""".stripMargin),
    "q_rep_ngrams" -> repNgramOracle,
    "q_rep_lines" ->
      """WITH corpus AS (
        |  SELECT doc_id,
        |    'Shared intro paragraph.' || chr(10) || chr(10) ||
        |    regexp_replace(regexp_replace(text,
        |      ' table ', '.' || chr(10) || chr(10), 'g'),
        |      ' the ', '.' || chr(10), 'g') ||
        |    chr(10) || chr(10) || 'Shared footer paragraph.' ||
        |    CASE WHEN doc_id % 4 = 0 THEN chr(10) || chr(10) ||
        |      'Shared intro paragraph.' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN chr(10) || chr(10) ||
        |      'Repeat line.' || chr(10) || 'Repeat line.' ELSE '' END AS text
        |  FROM documents WHERE text IS NOT NULL),
        |m AS (
        |  SELECT doc_id,
        |    list_filter(list_transform(string_split(text, chr(10)),
        |      x -> trim(x)), x -> length(x) > 0) AS ls,
        |    list_filter(list_transform(string_split(text,
        |      chr(10) || chr(10)), x -> trim(x)), x -> length(x) > 0) AS ps
        |  FROM corpus)
        |SELECT doc_id,
        |  CAST(len(ls) AS BIGINT) AS n_lines,
        |  CAST(CASE WHEN len(ls) > 0 THEN
        |    1000 * (len(ls) - len(list_distinct(ls))) // len(ls)
        |    ELSE 0 END AS BIGINT) AS dup_lines_permille,
        |  CAST(CASE WHEN length(array_to_string(ls, '')) > 0 THEN
        |    1000 * (length(array_to_string(ls, ''))
        |      - length(array_to_string(list_distinct(ls), '')))
        |      // length(array_to_string(ls, ''))
        |    ELSE 0 END AS BIGINT) AS dup_lines_char_permille,
        |  CAST(len(ps) AS BIGINT) AS n_paras,
        |  CAST(CASE WHEN len(ps) > 0 THEN
        |    1000 * (len(ps) - len(list_distinct(ps))) // len(ps)
        |    ELSE 0 END AS BIGINT) AS dup_paras_permille,
        |  CAST(CASE WHEN length(array_to_string(ps, '')) > 0 THEN
        |    1000 * (length(array_to_string(ps, ''))
        |      - length(array_to_string(list_distinct(ps), '')))
        |      // length(array_to_string(ps, ''))
        |    ELSE 0 END AS BIGINT) AS dup_paras_char_permille
        |FROM m ORDER BY doc_id""".stripMargin,
    "q_substr_spans" -> (substrCorpusCte +
      """SELECT doc_id, span_start, span_end,
        |  span_end - span_start + 1 AS span_len
        |FROM spans ORDER BY doc_id, span_start""".stripMargin),
    "q_substr_stats" -> (substrCorpusCte +
      """, headseg AS (
        |  SELECT s.doc_id, s.span_start AS ord,
        |    substring(c.text,
        |      CAST(coalesce(lag(s.span_end) OVER (PARTITION BY s.doc_id
        |        ORDER BY s.span_start), 0) + 1 AS INT),
        |      CAST(s.span_start - coalesce(lag(s.span_end) OVER (
        |        PARTITION BY s.doc_id ORDER BY s.span_start), 0) - 1 AS INT)) AS seg
        |  FROM spans s JOIN corpus c USING (doc_id)),
        |tailseg AS (
        |  SELECT s.doc_id, 2000000000 AS ord,
        |    substring(c.text, CAST(max(s.span_end) AS INT) + 1) AS seg
        |  FROM spans s JOIN corpus c USING (doc_id)
        |  GROUP BY s.doc_id, c.text),
        |clean AS (
        |  SELECT doc_id, string_agg(seg, '' ORDER BY ord) AS text_clean
        |  FROM (SELECT * FROM headseg UNION ALL SELECT * FROM tailseg)
        |  GROUP BY doc_id),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_spans,
        |    sum(span_end - span_start + 1) AS dup_chars
        |  FROM spans GROUP BY doc_id)
        |SELECT c.doc_id, CAST(length(c.text) AS BIGINT) AS n_chars,
        |  CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
        |  CAST(coalesce(a.dup_chars, 0) AS BIGINT) AS dup_chars,
        |  CAST(1000 * coalesce(a.dup_chars, 0) // length(c.text) AS BIGINT)
        |    AS dup_permille,
        |  md5(coalesce(cl.text_clean, c.text)) AS clean_md5
        |FROM corpus c
        |LEFT JOIN agg a ON a.doc_id = c.doc_id
        |LEFT JOIN clean cl ON cl.doc_id = c.doc_id
        |ORDER BY c.doc_id""".stripMargin),
    // winnowing (leftmost-tie minimizer, G = 25): a position is selected
    // iff some full window of 25 consecutive gram positions has it as
    // (h, p)-rank minimum — the bounded nearest-smaller-rank
    // characterization; short docs select their overall rank-min
    "q_substr_eval" -> (substrCorpusCte +
      """, win AS (
        |  SELECT doc_id, p, h, count(*) OVER (PARTITION BY doc_id) AS L
        |  FROM g),
        |nb AS (
        |  SELECT a.doc_id, a.p, a.h, a.L,
        |    max(CASE WHEN b.p < a.p THEN b.p END) AS qstar,
        |    min(CASE WHEN b.p > a.p THEN b.p END) AS rstar
        |  FROM win a LEFT JOIN win b
        |    ON a.doc_id = b.doc_id AND b.p BETWEEN a.p - 24 AND a.p + 24
        |    AND b.p <> a.p AND (b.h < a.h OR (b.h = a.h AND b.p < a.p))
        |  GROUP BY a.doc_id, a.p, a.h, a.L),
        |sel AS (
        |  SELECT doc_id, p, h FROM nb
        |  WHERE greatest(1, coalesce(qstar, 0) + 1, p - 24)
        |     <= least(p, greatest(L - 24, 1), coalesce(rstar, L + 25) - 25)),
        |adup AS (
        |  SELECT doc_id, p, p + 39 AS e FROM sel
        |  WHERE h IN (SELECT h FROM sel GROUP BY h HAVING count(*) > 1)),
        |amrk AS (
        |  SELECT doc_id, p, e,
        |    CASE WHEN p > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
        |      THEN 1 ELSE 0 END AS brk
        |  FROM adup),
        |aspans AS (
        |  SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
        |    CAST(max(e) AS BIGINT) AS span_end
        |  FROM (SELECT doc_id, p, e,
        |          sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS gid
        |        FROM amrk)
        |  GROUP BY doc_id, gid),
        |ex AS (SELECT count(*) AS exact_spans,
        |         sum(span_end - span_start + 1) AS exact_chars FROM spans),
        |an AS (SELECT count(*) AS anchor_spans,
        |         sum(span_end - span_start + 1) AS anchor_chars FROM aspans),
        |ov AS (
        |  SELECT coalesce(sum(least(e.span_end, a.span_end)
        |    - greatest(e.span_start, a.span_start) + 1), 0) AS overlap_chars
        |  FROM spans e JOIN aspans a USING (doc_id)
        |  WHERE least(e.span_end, a.span_end)
        |    - greatest(e.span_start, a.span_start) + 1 > 0)
        |SELECT CAST(exact_spans AS BIGINT) AS exact_spans,
        |  CAST(exact_chars AS BIGINT) AS exact_chars,
        |  CAST(anchor_spans AS BIGINT) AS anchor_spans,
        |  CAST(anchor_chars AS BIGINT) AS anchor_chars,
        |  CAST(overlap_chars AS BIGINT) AS overlap_chars,
        |  CAST(1000 * overlap_chars // exact_chars AS BIGINT) AS covered_permille
        |FROM ex, an, ov""".stripMargin),
    // the streamed-ingest index must converge to the full census of the
    // bootstrap ∪ streamed thirds — same probe rule as q_substr_new,
    // reference = everything outside the probe third, no planted batch
    "q_st_substr" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |refg AS (
        |  SELECT DISTINCT md5(substring(text, u.p, 40)) AS h
        |  FROM base, LATERAL (SELECT unnest(generate_series(
        |    1, length(text) - 39)) AS p) u
        |  WHERE doc_id % 3 <> 1 AND length(text) >= 40),
        |bg AS (
        |  SELECT doc_id, u.p AS p, md5(substring(text, u.p, 40)) AS h
        |  FROM base, LATERAL (SELECT unnest(generate_series(
        |    1, length(text) - 39)) AS p) u
        |  WHERE doc_id % 3 = 1 AND length(text) >= 40),
        |dup AS (
        |  SELECT doc_id, p, p + 39 AS e FROM bg
        |  WHERE h IN (SELECT h FROM bg GROUP BY h HAVING count(*) > 1)
        |     OR h IN (SELECT h FROM refg)),
        |mrk AS (
        |  SELECT doc_id, p, e,
        |    CASE WHEN p > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
        |      THEN 1 ELSE 0 END AS brk
        |  FROM dup),
        |spans AS (
        |  SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
        |    CAST(max(e) AS BIGINT) AS span_end
        |  FROM (SELECT doc_id, p, e,
        |          sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS gid
        |        FROM mrk)
        |  GROUP BY doc_id, gid)
        |SELECT doc_id, span_start, span_end,
        |  span_end - span_start + 1 AS span_len
        |FROM spans ORDER BY doc_id, span_start""".stripMargin,
    "q_substr_new" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |refg AS (
        |  SELECT DISTINCT md5(substring(text, u.p, 40)) AS h
        |  FROM base, LATERAL (SELECT unnest(generate_series(
        |    1, length(text) - 39)) AS p) u
        |  WHERE doc_id % 3 <> 1 AND length(text) >= 40),
        |batch AS (
        |  SELECT doc_id, text FROM base WHERE doc_id % 3 = 1
        |  UNION ALL
        |  SELECT doc_id + 500000,
        |    'NEW:' || CAST(doc_id AS VARCHAR) || ' ' || substring(text, 61, 150)
        |  FROM base WHERE doc_id % 21 = 0 AND length(text) >= 240),
        |bg AS (
        |  SELECT doc_id, u.p AS p, md5(substring(text, u.p, 40)) AS h
        |  FROM batch, LATERAL (SELECT unnest(generate_series(
        |    1, length(text) - 39)) AS p) u
        |  WHERE length(text) >= 40),
        |dup AS (
        |  SELECT doc_id, p, p + 39 AS e FROM bg
        |  WHERE h IN (SELECT h FROM bg GROUP BY h HAVING count(*) > 1)
        |     OR h IN (SELECT h FROM refg)),
        |mrk AS (
        |  SELECT doc_id, p, e,
        |    CASE WHEN p > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
        |      THEN 1 ELSE 0 END AS brk
        |  FROM dup),
        |spans AS (
        |  SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
        |    CAST(max(e) AS BIGINT) AS span_end
        |  FROM (SELECT doc_id, p, e,
        |          sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS gid
        |        FROM mrk)
        |  GROUP BY doc_id, gid)
        |SELECT doc_id, span_start, span_end,
        |  span_end - span_start + 1 AS span_len
        |FROM spans ORDER BY doc_id, span_start""".stripMargin,
    // winnow selection (G = 25 windows, leftmost-tie) on BOTH the
    // reference and the batch — same nearest-smaller-rank formulation
    // as q_substr_eval, then the q_substr_new probe rule over anchors
    "q_substr_new_anchored" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |refg AS (
        |  SELECT doc_id, u.p AS p, md5(substring(text, u.p, 40)) AS h
        |  FROM base, LATERAL (SELECT unnest(generate_series(
        |    1, length(text) - 39)) AS p) u
        |  WHERE doc_id % 3 <> 1 AND length(text) >= 40),
        |refwin AS (
        |  SELECT doc_id, p, h, count(*) OVER (PARTITION BY doc_id) AS L
        |  FROM refg),
        |refnb AS (
        |  SELECT a.doc_id, a.p, a.h, a.L,
        |    max(CASE WHEN b.p < a.p THEN b.p END) AS qstar,
        |    min(CASE WHEN b.p > a.p THEN b.p END) AS rstar
        |  FROM refwin a LEFT JOIN refwin b
        |    ON a.doc_id = b.doc_id AND b.p BETWEEN a.p - 24 AND a.p + 24
        |    AND b.p <> a.p AND (b.h < a.h OR (b.h = a.h AND b.p < a.p))
        |  GROUP BY a.doc_id, a.p, a.h, a.L),
        |refsel AS (
        |  SELECT DISTINCT h FROM refnb
        |  WHERE greatest(1, coalesce(qstar, 0) + 1, p - 24)
        |     <= least(p, greatest(L - 24, 1), coalesce(rstar, L + 25) - 25)),
        |batch AS (
        |  SELECT doc_id, text FROM base WHERE doc_id % 3 = 1
        |  UNION ALL
        |  SELECT doc_id + 500000,
        |    'NEW:' || CAST(doc_id AS VARCHAR) || ' ' || substring(text, 61, 150)
        |  FROM base WHERE doc_id % 21 = 0 AND length(text) >= 240),
        |bg AS (
        |  SELECT doc_id, u.p AS p, md5(substring(text, u.p, 40)) AS h
        |  FROM batch, LATERAL (SELECT unnest(generate_series(
        |    1, length(text) - 39)) AS p) u
        |  WHERE length(text) >= 40),
        |bwin AS (
        |  SELECT doc_id, p, h, count(*) OVER (PARTITION BY doc_id) AS L
        |  FROM bg),
        |bnb AS (
        |  SELECT a.doc_id, a.p, a.h, a.L,
        |    max(CASE WHEN b.p < a.p THEN b.p END) AS qstar,
        |    min(CASE WHEN b.p > a.p THEN b.p END) AS rstar
        |  FROM bwin a LEFT JOIN bwin b
        |    ON a.doc_id = b.doc_id AND b.p BETWEEN a.p - 24 AND a.p + 24
        |    AND b.p <> a.p AND (b.h < a.h OR (b.h = a.h AND b.p < a.p))
        |  GROUP BY a.doc_id, a.p, a.h, a.L),
        |bsel AS (
        |  SELECT doc_id, p, h FROM bnb
        |  WHERE greatest(1, coalesce(qstar, 0) + 1, p - 24)
        |     <= least(p, greatest(L - 24, 1), coalesce(rstar, L + 25) - 25)),
        |dup AS (
        |  SELECT doc_id, p, p + 39 AS e FROM bsel
        |  WHERE h IN (SELECT h FROM bsel GROUP BY h HAVING count(*) > 1)
        |     OR h IN (SELECT h FROM refsel)),
        |mrk AS (
        |  SELECT doc_id, p, e,
        |    CASE WHEN p > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
        |      THEN 1 ELSE 0 END AS brk
        |  FROM dup),
        |spans AS (
        |  SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
        |    CAST(max(e) AS BIGINT) AS span_end
        |  FROM (SELECT doc_id, p, e,
        |          sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS gid
        |        FROM mrk)
        |  GROUP BY doc_id, gid)
        |SELECT doc_id, span_start, span_end,
        |  span_end - span_start + 1 AS span_len
        |FROM spans ORDER BY doc_id, span_start""".stripMargin,
    "q_vocab" ->
      """SELECT tok, count(*) AS n, count(DISTINCT doc_id) AS doc_freq
        |FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
        |      FROM documents WHERE text IS NOT NULL)
        |GROUP BY 1 ORDER BY n DESC, tok LIMIT 1000""".stripMargin,
    "q_surprisal_heldout" ->
      """WITH b AS (
        |  SELECT doc_id, text,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8)) AS BIGINT)
        |      % 10000 AS bucket
        |  FROM documents WHERE text IS NOT NULL),
        |tt AS (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS tok
        |       FROM b WHERE bucket < 8000),
        |m AS (SELECT tok, count(*) AS tf FROM tt GROUP BY 1),
        |nv AS (SELECT CAST(sum(tf) AS BIGINT) + count(*) AS denom FROM m),
        |st AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
        |       FROM b WHERE bucket >= 8000 AND bucket < 9000)
        |SELECT st.doc_id, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN m.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
        |  CAST(sum(CAST(floor(-1000.0 * ln(
        |    CAST(coalesce(m.tf, 0) + 1 AS DOUBLE) / denom)) AS BIGINT)) AS BIGINT)
        |    AS total_mnats,
        |  CAST(sum(CAST(floor(-1000.0 * ln(
        |    CAST(coalesce(m.tf, 0) + 1 AS DOUBLE) / denom)) AS BIGINT)) AS BIGINT)
        |    / 1000.0 / count(*) AS avg_surprisal_nats
        |FROM st LEFT JOIN m ON st.tok = m.tok CROSS JOIN nv
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_ccnet_buckets" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
        |  FROM documents WHERE text IS NOT NULL),
        |model AS (SELECT tok, count(*) AS tf FROM tok GROUP BY 1),
        |tot AS (SELECT count(*) AS n FROM tok),
        |sc AS (
        |  SELECT t.doc_id,
        |    CAST(floor(-1000.0 * ln(CAST(m.tf AS DOUBLE) / tot.n)) AS BIGINT) AS mnats
        |  FROM tok t JOIN model m ON m.tok = t.tok CROSS JOIN tot),
        |doc AS (
        |  SELECT sc.doc_id, d.lang,
        |    CAST(sum(mnats) AS BIGINT) // count(*) AS mnpt
        |  FROM sc JOIN documents d ON d.doc_id = sc.doc_id
        |  GROUP BY 1, 2),
        |hist AS (SELECT lang, mnpt AS v, count(*) AS cnt FROM doc GROUP BY 1, 2),
        |cum AS (SELECT lang, v, CAST(sum(cnt) OVER
        |          (PARTITION BY lang ORDER BY v ROWS UNBOUNDED PRECEDING)
        |          AS BIGINT) AS cum
        |        FROM hist),
        |ns AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM doc GROUP BY 1),
        |t AS (SELECT lang, q_mille, n,
        |        (n-1) * q_mille // 1000 AS idx,
        |        (n-1) * q_mille % 1000 AS rem,
        |        least((n-1) * q_mille // 1000 + 1, n-1) AS idx2
        |      FROM (VALUES (333), (667)) q(q_mille), ns),
        |a AS (SELECT t.lang, t.q_mille, t.rem, min(c.v) AS v_lo,
        |        min(CASE WHEN c.cum > t.idx2 THEN c.v END) AS v_hi
        |      FROM t JOIN cum c ON c.lang = t.lang AND c.cum > t.idx
        |      GROUP BY 1, 2, 3),
        |w AS (SELECT lang,
        |        min(CASE WHEN q_mille = 333 THEN
        |          1000 * v_lo + (coalesce(v_hi, v_lo) - v_lo) * rem END) AS c333,
        |        min(CASE WHEN q_mille = 667 THEN
        |          1000 * v_lo + (coalesce(v_hi, v_lo) - v_lo) * rem END) AS c667
        |      FROM a GROUP BY 1)
        |SELECT doc.doc_id, doc.lang, doc.mnpt,
        |  CASE WHEN mnpt * 1000 <= c333 THEN 'head'
        |       WHEN mnpt * 1000 <= c667 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM doc JOIN w ON w.lang = doc.lang
        |ORDER BY doc_id""".stripMargin,
    "q_zipf" ->
      """WITH v AS (
        |  SELECT tok, count(*) AS n
        |  FROM (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS tok
        |        FROM documents WHERE text IS NOT NULL)
        |  GROUP BY 1 ORDER BY n DESC, tok LIMIT 1000),
        |r AS (SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS rank FROM v),
        |q AS (SELECT
        |  CAST(floor(1000000.0 * ln(CAST(rank AS DOUBLE))) AS BIGINT) AS x,
        |  CAST(floor(1000000.0 * ln(CAST(n AS DOUBLE))) AS BIGINT) AS y FROM r),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS cnt,
        |  sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx, sum(x*y) AS sxy,
        |  sum(y*y) AS syy FROM q),
        |t AS (SELECT cnt AS n_terms,
        |  CAST(cnt AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
        |  CAST(cnt AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
        |  CAST(cnt AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS den2,
        |  CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd FROM s)
        |SELECT n_terms, num / den AS slope,
        |  (syd - num / den * sxd) / CAST(n_terms AS DOUBLE) / 1000000.0 AS intercept,
        |  num * num / (den * den2) AS r2
        |FROM t""".stripMargin,
    "q_bpe_merges" ->
      (bpeStagesSql + "\n" +
        (1 to BpeK).map { i =>
          if (i == 1)
            s"SELECT CAST($i AS INT) AS rank, l AS left_sym, r AS right_sym, CAST(cnt AS BIGINT) AS pair_count FROM b$i"
          else s"SELECT $i, l, r, CAST(cnt AS BIGINT) FROM b$i"
        }.mkString("\nUNION ALL ") + "\nORDER BY rank"),
    "q_bpe_fertility" ->
      (bpeStagesSql + s""",
         |nt AS (SELECT word, count(*) AS ntok FROM s$BpeK GROUP BY 1),
         |dw AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS word
         |  FROM documents WHERE text IS NOT NULL)
         |SELECT doc_id, count(*) AS n_words,
         |  CAST(sum(coalesce(nt.ntok, len(dw.word))) AS BIGINT) AS n_tokens
         |FROM dw LEFT JOIN nt USING (word)
         |GROUP BY 1 ORDER BY 1""".stripMargin),
    "q_bpe_encode" ->
      (bpeStagesSql + s""",
         |tw AS (SELECT DISTINCT unnest(regexp_extract_all(lower(p_name), '\\S+')) AS word
         |  FROM part WHERE p_partkey % 7 = 0 AND p_name IS NOT NULL),
         |t0 AS (SELECT word, CAST(1 AS BIGINT) AS freq, i - 1 AS pos, substr(word, i, 1) AS sym
         |  FROM tw, LATERAL (SELECT unnest(generate_series(1, len(word))) AS i) u),
         |""".stripMargin +
        (1 to BpeK).map(i => bpeXSql(i, "t") + ",\n" + bpeRestSql(i, "t"))
          .mkString(",\n") +
        s"""
           |, tnt AS (SELECT word, count(*) AS ntok FROM t$BpeK GROUP BY 1),
           |tdw AS (SELECT p_partkey, unnest(regexp_extract_all(lower(p_name), '\\S+')) AS word
           |  FROM part WHERE p_partkey % 7 = 0 AND p_name IS NOT NULL)
           |SELECT p_partkey, count(*) AS n_words,
           |  CAST(sum(tnt.ntok) AS BIGINT) AS n_tokens
           |FROM tdw JOIN tnt USING (word)
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    "q_decontaminate" ->
      s"""WITH cw AS (
         |  SELECT doc_id, list_slice(str_split(lower(text), ' '), 1, 4096) AS w
         |  FROM documents),
         |cs AS (SELECT DISTINCT doc_id, s FROM (
         |  SELECT doc_id, $gram13 AS s
         |  FROM cw, LATERAL (SELECT unnest(generate_series(1, greatest(len(w)-12, 1))) AS i) u)
         |  WHERE s IS NOT NULL),
         |bs AS (SELECT DISTINCT doc_id AS bench_id, s FROM (
         |  SELECT doc_id, $gram13 AS s
         |  FROM cw, LATERAL (SELECT unnest(generate_series(1, greatest(len(w)-12, 1))) AS i) u
         |  WHERE doc_id % 50 = 0)
         |  WHERE s IS NOT NULL)
         |SELECT cs.doc_id, count(DISTINCT cs.s) AS n_grams_hit,
         |  min(bs.bench_id) AS first_bench_id
         |FROM cs JOIN bs ON bs.s = cs.s
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_boilerplate" ->
      s"""WITH cw AS (
         |  SELECT doc_id, list_slice(str_split(lower(text), ' '), 1, 4096) AS w
         |  FROM documents),
         |g AS (SELECT DISTINCT doc_id, s FROM (
         |  SELECT doc_id, ${gramN(5)} AS s
         |  FROM cw, LATERAL (SELECT unnest(generate_series(1, greatest(len(w)-4, 1))) AS i) u)
         |  WHERE s IS NOT NULL),
         |census AS (SELECT s FROM g GROUP BY s HAVING count(*) >= 3),
         |pd AS (SELECT g.doc_id, count(*) AS n_grams, count(c.s) AS n_boiler
         |       FROM g LEFT JOIN census c USING (s) GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(pd.n_grams, 0) AS n_grams,
         |  coalesce(pd.n_boiler, 0) AS n_boiler,
         |  CASE WHEN coalesce(pd.n_grams, 0) = 0 THEN CAST(0 AS BIGINT)
         |       ELSE 1000 * pd.n_boiler // pd.n_grams END AS boiler_permille
         |FROM documents d LEFT JOIN pd USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "q_dup_spans" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 200000, text FROM documents WHERE doc_id % 7 = 0),
         |words AS (
         |  SELECT doc_id, list_slice(str_split(lower(text), ' '), 1, 4096) AS w
         |  FROM corpus),
         |grams AS (
         |  SELECT doc_id, u.i - 1 AS p, md5($gram13) AS g
         |  FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(w)-12, 1))) AS i) u
         |  WHERE $gram13 IS NOT NULL),
         |dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
         |dp AS (SELECT doc_id, p FROM grams WHERE g IN (SELECT g FROM dup)),
         |brk AS (SELECT doc_id, p,
         |  CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= 13
         |       THEN 0 ELSE 1 END AS b FROM dp),
         |sp AS (SELECT doc_id, p,
         |  sum(b) OVER (PARTITION BY doc_id ORDER BY p ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM brk),
         |spans AS (SELECT doc_id, sid, max(p) - min(p) + 13 AS len
         |          FROM sp GROUP BY 1, 2),
         |pd AS (SELECT doc_id, count(*) AS n_spans, sum(len) AS dup_tokens
         |       FROM spans GROUP BY 1),
         |nt AS (SELECT doc_id, CASE WHEN text IS NULL THEN 0
         |         ELSE len(list_slice(str_split(lower(text), ' '), 1, 4096)) END AS n_tokens
         |       FROM corpus)
         |SELECT nt.doc_id, nt.n_tokens,
         |  coalesce(pd.n_spans, 0) AS n_spans,
         |  CAST(coalesce(pd.dup_tokens, 0) AS BIGINT) AS dup_tokens,
         |  CAST(CASE WHEN nt.n_tokens > 0
         |       THEN 1000 * coalesce(pd.dup_tokens, 0) // nt.n_tokens
         |       ELSE 0 END AS BIGINT) AS dup_permille
         |FROM nt LEFT JOIN pd USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "q_gopher_gate" -> {
      val stopHits = text.Curation.GopherStops
        .map(w => s"CAST(regexp_matches(lower(text), '\\b$w\\b') AS BIGINT)")
        .mkString(" + ")
      s"""WITH c AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
         |m AS (SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_words,
         |  CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS n_word_chars,
         |  CAST(len(list_filter(regexp_extract_all(text, '\\S+'),
         |    x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words,
         |  CAST(len(regexp_extract_all(text, '#'))
         |    + len(regexp_extract_all(text, '\\.\\.\\.|…')) AS BIGINT) AS n_symbols,
         |  list_filter(list_transform(str_split(text, chr(10)), l -> trim(l)),
         |    l -> length(l) > 0) AS lines,
         |  $stopHits AS n_stop_hits
         |  FROM c),
         |m2 AS (SELECT doc_id, n_words, n_word_chars, n_alpha_words, n_symbols,
         |  CAST(len(lines) AS BIGINT) AS n_lines,
         |  CAST(len(list_filter(lines,
         |    l -> substr(l, 1, 1) IN ('•', '-', '*'))) AS BIGINT) AS n_bullet,
         |  CAST(len(list_filter(lines,
         |    l -> l LIKE '%...' OR l LIKE '%…')) AS BIGINT) AS n_ellipsis_end,
         |  n_stop_hits FROM m)
         |SELECT doc_id, n_words, n_word_chars, n_alpha_words, n_symbols,
         |  n_lines, n_bullet, n_ellipsis_end, n_stop_hits,
         |  CAST(n_words BETWEEN 50 AND 100000 AS BIGINT)
         |    + CAST(3*n_words <= n_word_chars AND n_word_chars <= 10*n_words AS BIGINT)
         |    + CAST(10*n_symbols < n_words AS BIGINT)
         |    + CAST(10*n_bullet < 9*n_lines AS BIGINT)
         |    + CAST(10*n_ellipsis_end < 3*n_lines AS BIGINT)
         |    + CAST(5*n_alpha_words > 4*n_words AS BIGINT)
         |    + CAST(n_stop_hits >= 2 AS BIGINT) AS n_rules_passed,
         |  CAST(n_words BETWEEN 50 AND 100000
         |    AND 3*n_words <= n_word_chars AND n_word_chars <= 10*n_words
         |    AND 10*n_symbols < n_words
         |    AND 10*n_bullet < 9*n_lines
         |    AND 10*n_ellipsis_end < 3*n_lines
         |    AND 5*n_alpha_words > 4*n_words
         |    AND n_stop_hits >= 2 AS BIGINT) AS keep
         |FROM m2 ORDER BY doc_id""".stripMargin
    },
    "q_containment" -> (lineCorpusCte +
      s""", corpus2 AS (
         |  SELECT doc_id, text FROM corpus
         |  UNION ALL
         |  SELECT doc_id + 400000,
         |    array_to_string(list_slice(string_split(text, chr(10)), 3, 5),
         |      chr(10)) AS text
         |  FROM corpus WHERE doc_id % 11 = 0 AND doc_id < 300000),
         |l2 AS (SELECT DISTINCT doc_id, line FROM (
         |    SELECT doc_id, unnest(string_split(text, chr(10))) AS line
         |    FROM corpus2) x
         |  WHERE trim(line) <> ''),
         |ok AS (SELECT line FROM l2 GROUP BY line
         |       HAVING count(*) BETWEEN 2 AND 100),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM l2 a JOIN ok USING (line)
         |  JOIN l2 b ON a.line = b.line AND a.doc_id < b.doc_id),
         |w2 AS (SELECT doc_id,
         |  list_slice(str_split(lower(text), ' '), 1, 4096) AS w FROM corpus2),
         |sh2 AS (SELECT DISTINCT doc_id, ${gramN(3)} AS s
         |  FROM w2, LATERAL (SELECT unnest(generate_series(1, greatest(len(w)-2, 1))) AS i) u
         |  WHERE ${gramN(3)} IS NOT NULL),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY 1),
         |inter AS (
         |  SELECT c.id_a, c.id_b, count(*) AS n_inter
         |  FROM cand c
         |  JOIN sh2 sa ON sa.doc_id = c.id_a
         |  JOIN sh2 sb ON sb.doc_id = c.id_b AND sb.s = sa.s
         |  GROUP BY 1, 2),
         |scored AS (
         |  SELECT c.id_a, c.id_b,
         |    CAST(coalesce(i.n_inter, 0) AS BIGINT) AS n_inter,
         |    CAST(least(sa.n, sb.n) AS BIGINT) AS n_small
         |  FROM cand c
         |  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
         |  JOIN sizes sa ON sa.doc_id = c.id_a
         |  JOIN sizes sb ON sb.doc_id = c.id_b)
         |SELECT id_a, id_b, n_inter, n_small,
         |  1000 * n_inter // n_small AS containment_permille
         |FROM scored WHERE 1000 * n_inter // n_small >= 500
         |ORDER BY id_a, id_b""".stripMargin),
    "q_len_quantiles" ->
      """WITH lens AS (
        |  SELECT CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS v
        |  FROM documents WHERE text IS NOT NULL),
        |hist AS (SELECT v, count(*) AS cnt FROM lens GROUP BY 1),
        |cum AS (SELECT v, CAST(sum(cnt) OVER
        |          (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |        FROM hist),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lens),
        |t AS (SELECT q_mille, n,
        |        (n-1) * q_mille // 1000 AS idx,
        |        (n-1) * q_mille % 1000 AS rem,
        |        least((n-1) * q_mille // 1000 + 1, n-1) AS idx2
        |      FROM (VALUES (250),(500),(750),(900),(950),(990),(1000)) q(q_mille), s),
        |a AS (SELECT t.q_mille, t.n, t.rem,
        |        min(c.v) AS v_lo,
        |        min(CASE WHEN c.cum > t.idx2 THEN c.v END) AS v_hi
        |      FROM t JOIN cum c ON c.cum > t.idx
        |      GROUP BY 1, 2, 3)
        |SELECT CAST(q_mille AS INT) AS q_mille, n AS n_rows, v_lo,
        |  coalesce(v_hi, v_lo) AS v_hi,
        |  1000 * v_lo + (coalesce(v_hi, v_lo) - v_lo) * rem AS value_milli
        |FROM a ORDER BY q_mille""".stripMargin,
    "q_vocab_drift" ->
      """WITH ta AS (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS term
        |  FROM documents WHERE lang = 'en' AND text IS NOT NULL),
        |tb AS (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS term
        |  FROM documents WHERE lang <> 'en' AND text IS NOT NULL),
        |ca AS (SELECT term, count(*) AS count_a FROM ta GROUP BY 1),
        |cb AS (SELECT term, count(*) AS count_b FROM tb GROUP BY 1),
        |j AS (SELECT coalesce(ca.term, cb.term) AS term,
        |        coalesce(count_a, 0) AS count_a,
        |        coalesce(count_b, 0) AS count_b
        |      FROM ca FULL OUTER JOIN cb ON ca.term = cb.term),
        |s AS (SELECT CAST(sum(count_a) AS BIGINT) AS n_a,
        |        CAST(sum(count_b) AS BIGINT) AS n_b,
        |        count(*) AS v FROM j),
        |lr AS (SELECT term, count_a, count_b,
        |  CAST(floor(1000.0 * ln(
        |    (CAST(count_a + 1 AS DOUBLE) * (n_b + v)) /
        |    (CAST(count_b + 1 AS DOUBLE) * (n_a + v)))) AS BIGINT) AS logratio_mn,
        |  n_a, v FROM j, s)
        |SELECT term, count_a, count_b, logratio_mn,
        |  (1000000 * (count_a + 1) // (n_a + v)) * logratio_mn AS kl_contrib
        |FROM lr ORDER BY term""".stripMargin,
    "q_dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 200000, text FROM documents WHERE doc_id % 7 = 0)
        |SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS dup_count
        |FROM corpus GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_dedup_minhash" ->
      (minhashCtes + "SELECT id_a, id_b FROM cand ORDER BY 1, 2"),
    "q_ngram_jaccard" ->
      (minhashCtes + jaccardCtes +
        "SELECT id_a, id_b, n_inter, n_union, jaccard FROM jac ORDER BY 1, 2"),
    "q_dedup_eval" ->
      (minhashCtes + jaccardCtes +
        """SELECT count(*) AS n_candidates,
          |  CAST(sum(CASE WHEN jaccard >= 0.6 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_verified,
          |  (1000 * CAST(sum(CASE WHEN jaccard >= 0.6 THEN 1 ELSE 0 END)
          |    AS BIGINT)) // count(*) AS precision_permille
          |FROM jac""".stripMargin),
    "q_dedup_resolve" ->
      (minhashCtes.replace("WITH corpus", "WITH RECURSIVE corpus") + jaccardCtes +
        """, verified AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.6),
          |edges AS (SELECT id_a AS src, id_b AS dst FROM verified
          |          UNION SELECT id_b, id_a FROM verified),
          |reach AS (
          |  SELECT doc_id AS id, doc_id AS r FROM corpus
          |  UNION
          |  SELECT e.src AS id, reach.r AS r FROM edges e JOIN reach ON reach.id = e.dst)
          |SELECT id AS doc_id, min(r) AS cluster_root,
          |  CAST(id = min(r) AS INT) AS keep
          |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin),
    "q_sim_topk" ->
      s"""WITH pairs AS (
         |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |    ${dotQ("q.embedding", "e.embedding")} AS dot_q
         |  FROM embeddings q, embeddings e
         |  WHERE q.vec_id < 10 AND e.vec_id <> q.vec_id)
         |SELECT query_id, neighbor_id, dot_q,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |       ORDER BY dot_q DESC, neighbor_id) AS INT) AS rank
         |FROM pairs QUALIFY rank <= 5
         |ORDER BY query_id, rank""".stripMargin,
    "q_ann_sq8" ->
      """WITH sc AS (
        |  SELECT vec_id, embedding,
        |    (SELECT max(abs(CAST(u AS DOUBLE))) FROM unnest(embedding) t(u)) AS s
        |  FROM embeddings),
        |q8 AS (
        |  SELECT vec_id,
        |    [CASE WHEN s = 0 THEN CAST(0 AS BIGINT)
        |          ELSE CAST(floor(127.0 * CAST(x AS DOUBLE) / s) AS BIGINT) END
        |     FOR x IN embedding] AS q
        |  FROM sc),
        |n2 AS (
        |  SELECT vec_id, q, (SELECT sum(u*u) FROM unnest(q) t(u)) AS n2q FROM q8),
        |pairs AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    CAST(floor(1000000.0 *
        |      (SELECT sum(x.u1 * x.u2)
        |       FROM (SELECT unnest(a.q) AS u1, unnest(b.q) AS u2) x)
        |      / sqrt(a.n2q) / sqrt(b.n2q)) AS BIGINT) AS score_micro
        |  FROM n2 a, n2 b
        |  WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id
        |    AND a.n2q > 0 AND b.n2q > 0)
        |SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |       ORDER BY score_micro DESC, neighbor_id) AS INT) AS rank,
        |  neighbor_id, score_micro
        |FROM pairs QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "q_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 500),
         |x AS (SELECT vec_id, CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 1000) AS BIGINT) AS xq, u.i
         |      FROM e, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) u),
         |sgn AS (SELECT vec_id, h.h,
         |        CASE WHEN (strpos('0123456789abcdef',
         |                          substr(md5(h.h || '|' || x.i), 1, 1)) - 1) % 2 = 0
         |             THEN x.xq ELSE -x.xq END AS v
         |        FROM x, generate_series(0, 7) h(h)),
         |pd AS (SELECT vec_id, h, sum(v) AS dot FROM sgn GROUP BY 1, 2),
         |b AS (SELECT vec_id,
         |        CAST(sum(CASE WHEN dot > 0 THEN CAST(1 AS BIGINT) << h ELSE 0 END) AS BIGINT) AS bucket
         |      FROM pd GROUP BY 1),
         |base AS (SELECT e.vec_id, e.embedding, b.bucket FROM e JOIN b USING (vec_id)),
         |pairs AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${dotQ("q.embedding", "c.embedding")} AS dot_q
         |  FROM base q JOIN base c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 50)
         |SELECT query_id, neighbor_id, dot_q,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |       ORDER BY dot_q DESC, neighbor_id) AS INT) AS rank
         |FROM pairs QUALIFY rank <= 3
         |ORDER BY query_id, rank""".stripMargin,
    "q_ann_ivf" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000),
         |cent AS (SELECT row_number() OVER (ORDER BY vec_id) AS cidx, embedding
         |         FROM (SELECT * FROM e ORDER BY vec_id LIMIT 16)),
         |cd AS (SELECT v.vec_id, c.cidx,
         |         ${dotQ("v.embedding", "c.embedding")} AS dot
         |       FROM e v, cent c),
         |asgn AS (SELECT vec_id, cidx FROM (
         |           SELECT vec_id, cidx,
         |             row_number() OVER (PARTITION BY vec_id
         |                  ORDER BY dot DESC, cidx) AS rn
         |           FROM cd) WHERE rn = 1),
         |probe AS (SELECT vec_id, cidx FROM (
         |           SELECT vec_id, cidx,
         |             row_number() OVER (PARTITION BY vec_id
         |                  ORDER BY dot DESC, cidx) AS rn
         |           FROM cd WHERE vec_id < 50) WHERE rn <= 2),
         |pairs AS (
         |  SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
         |    ${dotQ("q.embedding", "n.embedding")} AS dot_q
         |  FROM probe p
         |  JOIN asgn a ON a.cidx = p.cidx AND a.vec_id <> p.vec_id
         |  JOIN e q ON q.vec_id = p.vec_id
         |  JOIN e n ON n.vec_id = a.vec_id)
         |SELECT query_id, neighbor_id, dot_q,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |       ORDER BY dot_q DESC, neighbor_id) AS INT) AS rank
         |FROM pairs QUALIFY rank <= 3
         |ORDER BY query_id, rank""".stripMargin,
    "q_ann_pq" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000),
        |x AS (SELECT vec_id, u.i AS i, CAST((u.i - 1) // 16 AS INT) AS j,
        |        CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 1000) AS BIGINT) AS xq
        |      FROM e, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) u),
        |cwid AS (SELECT row_number() OVER (ORDER BY vec_id) AS cidx, vec_id
        |         FROM (SELECT vec_id FROM e ORDER BY vec_id LIMIT 16)),
        |cw AS (SELECT w.cidx, x.j, x.i, x.xq AS cq
        |       FROM cwid w JOIN x ON x.vec_id = w.vec_id),
        |d2 AS (SELECT v.vec_id, v.j, c.cidx,
        |         CAST(sum((v.xq - c.cq) * (v.xq - c.cq)) AS BIGINT) AS d2
        |       FROM x v JOIN cw c ON c.i = v.i
        |       GROUP BY 1, 2, 3),
        |enc AS (SELECT vec_id, j, cidx AS code FROM (
        |          SELECT vec_id, j, cidx,
        |            row_number() OVER (PARTITION BY vec_id, j
        |                 ORDER BY d2, cidx) AS rn
        |          FROM d2) WHERE rn = 1),
        |score AS (SELECT qd.vec_id AS query_id, v.vec_id AS neighbor_id,
        |            CAST(sum(qd.d2) AS BIGINT) AS adist
        |          FROM enc v JOIN d2 qd ON qd.j = v.j AND qd.cidx = v.code
        |          WHERE qd.vec_id < 50 AND qd.vec_id <> v.vec_id
        |          GROUP BY 1, 2)
        |SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |       ORDER BY adist, neighbor_id) AS INT) AS rank,
        |  neighbor_id, adist
        |FROM score QUALIFY rank <= 3
        |ORDER BY query_id, rank""".stripMargin,
    "q_ann_ivfpq" -> ivfPqOracle,
    "q_ann_recall" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000),
         |ex AS (SELECT query_id, neighbor_id FROM (
         |        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |          row_number() OVER (PARTITION BY q.vec_id
         |               ORDER BY ${dotQ("q.embedding", "c.embedding")} DESC,
         |                        c.vec_id) AS rn
         |        FROM e q JOIN e c ON c.vec_id <> q.vec_id
         |        WHERE q.vec_id < 50) WHERE rn <= 3),
         |cent AS (SELECT row_number() OVER (ORDER BY vec_id) AS cidx, embedding
         |         FROM (SELECT * FROM e ORDER BY vec_id LIMIT 16)),
         |cd AS (SELECT v.vec_id, c.cidx,
         |         ${dotQ("v.embedding", "c.embedding")} AS dot
         |       FROM e v, cent c),
         |asgn AS (SELECT vec_id, cidx FROM (
         |           SELECT vec_id, cidx,
         |             row_number() OVER (PARTITION BY vec_id
         |                  ORDER BY dot DESC, cidx) AS rn
         |           FROM cd) WHERE rn = 1),
         |probe AS (SELECT vec_id, cidx FROM (
         |           SELECT vec_id, cidx,
         |             row_number() OVER (PARTITION BY vec_id
         |                  ORDER BY dot DESC, cidx) AS rn
         |           FROM cd WHERE vec_id < 50) WHERE rn <= 2),
         |appx AS (SELECT query_id, neighbor_id FROM (
         |          SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
         |            row_number() OVER (PARTITION BY p.vec_id
         |                 ORDER BY ${dotQ("q.embedding", "n.embedding")} DESC,
         |                          a.vec_id) AS rn
         |          FROM probe p
         |          JOIN asgn a ON a.cidx = p.cidx AND a.vec_id <> p.vec_id
         |          JOIN e q ON q.vec_id = p.vec_id
         |          JOIN e n ON n.vec_id = a.vec_id) WHERE rn <= 3)
         |SELECT ex.query_id,
         |  CAST(sum(CASE WHEN appx.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |       AS BIGINT) AS hits,
         |  CAST(count(*) AS BIGINT) AS exact_k,
         |  sum(CASE WHEN appx.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    / count(*) AS recall
         |FROM ex LEFT JOIN appx ON appx.query_id = ex.query_id
         |  AND appx.neighbor_id = ex.neighbor_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_embed_neardup" ->
      s"""WITH base AS (SELECT * FROM embeddings WHERE vec_id < 2000),
         |corpus AS (
         |  SELECT vec_id, embedding, label FROM base
         |  UNION ALL
         |  SELECT vec_id + 100000,
         |         list_transform(embedding, v -> CAST(CAST(v AS DOUBLE) * 1.1 AS FLOAT)),
         |         label
         |  FROM base WHERE vec_id % 10 = 0),
         |side AS (
         |  SELECT vec_id, embedding, label,
         |    ${dotQ("embedding", "embedding")} AS n2
         |  FROM corpus),
         |scored AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.n2 AS n2_a, b.n2 AS n2_b,
         |    ${dotQ("a.embedding", "b.embedding")} AS dot_q
         |  FROM side a JOIN side b ON a.label = b.label AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, dot_q FROM scored
         |WHERE dot_q > 0
         |  AND 100 * CAST(dot_q AS HUGEINT) * CAST(dot_q AS HUGEINT)
         |      >= 81 * CAST(n2_a AS HUGEINT) * CAST(n2_b AS HUGEINT)
         |ORDER BY 1, 2""".stripMargin,
    "q_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, substr(text, i, 1) AS c
        |  FROM documents, LATERAL (SELECT unnest(generate_series(1, len(text))) AS i) u
        |  WHERE text IS NOT NULL AND len(text) > 0),
        |cen AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),
        |tot AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS L FROM cen GROUP BY 1)
        |SELECT cen.doc_id, L AS n_chars,
        |  CAST(sum(n * CAST(floor(-1000.0 * ln(CAST(n AS DOUBLE) / L)) AS BIGINT)) AS BIGINT) AS total_mnats,
        |  CAST(sum(n * CAST(floor(-1000.0 * ln(CAST(n AS DOUBLE) / L)) AS BIGINT)) AS BIGINT) / 1000.0 / L AS entropy_nats
        |FROM cen JOIN tot USING (doc_id)
        |GROUP BY cen.doc_id, L ORDER BY 1""".stripMargin,
    "q_text_stats" ->
      """SELECT doc_id, n_len, n_tokens, n_bpeish, n_alpha, n_digit,
        |  CAST(n_alpha AS DOUBLE) / NULLIF(n_len, 0) AS alpha_ratio,
        |  CAST(n_len AS DOUBLE) / NULLIF(n_tokens, 0) AS avg_token_len,
        |  CAST(n_tokens >= 10 AS INT) + CAST(n_tokens <= 1000 AS INT)
        |    + CAST(CAST(n_len AS DOUBLE)/NULLIF(n_tokens, 0) >= 3
        |            AND CAST(n_len AS DOUBLE)/NULLIF(n_tokens, 0) <= 12 AS INT)
        |    + CAST(CAST(n_alpha AS DOUBLE)/NULLIF(n_len, 0) > 0.7 AS INT) AS quality_score
        |FROM (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_len,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) AS BIGINT) AS n_bpeish,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
        |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q_quality_clf" ->
      """WITH tr AS (SELECT doc_id, text,
        |         CAST(list_contains(list_distinct(
        |           regexp_extract_all(lower(text), '[a-z]+')), 'vector') AS INT) AS y
        |       FROM documents WHERE doc_id % 3 = 0),
        |base AS (SELECT (1000 * (sum(y) + 1)) // (count(*) + 2) AS w0 FROM tr),
        |ttok AS (SELECT tr.doc_id, tr.y, t.token
        |         FROM tr, LATERAL (SELECT unnest(list_distinct(
        |           regexp_extract_all(lower(tr.text), '[a-z]+'))) AS token) t),
        |stats AS (SELECT token, sum(y) AS n_good, sum(1 - y) AS n_bad
        |          FROM ttok GROUP BY 1),
        |vocab AS (SELECT token,
        |            (1000 * (n_good + 1)) // (n_good + n_bad + 2) AS w
        |          FROM (SELECT * FROM stats WHERE n_good + n_bad >= 5
        |                ORDER BY n_good + n_bad DESC, token LIMIT 512)),
        |atok AS (SELECT d.doc_id, t.token
        |         FROM documents d, LATERAL (SELECT unnest(list_distinct(
        |           regexp_extract_all(lower(d.text), '[a-z]+'))) AS token) t),
        |sc AS (SELECT a.doc_id, count(*) AS h,
        |         (1000 * sum(v.w - (SELECT w0 FROM base))) // count(*) AS s
        |       FROM atok a JOIN vocab v USING (token) GROUP BY 1),
        |thr AS (SELECT (sum(CASE WHEN y = 1 THEN coalesce(s, 0) END)
        |                  // sum(CASE WHEN y = 1 THEN 1 END)
        |              + sum(CASE WHEN y = 0 THEN coalesce(s, 0) END)
        |                  // sum(CASE WHEN y = 0 THEN 1 END)) // 2 AS t
        |        FROM tr LEFT JOIN sc USING (doc_id))
        |SELECT d.doc_id,
        |  CAST(coalesce(sc.h, 0) AS BIGINT) AS n_hits,
        |  CAST(coalesce(sc.s, 0) AS BIGINT) AS score,
        |  CAST(coalesce(sc.s, 0) > (SELECT t FROM thr) AS INT) AS pred_good
        |FROM documents d LEFT JOIN sc USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_lang_id" ->
      """SELECT doc_id, lang, en_n, fr_n, es_n, de_n,
        |  CASE WHEN en_n >= fr_n AND en_n >= es_n AND en_n >= de_n THEN 'en'
        |       WHEN fr_n >= es_n AND fr_n >= de_n THEN 'fr'
        |       WHEN es_n >= de_n THEN 'es' ELSE 'de' END AS pred_lang
        |FROM (
        |  SELECT doc_id, lang,
        |    CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|is)\b')) AS BIGINT) AS en_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(le|la|et|les|des)\b')) AS BIGINT) AS fr_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(el|los|las|y|que)\b')) AS BIGINT) AS es_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist)\b')) AS BIGINT) AS de_n
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q_simhash_neardup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' near duplicate tail'
        |  FROM documents WHERE doc_id % 5 = 0),
        |tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok FROM corpus),
        |bits AS (SELECT doc_id, j.j,
        |  ((strpos('0123456789abcdef', substr(substr(md5(tok),1,16), 1 + CAST(floor(j.j/4) AS INT), 1)) - 1)
        |    >> (3 - j.j % 4)) & 1 AS bit
        |  FROM tok, generate_series(0, 63) j(j)),
        |agg AS (SELECT doc_id, j, sum(bit) AS ones, count(*) AS n FROM bits GROUP BY 1, 2),
        |sig AS (SELECT doc_id, bit_or(CASE WHEN 2*ones > n THEN
        |          CASE WHEN j = 63 THEN (-9223372036854775807-1)::BIGINT
        |               ELSE 1::BIGINT << CAST(j AS INT) END
        |        ELSE 0::BIGINT END) AS sig FROM agg GROUP BY 1),
        |bands AS (SELECT doc_id, sig, b.b, (sig >> (16*b.b)) & 65535 AS bv
        |          FROM sig, generate_series(0, 3) b(b)),
        |ok AS (SELECT b, bv FROM bands GROUP BY 1, 2 HAVING count(*) <= 1000),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
        |                a.sig AS sig_a, b2.sig AS sig_b
        |  FROM bands a JOIN ok ON ok.b = a.b AND ok.bv = a.bv
        |  JOIN bands b2 ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id)
        |SELECT id_a, id_b, CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
        |FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 3 ORDER BY 1, 2""".stripMargin,
    "q_split_assign" ->
      """SELECT doc_id, bucket,
        |  CASE WHEN bucket < 8000 THEN 'train'
        |       WHEN bucket < 9000 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8)) AS BIGINT)
        |          % 10000 AS bucket
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q_repetition" ->
      """WITH arr AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws
        |  FROM documents WHERE text IS NOT NULL AND len(regexp_extract_all(lower(text), '\S+')) > 1),
        |w AS (SELECT doc_id, unnest(ws) AS tok FROM arr),
        |g AS (SELECT doc_id, tok, count(*) AS c FROM w GROUP BY 1, 2),
        |wc AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, count(*) AS nd,
        |              CAST(max(c) AS BIGINT) AS top
        |       FROM g GROUP BY 1),
        |g2 AS (SELECT doc_id, ws[u.i] || ' ' || ws[u.i+1] AS gram
        |       FROM arr, LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i) u),
        |gc AS (SELECT doc_id, count(*) AS n2, count(DISTINCT gram) AS nd2 FROM g2 GROUP BY 1)
        |SELECT wc.doc_id, n AS n_words, nd AS n_distinct_words,
        |  1.0 - CAST(nd AS DOUBLE) / n AS dup_word_ratio,
        |  CAST(top AS DOUBLE) / n AS top_word_ratio,
        |  n2 AS n_2grams,
        |  1.0 - CAST(nd2 AS DOUBLE) / n2 AS dup_2gram_ratio
        |FROM wc JOIN gc ON gc.doc_id = wc.doc_id
        |ORDER BY wc.doc_id""".stripMargin,
    "q_corpus_stats" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) AS BIGINT) AS n_bpeish,
        |    CAST(length(text) AS BIGINT) AS n_len,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
        |    CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|is)\b')) AS BIGINT) AS en_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(le|la|et|les|des)\b')) AS BIGINT) AS fr_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(el|los|las|y|que)\b')) AS BIGINT) AS es_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist)\b')) AS BIGINT) AS de_n
        |  FROM documents),
        |q AS (
        |  SELECT *,
        |    CAST(n_tokens >= 10 AS INT) + CAST(n_tokens <= 1000 AS INT)
        |      + CAST(CAST(n_len AS DOUBLE)/NULLIF(n_tokens, 0) >= 3
        |              AND CAST(n_len AS DOUBLE)/NULLIF(n_tokens, 0) <= 12 AS INT)
        |      + CAST(CAST(n_alpha AS DOUBLE)/NULLIF(n_len, 0) > 0.7 AS INT) AS quality_score,
        |    CASE WHEN en_n >= fr_n AND en_n >= es_n AND en_n >= de_n THEN 'en'
        |         WHEN fr_n >= es_n AND fr_n >= de_n THEN 'fr'
        |         WHEN es_n >= de_n THEN 'es' ELSE 'de' END AS pred_lang
        |  FROM s)
        |SELECT pred_lang, quality_score, count(*) AS n_docs,
        |  quantile_cont(n_tokens, 0.5) AS p50_tokens,
        |  quantile_cont(n_tokens, 0.9) AS p90_tokens,
        |  quantile_cont(n_tokens, 0.99) AS p99_tokens,
        |  avg(n_bpeish) AS avg_bpeish
        |FROM q GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_pii_scrub" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    text || ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com ip 10.0.'
        |      || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR)
        |      || ' tel 555-123-4567' AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS scrubbed
        |FROM d ORDER BY doc_id""".stripMargin,
    "q_fingerprint" ->
      """WITH t AS (SELECT doc_id, substr(lower(text), 1, 2048) AS txt FROM documents),
        |sh AS (SELECT DISTINCT doc_id, substr(txt, u.i, 12) AS s
        |       FROM t, LATERAL (SELECT unnest(generate_series(1, greatest(length(txt)-11, 1))) AS i) u)
        |SELECT doc_id, min(md5(s)) AS fingerprint, count(*) AS n_shingles
        |FROM sh GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sql_surface" ->
      """WITH t AS (SELECT doc_id, substr(lower(text), 1, 2048) AS txt
        |           FROM documents WHERE text IS NOT NULL),
        |sh AS (SELECT DISTINCT doc_id, substr(txt, u.i, 12) AS s
        |       FROM t, LATERAL (SELECT unnest(generate_series(1, greatest(length(txt)-11, 1))) AS i) u),
        |fp AS (SELECT doc_id, min(md5(s)) AS fingerprint, count(*) AS n_shingles
        |       FROM sh GROUP BY 1),
        |tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
        |        FROM documents WHERE text IS NOT NULL),
        |bits AS (SELECT doc_id, j.j,
        |  ((strpos('0123456789abcdef', substr(substr(md5(tok),1,16), 1 + CAST(floor(j.j/4) AS INT), 1)) - 1)
        |    >> (3 - j.j % 4)) & 1 AS bit
        |  FROM tok, generate_series(0, 63) j(j)),
        |agg AS (SELECT doc_id, j, sum(bit) AS ones, count(*) AS n FROM bits GROUP BY 1, 2),
        |sig AS (SELECT doc_id, bit_or(CASE WHEN 2*ones > n THEN
        |          CASE WHEN j = 63 THEN (-9223372036854775807-1)::BIGINT
        |               ELSE 1::BIGINT << CAST(j AS INT) END
        |        ELSE 0::BIGINT END) AS simhash64 FROM agg GROUP BY 1),
        |ts AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_tok_count FROM (
        |         SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2)
        |       GROUP BY 1)
        |SELECT d.doc_id, fp.fingerprint, fp.n_shingles,
        |  CAST(len(regexp_extract_all(d.text, '\S+')) AS BIGINT) AS n_tokens,
        |  sig.simhash64,
        |  CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':42'), 1, 8)) AS BIGINT)
        |    % 10000 AS bucket,
        |  ts.top_tok_count,
        |  CASE WHEN length(d.source) > 4
        |    THEN regexp_replace(substr(d.source, 1, length(d.source)-4), '[a-zA-Z0-9]', 'X', 'g')
        |         || substr(d.source, length(d.source)-3, 4)
        |    ELSE regexp_replace(d.source, '[a-zA-Z0-9]', 'X', 'g') END AS source_masked
        |FROM documents d
        |JOIN fp ON fp.doc_id = d.doc_id
        |JOIN sig ON sig.doc_id = d.doc_id
        |JOIN ts ON ts.doc_id = d.doc_id
        |WHERE d.text IS NOT NULL
        |ORDER BY d.doc_id""".stripMargin,
    "q_simhash" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok FROM documents),
        |bits AS (
        |  SELECT doc_id, j.j,
        |    ((strpos('0123456789abcdef',
        |        substr(substr(md5(tok), 1, 4), 1 + CAST(floor(j.j/4) AS INT), 1)) - 1)
        |      >> (3 - j.j % 4)) & 1 AS bit
        |  FROM tok, generate_series(0, 15) j(j)),
        |agg AS (SELECT doc_id, j, sum(bit) AS ones, count(*) AS n FROM bits GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN 2*ones > n THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS simhash
        |FROM agg GROUP BY 1 ORDER BY 1""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_filter_in" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_returnflag IN ('R') AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_filter_date" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        |  AND (o_orderstatus = 'F' OR o_totalprice < 1000)
        |ORDER BY o_orderkey""".stripMargin,
    "q_s1_range_scan" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_orderkey BETWEEN 1000 AND 3000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_p7_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin,
    "q_t1_mask_default" ->
      """SELECT c_custkey,
        |  regexp_replace(c_name, '[a-zA-Z0-9]', 'X', 'g') AS name_masked,
        |  c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_t2_mask_partial" ->
      """SELECT c_custkey,
        |  CASE WHEN length(c_name) > 4
        |    THEN regexp_replace(substr(c_name, 1, length(c_name)-4), '[a-zA-Z0-9]', 'X', 'g')
        |         || substr(c_name, length(c_name)-3, 4)
        |    ELSE regexp_replace(c_name, '[a-zA-Z0-9]', 'X', 'g') END AS name_masked
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_t3_mask_hash" ->
      """SELECT c_custkey, substr(md5(c_name), 1, 24) AS name_hex
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_x1_split_bounds" ->
      """SELECT rn // 1000 AS task_seq,
        |  min(o_orderkey) AS id_first, max(o_orderkey) AS id_last,
        |  count(*) AS source_count
        |FROM (SELECT o_orderkey,
        |        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn
        |      FROM orders)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_a2_count" ->
      "SELECT count(*) AS cnt FROM lineitem WHERE l_returnflag = 'R'",
    "q_a4_sample_group" ->
      """SELECT l_returnflag, count(*) AS total,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem WHERE l_orderkey % 10 = 3
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_j1_compare" ->
      """WITH src AS (
        |  SELECT o_orderkey AS k, o_custkey, o_orderstatus, o_totalprice FROM orders),
        |kept AS (SELECT * FROM src WHERE k % 97 <> 0),
        |tgt AS (
        |  SELECT k, o_custkey, o_orderstatus,
        |    CASE WHEN k % 101 = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice
        |  FROM kept
        |  UNION ALL
        |  SELECT k + 10000000, o_custkey, o_orderstatus, o_totalprice
        |  FROM src WHERE k % 97 = 0),
        |d AS (
        |  SELECT CASE WHEN s.k IS NULL THEN 'extra'
        |              WHEN t.k IS NULL THEN 'missing'
        |              WHEN s.o_custkey = t.o_custkey
        |               AND s.o_orderstatus = t.o_orderstatus
        |               AND s.o_totalprice = t.o_totalprice THEN 'match'
        |              ELSE 'mismatch' END AS status
        |  FROM src s FULL OUTER JOIN tgt t ON s.k = t.k)
        |SELECT status, count(*) AS n FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    // same diff semantics as q_j1_compare on a sparse-divergence fixture
    // — the bucketed path is a pure execution-plan optimization
    "q_j1_bucketed" ->
      """WITH src AS (
        |  SELECT o_orderkey AS k, o_custkey, o_orderstatus, o_totalprice FROM orders),
        |kept AS (SELECT * FROM src WHERE k % 9941 <> 0),
        |tgt AS (
        |  SELECT k, o_custkey, o_orderstatus,
        |    CASE WHEN k % 9973 = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice
        |  FROM kept
        |  UNION ALL
        |  SELECT k + 10000000, o_custkey, o_orderstatus, o_totalprice
        |  FROM src WHERE k % 9941 = 0),
        |d AS (
        |  SELECT CASE WHEN s.k IS NULL THEN 'extra'
        |              WHEN t.k IS NULL THEN 'missing'
        |              WHEN s.o_custkey = t.o_custkey
        |               AND s.o_orderstatus = t.o_orderstatus
        |               AND s.o_totalprice = t.o_totalprice THEN 'match'
        |              ELSE 'mismatch' END AS status
        |  FROM src s FULL OUTER JOIN tgt t ON s.k = t.k)
        |SELECT status, count(*) AS n FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_j2_semi" ->
      """SELECT o_orderkey FROM orders
        |WHERE o_orderkey <= 2000 AND o_orderkey % 2 = 0
        |ORDER BY o_orderkey""".stripMargin,
    "q_w1_tumbling" ->
      """SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % 3600000000) AS window_start,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_w3_sliding" ->
      """SELECT make_timestamp(
        |    (epoch_us(ts) // 900000000 - j.j) * 900000000) AS window_start,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events, generate_series(0, 3) j(j)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_w2_sessions" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        |g AS (
        |  SELECT user_id, ts_us,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |           OR ts_us - lag(ts_us) OVER w > 3600000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
        |s AS (
        |  SELECT user_id, ts_us,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g)
        |SELECT user_id, min(ts_us) AS session_start_us,
        |  max(ts_us) AS session_end_us, count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,
    "q_t7_stringify" ->
      """SELECT n_nationkey,
        |  to_json(struct_pack(
        |    n_nationkey := n_nationkey, n_name := n_name,
        |    n_regionkey := n_regionkey)) AS doc
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_skew_join" ->
      """SELECT o_orderkey, o_custkey AS custkey, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_skew_agg" ->
      """SELECT c_mktsegment,
        |  md5(string_agg(CAST(c_custkey AS VARCHAR), ',' ORDER BY c_custkey)) AS keys_md5,
        |  count(*) AS n
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_bson_order" ->
      """WITH ids AS (
        |  SELECT CASE WHEN c_custkey % 2 = 0 THEN CAST(c_custkey AS VARCHAR)
        |              ELSE '"' || c_name || '"' END AS id
        |  FROM customer)
        |SELECT id, CAST(row_number() OVER (ORDER BY
        |    CASE WHEN id LIKE '"%' THEN 2 ELSE 1 END,
        |    TRY_CAST(id AS DECIMAL(38,10)),
        |    CASE WHEN id LIKE '"%' THEN substr(id, 2, length(id)-2) ELSE id END
        |  ) AS INT) AS rank
        |FROM ids ORDER BY id""".stripMargin,
    "q_t4_mask_nested" ->
      """SELECT c_custkey,
        |  to_json(struct_pack(
        |    name := c_name,
        |    info := struct_pack(
        |      segment := c_mktsegment,
        |      contact := regexp_replace(c_name, '[a-zA-Z0-9]', 'X', 'g')))) AS doc_json,
        |  to_json([
        |    struct_pack(alias := regexp_replace(c_name, '[a-zA-Z0-9]', 'X', 'g')),
        |    struct_pack(alias := regexp_replace(c_mktsegment, '[a-zA-Z0-9]', 'X', 'g'))
        |  ]) AS aliases_json
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // oracle recomputes the extracted fields from the BASE columns —
    // masked where the shape has the path, NULL where it doesn't —
    // so the pin covers traversal + no-op + sibling preservation
    // without comparing JSON serialization bytes
    "q_mask_dynamic" ->
      """SELECT c_custkey,
        |  CASE WHEN c_custkey % 3 = 0
        |       THEN regexp_replace(c_name, '[a-zA-Z0-9]', 'X', 'g') END AS ssn_masked,
        |  CASE WHEN c_custkey % 3 IN (0, 1) THEN c_name END AS name_kept,
        |  CASE WHEN c_custkey % 3 = 2
        |       THEN regexp_replace(c_name, '[a-zA-Z0-9]', 'X', 'g') END AS acct0_masked,
        |  CASE WHEN c_custkey % 3 = 2
        |       THEN regexp_replace(c_mktsegment, '[a-zA-Z0-9]', 'X', 'g') END AS acct1_masked,
        |  c_mktsegment AS seg_kept
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_convert" ->
      """SELECT o_orderkey,
        |  CASE WHEN substr(o_orderpriority, 1, 1) = trim(substr(o_orderpriority, 1, 1))
        |        AND substr(o_orderpriority, 1, 1) <> ''
        |       THEN COALESCE(TRY_CAST(substr(o_orderpriority, 1, 1) AS DOUBLE), 'NaN'::DOUBLE)
        |       ELSE 'NaN'::DOUBLE END AS f_pri,
        |  isnan(CASE WHEN o_orderpriority = trim(o_orderpriority) AND o_orderpriority <> ''
        |       THEN COALESCE(TRY_CAST(o_orderpriority AS DOUBLE), 'NaN'::DOUBLE)
        |       ELSE 'NaN'::DOUBLE END) AS bad_is_nan,
        |  COALESCE(CAST(trunc(TRY_CAST(CAST(o_orderkey AS VARCHAR) AS DOUBLE)) AS BIGINT), 0) AS key_back,
        |  regexp_replace('mongodb://user' || CAST(o_custkey AS VARCHAR) ||
        |    ':secret@cluster0.example.net:27017/admin',
        |    '://.*@', '://XXX:xxxxxx@') AS uri_redacted
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_t10_stamp" ->
      """SELECT event_id,
        |  strftime(make_timestamp(epoch_us(ts)), '%y%m%d.%H%M%S') || '.' ||
        |  lpad(CAST((epoch_us(ts) // 1000) % 1000 AS VARCHAR), 3, '0') AS stamp
        |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin,
    "q_mm_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_hash,
        |  upper(hex(encode(substring(text, 1, 4)))) AS magic_hex,
        |  CAST(ceil(CAST(octet_length(encode(text)) AS DOUBLE) / 256) AS BIGINT) AS n_chunks
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_mm_binary_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 300000, text FROM documents WHERE doc_id % 9 = 0)
        |SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS dup_count
        |FROM corpus GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_mm_chunk_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 300000, text FROM documents WHERE doc_id % 9 = 0),
        |ch AS (
        |  SELECT doc_id, md5(substring(text, u.i, 256)) AS chunk_md5
        |  FROM corpus, LATERAL (SELECT unnest(generate_series(
        |    1, greatest(length(text), 1), 256)) AS i) u)
        |SELECT chunk_md5, count(*) AS n_refs, min(doc_id) AS first_doc
        |FROM ch GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin,
    // all-ASCII fixture: the varchar arithmetic below computes the same
    // bytes the Spark side hashes as binary (same trick as q_mm_*)
    "q_mm_cdc" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |corpus AS (
        |  SELECT doc_id, text FROM base
        |  UNION ALL
        |  SELECT doc_id + 300000, 'SHIFT: ' || text FROM base WHERE doc_id % 9 = 0),
        |lens AS (SELECT doc_id, text, length(text) AS len FROM corpus WHERE length(text) > 0),
        |bnd AS (
        |  SELECT doc_id, u.i AS b FROM lens,
        |    LATERAL (SELECT unnest(generate_series(8, len)) AS i) u
        |  WHERE substr(md5(substring(text, u.i - 7, 8)), 1, 1) = '0'
        |  UNION
        |  SELECT doc_id, len FROM lens),
        |cuts AS (
        |  SELECT doc_id, b, lag(b, 1, 0) OVER (PARTITION BY doc_id ORDER BY b) AS lo
        |  FROM bnd),
        |chunks AS (
        |  SELECT c.doc_id, md5(substring(l.text, c.lo + 1, c.b - c.lo)) AS chunk_md5,
        |         c.b - c.lo AS clen
        |  FROM cuts c JOIN lens l USING (doc_id))
        |SELECT chunk_md5, count(*) AS n_refs, min(doc_id) AS first_doc,
        |  CAST(min(clen) AS BIGINT) AS chunk_len
        |FROM chunks GROUP BY 1 HAVING count(*) > 1 ORDER BY chunk_md5""".stripMargin,
    "q_mm_frames" ->
      """SELECT doc_id, CAST((u.i-1)//128 AS BIGINT) AS frame_idx,
        |  md5(substring(text, u.i, 128)) AS frame_md5,
        |  CAST(length(substring(text, u.i, 128)) AS BIGINT) AS frame_bytes
        |FROM documents, LATERAL (SELECT unnest(generate_series(
        |  1, greatest(length(text), 1), 128)) AS i) u
        |WHERE text IS NOT NULL AND ((u.i-1)//128) % 3 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "q_mm_resize" ->
      """WITH m AS (SELECT doc_id,
        |  CAST(('0x' || substr(md5(text), 1, 4)) AS BIGINT) % 4096 + 1 AS width,
        |  CAST(('0x' || substr(md5(text), 5, 4)) AS BIGINT) % 4096 + 1 AS height
        |  FROM documents)
        |SELECT doc_id, width, height,
        |  CASE WHEN greatest(width, height) <= 512 THEN width
        |       WHEN width >= height THEN 512
        |       ELSE greatest(1, CAST(floor(least(width, height) * 512 / greatest(width, height)) AS BIGINT)) END AS target_width,
        |  CASE WHEN greatest(width, height) <= 512 THEN height
        |       WHEN height > width THEN 512
        |       ELSE greatest(1, CAST(floor(least(width, height) * 512 / greatest(width, height)) AS BIGINT)) END AS target_height
        |FROM m ORDER BY doc_id""".stripMargin,
    // the engine DECODES real PNG bytes (javax.imageio) generated from
    // this id → (w, h) rule; the oracle recomputes the rule — equality
    // proves the header parse read the actual image
    "q_mm_decode_real" ->
      """SELECT doc_id,
        |  16 + (doc_id * 7) % 97 AS width,
        |  16 + (doc_id * 11) % 83 AS height,
        |  'png' AS format, true AS decode_ok
        |FROM documents WHERE doc_id < 300 ORDER BY doc_id""".stripMargin,
    // real pixel resize: out_* comes from RE-DECODING the engine's
    // resized PNGs and must land exactly on the arithmetic target box
    "q_mm_resize_real" ->
      """WITH src AS (
        |  SELECT doc_id,
        |    16 + (doc_id * 7) % 97 AS width,
        |    16 + (doc_id * 11) % 83 AS height
        |  FROM documents WHERE doc_id < 300),
        |t AS (
        |  SELECT doc_id, width, height,
        |    CASE WHEN greatest(width, height) <= 64 THEN width
        |         WHEN width >= height THEN 64
        |         ELSE greatest(1, (least(width, height) * 64) // greatest(width, height)) END AS target_width,
        |    CASE WHEN greatest(width, height) <= 64 THEN height
        |         WHEN height > width THEN 64
        |         ELSE greatest(1, (least(width, height) * 64) // greatest(width, height)) END AS target_height
        |  FROM src)
        |SELECT doc_id, width, height, target_width, target_height,
        |  target_width AS out_width, target_height AS out_height
        |FROM t ORDER BY doc_id""".stripMargin,
    // the engine chunk-walks real WAV bytes / box-walks real MP4 bytes
    // generated from these id → metadata rules; the oracle recomputes
    // the rules — equality proves the container parses read the bytes
    // (wav duration = samples*1000/rate, floor — both sides integer)
    "q_mm_av_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'mp4' END AS container,
        |  CASE WHEN doc_id % 2 = 0
        |    THEN ((400 + (doc_id * 17) % 1200) * 1000)
        |           // (8000 + ((doc_id * 13) % 32) * 250)
        |    ELSE 1000 + (doc_id * 19) % 60000 END AS duration_ms,
        |  CASE WHEN doc_id % 2 = 0
        |    THEN 8000 + ((doc_id * 13) % 32) * 250 ELSE 0 END AS sample_rate,
        |  CASE WHEN doc_id % 2 = 0
        |    THEN 1 + (doc_id % 4) // 2 ELSE 0 END AS channels,
        |  CASE WHEN doc_id % 2 = 0
        |    THEN 0 ELSE 160 + (doc_id * 7) % 481 END AS width,
        |  CASE WHEN doc_id % 2 = 0
        |    THEN 0 ELSE 90 + (doc_id * 11) % 271 END AS height,
        |  true AS decode_ok
        |FROM documents WHERE doc_id < 400 ORDER BY doc_id""".stripMargin,
    "q_mm_features" ->
      """WITH v AS (
        |  SELECT doc_id, CAST(floor(
        |    ((CAST(('0x' || substr(md5(text), 4*j.j+1, 4)) AS BIGINT) % 2001 - 1000)
        |      / 1000.0) * 1000) AS BIGINT) AS q
        |  FROM documents, generate_series(0, 7) j(j))
        |SELECT doc_id, CAST(sum(q*q) AS BIGINT) AS qnorm
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_k2_apply" ->
      """WITH src AS (
        |  SELECT o_orderkey AS k, o_custkey, o_orderstatus, o_totalprice FROM orders),
        |updated AS (
        |  SELECT k,
        |    CASE WHEN k % 11 = 0 THEN o_custkey + 1000000 ELSE o_custkey END AS custkey,
        |    CASE WHEN k % 3 = 0 THEN 'X' ELSE o_orderstatus END AS status,
        |    CASE WHEN k % 5 = 0 THEN o_totalprice + 10 ELSE o_totalprice END AS price
        |  FROM src WHERE k % 7 <> 0),
        |inserted AS (
        |  SELECT k + 100000000 AS k, o_custkey AS custkey, 'N' AS status,
        |    CAST(1.5 AS DOUBLE) AS price
        |  FROM src WHERE k % 10 = 0)
        |SELECT k, custkey, status, price FROM updated
        |UNION ALL SELECT k, custkey, status, price FROM inserted
        |ORDER BY k""".stripMargin,
    "q_funnel" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 200000, text FROM documents WHERE doc_id % 7 = 0),
        |k AS (SELECT doc_id,
        |        row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1 AS keep
        |      FROM corpus WHERE text IS NOT NULL),
        |s AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |    CAST(length(text) AS BIGINT) AS n_len,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
        |    CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|is)\b')) AS BIGINT) AS en_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(le|la|et|les|des)\b')) AS BIGINT) AS fr_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(el|los|las|y|que)\b')) AS BIGINT) AS es_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist)\b')) AS BIGINT) AS de_n
        |  FROM corpus WHERE text IS NOT NULL),
        |q AS (
        |  SELECT doc_id,
        |    CAST(n_tokens >= 10 AS INT) + CAST(n_tokens <= 1000 AS INT)
        |      + CAST(CAST(n_len AS DOUBLE)/NULLIF(n_tokens, 0) >= 3
        |              AND CAST(n_len AS DOUBLE)/NULLIF(n_tokens, 0) <= 12 AS INT)
        |      + CAST(CAST(n_alpha AS DOUBLE)/NULLIF(n_len, 0) > 0.7 AS INT) AS quality_score,
        |    CASE WHEN en_n >= fr_n AND en_n >= es_n AND en_n >= de_n THEN 'en'
        |         WHEN fr_n >= es_n AND fr_n >= de_n THEN 'fr'
        |         WHEN es_n >= de_n THEN 'es' ELSE 'de' END AS pred_lang
        |  FROM s),
        |j AS (
        |  SELECT k.keep,
        |    k.keep AND q.quality_score >= 3 AS qok,
        |    k.keep AND q.quality_score >= 3 AND q.pred_lang = 'en' AS lok,
        |    CAST(('0x' || substr(md5(CAST(k.doc_id AS VARCHAR) || ':42'), 1, 8)) AS BIGINT)
        |      % 10000 AS b
        |  FROM k JOIN q ON q.doc_id = k.doc_id)
        |SELECT count(*) AS n_total,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_after_dedup,
        |  CAST(sum(CASE WHEN qok THEN 1 ELSE 0 END) AS BIGINT) AS n_after_quality,
        |  CAST(sum(CASE WHEN lok THEN 1 ELSE 0 END) AS BIGINT) AS n_after_lang,
        |  CAST(sum(CASE WHEN lok AND b < 8000 THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        |  CAST(sum(CASE WHEN lok AND b >= 8000 AND b < 9000 THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
        |  CAST(sum(CASE WHEN lok AND b >= 9000 THEN 1 ELSE 0 END) AS BIGINT) AS n_test
        |FROM j""".stripMargin,
    "q_funnel_steps" ->
      """WITH e AS (
        |  SELECT user_id, event_type AS t, epoch_us(ts) AS ts_us FROM events),
        |s1 AS (SELECT user_id, min(ts_us) AS t1 FROM e WHERE t = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts_us) AS t2
        |       FROM e JOIN s1 ON s1.user_id = e.user_id
        |       WHERE e.t = 'click' AND e.ts_us > s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts_us) AS t3
        |       FROM e JOIN s2 ON s2.user_id = e.user_id
        |       WHERE e.t = 'purchase' AND e.ts_us > s2.t2 GROUP BY 1)
        |SELECT (SELECT count(DISTINCT user_id) FROM e) AS n_users,
        |  (SELECT count(*) FROM s1) AS n_step1,
        |  (SELECT count(*) FROM s2) AS n_step2,
        |  (SELECT count(*) FROM s3) AS n_step3""".stripMargin,
    "q_outliers" ->
      """WITH e AS (
        |  SELECT user_id, CAST(floor(value * 1000) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |st AS (
        |  SELECT user_id, count(*) AS n,
        |    CAST(sum(CAST(v AS DECIMAL(16,0))) AS DECIMAL(16,0)) AS s1,
        |    CAST(sum(CAST(v AS DECIMAL(10,0)) * CAST(v AS DECIMAL(10,0)))
        |         AS DECIMAL(25,0)) AS s2
        |  FROM e GROUP BY 1),
        |o AS (
        |  SELECT e.user_id, st.n,
        |    CASE WHEN CAST(CAST(e.v AS DECIMAL(10,0)) * CAST(st.n AS DECIMAL(7,0))
        |                     - st.s1 AS DECIMAL(18,0))
        |             * CAST(CAST(e.v AS DECIMAL(10,0)) * CAST(st.n AS DECIMAL(7,0))
        |                     - st.s1 AS DECIMAL(18,0))
        |           > CAST(4 AS DECIMAL(3,0)) *
        |             CAST(CAST(st.n AS DECIMAL(7,0)) * st.s2 - st.s1 * st.s1
        |                  AS DECIMAL(34,0))
        |         THEN 1 ELSE 0 END AS is_out
        |  FROM e JOIN st USING (user_id))
        |SELECT user_id, CAST(max(n) AS BIGINT) AS n_events,
        |  CAST(sum(is_out) AS BIGINT) AS n_outliers
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_g2_changelog" ->
      """WITH g AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 2000)),
        |rows AS (
        |  SELECT 'i' AS op, 'app.gen' AS ns,
        |         (1700000000 + i) * 4294967296 AS ts, NULL AS o FROM g
        |  UNION ALL
        |  SELECT 'u', 'app.gen', (1700002000 + i) * 4294967296,
        |         '{"diff":{"u":{"int64":' || CAST(i + 1 AS VARCHAR) || '}}}'
        |  FROM g WHERE i % 3 = 0
        |  UNION ALL
        |  SELECT 'u', 'app.gen', (1700004000 + i) * 4294967296,
        |         '{"$v":1,"$inc":{"seq":10}}' FROM g WHERE i % 5 = 0
        |  UNION ALL
        |  SELECT 'd', 'app.gen', (1700006000 + i) * 4294967296,
        |         '{"_id":"' || substr(md5('oid|' || CAST(i AS VARCHAR)), 1, 24) || '"}'
        |  FROM g WHERE i % 7 = 0
        |  UNION ALL
        |  SELECT 'c', 'app.$cmd', (1700008000 + i) * 4294967296,
        |         '{"applyOps":[{"op":"u","ns":"app.gen","o":{"diff":{"u":{"birth_year":1963}}},"o2":{"_id":"'
        |           || substr(md5('oid|' || CAST(i AS VARCHAR)), 1, 24)
        |           || '"}},{"op":"d","ns":"app.gen","o":{"_id":"'
        |           || substr(md5('oid|' || CAST(i + 1 AS VARCHAR)), 1, 24)
        |           || '"},"o2":{"_id":"'
        |           || substr(md5('oid|' || CAST(i + 1 AS VARCHAR)), 1, 24)
        |           || '"}}]}'
        |  FROM g WHERE i % 11 = 0 AND i < 1999
        |  UNION ALL
        |  SELECT 'i', 'local.junk', (1700010000 + i) * 4294967296, NULL
        |  FROM g WHERE i % 13 = 0
        |  UNION ALL
        |  SELECT 'n', '', (1700010000 + i) * 4294967296 + 1, NULL
        |  FROM g WHERE i % 13 = 0)
        |SELECT op, ns, count(*) AS n_ops,
        |  min(ts) AS min_ts, max(ts) AS max_ts,
        |  min(CASE WHEN op <> 'i' THEN o END) AS min_o,
        |  max(CASE WHEN op <> 'i' THEN o END) AS max_o
        |FROM rows GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_bm25" -> bm25Oracle,
    "q_bm25_staged" -> bm25Oracle,
    // append ≡ restage: the incremental index must score exactly like
    // a from-scratch stage over the full corpus
    "q_bm25_incr" -> bm25Oracle,
    "q_st_bm25" -> bm25Oracle,
    "q_cms_topk" ->
      """WITH counts AS (
        |  SELECT CAST(user_id AS BIGINT) AS key, count(*) AS n
        |  FROM events GROUP BY 1),
        |top AS (
        |  SELECT CAST(row_number() OVER (ORDER BY n DESC, key) AS BIGINT)
        |           AS rank, key, n
        |  FROM counts QUALIFY rank <= 10)
        |SELECT rank, key, n, TRUE AS cms_ok FROM top ORDER BY rank""".stripMargin,
    "q_hybrid_rrf" -> (
      s"""WITH tok AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS term
        |  FROM documents WHERE text IS NOT NULL),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |qs AS (SELECT CAST(query_id AS BIGINT) AS query_id, qtext
        |       FROM (VALUES (1, 'key table scan'),
        |        (2, 'fast merge batch window'), (3, 'customer order part'))
        |       v(query_id, qtext)),
        |qterms AS (
        |  SELECT DISTINCT query_id, unnest(regexp_extract_all(lower(qtext), '\\S+')) AS term
        |  FROM qs),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
        |stats AS (SELECT count(*) AS n,
        |            CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
        |dfreq AS (
        |  SELECT term, count(*) AS df FROM tf
        |  WHERE term IN (SELECT term FROM qterms) GROUP BY 1),
        |scored AS (
        |  SELECT q.query_id, t.doc_id,
        |    CAST(floor(
        |      CAST(floor(1000.0 * ln((CAST(s.n AS DOUBLE) - f.df + 0.5) / (f.df + 0.5) + 1.0)) AS BIGINT)
        |        * t.tf * 2.2 / (t.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl)) * 1000.0
        |    ) AS BIGINT) AS s_micro
        |  FROM tf t
        |  JOIN qterms q ON q.term = t.term
        |  JOIN dfreq f ON f.term = t.term
        |  JOIN dl d ON d.doc_id = t.doc_id, stats s),
        |bagg AS (
        |  SELECT query_id, doc_id, CAST(sum(s_micro) AS BIGINT) AS sc
        |  FROM scored GROUP BY 1, 2),
        |brank AS (
        |  SELECT query_id, doc_id AS item_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, doc_id) AS r
        |  FROM bagg QUALIFY r <= 20),
        |qe AS (SELECT vec_id AS query_id, embedding FROM embeddings
        |       WHERE vec_id IN (1, 2, 3)),
        |dpairs AS (
        |  SELECT q.query_id, c.vec_id AS item_id,
        |    ${dotQ("q.embedding", "c.embedding")} AS dot_q
        |  FROM qe q, embeddings c WHERE c.vec_id <> q.query_id),
        |drank AS (
        |  SELECT query_id, item_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY dot_q DESC, item_id) AS r
        |  FROM dpairs QUALIFY r <= 20),
        |contrib AS (
        |  SELECT query_id, item_id,
        |    CAST(floor(1000000.0 / (60 + r)) AS BIGINT) AS c FROM brank
        |  UNION ALL
        |  SELECT query_id, item_id,
        |    CAST(floor(1000000.0 / (60 + r)) AS BIGINT) FROM drank),
        |fused AS (
        |  SELECT query_id, item_id, CAST(sum(c) AS BIGINT) AS rrf_micro,
        |    count(*) AS n_rankers
        |  FROM contrib GROUP BY 1, 2)
        |SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |       ORDER BY rrf_micro DESC, item_id) AS INT) AS rank,
        |  item_id, rrf_micro, n_rankers
        |FROM fused QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin),
    "q_chunk_sentences" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_replace(text, ' (the|table) ', '. ', 'g') AS text
        |  FROM documents WHERE text IS NOT NULL),
        |s AS (
        |  SELECT doc_id, u.i AS pos, trim(u.s) AS sent
        |  FROM (SELECT doc_id, regexp_extract_all(text, '[^.!?]+[.!?]*') AS ss FROM d) t,
        |    LATERAL (SELECT unnest(ss) AS s, unnest(generate_series(1, len(ss))) AS i) u
        |  WHERE length(trim(u.s)) > 0),
        |c AS (
        |  SELECT doc_id, pos, sent,
        |    CAST(len(regexp_extract_all(sent, '\S+')) AS BIGINT) AS nt
        |  FROM s),
        |w AS (
        |  SELECT doc_id, pos, sent, nt,
        |    sum(nt) OVER (PARTITION BY doc_id ORDER BY pos) - nt AS pre
        |  FROM c)
        |SELECT doc_id, CAST(floor(pre / 16) AS BIGINT) AS chunk_idx,
        |  string_agg(sent, ' ' ORDER BY pos) AS text_chunk,
        |  count(*) AS n_sentences,
        |  CAST(sum(nt) AS BIGINT) AS chunk_tokens
        |FROM w GROUP BY 1, 2 ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_cap_domain" ->
      """WITH sizes AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |rule AS (
        |  SELECT lang,
        |    CASE WHEN n <= 100 THEN 10000
        |         ELSE CAST((100 * 10000) // n AS BIGINT) END AS frac
        |  FROM sizes)
        |SELECT d.doc_id, d.lang, d.source
        |-- null-safe: capPerGroup joins group <=> rule, so a NULL group
        |-- matches the NULL-group rule row (none in this fixture, but
        |-- the oracle pins the operator's actual semantics)
        |FROM documents d JOIN rule r ON d.lang IS NOT DISTINCT FROM r.lang
        |WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':cap'), 1, 8)) AS BIGINT)
        |      % 10000 < r.frac
        |ORDER BY d.doc_id""".stripMargin,
    "q_mix_budget" ->
      """WITH s AS (
        |  SELECT doc_id, lang,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |    CAST(length(text) AS BIGINT) AS n_len,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha
        |  FROM documents WHERE text IS NOT NULL),
        |q AS (
        |  SELECT doc_id, lang AS stratum, n_tokens,
        |    CAST(n_tokens >= 10 AS INT) + CAST(n_tokens <= 1000 AS INT)
        |      + CAST(CAST(n_len AS DOUBLE)/NULLIF(n_tokens, 0) >= 3
        |              AND CAST(n_len AS DOUBLE)/NULLIF(n_tokens, 0) <= 12 AS INT)
        |      + CAST(CAST(n_alpha AS DOUBLE)/NULLIF(n_len, 0) > 0.7 AS INT) AS quality,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8)) AS BIGINT)
        |      % 10000 AS b
        |  FROM s),
        |qq AS (SELECT * FROM q WHERE quality IS NOT NULL),
        |bud AS (SELECT * FROM (VALUES ('en', 4000), ('fr', 1500), ('zh', 100000))
        |        v(stratum, budget)),
        |hist AS (SELECT stratum, quality, sum(n_tokens) AS t FROM qq GROUP BY 1, 2),
        |thr AS (
        |  SELECT h.stratum, h.quality, h.t, b.budget,
        |    coalesce(sum(h.t) OVER (PARTITION BY h.stratum ORDER BY h.quality DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above
        |  FROM hist h JOIN bud b USING (stratum)),
        |fr AS (
        |  SELECT stratum, quality,
        |    CASE WHEN above >= budget THEN 0
        |         WHEN above + t <= budget THEN 10000
        |         ELSE CAST(((budget - above) * 10000) // t AS BIGINT) END AS frac
        |  FROM thr)
        |SELECT qq.doc_id, qq.stratum, qq.n_tokens, qq.quality
        |FROM qq JOIN fr ON fr.stratum = qq.stratum AND fr.quality = qq.quality
        |WHERE qq.b < fr.frac
        |ORDER BY qq.doc_id""".stripMargin,
    "q_dedup_new" -> exactNewSql,
    "q_dedup_new_lsh" -> lshNewCandidatesSql,
    "q_dedup_new_lsh_staged" -> lshNewCandidatesSql,
    // the Bloom path and the staged fingerprint probe must produce the
    // IDENTICAL exact answer — the oracle is the same exact-semantics
    // SQL (a Bloom / a staged layout is a physical prefilter, not a
    // semantic change)
    "q_dedup_new_bloom" -> exactNewSql,
    "q_dedup_new_staged" -> exactNewSql,
    // the bulk (shuffle-semi-join) strategy of the staged probe: a
    // physical plan switch, not a semantic one — identical oracle
    "q_dedup_new_staged_bulk" -> exactNewSql,
    // the streaming NEAR-DUP admission gate: both waves' LSH admission
    // recomputed from arrival order, wave 2 against reference + wave-1
    // winners (the index the engine grew per micro-batch)
    "q_st_lsh" -> admitNearSql,
    "q_st_lsh_verified" -> admitNearVerifiedSql,
    // the streaming SEMANTIC admission gate: both waves' IVF-flat
    // cosine admission recomputed in integer arithmetic, wave 2
    // against staged + wave-1 winners
    "q_st_vec" -> admitVecSql,
    // the streaming admission gate: arrival-ordered first-admission
    // (wave, then min id within a micro-batch) minus the staged
    // reference set — the q_curate_stream arrival discipline applied
    // to index-resident admission state
    "q_st_fp" ->
      """WITH d AS (SELECT doc_id, text, lang FROM documents
        |           WHERE text IS NOT NULL),
        |reference AS (SELECT text FROM d WHERE doc_id % 2 = 0),
        |w1 AS (SELECT doc_id, text, lang FROM d WHERE doc_id % 4 = 1),
        |arr AS (
        |  SELECT doc_id, text, lang, 1 AS wave FROM w1
        |  UNION ALL
        |  SELECT doc_id, text, lang, 2 FROM d WHERE doc_id % 4 = 3
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, lang, 2 FROM w1 WHERE doc_id % 5 = 1
        |  UNION ALL
        |  SELECT doc_id + 800000, text, lang, 2 FROM d WHERE doc_id % 6 = 0
        |  UNION ALL
        |  SELECT doc_id + 900000, text, lang, 2 FROM d
        |  WHERE doc_id % 4 = 3 AND doc_id % 7 = 0),
        |win AS (
        |  SELECT doc_id, text, lang FROM arr
        |  QUALIFY row_number() OVER (PARTITION BY md5(text)
        |    ORDER BY wave, doc_id) = 1)
        |SELECT w.doc_id, w.lang FROM win w
        |WHERE NOT EXISTS (SELECT 1 FROM reference r
        |                  WHERE md5(r.text) = md5(w.text))
        |ORDER BY w.doc_id""".stripMargin,
    "q_surprisal" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
        |  FROM documents WHERE text IS NOT NULL),
        |model AS (SELECT tok, count(*) AS tf FROM tok GROUP BY 1),
        |tot AS (SELECT count(*) AS n FROM tok),
        |sc AS (
        |  SELECT t.doc_id,
        |    CAST(floor(-1000.0 * ln(CAST(m.tf AS DOUBLE) / tot.n)) AS BIGINT) AS mnats
        |  FROM tok t JOIN model m ON m.tok = t.tok CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(mnats) AS BIGINT) AS total_mnats,
        |  CAST(sum(mnats) AS DOUBLE) / 1000.0 / count(*) AS avg_surprisal_nats
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_surprisal_bigram" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |p0 AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i
        |       FROM d WHERE len(toks) >= 1),
        |pos AS (SELECT doc_id, toks[i] AS tok,
        |          CASE WHEN i > 1 THEN toks[i-1] END AS prev FROM p0),
        |tot AS (SELECT count(*) AS n FROM pos),
        |uni AS (SELECT tok, count(*) AS tf FROM pos GROUP BY 1),
        |bi AS (SELECT prev, tok, count(*) AS bf FROM pos
        |       WHERE prev IS NOT NULL GROUP BY 1, 2),
        |ctx AS (SELECT prev, sum(bf) AS cf FROM bi GROUP BY 1),
        |sc AS (
        |  SELECT p.doc_id,
        |    CAST(floor(-1000.0 * ln(CAST(u.tf AS DOUBLE) / tot.n)) AS BIGINT) AS mnats
        |  FROM pos p JOIN uni u ON u.tok = p.tok CROSS JOIN tot
        |  WHERE p.prev IS NULL
        |  UNION ALL
        |  SELECT p.doc_id,
        |    CAST(floor(-1000.0 * ln(CAST(b.bf AS DOUBLE) / c.cf)) AS BIGINT) AS mnats
        |  FROM pos p
        |  JOIN bi b ON b.prev = p.prev AND b.tok = p.tok
        |  JOIN ctx c ON c.prev = p.prev)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(mnats) AS BIGINT) AS total_mnats,
        |  CAST(sum(mnats) AS DOUBLE) / 1000.0 / count(*) AS avg_surprisal_nats
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_dsir" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w
        |  FROM documents WHERE text IS NOT NULL),
        |feats AS (SELECT doc_id, f FROM (
        |    SELECT doc_id, unnest(w) AS f FROM d
        |    UNION ALL
        |    SELECT doc_id, w[u.i] || ' ' || w[u.i+1] AS f
        |    FROM d, LATERAL (SELECT unnest(generate_series(1,
        |      greatest(len(w)-1, 1))) AS i) u) x
        |  WHERE f IS NOT NULL),
        |fb AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(f || ':dsir'), 1, 8)) AS BIGINT) % 1024 AS b
        |  FROM feats),
        |dn AS (SELECT doc_id, b, count(*) AS n FROM fb GROUP BY 1, 2),
        |hq AS (SELECT b, sum(n) AS cq FROM dn GROUP BY 1),
        |ht AS (SELECT fb.b AS b, count(*) AS ct
        |  FROM fb JOIN documents t USING (doc_id)
        |  WHERE t.lang = 'en' GROUP BY 1),
        |tq AS (SELECT sum(cq) AS q FROM hq),
        |tt AS (SELECT coalesce(sum(ct), 0) AS t FROM ht),
        |lr AS (SELECT hq.b,
        |    CAST(floor(1000.0 * ln(
        |      (CAST(coalesce(ht.ct, 0) + 1 AS DOUBLE) * CAST(tq.q + 1024 AS DOUBLE)) /
        |      (CAST(hq.cq + 1 AS DOUBLE) * CAST(tt.t + 1024 AS DOUBLE)))) AS BIGINT)
        |      AS lr_mn
        |  FROM hq LEFT JOIN ht ON ht.b = hq.b CROSS JOIN tq CROSS JOIN tt)
        |SELECT dn.doc_id,
        |  CAST(sum(dn.n) AS BIGINT) AS n_feats,
        |  CAST(sum(dn.n * lr.lr_mn) AS BIGINT) AS dsir_mnats,
        |  CAST(sum(dn.n * lr.lr_mn) AS DOUBLE) / 1000.0 / sum(dn.n) AS avg_lr_nats
        |FROM dn JOIN lr ON lr.b = dn.b
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_mix_temperature" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 16 < 8 THEN 'web'
        |         WHEN doc_id % 16 < 12 THEN 'books'
        |         WHEN doc_id % 16 < 14 THEN 'code'
        |         WHEN doc_id % 16 < 15 THEN 'wiki'
        |         ELSE 'academic' END AS stratum,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':temp'), 1, 8))
        |         AS BIGINT) % 10000 AS b
        |  FROM documents),
        |c AS (SELECT stratum, count(*) AS n_docs FROM d GROUP BY 1),
        |t AS (SELECT sum(n_docs) AS N FROM c),
        |w AS (SELECT stratum, n_docs,
        |        CAST(floor(1000000.0 * sqrt(CAST(n_docs AS DOUBLE) / N)) AS BIGINT)
        |          AS weight_ppm
        |      FROM c, t),
        |ws AS (SELECT sum(weight_ppm) AS W FROM w),
        |r AS (SELECT stratum, n_docs, weight_ppm,
        |        CAST((150 * CAST(weight_ppm AS HUGEINT)) // W AS BIGINT) AS target_docs
        |      FROM w, ws),
        |r2 AS (SELECT *, least(10000,
        |         CAST((CAST(target_docs AS HUGEINT) * 10000) // n_docs AS BIGINT)) AS frac
        |       FROM r)
        |SELECT d.doc_id, d.stratum, r2.n_docs, r2.weight_ppm, r2.target_docs
        |FROM d JOIN r2 USING (stratum)
        |WHERE d.b < r2.frac ORDER BY d.doc_id""".stripMargin,
    "q_semantic_dedup" ->
      s"""WITH RECURSIVE base AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1500),
         |corpus AS (
         |  SELECT vec_id, embedding FROM base
         |  UNION ALL
         |  SELECT vec_id + 100000,
         |         list_transform(embedding, v -> CAST(CAST(v AS DOUBLE) * 1.1 AS FLOAT))
         |  FROM base WHERE vec_id % 7 = 0),
         |cent AS (SELECT row_number() OVER (ORDER BY vec_id) AS cidx, embedding
         |         FROM (SELECT * FROM corpus ORDER BY vec_id LIMIT 8)),
         |cd AS (SELECT v.vec_id, c.cidx,
         |         ${dotQ("v.embedding", "c.embedding")} AS dot
         |       FROM corpus v, cent c),
         |asgn AS (SELECT vec_id, CAST(cidx AS INT) AS cluster FROM (
         |           SELECT vec_id, cidx,
         |             row_number() OVER (PARTITION BY vec_id
         |                  ORDER BY dot DESC, cidx) AS rn
         |           FROM cd) WHERE rn = 1),
         |side AS (SELECT a.vec_id, a.cluster, c.embedding,
         |           ${dotQ("c.embedding", "c.embedding")} AS n2
         |         FROM asgn a JOIN corpus c ON c.vec_id = a.vec_id),
         |pairs AS (
         |  SELECT x.vec_id AS id_a, y.vec_id AS id_b,
         |    ${dotQ("x.embedding", "y.embedding")} AS dot_q,
         |    x.n2 AS n2_a, y.n2 AS n2_b
         |  FROM side x JOIN side y ON x.cluster = y.cluster AND x.vec_id < y.vec_id),
         |verified AS (
         |  SELECT id_a, id_b FROM pairs
         |  WHERE dot_q > 0
         |    AND 100 * CAST(dot_q AS HUGEINT) * CAST(dot_q AS HUGEINT)
         |        >= 81 * CAST(n2_a AS HUGEINT) * CAST(n2_b AS HUGEINT)),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM verified
         |          UNION SELECT id_b, id_a FROM verified),
         |reach AS (
         |  SELECT vec_id AS id, vec_id AS r FROM corpus
         |  UNION
         |  SELECT e.src AS id, reach.r AS r FROM edges e JOIN reach ON reach.id = e.dst),
         |roots AS (SELECT id, min(r) AS root_id FROM reach GROUP BY 1)
         |SELECT r.id AS vec_id, a.cluster, r.root_id,
         |  CAST(r.id = r.root_id AS INT) AS keep
         |FROM roots r JOIN asgn a ON a.vec_id = r.id
         |ORDER BY vec_id""".stripMargin,
    "q_decontam_dense" ->
      s"""WITH ev AS (
         |  SELECT vec_id AS eid, embedding FROM embeddings
         |  WHERE vec_id >= 450 AND vec_id < 500),
         |corpus AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 450
         |  UNION ALL
         |  SELECT eid + 200000,
         |    list_transform(embedding, v -> CAST(CAST(v AS DOUBLE) * 1.1 AS FLOAT))
         |  FROM ev WHERE eid % 5 = 0),
         |cs AS (SELECT vec_id, embedding,
         |         ${dotQ("embedding", "embedding")} AS n2c FROM corpus),
         |es AS (SELECT eid, embedding,
         |         ${dotQ("embedding", "embedding")} AS n2e FROM ev),
         |hits AS (
         |  SELECT c.vec_id, e.eid,
         |    ${dotQ("c.embedding", "e.embedding")} AS d, c.n2c, e.n2e
         |  FROM cs c, es e WHERE c.n2c > 0 AND e.n2e > 0),
         |flt AS (
         |  SELECT vec_id, eid,
         |    CAST(floor(1000000 * d / sqrt(CAST(n2c AS DOUBLE))
         |      / sqrt(CAST(n2e AS DOUBLE))) AS BIGINT) AS cos_micro
         |  FROM hits
         |  WHERE d > 0 AND 1000000 * CAST(d AS HUGEINT) * CAST(d AS HUGEINT)
         |    >= 810000 * CAST(n2c AS HUGEINT) * CAST(n2e AS HUGEINT)),
         |r AS (SELECT vec_id, eid, cos_micro,
         |        row_number() OVER (PARTITION BY vec_id
         |          ORDER BY cos_micro DESC, eid DESC) AS rn,
         |        count(*) OVER (PARTITION BY vec_id) AS n_hits
         |      FROM flt)
         |SELECT vec_id, CAST(n_hits AS BIGINT) AS n_hits,
         |  eid AS best_eval_id, cos_micro AS best_cos_micro
         |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    "q_prototype" ->
      s"""WITH corpus AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1500),
         |cent AS (SELECT row_number() OVER (ORDER BY vec_id) AS cidx, embedding
         |         FROM (SELECT * FROM corpus ORDER BY vec_id LIMIT 16)),
         |cn AS (SELECT cidx, ${dotQ("embedding", "embedding")} AS n2c FROM cent),
         |vv AS (SELECT vec_id, embedding,
         |         ${dotQ("embedding", "embedding")} AS n2 FROM corpus),
         |cd AS (SELECT v.vec_id, c.cidx,
         |         ${dotQ("v.embedding", "c.embedding")} AS dot
         |       FROM vv v, cent c),
         |asgn AS (SELECT vec_id, CAST(cidx AS INT) AS cluster FROM (
         |           SELECT vec_id, cidx,
         |             row_number() OVER (PARTITION BY vec_id
         |                  ORDER BY dot DESC, cidx) AS rn
         |           FROM cd) WHERE rn = 1),
         |scored AS (
         |  SELECT v.vec_id, a.cluster,
         |    CAST(floor(1000000 * d.dot / sqrt(CAST(v.n2 AS DOUBLE))
         |      / sqrt(CAST(n.n2c AS DOUBLE))) AS BIGINT) AS proto_micro
         |  FROM vv v
         |  JOIN asgn a ON a.vec_id = v.vec_id
         |  JOIN cd d ON d.vec_id = v.vec_id AND d.cidx = a.cluster
         |  JOIN cn n ON n.cidx = a.cluster
         |  WHERE v.n2 > 0),
         |lv AS (SELECT cluster, proto_micro, count(*) AS cnt
         |       FROM scored GROUP BY 1, 2),
         |lv2 AS (SELECT cluster, proto_micro,
         |         sum(cnt) OVER (PARTITION BY cluster
         |           ORDER BY proto_micro) AS cum,
         |         coalesce(sum(cnt) OVER (PARTITION BY cluster
         |           ORDER BY proto_micro
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cp,
         |         (700 * sum(cnt) OVER (PARTITION BY cluster)) // 1000 AS quota
         |       FROM lv),
         |dec AS (
         |  SELECT s.vec_id, s.cluster, s.proto_micro, l.cum, l.cp, l.quota,
         |    row_number() OVER (PARTITION BY s.cluster, s.proto_micro
         |      ORDER BY s.vec_id) AS rk
         |  FROM scored s
         |  JOIN lv2 l ON l.cluster = s.cluster AND l.proto_micro = s.proto_micro)
         |SELECT vec_id, cluster, proto_micro,
         |  CAST(CASE WHEN cum <= quota OR (cp < quota AND rk <= quota - cp)
         |    THEN 1 ELSE 0 END AS INT) AS keep
         |FROM dec ORDER BY vec_id""".stripMargin,
    // next-fit unrolled as a recursive CTE stepping one doc per shard
    // at a time — mirrors packNoSplit's fold exactly (reset only when
    // the sequence already holds something)
    "q_pack_nosplit" ->
      (packNoSplitCte +
        """SELECT shard, doc_id, n_tokens, seq_idx, seq_offset
          |FROM step ORDER BY doc_id""".stripMargin),
    "q_pack_eval" ->
      (packNoSplitCte +
        s""", seqs AS (
          |  SELECT shard, seq_idx, CAST(sum(fill0) AS BIGINT) AS fill,
          |    count(*) AS ndocs
          |  FROM (SELECT shard, seq_idx, n_tokens AS fill0 FROM step)
          |  GROUP BY 1, 2)
          |SELECT split_part(shard, ':', 1) AS split,
          |  CAST(sum(ndocs) AS BIGINT) AS n_docs,
          |  count(*) AS n_seqs,
          |  CAST(sum(CASE WHEN fill > $PackCapacity THEN 1 ELSE 0 END) AS BIGINT) AS n_oversize,
          |  CAST(sum(fill) AS BIGINT) AS total_tokens,
          |  (1000 * CAST(sum(CASE WHEN fill <= $PackCapacity THEN $PackCapacity - fill ELSE 0 END) AS BIGINT))
          |    // NULLIF($PackCapacity * (count(*) -
          |      CAST(sum(CASE WHEN fill > $PackCapacity THEN 1 ELSE 0 END) AS BIGINT)), 0)
          |    AS padding_permille
          |FROM seqs GROUP BY 1 ORDER BY 1""".stripMargin),
    "q_pack" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8)) AS BIGINT)
        |      % 10000 AS bucket
        |  FROM documents WHERE text IS NOT NULL),
        |s AS (SELECT doc_id, n_tokens,
        |        CASE WHEN bucket < 8000 THEN 'train'
        |             WHEN bucket < 9000 THEN 'val' ELSE 'test' END AS split,
        |        bucket % 8 AS shard
        |      FROM d),
        |p AS (SELECT *,
        |        CAST(sum(n_tokens) OVER (PARTITION BY split, shard ORDER BY doc_id)
        |             - n_tokens AS BIGINT) AS start_tok
        |      FROM s)
        |SELECT doc_id, split, shard, n_tokens, start_tok,
        |  start_tok // 2048 AS seq_idx, start_tok % 2048 AS seq_offset
        |FROM p ORDER BY doc_id""".stripMargin,
    "q_pipeline_corpus" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 200000, text FROM documents WHERE doc_id % 7 = 0),
        |keep AS (SELECT min(doc_id) AS doc_id FROM corpus GROUP BY md5(text)),
        |s AS (
        |  SELECT c.doc_id,
        |    CAST(len(regexp_extract_all(c.text, '\S+')) AS BIGINT) AS n_tokens,
        |    CAST(length(c.text) AS BIGINT) AS n_len,
        |    CAST(len(regexp_extract_all(c.text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
        |    CAST(len(regexp_extract_all(lower(c.text), '\b(the|a|of|and|is)\b')) AS BIGINT) AS en_n,
        |    CAST(len(regexp_extract_all(lower(c.text), '\b(le|la|et|les|des)\b')) AS BIGINT) AS fr_n,
        |    CAST(len(regexp_extract_all(lower(c.text), '\b(el|los|las|y|que)\b')) AS BIGINT) AS es_n,
        |    CAST(len(regexp_extract_all(lower(c.text), '\b(der|die|und|das|ist)\b')) AS BIGINT) AS de_n
        |  FROM corpus c JOIN keep k ON k.doc_id = c.doc_id),
        |q AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(n_tokens >= 10 AS INT) + CAST(n_tokens <= 1000 AS INT)
        |      + CAST(CAST(n_len AS DOUBLE)/NULLIF(n_tokens, 0) >= 3
        |              AND CAST(n_len AS DOUBLE)/NULLIF(n_tokens, 0) <= 12 AS INT)
        |      + CAST(CAST(n_alpha AS DOUBLE)/NULLIF(n_len, 0) > 0.7 AS INT) AS quality_score,
        |    CASE WHEN en_n >= fr_n AND en_n >= es_n AND en_n >= de_n THEN 'en'
        |         WHEN fr_n >= es_n AND fr_n >= de_n THEN 'fr'
        |         WHEN es_n >= de_n THEN 'es' ELSE 'de' END AS pred_lang
        |  FROM s)
        |SELECT doc_id, n_tokens, quality_score,
        |  CASE WHEN b < 8000 THEN 'train' WHEN b < 9000 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT *,
        |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8)) AS BIGINT)
        |          % 10000 AS b
        |      FROM q WHERE quality_score >= 3 AND pred_lang = 'en')
        |ORDER BY doc_id""".stripMargin,
    // the full -curate substrIndex pipeline recomputed from scratch:
    // min-id dedup, the newDupSpans probe rule (in-reference OR
    // repeated-in-batch), span merge + text rebuild, gates on the CUT
    // text, hash split — the manifest the CLI writes, row for row
    // fates recomputed from scratch with the pipeline's stage-order
    // precedence; q.doc_id is NULL exactly for dedup losers (the stats
    // CTE runs over min-id winners only) and for null-text rows, which
    // the earlier CASE arm claims first
    "q_curate_audit" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 200000, text FROM documents
        |  WHERE doc_id % 7 = 0 AND text IS NOT NULL
        |  UNION ALL
        |  SELECT * FROM (VALUES
        |    (CAST(900001 AS BIGINT), 'a b c 1 2 3 4 5 6 7 8 9'),
        |    (900002, 'le la et les des le la et les des le la et les des'),
        |    (900003, CAST(NULL AS VARCHAR)),
        |    (900004, '   ')) p(doc_id, text)),
        |win AS (
        |  SELECT doc_id, text FROM corpus WHERE text IS NOT NULL
        |  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
        |st AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |    CAST(length(text) AS BIGINT) AS n_len,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
        |    CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|is)\b')) AS BIGINT) AS en_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(le|la|et|les|des)\b')) AS BIGINT) AS fr_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(el|los|las|y|que)\b')) AS BIGINT) AS es_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist)\b')) AS BIGINT) AS de_n
        |  FROM win),
        |q AS (
        |  SELECT doc_id,
        |    CAST(n_tokens >= 10 AS INT) + CAST(n_tokens <= 1000 AS INT)
        |      + CAST(CAST(n_len AS DOUBLE)/NULLIF(n_tokens, 0) >= 3
        |              AND CAST(n_len AS DOUBLE)/NULLIF(n_tokens, 0) <= 12 AS INT)
        |      + CAST(CAST(n_alpha AS DOUBLE)/NULLIF(n_len, 0) > 0.7 AS INT) AS quality_score,
        |    CASE WHEN en_n >= fr_n AND en_n >= es_n AND en_n >= de_n THEN 'en'
        |         WHEN fr_n >= es_n AND fr_n >= de_n THEN 'fr'
        |         WHEN es_n >= de_n THEN 'es' ELSE 'de' END AS pred_lang
        |  FROM st)
        |SELECT c.doc_id AS doc_id,
        |  CASE WHEN c.text IS NULL THEN 'dropped_null_text'
        |       WHEN q.doc_id IS NULL THEN 'dropped_duplicate'
        |       WHEN q.quality_score IS NULL
        |         OR q.quality_score < 3 THEN 'dropped_quality'
        |       WHEN q.pred_lang <> 'en' THEN 'dropped_language'
        |       ELSE 'kept' END AS fate
        |FROM corpus c LEFT JOIN q ON c.doc_id = q.doc_id
        |ORDER BY doc_id""".stripMargin,
    // the -curate streaming CLI branch: arrival-ordered exact dedup
    // (wave-1 winner on cross-run collisions — the checkpointed state),
    // then the same gate/split/scrub tail as q_st_curate
    "q_curate_stream" ->
      """WITH u AS (
        |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
        |  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
        |w1 AS (SELECT doc_id, text FROM u WHERE doc_id % 3 = 1),
        |arr AS (
        |  SELECT doc_id, text, 1 AS wave FROM w1
        |  UNION ALL
        |  SELECT doc_id, text, 2 FROM u WHERE doc_id % 3 = 2
        |  UNION ALL
        |  SELECT doc_id + 700000, text, 2 FROM w1 WHERE doc_id % 5 = 0),
        |ded AS (
        |  SELECT doc_id, text FROM arr
        |  QUALIFY row_number() OVER (PARTITION BY md5(text)
        |    ORDER BY wave, doc_id) = 1),
        |s AS (
        |  SELECT doc_id, text,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |    CAST(length(text) AS BIGINT) AS n_len,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
        |    CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|is)\b')) AS BIGINT) AS en_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(le|la|et|les|des)\b')) AS BIGINT) AS fr_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(el|los|las|y|que)\b')) AS BIGINT) AS es_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist)\b')) AS BIGINT) AS de_n
        |  FROM ded),
        |q AS (
        |  SELECT doc_id, text, n_tokens,
        |    CAST(n_tokens >= 10 AS INT) + CAST(n_tokens <= 1000 AS INT)
        |      + CAST(CAST(n_len AS DOUBLE)/NULLIF(n_tokens, 0) >= 3
        |              AND CAST(n_len AS DOUBLE)/NULLIF(n_tokens, 0) <= 12 AS INT)
        |      + CAST(CAST(n_alpha AS DOUBLE)/NULLIF(n_len, 0) > 0.7 AS INT) AS quality_score,
        |    CASE WHEN en_n >= fr_n AND en_n >= es_n AND en_n >= de_n THEN 'en'
        |         WHEN fr_n >= es_n AND fr_n >= de_n THEN 'fr'
        |         WHEN es_n >= de_n THEN 'es' ELSE 'de' END AS pred_lang
        |  FROM s)
        |SELECT doc_id, n_tokens, quality_score, pred_lang,
        |  CASE WHEN b < 8000 THEN 'train' WHEN b < 9000 THEN 'val' ELSE 'test' END AS split,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS scrubbed
        |FROM (SELECT *,
        |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8)) AS BIGINT)
        |          % 10000 AS b
        |      FROM q WHERE quality_score >= 3 AND pred_lang = 'en')
        |ORDER BY doc_id""".stripMargin,
    "q_pipeline_incr" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |refg AS (
        |  SELECT DISTINCT md5(substring(text, u.p, 40)) AS h
        |  FROM base, LATERAL (SELECT unnest(generate_series(
        |    1, length(text) - 39)) AS p) u
        |  WHERE doc_id % 3 = 0 AND length(text) >= 40),
        |feed AS (
        |  SELECT doc_id, text FROM base WHERE doc_id % 3 = 1
        |  UNION ALL
        |  SELECT doc_id + 500000,
        |    'NEW:' || CAST(doc_id AS VARCHAR) || ' ' || substring(text, 61, 150)
        |  FROM base WHERE doc_id % 21 = 0 AND length(text) >= 240),
        |ded AS (SELECT min(doc_id) AS doc_id FROM feed GROUP BY md5(text)),
        |fd AS (SELECT f.doc_id, f.text FROM feed f JOIN ded USING (doc_id)),
        |bg AS (
        |  SELECT doc_id, u.p AS p, md5(substring(text, u.p, 40)) AS h
        |  FROM fd, LATERAL (SELECT unnest(generate_series(
        |    1, length(text) - 39)) AS p) u
        |  WHERE length(text) >= 40),
        |dup AS (
        |  SELECT doc_id, p, p + 39 AS e FROM bg
        |  WHERE h IN (SELECT h FROM bg GROUP BY h HAVING count(*) > 1)
        |     OR h IN (SELECT h FROM refg)),
        |mrk AS (
        |  SELECT doc_id, p, e,
        |    CASE WHEN p > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
        |      THEN 1 ELSE 0 END AS brk
        |  FROM dup),
        |spans AS (
        |  SELECT doc_id, min(p) AS span_start, max(e) AS span_end
        |  FROM (SELECT doc_id, p, e,
        |          sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS gid
        |        FROM mrk)
        |  GROUP BY doc_id, gid),
        |headseg AS (
        |  SELECT s.doc_id, s.span_start AS ord,
        |    substring(c.text,
        |      CAST(coalesce(lag(s.span_end) OVER (PARTITION BY s.doc_id
        |        ORDER BY s.span_start), 0) + 1 AS INT),
        |      CAST(s.span_start - coalesce(lag(s.span_end) OVER (
        |        PARTITION BY s.doc_id ORDER BY s.span_start), 0) - 1 AS INT)) AS seg
        |  FROM spans s JOIN fd c USING (doc_id)),
        |tailseg AS (
        |  SELECT s.doc_id, 2000000000 AS ord,
        |    substring(c.text, CAST(max(s.span_end) AS INT) + 1) AS seg
        |  FROM spans s JOIN fd c USING (doc_id)
        |  GROUP BY s.doc_id, c.text),
        |clean AS (
        |  SELECT doc_id, string_agg(seg, '' ORDER BY ord) AS text_clean
        |  FROM (SELECT * FROM headseg UNION ALL SELECT * FROM tailseg)
        |  GROUP BY doc_id),
        |cut AS (
        |  SELECT f.doc_id, coalesce(cl.text_clean, f.text) AS text
        |  FROM fd f LEFT JOIN clean cl USING (doc_id)),
        |st AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |    CAST(length(text) AS BIGINT) AS n_len,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
        |    CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|is)\b')) AS BIGINT) AS en_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(le|la|et|les|des)\b')) AS BIGINT) AS fr_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(el|los|las|y|que)\b')) AS BIGINT) AS es_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist)\b')) AS BIGINT) AS de_n
        |  FROM cut),
        |q AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(n_tokens >= 10 AS INT) + CAST(n_tokens <= 1000 AS INT)
        |      + CAST(CAST(n_len AS DOUBLE)/NULLIF(n_tokens, 0) >= 3
        |              AND CAST(n_len AS DOUBLE)/NULLIF(n_tokens, 0) <= 12 AS INT)
        |      + CAST(CAST(n_alpha AS DOUBLE)/NULLIF(n_len, 0) > 0.7 AS INT) AS quality_score,
        |    CASE WHEN en_n >= fr_n AND en_n >= es_n AND en_n >= de_n THEN 'en'
        |         WHEN fr_n >= es_n AND fr_n >= de_n THEN 'fr'
        |         WHEN es_n >= de_n THEN 'es' ELSE 'de' END AS pred_lang
        |  FROM st)
        |SELECT doc_id, n_tokens, quality_score, pred_lang, b AS bucket,
        |  CASE WHEN b < 8000 THEN 'train' WHEN b < 9000 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT *,
        |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8)) AS BIGINT)
        |          % 10000 AS b
        |      FROM q WHERE quality_score >= 3 AND pred_lang = 'en')
        |ORDER BY doc_id""".stripMargin,
    "q_j3_compaction" ->
      """SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,
    "q_t6_rename" ->
      """SELECT n_nationkey, n_name, n_regionkey,
        |  'tgt.nation_xl' AS sink_ns, TRUE AS old_ns_gone
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_k1_upsert" ->
      """WITH base AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
        |         CAST(c_nationkey AS BIGINT) AS c_nationkey FROM customer),
        |fin AS (
        |  SELECT c_custkey, c_name || '#u' AS c_name, c_nationkey
        |  FROM base WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_nationkey FROM base WHERE c_custkey % 3 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 100000000, c_name, c_nationkey
        |  FROM base WHERE c_custkey % 10 = 0),
        |tot AS (SELECT count(*) AS t FROM fin)
        |SELECT f.c_custkey, f.c_name, f.c_nationkey,
        |  t AS total_after_first, t AS total_after_rerun
        |FROM fin f, tot ORDER BY f.c_custkey""".stripMargin,
    "q_s4_spool" ->
      """WITH p AS (
        |  SELECT n_nationkey,
        |         CAST(n_nationkey AS VARCHAR) || '|' || n_name AS payload
        |  FROM nation)
        |SELECT CAST(row_number() OVER (ORDER BY n_nationkey) - 1 AS BIGINT) AS frame_seq,
        |  payload, CAST(4 + strlen(payload) AS BIGINT) AS frame_len
        |FROM p ORDER BY frame_seq""".stripMargin,
    "q_st2_catchup" ->
      """WITH src AS (
        |  SELECT o_orderkey AS k, o_custkey, o_orderstatus, o_totalprice FROM orders),
        |updated AS (
        |  SELECT k,
        |    CASE WHEN k % 11 = 0 AND k % 3 <> 0 AND k % 5 <> 0 AND k % 7 <> 0
        |         THEN o_custkey + 1000000 ELSE o_custkey END AS custkey,
        |    CASE WHEN k % 3 = 0 THEN 'X' ELSE o_orderstatus END AS status,
        |    CASE WHEN k % 5 = 0 AND k % 3 <> 0 THEN o_totalprice + 10
        |         ELSE o_totalprice END AS price
        |  FROM src WHERE NOT (k % 7 = 0 AND k % 3 <> 0 AND k % 5 <> 0)),
        |inserted AS (
        |  SELECT k + 100000000 AS k, o_custkey AS custkey, 'N' AS status,
        |    CAST(1.5 AS DOUBLE) AS price
        |  FROM src WHERE k % 10 = 0)
        |SELECT k, custkey, status, price FROM updated
        |UNION ALL SELECT k, custkey, status, price FROM inserted
        |ORDER BY k""".stripMargin,
    "q_st1_overlap" ->
      """WITH survived AS (
        |  SELECT p_partkey AS k,
        |    CASE WHEN p_partkey % 3 = 0 THEN 'X' ELSE p_brand END AS brand,
        |    CAST(p_retailprice AS DOUBLE) AS retail
        |  FROM part WHERE NOT (p_partkey % 7 = 0 AND p_partkey % 3 <> 0)),
        |inserted AS (
        |  SELECT p_partkey + 100000000 AS k, 'NEW' AS brand,
        |    CAST(9.99 AS DOUBLE) AS retail
        |  FROM part WHERE p_partkey % 10 = 0),
        |state AS (SELECT * FROM survived UNION ALL SELECT * FROM inserted)
        |SELECT k, brand, retail,
        |  (SELECT count(*) FROM state) AS n_before
        |FROM state ORDER BY k""".stripMargin,
    "q_st3_tail" ->
      """WITH survived AS (
        |  SELECT c_custkey AS k, CAST(c_acctbal AS DOUBLE) AS bal,
        |    CASE WHEN c_custkey % 3 = 0 THEN 'GOLD' ELSE c_mktsegment END AS seg
        |  FROM customer WHERE NOT (c_custkey % 7 = 0 AND c_custkey % 3 <> 0)),
        |inserted AS (
        |  SELECT c_custkey + 100000000 AS k, CAST(0.0 AS DOUBLE) AS bal,
        |    'NEW' AS seg
        |  FROM customer WHERE c_custkey % 10 = 0),
        |state AS (SELECT * FROM survived UNION ALL SELECT * FROM inserted),
        |n AS (SELECT
        |  (SELECT count(*) FROM customer WHERE c_custkey % 3 = 0) +
        |  (SELECT count(*) FROM customer
        |     WHERE c_custkey % 7 = 0 AND c_custkey % 3 <> 0) +
        |  (SELECT count(*) FROM customer WHERE c_custkey % 10 = 0)
        |  AS applied_total)
        |SELECT k, bal, seg, n.applied_total, TRUE AS lag_ok
        |FROM state CROSS JOIN n ORDER BY k""".stripMargin,
    "q_o6_resume" ->
      """SELECT s_suppkey, s_name, s_nationkey,
        |  (SELECT count(*) FROM region) AS n_region
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "q_s5_catalog" ->
      """SELECT * FROM (VALUES
        |  ('app.items', '_id', 'app,web'),
        |  ('app.system.js', '_id', 'app,web'),
        |  ('app.users', '_id', 'app,web'),
        |  ('web.sessions', '_id', 'app,web')) t(ns, key, dbs)
        |ORDER BY ns""".stripMargin,
    "q_a3_observe" ->
      """SELECT 'src.part' AS ns, 'src.part' AS to_ns,
        |  count(*) AS rows_read, count(*) AS rows_in_target
        |FROM part""".stripMargin,
    "q_d1_manifest" ->
      """SELECT * FROM (VALUES
        |  ('collection', 'src.region', ''),
        |  ('collection', 'tgt.nation2', ''),
        |  ('index', 'src.region', '{"r_regionkey":1}'),
        |  ('index', 'tgt.nation2', '{"n_nationkey":1}')) t(section, ns, detail)
        |ORDER BY section, ns""".stripMargin,
    "q_d4_partitions" ->
      """WITH d AS (SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS k FROM customer),
        |o AS (SELECT k, row_number() OVER (ORDER BY k) - 1 AS i,
        |             lead(k) OVER (ORDER BY k) AS nxt FROM d),
        |c AS (SELECT count(*) AS n FROM d)
        |SELECT o.k AS min_key,
        |  '{"c_nationkey":"' || coalesce(CAST(nxt AS VARCHAR), '+inf') || '"}' AS max_json,
        |  'shard' || CAST(i % 3 AS VARCHAR) AS shard,
        |  CAST(n AS INT) AS suggested, TRUE AS unchunked_is_none
        |FROM o, c ORDER BY min_key""".stripMargin,
    "q_d3_shards" ->
      """WITH src AS (SELECT r_name AS s,
        |               row_number() OVER (ORDER BY r_name) - 1 AS i
        |             FROM region),
        |ntc AS (SELECT count(*) AS nt FROM region WHERE r_regionkey < 3),
        |tgt AS (SELECT r_name || '-T' AS t,
        |          row_number() OVER (ORDER BY r_name) - 1 AS j
        |        FROM region WHERE r_regionkey < 3),
        |nat AS (SELECT n_name AS m,
        |          row_number() OVER (ORDER BY n_name) - 1 AS i,
        |          count(*) OVER () AS n
        |        FROM nation),
        |seg AS (SELECT mx.n // ntc.nt AS seg, ntc.nt AS nt
        |        FROM (SELECT max(n) AS n FROM nat) mx CROSS JOIN ntc),
        |prim AS (SELECT 'primary' AS section, src.s AS k, tgt.t AS v
        |         FROM src CROSS JOIN ntc JOIN tgt ON tgt.j =
        |           CASE WHEN src.i < ntc.nt - 1 THEN src.i
        |                ELSE (src.i - (ntc.nt - 1)) % ntc.nt END),
        |zone AS (SELECT 'zone' AS section, r_name || '-T' AS k,
        |           'zone_' || r_name AS v FROM region),
        |sh AS (SELECT 'sharded' AS section, 'app.customer' AS k,
        |         '{"c_custkey":1}' AS v),
        |spl AS (SELECT 'split' AS section, 'app.customer' AS k, nat.m AS v
        |        FROM nat CROSS JOIN seg
        |        WHERE nat.i > 0 AND nat.i % seg.seg = 0
        |          AND nat.i // seg.seg < seg.nt),
        |rng AS (SELECT nat.m, row_number() OVER (ORDER BY nat.i) - 1 AS r
        |        FROM nat CROSS JOIN seg
        |        WHERE nat.i = 0 OR (nat.i > 0 AND nat.i % seg.seg = 0
        |          AND nat.i // seg.seg < seg.nt)),
        |mv AS (SELECT 'move' AS section, rng.m AS k, tgt.t AS v
        |       FROM rng JOIN tgt ON tgt.j = rng.r)
        |SELECT * FROM prim UNION ALL SELECT * FROM zone
        |UNION ALL SELECT * FROM sh UNION ALL SELECT * FROM spl
        |UNION ALL SELECT * FROM mv
        |ORDER BY section, k, v""".stripMargin,
    "q_p3_wildcards" ->
      """SELECT 'src.nation' AS ns, 'src.nation' AS to_ns,
        |  (SELECT count(*) FROM nation) AS rows_read,
        |  'src.nation,src.region2' AS sink_ns
        |UNION ALL
        |SELECT 'src.region', 'src.region2',
        |  (SELECT count(*) FROM region), 'src.nation,src.region2'
        |ORDER BY ns""".stripMargin,
    "q_a5_counters" ->
      """SELECT ns, inserted, modified, deleted,
        |  inserted + modified + deleted AS total
        |FROM (
        |  SELECT 'app.orders_state' AS ns,
        |    (SELECT count(*) FROM orders WHERE o_orderkey % 10 = 0) AS inserted,
        |    (SELECT count(*) FROM orders WHERE o_orderkey % 3 = 0
        |       OR (o_orderkey % 5 = 0 AND o_orderkey % 3 <> 0)) AS modified,
        |    (SELECT count(*) FROM orders WHERE o_orderkey % 7 = 0
        |       AND o_orderkey % 3 <> 0 AND o_orderkey % 5 <> 0) AS deleted)""".stripMargin,
    "q_k4_logs" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 'copy started'),
        |  (CAST(2 AS BIGINT), 'copy completed'),
        |  (CAST(3 AS BIGINT), 'stream caught up')) t(ordinal, status)
        |ORDER BY ordinal""".stripMargin,
    "q_d5_guard" ->
      """SELECT TRUE AS refused,
        |  (SELECT count(*) FROM nation WHERE n_nationkey % 2 = 0) AS intact_rows,
        |  (SELECT count(*) FROM nation) AS recopied_rows""".stripMargin,
    "q_st_curate" ->
      """WITH u AS (
        |  SELECT doc_id, text FROM documents
        |  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
        |s AS (
        |  SELECT doc_id, text,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |    CAST(length(text) AS BIGINT) AS n_len,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
        |    CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|is)\b')) AS BIGINT) AS en_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(le|la|et|les|des)\b')) AS BIGINT) AS fr_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(el|los|las|y|que)\b')) AS BIGINT) AS es_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist)\b')) AS BIGINT) AS de_n
        |  FROM u),
        |q AS (
        |  SELECT doc_id, text, n_tokens,
        |    CAST(n_tokens >= 10 AS INT) + CAST(n_tokens <= 1000 AS INT)
        |      + CAST(CAST(n_len AS DOUBLE)/NULLIF(n_tokens, 0) >= 3
        |              AND CAST(n_len AS DOUBLE)/NULLIF(n_tokens, 0) <= 12 AS INT)
        |      + CAST(CAST(n_alpha AS DOUBLE)/NULLIF(n_len, 0) > 0.7 AS INT) AS quality_score,
        |    CASE WHEN en_n >= fr_n AND en_n >= es_n AND en_n >= de_n THEN 'en'
        |         WHEN fr_n >= es_n AND fr_n >= de_n THEN 'fr'
        |         WHEN es_n >= de_n THEN 'es' ELSE 'de' END AS pred_lang
        |  FROM s)
        |SELECT doc_id, n_tokens, quality_score, pred_lang,
        |  CASE WHEN b < 8000 THEN 'train' WHEN b < 9000 THEN 'val' ELSE 'test' END AS split,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS scrubbed
        |FROM (SELECT *,
        |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8)) AS BIGINT)
        |          % 10000 AS b
        |      FROM q WHERE quality_score >= 3 AND pred_lang = 'en')
        |ORDER BY doc_id""".stripMargin,
    // the stream twin of q_pipeline_incr: REFERENCE-ONLY probe (no
    // in-batch rule — the cut is micro-batch-invariant by construction),
    // gates on the cut text, clean_md5 pins the rebuilt text by hash
    "q_st_curate_index" ->
      """WITH u AS (
        |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
        |  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
        |refg AS (
        |  SELECT DISTINCT md5(substring(text, u1.p, 40)) AS h
        |  FROM u, LATERAL (SELECT unnest(generate_series(
        |    1, length(text) - 39)) AS p) u1
        |  WHERE doc_id % 6 = 0 AND length(text) >= 40),
        |fd AS (SELECT doc_id, text FROM u WHERE doc_id % 3 = 1),
        |bg AS (
        |  SELECT doc_id, u2.p AS p, md5(substring(text, u2.p, 40)) AS h
        |  FROM fd, LATERAL (SELECT unnest(generate_series(
        |    1, length(text) - 39)) AS p) u2
        |  WHERE length(text) >= 40),
        |dup AS (
        |  SELECT doc_id, p, p + 39 AS e FROM bg
        |  WHERE h IN (SELECT h FROM refg)),
        |mrk AS (
        |  SELECT doc_id, p, e,
        |    CASE WHEN p > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
        |      THEN 1 ELSE 0 END AS brk
        |  FROM dup),
        |spans AS (
        |  SELECT doc_id, min(p) AS span_start, max(e) AS span_end
        |  FROM (SELECT doc_id, p, e,
        |          sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS gid
        |        FROM mrk)
        |  GROUP BY doc_id, gid),
        |headseg AS (
        |  SELECT s.doc_id, s.span_start AS ord,
        |    substring(c.text,
        |      CAST(coalesce(lag(s.span_end) OVER (PARTITION BY s.doc_id
        |        ORDER BY s.span_start), 0) + 1 AS INT),
        |      CAST(s.span_start - coalesce(lag(s.span_end) OVER (
        |        PARTITION BY s.doc_id ORDER BY s.span_start), 0) - 1 AS INT)) AS seg
        |  FROM spans s JOIN fd c USING (doc_id)),
        |tailseg AS (
        |  SELECT s.doc_id, 2000000000 AS ord,
        |    substring(c.text, CAST(max(s.span_end) AS INT) + 1) AS seg
        |  FROM spans s JOIN fd c USING (doc_id)
        |  GROUP BY s.doc_id, c.text),
        |clean AS (
        |  SELECT doc_id, string_agg(seg, '' ORDER BY ord) AS text_clean
        |  FROM (SELECT * FROM headseg UNION ALL SELECT * FROM tailseg)
        |  GROUP BY doc_id),
        |cut AS (
        |  SELECT f.doc_id, coalesce(cl.text_clean, f.text) AS text
        |  FROM fd f LEFT JOIN clean cl USING (doc_id)),
        |st AS (
        |  SELECT doc_id, text,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |    CAST(length(text) AS BIGINT) AS n_len,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
        |    CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|is)\b')) AS BIGINT) AS en_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(le|la|et|les|des)\b')) AS BIGINT) AS fr_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(el|los|las|y|que)\b')) AS BIGINT) AS es_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist)\b')) AS BIGINT) AS de_n
        |  FROM cut),
        |q AS (
        |  SELECT doc_id, text, n_tokens,
        |    CAST(n_tokens >= 10 AS INT) + CAST(n_tokens <= 1000 AS INT)
        |      + CAST(CAST(n_len AS DOUBLE)/NULLIF(n_tokens, 0) >= 3
        |              AND CAST(n_len AS DOUBLE)/NULLIF(n_tokens, 0) <= 12 AS INT)
        |      + CAST(CAST(n_alpha AS DOUBLE)/NULLIF(n_len, 0) > 0.7 AS INT) AS quality_score,
        |    CASE WHEN en_n >= fr_n AND en_n >= es_n AND en_n >= de_n THEN 'en'
        |         WHEN fr_n >= es_n AND fr_n >= de_n THEN 'fr'
        |         WHEN es_n >= de_n THEN 'es' ELSE 'de' END AS pred_lang
        |  FROM st)
        |SELECT doc_id, n_tokens, quality_score, pred_lang,
        |  CASE WHEN b < 8000 THEN 'train' WHEN b < 9000 THEN 'val' ELSE 'test' END AS split,
        |  md5(text) AS clean_md5
        |FROM (SELECT *,
        |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8)) AS BIGINT)
        |          % 10000 AS b
        |      FROM q WHERE quality_score >= 3 AND pred_lang = 'en')
        |ORDER BY doc_id""".stripMargin,
    // append-after-cut is batch-ORDER-dependent: batch i's census is the
    // reference grams plus the RAW grams of batches < i (the stream
    // appends each cut batch's raw text), recomputed here from scratch —
    // a gram collides iff it is in the reference or its FIRST carrying
    // batch is strictly earlier than the probing one
    "q_st_curate_append" ->
      """WITH u AS (
        |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
        |  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
        |refg AS (
        |  SELECT DISTINCT md5(substring(text, u1.p, 40)) AS h
        |  FROM u, LATERAL (SELECT unnest(generate_series(
        |    1, length(text) - 39)) AS p) u1
        |  WHERE doc_id % 6 = 0 AND length(text) >= 40),
        |fd AS (SELECT doc_id, text FROM u WHERE doc_id % 3 = 1),
        |b0 AS (SELECT doc_id, text FROM fd WHERE doc_id % 2 = 1),
        |allb AS (
        |  SELECT 0 AS b, doc_id, text FROM b0
        |  UNION ALL SELECT 1, doc_id, text FROM fd WHERE doc_id % 2 = 0
        |  UNION ALL SELECT 1, doc_id + 1000000,
        |    substring(text, 1, 120) || ' planted first copy about doc ' ||
        |    CAST(doc_id AS VARCHAR) ||
        |    ' where the quick brown fox jumps over the lazy dog'
        |  FROM b0 WHERE doc_id % 5 = 1
        |  UNION ALL SELECT 2, doc_id + 2000000,
        |    substring(text, 1, 120) || ' second planted copy about doc ' ||
        |    CAST(doc_id AS VARCHAR) ||
        |    ' pack the box with five dozen liquor jugs'
        |  FROM fd WHERE doc_id % 2 = 0 AND doc_id % 5 = 2
        |  UNION ALL SELECT 2, doc_id + 3000000,
        |    substring(text, 1, 120) || ' third planted copy about doc ' ||
        |    CAST(doc_id AS VARCHAR) ||
        |    ' we all live in a yellow submarine today'
        |  FROM b0 WHERE doc_id % 5 = 3),
        |bg AS (
        |  SELECT b, doc_id, u2.p AS p, md5(substring(text, u2.p, 40)) AS h
        |  FROM allb, LATERAL (SELECT unnest(generate_series(
        |    1, length(text) - 39)) AS p) u2
        |  WHERE length(text) >= 40),
        |firstb AS (SELECT h, min(b) AS fb FROM bg GROUP BY h),
        |dup AS (
        |  SELECT g.doc_id, g.p, g.p + 39 AS e
        |  FROM bg g JOIN firstb f ON g.h = f.h
        |  WHERE f.fb < g.b OR g.h IN (SELECT h FROM refg)),
        |mrk AS (
        |  SELECT doc_id, p, e,
        |    CASE WHEN p > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
        |      THEN 1 ELSE 0 END AS brk
        |  FROM dup),
        |spans AS (
        |  SELECT doc_id, min(p) AS span_start, max(e) AS span_end
        |  FROM (SELECT doc_id, p, e,
        |          sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS gid
        |        FROM mrk)
        |  GROUP BY doc_id, gid),
        |headseg AS (
        |  SELECT s.doc_id, s.span_start AS ord,
        |    substring(c.text,
        |      CAST(coalesce(lag(s.span_end) OVER (PARTITION BY s.doc_id
        |        ORDER BY s.span_start), 0) + 1 AS INT),
        |      CAST(s.span_start - coalesce(lag(s.span_end) OVER (
        |        PARTITION BY s.doc_id ORDER BY s.span_start), 0) - 1 AS INT)) AS seg
        |  FROM spans s JOIN allb c USING (doc_id)),
        |tailseg AS (
        |  SELECT s.doc_id, 2000000000 AS ord,
        |    substring(c.text, CAST(max(s.span_end) AS INT) + 1) AS seg
        |  FROM spans s JOIN allb c USING (doc_id)
        |  GROUP BY s.doc_id, c.text),
        |clean AS (
        |  SELECT doc_id, string_agg(seg, '' ORDER BY ord) AS text_clean
        |  FROM (SELECT * FROM headseg UNION ALL SELECT * FROM tailseg)
        |  GROUP BY doc_id),
        |cut AS (
        |  SELECT f.doc_id, coalesce(cl.text_clean, f.text) AS text
        |  FROM allb f LEFT JOIN clean cl USING (doc_id)),
        |st AS (
        |  SELECT doc_id, text,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |    CAST(length(text) AS BIGINT) AS n_len,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
        |    CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|is)\b')) AS BIGINT) AS en_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(le|la|et|les|des)\b')) AS BIGINT) AS fr_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(el|los|las|y|que)\b')) AS BIGINT) AS es_n,
        |    CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist)\b')) AS BIGINT) AS de_n
        |  FROM cut),
        |q AS (
        |  SELECT doc_id, text, n_tokens,
        |    CAST(n_tokens >= 10 AS INT) + CAST(n_tokens <= 1000 AS INT)
        |      + CAST(CAST(n_len AS DOUBLE)/NULLIF(n_tokens, 0) >= 3
        |              AND CAST(n_len AS DOUBLE)/NULLIF(n_tokens, 0) <= 12 AS INT)
        |      + CAST(CAST(n_alpha AS DOUBLE)/NULLIF(n_len, 0) > 0.7 AS INT) AS quality_score,
        |    CASE WHEN en_n >= fr_n AND en_n >= es_n AND en_n >= de_n THEN 'en'
        |         WHEN fr_n >= es_n AND fr_n >= de_n THEN 'fr'
        |         WHEN es_n >= de_n THEN 'es' ELSE 'de' END AS pred_lang
        |  FROM st)
        |SELECT doc_id, n_tokens, quality_score, pred_lang,
        |  CASE WHEN b < 8000 THEN 'train' WHEN b < 9000 THEN 'val' ELSE 'test' END AS split,
        |  md5(text) AS clean_md5
        |FROM (SELECT *,
        |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8)) AS BIGINT)
        |          % 10000 AS b
        |      FROM q WHERE quality_score >= 3 AND pred_lang = 'en')
        |ORDER BY doc_id""".stripMargin,
    "q_o5_progress" ->
      """SELECT total, completed, failed,
        |  CASE WHEN completed = 0 THEN NULL
        |       ELSE CAST(round(elapsed * (total - completed) / CAST(completed AS DOUBLE)) AS BIGINT)
        |  END AS eta_ms,
        |  total - completed - failed AS pending,
        |  (SELECT count(*) FROM nation) + (SELECT count(*) FROM region) AS rows_copied,
        |  TRUE AS live_run_ok
        |FROM (VALUES
        |  (CAST(4 AS BIGINT), CAST(4 AS BIGINT), CAST(0 AS BIGINT), CAST(2000 AS BIGINT)),
        |  (8, 1, 0, 1000), (10, 0, 0, 500), (100, 25, 5, 60000)) t(total, completed, failed, elapsed)
        |ORDER BY total""".stripMargin,
    "q_asof" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
        |           FROM events),
        |u AS (
        |  SELECT user_id, ts_us AS t, 0 AS tag, event_id AS tie,
        |         event_id AS r_eid, value AS r_val,
        |         CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS BIGINT) AS ts_us
        |  FROM e WHERE event_type = 'purchase' AND value IS NOT NULL
        |  UNION ALL
        |  SELECT user_id, ts_us, 1, 0,
        |         CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), event_id, ts_us
        |  FROM e WHERE event_type = 'click'),
        |c AS (
        |  SELECT user_id, tag, event_id, ts_us,
        |    last_value(r_eid IGNORE NULLS) OVER w AS ref_event_id,
        |    last_value(r_val IGNORE NULLS) OVER w AS ref_value
        |  FROM u
        |  WINDOW w AS (PARTITION BY user_id ORDER BY t, tag, tie
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, ts_us, ref_event_id, ref_value
        |FROM c WHERE tag = 1 ORDER BY event_id""".stripMargin,
    "q_asof_next" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
        |           FROM events),
        |u AS (
        |  SELECT user_id, ts_us AS t, 0 AS tag, event_id AS tie,
        |         ts_us AS r_ts, event_id AS r_eid, value AS r_val,
        |         CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS BIGINT) AS ts_us
        |  FROM e WHERE event_type = 'purchase' AND value IS NOT NULL
        |  UNION ALL
        |  SELECT user_id, ts_us, 1, 0,
        |         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |         CAST(NULL AS DOUBLE), event_id, ts_us
        |  FROM e WHERE event_type = 'click'),
        |c AS (
        |  SELECT user_id, tag, event_id, ts_us,
        |    last_value(r_ts IGNORE NULLS) OVER w AS ref_ts_us,
        |    last_value(r_eid IGNORE NULLS) OVER w AS ref_event_id,
        |    last_value(r_val IGNORE NULLS) OVER w AS ref_value
        |  FROM u
        |  WINDOW w AS (PARTITION BY user_id ORDER BY t DESC, tag, tie DESC
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, ts_us, ref_ts_us, ref_event_id, ref_value
        |FROM c WHERE tag = 1 ORDER BY event_id""".stripMargin,
    "q_asof_within" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
        |           FROM events),
        |u AS (
        |  SELECT user_id, ts_us AS t, 0 AS tag, event_id AS tie,
        |         ts_us AS r_ts, event_id AS r_eid, value AS r_val,
        |         CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS BIGINT) AS ts_us
        |  FROM e WHERE event_type = 'purchase' AND value IS NOT NULL
        |  UNION ALL
        |  SELECT user_id, ts_us, 1, 0,
        |         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |         CAST(NULL AS DOUBLE), event_id, ts_us
        |  FROM e WHERE event_type = 'click'),
        |c AS (
        |  SELECT user_id, tag, event_id, ts_us,
        |    last_value(r_ts IGNORE NULLS) OVER w AS m_ts,
        |    last_value(r_eid IGNORE NULLS) OVER w AS m_eid,
        |    last_value(r_val IGNORE NULLS) OVER w AS m_val
        |  FROM u
        |  WINDOW w AS (PARTITION BY user_id ORDER BY t, tag, tie
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, ts_us,
        |  CASE WHEN m_ts IS NOT NULL AND ts_us - m_ts <= 3600000000
        |       THEN m_eid END AS ref_event_id,
        |  CASE WHEN m_ts IS NOT NULL AND ts_us - m_ts <= 3600000000
        |       THEN m_val END AS ref_value
        |FROM c WHERE tag = 1 ORDER BY event_id""".stripMargin,
    "q_attribution" ->
      """SELECT o.event_id AS open_id, p.event_id AS point_id, o.user_id,
        |  epoch_us(o.ts) AS open_us, epoch_us(p.ts) AS point_us
        |FROM events o JOIN events p
        |  ON o.user_id = p.user_id
        | AND o.event_type = 'view' AND p.event_type = 'purchase'
        | AND epoch_us(p.ts) >= epoch_us(o.ts)
        | AND epoch_us(p.ts) < epoch_us(o.ts) + 3600000000
        |ORDER BY open_id, point_id""".stripMargin,
    "q_resample" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id, value
        |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
        |spans AS (SELECT user_id, min(t) AS lo, max(t) AS hi FROM e GROUP BY 1),
        |grid AS (SELECT user_id,
        |    unnest(generate_series(lo // 86400000000 * 86400000000, hi,
        |      86400000000)) AS g
        |  FROM spans),
        |u AS (
        |  SELECT user_id, t, 0 AS tag, event_id AS tie,
        |         event_id AS r_eid, value AS r_val,
        |         CAST(NULL AS BIGINT) AS ts_us
        |  FROM e
        |  UNION ALL
        |  SELECT user_id, g, 1, 0,
        |         CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), g
        |  FROM grid),
        |c AS (
        |  SELECT user_id, tag, ts_us,
        |    last_value(r_eid IGNORE NULLS) OVER w AS ref_event_id,
        |    last_value(r_val IGNORE NULLS) OVER w AS ref_value
        |  FROM u
        |  WINDOW w AS (PARTITION BY user_id ORDER BY t, tag, tie
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, ts_us, ref_event_id, ref_value
        |FROM c WHERE tag = 1 ORDER BY user_id, ts_us""".stripMargin,
    "q_range_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
        |           FROM events),
        |p AS (SELECT event_id AS purchase_id, user_id, ts_us FROM e
        |      WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts_us FROM e WHERE event_type = 'click')
        |SELECT p.purchase_id,
        |  count(c.ts_us) AS n_clicks,
        |  min(c.ts_us) AS first_click_us
        |FROM p LEFT JOIN c
        |  ON c.user_id = p.user_id
        | AND c.ts_us >= p.ts_us AND c.ts_us < p.ts_us + 3600000000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_zorder" ->
      s"""WITH e AS (SELECT user_id AS u, epoch_us(ts) // 86400000000 AS d
         |           FROM events),
         |z AS (SELECT u, d, ${ops.ZOrder.zvalueSql("u", "d", 16)} AS z FROM e)
         |SELECT z >> 8 AS zone, count(*) AS n_rows,
         |  min(u) AS x_min, max(u) AS x_max,
         |  min(d) AS y_min, max(d) AS y_max
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_zorder_norm" ->
      s"""WITH e AS (SELECT user_id AS u, epoch_us(ts) // 86400000000 AS d
         |           FROM events),
         |b AS (SELECT min(u) AS mu, max(u) AS xu, min(d) AS md, max(d) AS xd
         |      FROM e),
         |q AS (SELECT u, d,
         |        CAST(floor((u - mu) * 65536 / (xu - mu + 1)) AS BIGINT) AS qu,
         |        CAST(floor((d - md) * 65536 / (xd - md + 1)) AS BIGINT) AS qd
         |      FROM e CROSS JOIN b),
         |z AS (SELECT u, d, ${ops.ZOrder.zvalueSql("qu", "qd", 16)} AS z FROM q)
         |SELECT z >> 26 AS zone, count(*) AS n_rows,
         |  min(u) AS u_min, max(u) AS u_max,
         |  min(d) AS d_min, max(d) AS d_max
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n_items
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "q_cube" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  count(*) AS n_orders
        |FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
        |ORDER BY gid, o_orderpriority, o_orderstatus""".stripMargin,
    "q_topk_group" ->
      """WITH t AS (SELECT lang, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
        |           FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT lang, tok, count(*) AS n FROM t GROUP BY 1, 2),
        |r AS (SELECT lang, tok, n,
        |        row_number() OVER (PARTITION BY lang ORDER BY n DESC, tok) AS rank
        |      FROM c)
        |SELECT lang, rank, tok, n FROM r WHERE rank <= 5
        |ORDER BY lang, rank""".stripMargin,
    "q_scd2" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id, event_type
        |           FROM events),
        |m AS (SELECT user_id, t, event_id, event_type,
        |        CASE WHEN event_type IS NOT DISTINCT FROM lag(event_type) OVER w
        |             THEN 0 ELSE 1 END AS chg
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |i AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY t, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |      FROM m),
        |g AS (SELECT user_id, island, min(event_type) AS event_type,
        |        min(t) AS valid_from, count(*) AS n_obs
        |      FROM i GROUP BY 1, 2)
        |SELECT user_id, event_type, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id
        |    ORDER BY valid_from, island) AS valid_to,
        |  n_obs
        |FROM g ORDER BY user_id, valid_from""".stripMargin,
    "q_binpack" ->
      """WITH r AS (SELECT doc_id, n_chars,
        |             md5(CAST(doc_id AS VARCHAR) || '#v0') AS rk
        |           FROM documents),
        |s AS (SELECT *, CAST(floor(CAST(('0x' || substr(rk, 1, 4)) AS BIGINT)
        |        * 64 / 65536) AS INT) AS shard FROM r),
        |p AS (SELECT *, coalesce(sum(n_chars) OVER (PARTITION BY shard
        |        ORDER BY rk, doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS loc
        |      FROM s),
        |o AS (SELECT shard, sum(n_chars) AS b FROM s GROUP BY 1),
        |o2 AS (SELECT shard, coalesce(sum(b) OVER (ORDER BY shard
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        |       FROM o)
        |SELECT CAST((o2.off + p.loc) // 16384 AS BIGINT) AS bin,
        |  count(*) AS n_docs, CAST(sum(p.n_chars) AS BIGINT) AS bytes
        |FROM p JOIN o2 USING (shard)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_anti" ->
      """SELECT p_partkey FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 49)
        |ORDER BY p_partkey""".stripMargin,
    "q_setops" ->
      """SELECT o_custkey, 'both' AS tag FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |UNION ALL
        |SELECT o_custkey, 'f_only' AS tag FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |ORDER BY tag, o_custkey""".stripMargin,
    "q_approx_distinct" ->
      """SELECT lang, count(DISTINCT doc_id) AS n_exact, TRUE AS approx_ok
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_session_stats" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        |g AS (
        |  SELECT user_id, ts_us,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |           OR ts_us - lag(ts_us) OVER w > 3600000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
        |s AS (
        |  SELECT user_id, ts_us,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g),
        |sess AS (
        |  SELECT (max(ts_us) - min(ts_us)) // 1000 AS dur_ms,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM s GROUP BY user_id, sid),
        |hist AS (SELECT dur_ms AS v, count(*) AS cnt FROM sess GROUP BY 1),
        |cum AS (SELECT v, CAST(sum(cnt) OVER
        |          (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |        FROM hist),
        |ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sess),
        |t AS (SELECT q_mille, n,
        |        (n-1) * q_mille // 1000 AS idx,
        |        (n-1) * q_mille % 1000 AS rem,
        |        least((n-1) * q_mille // 1000 + 1, n-1) AS idx2
        |      FROM (VALUES (500),(900)) q(q_mille), ns),
        |a AS (SELECT t.q_mille, t.rem, min(c.v) AS v_lo,
        |        min(CASE WHEN c.cum > t.idx2 THEN c.v END) AS v_hi
        |      FROM t JOIN cum c ON c.cum > t.idx GROUP BY 1, 2),
        |q AS (SELECT
        |    max(CASE WHEN q_mille = 500 THEN
        |      1000 * v_lo + (coalesce(v_hi, v_lo) - v_lo) * rem END)
        |      AS dur_p50_milli_ms,
        |    max(CASE WHEN q_mille = 900 THEN
        |      1000 * v_lo + (coalesce(v_hi, v_lo) - v_lo) * rem END)
        |      AS dur_p90_milli_ms
        |  FROM a),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions,
        |         CAST(sum(n_events) AS BIGINT) AS n_events,
        |         max(dur_ms) AS dur_max_ms FROM sess)
        |SELECT n_sessions, dur_p50_milli_ms, dur_p90_milli_ms, n_events,
        |  dur_max_ms
        |FROM st, q""".stripMargin,
    "q_window_users" ->
      """SELECT epoch_us(ts) // 3600000000 AS hour,
        |  count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_profile" ->
      """WITH m AS (SELECT
        |  count(*) - count(o_orderkey) AS null_k, count(DISTINCT o_orderkey) AS nd_k,
        |    CAST(min(o_orderkey) AS VARCHAR) AS mn_k, CAST(max(o_orderkey) AS VARCHAR) AS mx_k,
        |  count(*) - count(o_custkey) AS null_c, count(DISTINCT o_custkey) AS nd_c,
        |    CAST(min(o_custkey) AS VARCHAR) AS mn_c, CAST(max(o_custkey) AS VARCHAR) AS mx_c,
        |  count(*) - count(o_orderstatus) AS null_s, count(DISTINCT o_orderstatus) AS nd_s,
        |    min(o_orderstatus) AS mn_s, max(o_orderstatus) AS mx_s,
        |  count(*) - count(o_totalprice) AS null_p, count(DISTINCT o_totalprice) AS nd_p,
        |    CAST(CAST(floor(min(o_totalprice) * 1000) AS BIGINT) AS VARCHAR) AS mn_p,
        |    CAST(CAST(floor(max(o_totalprice) * 1000) AS BIGINT) AS VARCHAR) AS mx_p,
        |  count(*) - count(o_orderdate) AS null_d, count(DISTINCT o_orderdate) AS nd_d,
        |    CAST(epoch_us(min(o_orderdate)) AS VARCHAR) AS mn_d,
        |    CAST(epoch_us(max(o_orderdate)) AS VARCHAR) AS mx_d,
        |  count(*) - count(o_orderpriority) AS null_o, count(DISTINCT o_orderpriority) AS nd_o,
        |    min(o_orderpriority) AS mn_o, max(o_orderpriority) AS mx_o
        |  FROM orders)
        |SELECT * FROM (
        |  SELECT 'o_orderkey' AS "column", null_k AS n_null, nd_k AS n_distinct,
        |         mn_k AS min_canon, mx_k AS max_canon FROM m
        |  UNION ALL SELECT 'o_custkey', null_c, nd_c, mn_c, mx_c FROM m
        |  UNION ALL SELECT 'o_orderstatus', null_s, nd_s, mn_s, mx_s FROM m
        |  UNION ALL SELECT 'o_totalprice', null_p, nd_p, mn_p, mx_p FROM m
        |  UNION ALL SELECT 'o_orderdate', null_d, nd_d, mn_d, mx_d FROM m
        |  UNION ALL SELECT 'o_orderpriority', null_o, nd_o, mn_o, mx_o FROM m)
        |ORDER BY "column"""".stripMargin,
    "q_profile_approx" ->
      """WITH m AS (SELECT
        |  count(*) - count(o_orderkey) AS null_k, count(DISTINCT o_orderkey) AS nd_k,
        |    CAST(min(o_orderkey) AS VARCHAR) AS mn_k, CAST(max(o_orderkey) AS VARCHAR) AS mx_k,
        |  count(*) - count(o_custkey) AS null_c, count(DISTINCT o_custkey) AS nd_c,
        |    CAST(min(o_custkey) AS VARCHAR) AS mn_c, CAST(max(o_custkey) AS VARCHAR) AS mx_c,
        |  count(*) - count(o_orderstatus) AS null_s, count(DISTINCT o_orderstatus) AS nd_s,
        |    min(o_orderstatus) AS mn_s, max(o_orderstatus) AS mx_s,
        |  count(*) - count(o_totalprice) AS null_p, count(DISTINCT o_totalprice) AS nd_p,
        |    CAST(CAST(floor(min(o_totalprice) * 1000) AS BIGINT) AS VARCHAR) AS mn_p,
        |    CAST(CAST(floor(max(o_totalprice) * 1000) AS BIGINT) AS VARCHAR) AS mx_p,
        |  count(*) - count(o_orderdate) AS null_d, count(DISTINCT o_orderdate) AS nd_d,
        |    CAST(epoch_us(min(o_orderdate)) AS VARCHAR) AS mn_d,
        |    CAST(epoch_us(max(o_orderdate)) AS VARCHAR) AS mx_d,
        |  count(*) - count(o_orderpriority) AS null_o, count(DISTINCT o_orderpriority) AS nd_o,
        |    min(o_orderpriority) AS mn_o, max(o_orderpriority) AS mx_o
        |  FROM orders)
        |SELECT *, TRUE AS approx_ok FROM (
        |  SELECT 'o_orderkey' AS "column", null_k AS n_null, nd_k AS n_distinct,
        |         mn_k AS min_canon, mx_k AS max_canon FROM m
        |  UNION ALL SELECT 'o_custkey', null_c, nd_c, mn_c, mx_c FROM m
        |  UNION ALL SELECT 'o_orderstatus', null_s, nd_s, mn_s, mx_s FROM m
        |  UNION ALL SELECT 'o_totalprice', null_p, nd_p, mn_p, mx_p FROM m
        |  UNION ALL SELECT 'o_orderdate', null_d, nd_d, mn_d, mx_d FROM m
        |  UNION ALL SELECT 'o_orderpriority', null_o, nd_o, mn_o, mx_o FROM m)
        |ORDER BY "column"""".stripMargin,
    "q_retention" ->
      """WITH a AS (SELECT DISTINCT user_id AS u,
        |             epoch_us(ts) // 86400000000 AS p
        |           FROM events),
        |c AS (SELECT u, min(p) AS cohort FROM a GROUP BY 1)
        |SELECT c.cohort, a.p - c.cohort AS k, count(*) AS n_users
        |FROM a JOIN c USING (u)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_calendar" ->
      """WITH o AS (SELECT o_orderdate AS ts,
        |             CAST(o_totalprice AS DECIMAL(18,2)) AS price,
        |             epoch_us(o_orderdate) // 86400000000 AS epoch_day
        |           FROM orders)
        |SELECT CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
        |  count(*) AS n_orders,
        |  CAST(sum(price) AS DOUBLE) AS sum_price,
        |  CAST(sum(CASE WHEN (epoch_day + 4) % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sunday,
        |  CAST(sum(CASE WHEN (epoch_day + 4) % 7 IN (0, 6) THEN 1 ELSE 0 END) AS BIGINT) AS n_weekend
        |FROM o GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_ohlc" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |             CAST(floor(value * 1000) AS BIGINT) AS v_milli
        |           FROM events WHERE value IS NOT NULL),
        |h AS (SELECT user_id, ts_us // 3600000000 AS bar, ts_us, event_id,
        |        v_milli FROM e)
        |SELECT user_id, bar,
        |  (min(struct_pack(a := ts_us, b := event_id, c := v_milli))).c AS open_milli,
        |  max(v_milli) AS high_milli, min(v_milli) AS low_milli,
        |  (max(struct_pack(a := ts_us, b := event_id, c := v_milli))).c AS close_milli,
        |  count(*) AS n
        |FROM h GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_incr_agg" ->
      """SELECT user_id AS key, count(*) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS s,
        |  min(event_id) AS mn, max(event_id) AS mx
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pagerank" ->
      """WITH e0 AS (SELECT DISTINCT
        |         'c' || CAST(o.o_custkey AS VARCHAR) AS src,
        |         'p' || CAST(l.l_partkey AS VARCHAR) AS dst
        |       FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
        |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
        |i1 AS (SELECT e.dst AS node, sum(r0.r // deg.d) AS inc
        |       FROM e JOIN deg USING (src) JOIN r0 ON r0.node = e.src
        |       GROUP BY 1),
        |r1 AS (SELECT node, CAST(150000 + (inc * 85) // 100 AS BIGINT) AS r
        |       FROM i1),
        |i2 AS (SELECT e.dst AS node, sum(r1.r // deg.d) AS inc
        |       FROM e JOIN deg USING (src) JOIN r1 ON r1.node = e.src
        |       GROUP BY 1)
        |SELECT node, CAST(150000 + (inc * 85) // 100 AS BIGINT) AS r
        |FROM i2 ORDER BY node""".stripMargin,
    "q_above_avg" ->
      """WITH c AS (SELECT c_nationkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |           FROM customer),
        |st AS (SELECT c_nationkey, sum(bal) AS s, count(*) AS n_c
        |       FROM c GROUP BY 1)
        |SELECT c.c_nationkey, count(*) AS n_above
        |FROM c JOIN st USING (c_nationkey)
        |WHERE c.bal * st.n_c > st.s
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_window_suite" ->
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER w AS rn,
        |  lag(o_orderkey, 1) OVER w AS prev_key,
        |  lead(o_orderkey, 1) OVER w AS next_key,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_group_quantiles" ->
      """SELECT lang, quantile_cont(n_chars, 0.5) AS p50,
        |  quantile_cont(n_chars, 0.9) AS p90, count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_group_quantiles_hist" ->
      """WITH vals AS (SELECT lang, CAST(n_chars AS BIGINT) AS v
        |  FROM documents WHERE n_chars IS NOT NULL),
        |hist AS (SELECT lang, v, count(*) AS cnt FROM vals GROUP BY 1, 2),
        |cum AS (SELECT lang, v, CAST(sum(cnt) OVER
        |          (PARTITION BY lang ORDER BY v ROWS UNBOUNDED PRECEDING)
        |          AS BIGINT) AS cum
        |        FROM hist),
        |ns AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
        |       FROM vals GROUP BY 1),
        |t AS (SELECT lang, q_mille, n,
        |        (n-1) * q_mille // 1000 AS idx,
        |        (n-1) * q_mille % 1000 AS rem,
        |        least((n-1) * q_mille // 1000 + 1, n-1) AS idx2
        |      FROM (VALUES (500),(900)) q(q_mille), ns),
        |a AS (SELECT t.lang, t.q_mille, t.n, t.rem, min(c.v) AS v_lo,
        |        min(CASE WHEN c.cum > t.idx2 THEN c.v END) AS v_hi
        |      FROM t JOIN cum c ON c.lang = t.lang AND c.cum > t.idx
        |      GROUP BY 1, 2, 3, 4)
        |SELECT lang, CAST(q_mille AS INT) AS q_mille, n AS n_rows, v_lo,
        |  coalesce(v_hi, v_lo) AS v_hi,
        |  1000 * v_lo + (coalesce(v_hi, v_lo) - v_lo) * rem AS value_milli
        |FROM a ORDER BY lang, q_mille""".stripMargin,
    "q_transitions" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |           FROM events),
        |t AS (SELECT event_type AS from_type,
        |        lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |          AS to_type
        |      FROM e)
        |SELECT from_type, to_type, count(*) AS n
        |FROM t WHERE to_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_tpch3" ->
      """SELECT l.l_orderkey, epoch_us(o.o_orderdate) AS order_us,
        |  CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_centi
        |FROM customer c
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND epoch_us(o.o_orderdate) < 883612800000000
        |  AND epoch_us(l.l_shipdate) > 883612800000000
        |GROUP BY 1, 2
        |ORDER BY revenue_centi DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q_tpch5" ->
      """SELECT n.n_name,
        |  CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_centi
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  AND s.s_nationkey = c.c_nationkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |GROUP BY 1
        |ORDER BY revenue_centi DESC, n_name""".stripMargin,
    "q_itemsets" ->
      """WITH bi AS (SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS b,
        |    CAST(l_partkey AS BIGINT) AS i
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |freq AS (SELECT i FROM bi GROUP BY 1 HAVING count(*) >= 10),
        |pr AS (SELECT bi.* FROM bi WHERE i IN (SELECT i FROM freq)),
        |ok AS (SELECT b FROM pr GROUP BY 1 HAVING count(*) <= 1000),
        |kept AS (SELECT pr.* FROM pr WHERE b IN (SELECT b FROM ok))
        |SELECT a.i AS item_a, k.i AS item_b, count(*) AS n_baskets
        |FROM kept a JOIN kept k ON a.b = k.b AND a.i < k.i
        |GROUP BY 1, 2
        |HAVING count(*) >= 2
        |ORDER BY 1, 2""".stripMargin,
    "q_profile_drift" ->
      """WITH ma AS (SELECT
        |    count(*) - count(n_nationkey) AS null_k,
        |    count(DISTINCT n_nationkey) AS nd_k,
        |    CAST(min(n_nationkey) AS VARCHAR) AS mn_k,
        |    CAST(max(n_nationkey) AS VARCHAR) AS mx_k,
        |    count(*) - count(n_name) AS null_n, count(DISTINCT n_name) AS nd_n,
        |    min(n_name) AS mn_n, max(n_name) AS mx_n,
        |    count(*) - count(n_regionkey) AS null_r,
        |    count(DISTINCT n_regionkey) AS nd_r,
        |    CAST(min(n_regionkey) AS VARCHAR) AS mn_r,
        |    CAST(max(n_regionkey) AS VARCHAR) AS mx_r
        |  FROM nation),
        |mb AS (SELECT
        |    count(*) - count(n_nationkey) AS null_k,
        |    count(DISTINCT n_nationkey) AS nd_k,
        |    CAST(min(n_nationkey) AS VARCHAR) AS mn_k,
        |    CAST(max(n_nationkey) AS VARCHAR) AS mx_k,
        |    count(*) - count(n_name) AS null_n, count(DISTINCT n_name) AS nd_n,
        |    min(n_name) AS mn_n, max(n_name) AS mx_n,
        |    count(*) - count(n_regionkey) AS null_r,
        |    count(DISTINCT n_regionkey) AS nd_r,
        |    CAST(min(n_regionkey) AS VARCHAR) AS mn_r,
        |    CAST(max(n_regionkey) AS VARCHAR) AS mx_r
        |  FROM nation WHERE n_nationkey < 20),
        |pa AS (
        |  SELECT 'n_nationkey' AS "column", null_k AS n_null, nd_k AS n_distinct,
        |         mn_k AS mn, mx_k AS mx FROM ma
        |  UNION ALL SELECT 'n_name', null_n, nd_n, mn_n, mx_n FROM ma
        |  UNION ALL SELECT 'n_regionkey', null_r, nd_r, mn_r, mx_r FROM ma),
        |pb AS (
        |  SELECT 'n_nationkey' AS "column", null_k AS n_null, nd_k AS n_distinct,
        |         mn_k AS mn, mx_k AS mx FROM mb
        |  UNION ALL SELECT 'n_name', null_n, nd_n, mn_n, mx_n FROM mb
        |  UNION ALL SELECT 'n_regionkey', null_r, nd_r, mn_r, mx_r FROM mb)
        |SELECT pa."column", 'both' AS presence,
        |  pa.n_null AS n_null_a, pb.n_null AS n_null_b,
        |  pa.n_distinct AS n_distinct_a, pb.n_distinct AS n_distinct_b,
        |  (pa.mn IS DISTINCT FROM pb.mn OR pa.mx IS DISTINCT FROM pb.mx)
        |    AS bounds_changed
        |FROM pa JOIN pb USING ("column")
        |ORDER BY "column"""".stripMargin,
    "q_hll_daily" ->
      """SELECT CAST(count(DISTINCT epoch_us(ts) // 86400000000) AS BIGINT) AS n_days,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS merged_within_5pct
        |FROM events""".stripMargin,
    "q_triangles" ->
      """WITH bi AS (SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS b,
        |    CAST(l_partkey AS BIGINT) AS i
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |freq AS (SELECT i FROM bi GROUP BY 1 HAVING count(*) >= 10),
        |pr AS (SELECT bi.* FROM bi WHERE i IN (SELECT i FROM freq)),
        |ok AS (SELECT b FROM pr GROUP BY 1 HAVING count(*) <= 1000),
        |kept AS (SELECT pr.* FROM pr WHERE b IN (SELECT b FROM ok)),
        |ed AS (SELECT a.i AS a, k.i AS b
        |  FROM kept a JOIN kept k ON a.b = k.b AND a.i < k.i
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |nodes AS (SELECT a AS n FROM ed UNION SELECT b FROM ed)
        |SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_nodes,
        |  CAST((SELECT count(*) FROM ed) AS BIGINT) AS n_edges,
        |  CAST((SELECT count(*)
        |        FROM ed e1
        |        JOIN ed e2 ON e2.a = e1.a AND e2.b > e1.b
        |        JOIN ed e3 ON e3.a = e1.b AND e3.b = e2.b) AS BIGINT)
        |    AS n_triangles""".stripMargin,
    "q_assoc_rules" ->
      """WITH bi AS (SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS b,
        |    CAST(l_partkey AS BIGINT) AS i
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n FROM bi),
        |sup AS (SELECT i, CAST(count(*) AS BIGINT) AS n_i FROM bi GROUP BY 1),
        |freq AS (SELECT i FROM bi GROUP BY 1 HAVING count(*) >= 10),
        |pr AS (SELECT bi.* FROM bi WHERE i IN (SELECT i FROM freq)),
        |ok AS (SELECT b FROM pr GROUP BY 1 HAVING count(*) <= 1000),
        |kept AS (SELECT pr.* FROM pr WHERE b IN (SELECT b FROM ok)),
        |pairs AS (SELECT a.i AS item_a, k.i AS item_b,
        |    CAST(count(*) AS BIGINT) AS n_baskets
        |  FROM kept a JOIN kept k ON a.b = k.b AND a.i < k.i
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT p.item_a, p.item_b, p.n_baskets, sa.n_i AS n_a, sb.n_i AS n_b,
        |  p.n_baskets * 1000000 // sa.n_i AS conf_a_to_b_ppm,
        |  p.n_baskets * 1000000 // sb.n_i AS conf_b_to_a_ppm,
        |  CAST(floor(1000000.0 * (CAST(p.n_baskets AS DOUBLE) * CAST(nb.n AS DOUBLE))
        |    / (CAST(sa.n_i AS DOUBLE) * CAST(sb.n_i AS DOUBLE))) AS BIGINT) AS lift_ppm
        |FROM pairs p
        |JOIN sup sa ON sa.i = p.item_a
        |JOIN sup sb ON sb.i = p.item_b
        |CROSS JOIN nb
        |ORDER BY item_a, item_b""".stripMargin,
    "q_correlation" ->
      """WITH b AS (SELECT CAST(floor(value * 10) AS BIGINT) AS vd,
        |    (epoch_us(ts) // 3600000000) % 24 AS hr,
        |    ((epoch_us(ts) // 86400000000) + 4) % 7 AS wd
        |  FROM events),
        |u AS (
        |  SELECT 'value_deci' AS x_name, 'hour' AS y_name, vd AS x, hr AS y FROM b
        |  UNION ALL
        |  SELECT 'value_deci', 'weekday', vd, wd FROM b
        |  UNION ALL
        |  SELECT 'hour', 'weekday', hr, wd FROM b),
        |s AS (SELECT x_name, y_name,
        |    CAST(count(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN 1 END)
        |      AS BIGINT) AS n,
        |    CAST(coalesce(sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN x END), 0)
        |      AS BIGINT) AS sx,
        |    CAST(coalesce(sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN y END), 0)
        |      AS BIGINT) AS sy,
        |    CAST(coalesce(sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN x * x END), 0)
        |      AS BIGINT) AS sxx,
        |    CAST(coalesce(sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN y * y END), 0)
        |      AS BIGINT) AS syy,
        |    CAST(coalesce(sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN x * y END), 0)
        |      AS BIGINT) AS sxy
        |  FROM u GROUP BY 1, 2)
        |SELECT x_name, y_name, n, sx, sy, sxx, syy, sxy,
        |  CASE WHEN n > 1
        |        AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        |        AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
        |  THEN greatest(CAST(-1000000 AS BIGINT), least(CAST(1000000 AS BIGINT),
        |    CAST(floor(1000000.0 *
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |     * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) AS BIGINT)))
        |  END AS r_ppm
        |FROM s ORDER BY x_name, y_name""".stripMargin,
    "q_linkage" ->
      """WITH c AS (SELECT c_custkey AS id, c_name AS nm,
        |    CAST(c_nationkey AS VARCHAR) AS nk
        |  FROM customer),
        |p1 AS (SELECT id, nk || '|' || substr(nm, 16, 3) AS bk FROM c
        |       WHERE nm IS NOT NULL),
        |ok1 AS (SELECT bk FROM p1 GROUP BY 1 HAVING count(*) <= 1000),
        |pr1 AS (SELECT a.id AS ida, b.id AS idb
        |        FROM p1 a JOIN p1 b ON a.bk = b.bk AND a.id < b.id
        |        WHERE a.bk IN (SELECT bk FROM ok1)),
        |p2 AS (SELECT id, nk || '|' || substr(nm, 14, 3) AS bk FROM c
        |       WHERE nm IS NOT NULL),
        |ok2 AS (SELECT bk FROM p2 GROUP BY 1 HAVING count(*) <= 1000),
        |pr2 AS (SELECT a.id AS ida, b.id AS idb
        |        FROM p2 a JOIN p2 b ON a.bk = b.bk AND a.id < b.id
        |        WHERE a.bk IN (SELECT bk FROM ok2)),
        |u AS (SELECT DISTINCT ida, idb
        |      FROM (SELECT * FROM pr1 UNION ALL SELECT * FROM pr2))
        |SELECT u.ida AS c_custkey, u.idb AS id2,
        |  CAST(levenshtein(a.nm, b.nm) AS INT) AS dist
        |FROM u JOIN c a ON a.id = u.ida JOIN c b ON b.id = u.idb
        |WHERE levenshtein(a.nm, b.nm) <= 2
        |ORDER BY 1, 2""".stripMargin,
    "q_linkage_census" ->
      """WITH c AS (SELECT c_custkey AS id, c_name AS nm,
        |    CAST(c_nationkey AS VARCHAR) AS nk
        |  FROM customer),
        |p1 AS (SELECT nk || '|' || substr(nm, 16, 3) AS bk FROM c
        |       WHERE nm IS NOT NULL AND nk IS NOT NULL),
        |g1 AS (SELECT bk, count(*) AS n FROM p1 GROUP BY 1),
        |p2 AS (SELECT nk || '|' || substr(nm, 14, 3) AS bk FROM c
        |       WHERE nm IS NOT NULL AND nk IS NOT NULL),
        |g2 AS (SELECT bk, count(*) AS n FROM p2 GROUP BY 1)
        |SELECT CAST(0 AS BIGINT) AS pass, count(*) AS n_blocks,
        |  CAST(max(n) AS BIGINT) AS max_block,
        |  CAST(coalesce(sum(CASE WHEN n > 100 THEN n END), 0) AS BIGINT)
        |    AS n_dropped_rows
        |FROM g1
        |UNION ALL
        |SELECT 1, count(*), CAST(max(n) AS BIGINT),
        |  CAST(coalesce(sum(CASE WHEN n > 100 THEN n END), 0) AS BIGINT)
        |FROM g2
        |ORDER BY pass""".stripMargin,
    "q_linkage_score" ->
      """WITH c AS (SELECT c_custkey AS id, c_name AS nm,
        |    CAST(c_nationkey AS VARCHAR) AS nk,
        |    CAST(CAST(floor(c_acctbal / 1000) AS BIGINT) AS VARCHAR) AS area,
        |    c_mktsegment AS seg
        |  FROM customer),
        |p1 AS (SELECT id, nk || '|' || substr(nm, 16, 3) AS bk FROM c
        |       WHERE nm IS NOT NULL),
        |ok1 AS (SELECT bk FROM p1 GROUP BY 1 HAVING count(*) <= 1000),
        |pr1 AS (SELECT a.id AS ida, b.id AS idb
        |        FROM p1 a JOIN p1 b ON a.bk = b.bk AND a.id < b.id
        |        WHERE a.bk IN (SELECT bk FROM ok1)),
        |p2 AS (SELECT id, nk || '|' || substr(nm, 14, 3) AS bk FROM c
        |       WHERE nm IS NOT NULL),
        |ok2 AS (SELECT bk FROM p2 GROUP BY 1 HAVING count(*) <= 1000),
        |pr2 AS (SELECT a.id AS ida, b.id AS idb
        |        FROM p2 a JOIN p2 b ON a.bk = b.bk AND a.id < b.id
        |        WHERE a.bk IN (SELECT bk FROM ok2)),
        |u AS (SELECT DISTINCT ida, idb
        |      FROM (SELECT * FROM pr1 UNION ALL SELECT * FROM pr2)),
        |f AS (SELECT u.ida, u.idb,
        |    coalesce(levenshtein(a.nm, b.nm) <= 2, FALSE) AS ag_name,
        |    coalesce(a.area = b.area, FALSE) AS ag_area,
        |    coalesce(a.seg = b.seg, FALSE) AS ag_seg,
        |    coalesce(a.nk = b.nk, FALSE) AS ag_nat
        |  FROM u JOIN c a ON a.id = u.ida JOIN c b ON b.id = u.idb)
        |SELECT ida AS c_custkey, idb AS id2,
        |  CAST(CASE WHEN ag_name THEN 1 ELSE 0 END
        |     + CASE WHEN ag_area THEN 1 ELSE 0 END
        |     + CASE WHEN ag_seg THEN 1 ELSE 0 END
        |     + CASE WHEN ag_nat THEN 1 ELSE 0 END AS INT) AS n_agree,
        |  CAST(CASE WHEN ag_name THEN 6 ELSE -2 END
        |     + CASE WHEN ag_area THEN 2 ELSE -1 END
        |     + CASE WHEN ag_seg THEN 1 ELSE -1 END
        |     + CASE WHEN ag_nat THEN 1 ELSE -3 END AS INT) AS score
        |FROM f
        |WHERE CASE WHEN ag_name THEN 6 ELSE -2 END
        |    + CASE WHEN ag_area THEN 2 ELSE -1 END
        |    + CASE WHEN ag_seg THEN 1 ELSE -1 END
        |    + CASE WHEN ag_nat THEN 1 ELSE -3 END >= 6
        |ORDER BY 1, 2""".stripMargin,
    "q_curriculum" ->
      """WITH b AS (SELECT doc_id, n_chars // 500 AS bin,
        |    md5(CAST(doc_id AS VARCHAR) || '#cur1') AS rk
        |  FROM documents),
        |s AS (SELECT doc_id, bin, rk,
        |    CAST(CAST(('0x' || substr(rk, 1, 4)) AS BIGINT) * 8 // 65536 AS INT) AS shard
        |  FROM b)
        |SELECT doc_id, bin, shard,
        |  CAST(row_number() OVER (ORDER BY bin NULLS FIRST, rk, doc_id) - 1 AS BIGINT)
        |    AS pos
        |FROM s ORDER BY doc_id""".stripMargin,
    "q_pct_rank" ->
      """WITH r AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
        |    CAST(rank() OVER (ORDER BY n_chars) - 1 AS BIGINT) AS rank_lt,
        |    CAST(count(*) OVER () AS BIGINT) AS n_rows
        |  FROM documents WHERE n_chars IS NOT NULL)
        |SELECT doc_id, n_chars, rank_lt, n_rows,
        |  CASE WHEN n_rows > 1 THEN rank_lt * 1000000 // (n_rows - 1)
        |       ELSE CAST(0 AS BIGINT) END AS pr_ppm
        |FROM r ORDER BY doc_id""".stripMargin,
    "q_pct_rank_by" ->
      """WITH r AS (
        |  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
        |    CAST(rank() OVER (PARTITION BY lang ORDER BY n_chars) - 1 AS BIGINT)
        |      AS rank_lt,
        |    CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n_group
        |  FROM documents WHERE n_chars IS NOT NULL)
        |SELECT doc_id, lang, n_chars, rank_lt, n_group,
        |  CASE WHEN n_group > 1 THEN rank_lt * 1000000 // (n_group - 1)
        |       ELSE CAST(0 AS BIGINT) END AS pr_ppm
        |FROM r ORDER BY doc_id""".stripMargin,
    "q_stratified" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR) || '#st1'), doc_id)
        |      AS BIGINT) AS rank
        |  FROM documents)
        |SELECT doc_id, lang, rank FROM r WHERE rank <= 5
        |ORDER BY lang, rank""".stripMargin,
    "q_weighted_sample" ->
      """SELECT lang, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS chars_kept
        |FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#ws1'), 1, 8)) AS BIGINT)
        |        * 2000 < n_chars * 4294967296
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_edit_distance" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' near duplicate tail'
        |  FROM documents WHERE doc_id % 5 = 0),
        |s AS (SELECT doc_id,
        |        substr(text, greatest(length(text) - 63, 1), 64) AS sfx
        |      FROM corpus)
        |SELECT a.doc_id, CAST(levenshtein(a.sfx, b.sfx) AS BIGINT) AS dist
        |FROM s a JOIN s b ON b.doc_id = a.doc_id + 100000
        |WHERE a.doc_id < 100000
        |ORDER BY a.doc_id""".stripMargin,
    "q_dq_checks" ->
      """WITH w AS (SELECT
        |  count(o_orderkey) - count(DISTINCT o_orderkey) AS orderkey_unique,
        |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orderkey_not_null,
        |  CAST(sum(CASE WHEN NOT coalesce(o_totalprice > 0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS totalprice_positive,
        |  CAST(sum(CASE WHEN NOT coalesce(o_orderstatus IN ('F','O','P'), FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS status_domain,
        |  CAST(sum(CASE WHEN NOT coalesce(o_orderdate >= TIMESTAMP '1992-01-01'
        |        AND o_orderdate < TIMESTAMP '2000-01-01', FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS date_in_range
        |  FROM orders)
        |SELECT rule, n_violations, n_violations = 0 AS pass FROM (
        |  SELECT 'orderkey_unique' AS rule, orderkey_unique AS n_violations FROM w
        |  UNION ALL SELECT 'orderkey_not_null', orderkey_not_null FROM w
        |  UNION ALL SELECT 'totalprice_positive', totalprice_positive FROM w
        |  UNION ALL SELECT 'status_domain', status_domain FROM w
        |  UNION ALL SELECT 'date_in_range', date_in_range FROM w)
        |ORDER BY rule""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_heavy_hitters" ->
      """WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
        |r AS (SELECT user_id, n,
        |        row_number() OVER (ORDER BY n DESC, user_id) AS rank
        |      FROM c)
        |SELECT rank, user_id, n FROM r WHERE rank <= 10 ORDER BY rank""".stripMargin,
    "q_approx_quantile" ->
      """SELECT quantile_cont(n_chars, 0.25) AS p25,
        |  quantile_cont(n_chars, 0.50) AS p50,
        |  quantile_cont(n_chars, 0.90) AS p90,
        |  quantile_cont(n_chars, 0.99) AS p99,
        |  TRUE AS ok25, TRUE AS ok50, TRUE AS ok90, TRUE AS ok99
        |FROM documents""".stripMargin,
    "q_pivot" ->
      """SELECT epoch_us(ts) // 86400000000 AS day,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
