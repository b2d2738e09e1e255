package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Staged-index probe scaling: the measured evidence behind the
  * "probe cost scales with the batch, never the reference" claims.
  * For reference multiples 1×/3×/10× of the sf0.1 documents table and
  * ONE FIXED probe batch, each staged kind is staged (timed — the
  * one-time cost a service amortizes) and then probed twice (timed,
  * min — the per-batch cost it pays forever). The defensible contract,
  * and what the numbers must show:
  *
  *  - STAGE seconds grow with the reference (it builds the layout —
  *    census shuffle, postings aggregate, band signatures);
  *  - PROBE seconds grow at most at SCAN speed (the probe reads the
  *    batch's pruned partitions of a linearly-growing layout but never
  *    SHUFFLES anything reference-sized: the batch side broadcasts
  *    into scan-side semi-joins), and the stage/probe ratio WIDENS
  *    with the multiple — the amortization argument for staging at
  *    100 TB, where re-deriving the reference per admission batch is
  *    the cost that kills.
  *
  * Copies are token-salted (the ScaleSweep discipline) so the
  * reference multiples are genuinely distinct documents; the probe
  * batch is tail-mutated copies of MULT-0 docs, so its collision
  * surface is constant across multiples. Builder-side tooling — not
  * part of the driver contract.
  *
  * Usage: runMain graft.tools.ProbeSweep [sfDir]
  *        (SPARK_GRAFT_SWEEP_ONLY=census,lsh,bm25 filters kinds;
  *        SPARK_GRAFT_SWEEP_MULTS=1,3,10,30 overrides the multiples —
  *        the 30× point is where super-linear terms the 10× point
  *        hides would surface: file listing, guard scans;
  *        SPARK_GRAFT_SWEEP_BUCKETS=1024 overrides the staged bucket
  *        count (default 64) — the knob that keeps probes pruned once
  *        a batch's keys would otherwise touch every bucket: at 300×
  *        a 12k-hash batch saturates 64 buckets and the "pruned" scan
  *        is the whole layout; more buckets restore the fraction)
  */
object ProbeSweep {
  /** Copy-k id offset: k = 0 keeps the base ids (the probe batch is
    * tail-mutated mult-0 docs, so its collision surface must stay
    * constant); k > 0 copies sit at 1e11 + k·1e7 — ABOVE the probe
    * batches' 4e9 range, which a bare k·1e7 enters at k ≈ 400 (the
    * probes don't enforce new-ids, so a collision is semantically
    * harmless, but disjoint ranges keep the fixture honest through
    * 1000×). Built as ONE crossJoin against a range frame — the
    * per-copy union of earlier rounds explodes the plan at 1000+
    * branches. */
  private def copyId(idCol: String): org.apache.spark.sql.Column =
    col(idCol) + col("__k") * 10000000L +
      when(col("__k") > 0, lit(100000000000L)).otherwise(lit(0L))

  private def corpus(spark: SparkSession, dir: String, mult: Int): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull).select(col("doc_id"), col("text"))
    d.crossJoin(spark.range(mult.toLong).select(col("id").as("__k")))
      .select(copyId("doc_id").as("doc_id"),
        when(col("__k") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("c"), col("__k"), lit("_$1")))).as("text"))
  }

  /** Embedding-corpus multiples for the IVF-flat kind: copy k rotates
    * each vector's dims by k positions — a rotation is cosine-random
    * vs the original, so multiples are genuinely distinct admission
    * content (the token-salting analog for vectors). Rotations wrap at
    * the dim count, so a ≥ dims multiple carries exact cross-multiple
    * repeats — harmless for STAGE scaling (ids are distinct; the index
    * does not dedup), and the probe batch avoids the collision by
    * construction (see below). */
  private def vecCorpus(spark: SparkSession, dir: String, mult: Int): DataFrame = {
    val d = Tables.load(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"))
    val k = col("__k").cast("int")
    d.crossJoin(spark.range(mult.toLong).select(col("id").as("__k")))
      .select(copyId("vec_id").as("vec_id"),
        when(col("__k") === 0, col("embedding"))
          .otherwise(concat(
            slice(col("embedding"), k + lit(1), lit(1 << 20)),
            slice(col("embedding"), lit(1), k))).as("embedding"))
  }

  private def time(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = f
    ((System.nanoTime() - t0) / 1e9, n)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // shuffle partitions independently of cores: the stage side of the
    // exact census goes super-linear when its one-row-per-char shuffle
    // outgrows the fixed partition count (spill) — the production fix
    // is sizing partitions to census volume, measurable here
    val spark = GraftSession.create(s"local[$cpus]",
      sys.env.getOrElse("SPARK_GRAFT_SWEEP_PARTITIONS", cpus).toInt)
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.{Dedup, Retrieval, Substrings}

    // the FIXED probe batch: tail-mutated copies of 1-in-5 mult-0 docs
    // (same collision surface at every multiple) — materialized once.
    // Offset clears the corpus id space through mult ≥ 300 (copies sit
    // at k·10M; 2e9 used to collide with the k=200 copy's ids)
    val batch = corpus(spark, dir, 1).filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 4000000000L).as("doc_id"),
        concat(col("text"), lit(" probe batch tail")).as("text"))
      .localCheckpoint(true)
    val spark2 = spark
    import spark2.implicits._
    val queries = Seq((1L, "key table scan"), (2L, "fast merge batch window"))
      .toDF("query_id", "qtext").localCheckpoint(true)

    // the FIXED vector probe batch: half scaled copies of mult-0
    // vectors (cosine-invariant scaling ⇒ cos = 1 ⇒ rejected at every
    // multiple) + half NEGATED vectors (cos = −1 vs every rotation ⇒
    // admitted at every multiple — no rotation offset stays
    // admittable past dims multiples, negation does)
    val vbatch = {
      val d = vecCorpus(spark, dir, 1).filter(col("vec_id") % 5 === 0)
      d.select((col("vec_id") + 4000000000L).as("vec_id"),
          transform(col("embedding"), x => x * lit(1.0001f)).as("embedding"))
        .unionByName(d.select((col("vec_id") + 4100000000L).as("vec_id"),
          transform(col("embedding"), x => -x).as("embedding")))
        .localCheckpoint(true)
    }

    // (kind, stage into dir, probe returning a row count)
    val buckets = sys.env.getOrElse("SPARK_GRAFT_SWEEP_BUCKETS", "64").toInt
    val kinds: Seq[(String, (DataFrame, String) => Unit, String => Long)] = Seq(
      ("census", (ref, ix) => Substrings.stageGramCensus(ref, "doc_id",
          col("text"), k = 40, dir = ix, buckets = buckets,
          hash = Substrings.HashXxh64),
        ix => Substrings.newDupSpans(batch, "doc_id", col("text"), ix,
          maxChars = 0, selfDups = false).count()),
      ("anchored", (ref, ix) => Substrings.stageAnchorCensus(ref, "doc_id",
          col("text"), k = 40, guarantee = 64, dir = ix, buckets = buckets,
          hash = Substrings.HashXxh64),
        ix => Substrings.newAnchorSpans(batch, "doc_id", col("text"), ix,
          maxChars = 0, selfDups = false).count()),
      ("lsh", (ref, ix) => Dedup.stageBandIndex(ref, "doc_id", col("text"),
          ix, buckets = buckets),
        ix => Dedup.lshNewCandidatesStaged(batch, "doc_id", col("text"), ix)
          .count()),
      ("bm25", (ref, ix) => Retrieval.stageBm25(ref, "doc_id", col("text"),
          ix, buckets = buckets),
        ix => Retrieval.stagedBm25TopK(spark, ix, queries, "query_id",
          col("qtext"), k = 5).count()),
      ("fp", (ref, ix) => Dedup.stageFingerprints(ref, col("text"), ix,
          buckets = buckets),
        ix => Dedup.exactNewStaged(batch, "doc_id", col("text"), ix)
          .count()))
    // the vector kind rides the embeddings table, not documents — its
    // (stage, probe) pair closes over vecCorpus via stageRef below
    val vecKinds: Seq[(String, (DataFrame, String) => Unit, String => Long)] = Seq(
      ("flat", (ref, ix) => graft.ml.Similarity.stageIvfFlat(ref, "vec_id",
          "embedding", numCentroids = 64, dir = ix),
        ix => graft.ml.Similarity.vecNewStaged(vbatch, "vec_id",
          "embedding", ix, nprobe = 4).count()))
    val only = sys.env.get("SPARK_GRAFT_SWEEP_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val sel = (kinds ++ vecKinds).filter(k => only.forall(_.contains(k._1)))
    def refOf(name: String, mult: Int): DataFrame =
      if (name == "flat") vecCorpus(spark, dir, mult)
      else corpus(spark, dir, mult)

    // warm-up: stage+probe once at 1× so codegen/JIT is out of the
    // timed region
    for ((name, stage, probe) <- sel) {
      val ix = java.nio.file.Files.createTempDirectory(s"pswarm_$name").toString
      stage(refOf(name, 1), ix); probe(ix): Unit
    }
    val mults = sys.env.get("SPARK_GRAFT_SWEEP_MULTS")
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1, 3, 10, 30))
    // stage repeats (min-of-N, fresh dir each) — single stage runs on
    // this box spread up to 3× on GC/spill timing; min is the plan cost
    val stageReps = sys.env.getOrElse("SPARK_GRAFT_SWEEP_STAGE_REPS", "1").toInt
    for (mult <- mults; (name, stage, probe) <- sel) {
      spark.catalog.clearCache()
      // release the previous iteration's leaked probe blocks
      // (newDupSpans/lshNewCandidatesStaged return localCheckpoint'd
      // frames the sweep drops on the floor) before timing anything
      System.gc()
      val ref = refOf(name, mult)
      val runs = (1 to stageReps).map { _ =>
        val ix = java.nio.file.Files.createTempDirectory(s"ps_${name}_$mult").toString
        (time { stage(ref, ix); 0L }._1, ix)
      }
      val (stageSec, ix) = runs.minBy(_._1)
      val (p1, n) = time(probe(ix))
      val (p2, _) = time(probe(ix))
      println(f"""{"kind":"$name","mult":$mult,"stage_sec":$stageSec%.3f,""" +
        f""""probe_sec":${math.min(p1, p2)}%.3f,"probe_rows":$n,""" +
        f""""stage_reps":$stageReps,"buckets":$buckets}""")
    }
    spark.stop()
  }
}
