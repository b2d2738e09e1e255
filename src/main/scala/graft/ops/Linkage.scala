package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: find near-identical records
  * (dirty duplicates of the same real-world entity) WITHOUT the
  * all-pairs comparison — the structured-data sibling of the text
  * near-dup family in `graft.text.Dedup`.
  *
  * The classic shape (Fellegi–Sunter blocking): each PASS maps every
  * record to a deterministic block key (e.g. "nation + name suffix",
  * "nation + phone prefix"); only records sharing a block key in SOME
  * pass become candidate pairs; an exact similarity predicate then
  * verifies candidates. Multiple passes with different keys recover
  * the recall a single key loses (a typo in the suffix still collides
  * on the prefix pass) — the same union-of-bands trick as MinHash LSH,
  * with hand-chosen semantic bands.
  *
  * Scale shape at 10¹⁰ records:
  *  - each pass is ONE equi-self-join on its block key — hash
  *    exchange on the key, never a cross join;
  *  - degenerate blocks (the "JOHN SMITH" problem) are capped by a
  *    census, exactly as `Dedup.lshCandidates` caps hot LSH buckets:
  *    blocks over `maxBlock` are EXCLUDED (loudly countable via
  *    [[blockCensus]]) instead of silently exploding a quadratic pair
  *    set — cost is Σ block², bounded by `maxBlock`·rows;
  *  - pair verification (edit distance etc.) runs per CANDIDATE, so
  *    total cost tracks candidate output, never corpus².
  */
object Linkage {

  /** Candidate pairs from multi-pass blocking: records sharing any
    * pass's block key, as (`idCol`, `id2`) with id < id2, distinct
    * across passes. NULL block keys never match (unknown ≠ unknown).
    * Blocks larger than `maxBlock` are skipped (cap census:
    * [[blockCensus]]). */
  def candidates(df: DataFrame, idCol: String, passes: Seq[Column],
      maxBlock: Int = 1000): DataFrame = {
    require(passes.nonEmpty, "need at least one blocking pass")
    val perPass = passes.zipWithIndex.map { case (key, i) =>
      val b = df.select(col(idCol), key.cast("string").as("__bk"))
        .filter(col("__bk").isNotNull)
        .withColumn("__p", lit(i))
      val ok = b.groupBy("__p", "__bk").agg(count(lit(1)).as("__n"))
        .filter(col("__n") <= maxBlock)
        .select("__p", "__bk")
      val kept = b.join(ok, Seq("__p", "__bk"), "left_semi")
      kept.as("l").join(kept.as("r"),
          col("l.__bk") === col("r.__bk") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
        .select(col(s"l.$idCol").as(idCol), col(s"r.$idCol").as("id2"))
    }
    perPass.reduce(_ unionByName _).distinct()
  }

  /** Per-pass block-size census — how many records each pass's
    * over-`maxBlock` blocks would have dropped (the "no silent caps"
    * counterpart to [[candidates]]; a nonzero `n_dropped_rows` says
    * the pass key is too coarse). One groups-sized aggregate per
    * pass. */
  def blockCensus(df: DataFrame, idCol: String, passes: Seq[Column],
      maxBlock: Int = 1000): DataFrame = {
    require(passes.nonEmpty, "need at least one blocking pass")
    passes.zipWithIndex.map { case (key, i) =>
      df.select(key.cast("string").as("__bk"))
        .filter(col("__bk").isNotNull)
        .groupBy("__bk").agg(count(lit(1)).as("__n"))
        .agg(lit(i).as("pass"),
          count(lit(1)).as("n_blocks"),
          max(col("__n")).as("max_block"),
          sum(when(col("__n") > maxBlock, col("__n")).otherwise(0L))
            .as("n_dropped_rows"))
    }.reduce(_ unionByName _)
  }

  /** Verify candidate pairs by edit distance over `field`: attaches
    * both sides' values via two key joins (never re-blocking) and
    * keeps pairs with `levenshtein(a, b) <= maxDist`. The distance
    * runs THRESHOLDED (Spark's banded DP: O(maxDist·n) per pair and
    * an early exit on the |len(a)−len(b)| bound, returning −1 past
    * the threshold) instead of the full O(n·m) matrix — on long
    * fields the band is the difference between "per-candidate" and
    * "per-character²" verify cost. Surviving rows carry the TRUE
    * distance (≤ maxDist by construction), so the thresholded and
    * full computations emit identical output. */
  def verifyEdit(df: DataFrame, pairs: DataFrame, idCol: String,
      field: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val vals = df.select(col(idCol).as("__vid"), field.as("__f"))
    pairs
      .join(vals, col(idCol) === col("__vid")).drop("__vid")
      .withColumnRenamed("__f", "__fa")
      .join(vals, col("id2") === col("__vid")).drop("__vid")
      .select(col(idCol), col("id2"),
        levenshtein(col("__fa"), col("__f"), maxDist).as("dist"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
  }

  /** One field-comparison rule for [[scoreFields]]: the pair AGREES on
    * `field` when both sides are non-NULL and the edit distance is
    * ≤ `maxDist` (exact equality at 0); agreement contributes `agree`
    * to the match score, disagreement — including either side NULL —
    * contributes `disagree` (typically negative). The weights are the
    * INTEGER log-odds of the Fellegi–Sunter 1969 model
    * (log m/u rounded to ints): integer sums are associative, so the
    * score is exact on any partitioning and any oracle engine. */
  final case class FieldRule(name: String, field: Column, maxDist: Int,
      agree: Int, disagree: Int)

  /** Multi-field weighted verify (Fellegi–Sunter linkage scoring):
    * for each candidate pair, compare every rule's field, sum the
    * agreement/disagreement weights, and keep pairs scoring
    * ≥ `minScore`. Returns (`idCol`, id2, n_agree, score).
    *
    * Scale shape: exactly [[verifyEdit]]'s — two hash joins attach both
    * sides' field vectors to the CANDIDATE set (cost tracks candidates,
    * never corpus²), then every comparison is a narrow codegen'd
    * projection; the per-field edit distances run THRESHOLDED (banded
    * DP + early length-difference exit). One rule with `maxDist = 0`
    * is an exact-equality check at zero DP cost. */
  def scoreFields(df: DataFrame, pairs: DataFrame, idCol: String,
      rules: Seq[FieldRule], minScore: Int): DataFrame = {
    require(rules.nonEmpty, "need at least one field rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "field rule names must be distinct")
    val aSide = df.select(col(idCol).as("__vid") +:
      rules.map(r => r.field.as(s"__a_${r.name}")): _*)
    val bSide = df.select(col(idCol).as("__vid2") +:
      rules.map(r => r.field.as(s"__b_${r.name}")): _*)
    val joined = pairs
      .join(aSide, col(idCol) === col("__vid")).drop("__vid")
      .join(bSide, col("id2") === col("__vid2")).drop("__vid2")
    val agrees = rules.map { r =>
      val (a, b) = (col(s"__a_${r.name}"), col(s"__b_${r.name}"))
      val ag = if (r.maxDist == 0) a === b
        else levenshtein(a, b, r.maxDist).between(0, r.maxDist)
      coalesce(ag, lit(false)) // NULL on either side = disagreement
    }
    val score = agrees.zip(rules).map { case (ag, r) =>
      when(ag, lit(r.agree)).otherwise(lit(r.disagree))
    }.reduce(_ + _)
    val nAgree = agrees.map(_.cast("int")).reduce(_ + _)
    joined.select(col(idCol), col("id2"),
        nAgree.as("n_agree"), score.as("score"))
      .filter(col("score") >= minScore)
  }
}
