package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  // dirty-duplicate fixture: same entity with typos, plus distinct names
  private def recs = Seq(
    (1L, "ann smith", "a"),
    (2L, "ann smyth", "a"),  // 1 edit from 1 — shares prefix block
    (3L, "ann smith", "b"),  // same name, other region → different block
    (4L, "bob jones", "a"),
    (5L, "bob janes", "a"),  // 1 edit from 4
    (6L, "zzz zzzzz", "a")
  ).toDF("id", "name", "region")

  private def passes = Seq(
    concat($"region", lit("|"), substring($"name", 1, 4)),  // prefix
    concat($"region", lit("|"), substring($"name", 6, 4)))  // suffix

  test("candidates: multi-pass union, id<id2, distinct, nulls never match") {
    val out = Linkage.candidates(recs, "id", passes)
      .orderBy("id", "id2").as[(Long, Long)].collect().toSeq
    // prefix pass: {1,2,3?} — 3 is region b, so (1,2); {4,5} → (4,5)
    // suffix pass: smith/smyth differ at position 7 → (1,2) only via
    // prefix; smith suffix "mith"≠"myth"; jones/janes share "ones"? no —
    // positions 6..9: "jone"/"jane" differ → (4,5) only via prefix
    assert(out == Seq((1L, 2L), (4L, 5L)))
    val withNull = recs.union(Seq((7L, null: String, "a")).toDF)
    assert(Linkage.candidates(withNull, "id", passes)
      .filter($"id" === 7L || $"id2" === 7L).count() == 0)
  }

  test("candidates: over-maxBlock blocks are dropped and censused") {
    // one hot block: 5 records share region+prefix
    val hot = (1L to 5L).map(i => (i, "aaaa" + i, "x")).toDF("id", "name", "region")
    val key = Seq(concat($"region", lit("|"), substring($"name", 1, 4)))
    assert(Linkage.candidates(hot, "id", key, maxBlock = 4).count() == 0)
    assert(Linkage.candidates(hot, "id", key, maxBlock = 5).count() == 10)
    val cen = Linkage.blockCensus(hot, "id", key, maxBlock = 4)
      .select("n_blocks", "max_block", "n_dropped_rows")
      .as[(Long, Long, Long)].collect().head
    assert(cen == ((1L, 5L, 5L)))
  }

  test("verifyEdit keeps only pairs within the distance and equals brute force") {
    val cand = Linkage.candidates(recs, "id", passes)
    val out = Linkage.verifyEdit(recs, cand, "id", $"name", maxDist = 1)
      .orderBy("id").as[(Long, Long, Int)].collect().toSeq
    assert(out == Seq((1L, 2L, 1), (4L, 5L, 1)))
    // brute force within the blocking's declared scope (same region —
    // cross-region matches are out of scope by design): every
    // same-region dup in the fixture shares a block, so blocked ==
    // scoped-all-pairs at maxDist 1
    val all = recs.as("a").join(recs.as("b"),
        $"a.id" < $"b.id" && $"a.region" === $"b.region")
      .select($"a.id", $"b.id".as("id2"),
        levenshtein($"a.name", $"b.name").as("dist"))
      .filter($"dist" <= 1)
      .orderBy("id").as[(Long, Long, Int)].collect().toSeq
    assert(out == all)
  }

  test("scoreFields sums hand-computed Fellegi-Sunter weights; NULL disagrees") {
    // fixture with a second comparable field: phone area code
    val withPhone = Seq(
      (1L, "ann smith", "a", "212"),
      (2L, "ann smyth", "a", "212"),   // name≤1, area agree
      (4L, "bob jones", "a", "415"),
      (5L, "bob janes", "a", "718"),   // name≤1, area DISAGREE
      (6L, "zzz zzzzz", "a", null: String)
    ).toDF("id", "name", "region", "area")
    val cand = Linkage.candidates(withPhone, "id", Seq(
      concat($"region", lit("|"), substring($"name", 1, 4))))
    val rules = Seq(
      Linkage.FieldRule("name", $"name", 1, 5, -2),
      Linkage.FieldRule("area", $"area", 0, 2, -1))
    // (1,2): name agree +5, area agree +2 = 7, n_agree 2
    // (4,5): name agree +5, area disagree −1 = 4, n_agree 1
    val all = Linkage.scoreFields(withPhone, cand, "id", rules, minScore = -100)
      .orderBy("id").as[(Long, Long, Int, Int)].collect().toSeq
    assert(all == Seq((1L, 2L, 2, 7), (4L, 5L, 1, 4)))
    // threshold keeps only the both-field match
    val kept = Linkage.scoreFields(withPhone, cand, "id", rules, minScore = 5)
      .as[(Long, Long, Int, Int)].collect().toSeq
    assert(kept == Seq((1L, 2L, 2, 7)))
    // NULL on either side disagrees — never NULLs the score
    val nullCand = Seq((1L, 6L)).toDF("id", "id2")
    val n = Linkage.scoreFields(withPhone, nullCand, "id", rules, minScore = -100)
      .as[(Long, Long, Int, Int)].collect().head
    assert(n == ((1L, 6L, 0, -3)))
    // duplicate rule names would silently collide join columns: refuse
    intercept[IllegalArgumentException] {
      Linkage.scoreFields(withPhone, cand, "id",
        Seq(rules.head, rules.head), 0)
    }
  }

  test("candidates plans equi-joins on the block key, no cartesian product") {
    val plan = Linkage.candidates(recs, "id", passes)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }
}
