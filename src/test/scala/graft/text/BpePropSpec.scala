package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Property check of the run-parity window trick at the heart of
  * [[Bpe.applyMerge]]: on seeded-random symbol sequences over a tiny
  * alphabet (maximal same-char runs, the adversarial case), the
  * window-algebra merge must equal the naive sequential greedy
  * left-to-right fold — the semantics BPE is defined by. */
class BpePropSpec extends SparkSpec {
  import spark.implicits._

  private val r = new Random(7)

  /** Naive reference: scan left to right, merge (l, r) greedily. */
  private def seqMerge(syms: Vector[String], l: String,
      rr: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == rr) {
        out += (l + rr); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  test("applyMerge == sequential greedy fold on random run-heavy sequences") {
    val alphabet = Vector("a", "b")
    val cases = (0 until 80).map { i =>
      val syms = Vector.fill(1 + r.nextInt(12))(alphabet(r.nextInt(2)))
      (s"w$i", syms)
    }
    val df = cases
      .flatMap { case (w, syms) =>
        syms.zipWithIndex.map { case (s, p) => (w, 1L, p, s) }
      }
      .toDF("word", "freq", "pos", "sym")
    for ((l, rr) <- Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"))) {
      val got = Bpe.applyMerge(df, l, rr)
        .orderBy("word", "pos")
        .select("word", "sym").as[(String, String)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toVector).toMap
      cases.foreach { case (w, syms) =>
        val want = seqMerge(syms, l, rr)
        assert(got.getOrElse(w, Vector.empty) == want,
          s"word $w syms=$syms merge=($l,$rr)")
      }
    }
  }

  test("repeated merges reach the fixpoint the sequential fold reaches") {
    // chain merges the way training does: (a,a) then (aa,aa) then
    // (aa,a) — long runs exercise the parity rule across rounds
    val words = (0 until 25).map(i => (s"w$i", Vector.fill(1 + i % 13)("a")))
    var df = words
      .flatMap { case (w, syms) =>
        syms.zipWithIndex.map { case (s, p) => (w, 1L, p, s) }
      }
      .toDF("word", "freq", "pos", "sym")
    var ref = words.toMap
    for ((l, rr) <- Seq(("a", "a"), ("aa", "aa"), ("aa", "a"))) {
      df = Bpe.applyMerge(df, l, rr)
      ref = ref.view.mapValues(seqMerge(_, l, rr)).toMap
    }
    val got = df.orderBy("word", "pos")
      .select("word", "sym").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toVector).toMap
    words.foreach { case (w, _) =>
      assert(got(w) == ref(w), s"word $w: got ${got(w)} want ${ref(w)}")
    }
  }
}
