package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Property-style checks of the native text expressions against naive
  * Scala reference computations over seeded-random token arrays —
  * covering shapes the fixture corpus never produces (heavy duplicate
  * skew, single-char tokens, unicode, empty strings as tokens). */
class ExprPropSpec extends SparkSpec {
  import spark.implicits._

  private val Cases = 60
  private val r = new Random(42)

  private def randomTokens(): Seq[String] = {
    val vocabSize = 1 + r.nextInt(6) // tiny vocab → heavy multiplicity
    val vocab = Vector.fill(vocabSize)(
      r.nextInt(4) match {
        case 0 => r.alphanumeric.take(1 + r.nextInt(3)).mkString
        case 1 => "émü" + r.nextInt(10)  // non-ascii
        case 2 => ""                      // empty-string token
        case _ => r.alphanumeric.take(1 + r.nextInt(10)).mkString
      })
    Seq.fill(1 + r.nextInt(30))(vocab(r.nextInt(vocab.size)))
  }

  test("TokenStats matches naive (total, distinct, max multiplicity) on random multisets") {
    val cases = (0 until Cases).map(i => (i.toLong, randomTokens()))
    val got = cases.toDF("id", "toks")
      .select($"id", graft.text.TextFunctions.tokenStatsCol($"toks").as("s"))
      .select($"id", $"s.n_total", $"s.n_distinct", $"s.top_count")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    cases.foreach { case (id, toks) =>
      val counts = toks.groupBy(identity).view.mapValues(_.size)
      val want = (toks.size.toLong, counts.size.toLong, counts.values.max.toLong)
      assert(got(id) == want, s"case $id toks=$toks")
    }
  }

  test("SimHashN(64) matches a naive md5-bit majority vote on random multisets") {
    def naive(toks: Seq[String]): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val ones = new Array[Int](64)
      toks.foreach { t =>
        md.reset()
        val d = md.digest(t.getBytes("UTF-8"))
        for (j <- 0 until 64)
          if (((d(j >>> 3) >> (7 - (j & 7))) & 1) == 1) ones(j) += 1
      }
      (0 until 64).foldLeft(0L) { (sig, j) =>
        if (2 * ones(j) > toks.size) sig | (1L << j) else sig
      }
    }
    val cases = (0 until Cases).map(i => (i.toLong, randomTokens()))
    val got = cases.toDF("id", "toks")
      .select($"id", graft.text.TextFunctions.simhash64Col($"toks").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.foreach { case (id, toks) =>
      assert(got(id) == naive(toks), s"case $id toks=$toks")
    }
  }

  test("hamming(simhash64) is a metric-ish proxy: identical multisets → 0 regardless of order") {
    val cases = (0 until Cases).map { i =>
      val t = randomTokens()
      (i.toLong, t, r.shuffle(t))
    }
    val got = cases.map { case (id, a, b) => (id, a, b) }
      .toDF("id", "a", "b")
      .select($"id", graft.text.TextFunctions.hamming(
        graft.text.TextFunctions.simhash64Col($"a"),
        graft.text.TextFunctions.simhash64Col($"b")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.values.forall(_ == 0), "order must not affect the signature")
  }
}
