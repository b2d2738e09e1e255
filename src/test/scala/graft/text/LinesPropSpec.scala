package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Seeded-random property tests pinning the line-dedup and
  * sentence-chunking operators against straightforward driver-side
  * reference implementations — the distributed formulation (aggregate
  * winners, per-doc windows) must equal the obvious sequential one on
  * ANY corpus, not just the handcrafted fixtures. */
class LinesPropSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "x1", "y2")

  private def randomDoc(r: Random): String = {
    val nLines = r.nextInt(6)
    (0 until nLines).map { _ =>
      val words = (0 until r.nextInt(8)).map(_ => vocab(r.nextInt(vocab.size)))
      val punct = if (r.nextBoolean()) "." else ""
      // occasional blank / whitespace-only line
      if (r.nextInt(10) == 0) "  " else words.mkString(" ") + punct
    }.mkString("\n")
  }

  test("lineDedup equals the sequential first-occurrence reference on random corpora") {
    val r = new Random(7)
    for (_ <- 1 to 10) {
      val docs = (1L to 40L).map(i => (i, randomDoc(r)))
      // reference: walk docs in (id, pos) order, keep first occurrence
      // of each non-blank line
      val seen = scala.collection.mutable.Set.empty[String]
      val expected = docs.flatMap { case (id, text) =>
        val kept = text.split("\n", -1).filter(_.trim.nonEmpty)
          .filter(l => seen.add(l))
        if (kept.isEmpty) None
        else Some((id, kept.mkString("\n"), kept.length.toLong))
      }.toSet
      val got = Lines.lineDedup(docs.toDF("doc_id", "text"), "doc_id", col("text"))
        .as[(Long, String, Long)].collect().toSet
      assert(got == expected)
    }
  }

  test("sentenceChunks equals the sequential cumulative reference on random docs") {
    val r = new Random(11)
    val target = 5
    for (_ <- 1 to 10) {
      val docs = (1L to 30L).map(i =>
        (i, randomDoc(r).replace("\n", " ")))
      val expected = docs.flatMap { case (id, text) =>
        val sents = "[^.!?]+[.!?]*".r.findAllIn(text).map(_.trim)
          .filter(_.nonEmpty).toVector
        val withTok = sents.map(s => (s, s.split("\\s+").count(_.nonEmpty).toLong))
        var before = 0L
        withTok.map { case (s, nt) =>
          val chunk = before / target
          before += nt
          (id, chunk, s, nt)
        }.groupBy { case (_, chunk, _, _) => chunk }
          .map { case (chunk, rows) =>
            (id, chunk, rows.map(_._3).mkString(" "),
              rows.size.toLong, rows.map(_._4).sum)
          }
      }.toSet
      val got = Chunking.sentenceChunks(docs.toDF("doc_id", "text"),
          "doc_id", col("text"), target)
        .as[(Long, Long, String, Long, Long)].collect().toSet
      assert(got == expected)
    }
  }
}
