package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("qualityStats pins empty / whitespace-only docs to NULL ratios") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "real text here")).toDF("doc_id", "text")
    val out = TextFunctions.qualityStats(df, col("text"))
      .select("doc_id", "n_len", "n_tokens", "alpha_ratio", "avg_token_len", "quality_score")
      .collect().map(r => r.getLong(0) -> r).toMap
    // empty doc: zero length → every ratio NULL, score NULL (not Inf/NaN)
    assert(out(1L).isNullAt(3) && out(1L).isNullAt(4) && out(1L).isNullAt(5))
    // whitespace-only: length > 0 but zero tokens → avg_token_len NULL
    assert(!out(2L).isNullAt(3) && out(2L).isNullAt(4) && out(2L).isNullAt(5))
    // normal doc: everything defined
    assert(!out(3L).isNullAt(3) && !out(3L).isNullAt(4) && !out(3L).isNullAt(5))
  }

  test("normalizeCol canonicalizes case, control chars, and whitespace runs") {
    val df = Seq(
      (1L, "Hello  World"),
      (2L, "\thello\r\nworld "),
      (3L, "HELLO\u0001WORLD"),   // control byte inside a word
      (4L, "hello world")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextFunctions.normalizeCol(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "hello world" && out(2L) == "hello world"
      && out(4L) == "hello world")
    assert(out(3L) == "hello world") // \x00 -> space, then collapsed
    // grouping on the normalized form unifies all four
    val groups = df.groupBy(md5(TextFunctions.normalizeCol(col("text"))))
      .count().collect()
    assert(groups.length == 1 && groups.head.getLong(1) == 4L)
  }

  test("tfIdfTopK ranks by quantized integer tf-idf with token tie-break") {
    // 4 docs; "common" in all (idf=0), "rare" in one, "pair" in two
    val df = Seq(
      (1L, "common rare rare pair"),
      (2L, "common pair"),
      (3L, "common common"),
      (4L, "common"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextFunctions.tfIdfTopK(df, "doc_id", col("text"), k = 2)
      .orderBy("doc_id", "rank")
      .as[(Long, Int, String, Long, Long, Long)].collect().toSeq
    val idfRare = math.floor(1000.0 * math.log(4.0 / 1)).toLong // 1386
    val idfPair = math.floor(1000.0 * math.log(4.0 / 2)).toLong // 693
    assert(out == Seq(
      (1L, 1, "rare", 2L, 1L, 2 * idfRare),
      (1L, 2, "pair", 1L, 2L, idfPair),
      (2L, 1, "pair", 1L, 2L, idfPair),
      (2L, 2, "common", 1L, 4L, 0L),
      // idf 0 for "common": rank still emitted (score 0), tf irrelevant
      (3L, 1, "common", 2L, 4L, 0L),
      (4L, 1, "common", 1L, 4L, 0L)))
  }

  test("languageId marker counts drive the argmax with fixed tie-break") {
    val df = Seq(
      (1L, "the cat and the dog is a pet of the house"),
      (2L, "le chat et les chiens des villes"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextFunctions.languageId(df, col("text"))
      .select("doc_id", "pred_lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en" && out(2L) == "fr")
    assert(out(3L) == "en") // all-zero counts tie-break to en
  }

  test("repetitionStats: ratios match hand counts; degenerate docs score high") {
    val df = Seq(
      (1L, "buy buy buy buy now"),          // 5 words, 2 distinct, top=4
      (2L, "all words here are distinct"),  // no repetition
      (3L, "go go go go"),                  // one word repeated: top ratio 1
      (4L, "solo"),                         // < 2 words: dropped
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextFunctions.repetitionStats(df, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    val r1 = out(1L)
    assert(r1.getLong(1) == 5 && r1.getLong(2) == 2)            // n, distinct
    assert(math.abs(r1.getDouble(3) - 0.6) < 1e-12)             // dup_word_ratio
    assert(math.abs(r1.getDouble(4) - 0.8) < 1e-12)             // top_word_ratio
    assert(r1.getLong(5) == 4)                          // 2-grams
    assert(math.abs(r1.getDouble(6) - 0.5) < 1e-12)     // {"buy buy"×3, "buy now"}: 1 − 2/4
    assert(out(2L).getDouble(3) == 0.0 && out(2L).getDouble(6) == 0.0)
    assert(out(3L).getDouble(4) == 1.0)
    assert(math.abs(out(3L).getDouble(6) - 2.0 / 3) < 1e-12)
  }

  test("repetitionStats matches the exploded two-aggregate formulation on real docs") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val narrow = TextFunctions.repetitionStats(docs, "doc_id", col("text"))
      .select("doc_id", "n_words", "n_distinct_words", "n_2grams")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val toks = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), TextFunctions.whitespaceTokens(lower(col("text"))).as("w"))
      .filter(size(col("w")) > 1)
    val words = toks.select(col("doc_id"), explode(col("w")).as("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("tok")).as("nd"))
    val grams = toks
      .select(col("doc_id"), explode(Shingles.wordNGramsOf(col("w"), 2)).as("g"))
      .groupBy("doc_id").agg(count(lit(1)).as("n2"))
    val exploded = words.join(grams, Seq("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(narrow == exploded && narrow.nonEmpty)
  }

  test("vocabulary: counts, doc frequencies, and a deterministic top-K cutoff") {
    val df = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "banana banana date")).toDF("doc_id", "text")
    val out = TextFunctions.vocabulary(df, "doc_id", col("text"), 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // apple: n=3 df=2; banana: n=3 df=2 (tie → alphabetical); cherry/date n=1 tie → cherry
    assert(out.toSeq == Seq(("apple", 3L, 2L), ("banana", 3L, 2L), ("cherry", 1L, 1L)))
  }

  test("unigramSurprisal: rare-token docs score higher; integer milli-nat sums") {
    val df = Seq(
      (1L, "common common common common"),
      (2L, "common common rare xylophone")).toDF("doc_id", "text")
    val out = TextFunctions.unigramSurprisal(df, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // model: common 6/8, rare 1/8, xylophone 1/8
    val mc = math.floor(-1000.0 * math.log(6.0 / 8))
    val mr = math.floor(-1000.0 * math.log(1.0 / 8))
    assert(out(1L)._2 == 4 * mc.toLong)
    assert(out(2L)._2 == (2 * mc + 2 * mr).toLong)
    assert(out(2L)._3 > out(1L)._3) // the rare-token doc is more surprising
    assert(out(1L)._1 == 4 && out(2L)._1 == 4)
  }

  test("bigramSurprisal: hand-built bigram model; boilerplate scores below salad") {
    val df = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "a")).toDF("doc_id", "text")
    val out = TextFunctions.bigramSurprisal(df, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // tokens: total 7; uni a=4,b=2,c=1; bigrams (a,b)=2,(a,c)=1, ctx(a)=3
    def m(p: Double) = math.floor(-1000.0 * math.log(p)).toLong
    val firstA = m(4.0 / 7)      // first token backs off to the unigram model
    assert(out(1L)._2 == firstA + m(2.0 / 3)) // p(b|a)=2/3
    assert(out(2L) == out(1L))                // identical docs score identically
    assert(out(3L)._2 == firstA + m(1.0 / 3)) // p(c|a)=1/3
    assert(out(4L)._2 == firstA)              // single-token doc: unigram only
    // the rarer continuation is more surprising than the common one
    assert(out(3L)._3 > out(1L)._3)
    assert(out.values.forall(_._1 > 0))
  }

  test("bigramSurprisal separates predictable repetition from token salad") {
    // same token MULTISET, different order: the bigram model sees the
    // repeated "x y" continuation as predictable, the shuffled doc not —
    // a separation unigram surprisal cannot make (it scores both equal)
    val df = Seq(
      (1L, "x y x y x y x y"),
      (2L, "x x y x y y x y")).toDF("doc_id", "text")
    val bi = TextFunctions.bigramSurprisal(df, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val uni = TextFunctions.unigramSurprisal(df, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(uni(1L) == uni(2L))
    assert(bi(1L) < bi(2L))
  }

  test("approx_percentile tracks exact percentile (the 100 TB swap-in for q_corpus_stats)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val n = TextFunctions.qualityStats(docs, col("text")).select("n_tokens")
    val row = n.agg(
      percentile(col("n_tokens"), lit(0.9)).as("e"),
      expr("approx_percentile(n_tokens, 0.9, 10000)").as("a")).head()
    val exact = row.getDouble(0)
    val approx = row.getLong(1).toDouble
    // at accuracy=10000 the t-digest is exact-rank on small data and
    // within a tight relative band at any scale
    assert(math.abs(approx - exact) / exact < 0.02,
      s"approx=$approx exact=$exact")
  }

  test("PII scrub replaces every pattern and counts them on the original text") {
    val df = Seq(
      (1L, "mail a.b+c@x-corp.io or b@y.co, host 10.0.0.7, call 555-123-4567"),
      (2L, "no pii here at all"),
      (3L, "v1.2.3.4 has no leading boundary; 999.999.999.999 matches anyway"))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        Pii.piiCounts(col("text")).as("p"), Pii.scrub(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val p1 = out(1L).getStruct(1)
    assert(p1.getLong(0) == 2 && p1.getLong(1) == 1 && p1.getLong(2) == 1)
    val s1 = out(1L).getString(2)
    assert(s1.contains("<EMAIL>") && s1.contains("<IP>") && s1.contains("<PHONE>"))
    assert(!s1.contains("@") && !s1.contains("10.0.0.7") && !s1.contains("555-123-4567"))
    assert(out(2L).getString(2) == "no pii here at all")
    // documented looseness: any \b-delimited dotted quad matches
    // regardless of octet range (redaction errs broad); a quad glued to
    // a word ("v1.2.3.4") has no leading boundary and is left alone
    assert(out(3L).getStruct(1).getLong(1) == 1)
  }

  test("vocabDrift computes add-one-smoothed quantized KL contributions") {
    val a = Seq((1L, "x x y")).toDF("doc_id", "text")
    val b = Seq((2L, "y z")).toDF("doc_id", "text")
    // N_a=3, N_b=2, V=3; ratio(t) = (c_a+1)(N_b+V) / (c_b+1)(N_a+V)
    val out = TextFunctions.vocabDrift(a, b, col("text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet == Set("x", "y", "z"))
    // x: ratio = 3·5 / 1·6 = 2.5, ln = 0.91629 → 916 mn;
    //    p_micro = 10⁶·3 DIV 6 = 500000
    assert(out("x") == ((2L, 0L, 916L, 500000L * 916L)))
    // y: ratio = 2·5 / 2·6 = 0.8333, ln = −0.18232 → −183 mn
    assert(out("y") == ((1L, 1L, -183L, 333333L * -183L)))
    // z: ratio = 1·5 / 2·6 = 0.41667, ln = −0.87547 → −876 mn
    assert(out("z") == ((0L, 1L, -876L, 166666L * -876L)))
    // aggregate KL(a‖b) must be positive (Gibbs) on any real split
    val kl = out.values.map(_._4).sum
    assert(kl > 0, s"KL estimate should be positive, got $kl")
  }

  test("repetitionCharStats: hand-computed char shares, ties to smallest gram") {
    val c = Seq(
      (1L, "buy buy buy sale"),          // 2-grams: "buy buy"×2 (14) + "buy sale" (8)
      (2L, "a b c d e a b c d e"),       // 5-grams: "a b c d e"×2 of 6 total
      (3L, "x y x z"),                   // all 2-grams unique → tie → "x y"
      (4L, "one")                        // < 2 words → all zeros
    ).toDF("doc_id", "text")
    val out = TextFunctions.repetitionCharStats(c, "doc_id", col("text"))
    val rows = out.orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    def f(id: Long, name: String) = rows(id).getAs[Long](name)
    assert(f(1, "top_2gram_char_permille") == 1000L * 14 / 22)
    assert(f(2, "dup_5gram_char_permille") == 1000L * 18 / 54)
    // tie on count: lexicographically smallest 2-gram ("x y") wins
    assert(f(3, "top_2gram_char_permille") == 1000L * 3 / 9)
    assert((2 to 4).forall(n => f(4, s"top_${n}gram_char_permille") == 0L))
    assert((5 to 10).forall(n => f(4, s"dup_${n}gram_char_permille") == 0L))
    assert(f(2, "n_words") == 10L)
    // narrow: one projection, no Exchange
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("unigramSurprisalFrozen: Laplace floor for unseen tokens, hand model") {
    val train = Seq((1L, "a a b")).toDF("doc_id", "text")
    val score = Seq((10L, "a c"), (11L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextFunctions.unigramSurprisalFrozen(train, score, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // model a:2 b:1, N=3 V=2 → denom 5; a → (2+1)/5, c (unseen) → 1/5
    val ma = math.floor(-1000.0 * math.log(3.0 / 5)).toLong
    val mc = math.floor(-1000.0 * math.log(1.0 / 5)).toLong
    assert(out.keySet == Set(10L))
    assert(out(10L) == ((2L, 1L, ma + mc, (ma + mc).toDouble / 1000.0 / 2)))
  }

  test("zipfFit matches a local least-squares over the quantized log-log vocab") {
    // freqs 8/4/2/1 over ranks 1..4 (ties broken by token)
    val docs = Seq((1L, ("a " * 8 + "b " * 4 + "c " * 2 + "d").trim))
      .toDF("doc_id", "text")
    val got = TextFunctions.zipfFit(docs, "doc_id", col("text"), 10)
      .collect()(0)
    val xy = Seq((1, 8), (2, 4), (3, 2), (4, 1)).map { case (r, n) =>
      (math.floor(1e6 * math.log(r)).toLong, math.floor(1e6 * math.log(n)).toLong)
    }
    val cnt = xy.size.toDouble
    val sx = xy.map(_._1).sum.toDouble
    val sy = xy.map(_._2).sum.toDouble
    val sxx = xy.map(p => p._1 * p._1).sum.toDouble
    val sxy = xy.map(p => p._1 * p._2).sum.toDouble
    val syy = xy.map(p => p._2 * p._2).sum.toDouble
    val num = cnt * sxy - sx * sy
    val den = cnt * sxx - sx * sx
    assert(got.getLong(0) == 4L)
    assert(got.getDouble(1) == num / den)
    assert(got.getDouble(2) == (sy - num / den * sx) / cnt / 1000000.0)
    assert(got.getDouble(3) == num * num / (den * (cnt * syy - sy * sy)))
    // a doubling-geometric corpus is exactly Zipf-ish with slope ~ -1.5/ln-steps
    assert(got.getDouble(1) < 0 && got.getDouble(3) > 0.9)
  }

  test("surprisal/tfidf: parquet-staging path returns the persist path's exact rows") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ran"),
      (3L, "a dog sat")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("tf-stage").toString
    try {
      def eq(a: org.apache.spark.sql.DataFrame,
          b: org.apache.spark.sql.DataFrame): Boolean =
        a.collect().toSet == b.collect().toSet
      assert(eq(
        TextFunctions.unigramSurprisal(docs, "doc_id", col("text"), Some(dir)),
        TextFunctions.unigramSurprisal(docs, "doc_id", col("text"))))
      assert(eq(
        TextFunctions.bigramSurprisal(docs, "doc_id", col("text"), Some(dir)),
        TextFunctions.bigramSurprisal(docs, "doc_id", col("text"))))
      assert(eq(
        TextFunctions.tfIdfTopK(docs, "doc_id", col("text"), 2, Some(dir)),
        TextFunctions.tfIdfTopK(docs, "doc_id", col("text"), 2)))
      assert(new java.io.File(s"$dir/surprisal_toks").exists())
      assert(new java.io.File(s"$dir/surprisal_bigram_pos").exists())
      assert(new java.io.File(s"$dir/tfidf_tf").exists())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
