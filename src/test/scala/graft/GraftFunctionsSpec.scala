package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The registered SQL surface ([[GraftExtensions]] / [[GraftFunctions]]):
  * every `graft_*` SQL function must produce the identical result to the
  * Scala API it delegates to (same expression tree → same plan), tuning
  * args must be analysis-time literals, and registration must be
  * idempotent. The shared test session comes from [[GraftSession]],
  * which wires the extension at build time — so these queries also pin
  * the `withExtensions` path.
  */
class GraftFunctionsSpec extends SparkSpec {

  private lazy val docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "web-crawl"),
      (2L, "pack my box with five dozen liquor jugs", "books3"),
      (3L, "the quick brown fox jumps over the lazy dog", "web"),
      (4L, "", "w"),
      (5L, null.asInstanceOf[String], "archive-9"))
      .toDF("doc_id", "text", "source")
  }

  test("extension-registered functions resolve from pure spark.sql") {
    docs.createOrReplaceTempView("gf_docs")
    val out = spark.sql(
      """SELECT doc_id, graft_fingerprint(text, 12).fingerprint AS fp,
        |       size(graft_tokens(text)) AS n_tok
        |FROM gf_docs WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin)
      .collect()
    assert(out.length === 4)
    // identical texts → identical fingerprints; distinct → distinct
    assert(out(0).getString(1) === out(2).getString(1))
    assert(out(0).getString(1) !== out(1).getString(1))
    assert(out(0).getInt(2) === 9)
  }

  test("SQL twins match the Scala API exactly") {
    docs.createOrReplaceTempView("gf_docs")
    val nonNull = docs.filter(col("text").isNotNull)

    val sqlFp = spark.sql(
      """SELECT doc_id, graft_fingerprint(text, 12).fingerprint AS fingerprint,
        |       graft_fingerprint(text, 12).n_shingles AS n_shingles
        |FROM gf_docs ORDER BY doc_id""".stripMargin).collect()
    val apiFp = text.TextFunctions
      .fingerprint(docs, "doc_id", col("text")).orderBy("doc_id").collect()
    assert(sqlFp.filter(!_.isNullAt(1)).toSeq === apiFp.toSeq)

    val sqlMh = spark.sql(
      "SELECT graft_minhash(graft_char_shingles(text, 12), 16) AS mh FROM gf_docs WHERE doc_id = 1")
      .collect().head.getSeq[Long](0)
    val apiMh = nonNull.filter(col("doc_id") === 1)
      .select(text.Dedup.minhashCol(col("text"), 16, shingleWords = 3).as("mh"))
    // minhashCol shingles differently (word n-grams); compare against the
    // same char-shingle formulation instead
    val apiMh2 = nonNull.filter(col("doc_id") === 1)
      .select(org.apache.spark.sql.graftbridge.ExprBridge.column(
        functions.MinHashSigs(
          org.apache.spark.sql.graftbridge.ExprBridge.expression(
            text.Shingles.charShingles(col("text"), 12)),
          text.Dedup.minhashCoeffs(16))).as("mh"))
      .collect().head.getSeq[Long](0)
    assert(sqlMh === apiMh2)
    assert(apiMh.collect().nonEmpty) // word-ngram variant stays callable

    val sqlQd = spark.sql(
      "SELECT graft_dotq(graft_quantize(array(0.5F, -1.25F)), graft_quantize(array(2.0F, 4.0F))) AS d")
      .collect().head.getLong(0)
    val apiQd = spark.range(1).select(ml.Similarity.dotQ(
      ml.Similarity.quantize(array(lit(0.5f), lit(-1.25f))),
      ml.Similarity.quantize(array(lit(2.0f), lit(4.0f)))).as("d"))
      .collect().head.getLong(0)
    assert(sqlQd === apiQd)

    val sqlPairs = spark.sql(
      "SELECT graft_sorted_pairs(array(3L, 1L, 2L)) AS p").collect().head.getSeq[Row](0)
    assert(sqlPairs === Seq(Row(1L, 2L), Row(1L, 3L), Row(2L, 3L)))

    val sqlMask = spark.sql(
      "SELECT graft_mask(source, 'partial') AS m FROM gf_docs ORDER BY doc_id")
      .collect().map(_.getString(0))
    val apiMask = docs.orderBy("doc_id")
      .select(ops.Mask.maskedValue(col("source"), ops.Mask.Partial).as("m"))
      .collect().map(_.getString(0))
    assert(sqlMask === apiMask)
    assert(sqlMask(0) === "XXX-Xrawl") // '-' is not alnum; last 4 kept

    val sqlHam = spark.sql("SELECT graft_hamming(11L, 13L) AS h")
      .collect().head.getInt(0)
    assert(sqlHam === 2) // 1011 vs 1101

    val sqlSim64 = spark.sql(
      "SELECT graft_simhash64(text) AS s FROM gf_docs WHERE doc_id = 1")
      .collect().head.getLong(0)
    val apiSim64 = nonNull.filter(col("doc_id") === 1)
      .select(text.TextFunctions.simhash64Col(
        text.TextFunctions.whitespaceTokens(col("text"))).as("s"))
      .collect().head.getLong(0)
    assert(sqlSim64 === apiSim64)

    val sqlBkt = spark.sql(
      "SELECT graft_split_bucket(doc_id, '42') AS b FROM gf_docs ORDER BY doc_id")
      .collect().map(_.getLong(0))
    val apiBkt = docs.orderBy("doc_id")
      .select(text.Sampling.splitBucket(col("doc_id"), "42").as("b"))
      .collect().map(_.getLong(0))
    assert(sqlBkt === apiBkt)
    assert(sqlBkt.forall(b => b >= 0 && b < text.Sampling.Granularity))

    val sqlStats = spark.sql(
      """SELECT graft_text_stats(text).n_tokens AS n_tokens,
        |       graft_text_stats(text).quality_score AS quality_score,
        |       graft_lang_id(text).pred_lang AS pred_lang
        |FROM gf_docs ORDER BY doc_id""".stripMargin).collect()
    val apiStats = text.TextFunctions.languageId(
        text.TextFunctions.qualityStats(docs, col("text")), col("text"))
      .orderBy("doc_id")
      .select("n_tokens", "quality_score", "pred_lang").collect()
    assert(sqlStats.toSeq === apiStats.toSeq)

    val sqlEnt = spark.sql(
      "SELECT graft_char_entropy(text).total_mnats AS m FROM gf_docs WHERE doc_id = 1")
      .collect().head.getLong(0)
    val apiEnt = nonNull.filter(col("doc_id") === 1)
      .select(text.TextFunctions.charEntropyCol(col("text"))
        .getField("total_mnats").as("m")).collect().head.getLong(0)
    assert(sqlEnt === apiEnt)
  }

  test("graft_line_filter and graft_cdc_boundaries match their Scala twins") {
    val s = spark
    import s.implicits._
    GraftFunctions.register(spark)
    Seq((1L, "A good long sentence with many words here.\njunk line no punct"),
        (2L, "short.\nAnother proper sentence line for the test."))
      .toDF("doc_id", "text").createOrReplaceTempView("gf_lines")
    val sqlLf = spark.sql(
      """SELECT graft_line_filter(text, 5).text_kept AS k,
        |       graft_line_filter(text, 5).n_kept AS n
        |FROM gf_lines ORDER BY doc_id""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val apiLf = spark.table("gf_lines").orderBy("doc_id")
      .select(text.Lines.lineFilterCol(col("text"), 5).as("f"))
      .select(col("f.text_kept"), col("f.n_kept"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(sqlLf.toSeq === apiLf.toSeq)

    val sqlCdc = spark.sql(
      "SELECT graft_cdc_boundaries(CAST(text AS BINARY), 8, 1) AS b FROM gf_lines ORDER BY doc_id")
      .collect().map(_.getSeq[Int](0))
    val apiCdc = spark.table("gf_lines").orderBy("doc_id")
      .select(mm.BinaryOps.cdcBoundariesCol(col("text").cast("binary")).as("b"))
      .collect().map(_.getSeq[Int](0))
    assert(sqlCdc.toSeq === apiCdc.toSeq)
  }

  test("graft_lsh_bucket matches Similarity.lshBucket") {
    val s = spark
    import s.implicits._
    val vecs = Seq((1L, Array(0.1f, -0.4f, 0.9f)), (2L, Array(-0.7f, 0.2f, 0.3f)))
      .toDF("vec_id", "embedding")
    vecs.createOrReplaceTempView("gf_vecs")
    val sql = spark.sql(
      "SELECT vec_id, graft_lsh_bucket(embedding, 8, 3) AS b FROM gf_vecs ORDER BY vec_id")
      .collect().map(_.getLong(1))
    val api = vecs.select(col("vec_id"),
        ml.Similarity.lshBucket(col("embedding"), 8, 3).as("b"))
      .orderBy("vec_id").collect().map(_.getLong(1))
    assert(sql === api)
  }

  test("graft_bson_sort_key orders mixed-type canonical-JSON ids correctly") {
    val s = spark
    import s.implicits._
    Seq("\"b\"", "150", "2", "\"a\"").toDF("id").createOrReplaceTempView("gf_ids")
    val ordered = spark.sql(
      "SELECT id FROM gf_ids ORDER BY graft_bson_sort_key(id)")
      .collect().map(_.getString(0))
    // BSON order: numbers before strings; 2 < 150 numerically
    assert(ordered === Array("2", "150", "\"a\"", "\"b\""))
  }

  test("tuning args must be literals; arity and method are validated") {
    docs.createOrReplaceTempView("gf_docs")
    // analysis-time failures may arrive wrapped — search the cause chain
    def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val nonLit = intercept[Exception] {
      spark.sql("SELECT graft_char_shingles(text, CAST(doc_id AS INT)) FROM gf_docs").collect()
    }
    assert(chain(nonLit).contains("integer literal"))
    val badArity = intercept[Exception] {
      spark.sql("SELECT graft_dotq(array(1L)) FROM gf_docs").collect()
    }
    assert(chain(badArity).contains("2 argument"))
    val badMethod = intercept[Exception] {
      spark.sql("SELECT graft_mask(text, 'nope') FROM gf_docs").collect()
    }
    assert(chain(badMethod).contains("unknown method"))
  }

  test("runtime registration is idempotent and overwrite-safe") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_mask('secret-value-1234', 'default') AS m")
      .collect().head.getString(0)
    assert(r === "XXXXXX-XXXXX-XXXX")
  }
}
