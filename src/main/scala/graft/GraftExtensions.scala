package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.{ExprBridge, RegistryBridge}

/** SQL surface for the engine: every graft scalar function as a
  * registered SQL function, usable from pure `spark.sql(...)` with no
  * Scala imports.
  *
  * Two equivalent wiring points, both standard Spark:
  *
  *  - `--conf spark.sql.extensions=graft.GraftExtensions` (or
  *    `builder.withExtensions(new GraftExtensions)`, which is what
  *    [[GraftSession]] does) — applied at session build time;
  *  - [[GraftFunctions.register]] — idempotent runtime registration
  *    into an already-running session's function registry.
  *
  * Each builder delegates to the exact same Catalyst expression the
  * Scala API constructs ([[graft.functions.MinHashSigs]] etc. — native
  * codegen'd, no UDFs), so a SQL caller gets the identical plan, and the
  * equivalence specs that pin those expressions cover this surface too.
  * Tuning arguments (shingle width, hash count, LSH geometry) must be
  * foldable literals: they parameterize the expression TREE, mirroring
  * how Spark's own `approx_count_distinct(col, 0.05)` takes a literal
  * precision.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}

object GraftFunctions {
  type FunctionDesc =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def c(e: Expression): Column = ExprBridge.column(e)
  // eager full conversion — a builder's return value faces the analyzer
  // directly, so no lazy ColumnNodeExpression placeholders are allowed
  private def x(col: Column): Expression = ExprBridge.catalystExpression(col)

  private def expect(name: String, n: Int, es: Seq[Expression]): Unit =
    require(es.length == n, s"$name expects $n argument(s), got ${es.length}")

  /** A tuning argument: must fold to an integer at analysis time. */
  private def litInt(name: String, arg: String, e: Expression): Int = {
    val v = if (e.foldable) e.eval() else null
    v match {
      case i: java.lang.Integer => i.intValue
      case l: java.lang.Long
          if l >= Int.MinValue && l <= Int.MaxValue => l.intValue
      case s: java.lang.Short => s.intValue
      case b: java.lang.Byte => b.intValue
      case _ => throw new IllegalArgumentException(
        s"$name: <$arg> must be an integer literal, got ${e.sql}")
    }
  }

  private def litString(name: String, arg: String, e: Expression): String = {
    val v = if (e.foldable) e.eval() else null
    v match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case s: String => s
      case _ => throw new IllegalArgumentException(
        s"$name: <$arg> must be a string literal, got ${e.sql}")
    }
  }

  private def fn(name: String, usage: String)(
      builder: Seq[Expression] => Expression): FunctionDesc =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.GraftFunctions", null, name, usage,
        /* arguments = */ "", /* examples = */ "", /* note = */ "",
        /* group = */ "misc_funcs", /* since = */ "", /* deprecated = */ "",
        /* source = */ "scala_udf"),
      builder)

  /** The full registry. Names are prefixed `graft_` so they can never
    * shadow a Spark built-in. */
  val all: Seq[FunctionDesc] = Seq(
    fn("graft_tokens",
      "graft_tokens(text) - whitespace (\\S+) tokens, array<string>") { es =>
      expect("graft_tokens", 1, es)
      x(text.TextFunctions.whitespaceTokens(c(es(0))))
    },
    fn("graft_bpeish_tokens",
      "graft_bpeish_tokens(text) - BPE-ish subword segments of lower(text)") { es =>
      expect("graft_bpeish_tokens", 1, es)
      x(text.TextFunctions.bpeishTokens(c(es(0))))
    },
    fn("graft_char_shingles",
      "graft_char_shingles(text, k) - char k-shingles of lower(text), capped at 2048 chars") { es =>
      expect("graft_char_shingles", 2, es)
      x(text.Shingles.charShingles(c(es(0)),
        litInt("graft_char_shingles", "k", es(1))))
    },
    fn("graft_word_ngrams",
      "graft_word_ngrams(text, n) - word n-grams of lower(text)") { es =>
      expect("graft_word_ngrams", 2, es)
      x(text.Shingles.wordNGrams(c(es(0)),
        litInt("graft_word_ngrams", "n", es(1))))
    },
    fn("graft_shingle_stats",
      "graft_shingle_stats(shingles) - struct(fingerprint: min-md5 over the distinct set, n_shingles)") { es =>
      expect("graft_shingle_stats", 1, es)
      functions.ShingleStats(es(0))
    },
    fn("graft_fingerprint",
      "graft_fingerprint(text, k) - content fingerprint over char k-shingles: struct(fingerprint, n_shingles)") { es =>
      expect("graft_fingerprint", 2, es)
      functions.ShingleStats(x(text.Shingles.charShingles(c(es(0)),
        litInt("graft_fingerprint", "k", es(1)))))
    },
    fn("graft_minhash",
      "graft_minhash(shingles, numHashes) - the numHashes permuted minhashes, array<bigint>") { es =>
      expect("graft_minhash", 2, es)
      functions.MinHashSigs(es(0),
        text.Dedup.minhashCoeffs(litInt("graft_minhash", "numHashes", es(1))))
    },
    fn("graft_sorted_pairs",
      "graft_sorted_pairs(ids) - all ordered pairs (id_a < id_b) of the array") { es =>
      expect("graft_sorted_pairs", 1, es)
      functions.SortedPairs(es(0))
    },
    fn("graft_quantize",
      "graft_quantize(vec) - floor(x*1000) per coordinate, array<bigint>") { es =>
      expect("graft_quantize", 1, es)
      functions.QuantizeVec(es(0), ml.Similarity.Scale)
    },
    fn("graft_dotq",
      "graft_dotq(qa, qb) - exact integer dot product of two quantized vectors") { es =>
      expect("graft_dotq", 2, es)
      functions.DotQ(es(0), es(1))
    },
    fn("graft_cosine",
      "graft_cosine(a, b) - cosine similarity of two float vectors") { es =>
      expect("graft_cosine", 2, es)
      x(ml.Similarity.cosine(c(es(0)), c(es(1))))
    },
    fn("graft_lsh_bucket",
      "graft_lsh_bucket(vec, bits, dims) - sign-bit LSH bucket id of an embedding") { es =>
      expect("graft_lsh_bucket", 3, es)
      x(ml.Similarity.lshBucket(c(es(0)),
        litInt("graft_lsh_bucket", "bits", es(1)),
        litInt("graft_lsh_bucket", "dims", es(2))))
    },
    fn("graft_hamming",
      "graft_hamming(a, b) - Hamming distance between packed signatures") { es =>
      expect("graft_hamming", 2, es)
      x(text.TextFunctions.hamming(c(es(0)), c(es(1))))
    },
    fn("graft_mask",
      "graft_mask(text, method) - mask a value; method in default|partial|hex|hex_deterministic") { es =>
      expect("graft_mask", 2, es)
      val m = litString("graft_mask", "method", es(1))
      require(Set(ops.Mask.Default, ops.Mask.Partial, ops.Mask.Hex,
        ops.Mask.HexDeterministic)(m),
        s"graft_mask: unknown method '$m'")
      x(ops.Mask.maskedValue(c(es(0)), m))
    },
    fn("graft_mask_json",
      "graft_mask_json(json, path, method) - mask a dotted path inside a JSON string (dynamic docs); method in default|partial|hex_deterministic") { es =>
      expect("graft_mask_json", 3, es)
      x(ops.Mask.maskJson(c(es(0)),
        litString("graft_mask_json", "path", es(1)),
        litString("graft_mask_json", "method", es(2))))
    },
    fn("graft_bson_sort_key",
      "graft_bson_sort_key(id) - BSON cross-type sort key for a canonical-JSON id; ORDER BY it") { es =>
      expect("graft_bson_sort_key", 1, es)
      x(ops.BsonKey.sortKey(c(es(0))))
    },
    fn("graft_text_stats",
      "graft_text_stats(text) - struct(n_len, n_tokens, n_bpeish, n_alpha, n_digit, alpha_ratio, avg_token_len, quality_score)") { es =>
      expect("graft_text_stats", 1, es)
      x(text.TextFunctions.qualityStatsCol(c(es(0))))
    },
    fn("graft_char_entropy",
      "graft_char_entropy(text) - struct(n_chars, total_mnats, entropy_nats) Shannon code-point entropy") { es =>
      expect("graft_char_entropy", 1, es)
      x(text.TextFunctions.charEntropyCol(c(es(0))))
    },
    fn("graft_lang_id",
      "graft_lang_id(text) - struct(en_n, fr_n, es_n, de_n, pred_lang) stopword-marker language id") { es =>
      expect("graft_lang_id", 1, es)
      x(text.TextFunctions.languageIdCol(c(es(0))))
    },
    fn("graft_simhash",
      "graft_simhash(text) - 16-bit SimHash of the whitespace-token multiset; NULL for token-less text") { es =>
      expect("graft_simhash", 1, es)
      functions.SimHashN(x(text.TextFunctions.whitespaceTokens(c(es(0)))), 16)
    },
    fn("graft_simhash64",
      "graft_simhash64(text) - 64-bit SimHash of the whitespace-token multiset (near-dup fingerprint width); NULL for token-less text") { es =>
      expect("graft_simhash64", 1, es)
      functions.SimHashN(x(text.TextFunctions.whitespaceTokens(c(es(0)))), 64)
    },
    fn("graft_split_bucket",
      "graft_split_bucket(key, salt) - deterministic md5 bucket in [0, 10000) for train/val/test assignment") { es =>
      expect("graft_split_bucket", 2, es)
      x(text.Sampling.splitBucket(c(es(0)), c(es(1))))
    },
    fn("graft_token_stats",
      "graft_token_stats(tokens) - struct(n_total, n_distinct, top_count) over a token array in one pass") { es =>
      expect("graft_token_stats", 1, es)
      functions.TokenStats(es(0))
    },
    fn("graft_pii_scrub",
      "graft_pii_scrub(text) - text with emails/IPv4s/phone numbers replaced by <EMAIL>/<IP>/<PHONE>") { es =>
      expect("graft_pii_scrub", 1, es)
      x(text.Pii.scrub(c(es(0))))
    },
    fn("graft_normalize",
      "graft_normalize(text) - canonical form: lowercase, control chars to spaces, runs collapsed, trimmed") { es =>
      expect("graft_normalize", 1, es)
      x(text.TextFunctions.normalizeCol(c(es(0))))
    },
    fn("graft_line_filter",
      "graft_line_filter(text, minWords) - struct(text_kept, n_kept, n_lines): C4 line gate (>= minWords words + terminal punctuation)") { es =>
      expect("graft_line_filter", 2, es)
      x(text.Lines.lineFilterCol(c(es(0)),
        litInt("graft_line_filter", "minWords", es(1))))
    },
    fn("graft_cdc_boundaries",
      "graft_cdc_boundaries(bin, window, maskHexChars) - content-defined chunk boundary positions (md5-window rule), array<int>") { es =>
      expect("graft_cdc_boundaries", 3, es)
      functions.CdcBoundaries(es(0),
        litInt("graft_cdc_boundaries", "window", es(1)),
        litInt("graft_cdc_boundaries", "maskHexChars", es(2)))
    })

  /** Idempotent runtime registration — for sessions graft didn't build. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, info, b) =>
      RegistryBridge.register(spark, name, info, b)
    }
}
