package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level corpus curation — the C4/RefinedWeb-family operators that
  * work on the LINES of a document rather than the document as a whole:
  * corpus-wide duplicate-line removal and per-line quality gating.
  *
  * These run before document-level dedup in a web-scale pipeline:
  * boilerplate (headers, footers, cookie banners, nav text) repeats
  * across millions of pages, so whole-document hashes never match, but
  * the offending LINES are byte-identical.
  *
  * Scale shapes:
  *  - [[lineDedup]] is two map-side-combined hash aggregates and nothing
  *    else. The winner per distinct line is `min(struct(id, pos, line))`
  *    — an algebraic aggregate, so a line repeated a billion times
  *    (every page's "Home") collapses to one row per map task before the
  *    exchange; there is no window over the line hash (a hot line would
  *    sort its entire partition through one reducer) and no join-back
  *    (the winner struct carries the line text). The second aggregate
  *    regroups the surviving lines by document — output-sized.
  *  - [[lineFilter]] is a pure narrow projection (array ops inside one
  *    codegen'd stage): zero shuffles, runs at scan speed.
  */
object Lines {

  /** Split `text` into (pos, line) rows, 0-based, dropping blank and
    * whitespace-only lines (they would otherwise form one giant
    * dedup bucket keyed on the empty string — and structural blank
    * lines are not content to deduplicate). */
  private[text] def lineRows(df: DataFrame, idCol: String, text: Column): DataFrame =
    df.filter(text.isNotNull)
      .select(col(idCol), posexplode(split(text, "\n")).as(Seq("pos", "line")))
      .filter(length(trim(col("line"))) > 0)

  /** Corpus-wide exact line dedup: every distinct line is kept exactly
    * once — in the document with the smallest (`idCol`, pos) occurrence
    * under SPARK'S NATIVE struct ordering (lexicographic for string
    * ids: "150" < "2"; numeric for numeric ids — use
    * [[graft.ops.BsonKey]] columns upstream if BSON/numeric order of
    * mixed ids should pick the winner) — and removed everywhere else
    * (including repeats WITHIN a document). Documents whose every line
    * was claimed elsewhere drop out of the result (their text is
    * empty).
    *
    * Returns (idCol, text_dedup, n_kept), deterministic: the winner rule
    * is a pure function of the corpus, so any engine, partitioning, or
    * retry reproduces it byte-for-byte — which ordering wins is a
    * convention; that it is stable is the contract. */
  def lineDedup(df: DataFrame, idCol: String, text: Column): DataFrame = {
    val lines = lineRows(df, idCol, text)
    // winner per distinct line — carries the text so no join back into
    // the corpus is ever needed; md5 (not the raw line) keys the
    // exchange so long lines don't inflate shuffle keys
    val winners = lines
      .groupBy(md5(col("line")).as("__lh"))
      .agg(min(struct(col(idCol), col("pos"), col("line"))).as("__w"))
      .select(col("__w").getField(idCol).as(idCol),
        col("__w").getField("pos").as("pos"),
        col("__w").getField("line").as("line"))
    winners
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")), "\n").as("text_dedup"),
        count(lit(1)).as("n_kept"))
  }

  /** C4-style line quality gate as a pure column: keep lines that have
    * at least `minWords` whitespace-separated words AND end in terminal
    * punctuation (`.` `!` `?` `"`). Returns the kept lines re-joined. */
  def lineFilterCol(text: Column, minWords: Int): Column = {
    val kept = filter(split(text, "\n"), l => {
      val t = trim(l)
      size(split(t, """\s+""")) >= minWords &&
        substring(t, -1, 1).isin(".", "!", "?", "\"")
    })
    struct(
      array_join(kept, "\n").as("text_kept"),
      size(kept).cast("long").as("n_kept"),
      size(split(text, "\n")).cast("long").as("n_lines"))
  }

  /** Gopher-family WITHIN-document structural repetition (Rae et al.
    * 2021, MassiveText A1.2): how much of a document is repeated lines
    * or repeated paragraphs — boilerplate loops, pagination artifacts,
    * template spam. Complements [[TextFunctions.repetitionStats]]
    * (word/2-gram level) at the two coarser granularities the paper
    * gates on.
    *
    * Both fractions are the EXCESS beyond one copy of each distinct
    * value (a doc with every line unique scores 0), reported as
    * integer per-mille so any engine reproduces them bit-for-bit:
    *  - `dup_*_permille`       = 1000·(n − n_distinct) ⁄ n
    *  - `dup_*_char_permille`  = 1000·(chars − distinct_chars) ⁄ chars
    *
    * The whole computation is built-in array expressions on the split
    * text — `array_distinct` + `array_join` give the excess char mass
    * with NO per-element lambda counting and no n² scan — inside one
    * codegen'd projection: zero shuffles, the filter runs at scan
    * speed. Lines split on `\n`, paragraphs on blank-line boundaries
    * (`\n\n`), both trimmed, blanks dropped. Docs with no non-blank
    * line report 0s. */
  def lineRepetitionStats(df: DataFrame, idCol: String, text: Column): DataFrame = {
    def metrics(sep: String, tag: String): Seq[Column] = {
      val parts = filter(transform(split(text, sep), p => trim(p)),
        p => length(p) > 0)
      val uniq = array_distinct(parts)
      val n = size(parts).cast("long")
      val nd = size(uniq).cast("long")
      val chars = length(array_join(parts, "")).cast("long")
      val dchars = length(array_join(uniq, "")).cast("long")
      Seq(n.as(s"n_$tag"),
        when(n > 0, floor(lit(1000) * (n - nd) / n)).otherwise(0L)
          .as(s"dup_${tag}_permille"),
        when(chars > 0, floor(lit(1000) * (chars - dchars) / chars))
          .otherwise(0L).as(s"dup_${tag}_char_permille"))
    }
    df.filter(text.isNotNull)
      .select(col(idCol) +: (metrics("\n", "lines") ++ metrics("\n\n", "paras")): _*)
  }

  /** [[lineFilterCol]] over a frame: (idCol, text_kept, n_kept,
    * n_lines). Narrow — no shuffle, no explode (the per-line work stays
    * inside one array expression per document). */
  def lineFilter(df: DataFrame, idCol: String, text: Column,
      minWords: Int = 5): DataFrame = {
    require(minWords > 0, "minWords must be positive")
    df.filter(text.isNotNull)
      .withColumn("__f", lineFilterCol(text, minWords))
      .select(col(idCol), col("__f").getField("text_kept").as("text_kept"),
        col("__f").getField("n_kept").as("n_kept"),
        col("__f").getField("n_lines").as("n_lines"))
  }
}
