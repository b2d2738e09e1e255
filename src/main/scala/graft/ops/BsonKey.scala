package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Heterogeneous `_id` ordering (SURVEY §7.4 hard-part 1).
  *
  * BSON totally orders values across types — numbers sort before
  * strings, strings before objects, objects before ObjectIds (the
  * cross-type comparison order the reference inherits from the server;
  * splitter.go walks `_id` in that order). Graft carries document keys
  * as canonical extended-JSON TEXT (`Oplog.idOf`), which equality-joins
  * correctly but whose lexicographic order interleaves types ("25" <
  * "3"; '"a"' vs numbers by quote char) — wrong for range splitting.
  *
  * [[sortKey]] compiles the canonical-JSON id text into a
  * (rank, number, text) struct whose natural struct ordering reproduces
  * the BSON cross-type order: rank separates the type classes, the
  * numeric field orders numbers numerically (null for other ranks —
  * struct comparison puts nulls first, so it never perturbs non-number
  * ranks), and the text field breaks ties (for strings: the unquoted
  * value; for ObjectIds: the hex, whose bytewise order IS ObjectId
  * order). All expressions, no UDF.
  *
  * Caveats (documented, acceptable for split/diff sizing): int64 beyond
  * 2^53 loses precision in the double field (text tie-break keeps the
  * order deterministic, though "10" vs "9.99..e0" pathologies of equal
  * doubles fall back to text order); escaped-quote strings tie-break on
  * their escaped form. */
object BsonKey {

  /** Type rank following BSON comparison order: numbers(1) < strings(2)
    * < plain objects(3) < ObjectIds(4). Nulls first (0). */
  def typeRank(id: Column): Column =
    when(id.isNull, lit(0))
      .when(id.rlike("^-?[0-9]"), lit(1))
      .when(id.startsWith("\""), lit(2))
      .when(id.startsWith("{\"$oid\""), lit(4))
      .otherwise(lit(3))

  /** Orderable struct for a canonical-JSON id text column. */
  def sortKey(id: Column): Column = {
    val rank = typeRank(id)
    val num = when(rank === 1, id.cast("double"))
    val text = when(rank === 2, id.substr(lit(2), length(id) - 2))
      .when(rank === 4, regexp_extract(id, "\"\\$oid\"\\s*:\\s*\"([0-9a-fA-F]+)\"", 1))
      .otherwise(id)
    struct(rank.as("r"), num.as("n"), text.as("t"))
  }
}
