package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataTypes, StringType}

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
  * Numbers sort through a DECIMAL(38,10) field — exact for every int64
  * (19 digits ≪ the 28 integer digits available) and for ordinary
  * doubles to 10 decimal places — so huge integer keys beyond 2^53 order
  * numerically, not by text. Values the decimal can't hold (|x| ≥ 10^28,
  * scientific-notation extremes) drop to a sign band around the decimal
  * range and order among themselves by double, which is exact there:
  * any double of magnitude ≥ 10^28 is an integer multiple of a large
  * power of two and carries no sub-decimal precision to lose.
  *
  * Caveats (documented, acceptable for split/diff sizing): floats with
  * more than 10 significant decimal places tie-break on text;
  * escaped-quote strings tie-break on their escaped form. */
object BsonKey {

  /** Exact numeric sort domain: int64 fits with 9 digits to spare. */
  private val Dec = DataTypes.createDecimalType(38, 10)

  /** Type rank following BSON comparison order: numbers(1) < strings(2)
    * < plain objects(3) < ObjectIds(4). Nulls first (0). */
  def typeRank(id: Column): Column =
    when(id.isNull, lit(0))
      .when(id.rlike("^-?[0-9]"), lit(1))
      .when(id.startsWith("\""), lit(2))
      .when(id.startsWith("{\"$oid\""), lit(4))
      .otherwise(lit(3))

  /** Orderable struct for a canonical-JSON id text column.
    *
    * Number ordering is three fields deep: `b` bands the value below
    * (-1), inside (0), or above (+1) the DECIMAL(38,10) range, `n`
    * orders band 0 exactly, and `f` orders the overflow bands by
    * double. Within any one band the other numeric field is uniformly
    * NULL, so struct comparison never mixes the two scales. */
  def sortKey(id: Column): Column = {
    val rank = typeRank(id)
    // try_cast: overflow/garbage → NULL (plain cast THROWS under Spark
    // 4's default ANSI mode — the fallback band depends on the null)
    val dec = when(rank === 1, id.try_cast(Dec))
    val dbl = when(rank === 1 && dec.isNull, id.try_cast("double"))
    val band = when(rank === 1,
      when(dec.isNotNull || dbl.isNull, lit(0))
        .when(dbl < 0, lit(-1)).otherwise(lit(1)))
    val text = when(rank === 2, id.substr(lit(2), length(id) - 2))
      .when(rank === 4, regexp_extract(id, "\"\\$oid\"\\s*:\\s*\"([0-9a-fA-F]+)\"", 1))
      .otherwise(id)
    struct(rank.as("r"), band.as("b"), dec.as("n"), dbl.as("f"), text.as("t"))
  }

  /** The ordering a caller should use for key column `key` of `df` when
    * it has no better information: BSON cross-type order for text keys
    * (graft's doc-store catalogs carry `_id` as canonical-JSON TEXT, so
    * a string key column is one — and a plain, non-JSON string column
    * still gets a consistent total order: lexicographic within each
    * type class, which is all range splitting and chunked compare
    * require of an ordering), natural column order for every other
    * type. This is what makes BSON ordering the
    * DEFAULT rather than opt-in: splitter/compare callers pass
    * `BsonKey.defaultOrder(df, key)` instead of `col(key)` and mixed
    * int/string/ObjectId namespaces stop interleaving ("150" < "2"). */
  def defaultOrder(df: org.apache.spark.sql.DataFrame, key: String): Column =
    df.schema(key).dataType match {
      case StringType => sortKey(col(key))
      case _ => col(key)
    }
}
