package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (the UDAF extension point, SURVEY §2.12): bounded
  * per-group top-k as a k-entry heap aggregate.
  *
  * This is the MAP-SIDE-COMBINING alternative to the salted two-level
  * window top-k (`Retrieval.saltedTopK`): state is at most `k` entries
  * per group per partition, `merge` is associative + commutative, so
  * Spark pre-combines before the exchange and a corpus-sized group
  * ships only `k` entries per map task — no sort of the full candidate
  * list anywhere, not even sharded. The trade: a typed Aggregator
  * deserializes its buffer per row (no whole-stage codegen), so the
  * window plan usually wins on raw throughput while THIS shape wins
  * when groups are few and huge, or when the aggregate composes with
  * other typed logic. TopKAggSpec pins both plans to identical output.
  *
  * Ordering: (score DESC, key ASC) — key is the deterministic
  * tie-break, so results are a pure function of the input set. */
final case class TopKEntry(score: Long, key: Long)

class TopKAgg(k: Int)
    extends Aggregator[TopKEntry, List[TopKEntry], Seq[TopKEntry]] {
  require(k > 0, "k must be positive")

  /** total order: better-first (higher score, then smaller key) */
  private def better(a: TopKEntry, b: TopKEntry): Boolean =
    a.score > b.score || (a.score == b.score && a.key < b.key)

  private def insert(buf: List[TopKEntry], e: TopKEntry): List[TopKEntry] = {
    // buf is kept better-first and ≤ k long; insertion is O(k)
    val (front, back) = buf.span(better(_, e))
    val merged = front ::: e :: back
    if (merged.lengthCompare(k) > 0) merged.take(k) else merged
  }

  override def zero: List[TopKEntry] = Nil
  override def reduce(buf: List[TopKEntry], e: TopKEntry): List[TopKEntry] =
    insert(buf, e)
  override def merge(a: List[TopKEntry], b: List[TopKEntry]): List[TopKEntry] =
    b.foldLeft(a)(insert)
  override def finish(buf: List[TopKEntry]): Seq[TopKEntry] = buf
  override def bufferEncoder: Encoder[List[TopKEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[TopKEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
