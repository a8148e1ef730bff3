package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed exact top-k Aggregator (the `Aggregator[IN,BUF,OUT]` extension
  * point SURVEY.md §2.I reserves for exact top-k/sketches): keeps the k
  * highest-scoring ids per group with (score desc, id asc) total order;
  * partial-aggregable, so map-side combine bounds shuffle volume at ≤2k
  * rows per group per partition.
  */
final case class Scored(score: Double, id: Long)

/** Buffer wrapper: a Product root so the buffer serializes through the
  * columnar product encoder (UnsafeRow array of structs) instead of
  * opaque Kryo blobs — spills and shuffle writes stay columnar and cheap.
  */
final case class TopKBuf(items: Seq[Scored])

final class TopK(k: Int) extends Aggregator[Scored, TopKBuf, String] {

  private def trim(s: Seq[Scored]): Seq[Scored] =
    s.sortBy(r => (-r.score, r.id)).take(k)

  override def zero: TopKBuf = TopKBuf(Vector.empty)

  /** Append-only until the buffer reaches 2k, then trim once — the sort
    * cost amortizes to O(log k) per row instead of a full buffer re-sort
    * per input row, and the buffer never exceeds 2k rows at a partial
    * boundary. Correct because trim keeps the k best seen so far: any row
    * outside the current top-k can never re-enter the final top-k.
    */
  override def reduce(b: TopKBuf, a: Scored): TopKBuf = {
    val appended = b.items :+ a
    TopKBuf(if (appended.size >= 2 * k) trim(appended) else appended)
  }

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf =
    TopKBuf(trim(x.items ++ y.items))

  // finish must trim: a buffer that never crossed 2k arrives un-trimmed
  override def finish(b: TopKBuf): String =
    trim(b.items).map(_.id).mkString(",")

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
