package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed exact top-k Aggregator (the `Aggregator[IN,BUF,OUT]` extension
  * point SURVEY.md §2.I reserves for exact top-k/sketches): keeps the k
  * highest-scoring ids per group with (score desc, id asc) total order;
  * partial-aggregable, so map-side combine bounds shuffle volume at k
  * rows per group per partition.
  */
final case class Scored(score: Double, id: Long)

final class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], String] {

  private def trim(s: Seq[Scored]): Seq[Scored] =
    s.sortBy(r => (-r.score, r.id)).take(k)

  override def zero: Seq[Scored] = Seq.empty
  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = trim(b :+ a)
  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = trim(x ++ y)
  override def finish(b: Seq[Scored]): String = b.map(_.id).mkString(",")

  override def bufferEncoder: Encoder[Seq[Scored]] = Encoders.kryo[Seq[Scored]]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
