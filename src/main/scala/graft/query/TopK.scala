package graft.query

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** One scored candidate. */
case class Scored(doc_id: Long, score: Double)

/** Bounded top-k typed aggregator — the `max_matches` analog
  * (/root/reference/gin.c:723-730): partial = per-partition bounded
  * ordered buffer, merge = bounded merge, so only O(k) rows per group
  * cross the shuffle (partial+final aggregation, never a global sort).
  *
  * Ordering: score DESC, doc_id ASC (deterministic tie-break; callers
  * pass scores already rounded when oracle parity is required).
  */
class TopKAgg(k: Int) extends Aggregator[Scored, List[Scored], Seq[Scored]] {
  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.doc_id < b.doc_id)

  private def insert(buf: List[Scored], x: Scored): List[Scored] = {
    // buf kept sorted best-first, length <= k
    if (buf.lengthCompare(k) >= 0 && !better(x, buf.last)) buf
    else {
      val (pre, post) = buf.span(better(_, x))
      (pre ::: (x :: post)).take(k)
    }
  }

  def zero: List[Scored] = Nil
  def reduce(buf: List[Scored], x: Scored): List[Scored] = insert(buf, x)
  def merge(a: List[Scored], b: List[Scored]): List[Scored] =
    b.foldLeft(a)(insert)
  def finish(buf: List[Scored]): Seq[Scored] = buf
  def bufferEncoder: Encoder[List[Scored]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}
