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
/** One decoded substring match. */
case class SubMatch(doc_id: Long, n_matches: Long, first_offset: Long)

/** Bounded smallest-k-by-doc_id aggregator — the `max_matches` cap for
  * the substring decode path. Same partial/merge shape as TopKAgg:
  * per-partition bounded buffers, bounded merge, so only O(k) rows per
  * query cross the shuffle — never a single-task global sort of every
  * match of a common pattern. */
class MinKByDocAgg(k: Int)
    extends Aggregator[SubMatch, List[SubMatch], Seq[SubMatch]] {
  private def insert(buf: List[SubMatch], x: SubMatch): List[SubMatch] =
    if (buf.lengthCompare(k) >= 0 && x.doc_id >= buf.last.doc_id) buf
    else {
      val (pre, post) = buf.span(_.doc_id < x.doc_id)
      (pre ::: (x :: post)).take(k)
    }
  def zero: List[SubMatch] = Nil
  def reduce(buf: List[SubMatch], x: SubMatch): List[SubMatch] = insert(buf, x)
  def merge(a: List[SubMatch], b: List[SubMatch]): List[SubMatch] =
    b.foldLeft(a)(insert)
  def finish(buf: List[SubMatch]): Seq[SubMatch] = buf
  def bufferEncoder: Encoder[List[SubMatch]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[SubMatch]] = ExpressionEncoder()
}

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
