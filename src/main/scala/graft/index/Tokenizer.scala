package graft.index

/** Tokenizer for code/text content.
  *
  * The analog of the reference's graph-text encoding step — the function that
  * turns raw content into the indexable unit stream (reference:
  * /root/reference/src/gin_gin.c:116-131 concatenates vertex labels into the
  * indexable sequence; here we emit terms instead of characters).
  *
  * Kept deliberately simple and *SQL-mirrorable* so the DuckDB oracle can
  * reproduce it exactly: lowercase, split on runs of anything outside
  * [a-z0-9_], drop empties. Positions are 0-based token ordinals.
  */
object Tokenizer {
  private val Sep = "[^a-z0-9_]+"

  /** content -> tokens in order (may contain duplicates). */
  def tokens(content: String): Array[String] = {
    if (content == null || content.isEmpty) return Array.empty
    content.toLowerCase.split(Sep).filter(_.nonEmpty)
  }

  /** content -> (term, position) pairs, position = token ordinal. */
  def tokensWithPos(content: String): Array[(String, Int)] = {
    val ts = tokens(content)
    val out = new Array[(String, Int)](ts.length)
    var i = 0
    while (i < ts.length) { out(i) = (ts(i), i); i += 1 }
    out
  }

  /** term -> tf for one document. */
  def termFreqs(content: String): Map[String, Int] = {
    val m = scala.collection.mutable.HashMap.empty[String, Int]
    val ts = tokens(content)
    var i = 0
    while (i < ts.length) { m.update(ts(i), m.getOrElse(ts(i), 0) + 1); i += 1 }
    m.toMap
  }

  /** Document length = number of tokens (BM25 dl). */
  def docLen(content: String): Int = tokens(content).length
}
