package graft.index

import java.io.ByteArrayOutputStream

/** Delta + varint codec for sorted posting runs.
  *
  * The Spark-side replacement for the reference's bit-packed FM-index
  * block layout (reference: /root/reference/src/gin_fmi.c:157-236 packs
  * rank-sampled blocks at a fixed sample rate; here a posting block holds
  * up to `blockSize` (doc_id, tf) pairs, doc ids stored as
  * first-value + varint deltas, tfs as plain varints). Per-block metadata
  * (doc_id_base, doc_id_max, max tf-norm) gives the skip/block-max
  * structure used by WAND pruning — the analog of the sampled-SA
  * occupancy index (/root/reference/src/gin_fmi.c:157-195).
  */
object Codec {

  /** Unsigned LEB128 varint append. */
  def writeVarLong(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    require(v >= 0, s"varint requires non-negative, got $v")
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Encode a strictly-increasing doc-id run as delta varints
    * (first value absolute). */
  def encodeDeltas(ids: Array[Long]): Array[Byte] = encodeDeltas(ids, ids.length)

  /** Prefix form: encode ids(0 until n) — callers can reuse one buffer
    * across blocks instead of allocating per block. */
  def encodeDeltas(ids: Array[Long], n: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(n * 2)
    var prev = 0L
    var i = 0
    while (i < n) {
      val d = if (i == 0) ids(0) else ids(i) - prev
      require(i == 0 || d > 0, s"doc ids must be strictly increasing at $i")
      writeVarLong(out, d)
      prev = ids(i)
      i += 1
    }
    out.toByteArray
  }

  /** Decode `n` delta varints back into absolute doc ids. */
  def decodeDeltas(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var pos = 0
    var prev = 0L
    var i = 0
    while (i < n) {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xff
        v |= (b & 0x7fL) << shift
        shift += 7
        pos += 1
      } while ((b & 0x80) != 0)
      prev = if (i == 0) v else prev + v
      out(i) = prev
      i += 1
    }
    out
  }

  /** Encode tf values (small positive ints) as plain varints. */
  def encodeInts(vals: Array[Int]): Array[Byte] = encodeInts(vals, vals.length)

  /** Prefix form: encode vals(0 until n) from a reused buffer. */
  def encodeInts(vals: Array[Int], n: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(n)
    var i = 0
    while (i < n) { writeVarLong(out, vals(i).toLong); i += 1 }
    out.toByteArray
  }

  /** Decode `n` plain varints. */
  def decodeInts(bytes: Array[Byte], n: Int): Array[Int] = {
    val out = new Array[Int](n)
    var pos = 0
    var i = 0
    while (i < n) {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xff
        v |= (b & 0x7fL) << shift
        shift += 7
        pos += 1
      } while ((b & 0x80) != 0)
      out(i) = v.toInt
      i += 1
    }
    out
  }
}
