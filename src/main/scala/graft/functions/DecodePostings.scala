package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import graft.index.Codec

/** Native Catalyst generator that explodes one compressed posting block
  * into (doc_id, tf, dl) rows — the custom-Expression tier of the
  * extension ladder (compose built-ins < custom Expression < custom
  * plan node): decoding happens directly on the block's binary columns
  * inside the executor row pipeline, with no Dataset encoder round-trip
  * through a case class (the typed-flatMap path deserializes a whole
  * PostingBlock object per block and re-serializes every posting).
  * Extension ladder per the project brief: compose built-ins, then a
  * custom Expression (this), then LogicalPlan/Strategy only if needed.
  *
  * Usage:
  * {{{
  *   blocks.select($"term",
  *     DecodePostings.rows($"num_docs", $"doc_deltas", $"tfs", $"dls")
  *       .as(Seq("doc_id", "tf", "dl")))
  * }}}
  */
case class DecodePostings(
    numDocs: Expression,
    docDeltas: Expression,
    tfs: Expression,
    dls: Expression)
  extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(numDocs, docDeltas, tfs, dls)

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("tf", IntegerType, nullable = false),
    StructField("dl", IntegerType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = numDocs.dataType == IntegerType &&
      docDeltas.dataType == BinaryType &&
      tfs.dataType == BinaryType && dls.dataType == BinaryType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "expected (int, binary, binary, binary)")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val n = numDocs.eval(input).asInstanceOf[Int]
    val ids = Codec.decodeDeltas(docDeltas.eval(input).asInstanceOf[Array[Byte]], n)
    val tfA = Codec.decodeInts(tfs.eval(input).asInstanceOf[Array[Byte]], n)
    val dlA = Codec.decodeInts(dls.eval(input).asInstanceOf[Array[Byte]], n)
    new Iterator[InternalRow] {
      private var i = 0
      def hasNext: Boolean = i < n
      def next(): InternalRow = {
        val r = InternalRow(ids(i), tfA(i), dlA(i))
        i += 1
        r
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3))
}

object DecodePostings {
  import org.apache.spark.sql.GraftBridge
  /** Column form of the generator (multi-alias it with .as(Seq(...))). */
  def rows(numDocs: Column, docDeltas: Column, tfs: Column, dls: Column): Column =
    GraftBridge.column(DecodePostings(
      GraftBridge.expression(numDocs),
      GraftBridge.expression(docDeltas),
      GraftBridge.expression(tfs),
      GraftBridge.expression(dls)))
}
