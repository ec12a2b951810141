package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd decode of a posting chunk PLUS its parallel position
  * stream into occurrence rows `array<struct<doc_id:bigint, pos:int>>` — one
  * entry per token occurrence. Feeds the phrase adjacency pre-filter
  * (CompressedSearchEngine.adjacencyCandidates); the BM25 scoring path uses
  * [[DecodePostings]] and never touches the positions column.
  *
  * Wire format of `positions` (PostingCodec.encodeWithPos): per posting, in
  * chunk posting order: vint(count) then count delta-gap varints (prev = -1).
  * doc ids come from the postings stream (left child).
  */
case class DecodePositions(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DecodePositions.schema

  override protected def nullSafeEval(postings: Any, positions: Any): Any =
    DecodePositions.decode(postings.asInstanceOf[Array[Byte]],
      positions.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (p, q) => s"graft.functions.DecodePositions.decode($p, $q)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecodePositions =
    copy(left = newLeft, right = newRight)
}

object DecodePositions {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("pos", IntegerType, nullable = false))), containsNull = false)

  /** Static helper invoked from generated code. */
  def decode(postings: Array[Byte], positions: Array[Byte]): ArrayData = {
    val out = new java.util.ArrayList[AnyRef](positions.length + 1)
    var pPos = 0
    var qPos = 0
    var prevDoc = -1L

    @inline def readP(): Long = {
      var shift = 0
      var v = 0L
      var b = postings(pPos)
      pPos += 1
      while ((b & 0x80) != 0) {
        v |= (b & 0x7fL) << shift
        shift += 7
        b = postings(pPos)
        pPos += 1
      }
      v | ((b & 0x7fL) << shift)
    }
    @inline def readQ(): Long = {
      var shift = 0
      var v = 0L
      var b = positions(qPos)
      qPos += 1
      while ((b & 0x80) != 0) {
        v |= (b & 0x7fL) << shift
        shift += 7
        b = positions(qPos)
        qPos += 1
      }
      v | ((b & 0x7fL) << shift)
    }

    while (pPos < postings.length) {
      val doc = prevDoc + readP()
      readP() // tf (positions stream carries its own count)
      readP() // len
      prevDoc = doc
      val n = readQ().toInt
      var prev = -1L
      var j = 0
      while (j < n) {
        prev += readQ()
        out.add(new GenericInternalRow(
          Array[Any](doc, prev.toInt)): InternalRow)
        j += 1
      }
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }
}
