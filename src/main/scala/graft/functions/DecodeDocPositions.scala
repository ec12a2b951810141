package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Posting-granular decode of a chunk's positions: one entry per POSTING —
  * `array<struct<doc_id: bigint, ps: array<int>>>` — instead of one entry
  * per occurrence ([[DecodePositions]]).
  *
  * Feeds the phrase adjacency pre-filter's candidate semi join at posting
  * granularity: the join probes (and the union rows that flow into it) drop
  * by the per-document term frequency factor — on a code corpus tf ≥ 8 for
  * every present term — and positions explode to occurrence rows only AFTER
  * the candidate narrowing, where the (doc_id, start) aggregation needs
  * them. Wire format identical to [[DecodePositions]].
  */
case class DecodeDocPositions(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DecodeDocPositions.schema

  override protected def nullSafeEval(postings: Any, positions: Any): Any =
    DecodeDocPositions.decode(postings.asInstanceOf[Array[Byte]],
      positions.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (p, q) => s"graft.functions.DecodeDocPositions.decode($p, $q)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecodeDocPositions =
    copy(left = newLeft, right = newRight)
}

object DecodeDocPositions {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("ps", ArrayType(IntegerType, containsNull = false),
      nullable = false))), containsNull = false)

  /** Static helper invoked from generated code. */
  def decode(postings: Array[Byte], positions: Array[Byte]): ArrayData = {
    val out = new java.util.ArrayList[AnyRef](64)
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
      val ps = new Array[Int](n)
      var prev = -1L
      var j = 0
      while (j < n) {
        prev += readQ()
        ps(j) = prev.toInt
        j += 1
      }
      out.add(new GenericInternalRow(
        Array[Any](doc, new GenericArrayData(ps))): InternalRow)
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }
}
