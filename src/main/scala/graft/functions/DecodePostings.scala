package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd decode of a delta-gap var-byte posting chunk
  * (`graft.index.PostingCodec` wire format) into
  * `array<struct<doc_id:bigint, tf:int, len:int>>`.
  *
  * Replaces a Scala `udf` on the query hot path: a UDF routes every row
  * through the catalyst↔Scala converters (case-class encoder, boxing); this
  * expression decodes the byte[] directly into InternalRows and stays
  * inside whole-stage codegen, fused with the downstream `explode`. The
  * decode loop is the §7.5 "Catalyst Expression for var-byte decode"
  * deferred optimization from SURVEY.md.
  */
case class DecodePostings(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DecodePostings.schema

  override protected def nullSafeEval(input: Any): Any =
    DecodePostings.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DecodePostings.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): DecodePostings =
    copy(child = newChild)
}

object DecodePostings {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("tf", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false))), containsNull = false)

  /** Static helper invoked from generated code: LEB128 stream →
    * InternalRow array. Mirrors PostingCodec.decode exactly (prev = -1,
    * gap/tf/len triples). */
  def decode(bytes: Array[Byte]): ArrayData = {
    // postings are ≥3 bytes each; presize to the upper bound
    val out = new java.util.ArrayList[AnyRef](bytes.length / 3 + 1)
    var pos = 0
    var prev = -1L

    @inline def readVLong(): Long = {
      var shift = 0
      var v = 0L
      var b = bytes(pos)
      pos += 1
      while ((b & 0x80) != 0) {
        v |= (b & 0x7fL) << shift
        shift += 7
        b = bytes(pos)
        pos += 1
      }
      v | ((b & 0x7fL) << shift)
    }

    while (pos < bytes.length) {
      val doc = prev + readVLong()
      val tf = readVLong().toInt
      val len = readVLong().toInt
      prev = doc
      out.add(new GenericInternalRow(
        Array[Any](doc, tf, len)): InternalRow)
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }
}
