package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Block-selective decode of a posting chunk — the read path of the
  * block-max skip metadata (north rule: "block-max WAND pruning").
  *
  * Decodes ONLY the 128-posting blocks whose doc-id range `(prevLast, last]`
  * intersects `[lo, hi]` AND whose `max_weight` is at least `minw`; other
  * blocks are skipped without touching their bytes (each block's byte span
  * is `[offset_i, offset_{i+1})` and its delta base is the previous block's
  * `last_doc_id` — exactly what PostingCodec.BlockMeta stores).
  *
  * Two users in CompressedSearchEngine.searchPruned:
  *  - candidate generation: per-term `minw` = the block-max WAND bound
  *    (a block can seed a top-k candidate only if idf·max_weight plus every
  *    other term's upper bound reaches θ),
  *  - rescore: `[lo, hi]` = the candidates' doc range (minw = 0 — every
  *    contribution of a surviving candidate counts).
  */
case class DecodePostingsBlocks(postings: Expression, blocks: Expression,
                                lo: Expression, hi: Expression,
                                minw: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(postings, blocks, lo, hi, minw)
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = DecodePostings.schema

  override def eval(input: InternalRow): Any = {
    val p = postings.eval(input)
    val b = blocks.eval(input)
    val l = lo.eval(input)
    val h = hi.eval(input)
    val w = minw.eval(input)
    // full null propagation across all five children (ADVICE r2): callers
    // pass literal lo/hi/minw today, but a nullable scalar child must yield
    // null, not decode with defaults
    if (p == null || b == null || l == null || h == null || w == null) return null
    DecodePostingsBlocks.decode(p.asInstanceOf[Array[Byte]],
      b.asInstanceOf[ArrayData],
      l.asInstanceOf[Long], h.asInstanceOf[Long], w.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pG = postings.genCode(ctx)
    val bG = blocks.genCode(ctx)
    val lG = lo.genCode(ctx)
    val hG = hi.genCode(ctx)
    val wG = minw.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${pG.code}
      ${bG.code}
      ${lG.code}
      ${hG.code}
      ${wG.code}
      boolean ${ev.isNull} = ${pG.isNull} || ${bG.isNull} ||
        ${lG.isNull} || ${hG.isNull} || ${wG.isNull};
      $javaType ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.DecodePostingsBlocks.decode(
          ${pG.value}, ${bG.value}, ${lG.value}, ${hG.value}, ${wG.value});
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DecodePostingsBlocks =
    copy(postings = newChildren(0), blocks = newChildren(1),
      lo = newChildren(2), hi = newChildren(3), minw = newChildren(4))
}

object DecodePostingsBlocks {
  /** Static helper invoked from generated code. `blocks` rows are
    * (last_doc_id: long, max_tf: int, max_weight: double, offset: int). */
  def decode(bytes: Array[Byte], blocks: ArrayData,
             lo: Long, hi: Long, minw: Double): ArrayData = {
    val nBlocks = blocks.numElements()
    val out = new java.util.ArrayList[AnyRef](64)
    var i = 0
    var prevLast = -1L
    var break = false
    while (i < nBlocks && !break) {
      val row = blocks.getStruct(i, 4)
      val last = row.getLong(0)
      val maxW = row.getDouble(2)
      val offset = row.getInt(3)
      if (prevLast >= hi) break = true // blocks are doc-ascending
      else if (last >= lo && maxW >= minw) {
        val end = if (i + 1 < nBlocks) blocks.getStruct(i + 1, 4).getInt(3)
          else bytes.length
        var pos = offset
        var prev = prevLast
        while (pos < end) {
          var shift = 0
          var v = 0L
          var b = bytes(pos); pos += 1
          while ((b & 0x80) != 0) {
            v |= (b & 0x7fL) << shift; shift += 7; b = bytes(pos); pos += 1
          }
          val doc = prev + (v | ((b & 0x7fL) << shift))
          // tf
          shift = 0; v = 0L; b = bytes(pos); pos += 1
          while ((b & 0x80) != 0) {
            v |= (b & 0x7fL) << shift; shift += 7; b = bytes(pos); pos += 1
          }
          val tf = (v | ((b & 0x7fL) << shift)).toInt
          // len
          shift = 0; v = 0L; b = bytes(pos); pos += 1
          while ((b & 0x80) != 0) {
            v |= (b & 0x7fL) << shift; shift += 7; b = bytes(pos); pos += 1
          }
          val len = (v | ((b & 0x7fL) << shift)).toInt
          prev = doc
          out.add(new GenericInternalRow(Array[Any](doc, tf, len)): InternalRow)
        }
      }
      prevLast = last
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }
}
