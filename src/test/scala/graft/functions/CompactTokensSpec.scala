package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** The fused tokenize+compact expression must agree exactly with the
  * per-token reference path (AsciiTokens + manual grouping) on arbitrary
  * input — terms, tf, doc length, and the decoded position stream. */
class CompactTokensSpec extends AnyFunSuite {

  private def decodePos(bytes: Array[Byte]): Seq[Int] = {
    var p = 0
    def readVLong(): Long = {
      var shift = 0; var v = 0L
      var b = bytes(p); p += 1
      while ((b & 0x80) != 0) {
        v |= (b & 0x7fL) << shift; shift += 7; b = bytes(p); p += 1
      }
      v | ((b & 0x7fL) << shift)
    }
    val n = readVLong().toInt
    var prev = -1L
    (0 until n).map { _ => prev += readVLong(); prev.toInt }
  }

  /** Reference: AsciiTokens tokenize + group in order of first occurrence. */
  private def reference(s: String): Seq[(String, Int, Int, Seq[Int])] = {
    val arr = AsciiTokens.tokenize(UTF8String.fromString(s))
    val toks = (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Vector[Int]]
    toks.zipWithIndex.foreach { case (t, i) =>
      m(t) = m.getOrElse(t, Vector.empty) :+ i
    }
    m.toSeq.map { case (t, ps) => (t, ps.length, toks.length, ps) }
  }

  private def fused(s: String): Seq[(String, Int, Int, Seq[Int])] = {
    val arr = CompactTokens.compact(UTF8String.fromString(s))
    (0 until arr.numElements()).map { i =>
      val r = arr.get(i, CompactTokens.schema match {
        case org.apache.spark.sql.types.ArrayType(et, _) => et
      }).asInstanceOf[InternalRow]
      (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2),
        decodePos(r.getBinary(3)))
    }
  }

  private val genContent: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar,
    3 -> Gen.oneOf(' ', '\n', '\t', '.', ',', ';', '(', ')', '{', '}', '_'),
    1 -> Gen.oneOf('é', 'ß', '漢', 'K'))).map(_.mkString)

  test("property: fused compact == AsciiTokens tokenize + group, including " +
      "positions, on arbitrary mixed-unicode input") {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300),
      Prop.forAll(genContent) { s => fused(s) == reference(s) })
    assert(res.passed, res.status.toString)
  }

  test("empty and token-less content compact to an empty array") {
    assert(fused("") == Seq.empty)
    assert(fused(" .,;\n\t") == Seq.empty)
  }

  test("fromTokens mirrors the expression on the same token stream") {
    val s = "Merge sort merge JOIN sort merge"
    val viaExpr = fused(s)
    val viaTokens = CompactTokens
      .fromTokens(s.toLowerCase.split("\\s+").toSeq)
      .map(e => (e.term, e.tf, e.len, decodePos(e.pos)))
    assert(viaExpr == viaTokens)
  }
}
