package graft.search

import graft.{SparkEntry, SparkSpec}
import graft.analyze.Analyzer
import graft.corpus.Corpus

/** Hard content-equality for the two driver entries DuckDB cannot mirror
  * (the code analyzer is not SQL-expressible, so CORRECTNESS records them
  * rows-only): the full q_tf_code table and the q_bm25_code top-k are
  * recomputed here by a direct driver-side Scala fold over the same
  * sf0.001 corpus — per-document lang dispatch included — and compared
  * cell for cell. */
class CodeOracleSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private lazy val docs: Seq[(Long, String, String)] =
    Corpus.files(spark, dir).select("doc_id", "content", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  private lazy val tfLocal: Seq[(Long, String, Long)] =
    docs.flatMap { case (id, content, lang) =>
      Analyzer.codeTokens(content, lang)
        .groupBy(identity).map { case (t, g) => (id, t, g.size.toLong) }
    }.sortBy(t => (t._1, t._2))

  test("q_tf_code: full-table equality vs driver-side Scala oracle") {
    val got = SparkEntry.queries("q_tf_code")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got.nonEmpty)
    assert(got === tfLocal)
  }

  test("q_bm25_code: top-k rank/score equality vs driver-side Scala oracle") {
    def round4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val tfByDoc: Map[Long, Map[String, Long]] =
      tfLocal.groupBy(_._1).map { case (id, rows) =>
        id -> rows.map(r => r._2 -> r._3).toMap }
    val df: Map[String, Int] = tfLocal.map(r => (r._2, r._1)).distinct
      .groupBy(_._1).map { case (t, g) => t -> g.size }
    val n = docs.size.toLong
    val lens = tfByDoc.collect { case (id, m) if m.nonEmpty => id -> m.values.sum }
    val avgdl = lens.values.sum.toDouble / lens.size
    val terms = Analyzer.codeTokens("merge sort window").distinct
    val want = tfByDoc.keys.toSeq
      .filter(id => terms.exists(tfByDoc(id).contains))
      .map { id =>
        val len = lens(id)
        val s = terms.collect {
          case t if tfByDoc(id).contains(t) =>
            val f = tfByDoc(id)(t).toDouble
            val idf = math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
            idf * (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * len / avgdl))
        }.sum
        id -> round4(s)
      }.sortBy { case (id, s) => (-s, id) }.take(10)
    val got = SparkEntry.queries("q_bm25_code")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.nonEmpty)
    assert(got === want)
  }
}
