package graft.oracle

import graft.analyze.Analyzer
import graft.search.{Bool, Phrase, QueryParser, Tokens}

/** Tiny, obviously-correct in-memory implementation of the full
  * tokenize → df → BM25 → sort pipeline (SURVEY.md §5 item 2). Every Spark
  * query's top-k must be rank-identical (rounded-score-equal, order-identical
  * under the deterministic tiebreak) against this oracle.
  */
object LocalOracle {
  val K1 = 1.2
  val B = 0.75

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  def search(docs: Seq[(Long, String)], analyzer: String, raw: String,
             k: Int = 10, docLang: String = ""): Seq[(Long, Double)] = {
    // documents tokenize with their language's keyword stop set (per-lang
    // dispatch); queries have no language and keep keywords
    def docTokens(c: String): Seq[String] = analyzer match {
      case "code" => Analyzer.codeTokens(c, docLang)
      case _      => Analyzer.queryTokens(analyzer, c)
    }
    val toks: Map[Long, Seq[String]] =
      docs.map { case (id, c) => id -> docTokens(c) }.toMap
    val tf: Map[Long, Map[String, Int]] =
      toks.map { case (id, ts) => id -> ts.groupBy(identity).map { case (t, g) => t -> g.size } }
    val df: Map[String, Int] =
      tf.values.flatMap(_.keys).toSeq.groupBy(identity).map { case (t, g) => t -> g.size }
    val n = docs.size.toLong
    val lens = tf.collect { case (id, m) if m.nonEmpty => id -> m.values.sum }
    val avgdl = if (lens.isEmpty) 0.0 else lens.values.sum.toDouble / lens.size

    def qtoks(s: String) = Analyzer.queryTokens(analyzer, s).distinct

    def candAll(terms: Seq[String]): Set[Long] =
      if (terms.isEmpty) Set.empty
      else docs.collect { case (id, _) if terms.forall(t => tf(id).contains(t)) => id }.toSet

    def phraseCand(phrase: String): Set[Long] = {
      val byId = docs.toMap
      candAll(qtoks(phrase))
        .filter(id => byId(id).toLowerCase.contains(phrase.toLowerCase))
    }

    def score(terms: Seq[String], cand: Option[Set[Long]]): Seq[(Long, Double)] = {
      val hits = docs.collect {
        case (id, _) if terms.exists(t => tf(id).contains(t)) &&
          cand.forall(_.contains(id)) => id
      }
      hits.map { id =>
        val len = lens(id)
        val s = terms.collect {
          case t if tf(id).contains(t) =>
            val f = tf(id)(t).toDouble
            val idf = math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
            idf * (f * (K1 + 1)) / (f + K1 * ((1 - B) + B * len / avgdl))
        }.sum
        id -> round4(s)
      }.sortBy { case (id, s) => (-s, id) }.take(k)
    }

    QueryParser.parse(raw) match {
      case Tokens(text) => score(qtoks(text), None)
      case Phrase(p)    => score(qtoks(p), Some(phraseCand(p)))
      case Bool(op, p1, p2) =>
        val c1 = phraseCand(p1); val c2 = phraseCand(p2)
        val cand = op match {
          case "and" => c1 intersect c2
          case "or"  => c1 union c2
          case "not" => c1 diff c2
        }
        val terms = if (op == "not") qtoks(p1) else (qtoks(p1) ++ qtoks(p2)).distinct
        score(terms, Some(cand))
    }
  }
}
