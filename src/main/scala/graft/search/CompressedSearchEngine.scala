package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.index.PostingCodec

/** BM25 retrieval over the compressed block-max index
  * (`index(term, df, chunk_id, first_doc_id, last_doc_id, n, max_weight,
  * blocks, postings)`).
  *
  * Two paths:
  *  - [[searchTopK]]: exhaustive — decode every chunk of the query terms,
  *    score, top-k. The correctness baseline.
  *  - [[searchPruned]]: MaxScore + block-range pruning — a θ lower bound on
  *    the k-th score comes from exactly scoring the rarest term's postings;
  *    terms whose cumulative upper bounds stay below θ are non-essential
  *    (docs appearing ONLY in them provably cannot reach the top-k), so
  *    candidate generation decodes only essential terms, and the rescore
  *    pass skips chunks outside the candidates' docId range. Guaranteed
  *    rank-identical to the exhaustive path (asserted in tests and by the
  *    shared DuckDB oracle).
  *
  * Everything stays distributed: the only `collect`s are O(#query-terms)
  * metadata rows and the k threshold scores — never postings.
  */
final class CompressedSearchEngine(val index: DataFrame, val nDocs: Long,
                                   val avgdl: Double) {

  private val decodeUdf = udf((bytes: Array[Byte]) => PostingCodec.decode(bytes))

  private def rowsFor(terms: Seq[String]): DataFrame =
    index.filter(col("term").isin(terms: _*))

  /** Decoded view of the index: (term, df, doc_id, tf, len) — also the
    * encode∘decode = id roundtrip surface checked against the tf oracle. */
  def decoded(terms: Option[Seq[String]] = None): DataFrame = {
    val base = terms.fold(index)(ts => rowsFor(ts))
    base.select(col("term"), col("df"),
        explode(decodeUdf(col("postings"))).as("p"))
      .select(col("term"), col("df"), col("p.doc_id").as("doc_id"),
        col("p.tf").as("tf"), col("p.len").as("len"))
  }

  private def scoreDecoded(decodedRows: DataFrame, k: Int): DataFrame =
    decodedRows
      .withColumn("w", BM25.weight(avgdl, nDocs))
      .groupBy("doc_id")
      .agg(round(sum(col("w")), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)

  /** Exhaustive top-k over the compressed index. */
  def searchTopK(terms: Seq[String], k: Int = 10): DataFrame =
    scoreDecoded(decoded(Some(terms)), k)

  /** E5 conjunctive candidates from the index alone (docs containing ALL
    * terms), mirroring SearchEngine.candidatesAll over decoded postings. */
  def candidatesAll(terms: Seq[String]): DataFrame =
    if (terms.isEmpty) index.sparkSession.range(0).select(col("id").as("doc_id"))
    else decoded(Some(terms)).groupBy("doc_id")
      .agg(countDistinct(col("term")).as("nt"))
      .filter(col("nt") === terms.length).select("doc_id")

  /** P4 phrase candidates: conjunctive tokens + raw substring filter over
    * the corpus (`dbManager.java:324-341` semantics). */
  def phraseCandidates(phrase: String, files: DataFrame,
                       analyzer: String = "simple"): DataFrame = {
    graft.functions.GraftFunctions.register(files.sparkSession)
    val cand = candidatesAll(graft.analyze.Analyzer.queryTokens(analyzer, phrase).distinct)
    files.join(cand, Seq("doc_id"), "left_semi")
      .filter(contains(graft.functions.GraftFunctions.asciiLower(col("content")),
        lit(phrase.toLowerCase)))
      .select("doc_id")
  }

  private def scoreCand(terms: Seq[String], cand: Option[DataFrame], k: Int): DataFrame = {
    val base = decoded(Some(terms))
    val rows = cand.fold(base)(c => base.join(c, Seq("doc_id"), "left_semi"))
    scoreDecoded(rows, k)
  }

  /** Full query lifecycle over the persisted index + corpus (serving path):
    * parse → candidates → BM25 → top-k, mirroring SearchEngine.search. */
  def search(raw: String, files: DataFrame, k: Int = 10,
             analyzer: String = "simple"): DataFrame = {
    def toks(s: String) = graft.analyze.Analyzer.queryTokens(analyzer, s).distinct
    QueryParser.parse(raw) match {
      case Tokens(text) => scoreCand(toks(text), None, k)
      case Phrase(p)    => scoreCand(toks(p), Some(phraseCandidates(p, files, analyzer)), k)
      case Bool(op, p1, p2) =>
        val c1 = phraseCandidates(p1, files, analyzer)
        val c2 = phraseCandidates(p2, files, analyzer)
        val cand = op match {
          case "and" => c1.intersect(c2)
          case "or"  => c1.union(c2).distinct()
          case "not" => c1.except(c2)
        }
        val terms = if (op == "not") toks(p1) else (toks(p1) ++ toks(p2)).distinct
        scoreCand(terms, Some(cand), k)
    }
  }

  /** MaxScore-pruned top-k — rank-identical to [[searchTopK]]. */
  def searchPruned(terms: Seq[String], k: Int = 10): DataFrame = {
    if (terms.isEmpty) return searchTopK(terms, k)
    // (1) per-term metadata: df + global max block weight (tiny collect).
    val meta = rowsFor(terms).groupBy("term")
      .agg(first(col("df")).as("df"), max(col("max_weight")).as("mw"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    if (meta.isEmpty) return searchTopK(terms, k)
    val ub = meta.map { case (t, df, mw) =>
      t -> BM25.idfValue(nDocs, df) * mw
    }.toMap
    // (2) θ: k-th exact score of the rarest term (a lower bound on the final
    // k-th score), minus a safety margin for the display rounding.
    val rarest = meta.minBy(_._2)._1
    val kth = searchTopK(Seq(rarest), k).collect()
    val theta = if (kth.length < k) 0.0 else kth.last.getDouble(1) - 1e-3
    // (3) essential terms: ascending by ub, drop the maximal prefix whose
    // cumulative ub stays strictly below θ.
    val asc = meta.map(_._1).sortBy(ub)
    val cum = asc.scanLeft(0.0)((s, t) => s + ub(t)).tail
    val essential = asc.zip(cum).collect { case (t, c) if c >= theta => t }
    val essTerms = if (essential.isEmpty) Seq(asc.last) else essential.toSeq
    // (4) candidates: docs present in at least one essential term.
    val cand = decoded(Some(essTerms)).select("doc_id").distinct()
    val bounds = cand.agg(min("doc_id"), max("doc_id")).head()
    if (bounds.isNullAt(0)) return searchTopK(terms, k)
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    // (5) rescore candidates over all terms, skipping chunks outside the
    // candidate docId range (block-range skip via chunk metadata).
    val pruned = rowsFor(terms)
      .filter(col("last_doc_id") >= lo && col("first_doc_id") <= hi)
    val decodedRows = pruned.select(col("term"), col("df"),
        explode(decodeUdf(col("postings"))).as("p"))
      .select(col("term"), col("df"), col("p.doc_id").as("doc_id"),
        col("p.tf").as("tf"), col("p.len").as("len"))
      .join(cand, Seq("doc_id"), "left_semi")
    scoreDecoded(decodedRows, k)
  }
}
