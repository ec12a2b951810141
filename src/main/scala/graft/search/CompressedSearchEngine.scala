package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._


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

  // native codegen'd decode (graft.functions.DecodePostings) — stays inside
  // whole-stage codegen fused with the explode, no catalyst↔Scala converters
  private def decodeCol(c: org.apache.spark.sql.Column) = {
    graft.functions.GraftFunctions.register(index.sparkSession)
    graft.functions.GraftFunctions.decodePostings(c)
  }

  private def rowsFor(terms: Seq[String]): DataFrame =
    index.filter(col("term").isin(terms: _*))

  /** Decoded view of the index: (term, df, doc_id, tf, len) — also the
    * encode∘decode = id roundtrip surface checked against the tf oracle. */
  def decoded(terms: Option[Seq[String]] = None): DataFrame = {
    val base = terms.fold(index)(ts => rowsFor(ts))
    base.select(col("term"), col("df"),
        explode(decodeCol(col("postings"))).as("p"))
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

  /** MaxScore-pruned top-k — rank-identical to [[searchTopK]].
    *
    * Three Spark jobs total (meta collect, θ pass, pruned rescore): the
    * candidate docId range comes from the essential terms' chunk metadata
    * gathered in the first collect (a superset of the exact candidate
    * min/max), not a separate action, and the query terms' index rows are
    * persisted across the passes so the index parquet is scanned once.
    *
    * Adaptive gate: below [[CompressedSearchEngine.PruneGateDocs]] docs the
    * decode work a prune could save is smaller than the two extra adaptive
    * round-trips it costs (measured: 3-job pruning loses to the single
    * exhaustive job up to at least 10^6 docs), so small corpora take the
    * exhaustive path unless `force` is set (tests/bench exercise the
    * machinery with force=true). */
  def searchPruned(terms: Seq[String], k: Int = 10,
                   force: Boolean = false): DataFrame = {
    if (terms.isEmpty) return searchTopK(terms, k)
    if (!force && nDocs < CompressedSearchEngine.PruneGateDocs)
      return searchTopK(terms, k)
    val rows = rowsFor(terms).persist()
    try {
      // (1) per-term metadata: df, max block weight, chunk docId range.
      val meta = rows.groupBy("term")
        .agg(first(col("df")).as("df"), max(col("max_weight")).as("mw"),
          min(col("first_doc_id")).as("lo"), max(col("last_doc_id")).as("hi"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getLong(3), r.getLong(4)))
      if (meta.isEmpty) return searchTopK(terms, k)
      val ub = meta.map { case (t, df, mw, _, _) =>
        t -> (BM25.idfValue(nDocs, df) * mw)
      }.toMap
      // (2) θ: k-th exact score of the rarest term (a lower bound on the
      // final k-th score), minus a safety margin for the display rounding.
      val rarest = meta.minBy(_._2)._1
      val kth = scoreDecoded(decodedFrom(
        rows.filter(col("term") === rarest)), k).collect()
      val theta = if (kth.length < k) 0.0 else kth.last.getDouble(1) - 1e-3
      // (3) essential terms: ascending by ub, drop the maximal prefix whose
      // cumulative ub stays strictly below θ — docs appearing ONLY in that
      // prefix provably cannot reach the top-k.
      val asc = meta.map(_._1).sortBy(ub)
      val cum = asc.scanLeft(0.0)((s, t) => s + ub(t)).tail
      val essential = asc.zip(cum).collect { case (t, c) if c >= theta => t }
      val essTerms = if (essential.isEmpty) Seq(asc.last) else essential.toSeq
      if (essTerms.length == terms.distinct.length)
        return scoreDecoded(decodedFrom(rows), k) // nothing pruned
      val essSet = essTerms.toSet
      // candidate docId range from essential chunk metadata (no extra job)
      val lo = meta.collect { case (t, _, _, l, _) if essSet(t) => l }.min
      val hi = meta.collect { case (t, _, _, _, h) if essSet(t) => h }.max
      // (4) candidates: docs present in at least one essential term;
      // rescore them over all terms, skipping chunks outside [lo, hi]
      // (block-range skip via chunk metadata).
      val cand = decodedFrom(rows.filter(col("term").isin(essTerms: _*)))
        .select("doc_id").distinct()
      val decodedRows = decodedFrom(
          rows.filter(col("last_doc_id") >= lo && col("first_doc_id") <= hi))
        .join(cand, Seq("doc_id"), "left_semi")
      scoreDecoded(decodedRows, k)
    } finally rows.unpersist()
  }

  /** (term, df, doc_id, tf, len) rows decoded from index chunk rows. */
  private def decodedFrom(chunkRows: DataFrame): DataFrame =
    chunkRows.select(col("term"), col("df"),
        explode(decodeCol(col("postings"))).as("p"))
      .select(col("term"), col("df"), col("p.doc_id").as("doc_id"),
        col("p.tf").as("tf"), col("p.len").as("len"))
}

object CompressedSearchEngine {
  /** Corpus size above which adaptive MaxScore pruning pays for its extra
    * driver round-trips (see [[CompressedSearchEngine.searchPruned]]). */
  val PruneGateDocs: Long =
    sys.env.get("SPARK_GRAFT_PRUNE_GATE").map(_.toLong).getOrElse(10_000_000L)
}
