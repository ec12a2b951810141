package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.analyze.Analyzer
import graft.index.{IndexTables, Stats}

/** BM25 (k1=1.2, b=0.75) retrieval over the stats tables, with the
  * reference's candidate algebra (SURVEY.md §2.7 E1–E5) and phrase semantics
  * (§7.4 #4: phrase = conjunctive token candidates + case-insensitive raw
  * substring filter on content, `dbManager.java:324-341`).
  *
  * The whole query is one declarative Catalyst plan: the query-term table is
  * a literal `isin` filter (pushed to the scan), candidate reductions are
  * semi/anti joins, scoring is column arithmetic, and top-k plans as
  * `TakeOrderedAndProject` — no driver-side materialization of candidates
  * (the reference sorts the full result list in the driver,
  * `QueryProcessor.java:131-139`; we do not copy that).
  *
  * Determinism contract (SURVEY.md §7.4 #1): order by rounded score desc,
  * doc_id asc.
  */
final class SearchEngine(val t: IndexTables, val analyzer: String = "simple") {
  import Stats.{K1, B}

  private def toks(s: String): Seq[String] =
    Analyzer.queryTokens(analyzer, s).distinct

  /** tf rows restricted to the given terms (tiny literal IN-list → pushed). */
  private def tfFor(terms: Seq[String]): DataFrame =
    t.tf.filter(col("term").isin(terms: _*))

  /** E4: disjunctive candidates — docs containing ANY query term. */
  def candidatesAny(terms: Seq[String]): DataFrame =
    tfFor(terms).select("doc_id").distinct()

  /** E5: conjunctive candidates — docs containing ALL query terms
    * (`dbManager.java:250-256`), as the standard count-distinct reduction. */
  def candidatesAll(terms: Seq[String]): DataFrame =
    if (terms.isEmpty) t.files.select("doc_id").limit(0)
    else tfFor(terms).groupBy("doc_id")
      .agg(countDistinct(col("term")).as("nt"))
      .filter(col("nt") === terms.length).select("doc_id")

  /** P4: phrase filter — conjunctive candidates narrowed by case-insensitive
    * raw-substring containment of the phrase in content. */
  def phraseCandidates(phrase: String): DataFrame = {
    graft.functions.GraftFunctions.register(t.files.sparkSession)
    val cand = candidatesAll(toks(phrase))
    t.files.join(cand, Seq("doc_id"), "left_semi")
      .filter(contains(graft.functions.GraftFunctions.asciiLower(col("content")),
        lit(graft.functions.AsciiLower.lowerString(phrase))))
      .select("doc_id")
  }

  /** Score `candidates` (or all matching docs if None) against `terms`,
    * returning top-k (doc_id, score) with the deterministic tiebreak.
    *
    * ORACLE BASELINE, not the serving path: this joins the full `docstats`
    * table on doc_id — a corpus-sized shuffle at scale. Serve from
    * [[CompressedSearchEngine]], whose postings carry `len` inline (no
    * docstats join); this class exists as the simplest provably-correct
    * mirror of the DuckDB oracle. */
  def scoreTopK(terms: Seq[String], candidates: Option[DataFrame], k: Int): DataFrame = {
    if (terms.isEmpty) return t.files.sparkSession.emptyDataFrame
      .withColumn("doc_id", lit(0L)).withColumn("score", lit(0.0)).limit(0)
    val ts = broadcast(t.termstats.filter(col("term").isin(terms: _*)))
    val base0 = tfFor(terms)
    val base = candidates.fold(base0)(c => base0.join(c, Seq("doc_id"), "left_semi"))
    base
      .join(ts, Seq("term"))
      .join(t.docstats, Seq("doc_id"))
      .withColumn("w", BM25.weight(t.avgdl, t.nDocs))
      .groupBy("doc_id")
      .agg(round(sum(col("w")), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Full query lifecycle (SURVEY.md §3.1) — parse, candidates, score, top-k. */
  def search(raw: String, k: Int = 10): DataFrame = QueryParser.parse(raw) match {
    case Tokens(text) =>
      // E4 disjunctive candidates are exactly the docs that score > 0.
      scoreTopK(toks(text), None, k)

    case Phrase(p) =>
      scoreTopK(toks(p), Some(phraseCandidates(p)), k)

    case Bool(op, p1, p2) =>
      val c1 = phraseCandidates(p1)
      val c2 = phraseCandidates(p2)
      // E1/E2/E3 over the phrase-filtered sets (PhraseBasedRanker.java:93-105).
      // The sets are already distinct doc_id projections (files is unique per
      // doc_id) and the result feeds only a left_semi join in scoreTopK, so
      // plain semi/anti joins + a bare union replace intersect/except/
      // union.distinct — each of which planned an extra distinct aggregate
      // on BOTH candidate sets (the r2 bool_not 2.5× regression).
      val cand = op match {
        case "and" => c1.join(c2, Seq("doc_id"), "left_semi")
        case "or"  => c1.union(c2)
        case "not" => c1.join(c2, Seq("doc_id"), "left_anti")
      }
      // Scoring terms: union of both phrases' tokens for AND/OR; NOT scores
      // only the included phrase's tokens (design decision, SURVEY.md §7.4).
      val terms = if (op == "not") toks(p1) else (toks(p1) ++ toks(p2)).distinct
      scoreTopK(terms, Some(cand), k)
  }

  /** O2: paginated results — reference semantics
    * (`QueryProcessor/QueryProcessor.java:131-139`): 1-based `page`,
    * fromIndex = (page-1)·limit, a page past the end of the result list is
    * empty. Plans as a single TakeOrderedAndProject of page·limit rows with
    * the offset applied in the same limit node — no global sort, and the
    * driver never holds more than the requested page's prefix. */
  def searchPage(raw: String, page: Int, limit: Int): DataFrame = {
    require(page >= 1 && limit >= 1, s"page/limit must be >= 1: $page/$limit")
    search(raw, page * limit).offset((page - 1) * limit)
  }

  /** Search result hydrated with display columns (J2/J3: join AFTER top-k so
    * the heavy content columns are only read for the result page). */
  def searchDisplay(raw: String, k: Int = 10): DataFrame =
    search(raw, k).join(t.files.select("doc_id", "repo", "path", "lang"),
      Seq("doc_id")).orderBy(col("score").desc, col("doc_id").asc)
}
