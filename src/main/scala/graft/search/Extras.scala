package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Query-serving parity features from the reference beyond core retrieval:
  * suggestions, snippets, phrase-occurrence counts (SURVEY.md §2.6 O3,
  * §2.10 F12/F13, §3.3).
  */
object Extras {

  /** Pseudo query log: (query, cnt). The reference accumulates real user
    * queries with an upsert counter (`dbManager.java:513-531`, A11); offline
    * we derive a deterministic stand-in from term document frequencies. */
  def queryLog(termstats: DataFrame): DataFrame =
    termstats.select(col("term").as("query"), col("df").as("cnt"))

  /** O3/P5: prefix suggestions — top-k by count desc, query asc
    * (`dbManager.java:533-552`: prefix regex + popularity sort, limit 10). */
  def suggest(log: DataFrame, prefix: String, k: Int = 10): DataFrame =
    log.filter(col("query").startsWith(prefix.toLowerCase))
      .orderBy(col("cnt").desc, col("query").asc)
      .limit(k)

  /** F13 (simplified, deterministic): snippet = `width` chars starting at
    * the first occurrence of `term` in the lowered content (fallback: start
    * of document — mirroring SnippetGenerator.java:15-30's first-words
    * fallback). Joined AFTER top-k so content is read for the result page
    * only (J3). */
  def withSnippets(topk: DataFrame, files: DataFrame, term: String,
                   width: Int = 150): DataFrame = {
    GraftFunctions.register(files.sparkSession)
    topk.join(files.select(col("doc_id"), col("content")), Seq("doc_id"))
      .select(col("doc_id"), col("score"),
        substring_pos_snippet(term, width).as("snippet"))
      .orderBy(col("score").desc, col("doc_id").asc)
  }

  private def sqlLit(s: String) = "'" + s.replace("'", "''") + "'"

  private def substring_pos_snippet(term: String, width: Int) =
    expr(s"substring(content, greatest(instr(graft_ascii_lower(content), ${sqlLit(term)}), 1), $width)")

  /** F12: occurrences of a phrase in the content (raw substring count, the
    * reference's `PhraseBasedRanker.java:107-121` semantics on the single
    * content field), over the phrase candidate set. */
  def phraseCounts(cands: DataFrame, files: DataFrame, phrase: String): DataFrame = {
    GraftFunctions.register(files.sparkSession)
    val p = phrase.toLowerCase
    files.join(cands, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        ((length(col("content")) -
          length(expr(s"replace(graft_ascii_lower(content), ${sqlLit(p)}, '')"))) /
          p.length).cast("long").as("n_occ"))
      .orderBy("doc_id")
  }
}
