package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analyze.Analyzer

/** Corpus statistics stage (SURVEY.md §2.4 A1/A3/A4, §7.1 step 3):
  * `tf(doc_id, term, tf)`, `docstats(doc_id, len)`, `termstats(term, df)`,
  * plus the scalars `n_docs` / `avgdl` needed by BM25.
  *
  * Everything here is pure declarative DataFrame code: tokenize + explode is
  * a narrow stage fused by WholeStageCodegen; the groupBys are hash
  * aggregations with map-side partial aggregation (the scale-correct shape of
  * the reference's per-document counting loop, `Indexer/TextIndexer.java:32-95`).
  */
object Stats {
  val K1 = 1.2
  val B = 0.75

  /** Tokenized (doc_id, term) rows. `analyzer` ∈ {"simple", "code"}.
    * The simple analyzer stays in built-in functions (codegen'd, and
    * DuckDB-mirrorable); the code analyzer is a Scala UDF over the same
    * explode shape. */
  def tokens(files: DataFrame, analyzer: String = "simple"): DataFrame =
    analyzer match {
      case "simple" =>
        graft.functions.GraftFunctions.register(files.sparkSession)
        files.select(col("doc_id"),
          explode(graft.functions.GraftFunctions.asciiTokens(col("content")))
            .as("term"))
      case "code" =>
        // per-lang dispatch: the document's lang column selects the
        // reserved-word stop set inside the tokenizer
        val tokUdf = udf((c: String, l: String) => Analyzer.codeTokens(c, l))
        val withLang =
          if (files.columns.contains("lang")) files
          else files.withColumn("lang", lit(""))
        withLang.select(col("doc_id"),
          explode(tokUdf(col("content"), col("lang"))).as("term"))
      case other => throw new IllegalArgumentException(s"analyzer: $other")
    }

  /** Positional token stream (doc_id, term, pos, len) — pos is the 0-based
    * token index in the document's analyzer output, len the document's token
    * count. This is the index-build input: ONE tokenize pass produces
    * everything the build needs (len rides in the row — `size(toks)` from
    * the same materialized array — so there is no docstats join and no
    * second tokenize), the builder folds tf out of the sorted stream itself
    * (no (doc,term) groupBy), and positions feed the phrase adjacency
    * pre-filter. The intermediate select materializes `toks` once per row so
    * the generator and `size` share it. */
  def tokensPos(files: DataFrame, analyzer: String = "simple"): DataFrame = {
    val toksCol: DataFrame => DataFrame = analyzer match {
      case "simple" =>
        graft.functions.GraftFunctions.register(files.sparkSession)
        f => f.select(col("doc_id"),
          graft.functions.GraftFunctions.asciiTokens(col("content")).as("toks"))
      case "code" =>
        val tokUdf = udf((c: String, l: String) => Analyzer.codeTokens(c, l))
        f => {
          val withLang =
            if (f.columns.contains("lang")) f
            else f.withColumn("lang", lit(""))
          withLang.select(col("doc_id"),
            tokUdf(col("content"), col("lang")).as("toks"))
        }
      case other => throw new IllegalArgumentException(s"analyzer: $other")
    }
    // posexplode_outer + post-filter instead of posexplode: the non-outer
    // generator implies an array-non-empty predicate that the optimizer
    // pushes below the projection, re-evaluating the tokenizer at the scan
    // (a full second tokenize per row). The outer variant emits one null row
    // for token-less docs, filtered on the generator OUTPUT — tokenize runs
    // exactly once per row (asserted by PlanAuditSpec).
    toksCol(files)
      .select(col("doc_id"), size(col("toks")).as("len"),
        posexplode_outer(col("toks")))
      .filter(col("col").isNotNull)
      .select(col("doc_id"), col("col").as("term"), col("pos"), col("len"))
  }

  /** Compacted posting stream `(doc_id, idx, term, tf, len, pos)` — the
    * index-build input: ONE fused tokenize+compact expression eval per
    * document (graft.functions.CompactTokens) emits one entry per DISTINCT
    * term with tf, doc length, and the wire-encoded position record. No
    * per-token rows, no pre-shuffle sort, no docstats join. `idx` is the
    * entry's index within its document (idx == 0 exactly once per tokenized
    * doc → the docs_tok observation). Same posexplode_outer + isNotNull
    * shape as [[tokensPos]] so the optimizer cannot push an implied
    * non-empty filter below the projection and re-run the tokenizer. */
  def postings(files: DataFrame, analyzer: String = "simple"): DataFrame = {
    val entries: DataFrame = analyzer match {
      case "simple" =>
        graft.functions.GraftFunctions.register(files.sparkSession)
        files.select(col("doc_id"),
          graft.functions.GraftFunctions.compactTokens(col("content")).as("entries"))
      case "code" =>
        val compUdf = udf((c: String, l: String) =>
          graft.functions.CompactTokens.fromTokens(Analyzer.codeTokens(c, l)))
        val withLang =
          if (files.columns.contains("lang")) files
          else files.withColumn("lang", lit(""))
        withLang.select(col("doc_id"),
          compUdf(col("content"), col("lang")).as("entries"))
      case other => throw new IllegalArgumentException(s"analyzer: $other")
    }
    entries
      .select(col("doc_id"), posexplode_outer(col("entries")))
      .filter(col("col").isNotNull)
      .select(col("doc_id"), col("pos").as("idx"), col("col.term").as("term"),
        col("col.tf").as("tf"), col("col.len").as("len"),
        col("col.pos").as("pos"))
  }

  /** tf(doc_id, term, tf) — A1. */
  def tf(files: DataFrame, analyzer: String = "simple"): DataFrame =
    tokens(files, analyzer).groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))

  /** docstats straight from the token stream (no tf intermediate) — the
    * build-path variant: a narrow (doc_id) count with map-side partial
    * aggregation, so its exchange is tiny. */
  def docstatsFromTokens(tokens: DataFrame): DataFrame =
    tokens.groupBy("doc_id").agg(count(lit(1)).as("len"))

  /** docstats(doc_id, len) — document length in tokens (BM25 length norm). */
  def docstats(tf: DataFrame): DataFrame =
    tf.groupBy("doc_id").agg(sum("tf").as("len"))

  /** termstats(term, df) — global document frequency (SURVEY.md §7.4 #2:
    * global df at index time, not the reference's candidate-filtered df). */
  def termstats(tf: DataFrame): DataFrame =
    tf.groupBy("term").agg(count(lit(1)).as("df"))

  /** (n_docs, avgdl). n_docs counts all corpus files (reference
    * `dbManager.java:319-322` counts the whole collection); avgdl averages
    * over docs that produced tokens. */
  def scalars(files: DataFrame, docstats: DataFrame): (Long, Double) = {
    val n = files.count()
    val avgdl = docstats.agg(avg(col("len"))).head.getDouble(0)
    (n, avgdl)
  }
}

/** All derived tables for one corpus, built once and reused by the query
  * entries. Small-scale convenience wrapper; the scale path persists these
  * as bucketed tables (see graft.index.IndexBuilder). */
final case class IndexTables(
    files: DataFrame,
    tf: DataFrame,
    docstats: DataFrame,
    termstats: DataFrame,
    nDocs: Long,
    avgdl: Double)

object IndexTables {
  def build(files: DataFrame, analyzer: String = "simple"): IndexTables = {
    val tf = Stats.tf(files, analyzer)
    val ds = Stats.docstats(tf)
    val ts = Stats.termstats(tf)
    val (n, avgdl) = Stats.scalars(files, ds)
    IndexTables(files, tf, ds, ts, n, avgdl)
  }
}
