package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analyze.Analyzer

/** Real query-log sink + suggestions (SURVEY.md §2.1 S10, §2.4 A11, §2.6 O3).
  *
  * The reference accumulates user queries in a `queries` collection keyed by
  * the RAW query with an `$inc count` upsert and a `$set normalized`
  * (`dbManager/dbManager.java:513-531`); suggestions prefix-match the
  * NORMALIZED form, sort by count desc, and return the raw query
  * (`dbManager/dbManager.java:533-552`).
  *
  * Spark-native shape: an append-only `(query, normalized)` log table (the
  * idiomatic replacement for a per-row upsert counter — appends are
  * conflict-free across 1000 executors, and the counter is the groupBy-count
  * view [[counts]], computed at read time or compacted periodically). Empty
  * and normalize-to-empty queries are skipped exactly like the reference.
  */
object QueryLog {

  /** Query normalization for the log: the simple analyzer's token stream,
    * space-joined ("Spark  SQL!" → "spark sql"). */
  def normalize(raw: String): String =
    Analyzer.queryTokens("simple", raw).mkString(" ")

  /** S10: append one batch of raw user queries to the log at `path`
    * (through the table seam — an Iceberg fast-append at scale). Skips
    * null/blank raws and queries that normalize to empty
    * (`dbManager.java:514-519`). */
  def append(spark: SparkSession, path: String, queries: Seq[String],
             io: graft.sources.TableIO = graft.sources.ParquetTableIO): Unit = {
    import spark.implicits._
    val rows = queries.iterator
      .filter(q => q != null && q.trim.nonEmpty)
      .map(q => (q, normalize(q)))
      .filter(_._2.nonEmpty)
      .toSeq
    if (rows.nonEmpty)
      io.append(rows.toDF("query", "normalized").coalesce(1), path)
  }

  /** Load the append log back through the same table seam as [[append]] —
    * a non-parquet TableIO must round-trip (ADVICE r2). */
  def load(spark: SparkSession, path: String,
           io: graft.sources.TableIO = graft.sources.ParquetTableIO): DataFrame =
    io.read(spark, path)

  /** A11: the reference's `$inc count` upsert counter as a groupBy-count
    * view over the append log: (query, normalized, cnt). */
  def counts(log: DataFrame): DataFrame =
    log.groupBy("query", "normalized").agg(count(lit(1)).as("cnt"))

  /** O3/P5: prefix suggestions — prefix-match on the normalized form,
    * count desc, raw query returned; deterministic tiebreak query asc
    * (`dbManager.java:533-552`). */
  def suggest(log: DataFrame, prefix: String, k: Int = 10): DataFrame = {
    val p = graft.functions.AsciiLower.lowerString(prefix)
    counts(log)
      .filter(col("normalized").startsWith(p))
      .select(col("query"), col("cnt"))
      .orderBy(col("cnt").desc, col("query").asc)
      .limit(k)
  }

  /** Deterministic replay stream for the driver-checked `q_suggestions`
    * entry: three append batches (accumulation across appends is part of
    * what the oracle certifies). Mixed raw-vs-normalized casing exercises
    * the reference's raw-key/normalized-match split. */
  val ReplayBatches: Seq[Seq[String]] = Seq(
    Seq("Spark SQL", "sort merge", "shuffle service", "Merge Sort", "spark sql"),
    Seq("spark sql", "sort merge", "spark streaming", "Spark SQL", "window agg"),
    Seq("shuffle service", "spark sql", "sort merge", "scan", "   ", ""))

  /** Replay [[ReplayBatches]] into a fresh log at `path` (idempotent: the
    * previous log dir is dropped first) and return the loaded log. */
  def replay(spark: SparkSession, path: String): DataFrame = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    ReplayBatches.foreach(append(spark, path, _))
    load(spark, path)
  }
}
