package graft

import graft.corpus.Corpus
import graft.index.IndexTables
import graft.search.{Extras, SearchEngine}
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._

class ExtrasSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private lazy val t = IndexTables.build(Corpus.files(spark, dir))

  test("streaming windowed counts == batch aggregation") {
    val streamed = StreamingOps.windowedEventCounts(spark, dir).collect().toSeq
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start", "event_type").collect().toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming sessionization == batch window-function sessionization") {
    val streamed = StreamingOps.sessionize(spark, dir).collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_ms")
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000").as("ts_ms"),
        col("value"))
      .withColumn("brk",
        when(col("ts_ms") - lag("ts_ms", 1).over(w) > 1800000L, 1L).otherwise(0L))
      .withColumn("session_id",
        sum("brk").over(w.rowsBetween(Long.MinValue, 0)))
      .groupBy("user_id", "session_id")
      .agg(min("ts_ms").as("session_start_ms"), count(lit(1)).as("n_events"),
        round(sum("value"), 4).as("sum_value"))
      .orderBy("user_id", "session_id").collect().toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // at least one user has multiple sessions, so gaps actually split
    assert(streamed.exists(_.getLong(1) > 0))
  }

  test("suggestions: prefix filter, count-desc order, limit") {
    val got = Extras.suggest(Extras.queryLog(t.termstats), "s", 3).collect()
    assert(got.length === 3)
    assert(got.forall(_.getString(0).startsWith("s")))
    assert(got.map(_.getLong(1)).toSeq === got.map(_.getLong(1)).toSeq.sorted.reverse)
  }

  test("snippets start at the first query-term occurrence") {
    val e = new SearchEngine(t)
    val snips = Extras.withSnippets(e.search("merge sort window"), t.files, "merge")
      .collect()
    assert(snips.nonEmpty)
    assert(snips.forall { r =>
      val s = r.getString(2)
      s.toLowerCase.startsWith("merge") || !r.getString(2).toLowerCase.contains("merge")
    })
  }

  test("phrase counts match manual substring counting") {
    val e = new SearchEngine(t)
    val got = Extras.phraseCounts(e.phraseCandidates("hash join"), t.files, "hash join")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.nonEmpty)
    val contents = t.files.select("doc_id", "content").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    for ((id, n) <- got) {
      val c = contents(id).toLowerCase
      val manual = "hash join".r.findAllMatchIn(c).length
      assert(n === manual, s"doc $id")
      assert(n >= 1)
    }
  }
}
