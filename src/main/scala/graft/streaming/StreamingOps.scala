package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming operators.
  *
  * The reference engine has no streaming framework (SURVEY.md §2.8) — its
  * incremental loop is a batch pattern mapped to the checkpointed bucket
  * build. This module adds the Spark-native streaming surface a production
  * ingest pipeline would use: file-source readStream → event-time watermark
  * → tumbling-window aggregation → sink, run to completion with
  * Trigger.AvailableNow so a batch of files drives the streaming query
  * deterministically (result == the equivalent batch aggregation, asserted
  * by the DuckDB oracle and by spec).
  */
object StreamingOps {

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Tumbling 5-minute windowed counts/sums over the events stream. */
  def windowedEventCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // the file stream source requires a directory: stage a symlink
    val dir = java.nio.file.Paths.get(
      s"/tmp/graft_stream_src_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}")
    java.nio.file.Files.createDirectories(dir)
    val link = dir.resolve("events.parquet")
    if (!java.nio.file.Files.exists(link))
      java.nio.file.Files.createSymbolicLink(link, java.nio.file.Paths.get(path))
    val name = s"graft_stream_${counter.incrementAndGet()}"
    val q = spark.readStream
      .schema(schema)
      .parquet(dir.toString)
      // parquet timestamps arrive as TIMESTAMP_NTZ; event-time watermarks
      // need TIMESTAMP (session tz = UTC, so the instant is unchanged)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).select(
      unix_timestamp(col("window.start")).as("win_start"),
      col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start", "event_type")
  }
}
