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

  final case class SessionEvent(user_id: Long, ts_ms: Long, value: Double)
  final case class Session(user_id: Long, session_id: Long,
                           session_start_ms: Long, n_events: Long,
                           sum_value: Double)

  /** File-source streaming dir for the events table (the source requires a
    * directory: stage a symlink). */
  private def streamDir(spark: SparkSession, sfDir: String): (String, org.apache.spark.sql.types.StructType) = {
    val path = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val dir = java.nio.file.Paths.get(
      s"/tmp/graft_stream_src_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}")
    java.nio.file.Files.createDirectories(dir)
    val link = dir.resolve("events.parquet")
    if (!java.nio.file.Files.exists(link))
      java.nio.file.Files.createSymbolicLink(link, java.nio.file.Paths.get(path))
    (dir.toString, schema)
  }

  /** Tumbling 5-minute windowed counts/sums over the events stream. */
  def windowedEventCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val (dirStr, schema) = streamDir(spark, sfDir)
    val dir = java.nio.file.Paths.get(dirStr)
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

  /** Gap-based sessionization per user via `flatMapGroupsWithState` — the
    * custom-state streaming surface (`KeyValueGroupedDataset`). A session
    * closes after `gapMinutes` of user inactivity; emits
    * (user_id, session_id, session_start_ms, n_events, sum_value).
    *
    * Driven deterministically with `Trigger.AvailableNow` over one snapshot
    * = one micro-batch, so every session closes in-batch and the output
    * equals the batch window-function oracle (lag/cumulative-sum). The
    * `GroupState[Long]` carries the per-user session counter — the hook a
    * multi-batch deployment extends with (lastTs, openSession) +
    * `GroupStateTimeout.EventTimeTimeout` for sessions that straddle
    * micro-batches. Millisecond precision on both sides (oracle compares
    * `epoch_ms` diffs) so the gap test is bit-identical.
    */
  def sessionize(spark: SparkSession, sfDir: String,
                 gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val (dirStr, schema) = streamDir(spark, sfDir)
    val gapMs = gapMinutes * 60000L
    val name = s"graft_sessions_${counter.incrementAndGet()}"

    def fn(user: Long, events: Iterator[SessionEvent],
           state: GroupState[Long]): Iterator[Session] = {
      val sorted = events.toArray.sortBy(_.ts_ms)
      if (sorted.isEmpty) return Iterator.empty
      val base = state.getOption.getOrElse(0L)
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      var start = sorted(0).ts_ms
      var prev = start
      var n = 0L
      var sum = 0.0
      def close(sid: Long): Unit = out += Session(user, sid, start,
        n, BigDecimal(sum).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      for (e <- sorted) {
        if (e.ts_ms - prev > gapMs) {
          close(base + out.length); start = e.ts_ms; n = 0L; sum = 0.0
        }
        n += 1; sum += e.value; prev = e.ts_ms
      }
      close(base + out.length)
      state.update(base + out.length)
      out.iterator
    }

    val q = spark.readStream.schema(schema).parquet(dirStr)
      .select(col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000").as("ts_ms"),
        col("value"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).orderBy("user_id", "session_id")
  }

  /** Stage `df` as ONE parquet file at `destDir/arrival<seq>.parquet` — the
    * file-source arrival unit — with a fixed, seq-ordered mtime so the
    * stream's file listing order is deterministic (name order and mtime
    * order agree). */
  def stageArrival(df: DataFrame, destDir: String, seq: Int): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(destDir))
    val tmp = s"$destDir/_tmp$seq"
    df.coalesce(1).write.parquet(tmp)
    val listing = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
    val part =
      try listing.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no part file in $tmp"))
      finally listing.close()
    val dest = java.nio.file.Paths.get(destDir, f"arrival$seq%03d.parquet")
    java.nio.file.Files.move(part, dest)
    java.nio.file.Files.setLastModifiedTime(dest,
      java.nio.file.attribute.FileTime.fromMillis(
        1000000000000L + seq * 60000L))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  /** Streaming incremental index ingest — the reference's continuous
    * crawl→index loop (SURVEY §2.8) run Spark-natively: a file-source
    * readStream over the crawler's output directory feeds `foreachBatch`;
    * each micro-batch is appended to the docs store and indexed by an
    * incremental [[graft.checkpoint.CheckpointedBuild]] append run scoped
    * to the batch's doc_id range (`changedIds` over the pinned `idDomain`),
    * so per-batch cost scales with the BATCH, not the corpus — untouched
    * buckets re-validate from manifests, only intersected buckets rebuild
    * (from the full store, so the final index is arrival-order-independent:
    * a bucket is rebuilt whole whenever any batch touches it).
    *
    * `Trigger.AvailableNow` + `maxFilesPerTrigger=1` drain the staged
    * backlog as deterministic micro-batches for the oracle and specs; a
    * production deployment runs the IDENTICAL query on a processing-time
    * trigger. Replay safety: foreachBatch is at-least-once, so the store
    * write is a batchId-keyed OVERWRITE (a batch replayed after a crash
    * between store write and sink commit converges instead of appending
    * duplicate rows) and the index append itself is idempotent (rebuilding
    * a bucket from the store converges to the same artifacts).
    *
    * Returns the number of non-empty micro-batches processed. */
  def indexIngest(spark: SparkSession, srcDir: String, storeDir: String,
                  indexDir: String, idDomain: (Long, Long),
                  nBuckets: Int = 4): Int = {
    import scala.jdk.CollectionConverters._
    val schema = spark.read.parquet(srcDir).schema
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val fn: (DataFrame, Long) => Unit = (batch, batchId) => {
      val bounds = batch.agg(min("doc_id"), max("doc_id")).head()
      if (!bounds.isNullAt(0)) {
        batches.incrementAndGet()
        // batchId-keyed OVERWRITE, not a flat append: foreachBatch replays
        // a batch at-least-once after a crash between the store write and
        // the sink commit — a replayed batch must land on the same path and
        // converge, never append duplicate rows (doubled tf/df would pass
        // re-validation silently: the duplicated store becomes "the truth")
        batch.write.mode("overwrite").parquet(s"$storeDir/b$batchId")
        val parts = {
          val l = java.nio.file.Files.list(java.nio.file.Paths.get(storeDir))
          try l.iterator().asScala.filter(p =>
              java.nio.file.Files.isDirectory(p) &&
              p.getFileName.toString.startsWith("b")).map(_.toString).toSeq
          finally l.close()
        }
        graft.checkpoint.CheckpointedBuild.run(
          spark.read.parquet(parts: _*), indexDir, nBuckets = nBuckets,
          idDomain = Some(idDomain),
          changedIds = Some((bounds.getLong(0), bounds.getLong(1))))
        ()
      }
    }
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .foreachBatch(fn)
      .option("checkpointLocation", s"$indexDir/_stream_ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    batches.get()
  }
}
