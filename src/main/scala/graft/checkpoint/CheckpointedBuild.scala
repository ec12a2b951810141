package graft.checkpoint

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.{InvertedIndex, Stats}
import graft.search.CompressedSearchEngine

/** Resumable index build with per-partition lineage + metrics (north rule:
  * "resumable from Iceberg-snapshot checkpoints with per-partition lineage
  * and metrics (rows, postings, bytes, sha256 of content verified per row)").
  *
  * The input corpus is split into `nBuckets` doc_id-range buckets — the
  * offline stand-in for Iceberg snapshot deltas (SURVEY.md §7.4 #7; the
  * reference's only resumability mechanism is its crawler-state checkpoint,
  * `dbManager/dbManager.java:83-123`, saved every 5 min,
  * `Crawler/Crawler.java:152-154`). Each bucket job:
  *
  *   1. scans its slice, re-verifies the sha256 row invariant,
  *   2. writes salted posting segments + slice docstats to bucket dirs,
  *   3. records a manifest `(partition_id, snapshot_id, rows, postings,
  *      bytes, sha_ok, status)` — metrics collected via `Observation`
  *      (A12 in SURVEY.md), snapshot_id = order-independent content hash.
  *
  * A restart skips buckets whose manifest says `complete` (write-audit-
  * publish: the manifest is written only after the bucket's data is on
  * disk). The merge phase rebuilds the final chunked index from all segment
  * runs and publishes `scalars.json` last. Resumed == fresh is asserted by
  * property test.
  */
object CheckpointedBuild {

  final case class BucketManifest(partition_id: Int, snapshot_id: String,
                                  rows: Long, postings: Long, bytes: Long,
                                  sha_ok: Long, status: String,
                                  tokens: Long = 0L, docsTok: Long = 0L)

  final case class BuildStats(nDocs: Long, avgdl: Double, buckets: Int)

  /** Test hook: thrown when `failAfterBuckets` is reached. */
  final class InjectedFailure(msg: String) extends RuntimeException(msg)

  /** Diagnostic: rows scanned by the last run's resume re-validation job
    * (0 when it didn't run). Tests assert a `changedIds`-scoped append run
    * validates only the changed buckets' rows, not the whole corpus. */
  @volatile private[graft] var lastValidationRows: Long = 0L

  private def manifestPath(outDir: String, b: Int) =
    Paths.get(s"$outDir/manifest/bucket-$b.json")

  private def writeManifest(outDir: String, m: BucketManifest): Unit = {
    Files.createDirectories(Paths.get(s"$outDir/manifest"))
    val json =
      s"""{"partition_id": ${m.partition_id}, "snapshot_id": "${m.snapshot_id}",
         | "rows": ${m.rows}, "postings": ${m.postings}, "bytes": ${m.bytes},
         | "sha_ok": ${m.sha_ok}, "tokens": ${m.tokens}, "docs_tok": ${m.docsTok},
         | "status": "${m.status}"}""".stripMargin
    val tmp = Paths.get(s"$outDir/manifest/.bucket-${m.partition_id}.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, manifestPath(outDir, m.partition_id),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def readManifests(outDir: String): Seq[BucketManifest] = {
    val dir = Paths.get(s"$outDir/manifest")
    if (!Files.isDirectory(dir)) return Seq.empty
    import scala.jdk.CollectionConverters._
    Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json")).toSeq.sortBy(_.toString)
      .map { p =>
        val s = Files.readString(p)
        def l(k: String) = s"""\"$k\":\\s*(\\d+)""".r.findFirstMatchIn(s)
          .map(_.group(1).toLong).getOrElse(0L)
        def str(k: String) = s"""\"$k\":\\s*\"([^\"]*)\"""".r.findFirstMatchIn(s).get.group(1)
        BucketManifest(l("partition_id").toInt, str("snapshot_id"), l("rows"),
          l("postings"), l("bytes"), l("sha_ok"), str("status"),
          l("tokens"), l("docs_tok"))
      }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toSeq.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  private def isComplete(outDir: String, b: Int): Boolean = {
    val p = manifestPath(outDir, b)
    Files.exists(p) && Files.readString(p).contains("\"status\": \"complete\"")
  }

  /** Run (or resume) the bucketed build. Returns corpus stats.
    * `bucketConc` ≤ 0 → auto (env SPARK_GRAFT_BUCKET_CONC, else sequential
    * below 16 cores, +1 in-flight bucket per 16 cores). All table data goes
    * through `io` (the Iceberg seam — graft.sources.TableIO); manifests are
    * the build's own lineage artifacts and stay JSON. With `verifyResume`
    * (default), completed buckets are re-validated against the CURRENT
    * input before being skipped: one narrow job recomputes every bucket's
    * snapshot hash (count + bit_xor of xxhash64(doc_id, sha) — doc_id+sha
    * columns only, no content read) and any bucket whose manifest
    * snapshot_id no longer matches is invalidated and rebuilt, so resuming
    * into an outDir after the corpus changed can never mix stale segments
    * with fresh ones. */
  /** `idDomain`: the doc_id key space the buckets partition, `(min, max)`
    * inclusive. Defaults to the CURRENT input's min/max — correct for a
    * one-shot build, but bucket boundaries then move whenever the corpus
    * grows. For incremental append (S3 delta semantics) pass the table's
    * allocated id domain on every run: boundaries stay fixed, so appending
    * a doc_id range re-validates untouched buckets as identical (snapshot
    * hash match → skipped) and rebuilds only the buckets the new rows land
    * in — the offline analog of Iceberg snapshot-delta processing.
    *
    * `changedIds`: the doc_id range `(lo, hi)` inclusive that this run's
    * input may differ in from the manifests' recorded state — on Iceberg
    * this is snapshot-delta metadata (the appended/rewritten files' id
    * bounds), free to obtain. When set (requires a pinned `idDomain`), the
    * resume re-validation scans ONLY the buckets intersecting that range —
    * the doc_id range filter prunes parquet row groups / Iceberg files via
    * min/max stats, so an append run's validation cost scales with the
    * delta, not the table (a full-corpus doc_id+sha scan per append run is
    * a 100 TB-scale full-table scan). Out-of-range completed buckets get a
    * cheap integrity check (manifest complete + segment dir present)
    * instead. This is a CONTRACT: rows outside `changedIds` must be
    * byte-identical to the state the manifests recorded — exactly the
    * guarantee snapshot metadata gives. */
  def run(files: DataFrame, outDir: String, nBuckets: Int = 8,
          saltBuckets: Int = 32, analyzer: String = "simple",
          failAfterBuckets: Int = Int.MaxValue,
          bucketConc: Int = -1,
          io: graft.sources.TableIO = graft.sources.ParquetTableIO,
          verifyResume: Boolean = true,
          idDomain: Option[(Long, Long)] = None,
          changedIds: Option[(Long, Long)] = None): BuildStats = {
    require(changedIds.isEmpty || idDomain.isDefined,
      "changedIds requires a pinned idDomain (bucket boundaries must not move)")
    val spark = files.sparkSession
    Files.createDirectories(Paths.get(outDir))
    // Orphan cleanup (ADVICE r2): a previous build with a LARGER nBuckets may
    // have left manifests and segments/bucket=b dirs with b >= nBuckets. The
    // merge phase reads segments/* and manifest/* wholesale, so those orphans
    // would be double-merged (nDocs over-counts, postings duplicate). Remove
    // them before anything else; in-range buckets are covered by the snapshot
    // re-validation below (boundaries moved → snapshot mismatch → rebuild).
    readManifests(outDir).filter(_.partition_id >= nBuckets)
      .foreach(m => Files.deleteIfExists(manifestPath(outDir, m.partition_id)))
    val segRoot = Paths.get(s"$outDir/segments")
    if (Files.isDirectory(segRoot)) {
      import scala.jdk.CollectionConverters._
      Files.list(segRoot).iterator().asScala.toSeq.foreach { p =>
        val name = p.getFileName.toString
        val orphan = name.startsWith("bucket=") &&
          scala.util.Try(name.stripPrefix("bucket=").toInt).toOption.exists(_ >= nBuckets)
        if (orphan) deleteRecursively(p)
      }
    }
    val (minId, maxId) = idDomain.getOrElse {
      val bounds = files.agg(min("doc_id"), max("doc_id")).head()
      (bounds.getLong(0), bounds.getLong(1))
    }
    val width = math.max(1L, (maxId - minId + nBuckets) / nBuckets)

    // input containment: with an explicit idDomain, doc_ids outside
    // [minId, maxId] would fall into no bucket slice and silently vanish
    // from the index. With `changedIds` the check is pure arithmetic on the
    // delta bounds (ADVICE r4: a full min/max column scan per append run
    // partially defeats delta-scaled cost — rows OUTSIDE changedIds are
    // contract-bound byte-identical to the recorded state, which passed
    // containment when first built). Without delta metadata, one narrow
    // doc_id-only min/max agg (on Iceberg: column-stats metadata).
    idDomain.foreach { _ =>
      changedIds match {
        case Some((clo, chi)) =>
          require(clo >= minId && chi <= maxId,
            s"changedIds [$clo, $chi] exceed the pinned idDomain " +
              s"[$minId, $maxId] — rows outside it would be silently " +
              "dropped from the index")
        case None =>
          val bounds = files.agg(min("doc_id"), max("doc_id")).head()
          if (!bounds.isNullAt(0))
            require(bounds.getLong(0) >= minId && bounds.getLong(1) <= maxId,
              s"input doc_ids [${bounds.getLong(0)}, ${bounds.getLong(1)}] " +
                s"exceed the pinned idDomain [$minId, $maxId] — rows outside " +
                "it would be silently dropped from the index")
      }
    }

    // resume validation: invalidate manifests whose snapshot no longer
    // matches the current input slice (ADVICE round 1). With `changedIds`
    // the scan is scoped to the buckets intersecting the changed range
    // (delta-metadata contract above); other completed buckets only need
    // their on-disk artifacts present.
    val completedBefore = (0 until nBuckets).filter(isComplete(outDir, _))
    if (verifyResume && completedBefore.nonEmpty) {
      val ms = readManifests(outDir).map(m => m.partition_id -> m).toMap
      val scope: Option[(Int, Int)] = changedIds.map { case (clo, chi) =>
        (math.max(0, ((clo - minId) / width).toInt),
          math.min(nBuckets - 1, ((chi - minId) / width).toInt))
      }
      val inScope: Int => Boolean =
        scope.fold((_: Int) => true) { case (bLo, bHi) => b => b >= bLo && b <= bHi }
      val scoped = scope.fold(files) { case (bLo, bHi) =>
        files.filter(col("doc_id") >= minId + bLo * width &&
          col("doc_id") < minId + (bHi + 1L) * width)
      }
      val cur = scoped
        .groupBy(expr(s"CAST((doc_id - $minId) DIV $width AS INT)").as("b"))
        .agg(count(lit(1)).as("rows"),
          bit_xor(xxhash64(col("doc_id"), col("sha"))).as("snap"))
        .collect()
        .map(r => r.getInt(0) -> ((r.getLong(1),
          java.lang.Long.toHexString(r.getLong(2))))).toMap
      lastValidationRows = cur.values.map(_._1).sum
      val stale = completedBefore.filter(inScope).filter { b =>
        val m = ms(b)
        val (rows, snap) = cur.getOrElse(b, (0L, "empty"))
        val curSnap = if (rows == 0L) "empty" else snap
        m.rows != rows || m.snapshot_id != curSnap
      }
      // out-of-scope buckets: artifacts must still exist (manifest said
      // complete; a missing segment dir means someone deleted data)
      val broken = completedBefore.filterNot(inScope).filter { b =>
        ms(b).rows > 0 &&
          !Files.isDirectory(Paths.get(s"$outDir/segments/bucket=$b"))
      }
      (stale ++ broken).foreach { b =>
        Files.deleteIfExists(manifestPath(outDir, b))
      }
    } else lastValidationRows = 0L

    def buildBucket(b: Int): Unit = {
        val lo = minId + b * width
        val hi = lo + width // exclusive
        val slice = files.filter(col("doc_id") >= lo && col("doc_id") < hi)
        // per-row invariant verified inside the scan (BASELINE.json:15)
        val obs = Observation(s"bucket-$b")
        val observed = slice.observe(obs,
          count(lit(1)).as("rows"),
          sum(when(sha2(col("content"), 256) === col("sha"), 1L).otherwise(0L)).as("sha_ok"),
          bit_xor(xxhash64(col("doc_id"), col("sha"))).as("snap"))
        // ONE job per bucket, ONE fused tokenize+compact eval per document,
        // ONE wide exchange: the compact posting stream carries tf, len, and
        // wire-encoded positions in-row (no docstats join, no second
        // tokenize, no map-side sort) and feeds the salted segment shuffle
        // directly. Token/doc metrics are observed ON the same stream
        // (tokens = Σ tf; docs_tok counts the idx==0 entry each tokenized
        // doc has exactly once), so no extra action runs; avgdl comes from
        // these observed sums.
        val dsObs = Observation(s"ds-$b")
        val toksP = Stats.postings(observed, analyzer)
          .observe(dsObs,
            coalesce(sum(col("tf")).cast("long"), lit(0L)).as("tokens"),
            coalesce(sum(when(col("idx") === 0, 1L).otherwise(0L)), lit(0L))
              .as("docs_tok"))
        val segObs = Observation(s"seg-$b")
        val seg = InvertedIndex
          .segments(toksP, nDocs = math.max(1L, width), saltBuckets)
          .observe(segObs, count(lit(1)).as("groups"),
            sum(length(col("seg")) + length(col("pos"))).as("bytes"),
            sum(col("n")).as("postings"))
        io.overwrite(seg, s"$outDir/segments/bucket=$b")
        val m = obs.get
        val sm = segObs.get
        val dm = dsObs.get
        // an all-empty bucket slice (incremental append: the not-yet-loaded
        // id range) can be optimized to an empty LocalRelation, which drops
        // the CollectMetrics nodes entirely — empty metric maps mean 0 rows
        val rows = m.get("rows").map(_.asInstanceOf[Long]).getOrElse(0L)
        val shaOk = if (rows == 0) 0L else m("sha_ok").asInstanceOf[Long]
        require(shaOk == rows, s"sha256 invariant violated in bucket $b: $shaOk/$rows")
        val nTokens =
          if (rows == 0) 0L else dm("tokens").asInstanceOf[Long]
        val nPostings =
          if (rows == 0 || nTokens == 0) 0L else sm("postings").asInstanceOf[Long]
        val snap = if (rows == 0) "empty"
          else java.lang.Long.toHexString(m("snap").asInstanceOf[Long])
        writeManifest(outDir, BucketManifest(b, snap, rows, nPostings,
          if (rows == 0 || nTokens == 0) 0L else sm("bytes").asInstanceOf[Long],
          shaOk, "complete",
          tokens = nTokens,
          docsTok = if (nTokens == 0) 0L else dm("docs_tok").asInstanceOf[Long]))
    }

    val todo = (0 until nBuckets).filterNot(isComplete(outDir, _))
    if (failAfterBuckets != Int.MaxValue) {
      // deterministic sequential path for fault-injection tests
      var done = 0
      for (b <- todo) {
        if (done >= failAfterBuckets)
          throw new InjectedFailure(s"injected failure before bucket $b")
        buildBucket(b)
        done += 1
      }
    } else if (todo.nonEmpty) {
      // Buckets are independent jobs (own segment dir + manifest), so run a
      // few concurrently: Spark backfills idle task slots of one bucket's
      // reduce/tail stages with the next bucket's scan — without this, every
      // bucket boundary is a cluster-wide barrier (on a 1000-executor
      // cluster that idle tail is the dominant scaling loss).
      // Default: up to 4 in-flight buckets once there is more than one core
      // — measured (3.84M files, 4×1-executor local-cluster): sequential
      // 85.2 s at util 0.824 → conc=2 82.3 s / 0.894 → conc=4 79.2 s /
      // 0.908; local[4] at 1.92M: 39.1 s → 34.4 s / util 0.926. A single
      // core gains nothing (no idle slots to backfill: local[1] measured
      // 123.1 s sequential vs 126.4 s at conc=2, i.e. noise-level slower),
      // and stays sequential. The cap bounds transient memory (concurrent
      // bucket scans) no matter how wide the cluster; raise via
      // SPARK_GRAFT_BUCKET_CONC only with executor memory to match.
      val defConc =
        math.min(4, math.max(1, spark.sparkContext.defaultParallelism))
      val conc = math.max(1, math.min(todo.size,
        if (bucketConc > 0) bucketConc
        else sys.env.get("SPARK_GRAFT_BUCKET_CONC").map(_.toInt).getOrElse(defConc)))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(conc)
      try {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        Await.result(Future.sequence(todo.map(b => Future(buildBucket(b)))), Duration.Inf)
      } finally pool.shutdown()
    }

    // merge + publish (rerun unconditionally; cheap relative to bucket scans)
    val segAll = io.read(spark, s"$outDir/segments")
    val ms = readManifests(outDir)
    val nDocs = ms.map(_.rows).sum
    val docsTok = math.max(1L, ms.map(_.docsTok).sum)
    val avgdl = ms.map(_.tokens).sum.toDouble / docsTok
    val index = InvertedIndex.mergeSegments(
      segAll.select("term", "seg", "pos", "n"), avgdl)
    // Output partition count from the manifests' byte sums (segment bytes ≈
    // final payload bytes: the merge byte-concatenates the same streams) —
    // free metadata, so the write path needs no persist and no byte agg
    // (see InvertedIndex.write: the columnar-cache materialization of 4 MB
    // chunk payloads was pure GC pressure in the timed build).
    val idxBytes = ms.map(_.bytes).sum
    InvertedIndex.write(index, s"$outDir/index",
      nPartitions = InvertedIndex.writeParts(spark, idxBytes), io = io)
    Files.writeString(Paths.get(s"$outDir/scalars.json"),
      s"""{"n_docs": $nDocs, "avgdl": $avgdl, "buckets": $nBuckets, "status": "published"}""")
    BuildStats(nDocs, avgdl, nBuckets)
  }

  /** Load a published checkpointed index as a query engine. */
  def load(spark: SparkSession, outDir: String,
           io: graft.sources.TableIO = graft.sources.ParquetTableIO): CompressedSearchEngine = {
    val scalars = Files.readString(Paths.get(s"$outDir/scalars.json"))
    require(scalars.contains("\"status\": \"published\""), s"index at $outDir not published")
    val n = """"n_docs":\s*(\d+)""".r.findFirstMatchIn(scalars).get.group(1).toLong
    val avgdl = """"avgdl":\s*([0-9.Ee+-]+)""".r.findFirstMatchIn(scalars).get.group(1).toDouble
    new CompressedSearchEngine(InvertedIndex.load(spark, s"$outDir/index", io), n, avgdl)
  }
}
