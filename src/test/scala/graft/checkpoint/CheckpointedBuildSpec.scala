package graft.checkpoint

import graft.SparkSpec
import graft.corpus.Corpus
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CheckpointedBuildSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-ckpt-$tag").toString

  private lazy val files = Corpus.files(spark, "/root/testdata/sf0.001").cache()

  test("fresh build publishes manifests, metrics and a queryable index") {
    val out = tmpDir("fresh")
    val stats = CheckpointedBuild.run(files, out, nBuckets = 4)
    assert(stats.nDocs === files.count())
    val ms = CheckpointedBuild.readManifests(out)
    assert(ms.length === 4)
    assert(ms.forall(_.status === "complete"))
    assert(ms.map(_.rows).sum === stats.nDocs)
    assert(ms.forall(m => m.sha_ok === m.rows)) // sha256 invariant per row
    assert(ms.map(_.postings).sum ===
      graft.index.Stats.tf(files).count())
    val eng = CheckpointedBuild.load(spark, out)
    val hits = eng.searchTopK(Seq("merge", "sort"), 10).collect()
    assert(hits.nonEmpty)
  }

  test("resume after mid-build failure == fresh build") {
    val freshDir = tmpDir("a")
    val resumeDir = tmpDir("b")
    CheckpointedBuild.run(files, freshDir, nBuckets = 4)
    // interrupted run: dies after 2 buckets
    intercept[CheckpointedBuild.InjectedFailure] {
      CheckpointedBuild.run(files, resumeDir, nBuckets = 4, failAfterBuckets = 2)
    }
    assert(CheckpointedBuild.readManifests(resumeDir).count(_.status == "complete") === 2)
    // resumed run completes only the remaining buckets
    CheckpointedBuild.run(files, resumeDir, nBuckets = 4)
    val a = CheckpointedBuild.load(spark, freshDir)
    val b = CheckpointedBuild.load(spark, resumeDir)
    val da = a.decoded(None).orderBy("term", "doc_id").collect().toSeq
    val db = b.decoded(None).orderBy("term", "doc_id").collect().toSeq
    assert(da === db)
    assert(a.nDocs === b.nDocs)
    assert(math.abs(a.avgdl - b.avgdl) < 1e-12)
    // manifests of untouched buckets carry identical lineage
    val ma = CheckpointedBuild.readManifests(freshDir)
    val mb = CheckpointedBuild.readManifests(resumeDir)
    assert(ma.map(m => (m.partition_id, m.snapshot_id, m.rows, m.postings)) ===
      mb.map(m => (m.partition_id, m.snapshot_id, m.rows, m.postings)))
  }

  test("resume == fresh at every possible failure point") {
    val freshDir = tmpDir("allfresh")
    CheckpointedBuild.run(files, freshDir, nBuckets = 3)
    val want = CheckpointedBuild.load(spark, freshDir)
      .decoded(None).orderBy("term", "doc_id").collect().toSeq
    for (failAt <- 0 to 2) {
      val dir = tmpDir(s"fail$failAt")
      intercept[CheckpointedBuild.InjectedFailure] {
        CheckpointedBuild.run(files, dir, nBuckets = 3, failAfterBuckets = failAt)
      }
      CheckpointedBuild.run(files, dir, nBuckets = 3)
      val got = CheckpointedBuild.load(spark, dir)
        .decoded(None).orderBy("term", "doc_id").collect().toSeq
      assert(got === want, s"failure point $failAt")
    }
  }

  test("concurrent bucket jobs == sequential build") {
    val seqDir = tmpDir("seq")
    val concDir = tmpDir("conc")
    CheckpointedBuild.run(files, seqDir, nBuckets = 4, bucketConc = 1)
    CheckpointedBuild.run(files, concDir, nBuckets = 4, bucketConc = 4)
    val a = CheckpointedBuild.load(spark, seqDir)
    val b = CheckpointedBuild.load(spark, concDir)
    assert(a.decoded(None).orderBy("term", "doc_id").collect().toSeq ===
      b.decoded(None).orderBy("term", "doc_id").collect().toSeq)
    val ma = CheckpointedBuild.readManifests(seqDir)
    val mb = CheckpointedBuild.readManifests(concDir)
    assert(ma.map(m => (m.partition_id, m.snapshot_id, m.rows, m.postings)) ===
      mb.map(m => (m.partition_id, m.snapshot_id, m.rows, m.postings)))
  }

  test("resume invalidates buckets whose input slice changed (snapshot check)") {
    val dir = tmpDir("stale")
    CheckpointedBuild.run(files, dir, nBuckets = 4)
    val msBefore = CheckpointedBuild.readManifests(dir)
    // the corpus changes under the checkpoint dir: one doc's content edited
    val editedId = files.agg(min("doc_id")).head().getLong(0)
    val filesB = files
      .withColumn("content",
        when(col("doc_id") === editedId,
          concat(col("content"), lit(" zzstalechange"))).otherwise(col("content")))
      .withColumn("sha", sha2(col("content"), 256))
    // resuming into the same dir must rebuild the touched bucket, not skip it
    CheckpointedBuild.run(filesB, dir, nBuckets = 4)
    val freshB = tmpDir("staleFresh")
    CheckpointedBuild.run(filesB, freshB, nBuckets = 4)
    val got = CheckpointedBuild.load(spark, dir)
      .decoded(None).orderBy("term", "doc_id").collect().toSeq
    val want = CheckpointedBuild.load(spark, freshB)
      .decoded(None).orderBy("term", "doc_id").collect().toSeq
    assert(got === want)
    // the edited doc's bucket carries a new snapshot id; others unchanged
    val msAfter = CheckpointedBuild.readManifests(dir)
    val changed = msBefore.zip(msAfter).filter { case (a, b) =>
      a.snapshot_id != b.snapshot_id }
    assert(changed.length === 1)
  }

  test("incremental append rebuilds only the appended range's buckets") {
    val dir = tmpDir("incr")
    val b = files.agg(min("doc_id"), max("doc_id")).head()
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val width = math.max(1L, (hi - lo + 4) / 4)
    val cut = lo + 3 * width
    val domain = Some((lo, hi))
    // initial load: only the first three buckets' id range has rows
    CheckpointedBuild.run(files.filter(col("doc_id") < cut), dir,
      nBuckets = 4, idDomain = domain)
    val msBefore = CheckpointedBuild.readManifests(dir)
    assert(msBefore.length === 4)
    assert(msBefore.last.rows === 0L) // appended range still empty
    val manifestBytes = (0 until 3).map(i =>
      Files.readAllBytes(java.nio.file.Paths.get(s"$dir/manifest/bucket-$i.json")).toSeq)
    val segMtimes = (0 until 3).map(i =>
      Files.getLastModifiedTime(java.nio.file.Paths.get(s"$dir/segments/bucket=$i")))
    // append: same id domain, full corpus — only bucket 3's slice changed;
    // changedIds scopes the resume re-validation to that bucket's range
    CheckpointedBuild.run(files, dir, nBuckets = 4, idDomain = domain,
      changedIds = Some((cut, hi)))
    // the validation job scanned ONLY the appended range's rows — an append
    // into a 100 TB table must not pay a full-corpus doc_id+sha scan
    val appendedRows = files.filter(col("doc_id") >= cut).count()
    assert(CheckpointedBuild.lastValidationRows === appendedRows)
    assert(appendedRows < files.count())
    val msAfter = CheckpointedBuild.readManifests(dir)
    assert(msAfter.map(_.rows).sum === files.count())
    assert(msAfter.last.rows > 0L)
    // untouched buckets: manifests byte-identical, segment dirs untouched
    for (i <- 0 until 3) {
      assert(Files.readAllBytes(java.nio.file.Paths.get(
        s"$dir/manifest/bucket-$i.json")).toSeq === manifestBytes(i), s"bucket $i")
      assert(Files.getLastModifiedTime(java.nio.file.Paths.get(
        s"$dir/segments/bucket=$i")) === segMtimes(i), s"bucket $i segments")
    }
    // appended result == fresh full build
    val freshDir = tmpDir("incrFresh")
    CheckpointedBuild.run(files, freshDir, nBuckets = 4, idDomain = domain)
    assert(CheckpointedBuild.load(spark, dir)
      .decoded(None).orderBy("term", "doc_id").collect().toSeq ===
      CheckpointedBuild.load(spark, freshDir)
        .decoded(None).orderBy("term", "doc_id").collect().toSeq)
  }

  test("streaming ingest (foreachBatch appends) == fresh batch build") {
    val freshDir = tmpDir("streamfresh")
    CheckpointedBuild.run(files, freshDir, nBuckets = 4)
    val want = CheckpointedBuild.load(spark, freshDir)
      .decoded(None).orderBy("term", "doc_id").collect().toSeq

    val src = tmpDir("streamsrc")
    val store = s"${tmpDir("streamstore")}/docs"
    val out = tmpDir("streamidx")
    val b = files.agg(min("doc_id"), max("doc_id")).head()
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val cut = lo + math.max(1L, (hi - lo + 2) / 2)
    graft.streaming.StreamingOps.stageArrival(
      files.filter(col("doc_id") < cut), src, 0)
    graft.streaming.StreamingOps.stageArrival(
      files.filter(col("doc_id") >= cut), src, 1)
    val nBatches = graft.streaming.StreamingOps.indexIngest(
      spark, src, store, out, (lo, hi))
    assert(nBatches === 2) // maxFilesPerTrigger=1: one batch per arrival
    val got = CheckpointedBuild.load(spark, out)
      .decoded(None).orderBy("term", "doc_id").collect().toSeq
    assert(got === want)
    val eng = CheckpointedBuild.load(spark, out)
    assert(eng.nDocs === files.count())
  }

  test("resume with a smaller nBuckets cleans orphan buckets (no double merge)") {
    val dir = tmpDir("shrink")
    CheckpointedBuild.run(files, dir, nBuckets = 6)
    assert(CheckpointedBuild.readManifests(dir).length === 6)
    val stats = CheckpointedBuild.run(files, dir, nBuckets = 4)
    assert(stats.nDocs === files.count()) // no double count from orphans
    assert(CheckpointedBuild.readManifests(dir).length === 4)
    val freshDir = tmpDir("shrinkFresh")
    CheckpointedBuild.run(files, freshDir, nBuckets = 4)
    assert(CheckpointedBuild.load(spark, dir)
      .decoded(None).orderBy("term", "doc_id").collect().toSeq ===
      CheckpointedBuild.load(spark, freshDir)
        .decoded(None).orderBy("term", "doc_id").collect().toSeq)
  }

  test("checkpointed search equals direct in-memory build") {
    val out = tmpDir("eq")
    CheckpointedBuild.run(files, out, nBuckets = 3)
    val ck = CheckpointedBuild.load(spark, out)
    val t = graft.index.IndexTables.build(files)
    val direct = new graft.search.CompressedSearchEngine(
      graft.index.InvertedIndex.build(graft.index.Stats.postings(files),
        t.nDocs, t.avgdl),
      t.nDocs, t.avgdl)
    val got = ck.searchTopK(Seq("merge", "sort", "window"), 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = direct.searchTopK(Seq("merge", "sort", "window"), 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === want)
  }
}
