package graft.index

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer
import PostingCodec.{BlockMeta, PosPosting}

/** One bounded chunk of a term's final posting list. Chunks split a term's
  * postings every [[InvertedIndex.ChunkSize]] entries so a single row (and a
  * single decode task) stays bounded even for ubiquitous code tokens at
  * 10^12-file scale — the document-partitioned layout ubiquitous in sharded
  * IR systems. `max_weight` is the chunk-level bound (max over its blocks).
  * `positions` is the parallel in-document token-position stream (phrase
  * adjacency pre-filter); it lives in its own parquet column so the BM25
  * scoring path never reads a byte of it (column pruning).
  */
final case class IndexChunk(chunk_id: Int, first_doc_id: Long,
                            last_doc_id: Long, n: Int, max_weight: Double,
                            blocks: Array[BlockMeta], postings: Array[Byte],
                            positions: Array[Byte])

final case class TermChunks(df: Long, chunks: Array[IndexChunk])

/** Stage-1 output row: one sorted encoded run per (term, salt) — postings
  * stream + positions stream + posting count (manifest metrics). */
final case class SegmentRow(term: String, salt: Long, seg: Array[Byte],
                            pos: Array[Byte], n: Long)

/** Stage 2: merge one term's segment runs (sorted, docId-range-disjoint by
  * construction → concatenation fast path) into block-max chunks. */
final class MergeAgg(avgdl: Double, k1: Double, b: Double, chunkSize: Int)
    extends Aggregator[(Array[Byte], Array[Byte]),
      ArrayBuffer[(Array[Byte], Array[Byte])], TermChunks] {
  def zero: ArrayBuffer[(Array[Byte], Array[Byte])] = ArrayBuffer.empty
  def reduce(buf: ArrayBuffer[(Array[Byte], Array[Byte])],
             seg: (Array[Byte], Array[Byte])): ArrayBuffer[(Array[Byte], Array[Byte])] = {
    buf += seg; buf
  }
  def merge(a: ArrayBuffer[(Array[Byte], Array[Byte])],
            b2: ArrayBuffer[(Array[Byte], Array[Byte])]): ArrayBuffer[(Array[Byte], Array[Byte])] = {
    a ++= b2; a
  }
  def finish(buf: ArrayBuffer[(Array[Byte], Array[Byte])]): TermChunks = {
    val merged = PostingCodec.mergeRunsPos(
      buf.map { case (s, p) => PostingCodec.decodeWithPos(s, p) }.toSeq)
    val chunks = merged.grouped(chunkSize).zipWithIndex.map { case (ps, i) =>
      val (bytes, blocks, posBytes) = PostingCodec.encodeWithPos(ps, avgdl, k1, b)
      IndexChunk(i, ps.head.doc_id, ps.last.doc_id, ps.length,
        blocks.map(_.max_weight).max, blocks, bytes, posBytes)
    }.toArray
    TermChunks(merged.length.toLong, chunks)
  }
  def bufferEncoder: Encoder[ArrayBuffer[(Array[Byte], Array[Byte])]] =
    Encoders.kryo[ArrayBuffer[(Array[Byte], Array[Byte])]]
  def outputEncoder: Encoder[TermChunks] = Encoders.product[TermChunks]
}

/** Builder for the compressed inverted index (SURVEY.md §7.1 step 4).
  *
  * Pipeline: fused tokenize+compact expression (one eval per document →
  * one row per posting, graft.functions.CompactTokens) → stage-1
  * repartition(term, salt) + in-partition sort + streaming encoder →
  * stage-2 merge groupBy(term) → explode chunks. Salt = doc_id range
  * bucket, so stage-2 merge is a concatenation of disjoint runs (no
  * re-sort).
  *
  * The build has exactly ONE wide shuffle, of posting-scale (not
  * token-scale) rows: tf, doc length, and the wire-encoded position record
  * all ride in the posting row, so there is no docstats join, no
  * (doc, term) groupBy exchange, and no map-side sort.
  *
  * Final layout: `index(term, df, chunk_id, first_doc_id, last_doc_id, n,
  * max_weight, blocks, postings, positions)`; [[write]] range-partitions by
  * term so parquet min/max stats prune segment files by query term at read
  * time.
  */
object InvertedIndex {
  val ChunkSize = 1 << 17

  /** index rows from the compact posting stream (doc_id, term, tf, len,
    * pos) — graft.index.Stats.postings. `saltBuckets` bounds stage-1 group
    * size: each (term, salt) group holds at most ~nDocs/saltBuckets docs'
    * postings. */
  def build(postings: DataFrame, nDocs: Long, avgdl: Double,
            saltBuckets: Int = 32): DataFrame = {
    mergeSegments(segments(postings, nDocs, saltBuckets), avgdl)
  }

  /** Stage 1: salted posting runs (term, salt, seg, pos, n).
    *
    * The compact posting stream — one row per (doc, term), tf/len/positions
    * already folded doc-at-a-time by the fused tokenize expression
    * (graft.functions.CompactTokens), so the map side materializes no
    * per-token rows and sorts nothing — flows through ONE Tungsten shuffle
    * keyed by (term, salt) — the "salted, skew-aware shuffle keyed by term"
    * of the north rule — then an in-partition sort and a streaming,
    * zero-buffering varbyte encoder in `mapPartitions`. Sort-based
    * (spillable, off-heap UnsafeRow) rather than an object hash aggregate:
    * no per-row JVM objects, so the stage scales with cores instead of GC.
    * Salt = doc_id range bucket, so runs are docId-disjoint and stage 2
    * merges by concatenation. Position records are byte-appended, never
    * re-encoded.
    *
    * Replaces the reference's in-heap ConcurrentHashMap index build
    * (`Indexer/TextIndexer.java:16, 50-94`) and per-(term,doc) Mongo upserts
    * (`dbManager/dbManager.java:178-237`).
    *
    * `postings` must be (doc_id, term, tf, len, pos) rows
    * (graft.index.Stats.postings) — tf/len/positions riding in the row is
    * what keeps this a single-pass, join-free stage.
    */
  def segments(postings: DataFrame, nDocs: Long,
               saltBuckets: Int = 32): DataFrame = {
    implicit val spark: SparkSession = postings.sparkSession
    import spark.implicits._
    val bucketWidth = math.max(1L, nDocs / saltBuckets)
    postings
      .select(col("term"), (col("doc_id") / bucketWidth).cast("long").as("salt"),
        col("doc_id"), col("tf").cast("int").as("tf"),
        col("len").cast("int").as("len"), col("pos"))
      // explicit partition count: encode cost is per posting, not per byte
      // (varbyte output is tiny), so AQE's size-based coalescing would fold
      // this CPU-bound stage into ~4 oversized tasks and let the slowest
      // term group gate the stage; the explicit count (user-specified →
      // exempt from coalescing) keeps shuffle.partitions-way balance
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("term"), col("salt"))
      .sortWithinPartitions("term", "salt", "doc_id")
      .as[(String, Long, Long, Int, Int, Array[Byte])]
      .mapPartitions { rows =>
        new Iterator[SegmentRow] {
          private var pending: Option[(String, Long, Long, Int, Int, Array[Byte])] = None
          private val buf = new PostingCodec.ByteBuf(1 << 12)
          private val posBuf = new PostingCodec.ByteBuf(1 << 12)
          def hasNext: Boolean = pending.isDefined || rows.hasNext
          def next(): SegmentRow = {
            var cur = pending.getOrElse(rows.next())
            pending = None
            val curTerm = cur._1
            val curSalt = cur._2
            buf.reset()
            posBuf.reset()
            var prevDoc = -1L
            var nPostings = 0L
            var done = false
            while (!done) {
              buf.writeVLong(cur._3 - prevDoc)
              buf.writeVLong(cur._4.toLong)
              buf.writeVLong(cur._5.toLong)
              posBuf.appendAll(cur._6)
              prevDoc = cur._3
              nPostings += 1
              if (rows.hasNext) {
                val n = rows.next()
                if (n._1 == curTerm && n._2 == curSalt) cur = n
                else { pending = Some(n); done = true }
              } else done = true
            }
            SegmentRow(curTerm, curSalt, buf.toArray, posBuf.toArray, nPostings)
          }
        }
      }
      .toDF("term", "salt", "seg", "pos", "n")
  }

  /** Stage 2: merge (term, salt, seg, pos) runs into the final chunked
    * index.
    *
    * The explicit term repartition pins the merge's parallelism to the
    * cluster width: the segment bytes are small (varbyte + parquet
    * compression) but the merge COST is per posting (kryo buffers, decode,
    * re-encode), so AQE's size-based coalescing would otherwise shrink this
    * stage to 1-2 tasks and serialize the whole tail of the build (measured
    * 2-task × 2 s stages at 4 cores on a 480k-file corpus). A user-specified
    * partition count is exempt from AQE coalescing, and hashpartitioning
    * (term, N) already satisfies the groupBy clustering — no second
    * exchange. Per-bucket segment files hold each term at most once, so
    * map-side partial aggregation had nothing to combine anyway. */
  def mergeSegments(segments: DataFrame, avgdl: Double): DataFrame = {
    val mergeUdaf = udaf(new MergeAgg(avgdl, Stats.K1, Stats.B, ChunkSize))
    segments
      .repartition(segments.sparkSession.sparkContext.defaultParallelism,
        col("term"))
      .groupBy("term")
      .agg(mergeUdaf(col("seg"), col("pos")).as("tc"))
      .select(col("term"), col("tc.df").as("df"),
        explode(col("tc.chunks")).as("chunk"))
      .select(col("term"), col("df"), col("chunk.*"))
  }

  /** Persist with explicit range partitioning of terms (north rule): each
    * output file covers a contiguous term range → min/max parquet stats give
    * query-term file pruning, and heavy terms are spread over the range
    * space rather than hashed into one file. */
  def write(index: DataFrame, path: String, nPartitions: Int = 32,
            io: graft.sources.TableIO = graft.sources.ParquetTableIO): Unit = {
    // repartitionByRange SAMPLES its child to pick range bounds, then
    // executes it again for the real write — without a persist that runs
    // the whole merge aggregation twice (measured as two back-to-back
    // ~4 s-CPU stages at 480k files). MEMORY_AND_DISK keeps the scale
    // posture: chunks spill to local disk instead of re-running the merge.
    val cached = index.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try io.overwrite(
      cached.repartitionByRange(nPartitions, col("term"), col("chunk_id"))
        .sortWithinPartitions("term", "chunk_id"), path)
    finally cached.unpersist()
  }

  def load(spark: SparkSession, path: String,
           io: graft.sources.TableIO = graft.sources.ParquetTableIO): DataFrame =
    io.read(spark, path)
}
