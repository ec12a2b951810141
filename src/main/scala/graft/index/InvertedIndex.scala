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

/** Stage-0.5 output row: one compacted posting with its pre-encoded
  * positions record (vint(tf) + delta varints, prev = -1 — the final wire
  * format, byte-copied into segment runs, never re-encoded). */
final case class PostingRow(term: String, doc_id: Long, tf: Int, len: Int,
                            pos: Array[Byte])

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
  * Pipeline: token stream (doc_id, term, pos) ⋈ broadcast docstats →
  * stage-1 salted partial aggregation repartition(term, salt) + in-partition
  * sort + streaming encoder → stage-2 merge groupBy(term) → explode chunks.
  * Salt = doc_id range bucket, so stage-2 merge is a concatenation of
  * disjoint runs (no re-sort).
  *
  * Taking the raw token stream (not pre-aggregated tf rows) costs ~1.3-2×
  * shuffle rows but DELETES the (doc_id, term) groupBy exchange that round 1
  * ran before segmenting: the build now has exactly ONE wide shuffle of
  * token-scale data (plus the tiny per-doc docstats aggregation), and term
  * frequency falls out of the same streaming pass that encodes postings.
  *
  * Final layout: `index(term, df, chunk_id, first_doc_id, last_doc_id, n,
  * max_weight, blocks, postings, positions)`; [[write]] range-partitions by
  * term so parquet min/max stats prune segment files by query term at read
  * time.
  */
object InvertedIndex {
  val ChunkSize = 1 << 17

  /** index rows from the positional token stream (doc_id, term, pos, len).
    * `saltBuckets` bounds stage-1 group size: each (term, salt) group holds
    * at most ~nDocs/saltBuckets docs' postings. */
  def build(tokens: DataFrame, nDocs: Long, avgdl: Double,
            saltBuckets: Int = 32): DataFrame = {
    mergeSegments(segments(tokens, nDocs, saltBuckets), avgdl)
  }

  /** Stage 0.5 (narrow — no exchange): compact the positional token stream
    * into one row per POSTING, `(term, doc_id, tf, len, pos_bytes)`, before
    * anything shuffles. A document's tokens never span input partitions (the
    * tokenizer explodes per document row), so an in-partition sort on
    * (doc_id, term, pos) + one linear scan is an EXACT (doc, term)
    * aggregation with no hash table, no per-key JVM objects, and no
    * exchange. This is the map-side combine the raw token stream otherwise
    * lacks: without it the wide shuffle carries one row per token — ×tf the
    * posting count (measured 8× on the bench corpus, 640 MB vs ~90 MB per
    * bucket) — which is exactly the blow-up that made the positional build
    * regress. Positions leave here already in their final varbyte wire
    * format; every later stage byte-copies them. */
  private def compactPostings(tokens: DataFrame)(implicit spark: SparkSession) = {
    import spark.implicits._
    tokens
      .select(col("doc_id"), col("term"), col("pos").cast("int").as("pos"),
        col("len").cast("int").as("len"))
      .sortWithinPartitions("doc_id", "term", "pos")
      .as[(Long, String, Int, Int)]
      .mapPartitions { rows =>
        new Iterator[PostingRow] {
          private var pending: Option[(Long, String, Int, Int)] = None
          private val posBuf = new PostingCodec.ByteBuf(64)
          private var posAcc = new Array[Int](64)
          def hasNext: Boolean = pending.isDefined || rows.hasNext
          def next(): PostingRow = {
            var cur = pending.getOrElse(rows.next())
            pending = None
            val docId = cur._1
            val term = cur._2
            val len = cur._4
            var nPos = 0
            def addPos(p: Int): Unit = {
              if (nPos == posAcc.length)
                posAcc = java.util.Arrays.copyOf(posAcc, posAcc.length * 2)
              posAcc(nPos) = p
              nPos += 1
            }
            addPos(cur._3)
            var done = false
            while (!done) {
              if (rows.hasNext) {
                val n = rows.next()
                if (n._1 == docId && n._2 == term) addPos(n._3)
                else { pending = Some(n); done = true }
              } else done = true
            }
            posBuf.reset()
            posBuf.writeVLong(nPos.toLong)
            var prev = -1L
            var j = 0
            while (j < nPos) {
              posBuf.writeVLong(posAcc(j) - prev)
              prev = posAcc(j)
              j += 1
            }
            PostingRow(term, docId, nPos, len, posBuf.toArray)
          }
        }
      }
  }

  /** Stage 1: salted posting runs (term, salt, seg, pos, n).
    *
    * Compacted postings (stage 0.5) flow through ONE Tungsten shuffle keyed
    * by (term, salt) — the "salted, skew-aware shuffle keyed by term" of the
    * north rule — then an in-partition sort and a streaming, zero-buffering
    * varbyte encoder in `mapPartitions`. Sort-based (spillable, off-heap
    * UnsafeRow) rather than an object hash aggregate: no per-row JVM
    * objects, so the stage scales with cores instead of GC. Salt = doc_id
    * range bucket, so runs are docId-disjoint and stage 2 merges by
    * concatenation. Position records are byte-appended, never re-encoded.
    *
    * Replaces the reference's in-heap ConcurrentHashMap index build
    * (`Indexer/TextIndexer.java:16, 50-94`) and per-(term,doc) Mongo upserts
    * (`dbManager/dbManager.java:178-237`).
    *
    * `tokens` must be (doc_id, term, pos, len) rows
    * (graft.index.Stats.tokensPos) — len riding in the row is what keeps
    * this a single-pass, join-free stage.
    */
  def segments(tokens: DataFrame, nDocs: Long,
               saltBuckets: Int = 32): DataFrame = {
    implicit val spark: SparkSession = tokens.sparkSession
    import spark.implicits._
    val bucketWidth = math.max(1L, nDocs / saltBuckets)
    compactPostings(tokens)
      .select(col("term"), (col("doc_id") / bucketWidth).cast("long").as("salt"),
        col("doc_id"), col("tf"), col("len"), col("pos"))
      .repartition(col("term"), col("salt"))
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
    * index. */
  def mergeSegments(segments: DataFrame, avgdl: Double): DataFrame = {
    val mergeUdaf = udaf(new MergeAgg(avgdl, Stats.K1, Stats.B, ChunkSize))
    segments
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
            io: graft.sources.TableIO = graft.sources.ParquetTableIO): Unit =
    io.overwrite(
      index.repartitionByRange(nPartitions, col("term"), col("chunk_id"))
        .sortWithinPartitions("term", "chunk_id"), path)

  def load(spark: SparkSession, path: String,
           io: graft.sources.TableIO = graft.sources.ParquetTableIO): DataFrame =
    io.read(spark, path)
}
