package graft.index

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer
import PostingCodec.{BlockMeta, Posting}

/** One bounded chunk of a term's final posting list. Chunks split a term's
  * postings every [[InvertedIndex.ChunkSize]] entries so a single row (and a
  * single decode task) stays bounded even for ubiquitous code tokens at
  * 10^12-file scale — the document-partitioned layout ubiquitous in sharded
  * IR systems. `max_weight` is the chunk-level bound (max over its blocks).
  */
final case class IndexChunk(chunk_id: Int, first_doc_id: Long,
                            last_doc_id: Long, n: Int, max_weight: Double,
                            blocks: Array[BlockMeta], postings: Array[Byte])

final case class TermChunks(df: Long, chunks: Array[IndexChunk])

/** Stage-1 output row: one sorted encoded run per (term, salt). */
final case class SegmentRow(term: String, salt: Long, seg: Array[Byte])

/** Stage 2: merge one term's segment runs (sorted, docId-range-disjoint by
  * construction → concatenation fast path) into block-max chunks. */
final class MergeAgg(avgdl: Double, k1: Double, b: Double, chunkSize: Int)
    extends Aggregator[Array[Byte], ArrayBuffer[Array[Byte]], TermChunks] {
  def zero: ArrayBuffer[Array[Byte]] = ArrayBuffer.empty
  def reduce(buf: ArrayBuffer[Array[Byte]], seg: Array[Byte]): ArrayBuffer[Array[Byte]] = {
    buf += seg; buf
  }
  def merge(a: ArrayBuffer[Array[Byte]], b2: ArrayBuffer[Array[Byte]]): ArrayBuffer[Array[Byte]] = {
    a ++= b2; a
  }
  def finish(buf: ArrayBuffer[Array[Byte]]): TermChunks = {
    val merged = PostingCodec.mergeRuns(buf.map(PostingCodec.decode).toSeq)
    val chunks = merged.grouped(chunkSize).zipWithIndex.map { case (ps, i) =>
      val (bytes, blocks) = PostingCodec.encode(ps, avgdl, k1, b)
      IndexChunk(i, ps.head.doc_id, ps.last.doc_id, ps.length,
        blocks.map(_.max_weight).max, blocks, bytes)
    }.toArray
    TermChunks(merged.length.toLong, chunks)
  }
  def bufferEncoder: Encoder[ArrayBuffer[Array[Byte]]] =
    Encoders.kryo[ArrayBuffer[Array[Byte]]]
  def outputEncoder: Encoder[TermChunks] = Encoders.product[TermChunks]
}

/** Builder for the compressed inverted index (SURVEY.md §7.1 step 4).
  *
  * Pipeline: tf ⋈ docstats (narrow after co-grouping) → stage-1 salted
  * partial aggregation groupBy(term, salt) → stage-2 merge groupBy(term) →
  * explode chunks. Salt = doc_id range bucket, so stage-2 merge is a
  * concatenation of disjoint runs (no re-sort).
  *
  * Final layout: `index(term, df, chunk_id, first_doc_id, last_doc_id, n,
  * max_weight, blocks, postings)`; [[write]] range-partitions by term so
  * parquet min/max stats prune segment files by query term at read time.
  */
object InvertedIndex {
  val ChunkSize = 1 << 17

  /** index rows from tf + docstats. `saltBuckets` bounds stage-1 group size:
    * each (term, salt) group holds at most ~nDocs/saltBuckets postings. */
  def build(tf: DataFrame, docstats: DataFrame, nDocs: Long, avgdl: Double,
            saltBuckets: Int = 32): DataFrame = {
    mergeSegments(segments(tf, docstats, nDocs, saltBuckets), avgdl)
  }

  /** Stage 1: salted partial posting runs (term, salt, seg).
    *
    * Implemented as ONE Tungsten shuffle keyed by (term, salt) followed by an
    * in-partition sort and a streaming, zero-buffering varbyte encoder in
    * `mapPartitions` — the "salted, skew-aware shuffle keyed by term" of the
    * north rule. Sort-based (spillable, off-heap UnsafeRow) rather than an
    * object hash aggregate: no per-row JVM objects, so the stage scales with
    * cores instead of GC. Salt = doc_id range bucket, so runs are
    * docId-disjoint and stage 2 merges by concatenation.
    *
    * Replaces the reference's in-heap ConcurrentHashMap index build
    * (`Indexer/TextIndexer.java:16, 50-94`) and per-(term,doc) Mongo upserts
    * (`dbManager/dbManager.java:178-237`).
    */
  def segments(tf: DataFrame, docstats: DataFrame, nDocs: Long,
               saltBuckets: Int = 32): DataFrame = {
    val spark = tf.sparkSession
    import spark.implicits._
    val bucketWidth = math.max(1L, nDocs / saltBuckets)
    tf.join(docstats, Seq("doc_id"))
      .select(col("term"), (col("doc_id") / bucketWidth).cast("long").as("salt"),
        col("doc_id"), col("tf").cast("int").as("tf"), col("len").cast("int").as("len"))
      .repartition(col("term"), col("salt"))
      .sortWithinPartitions("term", "salt", "doc_id")
      .as[(String, Long, Long, Int, Int)]
      .mapPartitions { rows =>
        new Iterator[SegmentRow] {
          private var pending: Option[(String, Long, Long, Int, Int)] = None
          private val buf = new PostingCodec.ByteBuf(1 << 12)
          def hasNext: Boolean = pending.isDefined || rows.hasNext
          def next(): SegmentRow = {
            var cur = pending.getOrElse(rows.next())
            pending = None
            val curTerm = cur._1
            val curSalt = cur._2
            buf.reset()
            var prev = -1L
            var done = false
            while (!done) {
              buf.writeVLong(cur._3 - prev)
              buf.writeVLong(cur._4.toLong)
              buf.writeVLong(cur._5.toLong)
              prev = cur._3
              if (rows.hasNext) {
                val n = rows.next()
                if (n._1 == curTerm && n._2 == curSalt) cur = n
                else { pending = Some(n); done = true }
              } else done = true
            }
            SegmentRow(curTerm, curSalt, buf.toArray)
          }
        }
      }
      .toDF("term", "salt", "seg")
  }

  /** Stage 2: merge (term, salt, seg) runs into the final chunked index. */
  def mergeSegments(segments: DataFrame, avgdl: Double): DataFrame = {
    val mergeUdaf = udaf(new MergeAgg(avgdl, Stats.K1, Stats.B, ChunkSize))
    segments
      .groupBy("term")
      .agg(mergeUdaf(col("seg")).as("tc"))
      .select(col("term"), col("tc.df").as("df"),
        explode(col("tc.chunks")).as("chunk"))
      .select(col("term"), col("df"), col("chunk.*"))
  }

  /** Persist with explicit range partitioning of terms (north rule): each
    * output file covers a contiguous term range → min/max parquet stats give
    * query-term file pruning, and heavy terms are spread over the range
    * space rather than hashed into one file. */
  def write(index: DataFrame, path: String, nPartitions: Int = 32): Unit =
    index.repartitionByRange(nPartitions, col("term"), col("chunk_id"))
      .sortWithinPartitions("term", "chunk_id")
      .write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
