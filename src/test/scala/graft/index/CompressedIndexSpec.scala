package graft.index

import graft.SparkSpec
import graft.search.{CompressedSearchEngine, SearchEngine}
import org.apache.spark.sql.functions._

/** Compressed index == uncompressed stats tables == pruned path, on seeded
  * random corpora (FIXTURES.md §5 properties). */
class CompressedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(seed: Int, nDocs: Int) = {
    val rnd = new scala.util.Random(seed)
    val vocab = Seq("merge", "sort", "window", "scan", "filter", "hash",
      "join", "batch", "stream", "spark", "dup", "rareterm")
    (0L until nDocs.toLong).map { id =>
      val n = 3 + rnd.nextInt(60)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
  }

  private def build(seed: Int, nDocs: Int, saltBuckets: Int) = {
    val files = corpus(seed, nDocs).toDF("doc_id", "content")
    val t = IndexTables.build(files, "simple")
    val idx = InvertedIndex.build(t.tf, t.docstats, t.nDocs, t.avgdl, saltBuckets)
    (t, new CompressedSearchEngine(idx, t.nDocs, t.avgdl))
  }

  test("index roundtrip equals tf ⋈ docstats") {
    val (t, ce) = build(7, 120, 8)
    val want = t.tf.join(t.docstats, Seq("doc_id"))
      .select("term", "doc_id", "tf", "len")
      .orderBy("term", "doc_id").collect().toSeq
    val got = ce.decoded(None).select("term", "doc_id", "tf", "len")
      .orderBy("term", "doc_id").collect().toSeq
    assert(got === want)
  }

  test("salted merge == single-bucket build") {
    val (_, many) = build(11, 200, 16)
    val (_, one) = build(11, 200, 1)
    val a = many.decoded(None).orderBy("term", "doc_id").collect().toSeq
    val b = one.decoded(None).orderBy("term", "doc_id").collect().toSeq
    assert(a === b)
  }

  test("compressed exhaustive == uncompressed engine scores") {
    val (t, ce) = build(13, 150, 8)
    val se = new SearchEngine(t, "simple")
    for (terms <- Seq(Seq("merge", "sort"), Seq("dup"), Seq("rareterm", "hash", "join"))) {
      val got = ce.searchTopK(terms, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val want = se.scoreTopK(terms, None, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got === want, s"terms $terms")
    }
  }

  test("pruned top-k rank-identical to exhaustive") {
    for (seed <- Seq(3, 5, 9)) {
      val (_, ce) = build(seed, 250, 8)
      for (terms <- Seq(Seq("merge"), Seq("merge", "sort", "window"),
          Seq("dup", "batch"), Seq("rareterm", "spark"),
          Seq("hash", "join", "scan", "filter", "stream"))) {
        val got = ce.searchPruned(terms, 10, force = true).collect()
          .map(r => (r.getLong(0), r.getDouble(1))).toSeq
        val want = ce.searchTopK(terms, 10).collect()
          .map(r => (r.getLong(0), r.getDouble(1))).toSeq
        assert(got === want, s"seed=$seed terms=$terms")
      }
    }
  }

  test("chunking splits long posting lists and preserves order") {
    // force tiny chunks by building manually with a small chunk size
    val avgdl = 10.0
    val agg = new MergeAgg(avgdl, 1.2, 0.75, chunkSize = 64)
    val ps = (0L until 300L).map(i => PostingCodec.Posting(i * 3, 1 + (i % 5).toInt, 30))
    val segBuf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var prev = -1L
    ps.foreach { p =>
      PostingCodec.writeVLong(segBuf, p.doc_id - prev)
      PostingCodec.writeVLong(segBuf, p.tf.toLong)
      PostingCodec.writeVLong(segBuf, p.len.toLong)
      prev = p.doc_id
    }
    val tc = agg.finish(scala.collection.mutable.ArrayBuffer(segBuf.toArray))
    assert(tc.df === 300)
    assert(tc.chunks.length === 5) // ceil(300/64)
    val all = tc.chunks.flatMap(c => PostingCodec.decode(c.postings))
    assert(all.toSeq === ps)
    assert(tc.chunks.forall(c => c.first_doc_id <= c.last_doc_id))
  }
}
