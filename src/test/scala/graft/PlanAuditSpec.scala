package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.corpus.Corpus
import graft.index.{IndexTables, InvertedIndex}
import graft.search.{CompressedSearchEngine, SearchEngine}

/** Asserts the physical-plan properties the engine's 100 TB posture depends
  * on (the same plans PLANS.md documents): pushdown reaches the parquet
  * scan, the query side broadcasts the small side, top-k plans as
  * TakeOrderedAndProject (never a global sort), and the index build has
  * exactly the intended exchanges. */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private lazy val t = IndexTables.build(Corpus.files(spark, sf))
  private lazy val eng = new SearchEngine(t)

  test("predicate and projection reach the parquet scan") {
    val p = plan(Corpus.documents(spark, sf)
      .filter(col("lang") === "scala").select("doc_id", "lang"))
    assert(p.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,scala)]"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string"), p)
  }

  test("token query: broadcast join + TakeOrderedAndProject top-k") {
    val p = plan(eng.search("merge sort window"))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("GlobalSort"), p)
  }

  test("compressed index scan pushes the query-term IN filter") {
    val idxPath = "/tmp/graft_planspec_index"
    InvertedIndex.write(
      InvertedIndex.build(graft.index.Stats.postings(Corpus.files(spark, sf)),
        t.nDocs, t.avgdl), idxPath)
    val ce = new CompressedSearchEngine(
      InvertedIndex.load(spark, idxPath), t.nDocs, t.avgdl)
    val p = plan(ce.searchTopK(Seq("merge", "sort")))
    assert(p.contains("PushedFilters: [In(term, [merge,sort])]"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("segment build: one (term, salt) repartition, single fused tokenize, " +
      "no join, no map-side sort") {
    val p = plan(InvertedIndex.segments(
      graft.index.Stats.postings(Corpus.files(spark, sf)), t.nDocs))
    // exactly one explicit repartition — the salted, skew-aware shuffle
    // (REPARTITION_BY_NUM: user-specified count, exempt from AQE's
    // size-based coalescing — the encode stage is CPU-per-posting bound)
    val reparts = "REPARTITION_BY_NUM".r.findAllIn(p).length
    assert(reparts == 1, s"expected 1 REPARTITION_BY_NUM, got $reparts in:\n$p")
    assert(p.contains("hashpartitioning(term"), p)
    assert(p.contains("Sort [term"), p)
    // tf/len/positions ride in the posting row: the build plan has NO join
    assert(!p.contains("Join"), p)
    // the fused tokenize+compact expression evaluates exactly once per row
    // (the array is materialized once — not re-evaluated for the generator
    // or a pushed-down non-empty filter at the scan)
    val tokenizes = "compacttokens".r.findAllIn(p).length
    assert(tokenizes == 1, s"expected 1 compacttokens eval, got $tokenizes in:\n$p")
    // the ONLY sort is the post-shuffle (term, salt, doc_id) run sort — the
    // map side no longer sorts per-token rows
    val sorts = "\\bSort \\[".r.findAllIn(p).length
    assert(sorts == 1, s"expected 1 Sort (post-shuffle only), got $sorts in:\n$p")
  }

  test("minhash pipeline: one signature computation, no collect_list") {
    val df = ops.Dedup.minhashPairs(Corpus.documents(spark, sf))
    df.collect() // AQE finalizes the plan at runtime
    val p = df.queryExecution.executedPlan.toString
    // the 16 hash minima are aggregate COLUMNS over the raw shingle stream
    // (one groupBy(doc_id) exchange); band buckets derive from the wide
    // row, and the self-join's second side REUSES the signature exchange
    // rather than recomputing the shingle scan
    assert(p.contains("ReusedExchange"), p)
    assert(!p.contains("collect_list"), p)
  }

  test("simhash: one exchange, 32 bit-sums as aggregate columns") {
    val df = ops.Dedup.simhash(Corpus.documents(spark, sf))
    val p = plan(df)
    // the 32 bit-plane sums are conditional-sum aggregate COLUMNS over the
    // raw token stream: exactly one doc_id hash exchange (plus the final
    // orderBy's range exchange), no ×32 row explosion, no two-level groupBy
    val hashEx = "hashpartitioning\\(doc_id".r.findAllIn(p).length
    assert(hashEx == 1, s"expected 1 doc_id hash exchange, got $hashEx in:\n$p")
    assert(!p.toLowerCase.contains("explode(sequence"), p)
    val aggs = "\\bHashAggregate".r.findAllIn(p).length
    assert(aggs == 2, s"expected partial+final aggregate only, got $aggs in:\n$p")
  }

  test("boolean NOT candidates: anti join, no distinct aggregates on the sets") {
    val p = plan(eng.search("\"sort merge\" NOT \"hash join\""))
    assert(p.contains("LeftAnti"), p)
  }

  test("near-dup pairs plan is an LSH-bucket equi-join, never a cartesian") {
    val p = plan(ops.Similarity.nearDupPairs(Corpus.embeddings(spark, sf)))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("bucket"), p)
  }

  test("cluster propagation round: equi-join + min hash agg, never a cartesian") {
    val pairs = ops.Dedup.minhashPairs(Corpus.documents(spark, sf))
    val e = ops.Dedup.symmetricEdges(pairs)
    val p = plan(ops.Dedup.propagationRound(e,
      e.select(col("src").as("v"), col("dst").as("lab"))))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("candidate membership is a semi join, not a materialized set") {
    val p = plan(eng.search("\"hash join\" AND \"merge sort\""))
    assert(p.contains("LeftSemi"), p)
  }

  test("compressed boolean query verifies both phrases in ONE corpus scan") {
    val idxPath = "/tmp/graft_planspec_index_bool"
    InvertedIndex.write(
      InvertedIndex.build(graft.index.Stats.postings(Corpus.files(spark, sf)),
        t.nDocs, t.avgdl), idxPath)
    val ce = new CompressedSearchEngine(
      InvertedIndex.load(spark, idxPath), t.nDocs, t.avgdl)
    val files = Corpus.files(spark, sf)
    // phrases chosen to co-occur at sf0.001 (AND/NOT nonempty) — an empty
    // intermediate would let AQE empty-propagate the corpus scan away
    for (q <- Seq("\"merge sort\" OR \"table scan\"",
        "\"merge sort\" AND \"table scan\"",
        "\"merge sort\" NOT \"table scan\"")) {
      val df = ce.search(q, files)
      df.collect() // AQE finalizes the plan at runtime
      // AdaptiveSparkPlan.toString prints the Final AND Initial plans —
      // count scans in the final section only
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // content is hydrated once for the UNION of both candidate sets and
      // both `contains` predicates evaluate on that single scan — the
      // two-scans-of-files shape made bool_or cost 2× bool_and (r3)
      val scans = "documents\\.parquet".r.findAllIn(p).length
      assert(scans == 1, s"[$q] expected 1 corpus scan, got $scans in:\n$p")
      // both phrases' substring predicates reach that one scan
      assert(p.contains("Contains(asciilower"), p)
    }
  }
}
