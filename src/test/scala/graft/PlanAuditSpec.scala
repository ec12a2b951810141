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

  test("minhash pipeline: one fused signature eval, reused bucket exchange") {
    val df = ops.Dedup.minhashPairs(Corpus.documents(spark, sf))
    df.collect() // AQE finalizes the plan at runtime
    val p = df.queryExecution.executedPlan.toString
    val fin = p.split("== Initial Plan ==").head
    // the whole signature is ONE narrow expression eval per document (r6 —
    // no shingle explode, no groupBy agg); the explicit (band, bucket)
    // repartition before the self-join is the ONLY signature-bearing
    // exchange and the join's second side REUSES it instead of recomputing
    // signatures from the raw text
    assert(p.contains("ReusedExchange"), p)
    assert(!p.contains("collect_list"), p)
    val sigEvals = "minhashsigs".r.findAllIn(fin).length
    assert(sigEvals == 1,
      s"expected 1 minhashsigs eval in the final plan, got $sigEvals in:\n$fin")
  }

  test("simhash: fully narrow — no explode, no agg, no exchange before sort") {
    val df = ops.Dedup.simhash(Corpus.documents(spark, sf))
    val p = plan(df)
    // r6: the 32 bit-plane sums are folded inside ONE fused expression per
    // document — the only exchange left is the final orderBy's range
    // partitioning, and the expression evaluates exactly once per row (the
    // explode_outer generator barrier keeps the isNotNull filter from being
    // substituted below the projection)
    val hashEx = "hashpartitioning\\(doc_id".r.findAllIn(p).length
    assert(hashEx == 0, s"expected 0 doc_id hash exchanges, got $hashEx in:\n$p")
    val aggs = "\\bHashAggregate".r.findAllIn(p).length
    assert(aggs == 0, s"expected no aggregates, got $aggs in:\n$p")
    val evals = "simhashval".r.findAllIn(p).length
    assert(evals == 1, s"expected 1 simhashval eval, got $evals in:\n$p")
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
      // both phrases' substring predicates reach that one scan, as the
      // zero-allocation case-folding search (r6 — no lowered content copy)
      assert(p.contains("asciicontains"), p)
      assert(!p.contains("Contains(asciilower"), p)
      // r6: BOTH phrases' conjunctive candidate sets come from ONE decoded
      // index scan (union-of-terms bit mask agg) + one scoring scan — the
      // per-phrase candidatesAll subtrees were the third index scan
      val idxScans = "graft_planspec_index_bool".r.findAllIn(p).length
      assert(idxScans == 2,
        s"[$q] expected 2 index scans (candidates + scoring), got $idxScans in:\n$p")
    }
  }
}
