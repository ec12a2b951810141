package graft.search

import graft.SparkSpec
import graft.index.{IndexTables, InvertedIndex, Stats}

/** The positional adjacency pre-filter must be invisible: phrase results
  * through the compressed engine (adjacency + substring verify) must equal
  * the substring-only baseline (uncompressed SearchEngine) on corpora built
  * to break naive token-adjacency:
  *
  *  - a match can start MID-TOKEN ("rehash join" contains "hash join" while
  *    the tokens are [rehash, join]),
  *  - a match can end mid-token ("hash joins"),
  *  - conjunctive tokens present but never adjacent must stay excluded,
  *  - a doc with the substring but MISSING an exact token stays excluded
  *    (the reference ANDs the substring with conjunctive token candidates,
  *    `dbManager.java:250-256` + `:324-341`).
  */
class PhrasePositionalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    0L -> "alpha hash join beta",          // exact adjacency
    1L -> "rehash join gamma hash delta",  // suffix-boundary match + stray hash
    2L -> "hash gamma join",               // tokens present, never adjacent
    3L -> "alpha hash joins beta join",    // prefix-boundary match
    4L -> "rehash joins only",             // substring present, token 'hash'/'join' absent
    5L -> "nothing to see here")

  private lazy val files = docs.toDF("doc_id", "content")
  private lazy val t = IndexTables.build(files, "simple")
  private lazy val ce = {
    val idx = InvertedIndex.build(Stats.postings(files),
      t.nDocs, t.avgdl, saltBuckets = 4)
    new CompressedSearchEngine(idx, t.nDocs, t.avgdl)
  }
  private lazy val se = new SearchEngine(t)

  test("phrase candidates: positional path == substring baseline on " +
      "boundary-adversarial docs") {
    val got = ce.phraseCandidates("hash join", files, forcePositional = true)
      .collect().map(_.getLong(0)).sorted.toSeq
    val want = se.phraseCandidates("hash join")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === want)
    assert(got === Seq(0L, 1L, 3L))
  }

  test("adjacency pre-filter alone is a sound superset (keeps every " +
      "substring match, drops the non-adjacent doc)") {
    val adj = ce.adjacencyCandidates(Seq("hash", "join"),
        ce.candidatesAll(Seq("hash", "join"))).get
      .collect().map(_.getLong(0)).toSet
    assert(Set(0L, 1L, 3L).subsetOf(adj))
    assert(!adj.contains(2L))
    assert(!adj.contains(5L))
  }

  test("full phrase + boolean search: compressed positional == baseline") {
    for (q <- Seq("\"hash join\"", "\"hash join\" AND \"join beta\"",
        "\"hash join\" OR \"nothing to\"", "\"hash join\" NOT \"rehash\"")) {
      val got = ce.search(q, files, 10, forcePositional = true).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val want = se.search(q, 10).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got === want, s"query [$q]")
    }
  }

  test("full phrase + boolean search: compressed NON-positional (fused " +
      "single-scan boolean candidates, r6) == baseline") {
    for (q <- Seq("\"hash join\"", "\"hash join\" AND \"join beta\"",
        "\"hash join\" OR \"nothing to\"", "\"hash join\" NOT \"rehash\"",
        "\"hash join\" AND \"hash join\"", "\"absent\" OR \"hash join\"",
        "\"hash join\" NOT \"hash join\"")) {
      val got = ce.search(q, files, 10).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val want = se.search(q, 10).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got === want, s"query [$q]")
    }
  }

  test("positions roundtrip: decode(encode) == posexplode of the analyzer") {
    val got = ce.occurrencesAll()
      .select("term", "doc_id", "pos")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    val want = Stats.tokensPos(files)
      .select("term", "doc_id", "pos")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    assert(got === want)
    assert(got.nonEmpty)
  }
}
