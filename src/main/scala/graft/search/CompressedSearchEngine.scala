package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._


/** BM25 retrieval over the compressed block-max index
  * (`index(term, df, chunk_id, first_doc_id, last_doc_id, n, max_weight,
  * blocks, postings, positions)`).
  *
  * Paths:
  *  - [[searchTopK]]: exhaustive — decode every chunk of the query terms,
  *    score, top-k. The correctness baseline.
  *  - [[searchPruned]]: MaxScore term pruning + chunk-range skipping +
  *    block-max WAND block skipping (see its doc). Guaranteed
  *    rank-identical to the exhaustive path (asserted in tests and by the
  *    shared DuckDB oracle).
  *  - [[search]]: the full serving lifecycle (token/phrase/boolean), with
  *    the positional adjacency pre-filter on phrases above the gate.
  *
  * Everything stays distributed: the only `collect`s are O(#query-terms)
  * metadata rows, the k threshold scores, and the bounded dictionary
  * expansion — never postings.
  */
final class CompressedSearchEngine(val index: DataFrame, val nDocs: Long,
                                   val avgdl: Double) {

  /** Diagnostic: whether the last [[searchPruned]] call ran the block-max
    * candidate-generation pass (τ > 0 for some essential term) or provably
    * skipped it (τ ≤ 0 for all — no block prunable). Tests assert both
    * branches execute across their query matrix. */
  @volatile private[graft] var lastPrunedUsedCandidates: Option[Boolean] = None

  // native codegen'd decode (graft.functions.DecodePostings) — stays inside
  // whole-stage codegen fused with the explode, no catalyst↔Scala converters
  private def decodeCol(c: org.apache.spark.sql.Column) = {
    graft.functions.GraftFunctions.register(index.sparkSession)
    graft.functions.GraftFunctions.decodePostings(c)
  }

  private def rowsFor(terms: Seq[String]): DataFrame =
    index.filter(col("term").isin(terms: _*))

  /** Term dictionary for phrase boundary expansion, materialized once per
    * engine on first phrase query (serving engines are long-lived): the
    * expansion filter then scans the cached vocab instead of re-reading the
    * index's term column per query. Vocabulary is tiny next to postings. */
  private lazy val termDict: DataFrame =
    index.select("term").distinct().persist()

  /** Decoded view of the index: (term, df, doc_id, tf, len) — also the
    * encode∘decode = id roundtrip surface checked against the tf oracle. */
  def decoded(terms: Option[Seq[String]] = None): DataFrame = {
    val base = terms.fold(index)(ts => rowsFor(ts))
    base.select(col("term"), col("df"),
        explode(decodeCol(col("postings"))).as("p"))
      .select(col("term"), col("df"), col("p.doc_id").as("doc_id"),
        col("p.tf").as("tf"), col("p.len").as("len"))
  }

  private def scoreDecoded(decodedRows: DataFrame, k: Int): DataFrame =
    decodedRows
      .withColumn("w", BM25.weight(avgdl, nDocs))
      .groupBy("doc_id")
      .agg(round(sum(col("w")), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)

  /** Exhaustive top-k over the compressed index. */
  def searchTopK(terms: Seq[String], k: Int = 10): DataFrame =
    scoreDecoded(decoded(Some(terms)), k)

  /** Batch multi-query search — the offline query-replay / relevance-eval
    * shape: score N queries in ONE index scan. The (qid, term) queries
    * table is broadcast into the decoded postings (a single
    * `In(term, ∪ terms)` parquet scan, so term-range file pruning is paid
    * once for the whole batch), scores aggregate per (qid, doc_id) with
    * map-side partial aggregation, and per-query top-k comes from one
    * window pass over qid partitions. At scale this replaces Q sequential
    * index scans with one: shuffle volume is Σ per-query scored postings
    * and the scan/decode cost is shared. Rank-identical per qid to
    * [[searchTopK]] (asserted in spec and by the DuckDB oracle). */
  def searchMany(queries: Seq[(Long, Seq[String])], k: Int = 10): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    // distinct: a term duplicated within one query's list must score once,
    // exactly like searchTopK's isin filter (a duplicate (qid, term) pair
    // would join every posting twice and double that term's weight)
    val pairs = queries.flatMap { case (qid, ts) => ts.map(qid -> _) }.distinct
    require(pairs.nonEmpty, "searchMany needs at least one (qid, term)")
    val qdf = pairs.toDF("qid", "term")
    val allTerms = pairs.map(_._2).distinct
    val perQ = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score").desc, col("doc_id").asc)
    decoded(Some(allTerms))
      .join(broadcast(qdf), Seq("term"))
      .withColumn("w", BM25.weight(avgdl, nDocs))
      .groupBy("qid", "doc_id")
      .agg(round(sum(col("w")), 4).as("score"))
      .withColumn("rn", row_number().over(perQ))
      .filter(col("rn") <= k)
      .select("qid", "doc_id", "score")
      .orderBy(col("qid").asc, col("score").desc, col("doc_id").asc)
  }

  /** Per-row bit mask assigning bit i to the i-th distinct term — the
    * single-phase replacement for countDistinct(term): bit_count(bit_or) ==
    * n is exactly "all n distinct terms present" without the two-exchange
    * plan Spark gives countDistinct (partial distinct agg keyed (doc_id,
    * term), then a second exchange keyed doc_id). Query term lists are tiny,
    * so the when-chain is a few comparisons per row. */
  private def termMaskCol(dts: Seq[String]): org.apache.spark.sql.Column =
    dts.tail.zipWithIndex.foldLeft(
      when(col("term") === dts.head, lit(1L))) { case (acc, (t, i)) =>
        acc.when(col("term") === t, lit(1L << (i + 1)))
    }.otherwise(lit(0L))

  /** E5 conjunctive candidates from the index alone (docs containing ALL
    * terms), mirroring SearchEngine.candidatesAll over decoded postings.
    * ONE single-phase aggregation (bit_or of per-term bits + popcount — the
    * same trick adjacencyCandidates uses) instead of countDistinct's
    * two-exchange plan: halves the exchanges of every phrase/bool candidate
    * pass. Duplicate terms in `terms` make the filter unsatisfiable in both
    * formulations (countDistinct ≤ distinct < length ⇔ popcount ≤ distinct
    * < length). Falls back to countDistinct past 63 distinct terms. */
  def candidatesAll(terms: Seq[String]): DataFrame =
    if (terms.isEmpty) index.sparkSession.range(0).select(col("id").as("doc_id"))
    else if (terms.distinct.length > 63)
      decoded(Some(terms)).groupBy("doc_id")
        .agg(countDistinct(col("term")).as("nt"))
        .filter(col("nt") === terms.length).select("doc_id")
    else decoded(Some(terms)).groupBy("doc_id")
      .agg(bit_or(termMaskCol(terms.distinct)).as("tm"))
      .filter(bit_count(col("tm")) === terms.length).select("doc_id")

  /** Decoded occurrence view (term, doc_id, pos) over the whole index (or a
    * term subset) — the positions encode∘decode = id roundtrip surface. */
  def occurrencesAll(terms: Option[Seq[String]] = None): DataFrame =
    occurrences(terms.fold(index)(ts => rowsFor(ts)))

  /** Occurrence rows (term, doc_id, pos) decoded from index chunk rows —
    * postings + the parallel positions column, fused decode (codegen'd). */
  private def occurrences(chunkRows: DataFrame): DataFrame =
    chunkRows.select(col("term"),
        explode(graft.functions.GraftFunctions.decodePositions(
          col("postings"), col("positions"))).as("o"))
      .select(col("term"), col("o.doc_id").as("doc_id"), col("o.pos").as("pos"))

  /** Positional adjacency pre-filter for the phrase path — a SOUND superset
    * of the raw-substring match (never drops a true match), used only to
    * shrink the candidate set before the authoritative substring verify.
    *
    * Soundness: if `asciiLower(content)` contains the phrase substring, the
    * phrase's internal separators are non-alphanumeric, so content token
    * boundaries align with them inside the matched span. The span therefore
    * covers consecutive content tokens w₀ t₂ … tₙ₋₁ wₙ where w₀ ENDS WITH t₁
    * (the match may start mid-token: "rehash join" contains "hash join") and
    * wₙ STARTS WITH tₙ ("hash joins"), middle tokens exact. The boundary
    * slots are expanded from the index's term dictionary (a term-column-only
    * scan — tiny next to candidate content); if the expansion exceeds
    * [[CompressedSearchEngine.MaxExpandTerms]], returns None and the caller
    * keeps the plain candidate set (both plans are exact — this is a
    * cost-based choice between them).
    *
    * Evaluation is one union of the slots' occurrence rows, semi-joined down
    * to the conjunctive candidate set `cand0` BEFORE the aggregation (for
    * common code tokens the corpus-wide occurrence stream dwarfs the
    * candidates — round 3 measured the unjoined plan superlinear, 16→106→256 s
    * across a 1.2/4.8/9.6M ladder, pure shuffle spill of occurrences the
    * candidates never needed), normalized to the would-be match start
    * (pos − slot), then the same count-distinct reduction as candidatesAll on
    * (doc_id, start): shuffle volume is candidates × query-term occurrences,
    * never candidate content and never corpus-wide occurrences. Since every
    * surviving doc is already in `cand0`, the result needs no further
    * intersection with it. */
  def adjacencyCandidates(phraseToks: Seq[String],
                          cand0: DataFrame): Option[DataFrame] = {
    val n = phraseToks.length
    if (n < 2) return None // single token: candidatesAll already exact-narrow
    val t1 = phraseToks.head
    val tn = phraseToks.last
    val max = CompressedSearchEngine.MaxExpandTerms
    val exp = termDict
      .filter(endswith(col("term"), lit(t1)) || startswith(col("term"), lit(tn)))
      .limit(max + 1)
      .collect().map(_.getString(0))
    if (exp.length > max) return None
    val s1 = (t1 +: exp.filter(_.endsWith(t1)).toSeq).distinct
    val sn = (tn +: exp.filter(_.startsWith(tn)).toSeq).distinct
    val slots: Seq[Seq[String]] =
      s1 +: phraseToks.slice(1, n - 1).map(Seq(_)) :+ sn
    // POSTING-granular slot streams (doc_id, ps, slot): the candidate semi
    // join below probes one row per posting instead of one per occurrence —
    // on a high-tf code corpus (content ×8 ⇒ tf ≥ 8 for every present
    // term) that is ≥8× fewer union rows and join probes; positions explode
    // to occurrence rows only AFTER the narrowing, where the (doc_id,
    // start) aggregation needs them.
    val slotDfs = slots.zipWithIndex.map { case (ts, i) =>
      rowsFor(ts).select(
          explode(graft.functions.GraftFunctions.decodeDocPositions(
            col("postings"), col("positions"))).as("e"))
        .select(col("e.doc_id").as("doc_id"), col("e.ps").as("ps"),
          lit(i).as("slot"))
    }
    // candidate narrowing before the doc-grouped check — AQE turns this into
    // a broadcast semi join when cand0 is small, so the posting stream is
    // filtered map-side and only candidate postings reach the shuffle
    val narrowed = slotDfs.reduce(_ unionByName _)
      .join(cand0, Seq("doc_id"), "left_semi")
    // Doc-grouped adjacency check instead of the (doc_id, start)
    // aggregation: exploding to occurrence rows and bit_or-masking starts
    // built a hash aggregate over ~one key per OCCURRENCE (measured at the
    // 480k bench corpus: 11.8M (doc,start) keys, 2.9 s of the 3.8 s
    // adjacency cost — noop-isolated, tools/PosProfile). Here the
    // POSTING-level rows (doc_id, positions array, slot) shuffle once on
    // doc_id — packed primitive arrays, ~tf× fewer rows and bytes — and a
    // streaming per-doc n-way sorted intersection over slot-normalized
    // positions answers "∃ start: every slot occupied" with early exit and
    // zero per-occurrence keys. Explicit partition count (REPARTITION_BY_NUM,
    // exempt from AQE size coalescing): the check is CPU-per-posting bound
    // while its shuffle bytes are tiny — the same trap as the build's
    // encode stage. Works for any slot count (no 63-slot mask cap).
    val spark = index.sparkSession
    import spark.implicits._
    val matched = narrowed
      .select(col("doc_id"), col("slot"), col("ps"))
      .repartition(spark.sessionState.conf.numShufflePartitions, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .as[(Long, Int, Array[Int])]
      .mapPartitions(rows =>
        CompressedSearchEngine.adjacentDocs(rows, n))
      .toDF("doc_id")
    // no .distinct(): every consumer is a left_semi probe or a flag groupBy,
    // both of which tolerate (and dedup) repeated doc_ids (and this path
    // already emits each matching doc once)
    Some(matched)
  }

  /** P4 phrase candidates: conjunctive tokens, optionally narrowed by the
    * positional adjacency pre-filter, verified by the raw substring filter
    * over the corpus (`dbManager.java:324-341` semantics — the verify is
    * authoritative; adjacency only prunes, so both plans are exact).
    *
    * Cost-based plan choice (same crossover logic as the MaxScore gate):
    * below [[CompressedSearchEngine.PhraseGateDocs]] docs the substring
    * verify over the conjunctive candidates is a bounded content scan and
    * the adjacency pass's extra shuffle stages cost more than they save
    * (measured: 0.7 s vs 2.4 s per phrase at 6·10^4 docs); above it the
    * candidate content scan grows with the corpus (the one scale-killer of
    * the round-1 query path) while adjacency shuffles only query-term
    * postings. The adjacency step applies only under the "simple" analyzer,
    * whose token positions align with content substrings (the code
    * analyzer's subtoken expansion breaks alignment). */
  def phraseCandidates(phrase: String, files: DataFrame,
                       analyzer: String = "simple",
                       forcePositional: Boolean = false): DataFrame = {
    graft.functions.GraftFunctions.register(files.sparkSession)
    // AsciiContains folds [A-Z] on the fly during the byte search — the
    // verify scan no longer allocates a lowered copy of every candidate's
    // content (guide §4: one fused primitive loop per row)
    files.join(phraseCandSet(phrase, analyzer, forcePositional),
        Seq("doc_id"), "left_semi")
      .filter(graft.functions.GraftFunctions.asciiContains(col("content"),
        lit(graft.functions.AsciiLower.lowerString(phrase))))
      .select("doc_id")
  }

  /** The PRE-verify candidate set of a phrase (index-only — conjunctive
    * tokens, optionally narrowed by the positional adjacency pre-filter).
    * Factored out of [[phraseCandidates]] so the boolean path can combine
    * two phrases' candidate sets and verify both in ONE corpus scan. */
  private def phraseCandSet(phrase: String, analyzer: String,
                            forcePositional: Boolean): DataFrame = {
    val ordered = graft.analyze.Analyzer.queryTokens(analyzer, phrase)
    val cand0 = candidatesAll(ordered.distinct)
    val usePositional = analyzer == "simple" &&
      (forcePositional || nDocs >= CompressedSearchEngine.PhraseGateDocs)
    if (usePositional) adjacencyCandidates(ordered, cand0).getOrElse(cand0)
    else cand0
  }

  private def scoreCand(terms: Seq[String], cand: Option[DataFrame], k: Int): DataFrame = {
    val base = decoded(Some(terms))
    val rows = cand.fold(base)(c => base.join(c, Seq("doc_id"), "left_semi"))
    scoreDecoded(rows, k)
  }

  /** Full query lifecycle over the persisted index + corpus (serving path):
    * parse → candidates → BM25 → top-k, mirroring SearchEngine.search.
    * `forcePositional` forces the adjacency pre-filter below the phrase
    * gate (tests/bench exercise both exact plans). */
  def search(raw: String, files: DataFrame, k: Int = 10,
             analyzer: String = "simple",
             forcePositional: Boolean = false): DataFrame = {
    def toks(s: String) = graft.analyze.Analyzer.queryTokens(analyzer, s).distinct
    def phr(p: String) = phraseCandidates(p, files, analyzer, forcePositional)
    QueryParser.parse(raw) match {
      case Tokens(text) => scoreCand(toks(text), None, k)
      case Phrase(p)    => scoreCand(toks(p), Some(phr(p)), k)
      case Bool(op, p1, p2) =>
        // ONE shared corpus scan for both phrases' substring verifies (the
        // naive per-phrase phraseCandidates plan scans `files` content
        // twice — round 3 measured bool_or at 2× phrase from that), and —
        // non-positional path — ONE shared INDEX scan for both phrases'
        // conjunctive candidate sets: the union of both phrases' tokens is
        // decoded once and a single bit_or mask aggregation yields both
        // memberships ("does this doc hold all of phrase i's tokens" = mask
        // covers the phrase's bits), replacing two decode+agg subtrees plus
        // the union/outer-join flag plumbing with one exchange. The
        // hydration set stays operator-narrowed: a doc outside s1 ∩ s2 can
        // never satisfy AND, and a NOT result is a subset of phrase 1's
        // matches — only OR genuinely needs the union. Membership flags
        // gate each contains so every side keeps its exact
        // candidates∩substring semantics (reference dbManager verify): a
        // doc outside a phrase's candidate set cannot match it even if the
        // raw substring happens to occur.
        val usePositional = analyzer == "simple" &&
          (forcePositional || nDocs >= CompressedSearchEngine.PhraseGateDocs)
        val ts1 = toks(p1)
        val ts2 = toks(p2)
        // (doc_id, in1, in2) int flags; rows only for docs in s1 ∪ s2
        val flagged: DataFrame =
          if (usePositional) {
            // adjacency pre-filter works per phrase — keep per-set plans
            val s1 = phraseCandSet(p1, analyzer, forcePositional)
            val s2 = phraseCandSet(p2, analyzer, forcePositional)
            s1.select(col("doc_id"), lit(1).as("in1"), lit(0).as("in2"))
              .unionByName(s2.select(col("doc_id"), lit(0).as("in1"), lit(1).as("in2")))
              .groupBy("doc_id")
              .agg(max(col("in1")).as("in1"), max(col("in2")).as("in2"))
          } else {
            val u = (ts1 ++ ts2).distinct
            if (u.isEmpty || u.length > 63)
              // no tokens (empty sets) or a >63-term union: per-set fallback
              candidatesAll(ts1).select(col("doc_id"), lit(1).as("in1"), lit(0).as("in2"))
                .unionByName(candidatesAll(ts2)
                  .select(col("doc_id"), lit(0).as("in1"), lit(1).as("in2")))
                .groupBy("doc_id")
                .agg(max(col("in1")).as("in1"), max(col("in2")).as("in2"))
            else {
              val bit = u.zipWithIndex.map { case (t, i) => t -> (1L << i) }.toMap
              // empty phrase ⇒ empty candidate set ⇒ never a member
              val m1 = if (ts1.isEmpty) -1L else ts1.map(bit).reduce(_ | _)
              val m2 = if (ts2.isEmpty) -1L else ts2.map(bit).reduce(_ | _)
              def memberOf(m: Long) =
                if (m == -1L) lit(0)
                else when(col("tm").bitwiseAND(lit(m)) === m, 1).otherwise(0)
              decoded(Some(u)).groupBy("doc_id")
                .agg(bit_or(termMaskCol(u)).as("tm"))
                .select(col("doc_id"), memberOf(m1).as("in1"), memberOf(m2).as("in2"))
                .filter(col("in1") === 1 || col("in2") === 1)
            }
          }
        def lowered(p: String) = lit(graft.functions.AsciiLower.lowerString(p))
        // zero-allocation case-folding byte search (graft.functions
        // .AsciiContains) — no lowered content copy per candidate row
        val c1 = graft.functions.GraftFunctions.asciiContains(col("content"), lowered(p1))
        val c2 = graft.functions.GraftFunctions.asciiContains(col("content"), lowered(p2))
        val cand = op match {
          case "and" =>
            files.join(flagged.filter(col("in1") === 1 && col("in2") === 1)
                .select("doc_id"), Seq("doc_id"), "left_semi")
              .filter(c1 && c2)
              .select("doc_id")
          case "not" =>
            // a doc in s1 but outside s2 passes regardless of its content
            // (phrase 2 cannot match without its conjunctive candidates)
            files.join(flagged.filter(col("in1") === 1)
                .select(col("doc_id"), col("in2")), Seq("doc_id"))
              .filter(c1 && !(col("in2") === 1 && c2))
              .select("doc_id")
          case "or" =>
            files.join(flagged, Seq("doc_id"))
              .filter((col("in1") === 1 && c1) || (col("in2") === 1 && c2))
              .select("doc_id")
        }
        val terms = if (op == "not") ts1 else (ts1 ++ ts2).distinct
        scoreCand(terms, Some(cand), k)
    }
  }

  /** O2: paginated serving — reference semantics
    * (`QueryProcessor/QueryProcessor.java:131-139`): 1-based page,
    * fromIndex = (page-1)·limit, pages past the end are empty. */
  def searchPage(raw: String, files: DataFrame, page: Int, limit: Int,
                 analyzer: String = "simple"): DataFrame = {
    require(page >= 1 && limit >= 1, s"page/limit must be >= 1: $page/$limit")
    search(raw, files, page * limit, analyzer).offset((page - 1) * limit)
  }

  /** MaxScore + block-max-WAND pruned top-k — rank-identical to
    * [[searchTopK]].
    *
    * Three Spark jobs total (meta collect, θ pass, pruned rescore): the
    * candidate docId range comes from the essential terms' chunk metadata
    * gathered in the first collect (a superset of the exact candidate
    * min/max), not a separate action, and the query terms' index rows are
    * persisted across the passes so the index parquet is scanned once.
    *
    * Pruning acts at three granularities:
    *  - term (MaxScore): non-essential terms never generate candidates,
    *  - chunk: rescore skips chunks outside the candidates' doc range,
    *  - block (block-max WAND, north rule): candidate generation decodes a
    *    128-posting block of term t only if its best possible total score
    *    `idf_t · max_weight(B) + Σ_{t'≠t} ub(t')` reaches θ — a doc whose
    *    every appearance lies in pruned blocks is bounded below θ by the
    *    same inequality, so skipping is lossless; the rescore decodes only
    *    blocks intersecting [lo, hi] (max_weight bound 0 there: every
    *    contribution of a surviving candidate must count).
    *
    * Adaptive gate: below [[CompressedSearchEngine.PruneGateDocs]] docs the
    * decode work a prune could save is smaller than the two extra adaptive
    * round-trips it costs (measured: 3-job pruning loses to the single
    * exhaustive job up to at least 10^6 docs), so small corpora take the
    * exhaustive path unless `force` is set (tests/bench exercise the
    * machinery with force=true). */
  def searchPruned(terms: Seq[String], k: Int = 10,
                   force: Boolean = false): DataFrame = {
    if (terms.isEmpty) return searchTopK(terms, k)
    if (!force && nDocs < CompressedSearchEngine.PruneGateDocs)
      return searchTopK(terms, k)
    // project the positions column away BEFORE caching: scoring never reads
    // it, and for common terms it dwarfs the postings stream (≈ tf varbyte
    // positions per posting vs ~5 bytes of posting) — persisting it would
    // make the cache materialization the dominant cost of the whole query
    val rows = rowsFor(terms).select(col("term"), col("df"),
      col("first_doc_id"), col("last_doc_id"), col("max_weight"),
      col("blocks"), col("postings")).persist()
    try {
      // (1) per-term metadata: df, max block weight, chunk docId range.
      val meta = rows.groupBy("term")
        .agg(first(col("df")).as("df"), max(col("max_weight")).as("mw"),
          min(col("first_doc_id")).as("lo"), max(col("last_doc_id")).as("hi"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getLong(3), r.getLong(4)))
      if (meta.isEmpty) return searchTopK(terms, k)
      val idf = meta.map { case (t, df, _, _, _) =>
        t -> BM25.idfValue(nDocs, df)
      }.toMap
      val ub = meta.map { case (t, _, mw, _, _) => t -> (idf(t) * mw) }.toMap
      // (2) θ: k-th exact score of the rarest term (a lower bound on the
      // final k-th score), minus a safety margin for the display rounding.
      val rarest = meta.minBy(_._2)._1
      val kth = scoreDecoded(decodedFrom(
        rows.filter(col("term") === rarest)), k).collect()
      if (kth.length < k)
        return scoreDecoded(decodedFrom(rows), k) // θ = 0: nothing prunable
      val theta = kth.last.getDouble(1) - 1e-3
      // (3) essential terms: ascending by ub, drop the maximal prefix whose
      // cumulative ub stays strictly below θ — docs appearing ONLY in that
      // prefix provably cannot reach the top-k.
      val asc = meta.map(_._1).sortBy(ub)
      val cum = asc.scanLeft(0.0)((s, t) => s + ub(t)).tail
      val essential = asc.zip(cum).collect { case (t, c) if c >= theta => t }
      val essTerms = if (essential.isEmpty) Seq(asc.last) else essential.toSeq
      val essSet = essTerms.toSet
      // candidate docId range from essential chunk metadata (no extra job)
      val lo = meta.collect { case (t, _, _, l, _) if essSet(t) => l }.min
      val hi = meta.collect { case (t, _, _, _, h) if essSet(t) => h }.max
      // (4) candidates: docs in at least one essential term's SURVIVING
      // blocks (block-max WAND bound τ_t below); rescore them over all
      // terms, decoding only blocks that intersect [lo, hi]. When τ_t ≤ 0
      // for EVERY essential term, no block is prunable (max_weight ≥ 0
      // always passes), so the candidate set would be every essential-term
      // doc and the semi join a provable no-op — skip the whole pass (two
      // stages + a join + its codegen) and let the rescore's [lo, hi] chunk
      // and block range bounds do the narrowing. Dropping the candidate
      // join is always rank-safe: it only removes docs whose total score is
      // bounded below θ, which can never displace the true top-k.
      val ubSum = ub.values.sum
      def tau(t: String): Double = (theta - (ubSum - ub(t))) / idf(t)
      val rescore = decodedBlocksFrom(
        rows.filter(col("last_doc_id") >= lo && col("first_doc_id") <= hi),
        lit(lo), lit(hi), lit(0.0))
      val useCandidates = !essTerms.forall(tau(_) <= 0.0)
      lastPrunedUsedCandidates = Some(useCandidates)
      val decodedRows =
        if (!useCandidates) rescore
        else {
          val minwCand = essTerms.tail
            .foldLeft(when(col("term") === essTerms.head, lit(tau(essTerms.head)))) {
              (acc, t) => acc.when(col("term") === t, lit(tau(t)))
            }.otherwise(lit(0.0))
          val cand = decodedBlocksFrom(rows.filter(col("term").isin(essTerms: _*)),
              lit(Long.MinValue), lit(Long.MaxValue), minwCand)
            .select("doc_id").distinct()
          rescore.join(cand, Seq("doc_id"), "left_semi")
        }
      scoreDecoded(decodedRows, k)
    } finally rows.unpersist()
  }

  /** (term, df, doc_id, tf, len) rows decoded from index chunk rows. */
  private def decodedFrom(chunkRows: DataFrame): DataFrame =
    chunkRows.select(col("term"), col("df"),
        explode(decodeCol(col("postings"))).as("p"))
      .select(col("term"), col("df"), col("p.doc_id").as("doc_id"),
        col("p.tf").as("tf"), col("p.len").as("len"))

  /** Block-selective variant of [[decodedFrom]]: decodes only blocks whose
    * doc range intersects [lo, hi] and whose max_weight ≥ minw (the block-max
    * skip-pointer read path, graft.functions.DecodePostingsBlocks). */
  private def decodedBlocksFrom(chunkRows: DataFrame, lo: org.apache.spark.sql.Column,
                                hi: org.apache.spark.sql.Column,
                                minw: org.apache.spark.sql.Column): DataFrame = {
    graft.functions.GraftFunctions.register(chunkRows.sparkSession)
    chunkRows.select(col("term"), col("df"),
        explode(graft.functions.GraftFunctions.decodeBlocks(
          col("postings"), col("blocks"), lo, hi, minw)).as("p"))
      .select(col("term"), col("df"), col("p.doc_id").as("doc_id"),
        col("p.tf").as("tf"), col("p.len").as("len"))
  }
}

object CompressedSearchEngine {

  /** Streaming per-document adjacency check over doc_id-sorted posting rows
    * `(doc_id, slot, positions)`: emits each doc_id for which some start
    * position has EVERY slot i occupied at start + i — i.e. the n-way
    * sorted intersection of the slot-normalized (pos − slot) position sets
    * is non-empty (early exit on first witness). One document's arrays are
    * live at a time; input order within a document is irrelevant. */
  private[search] def adjacentDocs(rows: Iterator[(Long, Int, Array[Int])],
                                   n: Int): Iterator[Long] = new Iterator[Long] {
    private var pending: (Long, Int, Array[Int]) = null
    private var nextDoc = 0L
    private var hasNextDoc = false

    private def docMatches(perSlot: Array[scala.collection.mutable.ArrayBuffer[Array[Int]]]): Boolean = {
      val norm = new Array[Array[Int]](n)
      var i = 0
      while (i < n) {
        val bufs = perSlot(i)
        if (bufs == null) return false // a slot with no occurrences
        var tot = 0
        bufs.foreach(tot += _.length)
        val a = new Array[Int](tot)
        var o = 0
        bufs.foreach { b =>
          var j = 0
          while (j < b.length) { a(o) = b(j) - i; o += 1; j += 1 }
        }
        if (a.isEmpty) return false
        java.util.Arrays.sort(a)
        norm(i) = a
        i += 1
      }
      // n-way sorted intersection, pointers advance to the running max
      val ptr = new Array[Int](n)
      var target = norm(0)(0)
      var agree = 0 // how many consecutive arrays currently sit on target
      var k = 0
      while (true) {
        val a = norm(k)
        var p = ptr(k)
        while (p < a.length && a(p) < target) p += 1
        if (p == a.length) return false
        ptr(k) = p
        if (a(p) == target) {
          agree += 1
          if (agree == n) return true
        } else { // a(p) > target: restart agreement from this array
          target = a(p)
          agree = 1
        }
        k = (k + 1) % n
      }
      false // unreachable
    }

    private def advance(): Unit = {
      hasNextDoc = false
      while (!hasNextDoc && (pending != null || rows.hasNext)) {
        var cur = if (pending != null) pending else rows.next()
        pending = null
        val doc = cur._1
        val perSlot = new Array[scala.collection.mutable.ArrayBuffer[Array[Int]]](n)
        var done = false
        while (!done) {
          val slot = cur._2
          if (perSlot(slot) == null)
            perSlot(slot) = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
          perSlot(slot) += cur._3
          if (rows.hasNext) {
            val nx = rows.next()
            if (nx._1 == doc) cur = nx
            else { pending = nx; done = true }
          } else done = true
        }
        if (docMatches(perSlot)) { nextDoc = doc; hasNextDoc = true }
      }
    }

    advance()
    def hasNext: Boolean = hasNextDoc
    def next(): Long = { val d = nextDoc; advance(); d }
  }
  /** Corpus size above which adaptive MaxScore pruning pays for its extra
    * driver round-trips (see [[CompressedSearchEngine.searchPruned]]).
    *
    * MEASURED at the design point (GateBench, 32 cores, 3-term query,
    * median of 3): exhaustive vs forced-pruned was 0.73 s/1.42 s at 1.2M
    * docs, 2.66/4.57 at 4.8M, 6.36/8.90 at 9.6M — the ratio narrows
    * 1.95× → 1.72× → 1.40× as the decode work the prune saves grows
    * against its fixed 3-round-trip cost; extrapolating the trend the
    * crossover sits around 5·10^7–10^8 docs, so the default gate is 64M
    * (the round-2 10M default was an unmeasured extrapolation). */
  val PruneGateDocs: Long =
    sys.env.get("SPARK_GRAFT_PRUNE_GATE").map(_.toLong).getOrElse(64_000_000L)

  /** Dictionary-expansion cap for the phrase adjacency pre-filter: if a
    * boundary token expands to more terms than this (e.g. a one-letter
    * token), the pre-filter is skipped and the plain candidate-set plan runs
    * (both plans are exact). */
  val MaxExpandTerms: Int =
    sys.env.get("SPARK_GRAFT_MAX_EXPAND").map(_.toInt).getOrElse(1000)

  /** Corpus size above which the phrase path switches from the
    * substring-scan-over-candidates plan to the positional adjacency
    * pre-filter (see [[CompressedSearchEngine.phraseCandidates]]).
    *
    * MEASURED (GateBench ladder, 32 cores; re-run in round 4 after the
    * candidate semi-join fix in [[adjacencyCandidates]]): substring
    * 3.17 / 4.84 / 9.70 s at 1.2M / 4.8M / 9.6M docs vs positional
    * 13.8 / 71.2 / 121.3 s (r3 pre-fix: 16.4 / 106 / 256 — the fix removed
    * the shuffle-spill cliff, 2.1× at 9.6M, and the top step is sub-linear
    * now). The substring verify scans candidate CONTENT at memchr speed
    * while the adjacency pass shuffles the candidate docs' per-OCCURRENCE
    * rows of the query/slot terms — on a high-tf code corpus the
    * conjunctive candidates hold most of their query terms' occurrences,
    * so the gap (4.4–14.7×) is structural, not a plan bug. No crossover on
    * this corpus shape: the default stays the substring plan at every size
    * (gate = ∞). The positional plan remains available (forcePositional /
    * this env knob) for corpora where content is large relative to
    * query-term postings — long documents, rare phrase tokens — which the
    * replicated code corpus cannot represent. See GATES.md. */
  val PhraseGateDocs: Long =
    sys.env.get("SPARK_GRAFT_PHRASE_GATE").map(_.toLong).getOrElse(Long.MaxValue)
}
