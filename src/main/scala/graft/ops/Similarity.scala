package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings(vec_id, embedding: array<float>,
  * label)` table: brute-force cosine top-k as the correctness baseline and an
  * LSH-bucketed variant as the scale path.
  *
  * Cosine is computed with explicit double casts and a sequential
  * higher-order-function fold (`aggregate`/`zip_with`) so the arithmetic is
  * deterministic and mirrors the oracle's; display values round to 4
  * decimals.
  *
  * Scale notes: brute force is a broadcast of the query vector + one narrow
  * pass and a top-k (`TakeOrderedAndProject`) — no shuffle; the LSH variant
  * prunes the scan to one bucket (at scale: a bucket-partitioned table →
  * partition pruning).
  */
object Similarity {

  /** dot(a, b) over float arrays as exact double folds (kept as the
    * HOF reference formulation; [[cosine]] uses the fused codegen'd
    * expression with identical arithmetic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine as ONE fused codegen'd primitive loop
    * (graft.functions.CosineSim). The previous `aggregate`/`zip_with`
    * composition is a Spark higher-order function — CodegenFallback, i.e.
    * an interpreted expression-tree walk per array element, three folds per
    * row. The fused loop keeps the exact sequential left-fold double
    * arithmetic (same association order), so results are bit-identical
    * (property-asserted in VectorExprSpec against the HOF formulation). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosineSim(a, b)

  /** Brute-force cosine top-k against the vector of `queryVecId`. */
  def annBruteForce(embeddings: DataFrame, queryVecId: Long, k: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val q = embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qv"))
    embeddings.crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("qv")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Threshold kNN (reference `Backend/ImageSearchService.java:100-149`):
    * top-k nearest by cosine, then drop results at or below `minCos` — the
    * reference's stored-image search applies exactly this cutoff (> 0.3 at
    * `:136`) AFTER its kNN. Same plan as [[annBruteForce]] (scalar broadcast
    * + TakeOrderedAndProject) plus one post-limit filter. */
  def annThreshold(embeddings: DataFrame, queryVecId: Long, k: Int = 10,
                   minCos: Double = 0.3): DataFrame =
    annBruteForce(embeddings, queryVecId, k).filter(col("cos") > minCos)
      .orderBy(col("cos").desc, col("vec_id").asc)

  /** All nBits-bit masks of Hamming weight ≤ radius — the multi-probe ring.
    * Bounded: the enumeration is 2^nBits, and at nBits ≥ 63 the shift wraps
    * (1L << 64 == 1) and would silently return a wrong near-empty ring —
    * fail loudly instead (ADVICE r4). Rings that wide are never right: use
    * more buckets + a small radius. */
  def probeMasks(nBits: Int, radius: Int): Seq[Long] = {
    require(nBits > 0 && nBits <= 24,
      s"probeMasks enumerates 2^nBits masks; nBits=$nBits is infeasible/overflows")
    (0L until (1L << nBits)).filter(java.lang.Long.bitCount(_) <= radius)
  }

  /** LSH-bucketed ANN, multi-probe: score vectors in every bucket within
    * Hamming distance `radius` of the query's sign bucket. Single-probe
    * (radius 0) trades too much recall for pruning — a near-neighbor
    * straddling a hyperplane lands bits away (round 3 measured recall@10 =
    * 0.2 on the fixture). The recall/scan trade is MEASURED, not assumed:
    * a neighbor at cosine c agrees with each sign bit w.p. 1 − acos(c)/π,
    * so on the driver's isotropic fixture (max pairwise cosine 0.48 — no
    * near-dup structure; "neighbors" are noise at cos ≈ 0.3, expected
    * Hamming ≈ 3 of 8) recall ≥ 0.9 needs radius 4 (the recorded default;
    * Bench records recall@10 and the probe fraction). On a clustered real
    * embedding corpus (near-dups at cos ≥ 0.9 ⇒ per-bit agreement ≥ 0.92)
    * radius 1 already recalls ≥ ~0.95 — tune radius/nBits to the corpus.
    * The probe ring is exploded on the tiny query side and the scan is an
    * equi-join on the bucket key, so at scale a bucket-partitioned table
    * prunes to the probed partitions — never a corpus scan, never a
    * non-equi join. */
  def annLsh(embeddings: DataFrame, queryVecId: Long, k: Int = 10,
             nBits: Int = 8, radius: Int = AnnProbeRadius): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val withBucket = embeddings
      .withColumn("bucket", signBucketExpr(nBits))
    val probeList = array(probeMasks(nBits, radius).map(m =>
      col("bucket").bitwiseXOR(lit(m))): _*)
    val q = withBucket.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qv"), explode(probeList).as("bucket"))
    withBucket.join(broadcast(q), Seq("bucket"))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("qv")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** IVF-style ANN — the other classic scale path next to [[annLsh]]:
    * a tiny coarse-quantizer codebook partitions vectors into cells, and a
    * query scans only its `nProbe` closest cells. The codebook here is the
    * first `nCentroids` vectors (deterministic seed centroids — a stand-in
    * for a k-means job at scale; the PLAN SHAPE is what matters and is
    * identical: broadcast the codebook, assign map-side, prune the scan to
    * probed cells). Cell assignment is the argmax of the 4-decimal-rounded
    * cosine (ties to the smaller cent_id) so the oracle's window-function
    * argmax agrees bit-for-bit — raw-double argmax would let a last-ulp
    * summation difference flip a near-tie.
    *
    * Scale notes: the codebook and the probed-cell list are bounded
    * metadata (`nCentroids` rows — like the query-term meta collects in the
    * search path); assignment is a pure narrow expression (zero shuffles
    * end-to-end: scan → filter(cell) → TakeOrderedAndProject). At 100 TB
    * the cell is a partition column written at ingest, so probing prunes
    * to nProbe/nCentroids of the files before any task launches.
    *
    * Measured on the driver's embeddings fixture (sf0.01, 500 isotropic
    * vectors, query vec_id 0): recall@10 vs brute force = 1.0 at the
    * default nProbe 4 / nCentroids 16 — a 4× scan cut at full recall;
    * the defaults are a measured point, not a guess. */
  def annIvf(embeddings: DataFrame, queryVecId: Long, k: Int = 10,
             nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCentroids,
      s"nProbe=$nProbe must be in [1, nCentroids=$nCentroids]")
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    // bounded metadata in ONE pushed-down point read (≤ nCentroids + 1
    // rows): codebook and query vector share a job — the second driver
    // round-trip was pure latency on the serving path; the probed-cell
    // choice is then pure driver arithmetic — no extra Spark job
    val meta = embeddings
      .filter(col("vec_id") < nCentroids || col("vec_id") === queryVecId)
      .select(col("vec_id"), col("embedding"))
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val codebook = meta.filter(_._1 < nCentroids)
      .map { case (id, v) => (id.toInt, v) }
    require(codebook.nonEmpty, "empty codebook: no vec_id < nCentroids")
    val qRows = meta.filter(_._1 == queryVecId).map(_._2)
    if (qRows.isEmpty) // unknown query id → empty result, like annBruteForce
      return embeddings.select(col("vec_id"), lit(0.0).as("cos")).limit(0)
    val qv = qRows(0)
    // same sequential left-fold double accumulation as the cosine Column
    // (aggregate over zip_with) and the same HALF_UP 4-decimal rounding, so
    // the driver-side probe choice is bit-identical to the distributed
    // computation the oracle mirrors
    def cosLocal(a: Seq[Float], b: Seq[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dp += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      BigDecimal(dp / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val probed = codebook.map { case (id, cv) => (id, cosLocal(cv, qv)) }
      .sortBy { case (id, c) => (-c, id) }.take(nProbe).map(_._1)
    // per-row argmax as one narrow expression: greatest over
    // struct(rounded cos, -cent_id) == (cos DESC, cent_id ASC) first row
    val scored = codebook.map { case (id, v) =>
      struct(
        round(cosine(col("embedding"), array(v.map(lit): _*)), 4).as("c"),
        lit(-id).as("n"))
    }
    val cellCol =
      -(if (scored.length == 1) scored.head else greatest(scored: _*))
        .getField("n")
    val qvCol = array(qv.map(lit): _*)
    embeddings.withColumn("cell", cellCol)
      .filter(col("cell").isin(probed.map(Int.box): _*))
      .select(col("vec_id"),
        round(cosine(col("embedding"), qvCol), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Default multi-probe radius: smallest radius with measured recall@10
    * ≥ 0.9 against brute force on the driver's embeddings fixture (see
    * [[annLsh]] — the fixture is isotropic, which forces a wide ring). */
  val AnnProbeRadius: Int =
    sys.env.get("SPARK_GRAFT_ANN_RADIUS").map(_.toInt).getOrElse(4)

  /** Axis-aligned sign LSH bucket over the `embedding` column: bit d =
    * (v[d+1] > 0), d ∈ [0, nBits). Exact on float inputs (no accumulation),
    * hence engine-identical. Fused codegen'd loop
    * (graft.functions.SignBucket) — the previous `aggregate`/`zip_with`/
    * `pow` HOF chain is CodegenFallback (interpreted per element); same
    * null/short-array semantics, asserted in VectorExprSpec. */
  def signBucketExpr(nBits: Int = 8): Column =
    graft.functions.GraftFunctions.signBucket(col("embedding"), nBits)

  /** Embedding-cosine near-dup: top-k most similar pairs among vectors
    * sharing a sign-LSH bucket. The pair generator is an equi-join on the
    * bucket key (shuffle hash/sort-merge — never a cartesian): candidate
    * fanout is Σ per-bucket-count², bounded by collision rates instead of
    * corpus size, and near-dup vectors (cosine → 1) agree on sign bits so
    * recall concentrates exactly where the operator looks. `nBits` tunes
    * the bucket count (raise it as the corpus grows). */
  def nearDupPairs(embeddings: DataFrame, k: Int = 20, nBits: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val e = embeddings.select(col("vec_id"), col("embedding"),
      signBucketExpr(nBits).as("bucket"))
    val a = e.select(col("bucket"), col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = e.select(col("bucket"), col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(b, Seq("bucket")).filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(cosine(col("ea"), col("eb")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_a").asc, col("vec_b").asc)
      .limit(k)
  }
}
