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

  /** dot(a, b) over float arrays as exact double folds. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k against the vector of `queryVecId`. */
  def annBruteForce(embeddings: DataFrame, queryVecId: Long, k: Int = 10): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qv"))
    embeddings.crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("qv")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** LSH-bucketed ANN: score only vectors in the query's sign bucket. */
  def annLsh(embeddings: DataFrame, queryVecId: Long, k: Int = 10,
             nBits: Int = 8): DataFrame = {
    val withBucket = embeddings
      .withColumn("bucket", signBucketExpr(nBits))
    val q = withBucket.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qv"), col("bucket"))
    withBucket.join(broadcast(q), Seq("bucket"))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("qv")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Axis-aligned sign LSH bucket over the `embedding` column: bit d =
    * (v[d+1] > 0), d ∈ [0, nBits). Exact on float inputs (no accumulation),
    * hence engine-identical. */
  def signBucketExpr(nBits: Int = 8): Column =
    expr(s"""aggregate(
       |  zip_with(slice(embedding, 1, $nBits), sequence(0, ${nBits - 1}),
       |    (x, i) -> IF(x > 0, CAST(pow(2, i) AS BIGINT), 0L)),
       |  0L, (acc, b) -> acc + b)""".stripMargin)

  /** Embedding-cosine near-dup: top-k most similar pairs among vectors
    * sharing a sign-LSH bucket. The pair generator is an equi-join on the
    * bucket key (shuffle hash/sort-merge — never a cartesian): candidate
    * fanout is Σ per-bucket-count², bounded by collision rates instead of
    * corpus size, and near-dup vectors (cosine → 1) agree on sign bits so
    * recall concentrates exactly where the operator looks. `nBits` tunes
    * the bucket count (raise it as the corpus grows). */
  def nearDupPairs(embeddings: DataFrame, k: Int = 20, nBits: Int = 8): DataFrame = {
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
