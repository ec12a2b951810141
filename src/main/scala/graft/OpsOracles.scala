package graft

/** DuckDB oracle SQL for the training-data pipeline operators
  * (graft.ops.*), mirroring each Spark op bit-for-bit (same md5-based hash
  * families, same integer arithmetic, doubles rounded to 4 decimals). */
object OpsOracles {

  /** words + 3-word shingles over documents (mirrors Dedup.wordsCol/shingles;
    * note DuckDB array subscripts are 1-based, Spark's 0-based — both yield
    * the same triples). */
  val wordsCtes: String =
    """w AS (
      |  SELECT doc_id, text,
      |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                     x -> x <> '') AS words
      |  FROM documents
      |),
      |sh AS (
      |  SELECT doc_id,
      |         unnest(list_transform(range(1, greatest(len(words) - 1, 1)),
      |           i -> concat_ws(' ', words[CAST(i AS INT)],
      |             words[CAST(i AS INT) + 1], words[CAST(i AS INT) + 2]))) AS shingle
      |  FROM w
      |)""".stripMargin

  val dedupExact: String =
    """SELECT md5(text) AS grp, min(doc_id) AS keeper, count(*) AS n_dups
      |FROM documents GROUP BY md5(text) ORDER BY grp""".stripMargin

  val minhashSigCtes: String =
    """msig AS (
      |  SELECT doc_id, h,
      |         min(md5(CAST(h AS VARCHAR) || '|' || shingle)) AS sig
      |  FROM (SELECT DISTINCT doc_id, shingle FROM sh) s, range(0, 16) r(h)
      |  GROUP BY doc_id, h
      |)""".stripMargin

  val minhashSig: String =
    s"""WITH $wordsCtes,
       |$minhashSigCtes
       |SELECT doc_id, CAST(h AS BIGINT) AS h, sig FROM msig
       |ORDER BY doc_id, h""".stripMargin

  /** Shared CTE chain ending in `pairs(doc_a, doc_b)` — the MinHash+LSH
    * candidate pairs (MATERIALIZED: the closure oracle references it 4×
    * and inlining would re-run the whole signature chain each time). */
  val minhashPairCtes: String =
    s"""$wordsCtes,
       |$minhashSigCtes,
       |bands AS (
       |  SELECT doc_id, CAST(h // 4 AS INT) AS band,
       |         md5(string_agg(lpad(CAST(h AS VARCHAR), 2, '0') || ':' || sig, '|'
       |             ORDER BY lpad(CAST(h AS VARCHAR), 2, '0') || ':' || sig)) AS bucket
       |  FROM msig GROUP BY doc_id, CAST(h // 4 AS INT)
       |),
       |pairs AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
       |)""".stripMargin

  val minhashPairs: String =
    s"""WITH $minhashPairCtes
       |SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b""".stripMargin

  /** Transitive closure of the pair graph (mirrors Dedup.clusters): the
    * recursive `walk` enumerates every (src, reachable) pair — fine at
    * oracle scale because near-dup components are near-cliques — and
    * comp(doc_id, cluster_id) takes the min reachable id (self-loops in
    * `e` make every member reach itself). */
  val componentCtes: String =
    s"""$minhashPairCtes,
       |e AS MATERIALIZED (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs
       |  UNION SELECT doc_a, doc_a FROM pairs
       |  UNION SELECT doc_b, doc_b FROM pairs
       |),
       |walk(src, dst) AS (
       |  SELECT src, dst FROM e
       |  UNION
       |  SELECT w.src, e2.dst FROM walk w JOIN e e2 ON w.dst = e2.src
       |),
       |comp AS (SELECT src AS doc_id, min(dst) AS cluster_id
       |         FROM walk GROUP BY src)""".stripMargin

  val dedupClusters: String =
    s"""WITH RECURSIVE $componentCtes
       |SELECT doc_id, cluster_id FROM comp ORDER BY doc_id""".stripMargin

  val dedupReps: String =
    s"""WITH RECURSIVE $componentCtes
       |SELECT d.doc_id FROM documents d
       |LEFT JOIN comp c ON d.doc_id = c.doc_id
       |WHERE c.doc_id IS NULL OR c.doc_id = c.cluster_id
       |ORDER BY d.doc_id""".stripMargin

  /** Mirrors Dedup.ngramJaccardTop with its default maxDf=100 cap active:
    * only shingles with df <= 100 generate candidate pairs; set sizes stay
    * uncapped (same as the Spark side). */
  val ngramJaccard: String =
    s"""WITH $wordsCtes,
       |dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM dsh GROUP BY doc_id),
       |rare AS (SELECT shingle FROM dsh GROUP BY shingle HAVING count(*) <= 100),
       |fsh AS (SELECT dsh.* FROM dsh JOIN rare USING (shingle)),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
       |  FROM fsh a JOIN fsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id
       |)
       |SELECT doc_a, doc_b,
       |       round(i / (sa.sz + sb.sz - i), 4) AS jaccard
       |FROM inter
       |JOIN sizes sa ON sa.doc_id = doc_a
       |JOIN sizes sb ON sb.doc_id = doc_b
       |ORDER BY jaccard DESC, doc_a ASC, doc_b ASC LIMIT 20""".stripMargin

  val simhash: String =
    s"""WITH $wordsCtes,
       |stf AS (
       |  SELECT doc_id, term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(words) AS term FROM w)
       |  GROUP BY doc_id, term
       |),
       |sbits AS (
       |  SELECT doc_id, j,
       |         sum(tf * CASE WHEN (strpos('0123456789abcdef',
       |               substr(md5(term), CAST(j + 1 AS INT), 1)) - 1) % 2 = 1
       |             THEN 1 ELSE -1 END) AS s
       |  FROM stf, range(0, 32) r(j) GROUP BY doc_id, j
       |)
       |SELECT doc_id,
       |       CAST(sum(CASE WHEN s > 0 THEN CAST(2 ** j AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
       |FROM sbits GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private def cosSums(a: String, b: String): String =
    s"""sum(CAST($a[CAST(i AS INT)] AS DOUBLE) * CAST($b[CAST(i AS INT)] AS DOUBLE)) AS dp,
       |    sum(CAST($a[CAST(i AS INT)] AS DOUBLE) ** 2) AS na,
       |    sum(CAST($b[CAST(i AS INT)] AS DOUBLE) ** 2) AS nb""".stripMargin

  /** dim = 64 in the driver's embeddings tables. */
  val annBrute: String =
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |d AS (
       |  SELECT e.vec_id,
       |    ${cosSums("e.embedding", "q.qv")}
       |  FROM embeddings e, q, range(1, 65) r(i) GROUP BY e.vec_id
       |)
       |SELECT vec_id, round(dp / (sqrt(na) * sqrt(nb)), 4) AS cos
       |FROM d ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin

  /** Threshold kNN: brute-force top-10, then the reference's cosine cutoff
    * (`Backend/ImageSearchService.java:136`, score > 0.3) applied AFTER the
    * kNN, on the 4-decimal display rounding both engines share. */
  val annThreshold: String =
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |d AS (
       |  SELECT e.vec_id,
       |    ${cosSums("e.embedding", "q.qv")}
       |  FROM embeddings e, q, range(1, 65) r(i) GROUP BY e.vec_id
       |),
       |topk AS (
       |  SELECT vec_id, round(dp / (sqrt(na) * sqrt(nb)), 4) AS cos
       |  FROM d ORDER BY cos DESC, vec_id ASC LIMIT 10)
       |SELECT vec_id, cos FROM topk WHERE cos > 0.3
       |ORDER BY cos DESC, vec_id ASC""".stripMargin

  private val bucketSql: String = (0 until 8)
    .map(d => s"(CASE WHEN embedding[${d + 1}] > 0 THEN ${1L << d} ELSE 0 END)")
    .mkString(" + ")

  /** Multi-probe (all buckets within the probe ring) == membership is
    * Hamming(bucket, qbucket) ≤ radius, expressed via xor + bit_count. */
  val annLsh: String = annLshAt(graft.ops.Similarity.AnnProbeRadius)

  def annLshAt(radius: Int): String =
    s"""WITH b AS (
       |  SELECT vec_id, embedding, CAST($bucketSql AS BIGINT) AS bucket
       |  FROM embeddings
       |),
       |q AS (SELECT embedding AS qv, bucket FROM b WHERE vec_id = 0),
       |d AS (
       |  SELECT e.vec_id,
       |    ${cosSums("e.embedding", "q.qv")}
       |  FROM b e JOIN q ON bit_count(xor(e.bucket, q.bucket)) <= $radius,
       |       range(1, 65) r(i)
       |  GROUP BY e.vec_id
       |)
       |SELECT vec_id, round(dp / (sqrt(na) * sqrt(nb)), 4) AS cos
       |FROM d ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin

  /** Mirrors Similarity.annIvf (nCentroids=16, nProbe=4, k=10, query
    * vec_id=0): codebook = the first 16 vectors, cells assigned by argmax
    * of the 4-decimal-rounded cosine with ties to the smaller cent_id
    * (window row_number == the engine's greatest-of-structs), the query
    * probes its top-4 cells, exact cosine top-10 inside the probed cells. */
  val annIvf: String =
    s"""WITH c AS (
       |  SELECT CAST(vec_id AS INT) AS cent_id, embedding AS cv
       |  FROM embeddings WHERE vec_id < 16),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |asg0 AS (
       |  SELECT e.vec_id, c.cent_id,
       |    ${cosSums("e.embedding", "c.cv")}
       |  FROM embeddings e, c, range(1, 65) r(i)
       |  GROUP BY e.vec_id, c.cent_id),
       |asg AS (
       |  SELECT vec_id, cent_id, round(dp / (sqrt(na) * sqrt(nb)), 4) AS cos
       |  FROM asg0),
       |cell AS (
       |  SELECT vec_id, cent_id FROM (
       |    SELECT vec_id, cent_id, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY cos DESC, cent_id ASC) AS rn
       |    FROM asg) WHERE rn = 1),
       |probe AS (
       |  SELECT cent_id FROM asg WHERE vec_id = 0
       |  ORDER BY cos DESC, cent_id ASC LIMIT 4),
       |d AS (
       |  SELECT e.vec_id,
       |    ${cosSums("e.embedding", "q.qv")}
       |  FROM embeddings e
       |    JOIN cell ON e.vec_id = cell.vec_id
       |    JOIN probe ON cell.cent_id = probe.cent_id,
       |    q, range(1, 65) r(i)
       |  GROUP BY e.vec_id)
       |SELECT vec_id, round(dp / (sqrt(na) * sqrt(nb)), 4) AS cos
       |FROM d ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin

  /** Mirrors Similarity.nearDupPairs: pairs generated within sign-LSH
    * buckets (8 bits), never all-pairs. */
  val nearDupEmbed: String =
    s"""WITH b AS (
       |  SELECT vec_id, embedding, CAST($bucketSql AS BIGINT) AS bucket
       |  FROM embeddings
       |),
       |p AS (
       |  SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
       |    ${cosSums("a.embedding", "b2.embedding")}
       |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id,
       |       range(1, 65) r(i)
       |  GROUP BY a.vec_id, b2.vec_id
       |)
       |SELECT vec_a, vec_b, round(dp / (sqrt(na) * sqrt(nb)), 4) AS cos
       |FROM p ORDER BY cos DESC, vec_a ASC, vec_b ASC LIMIT 20""".stripMargin

  private def profileSql(set: Seq[String]): String =
    s"CAST(len(list_filter(words, x -> list_contains([${set.map(s => s"'$s'").mkString(", ")}], x))) AS BIGINT)"

  val langId: String = {
    val profiles = graft.ops.TextAnalysis.langProfiles
    val scores = profiles.map { case (l, set) => s"${profileSql(set)} AS s_$l" }
    val g = s"greatest(${profiles.map("s_" + _._1).mkString(", ")})"
    val cases = profiles.map { case (l, _) =>
      s"WHEN g > 0 AND s_$l = g THEN '$l'"
    }.mkString(" ")
    s"""WITH w AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                     x -> x <> '') AS words
       |  FROM documents
       |),
       |scored AS (SELECT doc_id, ${scores.mkString(", ")} FROM w),
       |best AS (SELECT doc_id, ${profiles.map("s_" + _._1).mkString(", ")}, $g AS g FROM scored)
       |SELECT doc_id, CASE $cases ELSE 'und' END AS lang_pred, g AS score
       |FROM best ORDER BY doc_id""".stripMargin
  }

  val quality: String =
    """WITH w AS (
      |  SELECT doc_id, text,
      |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                     x -> x <> '') AS words
      |  FROM documents
      |),
      |f AS (
      |  SELECT doc_id,
      |         CAST(len(words) AS BIGINT) AS n_words,
      |         CAST(length(text) AS BIGINT) AS n_chars,
      |         CAST(len(list_filter(words,
      |           x -> list_contains(['the', 'a', 'and', 'of'], x))) AS DOUBLE) AS ns
      |  FROM w
      |)
      |SELECT doc_id, n_words, n_chars,
      |       round(ns / greatest(n_words, 1), 4) AS stop_ratio,
      |       round(least(n_words / 100.0, 1.0) * (1 - ns / greatest(n_words, 1)), 4) AS score
      |FROM f ORDER BY doc_id""".stripMargin

  val tokenCounts: String =
    """SELECT doc_id,
      |  CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]')) AS BIGINT) AS bpe_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  val fingerprint: String =
    """SELECT doc_id,
      |  list_aggregate(list_transform(range(1, greatest(length(text) - 6, 2)),
      |    i -> md5(substr(text, CAST(i AS INT), 8))), 'min') AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Closed-form expected values of the BMP/WAV fixture headers that
    * graft.ops.Multimodal PARSES back out of the generated bytes: the Spark
    * side never evaluates these formulas on the read path (it reads
    * little-endian header fields), so agreement certifies the real decode.
    * BMP n_bytes = 54-byte headers + height × 4-aligned 24-bpp rows; WAV
    * n_bytes = 44-byte canonical header + frames × channels × 2. */
  val multimodal: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'image/bmp' ELSE 'audio/wav' END AS kind,
      |  CASE WHEN doc_id % 2 = 0
      |       THEN 54 + ((doc_id % 48) + 1) * ((((doc_id % 64) + 1) * 3 + 3) // 4 * 4)
      |       ELSE 44 + ((doc_id % 1000) + 1) * (((doc_id // 2) % 2) + 1) * 2
      |  END AS n_bytes,
      |  CASE WHEN doc_id % 2 = 0 THEN (doc_id % 64) + 1 ELSE 0 END AS width,
      |  CASE WHEN doc_id % 2 = 0 THEN (doc_id % 48) + 1 ELSE 0 END AS height,
      |  CASE WHEN doc_id % 2 = 0 THEN 1 ELSE (doc_id % 1000) + 1 END AS n_frames,
      |  CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 8000 + (doc_id % 8) * 1000 END AS sample_rate,
      |  CASE WHEN doc_id % 2 = 0 THEN 0 ELSE ((doc_id // 2) % 2) + 1 END AS channels
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Closed-form expected values AFTER downsampling (resize maxDim=16,
    * frame-stride 4) — the Spark side re-decodes the transformed bytes, so
    * agreement certifies the real nearest-neighbor / decimation
    * arithmetic, not a metadata pass-through. */
  val multimodalDownsample: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    (doc_id % 64) + 1 AS w0, (doc_id % 48) + 1 AS h0,
      |    (doc_id % 1000) + 1 AS f0,
      |    ((doc_id // 2) % 2) + 1 AS ch,
      |    8000 + (doc_id % 8) * 1000 AS rate
      |  FROM documents),
      |d AS (
      |  SELECT doc_id, ch, rate,
      |    CASE WHEN greatest(w0, h0) <= 16 THEN w0
      |         ELSE greatest(1, w0 * 16 // greatest(w0, h0)) END AS wr,
      |    CASE WHEN greatest(w0, h0) <= 16 THEN h0
      |         ELSE greatest(1, h0 * 16 // greatest(w0, h0)) END AS hr,
      |    (f0 + 3) // 4 AS fr
      |  FROM p)
      |SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'image/bmp' ELSE 'audio/wav' END AS kind,
      |  CASE WHEN doc_id % 2 = 0 THEN 54 + hr * ((wr * 3 + 3) // 4 * 4)
      |       ELSE 44 + fr * ch * 2 END AS n_bytes,
      |  CASE WHEN doc_id % 2 = 0 THEN wr ELSE 0 END AS width,
      |  CASE WHEN doc_id % 2 = 0 THEN hr ELSE 0 END AS height,
      |  CASE WHEN doc_id % 2 = 0 THEN 1 ELSE fr END AS n_frames,
      |  CASE WHEN doc_id % 2 = 0 THEN 0 ELSE rate END AS sample_rate,
      |  CASE WHEN doc_id % 2 = 0 THEN 0 ELSE ch END AS channels
      |FROM d ORDER BY doc_id""".stripMargin
}
