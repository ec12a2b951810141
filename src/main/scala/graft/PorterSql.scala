package graft

import graft.analyze.{PorterStemmer, StopWords}

/** Porter (1980) stemmer expressed as pure DuckDB SQL — the independent
  * oracle for the code-analyzer queries (`q_tf_code`, `q_bm25_code`).
  *
  * DuckDB's own `stem(x, 'porter')` lives in the `fts` extension, which
  * cannot be installed in this zero-egress sandbox, so the algorithm is
  * generated here as a CTE chain the driver's DuckDB runs directly:
  *
  *  - the consonant/vowel pattern of each word is computed ONCE by a
  *    recursive CTE (exact, including the context-dependent 'y' rule:
  *    y is a vowel iff preceded by a consonant);
  *  - every later step only drops suffixes (cv pattern of a prefix = prefix
  *    of the cv pattern) or appends fixed replacement strings (whose cv
  *    contribution is computed statically at generation time — no
  *    replacement contains 'y'), so the pattern column is maintained
  *    exactly without recomputation;
  *  - measure m = number of VC sequences = count of 'VC' in the
  *    run-collapsed pattern; all step conditions (hasVowel, *d, *o) are
  *    string tests against (w, pat).
  *
  * Rule tables are shared with [[graft.analyze.PorterStemmer]] (the same
  * published rule list), so the two implementations cannot drift on
  * constants; the control flow is re-derived independently per engine.
  * Validated offline against PorterStemmer.stem over the classic Porter
  * vocabulary plus fuzzed words (see SURVEY.md §5).
  */
object PorterSql {

  private def cvOf(s: String): String =
    s.map(c => if ("aeiou".contains(c)) 'v' else 'c')

  /** SQL: measure m of the cv-pattern expression `p` — collapse vowel and
    * consonant runs, then count 'VC' occurrences. */
  private def m(p: String): String = {
    val collapsed =
      s"regexp_replace(regexp_replace($p, 'v+', 'V', 'g'), 'c+', 'C', 'g')"
    s"((length($collapsed) - length(replace($collapsed, 'VC', ''))) // 2)"
  }

  /** SQL: stem `s` (pattern `sp`) ends consonant-vowel-consonant where the
    * final consonant is not w, x or y (the *o condition). */
  private def cvc(s: String, sp: String): String =
    s"(length($s) >= 3 AND substr($sp, greatest(length($s) - 2, 1), 3) = 'cvc'" +
      s" AND substr($s, length($s), 1) NOT IN ('w', 'x', 'y'))"

  /** One suffix-rule step (steps 2 and 3): longest suffix first, and — as in
    * the published algorithm — only the FIRST matching suffix is considered;
    * if its measure condition fails the word is left unchanged. Returns the
    * (word, pattern) CASE expression pair over columns (w, pat). */
  private def ruleCases(rules: Seq[(String, String)]): (String, String) = {
    val sorted = rules.sortBy(-_._1.length)
    def branch(out: (String, String, Int) => String) = sorted.map {
      case (suf, rep) =>
        val k = suf.length
        val cond = s"${m(s"substr(pat, 1, length(w) - $k)")} > 0"
        s"WHEN ends_with(w, '$suf') THEN CASE WHEN $cond THEN ${out(suf, rep, k)} ELSE %s END"
    }
    val wCase = branch((_, rep, k) => s"substr(w, 1, length(w) - $k) || '$rep'")
      .map(_.format("w")).mkString("CASE ", " ", " ELSE w END")
    val pCase = branch((_, rep, k) =>
        s"substr(pat, 1, length(w) - $k) || '${cvOf(rep)}'")
      .map(_.format("pat")).mkString("CASE ", " ", " ELSE pat END")
    (wCase, pCase)
  }

  /** CTE chain `<prefix>cvr … <prefix>stem(w0, stem)` stemming every word of
    * `inCte(w0)` (lowercase, [a-z0-9]+). Must be embedded under a
    * `WITH RECURSIVE`. */
  def stemCtes(inCte: String, p: String = "pst_"): String = {
    val (w2, p2) = ruleCases(PorterStemmer.step2Rules)
    val (w3, p3) = ruleCases(PorterStemmer.step3Rules)
    val step4 = PorterStemmer.step4Suffixes.sortBy(-_.length).map { suf =>
      val k = suf.length
      val mc = s"${m(s"substr(pat, 1, length(w) - $k)")} > 1"
      val cond =
        if (suf == "ion")
          s"$mc AND length(w) > $k AND substr(w, length(w) - $k, 1) IN ('s', 't')"
        else mc
      s"WHEN ends_with(w, '$suf') THEN CASE WHEN $cond THEN substr(w, 1, length(w) - $k) ELSE %s END"
    }
    val w4 = step4.map(_.format("w")).mkString("CASE ", " ", " ELSE w END")
    val p4 = step4.map(b => b.replace("substr(w, 1, length(w) - ", "substr(pat, 1, length(w) - ")
        .format("pat")).mkString("CASE ", " ", " ELSE pat END")
    val s1 = "substr(w, 1, length(w) - 1)"
    val sp1 = "substr(pat, 1, length(w) - 1)"
    val e5a = s"ends_with(w, 'e') AND (${m(sp1)} > 1 OR (${m(sp1)} = 1 AND NOT ${cvc(s1, sp1)}))"
    s"""${p}cvr AS (
       |  SELECT w0, 0 AS i, '' AS pat FROM $inCte
       |  UNION ALL
       |  SELECT w0, i + 1,
       |    pat || CASE
       |      WHEN substr(w0, i + 1, 1) IN ('a','e','i','o','u') THEN 'v'
       |      WHEN substr(w0, i + 1, 1) = 'y' AND i > 0
       |           AND substr(pat, i, 1) = 'c' THEN 'v'
       |      ELSE 'c' END
       |  FROM ${p}cvr WHERE i < length(w0)),
       |${p}cv AS (SELECT w0, w0 AS w, pat FROM ${p}cvr WHERE i = length(w0)),
       |${p}1a AS (
       |  SELECT w0, w, substr(pat, 1, length(w)) AS pat FROM (
       |    SELECT w0, pat,
       |      CASE WHEN ends_with(w, 'sses') THEN substr(w, 1, length(w) - 2)
       |           WHEN ends_with(w, 'ies')  THEN substr(w, 1, length(w) - 2)
       |           WHEN ends_with(w, 'ss')   THEN w
       |           WHEN ends_with(w, 's')    THEN substr(w, 1, length(w) - 1)
       |           ELSE w END AS w
       |    FROM ${p}cv)),
       |${p}1b0 AS (
       |  SELECT w0, w, pat,
       |    CASE WHEN ends_with(w, 'eed') THEN 'eed'
       |         WHEN ends_with(w, 'ed')
       |              AND contains(substr(pat, 1, length(w) - 2), 'v') THEN 'ed'
       |         WHEN ends_with(w, 'ing')
       |              AND contains(substr(pat, 1, length(w) - 3), 'v') THEN 'ing'
       |         ELSE '' END AS tag
       |  FROM ${p}1a),
       |${p}1b1 AS (
       |  SELECT w0, w, pat, tag,
       |    CASE tag WHEN 'ed' THEN substr(w, 1, length(w) - 2)
       |             WHEN 'ing' THEN substr(w, 1, length(w) - 3) ELSE w END AS s,
       |    CASE tag WHEN 'ed' THEN substr(pat, 1, length(w) - 2)
       |             WHEN 'ing' THEN substr(pat, 1, length(w) - 3) ELSE pat END AS sp
       |  FROM ${p}1b0),
       |${p}1b AS (
       |  SELECT w0,
       |    CASE
       |      WHEN tag = 'eed' THEN
       |        CASE WHEN ${m("substr(pat, 1, length(w) - 3)")} > 0
       |             THEN substr(w, 1, length(w) - 1) ELSE w END
       |      WHEN tag = '' THEN w
       |      WHEN ends_with(s, 'at') OR ends_with(s, 'bl') OR ends_with(s, 'iz')
       |        THEN s || 'e'
       |      WHEN length(s) >= 2
       |           AND substr(s, length(s), 1) = substr(s, greatest(length(s) - 1, 1), 1)
       |           AND substr(sp, length(s), 1) = 'c'
       |           AND substr(s, length(s), 1) NOT IN ('l', 's', 'z')
       |        THEN substr(s, 1, length(s) - 1)
       |      WHEN ${m("sp")} = 1 AND ${cvc("s", "sp")} THEN s || 'e'
       |      ELSE s END AS w,
       |    CASE
       |      WHEN tag = 'eed' THEN
       |        CASE WHEN ${m("substr(pat, 1, length(w) - 3)")} > 0
       |             THEN substr(pat, 1, length(w) - 1) ELSE pat END
       |      WHEN tag = '' THEN pat
       |      WHEN ends_with(s, 'at') OR ends_with(s, 'bl') OR ends_with(s, 'iz')
       |        THEN sp || 'v'
       |      WHEN length(s) >= 2
       |           AND substr(s, length(s), 1) = substr(s, greatest(length(s) - 1, 1), 1)
       |           AND substr(sp, length(s), 1) = 'c'
       |           AND substr(s, length(s), 1) NOT IN ('l', 's', 'z')
       |        THEN substr(sp, 1, length(s) - 1)
       |      WHEN ${m("sp")} = 1 AND ${cvc("s", "sp")} THEN sp || 'v'
       |      ELSE sp END AS pat
       |  FROM ${p}1b1),
       |${p}1c AS (
       |  SELECT w0,
       |    CASE WHEN ends_with(w, 'y') AND contains(substr(pat, 1, length(w) - 1), 'v')
       |         THEN substr(w, 1, length(w) - 1) || 'i' ELSE w END AS w,
       |    CASE WHEN ends_with(w, 'y') AND contains(substr(pat, 1, length(w) - 1), 'v')
       |         THEN substr(pat, 1, length(w) - 1) || 'v' ELSE pat END AS pat
       |  FROM ${p}1b),
       |${p}2 AS (SELECT w0, $w2 AS w, $p2 AS pat FROM ${p}1c),
       |${p}3 AS (SELECT w0, $w3 AS w, $p3 AS pat FROM ${p}2),
       |${p}4 AS (SELECT w0, $w4 AS w, $p4 AS pat FROM ${p}3),
       |${p}5a AS (
       |  SELECT w0,
       |    CASE WHEN $e5a THEN $s1 ELSE w END AS w,
       |    CASE WHEN $e5a THEN $sp1 ELSE pat END AS pat
       |  FROM ${p}4),
       |${p}stem AS (
       |  SELECT w0,
       |    CASE WHEN length(w0) <= 2 THEN w0
       |         WHEN ends_with(w, 'll') AND ${m("pat")} > 1
       |           THEN substr(w, 1, length(w) - 1)
       |         ELSE w END AS stem
       |  FROM ${p}5a)""".stripMargin
  }

  private def sqlList(xs: Iterable[String]): String =
    xs.toSeq.sorted.map(s => s"'$s'").mkString(", ")

  /** CTE chain deriving the code-analyzer tf table `ctf(doc_id, term, tf)`
    * from `files(doc_id, lang, content)` — mirrors
    * [[graft.analyze.Analyzer.codeTokens]]: split content on
    * `[^A-Za-z0-9_]+`, emit each raw identifier plus (when it splits into
    * > 1 parts) its camelCase / snake_case / letter-digit subtokens, then
    * normalize each candidate (lowercase → strip [^a-z0-9] → stopword drop
    * → Porter stem). `ckept`/`ctf` are MATERIALIZED: DuckDB inlines plain
    * CTEs, and the BM25 oracle references ctf through four downstream CTEs
    * at once — inlining four copies of the whole chain (each with its own
    * recursive-CTE stemmer) stalls the optimizer; materializing pins each
    * to one evaluation. The per-lang reserved-word drop provably no-ops here:
    * the corpus langs (de/en/es/fr/zh) are natural languages with empty
    * keyword sets in [[graft.analyze.LangKeywords]]. */
  val codeTfCtes: String = {
    val stop = sqlList(StopWords.set)
    s"""crawtok AS (
       |  SELECT doc_id,
       |         unnest(string_split_regex(content, '[^A-Za-z0-9_]+')) AS raw
       |  FROM files),
       |crt AS (SELECT doc_id, raw FROM crawtok WHERE raw <> ''),
       |csplit AS (
       |  SELECT doc_id, raw,
       |    list_filter(string_split(
       |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |        replace(raw, '_', ' '),
       |        '([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g'),
       |        '([a-z])([A-Z])', '\\1 \\2', 'g'),
       |        '([A-Za-z])([0-9])', '\\1 \\2', 'g'),
       |        '([0-9])([A-Za-z])', '\\1 \\2', 'g'), ' '),
       |      x -> x <> '') AS parts
       |  FROM crt),
       |ccands AS (
       |  SELECT doc_id, raw AS cand FROM csplit
       |  UNION ALL
       |  SELECT doc_id, unnest(parts) AS cand FROM csplit WHERE len(parts) > 1),
       |ckept AS MATERIALIZED (
       |  SELECT doc_id, tok FROM (
       |    SELECT doc_id, regexp_replace(lower(cand), '[^a-z0-9]', '', 'g') AS tok
       |    FROM ccands)
       |  WHERE tok <> '' AND tok NOT IN ($stop)),
       |cvocab AS (SELECT DISTINCT tok AS w0 FROM ckept),
       |${stemCtes("cvocab")},
       |ctf AS MATERIALIZED (
       |  SELECT k.doc_id, p.stem AS term, count(*) AS tf
       |  FROM ckept k JOIN pst_stem p ON k.tok = p.w0
       |  GROUP BY k.doc_id, p.stem)""".stripMargin
  }
}
