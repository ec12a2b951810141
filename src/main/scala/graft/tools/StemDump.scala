package graft.tools

import java.nio.file.{Files, Paths}
import graft.PorterSql
import graft.analyze.PorterStemmer

/** Scratch validation tool (not part of the driver contract): dumps
  * (word, PorterStemmer.stem(word)) pairs and the generated DuckDB SQL so an
  * offline DuckDB run can cross-validate the SQL stemmer on a large fuzz
  * vocabulary. */
object StemDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/stem_truth")
    val rnd = new scala.util.Random(sys.env.getOrElse("STEM_SEED", "42").toLong)
    val letters = "abcdefghijklmnopqrstuvwxyz"
    val suffixes = Seq("", "s", "es", "ies", "sses", "ed", "eed", "ing",
      "y", "ational", "ization", "iveness", "fulness", "ousness", "biliti",
      "tional", "entli", "ousli", "ation", "alism", "aliti", "iviti", "enci",
      "anci", "izer", "abli", "alli", "ator", "eli", "bli", "icate", "ative",
      "alize", "iciti", "ical", "ness", "ful", "ement", "ance", "ence",
      "able", "ible", "ment", "ion", "ant", "ent", "ism", "ate", "iti",
      "ous", "ive", "ize", "al", "er", "ic", "ou", "e", "ll", "yy", "at",
      "bl", "iz")
    val classic = Seq("caresses", "ponies", "ties", "caress", "cats", "feed",
      "agreed", "plastered", "bled", "motoring", "sing", "conflated",
      "troubled", "sized", "hopping", "tanned", "falling", "hissing",
      "fizzed", "failing", "filing", "happy", "sky", "relational",
      "conditional", "rational", "valenci", "hesitanci", "digitizer",
      "conformabli", "radicalli", "differentli", "vileli", "analogousli",
      "vietnamization", "predication", "operator", "feudalism",
      "decisiveness", "hopefulness", "callousness", "formaliti",
      "sensitiviti", "sensibiliti", "triplicate", "formative", "formalize",
      "electriciti", "electrical", "hopeful", "goodness", "revival",
      "allowance", "inference", "airliner", "gyroscopic", "adjustable",
      "defensible", "irritant", "replacement", "adjustment", "dependent",
      "adoption", "homologou", "communism", "activate", "angulariti",
      "homologous", "effective", "bowdlerize", "probate", "rate", "cease",
      "controll", "roll", "yyyy", "syzygy", "sky", "by", "say", "tray",
      "y", "yy", "a", "ab", "abc", "x2x", "a2b2c", "q0", "0q0")
    val fuzz = (1 to sys.env.getOrElse("STEM_N", "4000").toInt).map { _ =>
      val n = 1 + rnd.nextInt(12)
      val base = (1 to n).map { _ =>
        val r = rnd.nextInt(100)
        if (r < 12) 'y'
        else if (r < 18) ('0' + rnd.nextInt(10)).toChar
        else if (r < 55) "aeiou".charAt(rnd.nextInt(5))
        else letters.charAt(rnd.nextInt(26))
      }.mkString
      base + suffixes(rnd.nextInt(suffixes.length))
    }
    val vocab = Seq("a", "agg", "batch", "big", "column", "customer", "data",
      "dup", "fast", "filter", "group", "hash", "join", "key", "line",
      "merge", "order", "part", "query", "row", "scan", "slow", "small",
      "sort", "spark", "stream", "table", "the", "value", "vector", "window")
    val words = (classic ++ vocab ++ fuzz).distinct.filter(_.nonEmpty)
    val csv = words.map(w => s"$w,${PorterStemmer.stem(w)}").mkString("\n")
    Files.writeString(Paths.get(s"$out.csv"), csv)
    val sql =
      s"""WITH RECURSIVE w_in AS (
         |  SELECT unnest(string_split(getvariable('words'), ' ')) AS w0),
         |${PorterSql.stemCtes("w_in")}
         |SELECT w0, stem FROM pst_stem ORDER BY w0""".stripMargin
    Files.writeString(Paths.get(s"$out.sql"), sql)
    println(s"wrote ${words.length} words to $out.csv and SQL to $out.sql")
  }
}
