package graft.analyze

/** Porter (1980) stemmer — implemented from the published algorithm
  * ("An algorithm for suffix stripping", Program 14(3)).
  *
  * Behavioral anchor: the reference stems every cleaned token with OpenNLP's
  * PorterStemmer (reference `Utils/Tokenizer.java:34,43`,
  * `Indexer/TextIndexer.java:42,61`); this is a from-scratch Scala
  * implementation of the same classic public algorithm.
  */
object PorterStemmer {

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var w = word
    w = step1a(w)
    w = step1b(w)
    w = step1c(w)
    w = step2(w)
    w = step3(w)
    w = step4(w)
    w = step5a(w)
    w = step5b(w)
    w
  }

  private def isVowel(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y'                         => i > 0 && !isVowel(w, i - 1)
    case _                           => false
  }

  /** m = number of VC sequences in [C](VC)^m[V]. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && !isVowel(w, i)) i += 1
    while (i < n) {
      while (i < n && isVowel(w, i)) i += 1
      if (i < n) {
        m += 1
        while (i < n && !isVowel(w, i)) i += 1
      }
    }
    m
  }

  private def hasVowel(w: String): Boolean =
    (0 until w.length).exists(isVowel(w, _))

  private def endsDoubleConsonant(w: String): Boolean = {
    val n = w.length
    n >= 2 && w.charAt(n - 1) == w.charAt(n - 2) && !isVowel(w, n - 1)
  }

  /** *o: stem ends cvc where the final c is not w, x or y. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && !isVowel(w, n - 3) && isVowel(w, n - 2) && !isVowel(w, n - 1) &&
    !"wxy".contains(w.charAt(n - 1))
  }

  private def step1a(w: String): String =
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ies")) w.dropRight(2)
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s")) w.dropRight(1)
    else w

  private def step1b(w: String): String = {
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w.dropRight(1) else w
    } else {
      val stripped =
        if (w.endsWith("ed") && hasVowel(w.dropRight(2))) Some(w.dropRight(2))
        else if (w.endsWith("ing") && hasVowel(w.dropRight(3))) Some(w.dropRight(3))
        else None
      stripped match {
        case None => w
        case Some(s) =>
          if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
          else if (endsDoubleConsonant(s) && !"lsz".contains(s.last)) s.dropRight(1)
          else if (measure(s) == 1 && endsCvc(s)) s + "e"
          else s
      }
    }
  }

  private def step1c(w: String): String =
    if (w.endsWith("y") && hasVowel(w.dropRight(1))) w.dropRight(1) + "i" else w

  // (suffix, replacement) pairs, checked longest-first within the step.
  private[graft] val step2Rules = Seq(
    "ational" -> "ate", "ization" -> "ize", "iveness" -> "ive",
    "fulness" -> "ful", "ousness" -> "ous", "biliti" -> "ble",
    "tional" -> "tion", "entli" -> "ent", "ousli" -> "ous",
    "ation" -> "ate", "alism" -> "al", "aliti" -> "al", "iviti" -> "ive",
    "enci" -> "ence", "anci" -> "ance", "izer" -> "ize", "abli" -> "able",
    "alli" -> "al", "ator" -> "ate", "eli" -> "e", "bli" -> "ble"
  )

  private[graft] val step3Rules = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ness" -> "", "ful" -> ""
  )

  private def applyRules(w: String, rules: Seq[(String, String)], minM: Int): String = {
    for ((suf, rep) <- rules.sortBy(-_._1.length)) {
      if (w.endsWith(suf)) {
        val stem = w.dropRight(suf.length)
        return if (measure(stem) > minM - 1) stem + rep else w
      }
    }
    w
  }

  private def step2(w: String): String = applyRules(w, step2Rules, 1)
  private def step3(w: String): String = applyRules(w, step3Rules, 1)

  private[graft] val step4Suffixes = Seq(
    "ement", "ance", "ence", "able", "ible", "ment", "ion", "ant", "ent",
    "ism", "ate", "iti", "ous", "ive", "ize", "al", "er", "ic", "ou"
  )

  private def step4(w: String): String = {
    for (suf <- step4Suffixes.sortBy(-_.length)) {
      if (w.endsWith(suf)) {
        val stem = w.dropRight(suf.length)
        val ok =
          if (suf == "ion") measure(stem) > 1 && stem.nonEmpty &&
            (stem.last == 's' || stem.last == 't')
          else measure(stem) > 1
        return if (ok) stem else w
      }
    }
    w
  }

  private def step5a(w: String): String =
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) stem else w
    } else w

  private def step5b(w: String): String =
    if (w.endsWith("ll") && measure(w) > 1) w.dropRight(1) else w
}
