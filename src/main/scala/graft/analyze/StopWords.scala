package graft.analyze

/** Standard English stopword list (127 words, classic IR list).
  *
  * Behavioral anchor: the reference drops a 127-word stopword set after
  * cleaning and before stemming (reference `Utils/StopWords.java:9`, applied
  * at `Utils/Tokenizer.java:39` and `Indexer/TextIndexer.java:56`). The exact
  * membership here is our own fixed contract (the in-repo Scala oracle defines
  * truth for ranking parity; see SURVEY.md §5).
  */
object StopWords {
  val set: Set[String] = Set(
    "a", "about", "above", "after", "again", "against", "all", "am", "an",
    "and", "any", "are", "as", "at", "be", "because", "been", "before",
    "being", "below", "between", "both", "but", "by", "cannot", "could",
    "did", "do", "does", "doing", "down", "during", "each", "few", "for",
    "from", "further", "had", "has", "have", "having", "he", "her", "here",
    "hers", "herself", "him", "himself", "his", "how", "i", "if", "in",
    "into", "is", "it", "its", "itself", "me", "more", "most", "my",
    "myself", "no", "nor", "not", "of", "off", "on", "once", "only", "or",
    "other", "ought", "our", "ours", "ourselves", "out", "over", "own",
    "same", "she", "should", "so", "some", "such", "than", "that", "the",
    "their", "theirs", "them", "themselves", "then", "there", "these",
    "they", "this", "those", "through", "to", "too", "under", "until", "up",
    "very", "was", "we", "were", "what", "when", "where", "which", "while",
    "who", "whom", "why", "with", "would", "you", "your", "yours",
    "yourself", "yourselves", "because", "against", "been"
  )
}
