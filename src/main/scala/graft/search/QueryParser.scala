package graft.search

/** Query plan ADT + parser mirroring the reference's query classification
  * (reference `QueryProcessor/QueryProcessor.java:28-80`, F17 in SURVEY.md):
  *
  *  - `"p1" OP "p2"` with OP ∈ {AND, OR, NOT} (case-insensitive) → [[Bool]]
  *  - a single `"phrase"`                                        → [[Phrase]]
  *  - anything else: bag of tokens                               → [[Tokens]]
  *
  * The raw query is lowercased + trimmed first (reference `:29`) — with the
  * engine's ASCII-only lower (the same transform applied to content), so a
  * phrase literal can never diverge from the content normalization
  * (graft.functions.AsciiLower.lowerString).
  */
sealed trait QueryPlan
final case class Tokens(text: String) extends QueryPlan
final case class Phrase(phrase: String) extends QueryPlan
final case class Bool(op: String, p1: String, p2: String) extends QueryPlan

object QueryParser {
  private val BoolRe = """^\s*"([^"]+)"\s+(and|or|not)\s+"([^"]+)"\s*$""".r
  private val PhraseRe = """^\s*"([^"]+)"\s*$""".r

  def parse(raw: String): QueryPlan = {
    val q = graft.functions.AsciiLower.lowerString(raw.trim)
    q match {
      case BoolRe(p1, op, p2) => Bool(op, p1, p2)
      case PhraseRe(p)        => Phrase(p)
      case _                  => Tokens(q)
    }
  }
}
