package graft.analyze

/** Per-language reserved-word sets for the code analyzer (north rule:
  * "per-lang code-aware tokenizer"). Language keywords are the code-corpus
  * analog of the reference's English stopword list
  * (`Utils/StopWords.java:9`): near-ubiquitous tokens that carry no
  * discriminative signal inside one language's files, dropped at the same
  * stage of the normalization chain (after lowercase+clean, before the
  * Porter stem). Unknown langs (natural-language docs, configs) fall
  * through to an empty set — nothing is dropped.
  *
  * Keyword lists are the languages' public reserved words (subsets: only
  * words that survive the `[a-z0-9]` cleaning are listed).
  */
object LangKeywords {

  private val cFamily = Set(
    "if", "else", "for", "while", "do", "switch", "case", "default",
    "break", "continue", "return", "goto", "sizeof", "struct", "union",
    "enum", "typedef", "static", "extern", "const", "void", "int", "char",
    "long", "short", "float", "double", "signed", "unsigned", "volatile")

  private val java = cFamily ++ Set(
    "abstract", "assert", "boolean", "byte", "catch", "class", "extends",
    "final", "finally", "implements", "import", "instanceof", "interface",
    "native", "new", "null", "package", "private", "protected", "public",
    "super", "synchronized", "this", "throw", "throws", "transient", "try",
    "var", "true", "false")

  private val scala = Set(
    "abstract", "case", "catch", "class", "def", "do", "else", "extends",
    "false", "final", "finally", "for", "forsome", "if", "implicit",
    "import", "lazy", "match", "new", "null", "object", "override",
    "package", "private", "protected", "return", "sealed", "super", "this",
    "throw", "trait", "true", "try", "type", "val", "var", "while", "with",
    "yield", "given", "using", "then", "enum", "export", "extension")

  private val python = Set(
    "and", "as", "assert", "async", "await", "break", "class", "continue",
    "def", "del", "elif", "else", "except", "false", "finally", "for",
    "from", "global", "if", "import", "in", "is", "lambda", "none",
    "nonlocal", "not", "or", "pass", "raise", "return", "true", "try",
    "while", "with", "yield", "self")

  private val go = Set(
    "break", "case", "chan", "const", "continue", "default", "defer",
    "else", "fallthrough", "for", "func", "go", "goto", "if", "import",
    "interface", "map", "package", "range", "return", "select", "struct",
    "switch", "type", "var", "nil", "true", "false")

  private val js = Set(
    "await", "break", "case", "catch", "class", "const", "continue",
    "debugger", "default", "delete", "do", "else", "export", "extends",
    "false", "finally", "for", "function", "if", "import", "in",
    "instanceof", "let", "new", "null", "of", "return", "super", "switch",
    "this", "throw", "true", "try", "typeof", "undefined", "var", "void",
    "while", "with", "yield", "async")

  private val rust = Set(
    "as", "break", "const", "continue", "crate", "dyn", "else", "enum",
    "extern", "false", "fn", "for", "if", "impl", "in", "let", "loop",
    "match", "mod", "move", "mut", "pub", "ref", "return", "self",
    "static", "struct", "super", "trait", "true", "type", "unsafe", "use",
    "where", "while", "async", "await")

  private val sql = Set(
    "select", "from", "where", "group", "by", "order", "having", "join",
    "inner", "outer", "left", "right", "full", "on", "as", "and", "or",
    "not", "null", "insert", "into", "values", "update", "set", "delete",
    "create", "table", "drop", "alter", "index", "view", "union", "all",
    "distinct", "limit", "offset", "case", "when", "then", "else", "end")

  private val byLang: Map[String, Set[String]] = Map(
    "c" -> cFamily, "cpp" -> (cFamily ++ Set("class", "namespace",
      "template", "typename", "virtual", "new", "delete", "this", "try",
      "catch", "throw", "public", "private", "protected", "true", "false",
      "nullptr", "using", "auto")),
    "java" -> java, "scala" -> scala, "kotlin" -> java,
    "python" -> python, "py" -> python,
    "go" -> go, "golang" -> go,
    "javascript" -> js, "js" -> js, "typescript" -> js, "ts" -> js,
    "rust" -> rust, "rs" -> rust,
    "sql" -> sql)

  /** Keyword set for a lang tag (case-insensitive); empty if unknown. */
  def forLang(lang: String): Set[String] =
    if (lang == null) Set.empty
    else byLang.getOrElse(lang.toLowerCase, Set.empty)
}
