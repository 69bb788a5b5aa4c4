package graft.search

/** The reference's 3-pass BM25 tokenizer (`core/bm25_backend.py:297-375`),
  * re-implemented:
  *   pass 1 — compound identifiers kept whole ("getstream.io");
  *   pass 2 — word components not already covered ("getstream", "io");
  *   pass 3 — snake_case / camelCase sub-words not covered by 1 or 2
  *             ("HybridSearchHandler" → hybrid, search, handler).
  * Pure digits dropped. Duplicates across passes deduplicated exactly as
  * the reference does (pass-2 keeps per-occurrence duplicates, pass-3 is
  * order-preserving-unique).
  *
  * Scalar Scala function: used driver-side for queries and inside a JVM
  * UDF for corpus tokenization (candidate for a codegen Expression if it
  * shows up hot in profiles).
  */
object Tokenizer {

  private val CompoundRe = """[\w][\w.\-/]*[\w]""".r
  private val WordRe = """\w+""".r
  private val CamelRe =
    """[A-Z][a-z]+|[a-z]+(?=[A-Z])|[A-Z]{2,}(?=[A-Z][a-z])|[A-Z]{2,}$|[a-z]{2,}$""".r

  def tokenize(text: String): Seq[String] = {
    val lower = text.toLowerCase
    val compound = CompoundRe.findAllIn(lower).toVector
    val words = WordRe.findAllIn(lower).toVector

    val subWords = WordRe.findAllIn(text).toVector.flatMap { tok =>
      val snake = tok.split("_").iterator
        .filter(p => p.length > 1 && !p.forall(_.isDigit))
        .map(_.toLowerCase).toVector
      val camel = CamelRe.findAllIn(tok).filter(_.length > 1)
        .map(_.toLowerCase).toVector
      snake ++ camel
    }
    val uniqueSub = subWords.foldLeft(Vector.empty[String])(
      (acc, t) => if (acc.contains(t)) acc else acc :+ t)

    val compoundSet = compound.toSet
    val wordSet = words.toSet
    val tokens = compound ++
      words.filterNot(compoundSet.contains) ++
      uniqueSub.filterNot(t => compoundSet.contains(t) || wordSet.contains(t))
    tokens.filter(t => t.nonEmpty && !t.forall(_.isDigit))
  }
}
