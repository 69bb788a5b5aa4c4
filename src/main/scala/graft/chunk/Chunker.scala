package graft.chunk

import java.security.MessageDigest

import graft.core.{CodeChunk, FileRecord}

/** AST-aware-ish chunking (SURVEY §2.1 S3) as a pure Scala function
  * applied via `flatMap` over the discovery Dataset — one task per file
  * split, embarrassingly parallel, no process pools (the reference needs
  * a ProcessPoolExecutor + asyncio pipeline for this,
  * `core/chunk_processor.py:305-376`; Spark's task scheduler replaces it).
  *
  * Not a tree-sitter port: a regex/indentation chunker that satisfies the
  * same invariants the reference's parser tests assert (SURVEY §7 hard
  * part (e)): one chunk per function/class/method/doc-section, 1-based
  * inclusive line ranges, methods carry parent_name + dotted
  * hierarchy_path, deterministic sha256 chunk ids
  * (`core/models.py:292-303`), cyclomatic-style complexity, calls /
  * imports / inherits extraction.
  */
object Chunker {

  private val PyDef = """^(\s*)(?:async\s+)?def\s+(\w+)\s*[(:]""".r
  private val PyClass = """^(\s*)class\s+(\w+)\s*[(:]?""".r
  private val BraceFunction =
    """^(\s*)(?:export\s+)?(?:default\s+)?(?:public\s+|private\s+|protected\s+|static\s+|final\s+|override\s+|async\s+)*(?:function\s*\*?\s*|def\s+)(\w+)""".r
  private val BraceArrow =
    """^(\s*)(?:export\s+)?(?:const|let|var|val)\s+(\w+)\s*=\s*(?:async\s*)?(?:\([^)]*\)|\w+)\s*=>""".r
  private val BraceClass =
    """^(\s*)(?:export\s+)?(?:abstract\s+|final\s+|case\s+)*(?:class|object|trait|interface|struct|enum)\s+(\w+)""".r
  private val MdHeader = """^(#{1,6})\s+(.+?)\s*$""".r

  private val Keywords = Set(
    "if", "elif", "else", "for", "while", "return", "switch", "case",
    "match", "catch", "except", "try", "finally", "with", "def", "class",
    "function", "lambda", "yield", "await", "async", "new", "print",
    "super", "this", "self", "import", "from", "in", "not", "and", "or",
    "assert", "raise", "throw", "when", "do", "val", "var", "let", "const")

  def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Deterministic chunk id — semantics of `models.py:292-303`:
    * sha256 of path:type:name:lines:contenthash-prefix.
    */
  def chunkId(path: String, chunkType: String, name: String,
      start: Int, end: Int, content: String): String =
    sha256Hex(s"$path:$chunkType:$name:$start-$end:${sha256Hex(content).take(8)}")

  def complexity(content: String): Int =
    1 + """\b(if|elif|for|while|case|when|catch|except)\b|&&|\|\|"""
      .r.findAllIn(content).length

  private val ControlOpen =
    """^\s*(?:}?\s*)?(?:if|elif|else|for|while|try|switch|match|except|catch|finally|with)\b""".r
  private val BoolOps = """&&|\|\||\b(?:and|or)\b""".r
  private val Jumps = """\b(?:break|continue|goto)\b""".r
  private val CaseClause = """^\s*(?:case\b|default\s*:)""".r

  /** Cognitive complexity (`analysis/collectors/complexity.py:221-362`
    * semantics over an indentation approximation of the AST): each
    * control-flow statement costs 1 + its nesting level, case clauses and
    * jump statements +1, each boolean operator +1. Nesting is tracked by
    * a stack of control-line indents — accurate for Python and for
    * conventionally-indented brace languages (gofmt/IDE style), which is
    * the same trade the chunker itself makes (SURVEY §7 (e)).
    */
  def cognitiveComplexity(content: String): Int = {
    var cc = 0
    val stack = scala.collection.mutable.Stack[Int]()
    content.split("\n", -1).drop(1).foreach { line =>
      if (line.trim.nonEmpty) {
        val indent = line.takeWhile(_ == ' ').length
        while (stack.nonEmpty && stack.top >= indent) stack.pop()
        if (CaseClause.findFirstIn(line).isDefined) cc += 1
        else if (ControlOpen.findFirstIn(line).isDefined) {
          cc += 1 + stack.size
          stack.push(indent)
        }
        cc += BoolOps.findAllIn(line).length
        cc += Jumps.findAllIn(line).length
      }
    }
    cc
  }

  /** Max nesting depth of control structures
    * (`analysis/collectors/complexity.py:459-534`), same indent-stack
    * approximation as cognitiveComplexity; the declaration line itself is
    * depth 0.
    */
  def nestingDepth(content: String): Int = {
    var maxDepth = 0
    val stack = scala.collection.mutable.Stack[Int]()
    content.split("\n", -1).drop(1).foreach { line =>
      if (line.trim.nonEmpty) {
        val indent = line.takeWhile(_ == ' ').length
        while (stack.nonEmpty && stack.top >= indent) stack.pop()
        if (ControlOpen.findFirstIn(line).isDefined) {
          stack.push(indent)
          maxDepth = math.max(maxDepth, stack.size)
        }
      }
    }
    maxDepth
  }

  def tokenCount(content: String): Int = """\w+""".r.findAllIn(content).length

  def callNames(content: String, self: String): Seq[String] =
    """([A-Za-z_]\w*)\s*\(""".r.findAllMatchIn(content).map(_.group(1))
      .filterNot(Keywords.contains).filterNot(_ == self)
      .foldLeft(Vector.empty[String])((acc, c) => if (acc.contains(c)) acc else acc :+ c)

  def importNames(content: String): Seq[String] = {
    val pats = Seq(
      """(?m)^\s*from\s+([\w.]+)\s+import""".r,
      """(?m)^\s*import\s+([\w.{}, ]+?)\s*(?:;|$)""".r,
      """(?m)import\s+.*?from\s+['"]([^'"]+)['"]""".r,
      """(?m)require\(\s*['"]([^'"]+)['"]\s*\)""".r)
    pats.flatMap(_.findAllMatchIn(content).map(_.group(1).trim))
      .foldLeft(Vector.empty[String])((acc, c) => if (acc.contains(c)) acc else acc :+ c)
  }

  /** Chunk one file. Dispatch on language family; Go and Java get
    * language-faithful extractors (receiver methods / annotations /
    * return types) matching the reference parser tests' invariants
    * (`tests/test_go_parser.py`, `tests/test_java_parser.py`).
    */
  def chunkFile(f: FileRecord): Seq[CodeChunk] = {
    val lines = f.content.split("\n", -1)
    val decls: Seq[Decl] = f.language match {
      case "python" => pythonDecls(lines)
      case "markdown" => return markdownChunks(f, lines)
      case "go" => goDecls(lines)
      case "java" => javaDecls(lines)
      case "javascript" | "typescript" | "scala" | "rust" |
           "csharp" | "php" | "ruby" | "dart" | "c" | "cpp" =>
        braceDecls(lines)
      case _ => return windowChunks(f, lines)
    }
    if (decls.isEmpty) windowChunks(f, lines) else declChunks(f, lines, decls)
  }

  private final case class Decl(line: Int, indent: Int, kind: String,
      name: String, inherits: Seq[String],
      params: Seq[String] = Nil, returnType: String = "",
      decorators: Seq[String] = Nil, receiver: String = "")

  // ---- Go (parsers/go.py invariants) ---------------------------------

  private val GoType = """^type\s+(\w+)\s+(struct|interface)\b""".r
  private val GoMethod =
    """^func\s*\(\s*\w+\s+\*?([\w.]+)\s*\)\s*(\w+)\s*\(([^)]*)\)\s*(.*?)\s*\{?\s*$""".r
  private val GoFunc = """^func\s+(\w+)\s*\(([^)]*)\)\s*(.*?)\s*\{?\s*$""".r

  private def splitParams(raw: String): Seq[String] =
    raw.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  private def goDecls(lines: Array[String]): Seq[Decl] =
    lines.zipWithIndex.flatMap { case (l, i) =>
      GoType.findFirstMatchIn(l).map(m =>
        Decl(i, 0, m.group(2), m.group(1), Nil))
        .orElse(GoMethod.findFirstMatchIn(l).map(m =>
          Decl(i, 0, "method", m.group(2), Nil,
            params = splitParams(m.group(3)), returnType = m.group(4).trim,
            receiver = m.group(1))))
        .orElse(GoFunc.findFirstMatchIn(l).map(m =>
          Decl(i, 0, "function", m.group(1), Nil,
            params = splitParams(m.group(2)), returnType = m.group(3).trim)))
    }.toSeq

  // ---- Java (parsers/java.py invariants) -----------------------------

  private val JavaClass =
    ("""^(\s*)(?:(?:public|private|protected|static|final|abstract|sealed|strictfp)\s+)*""" +
      """(class|interface|enum|record)\s+(\w+)""").r
  private val JavaMethod =
    ("""^(\s*)(?:(?:public|private|protected|static|final|abstract|synchronized|default|native|strictfp)\s+)*""" +
      """(?:<[^>]+>\s*)?([\w.$]+(?:<[^>]*>)?(?:\[\])*)\s+(\w+)\s*\(([^)]*)\)""" +
      """\s*(?:throws\s+[\w.,\s]+)?\s*[;{]?\s*$""").r
  private val JavaAnno = """^\s*@(\w+)""".r
  private val JavaStmtKeywords = Set(
    "return", "new", "throw", "else", "if", "while", "for", "switch",
    "case", "do", "break", "continue", "assert", "yield")

  /** Consecutive @annotation lines immediately above `line`. */
  private def annotationsAbove(lines: Array[String], line: Int): Seq[String] = {
    var i = line - 1
    var acc = List.empty[String]
    while (i >= 0 && JavaAnno.findFirstMatchIn(lines(i)).isDefined) {
      acc = JavaAnno.findFirstMatchIn(lines(i)).get.group(1) :: acc
      i -= 1
    }
    acc
  }

  private def javaDecls(lines: Array[String]): Seq[Decl] =
    lines.zipWithIndex.flatMap { case (l, i) =>
      JavaClass.findFirstMatchIn(l).map { m =>
        val inh = """(?:extends|implements)\s+([\w.<>,\s]+)""".r
          .findAllMatchIn(l)
          .flatMap(_.group(1).split(",").map(_.trim.takeWhile(c =>
            c.isLetterOrDigit || c == '.' || c == '_')))
          .filter(x => x.nonEmpty && x.head.isUpper).toSeq
        val kind = if (m.group(2) == "interface") "interface" else "class"
        Decl(i, m.group(1).length, kind, m.group(3), inh,
          decorators = annotationsAbove(lines, i))
      }.orElse {
        JavaMethod.findFirstMatchIn(l).flatMap { m =>
          val ret = m.group(2)
          if (JavaStmtKeywords.contains(ret)) None
          else Some(Decl(i, m.group(1).length, "function", m.group(3), Nil,
            params = splitParams(m.group(4)),
            // strip generics from the declared return type: User<T> → User
            returnType = ret.takeWhile(_ != '<'),
            decorators = annotationsAbove(lines, i)))
        }
      }
    }.toSeq

  private def pythonDecls(lines: Array[String]): Seq[Decl] =
    lines.zipWithIndex.flatMap {
      case (l, i) =>
        (PyDef.findFirstMatchIn(l), PyClass.findFirstMatchIn(l)) match {
          case (Some(m), _) =>
            val params = """def\s+\w+\s*\(([^)]*)""".r.findFirstMatchIn(l)
              .map(p => splitParams(p.group(1)).filterNot(Set("self", "cls")))
              .getOrElse(Nil)
            Some(Decl(i, m.group(1).length, "function", m.group(2), Nil,
              params = params))
          case (_, Some(m)) =>
            val inh = """class\s+\w+\s*\(([^)]*)\)""".r.findFirstMatchIn(l)
              .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq)
              .getOrElse(Nil)
            Some(Decl(i, m.group(1).length, "class", m.group(2), inh))
          case _ => None
        }
    }.toSeq

  private def braceDecls(lines: Array[String]): Seq[Decl] =
    lines.zipWithIndex.flatMap {
      case (l, i) =>
        BraceClass.findFirstMatchIn(l).map { m =>
          val inh = """(?:extends|implements|:)\s+([\w.,\s]+)""".r
            .findFirstMatchIn(l)
            .map(_.group(1).split("[,\\s]+").map(_.trim)
              .filter(x => x.nonEmpty && x.head.isUpper).toSeq)
            .getOrElse(Nil)
          Decl(i, m.group(1).length, "class", m.group(2), inh)
        }.orElse(BraceFunction.findFirstMatchIn(l).map(m =>
          Decl(i, m.group(1).length, "function", m.group(2), Nil))
        ).orElse(BraceArrow.findFirstMatchIn(l).map(m =>
          Decl(i, m.group(1).length, "function", m.group(2), Nil)))
    }.toSeq

  /** Chunk extent: decl line up to the last non-blank line before the next
    * decl at the same-or-smaller indent (indentation scoping — works for
    * both python blocks and consistently-indented brace languages).
    */
  private def declChunks(f: FileRecord, lines: Array[String],
      decls: Seq[Decl]): Seq[CodeChunk] = {
    val chunks = decls.zipWithIndex.map { case (d, di) =>
      val next = decls.drop(di + 1).find(_.indent <= d.indent).map(_.line)
        .getOrElse(lines.length)
      var end = next - 1
      while (end > d.line && lines(end).trim.isEmpty) end -= 1
      val content = lines.slice(d.line, end + 1).mkString("\n")
      val parent = decls.take(di).filter(p =>
        (p.kind == "class" || p.kind == "interface") &&
          p.indent < d.indent && p.line < d.line)
        .lastOption
      val chunkType =
        if (d.kind == "function" && parent.nonEmpty) "method" else d.kind
      // Go methods carry their receiver type as the parent even though
      // they are declared at top level (test_go_parser.py: method chunks
      // have a receiver class_name)
      val parentName = parent.map(_.name).getOrElse(d.receiver)
      val hierarchy =
        if (parentName.nonEmpty) s"$parentName.${d.name}" else d.name
      val docstring = extractDocstring(lines, d.line, end)
      CodeChunk(
        chunk_id = chunkId(f.file_path, chunkType, d.name, d.line + 1, end + 1, content),
        file_path = f.file_path, file_hash = f.file_hash, content = content,
        language = f.language, start_line = d.line + 1, end_line = end + 1,
        chunk_type = chunkType, name = d.name, parent_name = parentName,
        hierarchy_path = hierarchy, docstring = docstring,
        signature = lines(d.line).trim, complexity = complexity(content),
        token_count = tokenCount(content),
        calls = callNames(content, d.name), imports = importNames(content),
        inherits_from = d.inherits,
        parameters = d.params, return_type = d.returnType,
        decorators = d.decorators,
        cognitive_complexity = cognitiveComplexity(content),
        nesting_depth = nestingDepth(content))
    }
    // module header (imports/constants before the first decl) → one code chunk
    val header = lines.take(decls.head.line).mkString("\n")
    if (header.trim.nonEmpty) {
      val end = decls.head.line
      chunks.prepended(CodeChunk(
        chunk_id = chunkId(f.file_path, "code", "<module>", 1, end, header),
        file_path = f.file_path, file_hash = f.file_hash, content = header,
        language = f.language, start_line = 1, end_line = end,
        chunk_type = "code", name = "<module>", parent_name = "",
        hierarchy_path = "<module>", docstring = "",
        signature = "", complexity = complexity(header),
        token_count = tokenCount(header), calls = callNames(header, ""),
        imports = importNames(header), inherits_from = Nil))
    } else chunks
  }

  private def extractDocstring(lines: Array[String], declLine: Int, end: Int): String = {
    val window = lines.slice(declLine + 1, math.min(declLine + 4, end + 1)).mkString("\n")
    """(?s)(?:\"\"\"|''')(.*?)(?:\"\"\"|'''|$)""".r.findFirstMatchIn(window)
      .orElse("""/\*\*?(.*?)(?:\*/|$)""".r.findFirstMatchIn(window))
      .map(_.group(1).trim.split("\n").head.trim).getOrElse("")
  }

  /** Extract a leading YAML-ish frontmatter block (--- ... ---) as its
    * own doc_section chunk (`kg_builder.py:2609-2640` parses frontmatter
    * for Document nodes/tags; we keep the raw block on a chunk so the KG
    * builder can mine it).
    */
  private def frontmatterChunk(f: FileRecord, lines: Array[String]): Option[CodeChunk] = {
    if (lines.isEmpty || lines(0).trim != "---") return None
    val end = lines.indexWhere(_.trim == "---", 1)
    if (end < 0) return None
    val content = lines.slice(0, end + 1).mkString("\n")
    Some(CodeChunk(
      chunk_id = chunkId(f.file_path, "doc_section", "<frontmatter>", 1, end + 1, content),
      file_path = f.file_path, file_hash = f.file_hash, content = content,
      language = f.language, start_line = 1, end_line = end + 1,
      chunk_type = "doc_section", name = "<frontmatter>", parent_name = "",
      hierarchy_path = "<frontmatter>", docstring = "", signature = "",
      complexity = 1, token_count = tokenCount(content),
      calls = Nil, imports = Nil, inherits_from = Nil))
  }

  private def markdownChunks(f: FileRecord, lines: Array[String]): Seq[CodeChunk] = {
    val fm = frontmatterChunk(f, lines)
    val headers = lines.zipWithIndex.collect {
      case (MdHeader(hashes, title), i) => (i, hashes.length, title)
    }
    if (headers.isEmpty) return fm.toSeq ++ windowChunks(f, lines)
    fm.toSeq ++ headers.zipWithIndex.map { case ((line, level, title), hi) =>
      val next = headers.drop(hi + 1).find(_._2 <= level).map(_._1)
        .getOrElse(lines.length)
      var end = next - 1
      while (end > line && lines(end).trim.isEmpty) end -= 1
      val content = lines.slice(line, end + 1).mkString("\n")
      val parent = headers.take(hi).filter(h => h._2 < level).lastOption
      CodeChunk(
        chunk_id = chunkId(f.file_path, "doc_section", title, line + 1, end + 1, content),
        file_path = f.file_path, file_hash = f.file_hash, content = content,
        language = f.language, start_line = line + 1, end_line = end + 1,
        chunk_type = "doc_section", name = title,
        parent_name = parent.map(_._3).getOrElse(""),
        hierarchy_path = (parent.map(_._3).toSeq :+ title).mkString("."),
        docstring = "", signature = lines(line).trim,
        complexity = 1, token_count = tokenCount(content),
        calls = Nil, imports = Nil, inherits_from = Nil)
    }.toSeq
  }

  /** Fallback fixed-window chunking (`parsers/base.py:301-383` semantics). */
  private def windowChunks(f: FileRecord, lines: Array[String],
      window: Int = 40): Seq[CodeChunk] = {
    if (f.content.trim.isEmpty) return Nil
    (0 until lines.length by window).map { start =>
      val end = math.min(start + window, lines.length) - 1
      val content = lines.slice(start, end + 1).mkString("\n")
      val name = s"chunk_${start / window}"
      CodeChunk(
        chunk_id = chunkId(f.file_path, "code", name, start + 1, end + 1, content),
        file_path = f.file_path, file_hash = f.file_hash, content = content,
        language = f.language, start_line = start + 1, end_line = end + 1,
        chunk_type = "code", name = name, parent_name = "",
        hierarchy_path = name, docstring = "", signature = "",
        complexity = complexity(content), token_count = tokenCount(content),
        calls = Nil, imports = importNames(content), inherits_from = Nil)
    }
  }
}
