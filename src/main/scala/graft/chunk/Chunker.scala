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

  // "print" is deliberately NOT a keyword: it is a real callable in
  // python3/dart and the reference's parser tests expect it in calls
  // (tests/unit/parsers/test_parser_calls.py test_dart_parser_calls)
  private val Keywords = Set(
    "if", "elif", "else", "for", "while", "return", "switch", "case",
    "match", "catch", "except", "try", "finally", "with", "def", "class",
    "function", "lambda", "yield", "await", "async", "new",
    "super", "this", "self", "import", "from", "in", "not", "and", "or",
    "assert", "raise", "throw", "when", "do", "val", "var", "let", "const",
    "func", "fn", "defer")

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

  /** Declaration heads stripped before the call scan: `def name(`,
    * `class Name(Base)`, go receiver methods `func (r *T) Name(` — a
    * declared name is NOT a call (the reference's tree-sitter call
    * extractors only visit call-expression nodes, so `def greet(x)`
    * never reports `greet`; the old regex did).
    */
  private val DeclHeadRe =
    ("""(?:(?:async\s+)?(?:def|function|fn|func)|class)\s+[A-Za-z_]\w*\s*\(?""" +
      """|func\s*\([^)]*\)\s*[A-Za-z_]\w*\s*\(?""").r

  def callNames(content: String, self: String): Seq[String] =
    """([A-Za-z_]\w*)\s*\(""".r
      .findAllMatchIn(DeclHeadRe.replaceAllIn(content, " "))
      .map(_.group(1))
      .filterNot(Keywords.contains).filterNot(_ == self)
      .foldLeft(Vector.empty[String])((acc, c) => if (acc.contains(c)) acc else acc :+ c)

  /** Ruby paren-less command calls (`puts "x"`, `include Foo`): an
    * identifier at statement start followed by an argument token — the
    * shape tree-sitter-ruby parses as a call node and the reference's
    * ruby test expects (`test_parser_calls.py` `puts` assertion); the
    * generic `name(` scan cannot see it.
    */
  private val RubyCommandRe =
    """(?m)^[ \t]*([a-z_]\w*[!?]?)[ \t]+(?=["':\[@$\w])""".r
  private val RubyKeywords = Set(
    "def", "end", "if", "elsif", "else", "unless", "case", "when",
    "while", "until", "for", "in", "do", "then", "return", "yield",
    "begin", "rescue", "ensure", "module", "class", "self", "nil",
    "true", "false", "and", "or", "not", "super", "break", "next",
    "redo", "retry", "alias", "undef")

  def rubyCommandCalls(content: String, self: String): Seq[String] =
    RubyCommandRe.findAllMatchIn(content).map(_.group(1))
      .filterNot(RubyKeywords.contains).filterNot(Keywords.contains)
      .filterNot(_ == self)
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
      case "python" => pythonTopDecls(lines, pythonDecls(lines))
      case "markdown" => return markdownChunks(f, lines)
      case "go" => goDecls(lines)
      case "java" => dropFunctionNested(lines, javaDecls(lines), braceComment)
      case "javascript" | "typescript" =>
        dropFunctionNested(lines, jsDecls(lines), braceComment,
          fullSingleQuote = true)
      case "rust" => dropFunctionNested(lines, rustDecls(lines), braceComment)
      case "ruby" => dropFunctionNested(lines, rubyDecls(lines),
        t => t.startsWith("#"), lineComment = "#", fullSingleQuote = true)
      case "php" => dropFunctionNested(lines, phpDecls(lines), braceComment,
        fullSingleQuote = true)
      case "csharp" =>
        dropFunctionNested(lines, csharpDecls(lines), braceComment)
      case "dart" => dropFunctionNested(lines, dartDecls(lines), braceComment,
        fullSingleQuote = true)
      case "html" => return htmlChunks(f)
      case "scala" | "c" | "cpp" =>
        dropFunctionNested(lines, braceDecls(lines), braceComment)
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

  // ---- JavaScript / TypeScript (parsers/javascript.py invariants) ----
  // function decls (incl. async/generator/export), class decls with
  // extends/implements, const arrow / function-expression bindings, class
  // methods, TS interface/type/enum, JSDoc-above docstrings, @decorators.

  private val JsFunction =
    """^(\s*)(?:export\s+)?(?:default\s+)?(?:async\s+)?function\s*\*?\s*(\w+)\s*(?:<[^>]*>)?\s*\(([^)]*)""".r
  private val JsClass =
    ("""^(\s*)(?:export\s+)?(?:default\s+)?(?:abstract\s+)?class\s+(\w+)""" +
      """(?:<[^>]*>)?(?:\s+extends\s+([\w.]+))?(?:\s+implements\s+([\w.,\s]+))?""").r
  private val JsArrow =
    ("""^(\s*)(?:export\s+)?(?:const|let|var)\s+(\w+)(?:\s*:\s*[^=]+)?\s*=\s*""" +
      """(?:async\s*)?(?:<[^>]*>\s*)?(?:\(([^)]*)\)|\w+)\s*(?::\s*[\w<>\[\]., |&]+)?\s*=>""").r
  private val JsFuncExpr =
    """^(\s*)(?:export\s+)?(?:const|let|var)\s+(\w+)\s*=\s*(?:async\s+)?function\s*\*?\s*\(([^)]*)""".r
  private val TsInterface =
    """^(\s*)(?:export\s+)?(?:declare\s+)?interface\s+(\w+)(?:<[^>]*>)?(?:\s+extends\s+([\w.,\s<>]+))?""".r
  private val TsEnum = """^(\s*)(?:export\s+)?(?:declare\s+)?(?:const\s+)?enum\s+(\w+)""".r
  private val JsMethod =
    ("""^(\s*)(?:(?:public|private|protected|static|readonly|override|async|get|set)\s+)*""" +
      """(\w+)\s*(?:<[^>]*>)?\(([^)]*)\)\s*(?::\s*[\w<>\[\]., |&]+)?\s*\{\s*$""").r
  private val JsStmtKeywords = Set(
    "if", "for", "while", "switch", "catch", "return", "function", "do",
    "else", "try", "finally", "with", "new", "throw", "typeof", "await")

  private def jsDecls(lines: Array[String]): Seq[Decl] = {
    val classIndents = scala.collection.mutable.TreeMap.empty[Int, Int] // line → indent
    val out = lines.zipWithIndex.flatMap { case (l, i) =>
      val d = JsClass.findFirstMatchIn(l).map { m =>
        val inh = (Option(m.group(3)).toSeq ++
          Option(m.group(4)).toSeq.flatMap(_.split(",")).map(_.trim))
          .filter(_.nonEmpty)
        classIndents += (i -> m.group(1).length)
        Decl(i, m.group(1).length, "class", m.group(2), inh,
          decorators = annotationsAbove(lines, i))
      }.orElse(TsInterface.findFirstMatchIn(l).map { m =>
        val inh = Option(m.group(3)).toSeq.flatMap(_.split(",")).map(_.trim)
          .filter(_.nonEmpty)
        Decl(i, m.group(1).length, "interface", m.group(2), inh)
      }).orElse(TsEnum.findFirstMatchIn(l).map(m =>
        Decl(i, m.group(1).length, "enum", m.group(2), Nil)))
        .orElse(JsFunction.findFirstMatchIn(l).map(m =>
          Decl(i, m.group(1).length, "function", m.group(2), Nil,
            params = splitParams(m.group(3)),
            decorators = annotationsAbove(lines, i))))
        .orElse(JsFuncExpr.findFirstMatchIn(l).map(m =>
          Decl(i, m.group(1).length, "function", m.group(2), Nil,
            params = splitParams(m.group(3)))))
        .orElse(JsArrow.findFirstMatchIn(l).map(m =>
          Decl(i, m.group(1).length, "function", m.group(2), Nil,
            params = splitParams(Option(m.group(3)).getOrElse("")))))
        .orElse {
          JsMethod.findFirstMatchIn(l).flatMap { m =>
            val name = m.group(2)
            // only inside a class body (last class at smaller indent),
            // and never a control-flow statement
            val indent = m.group(1).length
            val inClass = classIndents.exists { case (ln, ci) => ln < i && ci < indent }
            if (!inClass || JsStmtKeywords.contains(name)) None
            else Some(Decl(i, indent, "function", name, Nil,
              params = splitParams(m.group(3)),
              decorators = annotationsAbove(lines, i)))
          }
        }
      d
    }.toSeq
    out
  }

  // ---- Rust (parsers/rust.py invariants) -----------------------------
  // struct/enum/trait chunks, impl blocks carrying their target type,
  // fns inside impl → methods with class_name = impl target, #[attr]
  // attributes as decorators, /// doc comments.

  private val RustType =
    """^(\s*)(?:pub(?:\([^)]*\))?\s+)?(struct|enum|trait|union)\s+(\w+)""".r
  private val RustImpl =
    """^(\s*)impl(?:<[^>]*>)?\s+(?:([\w:]+)(?:<[^>]*>)?\s+for\s+)?([\w:]+)""".r
  private val RustFn =
    ("""^(\s*)(?:pub(?:\([^)]*\))?\s+)?(?:default\s+|async\s+|unsafe\s+|const\s+|extern\s+"[^"]*"\s+)*""" +
      """fn\s+(\w+)\s*(?:<[^>]*>)?\(([^)]*)\)?\s*(?:->\s*([^{;]+?))?\s*[{;]?\s*$""").r
  private val RustAttr = """^\s*#\[(.+?)\]\s*$""".r
  private val RustMod = """^(\s*)(?:pub(?:\([^)]*\))?\s+)?mod\s+(\w+)\s*\{""".r

  /** Consecutive #[attribute] lines immediately above `line`. */
  private def rustAttrsAbove(lines: Array[String], line: Int): Seq[String] = {
    var i = line - 1
    var acc = List.empty[String]
    while (i >= 0 && RustAttr.findFirstMatchIn(lines(i)).isDefined) {
      acc = RustAttr.findFirstMatchIn(lines(i)).get.group(1) :: acc
      i -= 1
    }
    acc
  }

  private def rustDecls(lines: Array[String]): Seq[Decl] =
    lines.zipWithIndex.flatMap { case (l, i) =>
      RustType.findFirstMatchIn(l).map { m =>
        Decl(i, m.group(1).length, m.group(2), m.group(3), Nil,
          decorators = rustAttrsAbove(lines, i))
      }.orElse(RustImpl.findFirstMatchIn(l).map { m =>
        // `impl Trait for Type` → name=Type, inherits=[Trait]
        Decl(i, m.group(1).length, "impl", m.group(3),
          Option(m.group(2)).toSeq)
      }).orElse(RustMod.findFirstMatchIn(l).map(m =>
        Decl(i, m.group(1).length, "module", m.group(2), Nil)))
        .orElse(RustFn.findFirstMatchIn(l).map { m =>
          val params = splitParams(m.group(3))
            .filterNot(p => p.matches("&?\\s*(mut\\s+)?self"))
          Decl(i, m.group(1).length, "function", m.group(2), Nil,
            params = params,
            returnType = Option(m.group(4)).getOrElse("").trim,
            decorators = rustAttrsAbove(lines, i))
        })
    }.toSeq

  // ---- Ruby (parsers/ruby.py invariants) -----------------------------
  // module/class/method/class_method (def self.x) chunks, ?/!-suffixed
  // method names, attr_accessor → attribute chunks, ::-namespaced names,
  // RDoc # comments above.

  private val RubyModule = """^(\s*)module\s+([\w:]+)""".r
  private val RubyClass = """^(\s*)class\s+([\w:]+)(?:\s*<\s*([\w:]+))?\s*$""".r
  private val RubyDef = """^(\s*)def\s+(self\.)?([\w]+[?!]?|\[\]=?|[+\-*/%]|==|<=>|<<)(?:\s*\(([^)]*)\))?""".r
  private val RubyAttr = """^(\s*)attr_(?:accessor|reader|writer)\s+:(\w+)""".r

  private def rubyDecls(lines: Array[String]): Seq[Decl] =
    lines.zipWithIndex.flatMap { case (l, i) =>
      RubyClass.findFirstMatchIn(l).map { m =>
        Decl(i, m.group(1).length, "class", m.group(2),
          Option(m.group(3)).toSeq)
      }.orElse(RubyModule.findFirstMatchIn(l).map(m =>
        Decl(i, m.group(1).length, "module", m.group(2), Nil)))
        .orElse(RubyDef.findFirstMatchIn(l).map { m =>
          val kind = if (m.group(2) != null) "class_method" else "function"
          Decl(i, m.group(1).length, kind, m.group(3), Nil,
            params = splitParams(Option(m.group(4)).getOrElse("")))
        })
        .orElse(RubyAttr.findFirstMatchIn(l).map(m =>
          Decl(i, m.group(1).length, "attribute", m.group(2), Nil)))
    }.toSeq

  // ---- PHP (parsers/php.py invariants) -------------------------------
  // class/interface/trait chunks with extends/implements, visibility-
  // modified methods, standalone functions, PHPDoc above.

  private val PhpClass =
    ("""^(\s*)(?:abstract\s+|final\s+)*(class|interface|trait|enum)\s+(\w+)""" +
      """(?:\s+extends\s+([\w\\,\s]+?))?(?:\s+implements\s+([\w\\,\s]+?))?\s*\{?\s*$""").r
  private val PhpFunction =
    ("""^(\s*)(?:(?:public|private|protected|static|final|abstract)\s+)*""" +
      """function\s+&?(\w+)\s*\(([^)]*)\)?\s*(?::\s*\??([\w\\|]+))?""").r

  private def phpDecls(lines: Array[String]): Seq[Decl] =
    lines.zipWithIndex.flatMap { case (l, i) =>
      PhpClass.findFirstMatchIn(l).map { m =>
        val inh = (Option(m.group(4)).toSeq ++ Option(m.group(5)).toSeq)
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        val kind = m.group(2) match {
          case "class" | "enum" => "class"
          case other => other
        }
        Decl(i, m.group(1).length, kind, m.group(3), inh)
      }.orElse(PhpFunction.findFirstMatchIn(l).map(m =>
        Decl(i, m.group(1).length, "function", m.group(2), Nil,
          params = splitParams(m.group(3)),
          returnType = Option(m.group(4)).getOrElse(""))))
    }.toSeq

  // ---- C# (parsers/csharp.py invariants) -----------------------------
  // class/interface/struct/enum/record chunks with : inherits, methods
  // with return types, constructors, { get; set; } properties, [Attr]
  // attributes as decorators, /// XML doc comments above.

  private val CsType =
    ("""^(\s*)(?:(?:public|private|protected|internal|static|sealed|abstract|partial|readonly|unsafe)\s+)*""" +
      """(class|interface|struct|enum|record)\s+(\w+)(?:<[^>]*>)?(?:\s*:\s*([\w.<>,\s]+?))?\s*\{?\s*$""").r
  private val CsMethod =
    ("""^(\s*)(?:(?:public|private|protected|internal|static|sealed|abstract|virtual|override|async|extern|unsafe|new|partial)\s+)+""" +
      """([\w.<>\[\],?]+)\s+(\w+)\s*(?:<[^>]*>)?\(([^)]*)\)?\s*(?:where\s+[^{;]+)?[;{]?\s*$""").r
  private val CsCtor =
    """^(\s*)(?:(?:public|private|protected|internal|static)\s+)+(\w+)\s*\(([^)]*)\)?\s*(?::\s*(?:base|this)\s*\([^)]*\))?\s*\{?\s*$""".r
  private val CsProperty =
    ("""^(\s*)(?:(?:public|private|protected|internal|static|virtual|override|required)\s+)+""" +
      """([\w.<>\[\],?]+)\s+(\w+)\s*\{\s*(?:get|set|init)""").r
  private val CsAttr = """^\s*\[([\w.]+(?:\([^\]]*\))?(?:\s*,\s*[\w.]+(?:\([^\]]*\))?)*)\]\s*$""".r
  private val CsStmtKeywords = Set(
    "return", "new", "throw", "else", "if", "while", "for", "foreach",
    "switch", "case", "do", "break", "continue", "using", "var", "await",
    "yield", "lock", "else if")

  private def csAttrsAbove(lines: Array[String], line: Int): Seq[String] = {
    var i = line - 1
    var acc = List.empty[String]
    while (i >= 0 && CsAttr.findFirstMatchIn(lines(i)).isDefined) {
      acc = CsAttr.findFirstMatchIn(lines(i)).get.group(1) :: acc
      i -= 1
    }
    acc
  }

  private def csharpDecls(lines: Array[String]): Seq[Decl] =
    lines.zipWithIndex.flatMap { case (l, i) =>
      CsType.findFirstMatchIn(l).map { m =>
        val inh = Option(m.group(4)).toSeq.flatMap(_.split(","))
          .map(_.trim.takeWhile(c => c.isLetterOrDigit || c == '.' || c == '_'))
          .filter(x => x.nonEmpty && x.head.isUpper)
        val kind = m.group(2) match {
          case "record" => "class"
          case k => k
        }
        Decl(i, m.group(1).length, kind, m.group(3), inh,
          decorators = csAttrsAbove(lines, i))
      }.orElse {
        CsProperty.findFirstMatchIn(l).flatMap { m =>
          if (CsStmtKeywords.contains(m.group(2))) None
          else Some(Decl(i, m.group(1).length, "property", m.group(3), Nil,
            returnType = m.group(2).takeWhile(_ != '<')))
        }
      }.orElse {
        CsMethod.findFirstMatchIn(l).flatMap { m =>
          val ret = m.group(2)
          if (CsStmtKeywords.contains(ret) || CsStmtKeywords.contains(m.group(3))) None
          else Some(Decl(i, m.group(1).length, "function", m.group(3), Nil,
            params = splitParams(m.group(4)),
            returnType = ret.takeWhile(_ != '<'),
            decorators = csAttrsAbove(lines, i)))
        }
      }.orElse {
        CsCtor.findFirstMatchIn(l).map(m =>
          Decl(i, m.group(1).length, "constructor", m.group(2), Nil,
            params = splitParams(m.group(3)),
            decorators = csAttrsAbove(lines, i)))
      }
    }.toSeq

  // ---- Dart (parsers/dart.py invariants) -----------------------------
  // widget chunks (class extends StatelessWidget/StatefulWidget/State),
  // plain classes, mixins, return-type-first functions incl. async,
  // /// dartdoc above.

  private val DartClass =
    ("""^(\s*)(?:abstract\s+)?(?:base\s+|final\s+|sealed\s+)?class\s+(\w+)(?:<[^>]*>)?""" +
      """(?:\s+extends\s+([\w<>.]+))?(?:\s+with\s+([\w<>.,\s]+?))?(?:\s+implements\s+([\w<>.,\s]+?))?\s*\{?\s*$""").r
  private val DartMixin = """^(\s*)(?:base\s+)?mixin\s+(\w+)(?:\s+on\s+([\w<>.,\s]+?))?\s*\{?\s*$""".r
  private val DartFunction =
    ("""^(\s*)(?:(?:static|final|const|external)\s+)*([\w<>\[\],? ]+?)\s+(\w+)\s*\(([^)]*)\)?\s*""" +
      """(?:async\s*\*?|sync\s*\*?)?\s*(?:\{|=>|;)\s*$""").r
  private val DartStmtKeywords = Set(
    "return", "new", "throw", "else", "if", "while", "for", "switch",
    "case", "do", "break", "continue", "await", "yield", "assert", "print",
    "super", "this")

  private val DartCtor = """^(\s*)(?:const\s+|factory\s+)?(\w+)(?:\.(\w+))?\(""".r

  private def dartDecls(lines: Array[String]): Seq[Decl] = {
    // enclosing type stack so `UserModel(this.id);` inside class UserModel
    // is recognized as a constructor (dart.py:333)
    val enclosing = scala.collection.mutable.Stack[(Int, String)]()
    lines.zipWithIndex.flatMap { case (l, i) =>
      DartClass.findFirstMatchIn(l).map { m =>
        val ext = Option(m.group(3)).map(_.trim)
        val inh = (ext.toSeq ++
          (Option(m.group(4)).toSeq ++ Option(m.group(5)).toSeq)
            .flatMap(_.split(",")).map(_.trim)).filter(_.nonEmpty)
        val isWidget = ext.exists(e =>
          e.endsWith("Widget") || e.startsWith("State<") || e == "State")
        val indent = m.group(1).length
        while (enclosing.nonEmpty && enclosing.top._1 >= indent) enclosing.pop()
        enclosing.push((indent, m.group(2)))
        Decl(i, indent, if (isWidget) "widget" else "class",
          m.group(2), inh)
      }.orElse(DartMixin.findFirstMatchIn(l).map { m =>
        val indent = m.group(1).length
        while (enclosing.nonEmpty && enclosing.top._1 >= indent) enclosing.pop()
        enclosing.push((indent, m.group(2)))
        Decl(i, indent, "mixin", m.group(2),
          Option(m.group(3)).toSeq.flatMap(_.split(",")).map(_.trim))
      }).orElse {
        DartFunction.findFirstMatchIn(l).flatMap { m =>
          val ret = m.group(2).trim
          val name = m.group(3)
          if (ret.isEmpty || DartStmtKeywords.contains(ret) ||
            DartStmtKeywords.contains(name) ||
            ret.exists(c => !(c.isLetterOrDigit || "<>[],? _.".contains(c))))
            None
          else Some(Decl(i, m.group(1).length, "function", name, Nil,
            params = splitParams(m.group(4)),
            returnType = ret.takeWhile(_ != '<')))
        }
      }.orElse {
        // `UserModel(this.id)` / `UserModel.fromJson(json)` inside class
        // UserModel → constructor (no return type in the grammar)
        DartCtor.findFirstMatchIn(l).flatMap { m =>
          val indent = m.group(1).length
          val inType = enclosing.exists { case (ci, nm) =>
            ci < indent && nm == m.group(2)
          }
          if (!inType) None
          else Some(Decl(i, indent, "constructor",
            Option(m.group(3)).getOrElse(m.group(2)), Nil))
        }
      }
    }.toSeq
  }

  /** `@name` / `@mod.name(args...)` lines immediately above a decl —
    * tree-sitter's decorated_definition children; parameterized
    * decorators keep only the dotted callee name, as the reference's
    * skeleton generator renders them (`class_skeleton_generator.py:185`).
    */
  private val PyDecorator = """^\s*@([\w.]+)""".r

  private def pyDecoratorsAbove(lines: Array[String], line: Int): Seq[String] = {
    var i = line - 1
    var acc = List.empty[String]
    while (i >= 0 && PyDecorator.findFirstMatchIn(lines(i)).isDefined) {
      acc = PyDecorator.findFirstMatchIn(lines(i)).get.group(1) :: acc
      i -= 1
    }
    acc
  }

  private def pythonDecls(lines: Array[String]): Seq[Decl] =
    lines.zipWithIndex.flatMap {
      case (l, i) =>
        (PyDef.findFirstMatchIn(l), PyClass.findFirstMatchIn(l)) match {
          case (Some(m), _) =>
            // a signature may span lines (tree-sitter reads the whole
            // parameters node); join continuation lines until the paren
            // balance closes before extracting params
            val sig = joinedSignature(lines, i)
            val params = """def\s+\w+\s*\(([^)]*)""".r.findFirstMatchIn(sig)
              .map(p => splitParams(p.group(1)).filterNot(Set("self", "cls")))
              .getOrElse(Nil)
            Some(Decl(i, m.group(1).length, "function", m.group(2), Nil,
              params = params, decorators = pyDecoratorsAbove(lines, i)))
          case (_, Some(m)) =>
            val sig = joinedSignature(lines, i)
            val inh = """class\s+\w+\s*\(([^)]*)\)""".r.findFirstMatchIn(sig)
              .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq)
              .getOrElse(Nil)
            Some(Decl(i, m.group(1).length, "class", m.group(2), inh,
              decorators = pyDecoratorsAbove(lines, i)))
          case _ => None
        }
    }.toSeq

  /** The decl line plus continuation lines until its `(` balance closes
    * (bounded) — one string the single-line signature regexes run over.
    */
  private def joinedSignature(lines: Array[String], i: Int,
      maxLines: Int = 20): String = {
    def bal(s: String) = s.count(_ == '(') - s.count(_ == ')')
    val sb = new StringBuilder(lines(i))
    var open = bal(lines(i))
    var j = i + 1
    while (open > 0 && j < lines.length && j - i < maxLines) {
      sb.append(' ').append(lines(j).trim)
      open += bal(lines(j))
      j += 1
    }
    sb.toString
  }

  /** Drop python defs NESTED INSIDE A FUNCTION: the reference's
    * traversal stops at `function_definition` nodes
    * (`parsers/python.py:188-192` extracts and does not recurse), so a
    * nested def stays part of its enclosing function's chunk — only
    * module-level and class-level defs become chunks. Class-level
    * methods keep their class parent (classes DO recurse).
    *
    * Scope is tracked by an indent STACK over all lines, not "last
    * preceding decl with smaller indent": any non-blank, non-comment
    * line at indent ≤ an open function's indent CLOSES that function,
    * so an indented module-level def that merely follows one (inside
    * `if TYPE_CHECKING:` / `try:` blocks) is correctly kept — the
    * tree-sitter traversal would extract it too.
    */
  private def pythonTopDecls(lines: Array[String], decls: Seq[Decl]): Seq[Decl] =
    dropFunctionNested(lines, decls, t => t.startsWith("#"),
      lineComment = "#", fullSingleQuote = true, tripleQuotes = true)

  /** The reference's universal traversal rule — "only recurse into
    * children if we didn't extract this node" (`javascript.py:171-174`,
    * `rust.py:113-115`, `python.py:188-192`) — means a function/arrow/
    * fn nested INSIDE a function never becomes its own chunk in ANY
    * language, while class/impl/trait members do (containers recurse
    * explicitly). Indentation-scope approximation of that rule, shared
    * by every decl-based language family: comment lines and dangling
    * `)`/`]` continuation closers never close a scope.
    */
  /** Keywords that end in a bare `:` but are control flow, not labels
    * (a python `else:`/`except:` at module indent legitimately closes a
    * def scope; a C `done:` goto label inside a function must not).
    */
  private val NotLabels = Set("else", "try", "except", "finally",
    "case", "default", "match", "do")
  private val LabelLine = """^[A-Za-z_]\w*:$""".r

  /** Strip quoted string/char literal CONTENTS (quotes kept as empty
    * markers) and the trailing line comment, so bracket balancing sees
    * only code (ADVICE r9: `pat = "("` / `print("(%d" % x)` left a
    * phantom continuation open and genuine declarations for up to 50
    * following lines were silently dropped).
    *
    * `fullSingleQuote` languages treat `'...'` as a string; others get
    * the char-literal rule (strip only when the close is ≤2 chars
    * away) so a Rust lifetime `'a` or an apostrophe never swallows
    * code. An unclosed `"`/`` ` `` swallows the rest of the line — it
    * IS a string start.
    */
  private def stripLiterals(line: String, fullSingleQuote: Boolean,
      lineComment: String): String = {
    val n = line.length
    val sb = new StringBuilder(n)
    def findClose(q: Char, from: Int): Int = {
      var j = from
      while (j < n) {
        if (line(j) == '\\') j += 2
        else if (line(j) == q) return j
        else j += 1
      }
      -1
    }
    var i = 0
    var done = false
    while (i < n && !done) {
      val c = line(i)
      if (c == '"' || c == '`' || c == '\'') {
        val close = findClose(c, i + 1)
        val isStr = c != '\'' || fullSingleQuote ||
          (close >= 0 && close - i - 1 <= 2)
        if (isStr && close >= 0) { sb.append(c).append(c); i = close + 1 }
        else if (isStr) done = true
        else { sb.append(c); i += 1 }
      } else if (lineComment.nonEmpty && line.startsWith(lineComment, i)) {
        done = true
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Advance the python triple-quoted-string state over one line:
    * returns the open delimiter quote char after the line (0 =
    * outside). Used so a line INSIDE a `\"\"\"...\"\"\"` block — even a
    * dedented decl-looking one, the reference fallback's known
    * divergence class (`parsers/base.py:301-383`) — never registers or
    * closes a scope.
    *
    * While OUTSIDE a triple string the scan is comment- and
    * string-aware: a `#` ends the line's code (an odd count of
    * triple-quotes in a comment like `# delimited with \"\"\"` must not
    * flip the state and swallow the rest of the file), and triple
    * markers inside ordinary single-line `'...'`/`"..."` literals are
    * content, not delimiters.
    */
  private def advanceTriple(line: String, state: Char): Char = {
    var st = state
    var q: Char = 0 // line-local ordinary-string state (dies at EOL)
    var i = 0
    val n = line.length
    while (i < n) {
      val c = line(i)
      if (st != 0) {
        val d = if (st == '"') "\"\"\"" else "'''"
        if (line.startsWith(d, i)) { st = 0; i += 3 } else i += 1
      } else if (q != 0) {
        if (c == '\\') i += 2
        else { if (c == q) q = 0; i += 1 }
      } else if (line.startsWith("\"\"\"", i)) { st = '"'; i += 3 }
      else if (line.startsWith("'''", i)) { st = '\''; i += 3 }
      else if (c == '"' || c == '\'') { q = c; i += 1 }
      else if (c == '#') i = n
      else i += 1
    }
    st
  }

  private def dropFunctionNested(lines: Array[String], decls: Seq[Decl],
      isComment: String => Boolean, lineComment: String = "//",
      fullSingleQuote: Boolean = false,
      tripleQuotes: Boolean = false): Seq[Decl] = {
    val declAt = decls.map(d => d.line -> d).toMap
    var open = List.empty[Decl]
    val nested = scala.collection.mutable.Set[Int]()
    // unclosed (/[ balance carried across lines: a line INSIDE a paren
    // continuation (wrapped arg lists, multi-line signatures, callback
    // arguments) is expression interior — it must neither close an
    // open scope nor register a decl, whatever its column (ADVICE r8:
    // column-0 continuation args were ending scopes early). Balance is
    // computed on the literal-stripped line (ADVICE r9), with the
    // 50-line surrender cap kept as the backstop for what the
    // lexer-lite still misses.
    def bal(s: String) =
      s.count(c => c == '(' || c == '[') - s.count(c => c == ')' || c == ']')
    var contOpen = 0
    var contLines = 0
    var inTriple: Char = 0
    lines.zipWithIndex.foreach { case (l, i) =>
      val startsInString = inTriple != 0
      if (tripleQuotes) inTriple = advanceTriple(l, inTriple)
      if (startsInString) {
        // triple-quoted string interior: plain text, whatever it looks
        // like — never a decl, never a scope closer, no bracket count
        if (declAt.contains(i)) nested += i
      } else {
        val t = l.trim
        val inContinuation = contOpen > 0 && contLines < 50
        // a goto/switch-style label (`done:`) is function INTERIOR even
        // at column 0 — it never closes a scope (ADVICE r8)
        val isLabel =
          LabelLine.matches(t) && !NotLabels.contains(t.dropRight(1))
        if (t.nonEmpty && !isComment(t) && !inContinuation && !isLabel &&
            !t.startsWith(")") && !t.startsWith("]")) {
          val ind = declAt.get(i).map(_.indent)
            .getOrElse(l.takeWhile(_.isWhitespace).length)
          open = open.dropWhile(f => ind <= f.indent)
          declAt.get(i).foreach { d =>
            if (open.exists(_.kind == "function")) nested += i
            open = d :: open
          }
        } else if (inContinuation && declAt.contains(i))
          // a decl-looking line INSIDE a continuation is a function
          // expression in argument position — the reference only
          // extracts declaration/declarator forms, never call arguments
          nested += i
        if (!isComment(t)) {
          contOpen = math.max(0,
            contOpen + bal(stripLiterals(l, fullSingleQuote, lineComment)))
          contLines = if (contOpen == 0) 0 else contLines + 1
        }
      }
    }
    decls.filterNot(d => nested.contains(d.line))
  }

  private val braceComment = (t: String) =>
    t.startsWith("//") || t.startsWith("/*") || t.startsWith("*") ||
      t.startsWith("#")

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
        ParentKinds.contains(p.kind) &&
          p.indent < d.indent && p.line < d.line)
        .lastOption
      val chunkType =
        if (d.kind == "function" && parent.nonEmpty) {
          // name == containing type → constructor (csharp.py:290,
          // dart.py:333)
          if (parent.exists(_.name == d.name)) "constructor" else "method"
        } else d.kind
      // Go methods carry their receiver type as the parent even though
      // they are declared at top level (test_go_parser.py: method chunks
      // have a receiver class_name)
      val parentName = parent.map(_.name).getOrElse(d.receiver)
      val hierarchy =
        if (parentName.nonEmpty) s"$parentName.${d.name}" else d.name
      val docstring = {
        val below = extractDocstring(lines, d.line, end)
        if (below.nonEmpty || !DocAboveLanguages.contains(f.language)) below
        else docAbove(lines, d.line)
      }
      CodeChunk(
        chunk_id = chunkId(f.file_path, chunkType, d.name, d.line + 1, end + 1, content),
        file_path = f.file_path, file_hash = f.file_hash, content = content,
        language = f.language, start_line = d.line + 1, end_line = end + 1,
        chunk_type = chunkType, name = d.name, parent_name = parentName,
        hierarchy_path = hierarchy, docstring = docstring,
        signature = lines(d.line).trim, complexity = complexity(content),
        token_count = tokenCount(content),
        calls =
          (if (f.language == "ruby")
            (callNames(content, d.name) ++ rubyCommandCalls(content, d.name))
              .foldLeft(Vector.empty[String])((acc, c) =>
                if (acc.contains(c)) acc else acc :+ c)
          else callNames(content, d.name)),
        imports = importNames(content),
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

  /** Decl kinds that can own nested decls (their children become methods
    * with parent_name / hierarchy_path — rust impl blocks and dart widgets
    * included, per the reference parsers' class_name semantics).
    */
  private val ParentKinds = Set(
    "class", "interface", "module", "trait", "impl", "struct", "enum",
    "widget", "mixin")

  /** Languages whose doc convention is a comment block ABOVE the decl
    * (JSDoc, rustdoc ///, RDoc #, PHPDoc, C# XML ///, dartdoc ///,
    * Javadoc) rather than a string below it (Python).
    */
  private val DocAboveLanguages = Set(
    "javascript", "typescript", "rust", "ruby", "php", "csharp", "dart",
    "java", "go", "c", "cpp", "scala")

  private val DocCommentLine = """^\s*(?:///?|#(?!\[)|/\*\*?|\*)\s?(.*?)\s*(?:\*/)?\s*$""".r
  private val AnnotationLine = """^\s*(?:@\w+.*|#\[.+\]|\[[\w.]+(?:\([^\]]*\))?\])\s*$""".r

  /** First meaningful line of the consecutive comment block immediately
    * above `declLine` (skipping annotation/attribute lines in between).
    */
  private def docAbove(lines: Array[String], declLine: Int): String = {
    var i = declLine - 1
    while (i >= 0 && AnnotationLine.findFirstMatchIn(lines(i)).isDefined) i -= 1
    var acc = List.empty[String]
    while (i >= 0 && DocCommentLine.findFirstMatchIn(lines(i)).isDefined &&
      lines(i).trim.nonEmpty) {
      acc = DocCommentLine.findFirstMatchIn(lines(i)).get.group(1) :: acc
      i -= 1
    }
    acc.map(_.trim).find(_.nonEmpty).getOrElse("")
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

  // ---- HTML (parsers/html.py invariants) -----------------------------

  private val HtmlSectionTags = Set(
    "h1", "h2", "h3", "h4", "h5", "h6", "section", "article", "main",
    "aside", "header", "footer", "nav")
  private val HtmlIgnoreTags = Set("script", "style", "noscript")
  private val HtmlTagRe =
    """(?s)<!--.*?-->|<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:[^>"']|"[^"]*"|'[^']*')*?)/?>""".r
  private val HtmlAttrId = """id\s*=\s*["']([^"']+)["']""".r
  private val HtmlAttrClass = """class\s*=\s*["']([^"']+)["']""".r

  private final case class HtmlSec(tag: String, var tagInfo: String,
      id: String, var content: String, startLine: Int, var endLine: Int)

  private def htmlChunkType(tag: String): String = tag match {
    case "h1" | "h2" | "h3" | "h4" | "h5" | "h6" => "heading"
    case "section" | "article" | "main" => "section"
    case "p" => "paragraph"
    case _ => "content"
  }

  /** Semantic HTML section chunking (`parsers/html.py:17-350`): h1-h6 /
    * section / article / main / aside / header / footer / nav open
    * sections, orphan `<p>` starts an implicit one, script/style/noscript
    * content is dropped, sections carry `tag#id` / `tag.class`
    * identifiers, and small sections are merged (h1 always breaks;
    * merge under 500 chars; a flushed merge under 200 chars is dropped;
    * the final section must reach 20 chars).
    */
  private def htmlChunks(f: FileRecord): Seq[CodeChunk] = {
    val content = f.content
    val sections = scala.collection.mutable.ArrayBuffer[HtmlSec]()
    var current: HtmlSec = null
    var ignore = 0
    var pos = 0
    var line = 1
    def advance(to: Int): Unit = {
      var i = pos
      while (i < to) { if (content.charAt(i) == '\n') line += 1; i += 1 }
      pos = to
    }
    def addText(raw: String): Unit = {
      val t = raw.replaceAll("\\s+", " ").trim
      if (t.nonEmpty && ignore == 0 && current != null) {
        current.content =
          if (current.content.isEmpty) t else current.content + " " + t
        current.endLine = line
      }
    }
    def finalizeCur(): Unit = {
      if (current != null && current.content.trim.nonEmpty) sections += current
      current = null
    }
    for (m <- HtmlTagRe.findAllMatchIn(content)) {
      val text = content.substring(pos, m.start)
      advance(m.start)
      addText(text)
      if (m.group(2) != null) {
        val tag = m.group(2).toLowerCase
        val closing = m.group(1) == "/"
        val attrs = m.group(3)
        if (HtmlIgnoreTags(tag)) {
          if (closing) ignore = math.max(0, ignore - 1) else ignore += 1
        } else if (!closing && HtmlSectionTags(tag)) {
          finalizeCur()
          val id = HtmlAttrId.findFirstMatchIn(attrs).map(_.group(1)).getOrElse("")
          val cls = HtmlAttrClass.findFirstMatchIn(attrs)
            .map(_.group(1).split("\\s+").head).getOrElse("")
          val info =
            if (id.nonEmpty) s"$tag#$id"
            else if (cls.nonEmpty) s"$tag.$cls" else tag
          current = HtmlSec(tag, info, id, "", line, line)
        } else if (!closing && tag == "p" && current == null) {
          current = HtmlSec("p", "p", "", "", line, line)
        } else if (closing && (HtmlSectionTags(tag) || tag == "p")) {
          if (current != null) current.endLine = line
          finalizeCur()
        }
      }
      advance(m.end)
    }
    val tail = content.substring(pos)
    advance(content.length)
    addText(tail)
    finalizeCur()

    // merge small sections (html.py:299-351 semantics)
    val merged = scala.collection.mutable.ArrayBuffer[HtmlSec]()
    var cur: HtmlSec = null
    for (s <- sections) {
      if (s.tag == "h1") {
        if (cur != null) merged += cur
        cur = s.copy()
      } else if (cur == null) cur = s.copy()
      else if (cur.content.length + s.content.length < 500) {
        cur.content += "\n\n" + s.content
        cur.endLine = s.endLine
        if (cur.tagInfo != s.tagInfo) cur.tagInfo += "+" + s.tagInfo
      } else {
        if (cur.content.length >= 200) merged += cur
        cur = s.copy()
      }
    }
    if (cur != null && cur.content.length >= 20) merged += cur

    merged.toSeq.map { s =>
      val tpe = htmlChunkType(s.tag)
      CodeChunk(
        chunk_id = chunkId(f.file_path, tpe, s.tagInfo, s.startLine, s.endLine, s.content),
        file_path = f.file_path, file_hash = f.file_hash, content = s.content,
        language = f.language, start_line = s.startLine, end_line = s.endLine,
        chunk_type = tpe, name = s.tagInfo, parent_name = s.id,
        hierarchy_path = s.tagInfo, docstring = "",
        signature = "", complexity = 1,
        token_count = tokenCount(s.content),
        calls = Nil, imports = Nil, inherits_from = Nil)
    }
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
