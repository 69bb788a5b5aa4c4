package graft

import java.sql.Timestamp

import graft.chunk.Chunker
import graft.core.FileRecord

/** String-literal fidelity for the line-scanner chunker (round-9
  * verdict item #5 + the r9 ADVICE regression): bracket balancing must
  * ignore quoted contents and trailing comments, and python
  * triple-quoted strings are plain text even when they contain
  * dedented decl-shaped lines (the reference fallback's divergence
  * class, `parsers/base.py:301-383`).
  */
class StringLiteralChunkSpec extends SparkSpec {

  private def rec(path: String, lang: String, content: String) =
    FileRecord(path, lang, Chunker.sha256Hex(content),
      new Timestamp(0L), content.length.toLong, content)

  private def names(path: String, lang: String, content: String): Set[String] =
    Chunker.chunkFile(rec(path, lang, content)).map(_.name).toSet

  test("unbalanced bracket inside a python string does not open a " +
      "phantom continuation (ADVICE r9)") {
    val src =
      """pat = "("
        |
        |def alpha():
        |    return 1
        |
        |print("(%d" % 2)
        |
        |def beta():
        |    return 2
        |""".stripMargin
    val got = names("/r/a.py", "python", src)
    assert(got.contains("alpha") && got.contains("beta"), got)
  }

  test("dedented decl-shaped lines inside a triple-quoted string are " +
      "text, not chunks; scope survives the string") {
    val src =
      """EXAMPLE = '''
        |def fake_one():
        |    return "not real"
        |
        |class FakeClass:
        |    pass
        |'''
        |
        |def real_after():
        |    return 1
        |""".stripMargin
    val got = names("/r/b.py", "python", src)
    assert(!got.contains("fake_one") && !got.contains("FakeClass"), got)
    assert(got.contains("real_after"), got)
  }

  test("doctest def inside a docstring is not extracted and does not " +
      "close the enclosing function's scope") {
    val src =
      "def outer():\n" +
      "    \"\"\"Example.\n" +
      "\n" +
      "    >>> def helper():\n" +
      "    ...     pass\n" +
      "\n" +
      "def looks_toplevel_but_is_string():\n" +
      "    still inside the docstring\n" +
      "    \"\"\"\n" +
      "    return 1\n" +
      "\n" +
      "def after():\n" +
      "    return 2\n"
    val got = names("/r/c.py", "python", src)
    assert(got == Set("outer", "after"), got)
  }

  test("triple-quote markers inside comments or ordinary strings do " +
      "not flip the string state") {
    val src =
      "# python docstrings are delimited with \"\"\"\n" +
      "DELIM = 'contains \"\"\" inside a normal string'\n" +
      "\n" +
      "def alpha():\n" +
      "    return 1\n" +
      "\n" +
      "def beta():  # trailing ''' in a comment\n" +
      "    return 2\n" +
      "\n" +
      "def gamma():\n" +
      "    return 3\n"
    val got = names("/r/g.py", "python", src)
    assert(Set("alpha", "beta", "gamma").subsetOf(got), got)
  }

  test("brackets inside JS string literals and trailing comments are " +
      "ignored by the continuation tracker") {
    val src =
      """const re = '(';
        |const other = "[[";  // comment with ) and ] and (
        |function alpha() {
        |  return 1;
        |}
        |function beta() {
        |  return 2;
        |}
        |""".stripMargin
    val got = names("/r/d.js", "javascript", src)
    assert(got.contains("alpha") && got.contains("beta"), got)
  }

  test("rust lifetimes and char literals do not start phantom strings") {
    val src =
      """fn first<'a>(x: &'a str) -> &'a str {
        |    let c = '(';
        |    x
        |}
        |
        |fn second() -> i32 {
        |    7
        |}
        |""".stripMargin
    val got = names("/r/e.rs", "rust", src)
    assert(got.contains("first") && got.contains("second"), got)
  }

  test("a real multi-line paren continuation still suppresses " +
      "decl-shaped argument lines") {
    val src =
      """handlers = register(
        |    "x",
        |def not_a_decl(): pass,
        |)
        |
        |def genuine():
        |    return 3
        |""".stripMargin
    val got = names("/r/f.py", "python", src)
    assert(!got.contains("not_a_decl"), got)
    assert(got.contains("genuine"), got)
  }
}
