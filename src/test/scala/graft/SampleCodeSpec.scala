package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.chunk.Chunker
import graft.core.FileRecord

/** Chunker smoke over the REFERENCE's own AST-test fixtures
  * (`tests/sample_code/` — written by the reference to exercise
  * complexity scoring, decorators, hierarchy, and type annotations).
  * Skipped when the reference checkout is absent.
  */
class SampleCodeSpec extends SparkSpec {

  private val dir = Paths.get("/root/reference/tests/sample_code")

  private def rec(name: String, lang: String): FileRecord = {
    val content = new String(Files.readAllBytes(dir.resolve(name)), "UTF-8")
    FileRecord(name, lang, Chunker.sha256Hex(content),
      new Timestamp(0L), content.length.toLong, content)
  }

  test("python fixture: functions, methods, hierarchy, complexity ordering") {
    assume(Files.isDirectory(dir))
    val chunks = Chunker.chunkFile(rec("ast_test_python.py", "python"))
    val byName = chunks.map(c => c.name -> c).toMap
    // module-level functions
    assert(byName.contains("simple_function"))
    assert(byName.contains("calculate_grade"))
    assert(byName.contains("complex_validator"))
    // classes and their methods with parent linkage
    assert(byName.contains("User") && byName.contains("AuthenticationManager"))
    val auth = chunks.filter(_.parent_name == "AuthenticationManager")
    assert(auth.exists(_.name == "authenticate"))
    assert(auth.exists(_.name == "_generate_token"))
    assert(chunks.exists(c => c.name == "display_name" && c.parent_name == "User"))
    // the fixture is designed so complexity rises across these three
    assert(byName("simple_function").complexity
      < byName("calculate_grade").complexity)
    assert(byName("calculate_grade").complexity
      <= byName("complex_validator").complexity)
    // line ranges are sane and ordered
    assert(chunks.forall(c => c.start_line <= c.end_line))
  }

  test("javascript fixture: functions, arrow consts, classes") {
    assume(Files.isDirectory(dir))
    val chunks = Chunker.chunkFile(rec("ast_test_javascript.js", "javascript"))
    val names = chunks.map(_.name).toSet
    assert(names.contains("simpleGreeting"))
    assert(names.contains("calculateGrade"))
    assert(names.contains("complexValidator"))
    assert(names.contains("User") && names.contains("AuthenticationManager"))
    assert(chunks.exists(c => c.chunk_type == "class"))
  }

  test("typescript fixture: interfaces/types don't break function extraction") {
    assume(Files.isDirectory(dir))
    val chunks = Chunker.chunkFile(rec("ast_test_typescript.ts", "typescript"))
    assert(chunks.nonEmpty)
    assert(chunks.forall(c => c.start_line <= c.end_line))
    assert(chunks.exists(_.chunk_type == "class") ||
      chunks.exists(_.chunk_type == "function"))
  }
}
