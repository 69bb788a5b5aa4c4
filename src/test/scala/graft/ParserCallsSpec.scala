package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.chunk.Chunker
import graft.core.FileRecord

/** The reference's cross-language call-extraction suite
  * (`tests/unit/parsers/test_parser_calls.py`) ported verbatim as golden
  * specs: each snippet is the reference's own fixture, each assertion the
  * reference's own invariant (named callee appears in chunk.calls).
  * Plus the python traversal invariants the reference's tree-sitter walk
  * implies (`parsers/python.py:188-192`): nested defs do NOT become
  * chunks, decorated (incl. parameterized decorators) defs do, and a
  * declared name is never reported as a call.
  */
class ParserCallsSpec extends AnyFunSuite {

  private def rec(lang: String, path: String, content: String) =
    FileRecord(path, lang, "h", new java.sql.Timestamp(0),
      content.length.toLong, content)

  private def allCalls(lang: String, path: String, src: String): Seq[String] =
    Chunker.chunkFile(rec(lang, path, src)).flatMap(_.calls)

  test("go: selector and plain identifier calls (test_go_parser_calls)") {
    val src = """package main
                |
                |import "fmt"
                |
                |func greet(name string) {
                |    fmt.Println("Hello", name)
                |    doWork()
                |}
                |
                |func doWork() {}
                |""".stripMargin
    val calls = allCalls("go", "test.go", src)
    assert(calls.exists(_.contains("Println")), s"expected Println in $calls")
    assert(calls.contains("doWork"), s"expected doWork in $calls")
  }

  test("rust: function and method calls (test_rust_parser_calls)") {
    val src = """fn process(data: &str) -> String {
                |    let result = helper(data);
                |    result.to_uppercase()
                |}
                |
                |fn helper(s: &str) -> String {
                |    s.to_string()
                |}
                |""".stripMargin
    val calls = allCalls("rust", "test.rs", src)
    assert(calls.contains("helper"), s"expected helper in $calls")
    assert(calls.exists(Set("to_uppercase", "to_string")),
      s"expected a method call in $calls")
  }

  test("java: method invocations (test_java_parser_calls)") {
    val src = """public class Greeter {
                |    public void greet(String name) {
                |        System.out.println("Hello " + name);
                |        validate(name);
                |    }
                |
                |    private void validate(String name) {}
                |}
                |""".stripMargin
    val calls = allCalls("java", "Greeter.java", src)
    assert(calls.contains("println"), s"expected println in $calls")
    assert(calls.contains("validate"), s"expected validate in $calls")
  }

  test("csharp: invocation expressions (test_csharp_parser_calls)") {
    val src = """using System;
                |
                |public class Greeter
                |{
                |    public void Greet(string name)
                |    {
                |        Console.WriteLine("Hello " + name);
                |        Validate(name);
                |    }
                |
                |    private void Validate(string name) { }
                |}
                |""".stripMargin
    val calls = allCalls("csharp", "Greeter.cs", src)
    assert(calls.contains("WriteLine"), s"expected WriteLine in $calls")
    assert(calls.contains("Validate"), s"expected Validate in $calls")
  }

  test("ruby: paren-less command calls and plain calls (test_ruby_parser_calls)") {
    val src = """class Greeter
                |  def greet(name)
                |    puts "Hello #{name}"
                |    validate(name)
                |  end
                |
                |  def validate(name)
                |    raise ArgumentError if name.empty?
                |  end
                |end
                |""".stripMargin
    val calls = allCalls("ruby", "greeter.rb", src)
    assert(calls.contains("puts"), s"expected puts in $calls")
    assert(calls.contains("validate"), s"expected validate in $calls")
  }

  test("php: function and member calls (test_php_parser_calls)") {
    val src = """<?php
                |
                |class Greeter {
                |    public function greet(string $name): void {
                |        echo strtoupper($name);
                |        $this->validate($name);
                |    }
                |
                |    private function validate(string $name): void {}
                |}
                |""".stripMargin
    val calls = allCalls("php", "Greeter.php", src)
    assert(calls.contains("strtoupper"), s"expected strtoupper in $calls")
    assert(calls.contains("validate"), s"expected validate in $calls")
  }

  test("dart: print and plain calls (test_dart_parser_calls)") {
    val src = """void greet(String name) {
                |  print('Hello $name');
                |  validate(name);
                |}
                |
                |void validate(String name) {
                |  assert(name.isNotEmpty);
                |}
                |""".stripMargin
    val calls = allCalls("dart", "greeter.dart", src)
    assert(calls.contains("print"), s"expected print in $calls")
    assert(calls.contains("validate"), s"expected validate in $calls")
  }

  test("declared names are not calls (tree-sitter call-node semantics)") {
    val src = """class Greeter
                |  def greet(name)
                |    validate(name)
                |  end
                |
                |  def validate(name)
                |  end
                |end
                |""".stripMargin
    val classChunk = Chunker.chunkFile(rec("ruby", "g.rb", src))
      .find(_.chunk_type == "class").get
    // the class body contains `def greet(...)` / `def validate(...)`;
    // only the REAL call site (validate(name) inside greet) may count
    assert(!classChunk.calls.contains("greet"),
      s"declaration leaked into calls: ${classChunk.calls}")
  }

  test("python: nested defs stay inside their enclosing function chunk") {
    val src = """def outer(x):
                |    def inner(y):
                |        return y * 2
                |    return inner(x)
                |
                |def other():
                |    pass
                |""".stripMargin
    val chunks = Chunker.chunkFile(rec("python", "n.py", src))
    assert(chunks.map(_.name).sorted == Seq("other", "outer"),
      s"nested def must not be its own chunk: ${chunks.map(_.name)}")
    val outer = chunks.find(_.name == "outer").get
    assert(outer.content.contains("def inner"),
      "nested def body must stay in the outer chunk")
    assert(outer.calls.contains("inner"),
      s"call to the nested fn is still a call: ${outer.calls}")
  }

  test("python: class methods still chunk under a nested-free traversal") {
    val src = """class C:
                |    def m(self):
                |        def helper():
                |            pass
                |        return helper()
                |    def m2(self):
                |        return 1
                |""".stripMargin
    val chunks = Chunker.chunkFile(rec("python", "c.py", src))
    assert(chunks.map(_.name).sorted == Seq("C", "m", "m2"),
      s"got ${chunks.map(_.name)}")
  }

  test("python: parameterized decorators captured, def still extracted") {
    val src = """import functools
                |
                |@retry(times=3, backoff=2.0)
                |def fetch_data(url):
                |    return http_get(url)
                |
                |@app.route("/x", methods=["GET"])
                |@functools.cache
                |async def handler(req):
                |    return respond(req)
                |""".stripMargin
    val chunks = Chunker.chunkFile(rec("python", "d.py", src))
    val fetch = chunks.find(_.name == "fetch_data").get
    assert(fetch.decorators == Seq("retry"), s"got ${fetch.decorators}")
    assert(fetch.calls.contains("http_get"))
    val handler = chunks.find(_.name == "handler").get
    assert(handler.decorators == Seq("app.route", "functools.cache"),
      s"got ${handler.decorators}")
  }
}
