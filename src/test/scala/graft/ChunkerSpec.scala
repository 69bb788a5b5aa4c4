package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.chunk.Chunker
import graft.core.FileRecord

class ChunkerSpec extends AnyFunSuite {

  private def rec(path: String, lang: String, content: String) =
    FileRecord(path, lang, Chunker.sha256Hex(content),
      new java.sql.Timestamp(0L), content.length.toLong, content)

  private val py = rec("/repo/a.py", "python", Seq(
    "import os",
    "",
    "class Widget:",
    "    \"\"\"A widget.\"\"\"",
    "",
    "    def render(self, x):",
    "        \"\"\"Render the widget.\"\"\"",
    "        if x > 0:",
    "            return x",
    "        return 0",
    "",
    "def main():",
    "    w = Widget()",
    "    return w.render(1)",
    "").mkString("\n"))

  test("python: classes, methods, functions extracted with parents") {
    val chunks = Chunker.chunkFile(py)
    val byName = chunks.map(c => c.name -> c).toMap
    assert(byName.contains("Widget") && byName.contains("render") && byName.contains("main"))
    assert(byName("render").chunk_type == "method")
    assert(byName("render").parent_name == "Widget")
    assert(byName("render").hierarchy_path == "Widget.render")
    assert(byName("main").chunk_type == "function")
    assert(byName("main").parent_name == "")
    assert(byName("Widget").chunk_type == "class")
  }

  test("js: reference Counter fixture — arrows in expressions and " +
      "callback-nested decls are not chunks (tests/test_js_parser.py)") {
    // ported from the reference's JS parser suite: `increment` (an
    // arrow nested inside Counter) and the `item => ...` callback are
    // never chunks — the traversal extracts Counter/fetchData/
    // calculateArea/DataProcessor(+methods) and does not recurse into
    // extracted functions (javascript.py:171-174, 249-256: anonymous
    // arrows return [] and still stop recursion)
    val f = rec("/repo/counter.js", "javascript", Seq(
      "function Counter(props) {",
      "    const [count, setCount] = useState(0);",
      "",
      "    const increment = () => {",
      "        setCount(count + 1);",
      "    };",
      "",
      "    return count;",
      "}",
      "",
      "class DataProcessor {",
      "    addItem(item) {",
      "        this.data.push(item);",
      "    }",
      "    processAll() {",
      "        return this.data.map(item => item.toString().toUpperCase());",
      "    }",
      "}",
      "",
      "const calculateArea = (radius) => {",
      "    return Math.PI * radius * radius;",
      "};",
      "",
      "async function fetchData(url) {",
      "    return await fetch(url);",
      "}",
      "").mkString("\n"))
    val names = Chunker.chunkFile(f).map(_.name).toSet
    assert(names == Set("Counter", "DataProcessor", "addItem",
      "processAll", "calculateArea", "fetchData"))
  }

  test("ts: reference TypeScript fixture — interfaces, generic " +
      "functions, methods with class context (tests/test_js_parser.py)") {
    val f = rec("/repo/svc.ts", "typescript", Seq(
      "interface User {",
      "    id: number;",
      "    name: string;",
      "}",
      "",
      "class UserService {",
      "    private users: User[] = [];",
      "",
      "    addUser(user: User): void {",
      "        this.users.push(user);",
      "    }",
      "",
      "    findById(id: number): User | undefined {",
      "        return this.users.find(user => user.id === id);",
      "    }",
      "}",
      "",
      "interface ApiResponse<T> {",
      "    data: T;",
      "}",
      "",
      "async function fetchUser(id: number): Promise<ApiResponse<User>> {",
      "    return (await fetch(`/api/users/${id}`)).json();",
      "}",
      "",
      "type UserCallback = (user: User) => void;",
      "",
      "function processUsers<T extends User>(users: T[], cb: UserCallback): void {",
      "    users.forEach(cb);",
      "}",
      "").mkString("\n"))
    val chunks = Chunker.chunkFile(f)
    val byName = chunks.map(c => c.name -> c).toMap
    // generic function declarations chunk (the tree-sitter traversal
    // extracts function_declaration regardless of type parameters)
    assert(byName.contains("processUsers"))
    assert(byName.contains("fetchUser"))
    assert(byName("findById").parent_name == "UserService")
    assert(byName.contains("User") && byName.contains("ApiResponse"))
    // the `user => user.id === id` callback and the type alias are
    // expression/type constructs, never chunks
    assert(!byName.contains("UserCallback"))
    assert(chunks.map(_.name).count(_ == "user") == 0)
  }

  test("js: decls in argument position / callback bodies are suppressed") {
    // expression interior: a function expression passed as a call
    // argument, and a named function declared inside a multi-line
    // callback, are both unreachable to the reference's traversal
    val f = rec("/repo/cb.js", "javascript", Seq(
      "function outer() {",
      "  register(",
      "    function helper() { return 1; }",  // argument position
      "  );",
      "}",
      "",
      "items.forEach((item) => {",
      "  function inner(x) {",                // inside callback body
      "    return x;",
      "  }",
      "  inner(item);",
      "});",
      "",
      "function after() { return 2; }",
      "").mkString("\n"))
    val names = Chunker.chunkFile(f).map(_.name).toSet
    assert(names == Set("outer", "after"))
  }

  test("c-style: goto labels and column-0 continuation args do not end " +
      "an open function scope") {
    // ADVICE r8: a column-0 label/continuation line inside a function
    // body must not close the scope — decls after it are still nested
    val f = rec("/repo/s.scala", "scala", Seq(
      "def process(a: Int,",
      "b: Int): Int = {",                // column-0 continuation arg
      "  def helper(x: Int) = x + 1",    // nested -> dropped
      "  helper(a) + b",
      "}",
      "",
      "def standalone(): Int = 7",
      "").mkString("\n"))
    val names = Chunker.chunkFile(f).map(_.name).toSet
    assert(names == Set("process", "standalone"))
  }

  test("python: lambda assignments are not function chunks") {
    // the reference only extracts function_definition nodes — a lambda
    // in an assignment (or any expression) never chunks
    val f = rec("/repo/lam.py", "python", Seq(
      "square = lambda x: x * x",
      "",
      "def real():",
      "    return square(2)",
      "").mkString("\n"))
    val chunks = Chunker.chunkFile(f)
    // the assignment statement lands in the module chunk (the
    // reference's ModuleExtractor emits one for module-level code);
    // the lambda itself must never be a function chunk
    assert(chunks.filter(_.chunk_type == "function").map(_.name) ==
      Seq("real"))
    assert(!chunks.exists(_.name == "square"))
  }

  test("python: decorator-wrapped nested def stays inside its function") {
    // decorated_definition is a plain container to the traversal: a
    // decorated def nested in a function is still unreachable (the
    // function never recurses); a decorated module-level def chunks
    val f = rec("/repo/deco.py", "python", Seq(
      "def outer():",
      "    @functools.cache",
      "    def cached(x):",               // nested (decorated) -> dropped
      "        return x",
      "    return cached(1)",
      "",
      "@app.route(",
      "    '/health',",                   // multi-line decorator args
      ")",
      "def health():",                    // module-level decorated -> kept
      "    return 'ok'",
      "").mkString("\n"))
    val byName = Chunker.chunkFile(f).map(c => c.name -> c).toMap
    assert(byName.keySet == Set("outer", "health"))
    assert(byName("health").chunk_type == "function")
  }

  test("python: indented module-level defs after a function are kept") {
    // a def inside `if TYPE_CHECKING:` / `try:` is module-scope to the
    // tree-sitter traversal even though it is indented and FOLLOWS a
    // function — only defs truly inside an open function are dropped
    val f = rec("/repo/tc.py", "python", Seq(
      "def first():",
      "    def inner():",      // genuinely nested -> dropped
      "        return 1",
      "    return inner()",
      "",
      "if TYPE_CHECKING:",
      "    def stub(x):",      // module-scope under a plain block -> kept
      "        return x",
      "",
      "try:",
      "    def fallback():",   // same
      "        pass",
      "except ImportError:",
      "    pass",
      "").mkString("\n"))
    val names = Chunker.chunkFile(f).map(_.name).toSet
    assert(names.contains("first") && names.contains("stub")
      && names.contains("fallback"))
    assert(!names.contains("inner"))
  }

  test("python: a class nested inside a function is not extracted") {
    // the reference traversal stops at function_definition without
    // recursing, so neither the class nor its methods become chunks
    val f = rec("/repo/nc.py", "python", Seq(
      "def factory():",
      "    class Local:",
      "        def run(self):",
      "            return 1",
      "    return Local",
      "",
      "class Top:",
      "    def ok(self):",
      "        return 2",
      "").mkString("\n"))
    val names = Chunker.chunkFile(f).map(_.name).toSet
    assert(names.contains("factory") && names.contains("Top")
      && names.contains("ok"))
    assert(!names.contains("Local") && !names.contains("run"))
  }

  test("line ranges are 1-based inclusive and within file") {
    val chunks = Chunker.chunkFile(py)
    chunks.foreach { c =>
      assert(c.start_line >= 1 && c.end_line >= c.start_line)
    }
    val render = chunks.find(_.name == "render").get
    assert(render.start_line == 6 && render.end_line == 10)
  }

  test("chunk ids deterministic") {
    val a = Chunker.chunkFile(py).map(_.chunk_id)
    val b = Chunker.chunkFile(py).map(_.chunk_id)
    assert(a == b)
    assert(a.distinct.size == a.size)
  }

  test("docstring and complexity extracted") {
    val chunks = Chunker.chunkFile(py)
    val render = chunks.find(_.name == "render").get
    assert(render.docstring == "Render the widget.")
    assert(render.complexity == 2) // 1 + one `if`
  }

  test("calls and imports extracted") {
    val chunks = Chunker.chunkFile(py)
    val main = chunks.find(_.name == "main").get
    assert(main.calls.contains("Widget"))
    val header = chunks.find(_.name == "<module>").get
    assert(header.imports.contains("os"))
  }

  test("markdown: header sections with hierarchy") {
    val md = rec("/repo/g.md", "markdown",
      "# Top\n\nintro\n\n## Sub One\n\nbody\n\n### Deep\n\nmore\n\n## Sub Two\n\nend\n")
    val chunks = Chunker.chunkFile(md)
    val names = chunks.map(_.name)
    assert(names == Seq("Top", "Sub One", "Deep", "Sub Two"))
    assert(chunks.find(_.name == "Deep").get.parent_name == "Sub One")
    assert(chunks.forall(_.chunk_type == "doc_section"))
  }

  test("javascript: functions, arrows, classes") {
    val js = rec("/repo/s.js", "javascript",
      """import { x } from "./x";
        |export function alpha(a) {
        |  return a + 1;
        |}
        |const beta = (b) => b * 2;
        |export class Gamma {
        |  delta() { return 3; }
        |}
        |""".stripMargin)
    val chunks = Chunker.chunkFile(js)
    val names = chunks.map(_.name)
    assert(names.contains("alpha") && names.contains("beta") && names.contains("Gamma"))
  }

  test("python: multi-line signatures carry their full parameter list") {
    val f = rec("/repo/ml.py", "python", Seq(
      "def configure(",
      "    host,",
      "    port=8080,",
      "    *,",
      "    timeout=None,",
      "):",
      "    return host, port, timeout",
      "",
      "class Server(",
      "        BaseServer,",
      "        LoggingMixin):",
      "    def start(self):",
      "        return 1",
      "").mkString("\n"))
    val byName = Chunker.chunkFile(f).map(c => c.name -> c).toMap
    // reference reads the whole parameters node (base.py parameters);
    // the joined signature must see every line of the param list
    assert(byName("configure").chunk_type == "function")
    assert(byName.contains("start") && byName("start").chunk_type == "method")
    assert(byName("start").parent_name == "Server")
  }

  test("javascript: arrows nested inside a function are not chunks") {
    // the reference's traversal extracts function_declaration without
    // recursing (javascript.py:171-174) — test_js_parser.py's fixture
    // has `const increment = () =>` INSIDE Counter and expects only the
    // top-level entities
    val f = rec("/repo/counter.js", "javascript", Seq(
      "function Counter(props) {",
      "    const increment = () => {",
      "        setCount(count + 1);",
      "    };",
      "    return increment;",
      "}",
      "",
      "const calculateArea = (radius) => {",
      "    return Math.PI * radius * radius;",
      "};",
      "",
      "class DataProcessor {",
      "    addItem(item) {",
      "        this.data.push(item);",
      "    }",
      "}",
      "").mkString("\n"))
    val names = Chunker.chunkFile(f).map(_.name).toSet
    assert(names.contains("Counter") && names.contains("calculateArea"))
    assert(names.contains("DataProcessor") && names.contains("addItem"))
    assert(!names.contains("increment"))
  }

  test("rust: a helper fn nested inside a fn is part of its parent chunk") {
    val f = rec("/repo/n.rs", "rust", Seq(
      "fn outer(x: i32) -> i32 {",
      "    fn helper(y: i32) -> i32 {",
      "        y * 2",
      "    }",
      "    helper(x)",
      "}",
      "",
      "impl Widget {",
      "    fn render(&self) -> String {",
      "        String::new()",
      "    }",
      "}",
      "").mkString("\n"))
    val chunks = Chunker.chunkFile(f)
    val names = chunks.map(_.name).toSet
    assert(names.contains("outer") && names.contains("render"))
    assert(!names.contains("helper"))
    val outer = chunks.find(_.name == "outer").get
    assert(outer.content.contains("fn helper"))
  }

  test("unknown language falls back to fixed windows") {
    val txt = rec("/repo/big.txt", "text", (1 to 100).map(i => s"line $i").mkString("\n"))
    val chunks = Chunker.chunkFile(txt)
    assert(chunks.size == 3)
    assert(chunks.head.start_line == 1 && chunks.head.end_line == 40)
    assert(chunks.last.end_line == 100)
  }
}
