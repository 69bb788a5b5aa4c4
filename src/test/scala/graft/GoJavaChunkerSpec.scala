package graft

import java.sql.Timestamp

import graft.chunk.Chunker
import graft.core.FileRecord

/** Go/Java chunker fidelity — mirrors the invariants of the reference's
  * `tests/test_go_parser.py` and `tests/test_java_parser.py`, plus the
  * cognitive-complexity / nesting-depth collectors
  * (`analysis/collectors/complexity.py:221-362,459-534`).
  */
class GoJavaChunkerSpec extends SparkSpec {

  private def rec(path: String, lang: String, content: String) =
    FileRecord(path, lang, Chunker.sha256Hex(content),
      new Timestamp(0L), content.length.toLong, content)

  private val goCode =
    """package main
      |
      |import (
      |    "fmt"
      |    "errors"
      |)
      |
      |// User represents a user entity.
      |type User struct {
      |    ID   int
      |    Name string
      |}
      |
      |// UserRepository defines user repository interface.
      |type UserRepository interface {
      |    FindByID(id int) (*User, error)
      |    Save(user *User) error
      |}
      |
      |// FindByID retrieves a user by ID.
      |func (u *User) FindByID(id int) (*User, error) {
      |    if id <= 0 {
      |        return nil, errors.New("invalid ID")
      |    }
      |    return u, nil
      |}
      |
      |// NewUser creates a new user.
      |func NewUser(id int, name string) *User {
      |    return &User{ID: id, Name: name}
      |}
      |""".stripMargin

  test("go: struct and interface type declarations become typed chunks") {
    val chunks = Chunker.chunkFile(rec("test.go", "go", goCode))
    val types = chunks.filter(c => c.chunk_type == "struct" || c.chunk_type == "interface")
    assert(types.length >= 2)
    val struct = chunks.filter(_.chunk_type == "struct")
    assert(struct.nonEmpty && struct.head.name == "User")
    assert(struct.head.language == "go")
    assert(chunks.filter(_.chunk_type == "interface").head.name == "UserRepository")
  }

  test("go: receiver methods carry the receiver type and complexity > 1") {
    val chunks = Chunker.chunkFile(rec("test.go", "go", goCode))
    val methods = chunks.filter(_.chunk_type == "method")
    assert(methods.nonEmpty)
    val find = methods.find(_.name == "FindByID").get
    assert(find.parent_name == "User") // receiver type
    assert(find.complexity > 1)        // the if statement
    assert(find.return_type == "(*User, error)")
  }

  test("go: top-level functions extract parameters") {
    val chunks = Chunker.chunkFile(rec("test.go", "go", goCode))
    val fns = chunks.filter(_.chunk_type == "function")
    assert(fns.nonEmpty)
    val nu = fns.find(_.name == "NewUser").get
    assert(nu.parameters.length >= 2)
    assert(nu.parameters == Seq("id int", "name string"))
    assert(nu.return_type == "*User")
  }

  test("go: empty file produces no chunks; complex file finds all kinds") {
    assert(Chunker.chunkFile(rec("empty.go", "go", "")).isEmpty)
    val complex =
      """package service
        |
        |type Service struct {
        |    repo Repository
        |}
        |
        |func NewService(repo Repository) *Service {
        |    return &Service{repo: repo}
        |}
        |
        |func (s *Service) Process(ctx context.Context, id int) error {
        |    if id <= 0 {
        |        return errors.New("invalid ID")
        |    }
        |    user, err := s.repo.FindByID(ctx, id)
        |    if err != nil {
        |        return err
        |    }
        |    return nil
        |}
        |""".stripMargin
    val kinds = Chunker.chunkFile(rec("c.go", "go", complex)).map(_.chunk_type).toSet
    assert(kinds.contains("struct") && kinds.contains("function") && kinds.contains("method"))
  }

  private val javaCode =
    """package com.example;
      |
      |import java.util.List;
      |
      |/**
      | * Sample class for testing.
      | */
      |@Service
      |public class UserService {
      |
      |    public User findById(Long id) {
      |        if (id == null) {
      |            throw new IllegalArgumentException("ID cannot be null");
      |        }
      |        return repository.findById(id);
      |    }
      |
      |    public void save(User user) {
      |        repository.save(user);
      |    }
      |}
      |""".stripMargin

  test("java: class with annotation; methods with return types") {
    val chunks = Chunker.chunkFile(rec("test.java", "java", javaCode))
    val classes = chunks.filter(_.chunk_type == "class")
    assert(classes.length >= 1)
    assert(classes.head.name == "UserService")
    assert(classes.head.decorators.nonEmpty && classes.head.decorators.contains("Service"))

    val methods = chunks.filter(_.chunk_type == "method")
    assert(methods.length >= 2)
    val find = methods.find(_.name == "findById").get
    assert(find.return_type == "User")
    assert(find.parent_name == "UserService")
    assert(find.complexity > 1)
    assert(find.parameters == Seq("Long id"))
  }

  test("java: interface with abstract method declarations") {
    val code =
      """package com.example;
        |
        |public interface UserRepository {
        |    Optional<User> findById(Long id);
        |    List<User> findAll();
        |}
        |""".stripMargin
    val chunks = Chunker.chunkFile(rec("r.java", "java", code))
    val iface = chunks.filter(_.chunk_type == "interface")
    assert(iface.length == 1 && iface.head.name == "UserRepository")
    val methods = chunks.filter(_.chunk_type == "method")
    assert(methods.map(_.name).toSet == Set("findById", "findAll"))
    assert(methods.find(_.name == "findById").get.return_type == "Optional")
    assert(chunks.filter(c => c.chunk_type == "java").isEmpty)
  }

  test("java: empty file produces no chunks") {
    assert(Chunker.chunkFile(rec("e.java", "java", "")).isEmpty)
  }

  test("cognitive complexity penalizes nesting; cyclomatic does not") {
    val flat =
      """def f(x):
        |    if x > 0:
        |        return 1
        |    if x < 0:
        |        return 2
        |    return 0
        |""".stripMargin
    val nested =
      """def f(x):
        |    if x > 0:
        |        if x > 10:
        |            return 1
        |    return 0
        |""".stripMargin
    // flat: two ifs at nesting 0 → 2; nested: 1 + (1+1) → 3
    assert(Chunker.cognitiveComplexity(flat) == 2)
    assert(Chunker.cognitiveComplexity(nested) == 3)
    // cyclomatic treats both the same (1 + 2 ifs)
    assert(Chunker.complexity(flat) == Chunker.complexity(nested))
  }

  test("cognitive complexity counts booleans, jumps, and case clauses") {
    val code =
      """def f(xs):
        |    for x in xs:
        |        if x > 0 and x < 10 or x == 42:
        |            break
        |    return 0
        |""".stripMargin
    // for(+1) + if(+1+1 nesting) + and/or(+2) + break(+1) = 6
    assert(Chunker.cognitiveComplexity(code) == 6)
  }

  test("nesting depth tracks the deepest control stack") {
    val code =
      """def process():
        |    if condition:
        |        for item in items:
        |            while busy:
        |                if ready:
        |                    go()
        |    return 0
        |""".stripMargin
    assert(Chunker.nestingDepth(code) == 4)
    assert(Chunker.nestingDepth("def g():\n    return 1\n") == 0)
  }

  test("go/java chunks flow through the index pipeline (schema intact)") {
    import spark.implicits._
    val files = Seq(rec("a.go", "go", goCode), rec("b.java", "java", javaCode))
    val chunks = files.toDS().flatMap(Chunker.chunkFile _).toDF()
    assert(chunks.count() > 0)
    assert(chunks.columns.contains("cognitive_complexity"))
    assert(chunks.columns.contains("parameters"))
    val byLang = chunks.groupBy("language").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.keySet == Set("go", "java"))
  }
}
