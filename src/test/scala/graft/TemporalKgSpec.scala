package graft

import org.apache.spark.sql.functions._

import graft.graph.Kg

/** Temporal KG filters (`knowledge_graph.py:3395-3521`,
  * `core/git_utils.py is_ancestor_commit`): commit-ancestry closure over
  * a merge DAG, entities-at-commit (empty-sha exclusion, ref inclusion,
  * non-ancestor exclusion), callers-at-commit ancestry filtering.
  */
class TemporalKgSpec extends SparkSpec {
  import spark.implicits._

  //      a ← b ← c ← m        (m is a merge of c and x; y is unreachable
  //          x ──────↑         from m's sibling branch tip z)
  //      a ← z
  private def parents = Seq(
    ("b", "a"), ("c", "b"), ("m", "c"), ("m", "x"), ("z", "a"))
    .toDF("commit_hash", "parent_hash")

  test("ancestorClosure walks chains and both merge parents") {
    val anc = Kg.ancestorClosure(parents, "m")
      .as[String].collect().toSet
    assert(anc == Set("m", "c", "x", "b", "a"))
    assert(Kg.ancestorClosure(parents, "z").as[String].collect().toSet ==
      Set("z", "a"))
    // root commit: just itself
    assert(Kg.ancestorClosure(parents, "a").as[String].collect().toSet ==
      Set("a"))
  }

  private def entities = Seq(
    (1L, "build_index", "function", "src/a.py", "a"),
    (2L, "search", "function", "src/b.py", "c"),
    (3L, "helper", "function", "src/c.py", ""), // uncommitted → excluded
    (4L, "search", "method", "src/d.py", "z"),  // not an ancestor of m
    (5L, "merge_only", "function", "src/e.py", "m"))
    .toDF("id", "name", "entity_type", "file_path", "commit_sha")

  test("entitiesAtCommit: ancestors only, ref inclusive, empty sha excluded") {
    val at = Kg.entitiesAtCommit(entities, parents, "m")
      .select("id").as[Long].collect().toSet
    assert(at == Set(1L, 2L, 5L))
    // at an older commit the later entities disappear
    val atB = Kg.entitiesAtCommit(entities, parents, "b")
      .select("id").as[Long].collect().toSet
    assert(atB == Set(1L))
  }

  test("entityHistory: distinct (file, sha) per name, empty sha kept") {
    val ents = Seq(
      (1L, "search", "function", "src/a.py", "c1"),
      (2L, "search", "function", "src/a.py", "c1"), // dup (file, sha)
      (3L, "search", "method", "src/b.py", "c2"),
      (4L, "search", "function", "src/c.py", ""),   // uncommitted still listed
      (5L, "other_fn", "function", "src/d.py", "c3"))
      .toDF("id", "name", "entity_type", "file_path", "commit_sha")
    val h = Kg.entityHistory(ents, "search").collect()
    assert(h.length == 3)
    assert(h.forall(_.getAs[String]("name") == "search"))
    assert(h.map(_.getAs[String]("commit_sha")).toSet == Set("c1", "c2", ""))
    assert(Kg.entityHistory(ents, "nope").isEmpty)
  }

  test("callersAtCommit: callee by name, caller ancestry filtered") {
    val calls = Seq(
      (1L, 2L, "CALLS"),  // build_index(a) → search: visible at m
      (4L, 2L, "CALLS"),  // search(z) → search: z not ancestor of m
      (3L, 2L, "CALLS"),  // helper has empty sha → excluded
      (5L, 4L, "CALLS"),  // merge_only → search(method entity, same name)
      (1L, 5L, "IMPORTS") // wrong rel_type → ignored
    ).toDF("src", "dst", "rel_type")
    val out = Kg.callersAtCommit(calls, entities, "search", parents, "m")
      .collect()
    val byCaller = out.map(r => (r.getAs[Long]("caller_id"),
      r.getAs[String]("callee_name"))).toSet
    assert(byCaller == Set((1L, "search"), (5L, "search")))
    val row = out.find(_.getAs[Long]("caller_id") == 1L).get
    assert(row.getAs[String]("caller_name") == "build_index")
    assert(row.getAs[String]("caller_file") == "src/a.py")
    assert(row.getAs[String]("caller_commit_sha") == "a")
  }
}
