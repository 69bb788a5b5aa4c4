package graft

import org.apache.spark.sql.functions._

import graft.analyze.Analytics
import graft.graph.Kg
import graft.ingest.GitLog
import graft.search.SearchEngine

class GraphAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val chunks = new SearchEngine(spark).buildIndex(sampleRepo)._1.cache()
  private lazy val kg = Kg.fromChunks(chunks)

  test("kg builds vertices and typed edges from chunks") {
    val labels = kg.vertices.select("label").distinct().as[String].collect().toSet
    assert(Set("function", "class", "method", "file", "module").subsetOf(labels))
    val rels = kg.edges.select("rel_type").distinct().as[String].collect().toSet
    assert(Set("CONTAINS", "CALLS", "IMPORTS", "INHERITS").subsetOf(rels))
    // ConfigLoader extends FileParser → INHERITS edge
    val inh = kg.edges.filter(col("rel_type") === "INHERITS").collect()
    assert(inh.exists(r => r.getAs[String]("src").endsWith("ConfigLoader") &&
      r.getAs[String]("dst").endsWith("FileParser")))
  }

  test("one-hop from FileParser reaches its methods via CONTAINS") {
    val fp = kg.vertices.filter(col("name") === "FileParser").select("id")
    val related = Kg.oneHop(kg.edges, fp).as[String].collect().toSet
    assert(related.exists(_.endsWith("FileParser.parse_file")))
  }

  test("calls edge: load_config calls parse_file (cross-class resolution)") {
    val calls = kg.edges.filter(col("rel_type") === "CALLS").collect()
    assert(calls.exists(r => r.getAs[String]("src").endsWith("load_config") &&
      r.getAs[String]("dst").endsWith("parse_file")))
  }

  test("related: kg_query keyword dispatch over directions") {
    val calls = Kg.related(kg, "load_config", Some("calls"))
      .collect().map(_.getAs[String]("name"))
    assert(calls.contains("parse_file"))
    val callers = Kg.related(kg, "parse_file", Some("called_by"))
      .collect().map(_.getAs[String]("name"))
    assert(callers.contains("load_config"))
    val contained = Kg.related(kg, "FileParser", Some("contains"))
      .collect().map(_.getAs[String]("name"))
    assert(contained.contains("parse_file"))
    val container = Kg.related(kg, "parse_file", Some("contained_by"))
      .collect().map(_.getAs[String]("name"))
    assert(container.contains("FileParser"))
    // unfiltered = 1-hop both directions, superset of each
    val all = Kg.related(kg, "parse_file", None, limit = 100)
      .collect().map(_.getAs[String]("name"))
    assert(all.contains("load_config") && all.contains("FileParser"))
  }

  test("bfs paths capture call chains without cycles") {
    val loadId = kg.vertices.filter(col("name") === "ConfigLoader")
      .select("id").as[String].head()
    val paths = Kg.bfsPaths(kg.edges.filter(col("rel_type").isin("CONTAINS", "CALLS")),
      loadId, maxDepth = 4)
    val all = paths.select("path").as[Seq[String]].collect()
    assert(all.nonEmpty)
    assert(all.forall(p => p.distinct.size == p.size)) // no revisits
  }

  test("bfs paths truncate deterministically past maxPaths") {
    // K=40 fan-out twice over = 1600 depth-2 paths, capped at 50: the
    // kept set must be the ordered-by-(depth, path) prefix, byte-stable
    // across runs (the determinism contract at the cap boundary).
    val k = 40
    val edges = ((1 to k).map(i => ("root", f"a$i%03d")) ++
      (for { i <- 1 to k; j <- 1 to k } yield (f"a$i%03d", f"b$i%03d_$j%03d")))
      .toDF("src", "dst")
    def run() = Kg.bfsPaths(edges, "root", maxDepth = 3, maxPaths = 50)
      .select("path").as[Seq[String]].collect().map(_.mkString(">")).sorted.toSeq
    val first = run()
    assert(first.size > 50) // cap hit at depth 2 (40 + 50 kept)
    assert(first == run()) // byte-stable
    // kept depth-2 paths are the lexicographic prefix: all from a001/a002
    val depth2 = first.filter(_.count(_ == '>') == 2)
    assert(depth2.size == 50 && depth2.forall(p =>
      p.startsWith("root>a001>") || p.startsWith("root>a002>")))
  }

  test("cyclicFiles enforces the maxHops bound exactly") {
    // a 13-cycle needs 13 hops to close on itself: invisible at
    // maxHops=12 (matching the oracle's 12-hop recursive CTE), found at
    // 13; a 2-cycle is found either way.
    def ring(n: Int, pfx: String) = (1 to n).map { i =>
      (s"$pfx$i.py", Seq(s"$pfx${i % n + 1}"))
    }
    val chunks = (ring(13, "m") ++ ring(2, "z")).toDF("file_path", "imports")
    val at12 = Analytics.cyclicFiles(chunks, maxHops = 12)
      .as[String].collect().toSet
    assert(at12 == Set("z1.py", "z2.py"))
    val at13 = Analytics.cyclicFiles(chunks, maxHops = 13)
      .as[String].collect().toSet
    assert(at13 == (1 to 13).map(i => s"m$i.py").toSet ++ Set("z1.py", "z2.py"))
  }

  test("inheritance closure is transitive") {
    val extra = Seq(("x::C", "x::B", "INHERITS", 1.0), ("x::B", "x::A", "INHERITS", 1.0))
      .toDF("src", "dst", "rel_type", "weight")
    val closed = Kg.closure(kg.edges.unionByName(extra), "INHERITS")
    val pairs = closed.as[(String, String)].collect().toSet
    assert(pairs.contains(("x::C", "x::A")))
  }

  test("coupling: parser.py has afferent from search.js? instability in [0,1]") {
    val c = Analytics.coupling(chunks).collect()
    assert(c.nonEmpty)
    c.foreach { r =>
      val i = r.getAs[Double]("instability")
      assert(i >= 0.0 && i <= 1.0)
      assert("ABCDF".contains(r.getAs[String]("grade")))
    }
  }

  test("smells fire on known fixture shapes") {
    val s = Analytics.smells(chunks).collect()
    assert(s.forall(r => Set("long_method", "high_complexity",
      "moderate_complexity", "too_many_params", "missing_docstring")
      .contains(r.getAs[String]("smell"))))
  }

  test("hotspots ranked by complexity descending") {
    val h = Analytics.hotspots(chunks, 5).as[(String, String, String, Int, Int)].collect()
    assert(h.length <= 5)
    assert(h.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("halstead: volume positive for non-trivial chunks") {
    val h = Analytics.halstead(chunks).filter(col("length") > 10).collect()
    assert(h.nonEmpty)
    h.foreach(r => assert(r.getAs[Double]("volume") > 0))
  }

  test("directory rollups aggregate recursively by prefix") {
    val r = Analytics.directoryRollups(chunks)
    val bySrc = r.filter(col("dir").endsWith("sample_repo")).collect()
    assert(bySrc.length == 1)
    val root = bySrc.head
    assert(root.getAs[Long]("file_count") == 3L) // py + js + md
    assert(root.getAs[Long]("total_chunks") == chunks.count())
  }

  test("dead code: unreachable helper flagged, called code not") {
    val dead = Analytics.deadCode(chunks, kg)
    val names = dead.select("name").as[String].collect().toSet
    // parse_file is called by load_config (reached from ConfigLoader? only
    // if an entry reaches it) — at minimum the reachability result is a
    // strict subset of all entities
    val total = kg.vertices.filter(col("label").isin("function", "method", "class")).count()
    assert(dead.count() < total)
    assert(!names.contains("__init__"))
  }

  test("cyclicFiles finds exactly the files on import cycles") {
    // ring a→b→c→a; chain d→a reaches the cycle but is not on it;
    // f↔g mutual via dotted module spelling; e imports nothing resolvable
    val ch = Seq(
      ("src/a.py", Seq("b")), ("src/b.py", Seq("c")),
      ("src/c.py", Seq("pkg.a")), ("src/d.py", Seq("a")),
      ("src/e.py", Seq("numpy")), ("src/f.py", Seq("g")),
      ("src/g.py", Seq("deep.nested.f"))
    ).toDF("file_path", "imports")
    val cyc = Analytics.cyclicFiles(ch).as[String].collect().toSet
    assert(cyc == Set("src/a.py", "src/b.py", "src/c.py",
      "src/f.py", "src/g.py"))
  }

  test("git log parse + story phases") {
    val raw =
      "@aaa||alice|1700000000\n3\t1\tsrc/a.py\n2\t2\tsrc/b.py\n\n" +
        "@bbb|aaa|bob|1700100000\n5\t0\tsrc/c.py\n\n" +
        "@ccc|aaa bbb|alice|1700200000\n1\t1\tREADME.md\n"
    val commits = GitLog.parse(raw)
    assert(commits.length == 3)
    assert(commits.head.files_changed == 2 && commits.head.insertions == 5)
    assert(commits.head.parents.isEmpty)
    assert(commits(2).parents == Seq("aaa", "bbb"))
    val edges = GitLog.parentEdges(commits.toDF()).collect()
    assert(edges.length == 3)
    val phases = Analytics.storyPhases(commits.toDF(), nPhases = 2).collect()
    assert(phases.map(_.getAs[Long]("n_commits")).sum == 3)
    // equal-count tiling in (ts, hash) order: 2 phases of 3 commits
    // split 2/1, earliest phase first
    val byPhase = phases.map(r =>
      r.getAs[Int]("phase") -> r.getAs[Long]("n_commits")).toMap
    assert(byPhase == Map(1 -> 2L, 2 -> 1L))
  }

  test("importCycles surfaces edge-cap truncation instead of silently " +
      "reporting partial cycles") {
    val ch = Seq(
      ("src/a.py", Seq("b")), ("src/b.py", Seq("c")),
      ("src/c.py", Seq("a")), ("src/d.py", Seq("a")),
      ("src/e.py", Seq("numpy"))
    ).toDF("file_path", "imports")
    val (_, truncated) = Analytics.importCyclesTruncated(ch, maxEdges = 3)
    assert(truncated)
    val (cycles, full) = Analytics.importCyclesTruncated(ch, maxEdges = 100)
    assert(!full)
    assert(cycles.nonEmpty) // the a→b→c→a ring is found when unclipped
  }
}
