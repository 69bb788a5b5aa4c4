package graft

import org.apache.spark.sql.functions._

import graft.ingest.{FileDiscovery, GitignoreRules}

/** GitignoreRules vs the reference's own unit suite
  * (`tests/unit/utils/test_gitignore_pattern_matching.py`) plus the
  * cascade/negation/nesting semantics of `utils/gitignore.py`.
  */
class GitignoreSpec extends SparkSpec {
  import spark.implicits._

  private def ign(gitignore: String, path: String): Boolean =
    GitignoreRules.ignored(path, GitignoreRules.parse(gitignore))

  test("directory pattern matches dir and files inside (reference regression case)") {
    val g = "node_modules/\n"
    assert(ign(g, "node_modules"))
    assert(ign(g, "node_modules/package.json"))
    assert(ign(g, "node_modules/foo/bar.js"))
    assert(ign(g, "node_modules/deep/nested/file.txt"))
    assert(ign(g, "node_modules/foo"))
    // unrelated paths stay unmatched
    assert(!ign(g, "src/node_modules.txt"))
    assert(!ign(g, "node_modules.backup"))
    assert(!ign(g, "my_node_modules/file.js"))
  }

  test("glob file pattern matches at any depth, multiple patterns cascade") {
    val g = "build/\ndist/\n*.pyc\n"
    assert(ign(g, "build/index.html"))
    assert(ign(g, "dist/bundle.js"))
    assert(ign(g, "src/cache.pyc"))
    assert(ign(g, "app.pyc"))
    assert(!ign(g, "src/app.py"))
    assert(!ign(g, "app.py"))
  }

  test("nested directory pattern anchors to its components") {
    val g = "src/build/\n"
    assert(ign(g, "src/build"))
    assert(ign(g, "src/build/index.html"))
    assert(ign(g, "src/build/assets/app.js"))
    assert(!ign(g, "build"))
    assert(!ign(g, "dist/build"))
    // the reference's suffix loop DOES match a deeper occurrence
    assert(ign(g, "a/src/build"))
  }

  test("negation: last matching rule wins") {
    val g = "*.md\n!README.md\n"
    assert(ign(g, "docs/notes.md"))
    assert(!ign(g, "README.md"))
    assert(!ign(g, "docs/README.md")) // negation matches by suffix too
    // order matters: re-ignoring after negation flips back
    val g2 = "*.md\n!README.md\ndocs/*.md\n"
    assert(ign(g2, "docs/README.md"))
    assert(!ign(g2, "README.md"))
  }

  test("leading slash is stripped without restoring anchoring (reference quirk)") {
    // utils/gitignore.py:50-52 drops the '/' and the suffix loop then
    // matches at any depth — faithfully mirrored, not git semantics
    val g = "/build\n"
    assert(ign(g, "build"))
    assert(ign(g, "x/build"))
  }

  test("comments and blanks are skipped; ** patterns compile") {
    val g = "# comment\n\n**/temp\n"
    assert(ign(g, "a/b/temp"))
    assert(ign(g, "x/temp"))
    // the reference's fnmatch/regex both demand the literal '/', so a
    // bare 'temp' does NOT match '**/temp' (git would; the reference
    // doesn't — we mirror the reference)
    assert(!ign(g, "temp"))
    assert(!ign(g, "temperature"))
  }

  test("Column cascade agrees with the driver evaluator") {
    val rules = GitignoreRules.parse(
      "*.log\n!keep.log\nbuild/\n/secret\ndocs/**/*.md\n")
    val paths = Seq("a.log", "keep.log", "x/keep.log", "x/deep/a.log",
      "build", "build/x/y.js", "builds/x.js", "secret", "a/secret",
      "docs/a/b.md", "docs/b.md", "other/docs/c.md", "src/main.py")
    val got = paths.toDF("p")
      .withColumn("ign", GitignoreRules.ignoredCol(col("p"), rules))
      .as[(String, Boolean)].collect().toMap
    paths.foreach { p =>
      assert(got(p) == GitignoreRules.ignored(p, rules),
        s"Column vs driver mismatch on $p")
    }
  }

  test("walk semantics: pruned ancestor dir excludes files the cascade misses") {
    val rules = GitignoreRules.parse("gen/\n!gen/keep.py\n")
    // cascade on the FILE path alone: 'src/gen/x.py' has no suffix
    // ending in 'gen' and no 'gen' prefix, so it slips through...
    assert(!GitignoreRules.ignored("src/gen/x.py", rules))
    // ...but the walk prunes the 'src/gen' directory (suffix match), so
    // discovery never sees the file
    assert(GitignoreRules.ignoredWalk("src/gen/x.py", rules))
    // and a negation cannot resurrect a file under a pruned dir
    assert(GitignoreRules.ignoredWalk("gen/keep.py", rules))
    assert(!GitignoreRules.ignoredWalk("src/other/x.py", rules))
    // Column flavor agrees
    val ps = Seq("src/gen/x.py", "gen/keep.py", "src/other/x.py", "gen/a.py")
    val got = ps.toDF("p")
      .withColumn("ign", GitignoreRules.ignoredWalkCol(col("p"), rules))
      .as[(String, Boolean)].collect().toMap
    ps.foreach(p => assert(got(p) == GitignoreRules.ignoredWalk(p, rules), p))
  }

  test("nested gitignore: deeper file wins over root") {
    val tmp = java.nio.file.Files.createTempDirectory("gitignore-nested")
    try {
      java.nio.file.Files.writeString(tmp.resolve(".gitignore"), "*.log\n")
      val sub = java.nio.file.Files.createDirectory(tmp.resolve("sub"))
      java.nio.file.Files.writeString(sub.resolve(".gitignore"), "!debug.log\n")
      val rules = GitignoreRules.loadNested(tmp.toString)
      assert(rules.map(_.base).distinct.sorted == Seq("", "sub"))
      assert(GitignoreRules.ignored("other/x.log", rules))
      assert(GitignoreRules.ignored("sub/trace.log", rules))
      assert(!GitignoreRules.ignored("sub/debug.log", rules)) // deeper negation wins
      // root-only load ignores the nested file entirely (reference behavior)
      val rootRules = GitignoreRules.loadRoot(tmp.toString)
      assert(GitignoreRules.ignored("sub/debug.log", rootRules))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
  }

  test("default ignore pattern list matches the reference's, entry for entry") {
    // config/defaults.py:356-451 — 71 patterns; spot-check representatives
    assert(FileDiscovery.DefaultIgnorePatterns.size == 71)
    assert(FileDiscovery.DefaultIgnorePatterns.head == ".*")
    Seq(".git", "__pycache__", "node_modules", "fixtures", "package-lock.json",
      "*.nifi", "build", "public/build", "storybook-static", ".env",
      "*.egg-info", ".claude-mpm", ".mcp-vector-search", "*.iframe.bundle.js",
      "vendor-*.js", "*.css.map")
      .foreach(p => assert(FileDiscovery.DefaultIgnorePatterns.contains(p), p))
    assert(FileDiscovery.AllowedDotfiles ==
      Set(".github", ".gitlab-ci", ".circleci"))
  }

  test("per-component default-pattern predicate: include/exclude parity") {
    val cases = Seq(
      // (path, expected ignored by layer 1)
      "src/app.py" -> false,
      "node_modules/left-pad/index.js" -> true,
      "a/b/__pycache__/m.pyc" -> true,
      "deep/build/out.js" -> true,       // 'build' component at any depth
      "builder/x.py" -> false,           // component must match exactly
      "ui/app.min.js" -> true,           // *.min.js filename component
      "ui/app.js" -> false,
      "x/vendors-abc123.js" -> true,     // vendor-*.js family
      "pkg/foo.egg-info/PKG-INFO" -> true,
      "proj/package-lock.json" -> true,
      ".github/workflows/ci.yml" -> true, // '.*' catches it in layer 1 (reference parity)
      "public/build/x.js" -> true)       // via the 'build' component, not 'public/build'
    val got = cases.map(_._1).toDF("p")
      .withColumn("ign", FileDiscovery.defaultIgnoreCol(col("p")))
      .as[(String, Boolean)].collect().toMap
    cases.foreach { case (p, want) => assert(got(p) == want, p) }
  }

  test("dotfile layer honors the allowlist (live when '.*' is overridden)") {
    val cases = Seq(
      ".github/workflows/ci.yml" -> false,
      ".circleci/config.yml" -> false,
      ".hidden/x.py" -> true,
      "src/.env.local" -> true,
      "src/app.py" -> false)
    val got = cases.map(_._1).toDF("p")
      .withColumn("ign", FileDiscovery.dotfileIgnoreCol(col("p")))
      .as[(String, Boolean)].collect().toMap
    cases.foreach { case (p, want) => assert(got(p) == want, p) }
  }

  test("should_ignore_path layering: force-includes override per the reference") {
    val rules = GitignoreRules.parse("*.kt\n")
    def verdicts(cases: Seq[String], fip: Seq[String] = Nil,
        fpath: Seq[String] = Nil): Map[String, Boolean] =
      cases.toDF("p").withColumn("ign", FileDiscovery.shouldIgnoreCol(
        col("p"), rules, fip, fpath)).as[(String, Boolean)].collect().toMap
    // force_include_patterns override EVERYTHING — even default ignores
    // (file_discovery.py:472-486: vendor/**/*.kt indexes inside vendor)
    val g1 = verdicts(Seq("vendor/lib/a.kt", "vendor/lib/b.js", "src/c.kt"),
      fip = Seq("vendor/**/*.kt"))
    assert(!g1("vendor/lib/a.kt")) // default 'vendor' ignore overridden
    assert(g1("vendor/lib/b.js"))  // not covered by the pattern
    assert(g1("src/c.kt"))         // outside the pattern gitignore applies
    // force_include_paths override gitignore but NOT default patterns
    // (:488-521: prevents accidentally indexing node_modules)
    val g2 = verdicts(
      Seq("legacy/a.kt", "legacy/sub/b.kt", "node_modules/x/c.kt", "other/d.kt"),
      fpath = Seq("legacy/"))
    assert(!g2("legacy/a.kt") && !g2("legacy/sub/b.kt"))
    assert(g2("node_modules/x/c.kt")) // default pattern still blocks
    assert(g2("other/d.kt"))          // gitignore still applies
    // ** force pattern also matches with zero intermediate dirs (the
    // (.*/)?-style branch the gitignore matcher lacks)
    val g3 = verdicts(Seq("vendor/a.kt"), fip = Seq("vendor/**/*.kt"))
    assert(!g3("vendor/a.kt"))
  }

  test("vendor-scale pattern set: 847 patterns stay one fast automaton") {
    // the reference's benchmark scenario (benchmark_vendor_patterns.py):
    // 71 defaults + 776 generated vendor patterns
    val prefixes = Seq("com", "org", "net", "io", "co", "de", "fr", "uk")
    val domains = Seq("google", "facebook", "amazon", "microsoft", "apple",
      "twitter", "github", "gitlab", "jetbrains", "intellij", "android",
      "spring", "apache", "hibernate", "jackson", "fasterxml", "squareup",
      "okhttp", "retrofit", "glide", "picasso", "dagger", "guava",
      "firebase", "crashlytics", "fabric", "flurry", "mixpanel", "segment",
      "amplitude", "stripe", "paypal", "braintree", "square", "twilio",
      "sendgrid")
    val vendor = (for { p <- prefixes; d <- domains }
      yield Seq(s"$p.$d.*", s"$p.$d")).flatten ++
      (0 until 100).flatMap(i => Seq(s"vendor$i", s"third-party$i"))
    assert(vendor.distinct.size == 776)
    val rx = FileDiscovery.componentIgnoreRx(
      FileDiscovery.DefaultIgnorePatterns ++ vendor)
    val cases = Seq(
      "libs/com.google.gson/Gson.java" -> true,
      "libs/org.apache.commons/C.java" -> true,
      "libs/io.squareup.okhttp3/H.java" -> true,
      "vendor42/x.py" -> true,
      "third-party7/y.js" -> true,
      "src/com_google/z.py" -> false,
      "src/main.py" -> false,
      "node_modules/a.js" -> true) // defaults still present
    val t0 = System.nanoTime()
    val got = cases.map(_._1).toDF("p")
      .withColumn("ign", FileDiscovery.defaultIgnoreCol(col("p"), rx))
      .as[(String, Boolean)].collect().toMap
    info(f"847-pattern predicate evaluated in ${(System.nanoTime() - t0) / 1e6}%.0f ms")
    cases.foreach { case (p, want) => assert(got(p) == want, p) }
  }

  test("discover honors a root .gitignore on a synthetic tree") {
    val tmp = java.nio.file.Files.createTempDirectory("discover-git")
    try {
      def write(rel: String, text: String): Unit = {
        val p = tmp.resolve(rel)
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p, text)
      }
      write(".gitignore", "generated/\n*.gen.py\n!keep.gen.py\n")
      write("src/main.py", "print('m')")
      write("src/auto.gen.py", "print('g')")
      write("src/keep.gen.py", "print('k')")
      write("generated/big.py", "print('b')")
      write("vendor/lib.py", "print('v')") // default pattern, not gitignore
      val got = FileDiscovery.discover(spark, tmp.toString)
        .collect().map(_.file_path.replace(tmp.toString + "/", "")).toSet
      assert(got == Set("src/main.py", "src/keep.gen.py"))
      // and with gitignore off, only default patterns apply
      val noGit = FileDiscovery.discover(spark, tmp.toString,
        respectGitignore = false)
        .collect().map(_.file_path.replace(tmp.toString + "/", "")).toSet
      assert(noGit == Set("src/main.py", "src/keep.gen.py", "src/auto.gen.py",
        "generated/big.py"))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
  }
}
