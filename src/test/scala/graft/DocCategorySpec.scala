package graft

import graft.graph.DocCategory

/** Document classifier fidelity (`kg_builder.py:1758-2067`): rule order,
  * pass precedence (ext > exact name > directory > stem keyword), the
  * leading-slash nuance of directory rules, and the IA-group mapping
  * including its faithful quirks (configuration → Uncategorized because
  * the IA map lists "config"; other → Testing).
  */
class DocCategorySpec extends SparkSpec {
  import spark.implicits._

  private def classify(paths: String*): Map[String, (String, String)] = {
    val df = paths.toSeq.toDF("p")
    DocCategory.withCategory(df, "p")
      .collect()
      .map(r => r.getAs[String]("p") ->
        (r.getAs[String]("category"), r.getAs[String]("ia_group")))
      .toMap
  }

  test("pass 1-2: extensions, well-known names, exact stems") {
    val c = classify("pyproject.toml", "scripts/build.sh", "CLAUDE.md",
      "README.md", "docs/CHANGELOG.md", "CONTRIBUTING.md", "LICENSE",
      "architecture.md", "api.md", "spec-v1.md", "TODO.md", "docs/index.md")
    assert(c("pyproject.toml")._1 == "configuration")
    assert(c("scripts/build.sh")._1 == "script")
    assert(c("CLAUDE.md")._1 == "configuration") // beats stem fall-through
    assert(c("README.md") == ("readme", "Orientation"))
    assert(c("docs/CHANGELOG.md") == ("changelog", "Orientation"))
    assert(c("CONTRIBUTING.md")._1 == "contributing")
    assert(c("LICENSE")._1 == "license")
    assert(c("architecture.md")._1 == "design")
    assert(c("api.md") == ("api_doc", "API Reference"))
    assert(c("spec-v1.md")._1 == "spec")
    assert(c("TODO.md") == ("roadmap", "Lifecycle"))
    assert(c("docs/index.md")._1 == "guide")
  }

  test("pass 3: directory rules need surrounding slashes") {
    val c = classify("docs/api/overview.md", "docs/guides/start.md",
      "docs/design/storage.md", "notes/research/retrieval.md",
      "qa/tests/plan.md", "internal/misc.md")
    assert(c("docs/api/overview.md")._1 == "api_doc")
    assert(c("docs/guides/start.md")._1 == "guide")
    assert(c("docs/design/storage.md")._1 == "design")
    assert(c("notes/research/retrieval.md") == ("research", "Architecture & Design"))
    assert(c("qa/tests/plan.md") == ("test_doc", "Testing"))
    // "internal/" has no leading slash → directory rule does NOT fire,
    // stem "misc" falls through to other (reference str(path) behavior)
    assert(c("internal/misc.md") == ("other", "Testing"))
  }

  test("pass 4: stem keywords in cascade order") {
    val c = classify("docs/fix-timeouts.md", "docs/crash-recovery.md",
      "docs/FAQ.md", "docs/migration-v2.md", "docs/release-checklist.md",
      "docs/upgrade-v3.md", "docs/install.md", "docs/benchmark-results.md",
      "docs/security-audit.md", "docs/quickstart.md", "docs/ci-cd.md",
      "docs/summary.md", "sprint-3-notes.md", "feature-login.md",
      "docs/workflow.md", "docs/api-history.md", "docs/state-machine.md",
      "docs/testing.md", "docs/templates/new-doc.md", "docs/analysis.md",
      "docs/zebra.md")
    assert(c("docs/fix-timeouts.md") == ("bugfix", "Lifecycle"))
    assert(c("docs/crash-recovery.md")._1 == "troubleshooting")
    assert(c("docs/FAQ.md") == ("faq", "Guides & Tutorials"))
    assert(c("docs/migration-v2.md")._1 == "migration")
    // "release" wins over the later checklist→guide rule
    assert(c("docs/release-checklist.md")._1 == "release_notes")
    assert(c("docs/upgrade-v3.md")._1 == "upgrade_guide")
    assert(c("docs/install.md")._1 == "setup")
    assert(c("docs/benchmark-results.md") == ("performance", "Operations"))
    assert(c("docs/security-audit.md") == ("security", "Operations"))
    assert(c("docs/quickstart.md")._1 == "guide")
    assert(c("docs/ci-cd.md")._1 == "deployment")
    assert(c("docs/summary.md")._1 == "design")
    assert(c("sprint-3-notes.md")._1 == "internal")
    // feature → no IA group in the reference map → Uncategorized
    assert(c("feature-login.md") == ("feature", "Uncategorized"))
    assert(c("docs/workflow.md")._1 == "guide")
    assert(c("docs/api-history.md")._1 == "changelog")
    assert(c("docs/state-machine.md")._1 == "design")
    assert(c("docs/testing.md")._1 == "guide")
    assert(c("docs/templates/new-doc.md")._1 == "guide")
    assert(c("docs/analysis.md")._1 == "report")
    assert(c("docs/zebra.md") == ("other", "Testing"))
  }

  test("faithful quirk: configuration maps to Uncategorized (IA lists 'config')") {
    val c = classify("app-config.md", "settings.yaml")
    assert(c("app-config.md") == ("configuration", "Uncategorized"))
    assert(c("settings.yaml") == ("configuration", "Uncategorized"))
  }

  test("SQL mirror produces the same categories (DuckDB-side string ops)") {
    // not executable against DuckDB here; assert the generated SQL covers
    // every rule category and ends with the fall-through
    val sql = DocCategory.categorizeSql("p", "name", "stem")
    assert(DocCategory.rules.map(_.category).distinct
      .forall(cat => sql.contains(s"'$cat'")))
    assert(sql.endsWith("ELSE 'other' END"))
    val ia = DocCategory.iaGroupSql("category")
    assert(ia.contains("'Uncategorized'") && ia.contains("'Orientation'"))
  }
}
