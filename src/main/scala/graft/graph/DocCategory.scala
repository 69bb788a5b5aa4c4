package graft.graph

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Document-category classifier + Information-Architecture grouping — the
  * engine behind the reference's `kg_ontology` / `kg_ia` tools
  * (`core/kg_builder.py:1758-2067` `_classify_document`,
  * `:39-61` IA_GROUPS/CATEGORY_TO_IA_GROUP, `:2940-3000`
  * `_build_ia_topics_sync`).
  *
  * The 50-odd ordered rules live ONCE as data; the Spark `when` cascade
  * and the DuckDB `CASE` mirror are both generated from it, so the gate
  * oracle can never drift from the product expression. First matching
  * rule wins, exactly like the reference's early-return cascade.
  *
  * Faithfully mirrored quirk: the classifier emits "configuration" but
  * the IA map lists "config", so configuration docs land in
  * "Uncategorized" — as they do in the reference.
  */
object DocCategory {

  /** One OR-leg of a rule: which derived string it probes and how. */
  sealed trait Prim
  final case class NameEnds(s: Seq[String]) extends Prim   // suffix incl. ext
  final case class NameIn(s: Seq[String]) extends Prim
  final case class NameStarts(s: Seq[String]) extends Prim
  final case class StemEq(s: Seq[String]) extends Prim
  final case class StemStarts(s: Seq[String]) extends Prim
  final case class StemEnds(s: Seq[String]) extends Prim
  final case class StemContains(s: Seq[String]) extends Prim
  final case class PathContains(s: Seq[String]) extends Prim

  final case class Rule(category: String, prims: Seq[Prim])

  /** Ordered rule cascade — transcribed 1:1 from `_classify_document`. */
  val rules: Seq[Rule] = Seq(
    // Pass 1: extensions / well-known config filenames
    Rule("configuration", Seq(NameEnds(Seq(
      ".toml", ".yaml", ".yml", ".json", ".ini", ".cfg", ".env")))),
    Rule("script", Seq(NameEnds(Seq(".sh", ".bash", ".zsh", ".fish")))),
    Rule("configuration", Seq(NameIn(Seq(
      "claude.md", ".claude.md", "claude.yml", "copier.yml")))),
    // Pass 2: exact filename stems
    Rule("readme", Seq(NameStarts(Seq("readme")))),
    Rule("changelog", Seq(NameStarts(Seq("changelog", "changes")))),
    Rule("contributing", Seq(NameStarts(Seq("contributing")))),
    Rule("license", Seq(NameStarts(Seq("license")))),
    Rule("design", Seq(NameIn(Seq("architecture.md", "design.md", "adr.md")))),
    Rule("api_doc", Seq(NameIn(Seq("api.md", "api-reference.md", "reference.md")))),
    Rule("spec", Seq(NameStarts(Seq("spec", "rfc")))),
    Rule("roadmap", Seq(NameStarts(Seq("todo", "roadmap")))),
    Rule("guide", Seq(NameIn(Seq("index.md", "index.rst", "index.html")))),
    // Pass 3: directory-based
    Rule("api_doc", Seq(PathContains(Seq("/api/", "/reference/")))),
    Rule("api_doc", Seq(PathContains(Seq("/tools/")))),
    Rule("guide", Seq(PathContains(Seq("/guides/", "/guide/", "/tutorial/",
      "/tutorials/", "/howto/", "/getting-started/", "/getting_started/")))),
    Rule("design", Seq(PathContains(Seq("/design/", "/adr/", "/architecture/")))),
    Rule("spec", Seq(PathContains(Seq("/spec/", "/rfc/", "/prd/")))),
    Rule("research", Seq(PathContains(Seq("/research/")))),
    Rule("performance", Seq(PathContains(Seq("/performance/", "/benchmarks/")))),
    Rule("deployment", Seq(PathContains(Seq("/deployment/", "/deploy/")))),
    Rule("test_doc", Seq(PathContains(Seq("/qa/", "/tests/", "/test/")))),
    Rule("internal", Seq(PathContains(Seq("/internal/", "/private/")))),
    Rule("example", Seq(PathContains(Seq("/examples/", "/example/", "/demos/")))),
    Rule("report", Seq(PathContains(Seq("/reports/", "/report/")))),
    Rule("feature", Seq(PathContains(Seq("/features/", "/feature/")))),
    Rule("project", Seq(PathContains(Seq("/projects/", "/project/")))),
    Rule("guide", Seq(PathContains(Seq("/skills/")))),
    // Pass 4: filename keyword patterns
    Rule("bugfix", Seq(
      StemStarts(Seq("bugfix", "bug-fix", "bug_fix", "fix-", "fix_")),
      StemContains(Seq("bugfix", "-fix-", "_fix_")),
      StemEnds(Seq("-fix", "_fix")))),
    Rule("troubleshooting", Seq(StemContains(Seq(
      "troubleshoot", "crash-", "diagnostics", "recovery", "panic", "defense")))),
    Rule("faq", Seq(StemEq(Seq("faq")), StemStarts(Seq("faq-", "faq_")))),
    Rule("migration", Seq(StemContains(Seq("migration", "migrate")))),
    Rule("release_notes", Seq(StemContains(Seq("release")),
      StemStarts(Seq("releasing")))),
    Rule("upgrade_guide", Seq(StemContains(Seq("upgrade")))),
    Rule("setup", Seq(StemContains(Seq("setup", "install", "installation")))),
    Rule("configuration", Seq(StemContains(Seq("config", "configuration")))),
    Rule("performance", Seq(StemContains(Seq(
      "performance", "benchmark", "optimization", "optimiz")))),
    Rule("security", Seq(StemContains(Seq("security", "vulnerabilit")))),
    Rule("tutorial", Seq(StemContains(Seq("tutorial")))),
    Rule("example", Seq(StemContains(Seq("example", "demo", "sample")))),
    Rule("guide", Seq(StemContains(Seq("quickstart", "quick-start", "quickref",
      "quick-ref", "quickguide", "checklist", "standard", "guide")))),
    Rule("deployment", Seq(StemContains(Seq(
      "deploy", "deployment", "versioning", "ci-cd", "cicd")))),
    Rule("design", Seq(StemContains(Seq("architecture", "design", "summary",
      "implementation", "refactor", "integration", "visualization",
      "iterator", "streaming", "generation")))),
    Rule("internal", Seq(StemContains(Seq("sprint", "kanban", "backlog")))),
    Rule("internal", Seq(StemContains(Seq("codestory", "code-story")),
      PathContains(Seq("codestory")))),
    Rule("feature", Seq(StemStarts(Seq("feature-", "feature_")))),
    Rule("guide", Seq(StemContains(Seq("workflow", "process")))),
    Rule("changelog", Seq(StemContains(Seq("history", "release-notes")))),
    Rule("design", Seq(StemContains(Seq("backend", "manager", "management",
      "state", "phase", "protection", "async", "schema", "pattern", "cap",
      "limit", "structure", "verification", "nonblocking", "non-blocking")))),
    Rule("guide", Seq(StemContains(Seq(
      "quality", "organization", "testing", "patterns")))),
    Rule("guide", Seq(PathContains(Seq("/project-template/", "/templates/")),
      StemContains(Seq("template")))),
    Rule("report", Seq(StemContains(Seq("report", "analysis")))))

  /** IA hierarchy (`kg_builder.py:39-56`), category → group. */
  val iaGroups: Seq[(String, Seq[String])] = Seq(
    "Orientation" -> Seq("readme", "contributing", "license", "changelog"),
    "Guides & Tutorials" -> Seq("guide", "tutorial", "example", "setup",
      "faq", "troubleshooting"),
    "Architecture & Design" -> Seq("design", "spec", "research", "internal",
      "report"),
    "API Reference" -> Seq("api_doc"),
    "Operations" -> Seq("deployment", "config", "performance", "security"),
    "Lifecycle" -> Seq("roadmap", "release_notes", "upgrade_guide",
      "migration", "bugfix"),
    "Testing" -> Seq("test_doc", "other"))

  private val categoryToGroup: Map[String, String] =
    iaGroups.flatMap { case (g, cats) => cats.map(_ -> g) }.toMap

  // ---- Spark Column generation ---------------------------------------

  private def primCol(p: Prim, path: Column, name: Column, stem: Column): Column =
    p match {
      case NameEnds(s) => s.map(x => name.endsWith(x)).reduce(_ || _)
      case NameIn(s) => name.isin(s: _*)
      case NameStarts(s) => s.map(x => name.startsWith(x)).reduce(_ || _)
      case StemEq(s) => stem.isin(s: _*)
      case StemStarts(s) => s.map(x => stem.startsWith(x)).reduce(_ || _)
      case StemEnds(s) => s.map(x => stem.endsWith(x)).reduce(_ || _)
      case StemContains(s) => s.map(x => stem.contains(x)).reduce(_ || _)
      case PathContains(s) => s.map(x => path.contains(x)).reduce(_ || _)
    }

  /** Category of precomputed (lowered path, filename, stem) columns —
    * pass columns, not re-derived expressions, to keep the cascade from
    * duplicating the string-prep work per branch (the t4 lesson).
    */
  def categorize(path: Column, name: Column, stem: Column): Column = {
    def cond(r: Rule) = r.prims.map(primCol(_, path, name, stem)).reduce(_ || _)
    rules.tail
      .foldLeft(when(cond(rules.head), rules.head.category)) { (acc, r) =>
        acc.when(cond(r), r.category)
      }
      .otherwise("other")
  }

  /** Adds __path/__name/__stem prep columns then the category. */
  def withCategory(df: org.apache.spark.sql.DataFrame,
      pathCol: String): org.apache.spark.sql.DataFrame = {
    val prepped = df
      .withColumn("__path", lower(col(pathCol)))
      .withColumn("__name", element_at(split(col("__path"), "/"), -1))
      .withColumn("__stem", regexp_replace(col("__name"), "\\.[^.]*$", ""))
    prepped
      .withColumn("category",
        categorize(col("__path"), col("__name"), col("__stem")))
      .withColumn("ia_group", iaGroup(col("category")))
      .drop("__path", "__name", "__stem")
  }

  /** IA group of a category column ("Uncategorized" fallback). */
  def iaGroup(category: Column): Column =
    categoryToGroup.foldRight(lit("Uncategorized")) { case ((cat, g), acc) =>
      when(category === cat, g).otherwise(acc)
    }

  // ---- DuckDB SQL generation (same rule data, same order) ------------

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  private def primSql(p: Prim, path: String, name: String, stem: String): String =
    p match {
      case NameEnds(s) => s.map(x => s"ends_with($name, ${q(x)})").mkString("(", " OR ", ")")
      case NameIn(s) => s"$name IN (${s.map(q).mkString(", ")})"
      case NameStarts(s) => s.map(x => s"starts_with($name, ${q(x)})").mkString("(", " OR ", ")")
      case StemEq(s) => s"$stem IN (${s.map(q).mkString(", ")})"
      case StemStarts(s) => s.map(x => s"starts_with($stem, ${q(x)})").mkString("(", " OR ", ")")
      case StemEnds(s) => s.map(x => s"ends_with($stem, ${q(x)})").mkString("(", " OR ", ")")
      case StemContains(s) => s.map(x => s"contains($stem, ${q(x)})").mkString("(", " OR ", ")")
      case PathContains(s) => s.map(x => s"contains($path, ${q(x)})").mkString("(", " OR ", ")")
    }

  /** CASE cascade over SQL expressions for (path, name, stem). */
  def categorizeSql(path: String, name: String, stem: String): String =
    rules.map { r =>
      val cond = r.prims.map(primSql(_, path, name, stem)).mkString("(", " OR ", ")")
      s"WHEN $cond THEN ${q(r.category)}"
    }.mkString("CASE ", " ", " ELSE 'other' END")

  def iaGroupSql(category: String): String =
    categoryToGroup.toSeq.map { case (cat, g) =>
      s"WHEN $category = ${q(cat)} THEN ${q(g)}"
    }.mkString("CASE ", " ", " ELSE 'Uncategorized' END")
}
