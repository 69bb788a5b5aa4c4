package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Language-aware boilerplate penalty (`core/boilerplate.py:86-200`):
  * constructors/lifecycle/dunder names get a fixed negative penalty in
  * ranking UNLESS the query itself mentions the name (searching for
  * `__init__` must still find `__init__`). Pure column algebra — the
  * per-language sets are plan-time literals, membership is a codegen'd
  * IN list, no UDF.
  */
object Boilerplate {

  val DefaultPenalty: Double = -0.15

  /** `core/boilerplate.py:12-84`, verbatim sets. */
  val LanguageBoilerplate: Map[String, Set[String]] = {
    val jsTs = Set("constructor", "render", "componentDidMount",
      "componentWillUnmount", "componentDidUpdate", "useState", "useEffect",
      "index", "main", "default")
    Map(
      "python" -> Set("__init__", "__str__", "__repr__", "__eq__", "__hash__",
        "__len__", "__iter__", "__next__", "__enter__", "__exit__", "main",
        "setUp", "tearDown", "setUpClass", "tearDownClass"),
      "javascript" -> jsTs, "typescript" -> jsTs, "jsx" -> jsTs, "tsx" -> jsTs,
      "dart" -> Set("build", "dispose", "initState", "didChangeDependencies",
        "main", "createState"),
      "php" -> Set("__construct", "__destruct", "__toString", "__get", "__set",
        "__call", "__callStatic", "index", "main"),
      "ruby" -> Set("initialize", "to_s", "to_h", "to_a", "inspect", "main",
        "setup", "teardown"))
  }

  /** True when `name` is boilerplate for `language` and the query does not
    * explicitly mention it (exact per-language match, case-sensitive, as
    * the reference).
    */
  def isBoilerplate(name: Column, language: Column, query: String): Column = {
    val inQuery =
      if (query.isEmpty) lit(false)
      else lit(query.toLowerCase).contains(lower(name))
    val inSet = LanguageBoilerplate.toSeq.sortBy(_._1)
      .map { case (lang, names) =>
        lower(language) === lang && name.isin(names.toSeq.sorted: _*)
      }
      .reduce(_ || _)
    name.isNotNull && !inQuery && inSet
  }

  /** Penalty column: DefaultPenalty when boilerplate, else 0.0. */
  def penalty(name: Column, language: Column, query: String,
      amount: Double = DefaultPenalty): Column =
    when(isBoilerplate(name, language, query), amount).otherwise(0.0)

  /** DuckDB mirror of [[penalty]], generated from the SAME per-language
    * sets so the oracle cannot drift from the engine (the rrfSql /
    * cosineSql pattern). `name`/`language` are SQL expressions.
    */
  def penaltySql(name: String, language: String, query: String,
      amount: Double = DefaultPenalty): String = {
    val inQuery =
      if (query.isEmpty) "FALSE"
      else s"contains('${query.toLowerCase}', lower($name))"
    val inSet = LanguageBoilerplate.toSeq.sortBy(_._1)
      .map { case (lang, names) =>
        s"(lower($language) = '$lang' AND $name IN (${
          names.toSeq.sorted.map(n => s"'$n'").mkString(", ")}))"
      }
      .mkString(" OR ")
    s"CASE WHEN $name IS NOT NULL AND NOT ($inQuery) AND ($inSet) " +
      s"THEN ${amount}::DOUBLE ELSE 0.0::DOUBLE END"
  }
}
