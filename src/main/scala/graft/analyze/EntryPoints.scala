package graft.analyze

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.core.FileRecord

/** A13 entry-point detection (`analysis/entry_points.py:66-530`) — the
  * roots of the dead-code reachability walk, detected per file with the
  * reference's six detectors and confidence levels:
  *
  *  - MAIN: calls inside `if __name__ == "__main__":` blocks
  *  - CLI: click/typer decorators, incl. `@<var>.command|callback|group`
  *  - ROUTE: FastAPI/Flask route decorators (exact-set match)
  *  - TEST: `test_*` functions and `@*fixture*` decorators
  *  - EXPORT: `__all__` names in `__init__.py`
  *  - PUBLIC: module-level public defs (opt-in, confidence 0.7)
  *
  * Runs as a flatMap over the discovery Dataset — per-file imperative
  * parsing, embarrassingly parallel, same shape as the chunker.
  */
object EntryPoints {

  final case class EntryPointRow(
      name: String,
      file_path: String,
      line_number: Int,
      entry_type: String, // MAIN | CLI | ROUTE | TEST | EXPORT | PUBLIC
      confidence: Double)

  /** `entry_points.py:93-102`. */
  val CliDecorators: Set[String] = Set(
    "command", "group", "callback", "click.command", "click.group",
    "app.command", "typer.command")

  /** `entry_points.py:104-119`. */
  val RouteDecorators: Set[String] = Set(
    "get", "post", "put", "delete", "patch", "options", "head",
    "route", "websocket", "api_route", "app.route", "app.get", "app.post")

  private val MainIfRe = """^(\s*)if\s+__name__\s*==\s*["']__main__["']""".r
  private val CallRe = """^\s*([\w.]+)\s*\(""".r
  private val DecoRe = """^\s*@([\w.]+)""".r
  private val DefRe = """^\s*(?:async\s+)?def\s+(\w+)""".r
  private val AllRe = """(?s)__all__\s*=\s*[\[(](.*?)[\])]""".r
  private val StrRe = """["']([^"']+)["']""".r

  def detect(filePath: String, code: String,
      includePublic: Boolean = false): Seq[EntryPointRow] = {
    val lines = code.split("\n", -1)
    val out = Seq.newBuilder[EntryPointRow]

    // MAIN: calls in the body of `if __name__ == "__main__":`
    lines.zipWithIndex.foreach { case (l, i) =>
      MainIfRe.findFirstMatchIn(l).foreach { m =>
        val indent = m.group(1).length
        var j = i + 1
        var done = false
        while (j < lines.length && !done) {
          val bl = lines(j)
          if (bl.trim.nonEmpty && bl.takeWhile(_ == ' ').length <= indent) done = true
          else {
            CallRe.findFirstMatchIn(bl).foreach { c =>
              out += EntryPointRow(c.group(1).split("\\.").last, filePath,
                j + 1, "MAIN", 1.0)
            }
            j += 1
          }
        }
      }
    }

    // decorator-driven detectors + test names + public defs
    var pendingDecos = List.empty[String]
    lines.zipWithIndex.foreach { case (l, i) =>
      DecoRe.findFirstMatchIn(l) match {
        case Some(m) => pendingDecos ::= m.group(1)
        case None =>
          DefRe.findFirstMatchIn(l) match {
            case Some(d) =>
              val name = d.group(1)
              val indent = l.takeWhile(_ == ' ').length
              val cli = pendingDecos.exists(dec =>
                CliDecorators.contains(dec) ||
                  (dec.contains(".") &&
                    Set("command", "callback", "group")(dec.split("\\.").last)))
              val route = pendingDecos.exists(RouteDecorators.contains)
              val fixture = pendingDecos.exists(_.contains("fixture"))
              if (cli) out += EntryPointRow(name, filePath, i + 1, "CLI", 1.0)
              else if (route) out += EntryPointRow(name, filePath, i + 1, "ROUTE", 1.0)
              if (name.startsWith("test_"))
                out += EntryPointRow(name, filePath, i + 1, "TEST", 1.0)
              else if (fixture)
                out += EntryPointRow(name, filePath, i + 1, "TEST", 1.0)
              else if (includePublic && indent == 0 && !name.startsWith("_") &&
                  !cli && !route)
                out += EntryPointRow(name, filePath, i + 1, "PUBLIC", 0.7)
              pendingDecos = Nil
            case None => if (l.trim.nonEmpty) pendingDecos = Nil
          }
      }
    }

    // EXPORT: __all__ entries in __init__.py
    if (filePath.endsWith("__init__.py")) {
      AllRe.findAllMatchIn(code).foreach { m =>
        val line = code.take(m.start).count(_ == '\n') + 1
        StrRe.findAllMatchIn(m.group(1)).foreach { s =>
          out += EntryPointRow(s.group(1), filePath, line, "EXPORT", 1.0)
        }
      }
    }

    out.result()
  }

  def fromFiles(spark: SparkSession, files: Dataset[FileRecord],
      includePublic: Boolean = false): Dataset[EntryPointRow] = {
    import spark.implicits._
    files.flatMap(f => detect(f.file_path, f.content, includePublic))
  }
}
