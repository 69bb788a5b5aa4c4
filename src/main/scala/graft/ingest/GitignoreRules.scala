package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** .gitignore rule cascade (SURVEY §2.2 P9 fidelity item).
  *
  * Reference semantics re-expressed (`utils/gitignore.py:1-252`):
  * a .gitignore file is an ORDERED rule list; for a path, every rule is
  * tested and the LAST matching rule wins (`is_ignored`, `:193-200`:
  * `ignored = not pattern.is_negation` on each hit). Per-rule matching
  * mirrors `GitignorePattern.matches` (`:57-100`) including its
  * deliberate quirks:
  *
  *  - fnmatch with `*` crossing `/` (the reference's fast path is plain
  *    `fnmatch.fnmatch`), tried against every component-boundary SUFFIX
  *    of the path — so unanchored patterns match at any depth, and a
  *    leading `/` is stripped by normalization (`:50-52`) without
  *    restoring anchoring;
  *  - patterns containing `**` additionally try an anchored regex with
  *    `** → .*`, `* → [^/]*`, `? → [^/]` and all other characters RAW
  *    (`:29-37` compiles the pattern without escaping, so `.` is a
  *    metachar there too);
  *  - directory-only patterns (trailing `/`) additionally match when any
  *    PREFIX of the path matches — the dir and everything under it
  *    (`:85-92`).
  *
  * The reference loads only the repo-root .gitignore (`:115-128`);
  * `loadRoot` mirrors that. `loadNested` generalizes to nested
  * .gitignore files with git's precedence (deeper file wins = later in
  * the fold; rules match against the path RELATIVE to the file's dir).
  *
  * Everything compiles to per-rule REGEX LITERALS evaluated as `rlike`
  * Column predicates — the same strings are interpolated into the DuckDB
  * oracle's `regexp_matches`, so both engines run identical automata.
  * The fold is a when-chain: at 100 TB the rule table is config-scale
  * (tens of rules) and the whole cascade is one codegen'd projection —
  * no join, no shuffle, no driver loop per path.
  */
object GitignoreRules {

  final case class Rule(seq: Int, base: String, pattern: String,
      neg: Boolean, dirOnly: Boolean, rxSuffix: String,
      rxStar: Option[String], rxPrefix: Option[String])

  /** fnmatch → regex body for the subset git patterns use: `*` matches
    * anything INCLUDING `/` (fnmatch is not path-aware), `?` any one
    * char, `[seq]`/`[!seq]` classes; all else escaped. No anchors.
    */
  def globRx(p: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < p.length) {
      val c = p.charAt(i)
      c match {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case '[' =>
          val j = p.indexOf(']', i + 1)
          if (j < 0) sb.append("\\[")
          else {
            val inner = p.substring(i + 1, j)
            sb.append(if (inner.startsWith("!")) s"[^${inner.tail}]" else s"[$inner]")
            i = j
          }
        case ch if "\\.^$+(){}|]".indexOf(ch.toInt) >= 0 =>
          sb.append('\\').append(ch)
        case ch => sb.append(ch)
      }
      i += 1
    }
    sb.toString
  }

  /** The reference's `**` regex (`gitignore.py:29-37`): the SAME naive
    * replacement sequence — `** → .*` first, then `* → [^/]*` (which
    * rewrites the just-inserted `.*` into `.[^/]*`), then `? → [^/]` —
    * with all other characters raw (dots stay metachars). Faithfully
    * mirrored, quirks included, not "fixed": this branch only ever ADDS
    * matches on patterns whose raw `.` aligns with a non-literal char.
    */
  private def starRx(p: String): String = {
    val t = p.replace("**", ".*").replace("*", "[^/]*").replace("?", "[^/]")
    s"^$t$$"
  }

  /** Parse one .gitignore body into ordered rules. `base` = dir of the
    * file relative to the scan root ("" for the root file).
    */
  def parse(content: String, base: String = "", seq0: Int = 0): Seq[Rule] =
    content.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .zipWithIndex.map { case (line, i) =>
        val neg = line.startsWith("!")
        val dirOnly = line.endsWith("/")
        val norm0 = if (neg) line.tail else line
        val norm1 = if (dirOnly) norm0.dropRight(1) else norm0
        val norm = if (norm1.startsWith("/")) norm1.tail else norm1
        val f = globRx(norm)
        Rule(seq0 + i, base, line, neg, dirOnly,
          rxSuffix = s"^(.*/)?$f$$",
          rxStar = if (norm.contains("**")) Some(starRx(norm)) else None,
          rxPrefix = if (dirOnly) Some(s"^$f(/.*)?$$") else None)
      }.toSeq

  /** Root-only load — the reference's behavior (`gitignore.py:115-128`). */
  def loadRoot(root: String): Seq[Rule] = {
    val f = new java.io.File(root, ".gitignore")
    if (!f.isFile) Seq.empty
    else parse(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
  }

  /** All .gitignore files under `root`, shallowest first (deeper file =
    * later rules = higher precedence), path-sorted within a depth for
    * determinism. Discovery is metadata-scale driver work.
    */
  def loadNested(root: String): Seq[Rule] = {
    import scala.jdk.CollectionConverters._
    val rootPath = java.nio.file.Paths.get(root).toAbsolutePath
    val files = java.nio.file.Files.walk(rootPath).iterator().asScala
      .filter(p => p.getFileName.toString == ".gitignore" &&
        java.nio.file.Files.isRegularFile(p))
      .map { p =>
        val rel = rootPath.relativize(p.getParent).toString.replace('\\', '/')
        (rel.count(_ == '/') + (if (rel.isEmpty) 0 else 1), rel, p)
      }.toSeq.sortBy(t => (t._1, t._2))
    files.foldLeft(Seq.empty[Rule]) { case (acc, (_, base, p)) =>
      acc ++ parse(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"),
        base, seq0 = acc.size)
    }
  }

  /** One rule's match as a Column over the root-relative path. */
  private def matchCol(path: Column, r: Rule): Column = {
    val rel = if (r.base.isEmpty) path
      else regexp_replace(path, "^" + java.util.regex.Pattern.quote(r.base + "/"), "")
    val applies = if (r.base.isEmpty) lit(true)
      else path.startsWith(r.base + "/")
    val hits = Seq(Some(r.rxSuffix), r.rxStar, r.rxPrefix).flatten
      .map(rx => rel.rlike(rx)).reduce(_ || _)
    applies && hits
  }

  /** The cascade: fold rules in order, each match overwriting the
    * verdict (`is_ignored`'s last-match-wins loop) — one codegen'd
    * when-chain, no shuffle.
    */
  def ignoredCol(path: Column, rules: Seq[Rule]): Column =
    rules.sortBy(_.seq).foldLeft(lit(false)) { (acc, r) =>
      when(matchCol(path, r), lit(!r.neg)).otherwise(acc)
    }

  /** Walk semantics (`file_discovery.py:238-243`): os.walk prunes any
    * DIRECTORY the cascade ignores, so the observable rule is — a file
    * is excluded when the cascade hits the file path itself OR any
    * ancestor prefix (and a negation cannot resurrect a file whose
    * parent was pruned). Evaluated as exists() over the component
    * prefixes; still one codegen'd projection per path.
    */
  def ignoredWalkCol(path: Column, rules: Seq[Rule]): Column = {
    val parts = split(path, "/")
    val prefixes = transform(sequence(lit(1), size(parts)),
      i => array_join(slice(parts, lit(1), i), "/"))
    exists(prefixes, p => ignoredCol(p, rules))
  }

  /** Driver-side mirror of [[ignoredWalkCol]]. */
  def ignoredWalk(path: String, rules: Seq[Rule]): Boolean = {
    val parts = path.split("/")
    (1 to parts.length).exists(i => ignored(parts.take(i).mkString("/"), rules))
  }

  /** Driver-side evaluator with the same regexes (for specs and
    * metadata-scale callers).
    */
  def ignored(path: String, rules: Seq[Rule]): Boolean =
    rules.sortBy(_.seq).foldLeft(false) { (acc, r) =>
      val applies = r.base.isEmpty || path.startsWith(r.base + "/")
      if (!applies) acc
      else {
        val rel = if (r.base.isEmpty) path else path.drop(r.base.length + 1)
        val hit = Seq(Some(r.rxSuffix), r.rxStar, r.rxPrefix).flatten
          .exists(rx => java.util.regex.Pattern.compile(rx).matcher(rel).find())
        if (hit) !r.neg else acc
      }
    }
}
