package graft.ingest

import java.io.File
import java.nio.file.{Files, Paths}

/** Git hooks installer for automatic reindexing — the reference's
  * `core/git_hooks.py:12-240` (install/uninstall of post-commit /
  * post-merge / post-checkout, integrate-with-existing-hook with a
  * `.backup`, sentinel-marked scripts, never blocking git).
  *
  * Spark-first twist: the reference's hook shells back into its own CLI
  * to run a bounded auto-index check. Here the hook is a PRODUCER for
  * the streaming pipeline instead — it appends the commit's changed
  * paths as FileEvent JSON lines to a `.graft/events/` spool, which is
  * exactly the event-stream shape `WatchStream` ingests (ST1-ST3): a
  * `readStream.schema(eventSchema).json(spool)` source debounces and
  * applies them as one idempotent micro-batch. The hook stays O(changed
  * files), needs no JVM at commit time, and the reindex work happens
  * where it belongs — on the cluster.
  */
object GitHooks {

  val Sentinel = "# graft vector-search hook"
  val DefaultHookTypes: Seq[String] =
    Seq("post-commit", "post-merge", "post-checkout")

  /** Spool-relative path the generated hooks append to. */
  val SpoolDir = ".graft/events"

  def isGitRepo(root: File): Boolean = new File(root, ".git").isDirectory

  private def setExecutable(f: File): Unit = { f.setExecutable(true, false); () }

  /** The generated hook body: emit one FileEvent JSON line per path
    * changed by the commit/merge/checkout (A→created, D→deleted,
    * R→moved with dest, else modified) into a per-commit spool file.
    * Always exits 0 — a hook must never block git (reference
    * `git_hooks.py:158-160`).
    */
  def hookScript(hookType: String): String =
    s"""#!/bin/bash
       |$Sentinel - $hookType
       |# Auto-generated - do not edit manually
       |SPOOL="$SpoolDir"
       |mkdir -p "$$SPOOL" || exit 0
       |TS=$$(date -u +%Y-%m-%dT%H:%M:%SZ)
       |git diff-tree --no-commit-id --name-status -r HEAD 2>/dev/null \\
       |  | while IFS=$$'\\t' read -r st path dest; do
       |  case "$$st" in
       |    D*) ev=deleted;;
       |    A*) ev=created;;
       |    R*) ev=moved;;
       |    *)  ev=modified;;
       |  esac
       |  if [ "$$ev" = moved ]; then
       |    printf '{"file_path":"%s","event_type":"moved","dest_path":"%s","ts":"%s"}\\n' \\
       |      "$$path" "$$dest" "$$TS"
       |  else
       |    printf '{"file_path":"%s","event_type":"%s","ts":"%s"}\\n' \\
       |      "$$path" "$$ev" "$$TS"
       |  fi
       |done >> "$$SPOOL/$$(git rev-parse --short HEAD 2>/dev/null || echo head).jsonl"
       |exit 0
       |""".stripMargin

  /** Install hooks; integrates with a pre-existing hook by appending
    * (original backed up to `<hook>.backup`), idempotent when the
    * sentinel is already present. Returns false if `root` is not a git
    * repo.
    */
  def install(root: File,
      hookTypes: Seq[String] = DefaultHookTypes): Boolean = {
    if (!isGitRepo(root)) return false
    val hooksDir = new File(root, ".git/hooks")
    hooksDir.mkdirs()
    hookTypes.forall { ht =>
      val f = new File(hooksDir, ht)
      val script = hookScript(ht)
      if (!f.exists()) {
        Files.writeString(f.toPath, script)
        setExecutable(f)
        true
      } else {
        val existing = Files.readString(f.toPath)
        if (existing.contains(Sentinel)) true // already installed
        else {
          Files.writeString(
            Paths.get(f.getPath + ".backup"), existing)
          Files.writeString(f.toPath,
            existing.stripTrailing() + "\n\n" + script)
          setExecutable(f)
          true
        }
      }
    }
  }

  /** Uninstall: delete hooks we own outright; strip just our appended
    * section from integrated hooks. Missing hooks count as uninstalled.
    */
  def uninstall(root: File,
      hookTypes: Seq[String] = DefaultHookTypes): Boolean = {
    if (!isGitRepo(root)) return false
    val hooksDir = new File(root, ".git/hooks")
    hookTypes.forall { ht =>
      val f = new File(hooksDir, ht)
      if (!f.exists()) true
      else {
        val content = Files.readString(f.toPath)
        if (!content.contains(Sentinel)) true // not ours, leave alone
        else if (content.trim.startsWith("#!/bin/bash") &&
            content.indexOf(Sentinel) == content.indexOf('\n') + 1) {
          f.delete()
        } else {
          // integrated: drop from our sentinel's shebang to our exit 0
          val idx = content.indexOf(Sentinel)
          val start = content.lastIndexOf("#!/bin/bash", idx)
          val end = content.indexOf("exit 0", idx)
          val stripped =
            content.substring(0, math.max(start, 0)).stripTrailing() +
              "\n" + content.substring(
                if (end >= 0) end + "exit 0".length else content.length)
          Files.writeString(f.toPath, stripped.stripTrailing() + "\n")
          true
        }
      }
    }
  }

  /** The spool's Spark schema — matches `WatchStream.FileEvent`. */
  def eventSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("file_path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("dest_path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))

  /** Streaming source over a repo's hook spool: new per-commit JSONL
    * files surface as FileEvent micro-batches for `WatchStream.start`.
    */
  def spoolStream(spark: org.apache.spark.sql.SparkSession,
      root: File): org.apache.spark.sql.DataFrame =
    spark.readStream.schema(eventSchema)
      .json(new File(root, SpoolDir).getAbsolutePath)
}
