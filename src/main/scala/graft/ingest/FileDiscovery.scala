package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.FileRecord

/** File-discovery scan (SURVEY §2.1 S1/S2, §2.2 P9).
  *
  * Reference behavior re-expressed (`core/file_discovery.py:19-583`):
  * recursive walk, ignore-pattern predicates, extension→language map,
  * sha256 content hash for change detection (`chunks_backend.py:35-48`).
  *
  * Spark-first: `binaryFile` source with recursive lookup gives a
  * distributed scan whose path/ignore predicates are Column filters
  * (pushed to the file index), so a 100 TB repo tree lists and hashes
  * in parallel — no driver-side os.walk.
  */
object FileDiscovery {

  /** Representative subset of the reference's ~71 default ignore
    * patterns (`config/defaults.py:356-451`), as path-regex predicates.
    */
  val IgnoreDirPattern: String =
    "/(node_modules|\\.git|\\.hg|\\.svn|__pycache__|\\.venv|venv|dist|build|target|\\.idea|\\.vscode|\\.pytest_cache|\\.mypy_cache|coverage|\\.next|\\.cache)/"

  val IgnoreFilePattern: String =
    "(\\.min\\.(js|css)|\\.lock|\\.pyc|\\.class|\\.o|\\.so|\\.jar|\\.zip|\\.tar|\\.gz|\\.png|\\.jpg|\\.gif|\\.pdf)$"

  /** Extension → language (subset of `config/defaults.py:15-213`). */
  val LanguageByExtension: Map[String, String] = Map(
    "py" -> "python", "js" -> "javascript", "jsx" -> "javascript",
    "ts" -> "typescript", "tsx" -> "typescript", "java" -> "java",
    "scala" -> "scala", "go" -> "go", "rs" -> "rust", "rb" -> "ruby",
    "rake" -> "ruby", "gemspec" -> "ruby", "phtml" -> "php", "mjs" -> "javascript",
    "php" -> "php", "cs" -> "csharp", "dart" -> "dart", "c" -> "c",
    "h" -> "c", "cpp" -> "cpp", "hpp" -> "cpp", "md" -> "markdown",
    "txt" -> "text", "html" -> "html", "css" -> "css", "sql" -> "sql",
    "sh" -> "shell", "yaml" -> "yaml", "yml" -> "yaml", "json" -> "json",
    "toml" -> "toml", "xml" -> "xml",
    // subproject markers the monorepo detector needs in the listing
    "mod" -> "text", "sbt" -> "scala")

  /** Discover indexable files under `root` as a Dataset[FileRecord]. */
  def discover(spark: SparkSession, root: String): Dataset[FileRecord] = {
    import spark.implicits._
    val langMap = typedLit(LanguageByExtension)
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(root)
      .withColumn("file_path", regexp_replace(col("path"), "^file:", ""))
      .filter(!col("file_path").rlike(IgnoreDirPattern))
      .filter(!col("file_path").rlike(IgnoreFilePattern))
      // dotfiles (any path segment starting with '.') are skipped
      .filter(!col("file_path").rlike("/\\.[^/]*$"))
      .withColumn("ext", lower(regexp_extract(col("file_path"), "\\.([A-Za-z0-9]+)$", 1)))
      .withColumn("language", langMap(col("ext")))
      .filter(col("language").isNotNull)
      .select(
        col("file_path"),
        col("language"),
        sha2(col("content"), 256).as("file_hash"),
        col("modificationTime").as("mtime"),
        col("length").as("size_bytes"),
        decode(col("content"), "UTF-8").as("content"))
      .as[FileRecord]
  }
}
