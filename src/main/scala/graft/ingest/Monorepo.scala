package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Monorepo / subproject detection (`utils/monorepo.py`,
  * `chunk_processor.py:204-269`), re-expressed over the discovered file
  * listing instead of filesystem walks: subproject roots are the parent
  * directories of marker files (the reference's package.json fallback,
  * widened to the polyglot markers its parser set implies), subject to
  * the reference's exclusion list and ≤4-path-parts depth cap
  * (`monorepo.py:224-259`); every file is then assigned the DEEPEST
  * containing root (`monorepo.py:320-343`), and the (name, path) pair
  * lands on each chunk as subproject_name/subproject_path
  * (`models.py:247-248`).
  *
  * Scale: the root set is metadata-sized, so assignment is a broadcast
  * prefix-join + max_by over one distinct file listing — the corpus
  * never shuffles.
  */
object Monorepo {

  /** `monorepo.py:11-35` EXCLUDED_SUBPROJECT_DIRS. */
  val ExcludedDirs: Seq[String] = Seq(
    "tests", "test", "examples", "example", "docs", "doc", "scripts",
    "tools", "benchmarks", "benchmark", "node_modules", ".git", ".github",
    ".gitlab", "build", "dist", "__pycache__", ".pytest_cache",
    ".mypy_cache", ".ruff_cache", "coverage", ".coverage", "htmlcov")

  /** Marker files whose parent directory roots a subproject. */
  val MarkerFiles: Seq[String] = Seq(
    "package.json", "pyproject.toml", "go.mod", "Cargo.toml", "build.sbt")

  /** Detect subproject roots from a file listing (file_path [, content]).
    * Root-level markers don't make a subproject (`monorepo.py:238-240`);
    * names come from package.json's "name" when content is available,
    * else the directory basename (`monorepo.py:301-318`).
    */
  def subprojects(files: DataFrame): DataFrame = {
    val basename = regexp_extract(col("file_path"), "([^/]+)$", 1)
    val dir = regexp_extract(col("file_path"), "^(.*)/[^/]+$", 1)
    val parts = split(col("file_path"), "/")
    val markers = files
      .filter(basename.isin(MarkerFiles: _*))
      .filter(col("file_path").contains("/"))           // skip repo-root marker
      .filter(size(parts) <= 4)                          // depth cap
      .filter(size(array_intersect(parts, typedlit(ExcludedDirs))) === 0)
    val named =
      if (files.columns.contains("content"))
        markers.withColumn("pkg_name",
          when(basename === "package.json",
            get_json_object(col("content"), "$.name")))
      else markers.withColumn("pkg_name", lit(null).cast("string"))
    named
      .select(dir.as("path"), col("pkg_name"))
      .withColumn("name",
        coalesce(col("pkg_name"), regexp_extract(col("path"), "([^/]+)$", 1)))
      .select(col("name"), col("path"))
      .distinct()
  }

  /** Assign each row's file_path to the deepest containing subproject,
    * adding subproject_name/subproject_path (null outside any root).
    */
  def withSubproject(df: DataFrame, subprojectRoots: DataFrame): DataFrame = {
    val sp = subprojectRoots.select(
      col("name").as("sp_name"), col("path").as("sp_path"),
      length(col("path")).as("sp_len"))
    val assigned = df.select(col("file_path")).distinct()
      .join(broadcast(sp),
        col("file_path").startsWith(concat(col("sp_path"), lit("/"))), "left")
      .groupBy(col("file_path"))
      .agg(max_by(struct(col("sp_name"), col("sp_path")), col("sp_len"))
        .as("sp"))
      .select(col("file_path"),
        col("sp.sp_name").as("subproject_name"),
        col("sp.sp_path").as("subproject_path"))
    df.join(assigned, Seq("file_path"), "left")
  }

  /** Per-subproject rollup (the monorepo view the reference's status
    * output summarizes): file and chunk counts per subproject.
    */
  def rollup(chunksWithSubproject: DataFrame): DataFrame =
    chunksWithSubproject
      .groupBy(
        coalesce(col("subproject_name"), lit("(none)")).as("subproject_name"),
        coalesce(col("subproject_path"), lit("")).as("subproject_path"))
      .agg(
        countDistinct(col("file_path")).as("n_files"),
        count(lit(1)).as("n_chunks"))
}
