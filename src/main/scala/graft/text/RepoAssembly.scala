package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repo-level source concatenation — the code-corpus assembly step used
  * by code-model pipelines (StarCoder/The Stack preprocessing): all
  * files of a repository joined into ONE training document in a
  * deterministic path order, each file introduced by a path header, so
  * the model sees cross-file repo context. The inverse trade of
  * [[Packing]]: packing splits a token stream into fixed blocks,
  * repo-assembly first builds the per-repo stream.
  *
  * Determinism: files order by (path, file id) inside the group —
  * `sort_array` over structs gives a total order regardless of how the
  * aggregation buffers arrived (collect_list order is NOT a contract);
  * the concatenated string and its sha256 are then engine-exact.
  *
  * Scale shape: one hash aggregation keyed by repo; per-group state is
  * the repo's own files (bounded by repo size — the operator's natural
  * unit of work, same bound the downstream tokenizer pays anyway). No
  * window, no global sort; repos parallelize independently.
  */
object RepoAssembly {

  /** Header line prepended to each file body. */
  def header(path: Column): Column = concat(lit("<file: "), path, lit(">\n"))

  /** One row per repo: (repo, n_files, n_chars, doc, doc_sha) where
    * `doc` = files sorted by (path, id), each as header + body, joined
    * with a blank line.
    */
  def concatRepos(files: DataFrame, repoCol: String, pathCol: String,
      idCol: String, textCol: String): DataFrame =
    files
      .select(col(repoCol).as("repo"),
        struct(col(pathCol).as("path"), col(idCol).as("id"),
          col(textCol).as("body")).as("f"))
      .groupBy(col("repo"))
      .agg(sort_array(collect_list(col("f"))).as("fs"))
      .select(col("repo"),
        size(col("fs")).as("n_files"),
        array_join(transform(col("fs"),
          f => concat(header(f.getField("path")), f.getField("body"))),
          "\n\n").as("doc"))
      .withColumn("n_chars", length(col("doc")))
      .withColumn("doc_sha", sha2(col("doc"), 256))
      .select(col("repo"), col("n_files"), col("n_chars"), col("doc"),
        col("doc_sha"))
}
