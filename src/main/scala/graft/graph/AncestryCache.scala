package graft.graph

import org.apache.spark.sql.DataFrame

/** Per-JVM memo of commit-ancestry closures, keyed on (parent-DAG plan
  * identity, refSha) — the closure for a given (repo, ref) never changes
  * within a session, yet every temporal-KG query (`entitiesAtCommit`,
  * `callersAtCommit`, kg_history) needs the same set. The reference pays
  * a subprocess `git merge-base --is-ancestor` per stored SHA
  * (`core/git_utils.py`); here the iterative DAG walk runs once per key
  * and later callers get the already-materialized result (the closure
  * ends in an eager localCheckpoint, so the cached DataFrame is a
  * metadata-scale in-memory relation, safe to broadcast).
  *
  * Plan identity = Catalyst's semanticHash of the analyzed parents plan:
  * two lexically separate reads of the same source canonicalize to the
  * same hash, so g7 and g8 share one walk without threading a cache key
  * through the API.
  */
object AncestryCache {
  private val cache =
    scala.collection.concurrent.TrieMap[(Int, String), DataFrame]()

  def closure(parents: DataFrame, refSha: String): DataFrame = {
    val key = (parents.queryExecution.analyzed.semanticHash(), refSha)
    cache.getOrElseUpdate(key, Kg.ancestorClosure(parents, refSha))
  }

  /** Test hook: drop memoized closures (e.g. between synthetic DAGs that
    * could collide across SparkSessions in one JVM).
    */
  def clear(): Unit = cache.clear()
}
