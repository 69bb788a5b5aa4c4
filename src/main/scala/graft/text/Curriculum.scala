package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quality-annealed curriculum schedule — the data-ordering step of an
  * annealed training run (brief-mandated LLM-pipeline family): epoch e
  * of E re-trains on the subset of the corpus clearing the e-th RISING
  * exact-quantile quality floor (epoch 0 sees everything, the final
  * epoch only the top slice — the "anneal on high-quality data" recipe),
  * and each epoch gets its own deterministic shuffle order.
  *
  * Scale shape: the floors are E scalars from one exact-percentile
  * aggregate (the `percentile_approx` swap is the documented 100 TB
  * path, as in ccn1); the epoch fan-out is a bounded ×E explode; the
  * within-epoch positions come from ONE distributed two-pass prefix sum
  * over (epoch, key, id) — never a per-epoch single-partition window —
  * with per-epoch offsets (E rows, metadata scale) subtracted from the
  * global running count.
  */
object Curriculum {

  /** (epoch, pos, …) rows: doc `idCol` appears in every epoch whose
    * floor its `scoreCol` clears; `pos` is its 1-based position in the
    * epoch's portable-hash shuffle order (epoch-salted key, id
    * tiebreak).
    */
  def anneal(docs: DataFrame, idCol: String, scoreCol: String,
      epochs: Int, epochSalt: Long = 7919L): DataFrame = {
    require(epochs >= 1, "epochs must be >= 1")
    val ps = (0 until epochs).map(e => e.toDouble / epochs)
    val floors = docs
      .agg(expr(s"percentile($scoreCol, array(${ps.mkString(",")}))"))
      .head().getSeq[Double](0)
    val floorCase = (1 until epochs).foldLeft(lit(floors(0)): Column) {
      (acc, e) => when(col("epoch") === e, lit(floors(e))).otherwise(acc)
    }
    val kept = docs
      .withColumn("epoch", explode(array((0 until epochs).map(lit(_)): _*)))
      .filter(col(scoreCol).cast("double") >= floorCase)
      .withColumn("shuffle_key",
        pmod((col(idCol) + col("epoch") * epochSalt) * Mixing.Mult
          + Mixing.Add, lit(Mixing.Modulus)))
    // per-epoch start offsets: E rows, driver-side by construction
    val counts = kept.groupBy(col("epoch")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Int]("epoch") -> r.getAs[Long]("n"))
      .sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _).dropRight(1)).toMap
    val offMap = typedlit(offsets)
    Sampling.globalRunningSum(kept.withColumn("_one", lit(1)),
        Seq(col("epoch").asc, col("shuffle_key").asc, col(idCol).asc),
        "_one")
      .withColumn("pos",
        col("cum") - coalesce(element_at(offMap, col("epoch")), lit(0L)))
      .drop("_one", "cum")
  }
}
