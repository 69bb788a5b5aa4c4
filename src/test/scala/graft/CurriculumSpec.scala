package graft

import org.apache.spark.sql.functions._

import graft.text.Curriculum

/** Quality-annealed curriculum: rising floors nest the epochs, each
  * epoch's positions are a contiguous 1..n permutation, epochs
  * reshuffle independently.
  */
class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 200L).map(i => (i, ((i * 37) % 100).toDouble))
    .toDF("id", "score")

  test("epochs nest under rising floors; epoch 0 keeps everything") {
    val out = Curriculum.anneal(docs, "id", "score", epochs = 4).cache()
    val byEpoch = (0 until 4).map(e =>
      e -> out.filter(col("epoch") === e).select("id").as[Long]
        .collect().toSet)
    assert(byEpoch(0)._2.size == 200)
    byEpoch.sliding(2).foreach { case Seq((_, a), (_, b)) =>
      assert(b.subsetOf(a))
      assert(b.size < a.size)
    }
  }

  test("per-epoch positions are a contiguous 1..n permutation") {
    val out = Curriculum.anneal(docs, "id", "score", epochs = 3)
    out.groupBy(col("epoch"))
      .agg(count(lit(1)).as("n"), min(col("pos")).as("lo"),
        max(col("pos")).as("hi"), countDistinct(col("pos")).as("np"))
      .collect().foreach { r =>
        assert(r.getAs[Long]("lo") == 1L)
        assert(r.getAs[Long]("hi") == r.getAs[Long]("n"))
        assert(r.getAs[Long]("np") == r.getAs[Long]("n"))
      }
  }

  test("epoch salt reshuffles: shared docs do not keep relative order") {
    val out = Curriculum.anneal(docs, "id", "score", epochs = 2)
    val shared = out.groupBy(col("id")).agg(count(lit(1)).as("c"))
      .filter(col("c") === 2).select("id").as[Long].collect().toSet
    val order = (e: Int) => out
      .filter(col("epoch") === e && col("id").isin(shared.toSeq: _*))
      .orderBy(col("pos")).select("id").as[Long].collect().toSeq
    assert(order(0) != order(1))
    assert(order(0).toSet == order(1).toSet)
  }
}
