package graft

import org.apache.spark.sql.functions._

import graft.text.LengthBatches

class LengthBatchesSpec extends SparkSpec {
  import spark.implicits._

  // skewed lengths: many short docs, a heavy tail — the regime where
  // length grouping pays
  private lazy val docs = (0L until 300L).map { i =>
    val len = if (i % 10 == 0) 900 + (i % 7).toInt else 20 + (i % 30).toInt
    (i, len)
  }.toDF("doc_id", "n_tokens")

  test("length-sorted batching cuts padding waste vs shuffle order") {
    val sortedWaste = LengthBatches
      .lengthBatches(docs, "doc_id", "n_tokens", 32)
      .agg(sum(col("pad_waste"))).head().getLong(0)
    // shuffle-order baseline: batch by hashed position instead of
    // length order (what a trainer pays without group_by_length)
    val shuffled = graft.text.Sampling.globalRunningSum(
      docs.withColumn("hk", graft.functions.PortableHash
        .hash60(col("doc_id"), 5)).withColumn("one", lit(1)),
      Seq(col("hk").asc, col("doc_id").asc), "one")
      .withColumn("batch_id", expr("(cum - 1) div 32L"))
      .groupBy("batch_id")
      .agg(count(lit(1)).as("n"), max("n_tokens").as("mx"),
        sum(col("n_tokens").cast("long")).as("s"))
      .agg(sum(col("mx").cast("long") * col("n") - col("s")))
      .head().getLong(0)
    assert(sortedWaste < shuffled / 4,
      s"sorted=$sortedWaste shuffled=$shuffled")
  }

  test("batch stats are exact and the last batch may be short") {
    val b = LengthBatches.lengthBatches(docs, "doc_id", "n_tokens", 32)
      .orderBy("batch_id").collect()
    assert(b.map(_.getAs[Int]("n_docs")).sum == 300)
    assert(b.dropRight(1).forall(_.getAs[Int]("n_docs") == 32))
    assert(b.last.getAs[Int]("n_docs") == 300 % 32)
    // within the length order, batch max_len is monotone non-decreasing
    val maxes = b.map(_.getAs[Int]("max_len"))
    assert(maxes.zip(maxes.tail).forall { case (a, c) => a <= c })
    b.foreach { r =>
      assert(r.getAs[Long]("pad_waste") ==
        r.getAs[Int]("max_len").toLong * r.getAs[Int]("n_docs") -
          r.getAs[Long]("sum_tokens"))
    }
  }

  test("deterministic under input partitioning") {
    val a = LengthBatches.lengthBatches(docs, "doc_id", "n_tokens", 32)
      .orderBy("batch_id").collect().toSeq
    val b = LengthBatches.lengthBatches(
      docs.orderBy(rand(3)).repartition(17), "doc_id", "n_tokens", 32)
      .orderBy("batch_id").collect().toSeq
    assert(a == b)
  }
}
