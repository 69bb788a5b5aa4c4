package graft

import graft.text.{Mixing, Sharding}

/** Sharding: start-offset shard arithmetic against a driver mirror,
  * manifest consistency, straddling-doc ownership.
  */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 40L).map(i => (i, 10 + (i % 7).toInt))

  private def mirror(shardTokens: Long): Seq[(Long, Int)] = {
    val ordered = docs.sortBy { case (id, _) =>
      ((id * Mixing.Mult + Mixing.Add) % Mixing.Modulus, id)
    }
    var cum = 0L
    ordered.map { case (id, n) =>
      val start = cum; cum += n
      (id, (start / shardTokens).toInt)
    }.sortBy(_._1)
  }

  test("shard assignment equals the driver mirror") {
    val out = Sharding.assignShards(
        docs.toDF("doc_id", "n_tokens"), "doc_id", "n_tokens", 100L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Int]("shard_id")))
    assert(out.toSeq === mirror(100L))
  }

  test("a doc straddling a boundary belongs to its start-offset shard") {
    // 3 docs of 7 tokens, shard size 10: starts 0, 7, 14 -> shards 0,0,1
    val out = Sharding.assignShards(
        Seq((1L, 7), (2L, 7), (3L, 7)).toDF("doc_id", "n_tokens"),
        "doc_id", "n_tokens", 10L)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("shard_id")).toMap
    // shuffle order of ids 1..3 under the LCG, then starts 0/7/14
    val order = Seq(1L, 2L, 3L).sortBy(id =>
      ((id * Mixing.Mult + Mixing.Add) % Mixing.Modulus, id))
    assert(out(order(0)) === 0)
    assert(out(order(1)) === 0)
    assert(out(order(2)) === 1)
  }

  test("manifest partitions the corpus exactly") {
    val assigned = Sharding.assignShards(
      docs.toDF("doc_id", "n_tokens"), "doc_id", "n_tokens", 100L)
    val m = Sharding.manifest(assigned, "doc_id", "n_tokens")
      .orderBy("shard_id").collect()
    assert(m.map(_.getLong(1)).sum === docs.size)
    assert(m.map(_.getLong(2)).sum === docs.map(_._2.toLong).sum)
    // every shard except possibly the last is filled past its floor:
    // the NEXT shard only opens once cum crosses the boundary
    val ids = m.map(_.getInt(0)).toSeq
    assert(ids === (0 until m.length))
  }

  test("partitionBy(shard_id) round-trips losslessly") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val assigned = Sharding.assignShards(
      docs.toDF("doc_id", "n_tokens"), "doc_id", "n_tokens", 100L)
    assigned.write.mode("overwrite").partitionBy("shard_id").parquet(dir)
    val back = spark.read.parquet(dir)
      .select("doc_id", "shard_id").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Int]("shard_id")))
    assert(back.toSeq === mirror(100L))
  }
}
