package graft

import org.apache.spark.sql.functions._

import graft.ann.{Knn, Quantize}
import graft.search.SearchEngine
import graft.util.Salting

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("quantize round-trip error bounded by 8-bit resolution") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 40).map(i => (i.toLong, Array.fill(32)(rnd.nextFloat() * 4 - 2).toSeq))
    val enc = Quantize.encode(rows.toDF("id", "vec"), "vec")
    val err = enc.select(
      col("vec"),
      Quantize.decode(col("codes"), col("qmin"), col("qscale")).as("dec"))
      .withColumn("maxerr", aggregate(
        zip_with(col("vec"), col("dec"), (a, b) => abs(a - b)),
        lit(0.0f), (acc, x) => greatest(acc, x)))
      .agg(max("maxerr")).as[Float].head()
    // resolution = range/255; range ≤ 4 → step ≤ 0.0157, error ≤ step
    assert(err <= 0.017f, s"max abs error $err")
  }

  test("quantized two-stage retrieval matches exact top-k after refine") {
    val rnd = new scala.util.Random(9)
    val centers = Array.fill(4, 16)(rnd.nextFloat() * 8 - 4)
    val rows = for (c <- centers.indices; i <- 0 until 50) yield
      ((c * 50 + i).toLong, centers(c).map(_ + rnd.nextFloat() * 0.3f - 0.15f).toSeq)
    val corpus = rows.toDF("vec_id", "embedding").cache()
    val enc = Quantize.encode(corpus, "embedding")
    val q = corpus.filter(col("vec_id") === 0L)
    val exact = Knn.bruteForceTopK(corpus, "vec_id", "embedding",
      q, "vec_id", "embedding", 10)
      .select("id").as[Long].collect().toSet
    val two = Quantize.requantizedTopK(enc, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 10, refine = 5)
      .select("id").as[Long].collect().toSet
    assert((exact & two).size >= 9, s"refined overlap ${(exact & two).size}")
  }

  test("salted sum equals plain sum") {
    val df = (1 to 10000).map(i => (i % 3, i.toLong)).toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("s"))
      .as[(Int, Long)].collect().toMap
    val salted = Salting.saltedSum(df, Seq("k"), factor = 8, Map("v" -> "s"))
      .as[(Int, Long)].collect().toMap
    assert(plain == salted)
  }

  test("salted join equals plain inner join") {
    val big = (1 to 5000).map(i => (if (i % 10 == 0) 1 else i % 100, i)).toDF("k", "v")
    val small = (0 until 100).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = big.join(small, "k").count()
    val salted = Salting.saltedJoin(big, small, "k", factor = 4).count()
    assert(plain == salted)
  }

  test("code-vector enrichment boosts identifier hits") {
    val engine = new SearchEngine(spark)
    val (chunks, vectors) = engine.buildIndex(sampleRepo)
    val codeVecs = engine.buildCodeVectors(chunks)
    assert(codeVecs.count() == chunks.count())
    val results = engine.vectorSearch(vectors, "load_config", 10, Some(0.0))
    val enriched = engine.codeVectorEnrich(results, codeVecs,
      "load_config", "similarity_score", 10)
    val rows = enriched.select("similarity_score", "enriched_score").collect()
    rows.foreach { r =>
      val d = r.getDouble(1) - r.getDouble(0)
      assert(math.abs(d) < 1e-12 || math.abs(d - 0.15) < 1e-12)
    }
    assert(rows.exists(r => r.getDouble(1) - r.getDouble(0) > 0.1))
  }
}
