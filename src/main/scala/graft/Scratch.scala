package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf probe — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    import graft.tables.Tables
    import graft.text.TextFunctions
    import graft.functions.PortableHash
    val corpus = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    // stage 1: gram explode only
    val toks = TextFunctions.tokens(col("text"))
    val grams = corpus.select(
      col("doc_id").as("id"),
      explode(array_compact(concat(
        toks,
        zip_with(toks, slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))))).as("gram"))
    t("grams explode+count")(grams.count())
    t("distinct vocab")(grams.select("gram").distinct().count())
    val vocab = grams.select(col("gram")).distinct()
      .withColumn("bucket", pmod(PortableHash.hash60(col("gram"), 7), lit(64)).cast("int"))
    t("vocab hash")(vocab.count())
    val buckets = grams.join(vocab, Seq("gram"))
      .groupBy(col("id"), col("bucket")).agg(count(lit(1)).as("w"))
    t("join+groupBy")(buckets.count())
    t("full embed")(graft.embed.HashEmbedder.embed(corpus, "doc_id", "text").count())
    t("full embed again")(graft.embed.HashEmbedder.embed(corpus, "doc_id", "text").count())
    // variant: materialize toks in a separate projection first
    val toked = corpus.select(col("doc_id").as("id"),
      TextFunctions.tokens(col("text")).as("toks"))
    val grams2 = toked.select(col("id"),
      explode(array_compact(concat(
        col("toks"),
        zip_with(col("toks"),
          slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))))).as("gram"))
    t("grams2 explode+count")(grams2.count())
    t("grams2 again")(grams2.count())
    // the full e2e1 gate
    t("e2e1 gate")(graft.SparkEntry.queries("e2e1_vector_search")(spark, d).count())
    spark.stop()
  }
}
