package graft

import org.apache.spark.sql.functions._

import graft.functions.{AsciiText, PortableHash}
import graft.text.TextFunctions

/** The fused native normalize (AsciiNormalize byte walk) must stay
  * bit-identical to the regex-chain reference it replaced — every
  * DuckDB oracle mirrors the regex form, so any divergence breaks the
  * hash compare corpus-wide. Same for the native Md5Low60 vs the
  * driver-side hash60Local mirror.
  */
class AsciiNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val nasty = Seq(
    "Hello, World!",
    "  leading and   trailing  ",
    "",
    "   ",
    "!!!???",
    "MiXeD CaSe 123",
    "tabs\tand\nnewlines\r\nhere",
    "unicode: café über straße 中文 😀 ok",
    "aİb",                       // dotted capital I: lowercases to 2 chars
    "punct-in_word's edge.case",
    "1337 h4x0r",
    "éèê only accents",
    "x",
    "CRLF at end\r\n")

  test("native normalize ≡ regex-chain normalize on adversarial inputs") {
    val df = nasty.toDF("t")
      .select(col("t"),
        TextFunctions.normalize(col("t")).as("native"),
        TextFunctions.normalizeRegex(col("t")).as("regex"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"normalize mismatch on ${r.getString(0)}: " +
          s"native=[${r.getString(1)}] regex=[${r.getString(2)}]")
    }
  }

  test("native normalize ≡ regex-chain on the sf0.001 documents corpus") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val docs = graft.tables.Tables.documents(spark, dir)
    val bad = docs.select(
        TextFunctions.normalize(col("text")).as("native"),
        TextFunctions.normalizeRegex(col("text")).as("regex"))
      .filter(col("native") =!= col("regex"))
      .count()
    assert(bad == 0L)
  }

  test("driver-side AsciiText.normalize mirrors the expression") {
    val df = nasty.toDF("t")
      .select(col("t"), TextFunctions.normalize(col("t")).as("n"))
    df.collect().foreach { r =>
      val local = AsciiText.normalize(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)))
      assert(local.toString == r.getString(1))
    }
  }

  test("native Md5Low60 ≡ hash60Local on strings incl. unicode") {
    val vals = nasty ++ Seq("t123", "alpha beta gamma")
    val got = vals.toDF("v")
      .select(PortableHash.hash60(lit("seed"), col("v")).as("h"))
      .collect().map(_.getLong(0))
    val want = vals.map(v => PortableHash.hash60Local("seed", v))
    assert(got.toSeq == want)
  }

  test("native TokenWindowHashes ≡ interpreted fold ≡ local mirror") {
    val toks = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val th = toks.map(t => PortableHash.hash60Local("tok", t))
    val want = (0 to 2).map(s => PortableHash.windowHash60Local(
      th.slice(s, s + 8)))
    val got = Seq(toks).toDF("toks")
      .select(posexplode(PortableHash.tokenWindowHashes(col("toks"), 8)))
      .orderBy("pos").collect().map(_.getLong(1))
    assert(got.toSeq == want)
    // short array → empty; exact-length array → one window
    val edge = Seq((Seq("a", "b"), Seq("a", "b", "c")))
      .toDF("short", "exact")
      .select(size(PortableHash.tokenWindowHashes(col("short"), 3)).as("s"),
        element_at(PortableHash.tokenWindowHashes(col("exact"), 3), 1).as("e"))
      .head()
    assert(edge.getInt(0) == 0)
    assert(edge.getLong(1) == PortableHash.windowHash60Local(
      Seq("a", "b", "c").map(t => PortableHash.hash60Local("tok", t))))
  }

  test("native TokenKGrams ≡ HOF shingles (values, order, distinct)") {
    val rows = Seq(
      Seq("a", "b", "c", "d", "a", "b", "c", "d"),  // repeats → distinct
      Seq("x", "y", "z"),                            // exactly k
      Seq("solo", "pair", "tri", "quad"),
      Seq("t1", "t1", "t1", "t1", "t1"))             // all-equal grams
    val df = rows.toDF("toks").filter(size(col("toks")) >= 3)
      .select(TextFunctions.shingles(col("toks"), 3).as("native"),
        TextFunctions.shinglesHof(col("toks"), 3).as("hof"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
    }
    // shorter than k → empty (the native form is total)
    val short = Seq(Seq("a", "b")).toDF("toks")
      .select(size(TextFunctions.shingles(col("toks"), 3))).head().getInt(0)
    assert(short == 0)
  }

  test("windowHash60 column fold ≡ windowHash60Local") {
    val toks = Seq("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")
    val th = toks.map(t => PortableHash.hash60Local("tok", t))
    val want = (0 to 2).map(s => PortableHash.windowHash60Local(
      th.slice(s, s + 8)))
    val got = Seq(toks).toDF("toks")
      .select(posexplode(transform(sequence(lit(1), lit(3)), i =>
        PortableHash.windowHash60(
          transform(col("toks"), t => PortableHash.hash60(lit("tok"), t)),
          i, 8))))
      .orderBy("pos").collect().map(_.getLong(1))
    assert(got.toSeq == want)
  }
}
