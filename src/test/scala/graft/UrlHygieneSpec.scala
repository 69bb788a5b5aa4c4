package graft

import org.apache.spark.sql.functions._

import graft.text.UrlHygiene

class UrlHygieneSpec extends SparkSpec {
  import spark.implicits._

  private def canonOf(url: String): (String, String) = {
    val r = UrlHygiene
      .canonicalize(Seq((1L, url)).toDF("doc_id", "url"))
      .select("url_canon", "domain").head()
    (r.getString(0), r.getString(1))
  }

  test("canonicalize folds scheme, host case, default ports and www") {
    assert(canonOf("http://WWW.Example.COM:80/a")._1 ===
      "https://example.com/a")
    assert(canonOf("https://CDN.Example.com:443/a")._1 ===
      "https://cdn.example.com/a")
    // non-default port survives
    assert(canonOf("https://example.com:8080/a")._1 ===
      "https://example.com:8080/a")
  }

  test("canonicalize drops fragments and tracking params, sorts the rest") {
    assert(canonOf("https://example.com/a?z=1&utm_source=x&a=2#frag")._1 ===
      "https://example.com/a?a=2&z=1")
    assert(canonOf("https://example.com/a?fbclid=abc")._1 ===
      "https://example.com/a")
  }

  test("canonicalize normalizes paths but preserves path case") {
    assert(canonOf("https://example.com")._1 === "https://example.com/")
    assert(canonOf("https://example.com/A/B/")._1 ===
      "https://example.com/A/B")
    assert(canonOf("https://example.com/")._1 === "https://example.com/")
  }

  test("registered domain is the last two host labels after www-strip") {
    assert(canonOf("https://www.example.com/a")._2 === "example.com")
    assert(canonOf("https://a.b.example.org/a")._2 === "example.org")
  }

  test("single-label hosts keep the whole host as domain (no ANSI throw)") {
    assert(canonOf("https://localhost/x") === (
      "https://localhost/x", "localhost"))
    assert(canonOf("http://localhost:80") === ("https://localhost/", "localhost"))
  }

  test("uppercase http/https schemes canonicalize like lowercase") {
    assert(canonOf("HTTP://WWW.Example.COM:80/a")._1 === "https://example.com/a")
    assert(canonOf("HTTPS://example.com/a")._1 === "https://example.com/a")
  }

  test("non-http(s) schemes pass through verbatim as their own identity") {
    assert(canonOf("ftp://x.com/f") === ("ftp://x.com/f", ""))
    assert(canonOf("mailto:a@b.com") === ("mailto:a@b.com", ""))
    // so ftp and https to the same path do NOT collapse to one identity
    assert(canonOf("ftp://x.com/f")._1 !== canonOf("https://x.com/f")._1)
  }

  test("dedupByUrl keeps the smallest id per canonical URL") {
    val df = Seq(
      (5L, "http://www.example.com/a?utm_source=x"),
      (3L, "https://example.com:443/a"),
      (9L, "https://example.com/b"))
      .toDF("doc_id", "url")
    val kept = UrlHygiene.dedupByUrl(UrlHygiene.canonicalize(df))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(3L, 9L))
  }

  test("domainCap drops blocklisted domains and caps per domain") {
    val df = Seq(
      (1L, 100L, "https://spam.net/a"),
      (2L, 90L, "https://good.com/a"),
      (3L, 80L, "https://good.com/b"),
      (4L, 80L, "https://good.com/c"),
      (5L, 70L, "https://good.com/d"))
      .toDF("doc_id", "n_chars", "url")
    val out = UrlHygiene.domainCap(
      UrlHygiene.dedupByUrl(UrlHygiene.canonicalize(df)),
      cap = 2, blocklist = Seq("spam.net"))
    val rows = out.select("domain", "dom_rank", "doc_id", "domain_urls")
      .orderBy("dom_rank")
      .as[(String, Int, Long, Long)].collect().toSeq
    // 90 beats the 80s; the 80-tie breaks by doc_id
    assert(rows === Seq(("good.com", 1, 2L, 4L), ("good.com", 2, 3L, 4L)))
  }
}
