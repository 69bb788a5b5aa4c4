package graft

import java.sql.Timestamp

import graft.chunk.Chunker
import graft.core.FileRecord

/** HTML chunker fidelity — mirrors `tests/test_html_parser.py`:
  * semantic-section extraction, script/style exclusion, section-id
  * capture, small-section merging, empty/malformed handling.
  */
class HtmlChunkerSpec extends SparkSpec {

  private def rec(path: String, content: String) =
    FileRecord(path, "html", Chunker.sha256Hex(content),
      new Timestamp(0L), content.length.toLong, content)

  private val page =
    """<!DOCTYPE html>
      |<html lang="en">
      |<head>
      |  <title>Documentation - Vector Search</title>
      |  <style>body { font-family: Arial; } .highlight { background: yellow; }</style>
      |  <script>console.log('This script should be ignored');</script>
      |</head>
      |<body>
      |  <header>
      |    <h1 id="main-title">Vector Search Documentation</h1>
      |    <p>A comprehensive guide to semantic code search with vector embeddings.</p>
      |  </header>
      |  <main id="content">
      |    <section id="introduction">
      |      <h2>Introduction</h2>
      |      <p>Vector search enables semantic code search by converting code into
      |      high-dimensional embeddings, searching by meaning rather than keywords.</p>
      |      <p>The system supports multiple programming languages including Python,
      |      JavaScript, and TypeScript with efficient vector storage and retrieval.</p>
      |    </section>
      |    <section id="features">
      |      <h2>Key Features</h2>
      |      <p>Our vector search implementation provides several advanced semantic
      |      capabilities that make large-scale code discovery easier and more intuitive.</p>
      |    </section>
      |  </main>
      |  <h1 id="advanced">Advanced Usage</h1>
      |  <section id="pooling">
      |    <p>Advanced features include connection pooling for improved performance,
      |    incremental indexing for large codebases, and custom parser registration
      |    for new languages. Connection pooling maintains persistent database
      |    connections and provides measurable performance improvements in repeated
      |    search operations across large indexed corpora.</p>
      |  </section>
      |  <h1 id="faq">Frequently Asked Questions</h1>
      |  <section id="faq-body">
      |    <p>Common questions cover index sizing, memory usage during embedding,
      |    and how the incremental watcher decides which files need reindexing
      |    after a change is detected on disk by the filesystem monitor.</p>
      |  </section>
      |  <footer>
      |    <p>Documentation version 1.0.0. Last updated January 2025.</p>
      |  </footer>
      |</body>
      |</html>
      |""".stripMargin

  test("html: semantic chunks extracted, script/style ignored") {
    val chunks = Chunker.chunkFile(rec("doc.html", page))
    assert(chunks.length >= 3)
    val all = chunks.map(_.content).mkString(" ")
    assert(!all.contains("console.log"))
    assert(!all.contains("font-family"))
    assert(all.toLowerCase.contains("vector search"))
    assert(all.toLowerCase.contains("semantic"))
  }

  test("html: section ids captured and chunk types mapped") {
    val chunks = Chunker.chunkFile(rec("doc.html", page))
    assert(chunks.exists(_.parent_name.nonEmpty))
    assert(chunks.exists(c => c.name.contains("#")))
    val types = chunks.map(_.chunk_type).toSet
    assert(types.subsetOf(Set("heading", "section", "paragraph", "content")))
  }

  test("html: small chunks merged — none under 20 chars") {
    val chunks = Chunker.chunkFile(rec("doc.html", page))
    assert(chunks.forall(_.content.length >= 20))
  }

  test("html: script/style-only page produces no chunks; malformed is graceful") {
    val scriptOnly =
      "<html><head><script>var x = 1;</script><style>.a{}</style></head></html>"
    assert(Chunker.chunkFile(rec("s.html", scriptOnly)).isEmpty)
    val malformed = "<html><body><h1>Broken <p>Unclosed paragraph " +
      "with enough text to survive the minimum size filter for chunks."
    assert(Chunker.chunkFile(rec("m.html", malformed)).nonEmpty)
  }
}
