package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.search.Tokenizer

/** Tokenizer cases from FIXTURES.md A4 / reference bm25_backend.py:297-375. */
class TokenizerSpec extends AnyFunSuite {

  test("compound identifier kept whole plus components") {
    assert(Tokenizer.tokenize("getstream.io") ==
      Seq("getstream.io", "getstream", "io"))
  }

  test("snake_case splits into sub-words after full token") {
    assert(Tokenizer.tokenize("find_by_tag_docs") ==
      Seq("find_by_tag_docs", "find", "by", "tag", "docs"))
  }

  test("camelCase splits lowercased") {
    assert(Tokenizer.tokenize("HybridSearchHandler") ==
      Seq("hybridsearchhandler", "hybrid", "search", "handler"))
  }

  test("pure digits dropped") {
    assert(!Tokenizer.tokenize("version 123 x9").contains("123"))
  }

  test("plain words tokenize to themselves") {
    assert(Tokenizer.tokenize("fast table scan") == Seq("fast", "table", "scan"))
  }
}
