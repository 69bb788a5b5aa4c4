package graft

import org.apache.spark.sql.functions._

import graft.text.ChatTemplate

class ChatTemplateSpec extends SparkSpec {
  import spark.implicits._

  private val turns = Seq(
    (1L, 2, "assistant", "the answer is four"),
    (1L, 0, "system", "be helpful"),
    (1L, 1, "user", "what is two plus two"),
    (2L, 0, "user", "hi"),
    (2L, 1, "assistant", "hello there"))
    .toDF("conv_id", "i", "role", "content")

  test("turns render in index order under the role tags") {
    val out = ChatTemplate.render(turns, "conv_id", "i", "role", "content")
      .collect().map(r => r.getAs[Long]("conv_id") -> r).toMap
    assert(out(1L).getAs[String]("rendered") ==
      "<|system|>\nbe helpful\n<|end|>\n" +
        "<|user|>\nwhat is two plus two\n<|end|>\n" +
        "<|assistant|>\nthe answer is four\n<|end|>")
    assert(out(1L).getAs[Long]("n_turns") == 3)
  }

  test("loss mask counts exactly the assistant tokens") {
    val out = ChatTemplate.render(turns, "conv_id", "i", "role", "content")
      .collect().map(r => r.getAs[Long]("conv_id") -> r).toMap
    // conv 1: 2 (system) + 5 (user) + 4 (assistant) = 11 tokens, 4 masked
    assert(out(1L).getAs[Long]("n_tokens") == 11)
    assert(out(1L).getAs[Long]("n_masked_tokens") == 4)
    assert(out(1L).getAs[Long]("mask_permille") == 4000 / 11)
    // conv 2: 1 + 2 = 3 tokens, 2 masked
    assert(out(2L).getAs[Long]("n_masked_tokens") == 2)
    assert(out(2L).getAs[Long]("mask_permille") == 666)
  }

  test("rendering is arrival-order independent") {
    val a = ChatTemplate.render(turns, "conv_id", "i", "role", "content")
      .select("conv_id", "rendered").as[(Long, String)].collect().toMap
    val b = ChatTemplate.render(turns.orderBy(col("i").desc).repartition(5),
        "conv_id", "i", "role", "content")
      .select("conv_id", "rendered").as[(Long, String)].collect().toMap
    assert(a == b)
  }
}
