package graft

import java.nio.file.Files

import graft.serve.{Chat, Tools}
import graft.serve.Chat._
import graft.serve.Tools.Project

/** The chat loop (`cli/commands/chat.py`) driven by scripted
  * deterministic LLM clients — the model is the declared seam; the
  * session/compaction/tool-loop mechanics on this side are exercised
  * for real against the indexed sample repo.
  */
class ChatSpec extends SparkSpec {

  private lazy val project: Project = {
    val dir = Files.createTempDirectory("chat").toFile
    val p = Project(spark, sampleRepo,
      chunksPath = new java.io.File(dir, "chunks").getAbsolutePath,
      vectorsPath = new java.io.File(dir, "vectors").getAbsolutePath)
    assert(Tools.dispatch(p, "index_project").isRight)
    p
  }

  test("tool loop: model searches, sees real results, then answers") {
    var seenToolContent: Option[String] = None
    val llm = new ChatLlm {
      def chatWithTools(ms: Seq[ChatMessage],
          tools: Seq[Tools.ToolSpec]): LlmTurn = {
        assert(tools.size == 33)
        val toolMsgs = ms.filter(_.role == "tool")
        if (toolMsgs.isEmpty)
          ToolTurn(Seq(ToolCall("search_code",
            Map("query" -> "greet user", "limit" -> 3))))
        else {
          seenToolContent = Some(toolMsgs.last.content)
          TextTurn("answer based on search")
        }
      }
    }
    val session = new ChatSession("you are a code assistant")
    val out = Chat.processQuery(project, session, "who greets?", llm)
    assert(!out.synthesized)
    assert(out.text === "answer based on search")
    assert(out.toolCalls.map(_.name) === Seq("search_code"))
    // the model saw a rendered result table with a header row
    assert(seenToolContent.exists(_.contains("\t")))
    // the search landed in the session's search-history context
    assert(session.getMessages.exists(m =>
      m.role == "system" && m.content.contains("[Recent Searches]")))
  }

  test("dispatch errors surface to the model, not as exceptions") {
    var seen: Option[String] = None
    val llm = new ChatLlm {
      def chatWithTools(ms: Seq[ChatMessage],
          tools: Seq[Tools.ToolSpec]): LlmTurn =
        if (ms.exists(_.role == "tool")) {
          seen = Some(ms.filter(_.role == "tool").last.content)
          TextTurn("ok")
        } else ToolTurn(Seq(ToolCall("no_such_tool", Map.empty)))
    }
    val out = Chat.processQuery(project, new ChatSession("sys"),
      "q", llm)
    assert(out.text === "ok")
    assert(seen.exists(_.startsWith("ERROR: unknown tool")))
  }

  test("history compacts after 5 pairs, preserving a rolling summary") {
    val llm = new ChatLlm {
      def chatWithTools(ms: Seq[ChatMessage],
          tools: Seq[Tools.ToolSpec]): LlmTurn = TextTurn("reply " + ms.size)
    }
    val session = new ChatSession("sys")
    (1 to 8).foreach(i =>
      Chat.processQuery(project, session, s"question number $i", llm))
    assert(session.summary.contains("question number 1"))
    assert(session.summary.contains("question number 3"))
    assert(!session.summary.contains("question number 8"))
    // recent window bounded: 5 pairs = 10 messages
    assert(session.recentMessageCount <= 10)
    val sys = session.getMessages.filter(_.role == "system")
    assert(sys.exists(_.content.contains("[Previous Conversation Summary]")))
  }

  test("tool-budget exhaustion triggers the explicit synthesis turn") {
    val llm = new ChatLlm {
      def chatWithTools(ms: Seq[ChatMessage],
          tools: Seq[Tools.ToolSpec]): LlmTurn =
        if (ms.exists(m => m.role == "user" &&
            m.content.contains("maximum number of tool calls")))
          TextTurn("synthesized from evidence")
        else ToolTurn(Seq(ToolCall("get_project_status", Map.empty)))
    }
    val out = Chat.processQuery(project, new ChatSession("sys"), "q",
      llm, maxIterations = 3)
    assert(out.synthesized)
    assert(out.text === "synthesized from evidence")
    assert(out.toolCalls.size === 3)
  }

  test("task context rides the message stack until cleared") {
    val session = new ChatSession("sys")
    session.setTask("migrate the parser")
    session.updateTaskStatus("blocked")
    val sys = session.getMessages.map(_.content).mkString("\n")
    assert(sys.contains("migrate the parser") && sys.contains("blocked"))
    session.clearTask()
    assert(!session.getMessages.map(_.content).mkString.contains("migrate"))
  }
}
