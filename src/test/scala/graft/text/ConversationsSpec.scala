package graft.text

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ConversationsSpec extends SparkTestBase {
  import spark.implicits._

  private def turnsDF(rows: (Long, Seq[(String, String)])*) =
    rows.toDF("conv_id", "raw")
      .select($"conv_id", transform($"raw", t =>
        struct(t.getField("_1").as("role"), t.getField("_2").as("content")))
        .as("turns"))

  test("syntheticConversationTable splits tokens into alternating turns") {
    val docs = Seq((0L, "a b c d e"), (1L, "p q r"), (2L, "x y"))
      .toDF("doc_id", "text")
    val conv = Conversations.syntheticConversationTable(docs, "doc_id", "text")
    val flat = Conversations.flattenTurns(conv)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSeq.sortBy(x => (x._1, x._2))
    // id 0: k=2, leading system (0%4=0): system gets toks 1..2, user 3..5
    // id 1: k=3, no system: user "p", assistant "q", user "r"
    // id 2: k=4, toks "x y": splits 0,1,1,2 -> "", "x", "", "y"
    assert(flat == Seq(
      (0L, 0L, "system", "a b"), (0L, 1L, "user", "c d e"),
      (1L, 0L, "user", "p"), (1L, 1L, "assistant", "q"), (1L, 2L, "user", "r"),
      (2L, 0L, "user", ""), (2L, 1L, "assistant", "x"),
      (2L, 2L, "user", ""), (2L, 3L, "assistant", "y")))
  }

  test("turnProfile: counts, token totals, alternation hygiene") {
    val conv = turnsDF(
      1L -> Seq("system" -> "be brief", "user" -> "hi there", "assistant" -> "hello"),
      2L -> Seq("user" -> "a", "user" -> "b"),             // repeated role
      3L -> Seq("user" -> "a", "system" -> "late"),        // system not leading
      4L -> Seq())                                          // empty conversation
    val got = Conversations.turnProfile(conv)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getBoolean(6)))).toMap
    assert(got(1L) == ((3L, 1L, 1L, 1L, 5L, true)))
    assert(got(2L) == ((2L, 0L, 2L, 0L, 2L, false)))
    assert(got(3L) == ((2L, 1L, 1L, 0L, 2L, false)))
    assert(got(4L) == ((0L, 0L, 0L, 0L, 0L, true)))
  }

  test("turnProfile: null struct ELEMENT counts toward n_turns only") {
    val conv = spark.sql(
      """SELECT CAST(9 AS BIGINT) AS conv_id, array(
        |  named_struct('role', 'user', 'content', 'hi there'),
        |  CAST(NULL AS struct<role:string,content:string>),
        |  named_struct('role', 'assistant', 'content', 'hello')) AS turns""".stripMargin)
    val r = Conversations.turnProfile(conv).collect().head
    // 3 turns, null element contributes no role bucket / tokens, and a
    // null role never fires the repeated-role or late-system rules
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getBoolean(6)) == ((3L, 0L, 1L, 1L, 3L, true)))
  }

  test("turnProfile total tokens equals the source token count on the fixture") {
    val docs = Seq((5L, "one two three four five six seven"),
      (6L, ""), (7L, "  lots   of    spaces  ")).toDF("doc_id", "text")
    val conv = Conversations.syntheticConversationTable(docs, "doc_id", "text")
    val got = Conversations.turnProfile(conv)
      .select("conv_id", "total_tokens", "alternates")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got(5L) == ((7L, true)))
    assert(got(6L) == ((0L, true)))
    assert(got(7L) == ((3L, true)))
  }

  test("renderConversation emits role-tagged training text") {
    val conv = turnsDF(1L -> Seq("user" -> "hi", "assistant" -> "hello"))
    val s = conv.select(Conversations.renderConversation($"turns").as("r"))
      .as[String].head()
    assert(s == "<|user|> hi\n<|assistant|> hello")
  }

  test("conversationDedup keeps min id per transcript; roles matter") {
    val conv = turnsDF(
      10L -> Seq("user" -> "hi", "assistant" -> "hello"),
      3L -> Seq("user" -> "hi", "assistant" -> "hello"),    // dup, smaller id
      11L -> Seq("assistant" -> "hi", "user" -> "hello"),   // roles swapped
      12L -> Seq("user" -> "hi", "assistant" -> "goodbye"))
    val kept = Conversations.conversationDedup(conv)
      .select("conv_id").as[Long].collect().toSet
    assert(kept == Set(3L, 11L, 12L))
    // schema passes through intact
    assert(Conversations.conversationDedup(conv).columns.toSeq ==
      Seq("conv_id", "turns"))
  }
}
