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

  test("syntheticConversationTable: ConvTurnsExpr kernel ≡ the HOF formulation") {
    // the r19 codegen kernel must reproduce the interpreted
    // transform/slice/concat_ws build byte-for-byte, including the
    // double-arithmetic turn boundaries, null text, empty text, and
    // every (k, system-offset) residue class
    import graft.text.TextFunctions.normTokens
    val texts = Seq("a b c d e f g h i j k", "p q r", "x y", "", "   ",
      "one", null, "many tokens here to split across turns unevenly ok",
      "\ttabs\tand\nnewlines mixed   spaces")
    val docs = (0L until 24L).map(i =>
      (i, texts((i % texts.length).toInt))).toDF("doc_id", "text")
    val hof = {
      val bound = docs.select(col("doc_id").cast("long").as("conv_id"),
        normTokens(col("text")).as("__t"))
      val toks = col("__t")
      val n = size(toks)
      val k = (lit(2) + pmod(col("conv_id"), lit(3))).cast("int")
      val o = when(pmod(col("conv_id"), lit(4)) === 0, lit(1)).otherwise(lit(0))
      val turns = transform(sequence(lit(0), k - 1), j => {
        val start = floor(j.cast("double") * n / k).cast("int") + 1
        val len = floor((j + 1).cast("double") * n / k).cast("int") - start + 1
        val role = when(j < o, "system")
          .otherwise(when(pmod(j - o, lit(2)) === 0, "user").otherwise("assistant"))
        struct(role.as("role"),
          concat_ws(" ", slice(toks, start, greatest(len, lit(0)))).as("content"))
      })
      bound.select(col("conv_id"), turns.as("turns"))
    }
    val kernel = Conversations.syntheticConversationTable(docs, "doc_id", "text")
    def flat(df: org.apache.spark.sql.DataFrame) =
      Conversations.flattenTurns(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
        .toSeq.sortBy(x => (x._1, x._2))
    assert(flat(kernel) == flat(hof))
  }

  test("ConvKernels.turns joins content at byte level (ADVICE r19)") {
    // tokens carrying invalid UTF-8 bytes must pass through verbatim —
    // the pre-r20 StringBuilder/toString build round-tripped through
    // UTF-16 and rewrote them to replacement chars
    import org.apache.spark.unsafe.types.UTF8String
    val bad = UTF8String.fromBytes(Array[Byte](0x61, 0xFF.toByte, 0x62))
    val ok = UTF8String.fromString("tok")
    val toks = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](bad, ok, bad, ok, null, ok))
    // id = 1 → k = 3 turns, no system turn; turn 0 covers tokens 0..1
    val turns = graft.functions.ConvKernels.turns(toks, 1L)
    val c0 = turns.getStruct(0, 2).getUTF8String(1)
    val expected = Array[Byte](0x61, 0xFF.toByte, 0x62, ' ',
      't', 'o', 'k')
    assert(java.util.Arrays.equals(c0.getBytes, expected))
    // null tokens still skip like concat_ws: turn 2 covers tokens 4..5
    val c2 = turns.getStruct(2, 2).getUTF8String(1)
    assert(c2.toString == "tok")
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
