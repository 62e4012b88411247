package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.text.TextFunctions.normTokens

/** Chat-transcript operators — conversations as a first-class column
  * shape: `array<struct<role: string, content: string>>`, the standard
  * representation of instruction-tuning / dialogue data. All
  * per-conversation work is narrow (HOFs over the turns array or one
  * explode), so every operator here scales linearly in corpus bytes
  * with no shuffle except where a dedup grain requires one.
  *
  * Reference behavior surface: rdsa-utils has no chat analogue; this is
  * an LLM-pipeline extension family (SURVEY §2 extensions).
  */
object Conversations {

  /** Flatten to one row per turn: `(idCol, turn_idx, role, content)`.
    * One narrow posexplode — the grain for per-turn filtering/PII
    * scrubbing; reassemble with `groupBy(idCol).agg(collect_list)`
    * only when turn order is re-established by sorting on turn_idx. */
  def flattenTurns(
      conv: DataFrame,
      idCol: String = "conv_id",
      turnsCol: String = "turns"): DataFrame =
    conv.select(col(idCol), posexplode(col(turnsCol)).as(Seq("turn_idx", "__graft_t")))
      .select(col(idCol), col("turn_idx").cast("long").as("turn_idx"),
        col("__graft_t.role").as("role"),
        col("__graft_t.content").as("content"))

  /** Per-conversation hygiene profile, all in ONE narrow pass with a
    * single codegen'd kernel call per row
    * ([[graft.functions.ConvProfileExpr]] — no explode, no shuffle,
    * no interpreted higher-order expressions): turn/role counts,
    * total whitespace tokens, and `alternates` — true when roles
    * strictly change at every step after position 0 and "system"
    * appears only as the opening turn (the shape a chat-format
    * validator gates on). Empty conversations profile as alternating.
    * The interpreted HOF formulation this replaced measured
    * ~1.6 ms/row (CodegenFallback tax) and survives as the Bench raw
    * baseline's explode+window twin. */
  def turnProfile(
      conv: DataFrame,
      idCol: String = "conv_id",
      turnsCol: String = "turns"): DataFrame = {
    val prof = "__graft_prof"
    conv.withColumn(prof, org.apache.spark.sql.graft.ColumnBridge(
        graft.functions.ConvProfileExpr(
          org.apache.spark.sql.graft.ColumnBridge.expression(col(turnsCol)))))
      .select(col(idCol),
        col(s"$prof.n_turns").as("n_turns"),
        col(s"$prof.n_system").as("n_system"),
        col(s"$prof.n_user").as("n_user"),
        col(s"$prof.n_assistant").as("n_assistant"),
        col(s"$prof.total_tokens").as("total_tokens"),
        col(s"$prof.alternates").as("alternates"))
  }

  /** Render a turns array to one training string:
    * `<|role|> content` per turn, joined by `sep`. Narrow projection —
    * the tokenize-and-pack input column. */
  def renderConversation(turns: Column, sep: String = "\n"): Column =
    // one codegen'd kernel pass (ConvRenderExpr) — the HOF form
    // (array_join over transform+concat) dispatches interpreted
    // CodegenFallback levels per turn; byte-identical output
    ColumnBridge(graft.functions.ConvRenderExpr(
      ColumnBridge.expression(turns), sep))

  /** Exact transcript-grain dedup: keep the minimum-id conversation
    * per rendered transcript (roles AND contents must match;
    * whitespace/case normalised by the fingerprint, the
    * [[graft.dedup.Dedup.exactDedup]] contract). One hash-window
    * exchange at transcript-fingerprint grain. */
  def conversationDedup(
      conv: DataFrame,
      idCol: String = "conv_id",
      turnsCol: String = "turns"): DataFrame = {
    val rendered = "__graft_conv_render"
    graft.dedup.Dedup.exactDedup(
      conv.withColumn(rendered, renderConversation(col(turnsCol))),
      rendered, idCol)
      .drop(rendered)
  }

  /** Deterministic conversation fixture over a (id, text) frame — the
    * oracle-replayable construction behind the q_conv_* queries: doc
    * tokens split into k = 2 + id%3 contiguous turns (turn j spans
    * token positions ⌊j·n/k⌋..⌊(j+1)·n/k⌋−1, so the turns partition
    * the tokens exactly), roles alternating user/assistant with a
    * leading system turn when id%4 = 0. */
  def syntheticConversationTable(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    // one codegen'd kernel pass (ConvTurnsExpr) — the HOF formulation
    //   transform(sequence(0, k-1), j => struct(role,
    //     concat_ws(" ", slice(toks, floor(j·n/k)+1,
    //       greatest(floor((j+1)·n/k)−floor(j·n/k), 0)))))
    // dispatches an interpreted ArrayTransform (CodegenFallback) with
    // a per-turn slice COPY of the token array; the kernel emits the
    // identical turns (ConversationsSpec pins kernel ≡ HOF). Null
    // tokens coalesce to empty — byte-identical contents ("" per
    // turn) since slice-of-null under concat_ws also renders "".
    val id = col(idCol).cast("long")
    val bound = df.select(id.as("conv_id"),
      coalesce(normTokens(col(textCol)), array().cast("array<string>"))
        .as("__graft_toks"))
    bound.select(col("conv_id"),
      ColumnBridge(graft.functions.ConvTurnsExpr(
        ColumnBridge.expression(col("__graft_toks")),
        ColumnBridge.expression(col("conv_id")))).as("turns"))
  }
}
