package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the codegen kernels byte-for-byte against the Spark-expression
  * formulations they replaced, on inputs the corpus fixtures do not
  * reach: supplementary-plane code points (surrogate pairs), combining
  * marks (script INHERITED — no class), mixed scripts, and null-bearing
  * conversation turns. */
class KernelParitySpec extends SparkTestBase {
  import spark.implicits._

  test("scriptCounts matches the per-class regex strips on adversarial text") {
    // supplementary-plane literals via surrogate escapes: math fraktur
    // U+1D518 (script COMMON) and CJK extension B U+20000 (script HAN)
    val fraktur = "𝔘𝔫𝔦"
    val cjkExtB = "𠀀𪛖"
    val tricky = Seq(
      "hello мир 世界 مرحبا " +
        "γειά 안녕 こんにちは " +
        "カタカナ 123",
      "éclair café", // combining acute: INHERITED, no class
      fraktur,
      cjkExtB,
      "tab\tand\nnewline\r mix 7",
      "", "   ", "!!!@#$%")
      .toDF("text").withColumn("doc_id", monotonically_increasing_id())
    val kernel = graft.text.TextFunctions.scriptProfile(tricky, "doc_id", "text")
    // the retired formulation: one [^\p{IsXxx}] strip per class
    val body = regexp_replace(coalesce(col("text"), lit("")), "\\s+", "")
    val n = length(body)
    val regexCols = graft.text.TextFunctions.scriptClasses.map { case (name, cls) =>
      when(n === 0, 0.0)
        .otherwise(round(
          length(regexp_replace(body, s"[^$cls]", "")).cast("double") / n, 6))
        .as(s"${name}_frac")
    }
    val regex = tricky.select(
      col("doc_id") +: n.cast("long").as("n_chars") +: regexCols: _*)
    val ks = kernel.drop("dominant_script").collect().map(_.toSeq).toSet
    val rs = regex.collect().map(_.toSeq).toSet
    assert(ks == rs, s"kernel/regex divergence:\nkernel: $ks\nregex: $rs")
  }

  test("ConvRenderExpr matches the HOF render on null-bearing turns") {
    val conv = Seq(
      (1L, Seq(("user", "hi"), ("assistant", "hello there"))),
      (2L, Seq((null.asInstanceOf[String], "orphan"),
        ("user", null.asInstanceOf[String]), ("system", "s"))),
      (3L, Seq.empty[(String, String)]))
      .toDF("id", "raw")
      .select(col("id"), expr(
        "transform(raw, t -> named_struct('role', t._1, 'content', t._2))")
        .as("turns"))
    val hof = conv.select(col("id"), array_join(
      transform(col("turns"), t =>
        concat(lit("<|"), t.getField("role"), lit("|> "), t.getField("content"))),
      "\n").as("txt"))
    val kernel = conv.select(col("id"),
      graft.text.Conversations.renderConversation(col("turns")).as("txt"))
    assert(kernel.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      hof.collect().map(r => r.getLong(0) -> r.getString(1)).toMap)
  }

  test("BigramPairsExpr matches zip_with slices incl. null tokens") {
    val toks = Seq(
      Seq("a", "b", "c"), Seq("only"), Seq.empty[String],
      Seq("x", null, "z"))
      .toDF("toks").withColumn("id", monotonically_increasing_id())
    // the HOF formulation is undefined below 2 tokens (negative slice
    // length) — production guarded it with `where(size >= 2)`; the
    // kernel subsumes the guard by returning the empty pair array
    val hof = toks.select(col("id"),
      when(size(col("toks")) < 2,
        expr("CAST(array() AS array<struct<prev: string, w: string>>)"))
        .otherwise(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => struct(a.as("prev"), b.as("w")))).as("p"))
    val kernel = toks.select(col("id"),
      org.apache.spark.sql.graft.ColumnBridge(BigramPairsExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("toks")))).as("p"))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), to_json(col("p")).as("j"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(norm(kernel) == norm(hof))
  }
}
