package graft.core

import graft.SparkTestBase

class PreferencesSpec extends SparkTestBase {
  import spark.implicits._

  private def pairs = Seq(
    (1L, "explain joins", "a long chosen answer here", "short one"),
    (2L, "explain shuffles", "tiny", "a much longer rejected answer"),
    (3L, "EXPLAIN   joins", "same length", "also length")
  ).toDF("id", "prompt", "chosen", "rejected")

  test("pairLengths and lengthBiasSummary: hand-computed") {
    val pl = Preferences.pairLengths(pairs, "id", "chosen", "rejected")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(pl(1L) == ((5L, 2L, 3L)))
    assert(pl(2L) == ((1L, 5L, -4L)))
    assert(pl(3L) == ((2L, 2L, 0L)))
    val s = Preferences.lengthBiasSummary(pairs, "id", "chosen", "rejected")
      .head()
    assert(s.getLong(0) == 3L)
    assert(math.abs(s.getDouble(1) - 1.0 / 3) < 1e-6)  // only pair 1 longer
    assert(math.abs(s.getDouble(2) - (3.0 - 4.0 + 0.0) / 3) < 1e-6)
  }

  test("dedupByPrompt keys on the NORMALISED prompt") {
    // ids 1 and 3 share a prompt up to case/whitespace -> min id 1 kept
    val kept = Preferences.dedupByPrompt(pairs, "prompt", "id")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("promptLeakageAcrossSplits flags only prompts spanning splits") {
    val df = Seq(
      (1L, "shared prompt", "train"),
      (2L, "shared prompt", "eval"),
      (3L, "Shared   PROMPT", "eval"),   // same prompt after normalisation
      (4L, "train only", "train"),
      (5L, "train only", "train")
    ).toDF("id", "prompt", "split")
    val out = Preferences.promptLeakageAcrossSplits(df, "prompt", "split")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((2L, 3L))) // one leaking prompt: 2 splits, 3 pairs
  }
}
