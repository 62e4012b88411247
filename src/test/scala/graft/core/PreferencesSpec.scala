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

  test("cohenKappa: textbook 2x2 contingency, null rows excluded") {
    val labels = Seq.fill(4)(("yes", "yes")) ++ Seq(("yes", "no"), ("no", "yes")) ++
      Seq.fill(4)(("no", "no"))
    val df = labels.toDF("a", "b")
      .union(Seq((null.asInstanceOf[String], "yes")).toDF("a", "b"))
    val r = Preferences.cohenKappa(df, "a", "b").head()
    assert(r.getAs[Long]("n_items") == 10L)
    assert(r.getAs[Double]("observed_agreement") == 0.8)
    assert(r.getAs[Double]("expected_agreement") == 0.5)
    assert(r.getAs[Double]("kappa") == 0.6)
  }

  test("cohenKappa: single-label degenerate frame reports kappa 0, not NaN") {
    val r = Preferences.cohenKappa(
      Seq(("x", "x"), ("x", "x")).toDF("a", "b"), "a", "b").head()
    assert(r.getAs[Double]("kappa") == 0.0)
    assert(r.getAs[Double]("observed_agreement") == 1.0)
  }

  private def battles = Seq(
    ("A", "B", "a"), ("B", "A", "b"),          // A beats B twice
    ("B", "C", "a"), ("B", "C", "a"),          // B beats C twice
    ("A", "C", "a"), ("C", "A", "a"),          // split 1-1
    ("A", "C", "tie")                          // tie: game, no win
  ).toDF("model_a", "model_b", "winner")

  test("winRates: per-model battles, wins, rate; ties count as battles") {
    val got = Preferences.winRates(battles, "model_a", "model_b", "winner")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("A") == ((5L, 3L, 0.6)))
    assert(got("B") == ((4L, 2L, 0.5)))
    assert(got("C") == ((5L, 1L, 0.2)))
  }

  test("bradleyTerry: symmetric record -> equal scores at 1.0") {
    val sym = Seq(("A", "B", "a"), ("A", "B", "b")).toDF("model_a", "model_b", "winner")
    val got = Preferences.bradleyTerryScores(sym, "model_a", "model_b", "winner")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("bt_score")).toMap
    assert(got == Map("A" -> 1.0, "B" -> 1.0))
  }

  test("bradleyTerry: strength order follows the win record, mean ~1") {
    val got = Preferences.bradleyTerryScores(battles, "model_a", "model_b", "winner")
      .collect().map(r => (r.getString(0), r.getAs[Long]("n_battles"),
        r.getAs[Long]("n_wins"), r.getAs[Double]("bt_score")))
    val byModel = got.map(t => t._1 -> t).toMap
    assert(byModel("A")._2 == 5L && byModel("A")._3 == 3L)
    assert(byModel("C")._3 == 1L)
    // A has the best decided record (3-1); B is even (2-2); C the worst (1-4)
    assert(byModel("A")._4 > byModel("B")._4)
    assert(byModel("B")._4 > byModel("C")._4)
    assert(math.abs(got.map(_._4).sum / 3 - 1.0) < 0.05)
  }

  test("bradleyTerryScores: degenerate battle graphs stay finite") {
    // all-ties log: BT undefined, scores must be 0.0 — never NaN
    val ties = Seq(("m1", "m2", "tie"), ("m2", "m3", "tie"), ("m1", "m3", "tie"))
      .toDF("model_a", "model_b", "winner")
    val ts = Preferences.bradleyTerryScores(ties, "model_a", "model_b", "winner")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(ts.values.forall(v => !v.isNaN && v == 0.0), s"ties must score 0.0, got $ts")
    // perfect separation: the winner's score converges to a FINITE
    // value (mean-1 renormalisation pins the sum; no divergence)
    val sweep = Seq.fill(5)(("champ", "chump", "a")).toDF("model_a", "model_b", "winner")
    val ss = Preferences.bradleyTerryScores(sweep, "model_a", "model_b", "winner")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(ss("champ") == 2.0 && ss("chump") == 0.0, s"got $ss")
    assert(ss.values.forall(v => !v.isNaN && !v.isInfinite))
  }
}
