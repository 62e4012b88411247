package graft.core

import graft.SparkTestBase

class CalibrationSpec extends SparkTestBase {
  import spark.implicits._

  // two populated bins: scores ~0.25 (1/4 positive) and ~0.95 (all positive)
  private def df = Seq(
    (0.20, 0), (0.25, 0), (0.25, 0), (0.30, 1),
    (0.90, 1), (0.95, 1), (1.00, 1)).toDF("score", "label")

  test("reliabilityBins: bin edges, clamping, top-bin convention") {
    val bins = Calibration.reliabilityBins(df, "score", "label", nBins = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(bins.length == 3)
    assert(bins(0) == ((2L, 3L, 0.233333, 0.0)))   // 0.20, 0.25, 0.25
    assert(bins(1) == ((3L, 1L, 0.3, 1.0)))
    // 1.0 joins bin 9, not a phantom bin 10
    assert(bins(2) == ((9L, 3L, 0.95, 1.0)))
  }

  test("scores outside [0,1] clamp instead of making rogue bins") {
    val b = Calibration.reliabilityBins(
      Seq((-0.5, 0), (1.7, 1)).toDF("score", "label"), "score", "label", 4)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(b.toSeq == Seq((0L, 0.0), (3L, 1.0)))
  }

  test("expectedCalibrationError: weighted bin gaps + max gap") {
    val r = Calibration.expectedCalibrationError(df, "score", "label", 10).head()
    assert(r.getAs[Long]("n_rows") == 7L)
    // gaps: |0.233333-0| = 0.233333 (n=3), |0.3-1| = 0.7 (n=1), |0.95-1| = 0.05 (n=3)
    val expected = (3 * 0.233333 + 1 * 0.7 + 3 * 0.05) / 7
    assert(math.abs(r.getAs[Double]("ece") - expected) < 1e-6)
    assert(r.getAs[Double]("max_bin_gap") == 0.7)
  }

  test("perfectly calibrated frame scores ~0") {
    val perfect = Seq((0.0, 0), (0.0, 0), (1.0, 1), (1.0, 1)).toDF("score", "label")
    assert(Calibration.expectedCalibrationError(perfect, "score", "label", 2)
      .head().getAs[Double]("ece") == 0.0)
  }
}
