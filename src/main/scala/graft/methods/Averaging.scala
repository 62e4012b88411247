package graft.methods

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.Windows

/** Index-number building blocks (ONS price statistics).
  * Reference: rdsa_utils/methods/averaging_methods.py:11-36.
  *
  * All Column-returning so they compose with `groupBy(...).agg(...)` or
  * window specs; pure Catalyst expressions, codegen-friendly.
  */
object Averaging {

  /** Σ(value·weight); weights assumed pre-normalised to shares. */
  def weightedArithmeticAverage(value: Column, weight: Column): Column =
    sum(value * weight)

  /** exp(Σ(ln(value)·weight)). */
  def weightedGeometricAverage(value: Column, weight: Column): Column =
    exp(sum(log(value) * weight))

  /** Plain mean. */
  def unweightedArithmeticAverage(value: Column): Column = avg(value)

  /** exp(mean(ln value)). */
  def unweightedGeometricAverage(value: Column): Column = exp(avg(log(value)))

  /** weight ÷ window-sum(weight) per group — turns raw weights into
    * shares. Reference: averaging_methods.py:31-36. */
  def getWeightShares(weight: Column, levels: Seq[String]): Column =
    weight / sum(weight).over(Windows.getWindowSpec(partitionCols = levels))
}
