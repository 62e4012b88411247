package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Re-identification-risk operators for released training data:
  * k-anonymity (every quasi-identifier combination is shared by >= k
  * rows) and l-diversity (each combination sees >= l distinct
  * sensitive values) — the published privacy models a dataset release
  * review checks before text corpora with structured sidecars ship.
  *
  * Scale shape: everything is ONE hash aggregation at
  * quasi-identifier-combination grain (the same shuffle a groupBy
  * count pays), and the suppression pass is a broadcast-free window
  * count over the same partitioning — no driver collects, no
  * quadratic paths, AQE-skew-safe.
  */
object Privacy {

  /** Per-combination equivalence-class profile: the quasi columns,
    * class size `k`, and distinct sensitive values `l` (when
    * `sensitiveCol` is given). One aggregation. */
  def anonymityClasses(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: Option[String] = None): DataFrame = {
    require(quasiCols.nonEmpty, "anonymityClasses: need quasi columns")
    val base = df.groupBy(quasiCols.map(col): _*)
    sensitiveCol match {
      case Some(s) => base.agg(count(lit(1)).as("k"),
        count_distinct(col(s)).as("l"))
      case None => base.agg(count(lit(1)).as("k"))
    }
  }

  /** The one-row release report: dataset k (smallest class), number
    * of classes, number of violating classes and rows under
    * `minK`, and the row fraction that would need suppression. */
  def kAnonymityReport(
      df: DataFrame,
      quasiCols: Seq[String],
      minK: Long): DataFrame =
    anonymityClasses(df, quasiCols).agg(
      min(col("k")).as("dataset_k"),
      count(lit(1)).as("n_classes"),
      sum(when(col("k") < minK, 1L).otherwise(0L)).as("violating_classes"),
      sum(when(col("k") < minK, col("k")).otherwise(0L)).as("violating_rows"),
      round(sum(when(col("k") < minK, col("k")).otherwise(0L)).cast("double") /
        sum(col("k")).cast("double"), 6).as("suppression_frac"))

  /** Suppress (drop) every row whose quasi-identifier combination has
    * fewer than `minK` members — the minimal transformation making
    * the release k-anonymous at `minK`. A window COUNT over the
    * quasi partitioning (no second scan, no join); rows keep their
    * original columns. */
  def suppressSmallClasses(
      df: DataFrame,
      quasiCols: Seq[String],
      minK: Long): DataFrame = {
    require(quasiCols.nonEmpty, "suppressSmallClasses: need quasi columns")
    val w = Window.partitionBy(quasiCols.map(col): _*)
    df.withColumn("__graft_k", count(lit(1)).over(w))
      .where(col("__graft_k") >= minK)
      .drop("__graft_k")
  }

  /** Replace identifier columns with keyed SHA-256 pseudonyms
    * (lowercase hex of `sha256(secret || ':' || value)`): joins and
    * group-bys across releases still line up (same secret → same
    * pseudonym) while raw identifiers never leave the cluster;
    * rotating the secret unlinks past releases. Null values stay
    * null. A narrow codegen'd projection — no shuffle, fuses with
    * the scan.
    *
    * This is keyed pseudonymisation, NOT anonymisation: re-linkage
    * remains possible for anyone holding the secret, and k-anonymity
    * of the remaining quasi-identifiers still applies (pair with
    * [[suppressSmallClasses]]). */
  def pseudonymize(
      df: DataFrame,
      cols: Seq[String],
      secret: String): DataFrame = {
    require(cols.nonEmpty, "pseudonymize: need at least one column")
    require(secret.nonEmpty, "pseudonymize: secret must be non-empty")
    cols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c,
        when(col(c).isNull, lit(null).cast("string"))
          .otherwise(sha2(concat(lit(secret), lit(":"),
            col(c).cast("string")), 256)))
    }
  }

  /** Keep only rows violating l-diversity: classes whose sensitive
    * column shows fewer than `minL` distinct values (including every
    * k < minL class, which cannot be l-diverse) — the worklist a
    * generalisation pass consumes. Aggregate + broadcast-friendly
    * semi join on the class key. */
  def lDiversityViolations(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      minL: Long): DataFrame = {
    val bad = anonymityClasses(df, quasiCols, Some(sensitiveCol))
      .where(col("l") < minL)
      .select(quasiCols.map(g => col(g).as(s"__graft_q_$g")): _*)
    // NULL-SAFE semi join: a null quasi value forms a class like any
    // other (anonymityClasses groups it), so an equality join would
    // silently exempt null-keyed classes from the violation worklist
    val cond = quasiCols.map(g => col(g) <=> col(s"__graft_q_$g")).reduce(_ && _)
    df.join(bad, cond, "left_semi")
  }
}
