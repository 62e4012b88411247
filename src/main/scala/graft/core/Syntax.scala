package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Ergonomic syntax mirroring the reference's decorator surface.
  *
  *  - `to_spark_col` (reference helpers/pyspark.py:163-216) lifts string
  *    arguments to Columns; in Scala that's an implicit conversion the
  *    caller opts into with `import graft.core.syntax._`.
  *  - `transform` chaining (helpers/pyspark.py:246-248) exists natively
  *    as `Dataset.transform`; `pipe` is a n-ary convenience over it.
  *  - `find_spark_dataframes` (helpers/pyspark.py:595-644) scans a
  *    scope map for DataFrames / maps of DataFrames.
  */
object syntax {

  /** String → Column lift (reference `_convert_to_spark_col`). Strings
    * that are not valid column references still fail at analysis, like
    * the reference's ValueError on non-string input. */
  implicit def stringToCol(s: String): Column = col(s)

  implicit class RichDataFrame(private val df: DataFrame) extends AnyVal {
    /** Fold several transformations left-to-right (chained
      * `Dataset.transform`). */
    def pipe(fs: (DataFrame => DataFrame)*): DataFrame =
      fs.foldLeft(df)((d, f) => d.transform(f))
  }

  /** Collect DataFrames (and DataFrames inside nested maps) from a
    * scope map — the Scala analogue of scanning `locals()`. */
  def findSparkDataFrames(scope: Map[String, Any]): Map[String, DataFrame] =
    scope.flatMap {
      case (k, df: DataFrame) => Seq(k -> df)
      case (k, m: Map[_, _]) =>
        m.collect { case (kk, df: DataFrame) => s"$k.$kk" -> df }
      case _ => Nil
    }
}
