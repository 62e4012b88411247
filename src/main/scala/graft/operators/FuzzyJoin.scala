package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy join: pair rows whose string keys are within a
  * Levenshtein edit distance, without the cartesian product a naive
  * fuzzy match implies.
  *
  * Blocking turns the O(|L|·|R|) comparison into an EQUI-join Spark
  * can hash-partition: candidates must share a `blockPrefixLen`-char
  * prefix, and the sound length-band filter (two strings further than
  * `maxDistance` apart in length cannot be within `maxDistance`
  * edits) prunes before the quadratic-cost `levenshtein` evaluates.
  * At 100 TB the shuffle is on the prefix key — low-cardinality
  * prefixes skew, so compose with
  * [[graft.core.DataFrameOps.saltedJoin]] when a prefix dominates.
  *
  * CONTRACT: prefix blocking is a recall trade — pairs that differ
  * inside the first `blockPrefixLen` chars are not candidates (the
  * standard record-linkage compromise). `blockPrefixLen = 0` disables
  * blocking and degrades to the exact-but-cartesian match; it is
  * guarded behind an explicit opt-in flag.
  */
object FuzzyJoin {

  /** Inner-join `left` and `right` on edit distance over
    * `leftCol`/`rightCol`. Output: left columns + right columns +
    * `distance`. Column names must not collide (rename first). */
  def fuzzyJoin(
      left: DataFrame,
      right: DataFrame,
      leftCol: String,
      rightCol: String,
      maxDistance: Int,
      blockPrefixLen: Int = 1,
      allowCartesian: Boolean = false): DataFrame = {
    require(maxDistance >= 0, s"fuzzyJoin: maxDistance must be >= 0, got $maxDistance")
    require(blockPrefixLen >= 0, s"fuzzyJoin: blockPrefixLen must be >= 0, got $blockPrefixLen")
    require(blockPrefixLen > 0 || allowCartesian,
      "fuzzyJoin: blockPrefixLen = 0 is a cartesian comparison; pass allowCartesian = true to opt in")
    val lengthBand =
      abs(length(left(leftCol)) - length(right(rightCol))) <= maxDistance
    val close = levenshtein(left(leftCol), right(rightCol)) <= maxDistance
    val joined =
      if (blockPrefixLen == 0)
        left.crossJoin(right).filter(lengthBand && close)
      else
        left.join(right,
          substring(left(leftCol), 1, blockPrefixLen) ===
            substring(right(rightCol), 1, blockPrefixLen) &&
            lengthBand && close)
    joined.withColumn("distance",
      levenshtein(left(leftCol), right(rightCol)).cast("long"))
  }
}
