package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.RandomProjectExpr

/** Johnson–Lindenstrauss random projection for embedding columns —
  * the dimensionality cut run BEFORE brute-force or ANN search when
  * the raw dimension makes distance evaluation the bottleneck
  * (JL lemma: pairwise distances survive projection to
  * O(log n / ε²) dims within 1±ε, independent of the source
  * dimension — public result).
  *
  * The gaussian matrix is DETERMINISTIC: entry (k, i) comes from
  * Box–Muller over two md5-derived uniforms of the literal string
  * `"seed:k:i:1|2"` — the library's engine-portable randomness rule
  * (the weighted-sampling md5 draw), so the same seed reproduces the
  * same projection in any engine and the oracle can replay the full
  * matrix in SQL. Matrix size is outDim·inDim doubles (16×64 = 8 KB)
  * — an artifact that rides the task binary, never a join side.
  *
  * Scale shape: ONE narrow codegen'd pass over the vector column
  * ([[graft.functions.ProjKernels]]), no shuffle; downstream top-k
  * machinery (Similarity/Ivf/Pq) runs unchanged on the projected
  * column at outDim/inDim of the flop and byte cost.
  */
object Projection {

  /** The md5 uniform in (0, 1]: (first-8-hex-chars + 1) / 2³² —
    * byte-identical to the DuckDB replay
    * `(('0x' || substr(md5(s),1,8))::BIGINT + 1.0) / 4294967296.0`. */
  private[similarity] def md5Uniform(s: String): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.take(4).map(b => f"${b & 0xff}%02x").mkString
    (java.lang.Long.parseLong(hex, 16) + 1.0) / 4294967296.0
  }

  /** Gaussian entry (k, i) under `seed`: Box–Muller
    * √(−2 ln u₁) · cos(2π u₂). */
  private[similarity] def gaussian(seed: String, k: Int, i: Int): Double = {
    val u1 = md5Uniform(s"$seed:$k:$i:1")
    val u2 = md5Uniform(s"$seed:$k:$i:2")
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  /** Row-major flattened projection matrix, pre-scaled by 1/√outDim
    * (so projected inner products estimate source inner products). */
  def projectionMatrix(seed: String, outDim: Int, inDim: Int): Array[Double] = {
    require(outDim > 0 && inDim > 0,
      s"projectionMatrix: dims must be positive, got outDim=$outDim inDim=$inDim")
    require(outDim.toLong * inDim <= 16000000L,
      s"projectionMatrix: $outDim x $inDim exceeds the 16M-entry artifact " +
        "bound — a projection matrix rides the task binary, not the cluster")
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val r = new Array[Double](outDim * inDim)
    var k = 0
    while (k < outDim) {
      var i = 0
      while (i < inDim) {
        r(k * inDim + i) = gaussian(seed, k, i) * scale
        i += 1
      }
      k += 1
    }
    r
  }

  /** Add `outCol` = the outDim-dimensional projection of `vecCol`
    * (array&lt;float&gt; or array&lt;double&gt;, inDim entries). */
  def randomProject(
      df: DataFrame,
      vecCol: String,
      outCol: String,
      inDim: Int,
      outDim: Int,
      seed: String): DataFrame = {
    val r = projectionMatrix(seed, outDim, inDim)
    df.withColumn(outCol,
      ColumnBridge(RandomProjectExpr(ColumnBridge.expression(col(vecCol)), r, inDim)))
  }
}
