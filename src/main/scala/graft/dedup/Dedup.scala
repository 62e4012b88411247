package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.text.TextFunctions

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design: every variant avoids the O(n²) all-pairs comparison —
  * exact dedup is a hash-partitioned window; MinHash/SimHash reduce the
  * candidate space with banding so the only wide exchange is a shuffle
  * on (band, bucket) keys, and the expensive verification only runs on
  * candidate pairs. Signatures are computed with higher-order Catalyst
  * expressions (xxhash64-based), no UDFs, so signature generation is a
  * single narrow pass over the corpus.
  */
object Dedup {

  /** Exact dedup on normalised text: keep the lowest-id row per
    * fingerprint. One shuffle on the (md5) fingerprint.
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = TextFunctions.fingerprint(col(textCol))
    val w = Window.partitionBy("fingerprint").orderBy(col(idCol))
    df.withColumn("fingerprint", fp)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Token k-shingles of a text column (k consecutive tokens re-joined
    * with a single space), distinct. Pure HOF expression; documents
    * shorter than k tokens yield their full token join. */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = TextFunctions.tokens(text)
    array_distinct(
      filter(
        transform(sequence(lit(1), greatest(size(toks) - (k - 1), lit(1))),
          i => concat_ws(" ", slice(toks, i, lit(k)))),
        s => length(s) > 0))
  }

  /** MinHash signature: for each of `numHashes` seeds, the minimum
    * xxhash64(seed, shingle) over the shingle set. Computed entirely in
    * one expression — narrow, no shuffle. */
  def minHashSignature(shingleArr: Column, numHashes: Int = 64): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(shingleArr, s => xxhash64(seed, s))))

  /** MinHash-LSH near-duplicate pairs.
    *
    * Pipeline: shingle → signature (narrow) → explode into `bands`
    * buckets (hash of each signature band) → shuffle once on
    * (band, bucket) → emit same-bucket id pairs → distinct → verify
    * with exact Jaccard over shingle sets. With b bands of r rows the
    * effective candidate threshold is ≈ (1/b)^(1/r).
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    */
  def minHashNearDuplicates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      threshold: Double = 0.7): DataFrame = {
    val rows = numHashes / bands
    val base = df
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("shingles", shingles(col("text"), shingleSize))
      .filter(size(col("shingles")) > 0)
      .withColumn("sig", minHashSignature(col("shingles"), numHashes))

    val banded = base
      .select(col("id"), col("shingles"),
        posexplode(
          transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(concat_ws(",",
              transform(slice(col("sig"), b * rows + 1, lit(rows)), _.cast("string")))))
        ).as(Seq("band", "bucket")))

    val candidates = banded.as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") &&
          col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.shingles").as("sh_a"), col("r.shingles").as("sh_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash of a text column: per-token xxhash64, each bit votes
    * ±1, fingerprint bit = sign of the vote sum. Single aggregate HOF
    * expression — narrow. Shift amounts are data-dependent, so the
    * bitwise ops go through `call_function` (still Catalyst, no UDF).
    */
  def simHash(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    val bitIdx = sequence(lit(0), lit(63))
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) =>
        zip_with(acc, bitIdx, (a, i) =>
          a + when(call_function("shiftright", xxhash64(t), i)
                     .bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)))
    aggregate(
      zip_with(votes, bitIdx, (v, i) =>
        when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L),
      (acc, b) => acc.bitwiseOR(b))
  }

  /** SimHash near-duplicate pairs: band the 64-bit fingerprint into four
    * 16-bit chunks (any pair within Hamming distance 3 shares ≥1 equal
    * chunk), bucket-join on chunks, verify with bit_count(XOR).
    */
  def simHashNearDuplicates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val base = df
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sim", simHash(col("text")))
    val banded = base.select(col("id"), col("sim"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", col("sim"), b * 16)
          .bitwiseAND(lit(0xFFFFL)))).as(Seq("band", "chunk")))
    banded.as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") &&
          col("l.chunk") === col("r.chunk") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.sim").as("sim_a"), col("r.sim").as("sim_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= lit(maxHamming))
      .select("id_a", "id_b", "hamming")
  }

  /** Distinct character n-grams of a string, as an array column. */
  def charNgrams(text: Column, n: Int = 3): Column =
    array_distinct(
      filter(
        transform(sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
          i => text.substr(i, lit(n))),
        s => length(s) === n))

  /** Character n-gram Jaccard similarity between two string columns. */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column = {
    val ga = charNgrams(a, n)
    val gb = charNgrams(b, n)
    size(array_intersect(ga, gb)).cast("double") /
      size(array_union(ga, gb)).cast("double")
  }

  /** n-gram-Jaccard near-duplicate pairs with geometric length blocking:
    * Jaccard ≥ t forces the normalised lengths within ratio ~t, so each
    * doc lands in log-scale band floor(ln len / ln(1/t)) and qualifying
    * pairs sit in the same or adjacent band — no all-pairs join.
    */
  def ngramJaccardNearDuplicates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val base = df
      .select(col(idCol).as("id"),
        TextFunctions.normalizeText(col(textCol)).as("norm"))
      .withColumn("len", greatest(length(col("norm")), lit(1)))
      .withColumn("block",
        floor(log(col("len").cast("double")) / math.log(1.0 / threshold)))
    val banded = base.select(col("id"), col("norm"),
      explode(array(col("block"), col("block") + 1)).as("b"))
    banded.as("l")
      .join(banded.as("r"),
        col("l.b") === col("r.b") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.norm").as("norm_a"), col("r.norm").as("norm_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        ngramJaccard(col("norm_a"), col("norm_b"), n).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
