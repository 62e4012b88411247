package graft.functions

import graft.SparkTestBase

class GraftExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("registered SQL functions match the Column API results") {
    GraftFunctions.register(spark)
    val sqlRow = spark.sql(
      """SELECT minhash_signature(array(xxhash64('a'), xxhash64('b')), 4) AS sig,
        |       simhash64(array(xxhash64('a'), xxhash64('b'))) AS sim,
        |       ngram_hashes('abcd', 3) AS grams,
        |       hash_jaccard(array(1L, 2L), array(2L, 3L)) AS j""".stripMargin).head()
    val colRow = Seq("x").toDF("t").select(
      HashFunctions.minHashSignatureNative(
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.xxhash64(org.apache.spark.sql.functions.lit("a")),
          org.apache.spark.sql.functions.xxhash64(org.apache.spark.sql.functions.lit("b"))), 4)
        .as("sig")).head()
    assert(sqlRow.getSeq[Long](0) == colRow.getSeq[Long](0))
    assert(sqlRow.getSeq[Long](2).length == 2) // abc, bcd
    assert(math.abs(sqlRow.getDouble(3) - 1.0 / 3.0) < 1e-12)
    val cos = spark.sql(
      "SELECT cosine_sim(array(1.0D, 2.0D, 3.0D), array(3.0D, 2.0D, 1.0D)) AS c").head()
    assert(math.abs(cos.getDouble(0) - 10.0 / 14.0) < 1e-12)
    val hp = spark.sql(
      "SELECT hyperplane_bucket(array(1.0D, 0.0D), 2, 8, 0) AS b").head()
    assert(hp.getLong(0) >= 0 && hp.getLong(0) < 256)
    val bb = spark.sql(
      "SELECT band_buckets(array(1L, 2L, 3L, 4L), 2, 2) AS b").head()
    val bbCol = Seq(Seq(1L, 2L, 3L, 4L)).toDF("sig")
      .select(HashFunctions.bandBucketsNative($"sig", 2, 2).as("b")).head()
    assert(bb.getSeq[Long](0) == bbCol.getSeq[Long](0))
    val jwRow = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA') AS jw, jaro('MARTHA', 'MARHTA') AS j").head()
    assert(math.abs(jwRow.getDouble(0) - 0.9611111111111111) < 1e-12)
    assert(math.abs(jwRow.getDouble(1) - 0.9444444444444445) < 1e-12)
    val th = spark.sql(
      """SELECT token_hashes(array('a', 'b', 'a')) AS th,
        |       shingle_hashes(array('a', 'b', 'c'), 2) AS sh""".stripMargin).head()
    val thCol = spark.sql(
      "SELECT array(xxhash64('a'), xxhash64('b'), xxhash64('a')) AS th").head()
    assert(th.getSeq[Long](0) == thCol.getSeq[Long](0)) // order + repeats kept
    assert(th.getSeq[Long](1).length == 2) // "a b", "b c"
    val s128 = spark.sql(
      "SELECT simhash128(array(xxhash64('a'), xxhash64('b'))) AS s").head()
    val s128Col = Seq("x").toDF("t").select(
      HashFunctions.simHash128Native(
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.xxhash64(org.apache.spark.sql.functions.lit("a")),
          org.apache.spark.sql.functions.xxhash64(org.apache.spark.sql.functions.lit("b"))))
        .as("s")).head()
    assert(s128.getSeq[Long](0) == s128Col.getSeq[Long](0))
    assert(s128.getSeq[Long](0).length == 2)
    // word 0 IS the 64-bit simhash (the 128-bit fingerprint extends, not replaces)
    assert(s128.getSeq[Long](0).head == sqlRow.getLong(1))
  }

  test("registration is idempotent and validates arity") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark) // no throw
    val e = intercept[Exception](
      spark.sql("SELECT simhash64(array(1L), 2)").collect())
    assert(e.getMessage.toLowerCase.contains("simhash64"))
  }

  test("GraftExtensions class builds the same descriptors") {
    // the injectFunction route is exercised structurally: same builders
    assert(GraftFunctions.descriptors.map(_._1).sorted ==
      Seq("band_buckets", "cosine_sim", "hash_jaccard", "hyperplane_bucket",
        "jaro", "jaro_winkler", "minhash_signature", "ngram_hashes",
        "shingle_hashes", "simhash128", "simhash64", "token_hashes"))
    new GraftExtensions() // constructible for spark.sql.extensions
  }
}
