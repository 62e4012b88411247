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
      Seq("hash_jaccard", "minhash_signature", "ngram_hashes", "simhash64"))
    new GraftExtensions() // constructible for spark.sql.extensions
  }
}
