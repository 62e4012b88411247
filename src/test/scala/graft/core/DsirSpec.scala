package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.DsirKernels

class DsirSpec extends SparkTestBase {
  import spark.implicits._

  test("importanceWeights matches the hand-computed add-1 model") {
    // target "a b": grams {a, b, "a b"}; source doc1 "a b", doc2 "c c"
    // (grams {c, c, "c c"}). Union F = 5, Nt = 3, Ns = 6.
    val target = Seq("a b").toDF("text")
    val source = Seq((1L, "a b"), (2L, "c c")).toDF("doc_id", "text")
    val got = Dsir.importanceWeights(source, target, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // lr(a) = lr(b) = lr("a b") = ln((2/8) / (2/11)) = ln(11/8)
    val w1 = 3 * math.log(11.0 / 8)
    // lr(c) = ln((1/8) / (3/11)) ; lr("c c") = ln((1/8) / (2/11))
    val w2 = 2 * math.log(11.0 / 24) + math.log(11.0 / 16)
    assert(math.abs(got(1L) - w1) < 1e-9, s"got ${got(1L)} want $w1")
    assert(math.abs(got(2L) - w2) < 1e-9, s"got ${got(2L)} want $w2")
  }

  test("importanceWeights: empty and null text score 0; target-like > junk") {
    val target = Seq("spark query table", "spark table").toDF("text")
    val source = Seq(
      (1L, "spark query table"), (2L, "zz yy xx"),
      (3L, ""), (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Dsir.importanceWeights(source, target, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(3L) == 0.0 && got(4L) == 0.0)
    assert(got(1L) > got(2L), s"target-like ${got(1L)} !> junk ${got(2L)}")
  }

  test("hashed path equals the word-grain exact path under injectivity, alpha 0") {
    val target = Seq("spark scans the table", "the table is fast",
      "spark is fast").toDF("text")
    val source = Seq(
      (1L, "spark scans the table"), (2L, "the table is fast"),
      (3L, "spark is fast"), (4L, "spark scans the table is fast"),
      (5L, "")).toDF("doc_id", "text")
    // r19 kernel parity: NgramFeaturesExpr ≡ the HOF featuriser it
    // replaced (unigrams ++ adjacent bigrams, null-token bigrams null)
    locally {
      val toksed = source.withColumn("toks",
        graft.text.TextFunctions.normTokens(col("text")))
      val hofFeats = toksed.select(col("doc_id"), {
        val toks = col("toks")
        val bigrams = when(size(toks) < 2, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), size(toks) - 1),
            i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
        concat(toks, bigrams).as("f")
      }).collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val kernelFeats = toksed.select(col("doc_id"),
        Dsir.ngramFeaturesFromTokens(col("toks")).as("f"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(kernelFeats == hofFeats)
      val nullToks = spark.sql(
        "SELECT array('a', CAST(NULL AS STRING), 'b') AS toks")
      assert(nullToks.select(Dsir.ngramFeaturesFromTokens(col("toks")))
        .head().getSeq[String](0) == Seq("a", null, "b", null, null))
    }
    // every source gram must occur in target for alpha = 0 (shared
    // support); doc 4 splices two target sentences so its join bigrams
    // must also exist ("table is" occurs in target doc 2)
    val b = 1 << 20
    val vocab = source.select(explode(Dsir.ngramFeatures(col("text"))).as("g"))
      .union(target.select(explode(Dsir.ngramFeatures(col("text"))).as("g")))
      .distinct().as[String].collect()
    assert(vocab.map(DsirKernels.bucketOf(_, b)).distinct.length == vocab.length,
      "fixture vocabulary must hash injectively for the equality check")
    val exact = Dsir.importanceWeights(source, target, "text", "doc_id",
      alpha = 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val hashed = Dsir.importanceWeightsHashed(source, target, "text",
      numBuckets = b, alpha = 0.0)
      .select(col("doc_id"), col("log_weight"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (1L to 5L).foreach { id =>
      assert(math.abs(exact(id) - hashed(id)) < 1e-9,
        s"doc $id: exact ${exact(id)} vs hashed ${hashed(id)}")
    }
  }

  test("importanceWeightsHashed enforces the bucket bound loudly") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      Dsir.importanceWeightsHashed(df, df, "text", numBuckets = (1 << 22) + 1))
    assert(e.getMessage.contains("numBuckets"))
  }

  test("hashed ratio artifact round-trips and serves identical scores") {
    val target = Seq("spark scans tables").toDF("text")
    val source = Seq((1L, "spark scans tables"), (2L, "zz yy")).toDF("doc_id", "text")
    val ratios = Dsir.trainHashedRatios(source, target, "text", numBuckets = 1 << 12)
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir_art").toString
    Dsir.saveHashedRatios(spark, ratios, dir)
    val back = Dsir.loadHashedRatios(spark, dir)
    assert(back.sameElements(ratios))
    val a = Dsir.scoreWithRatios(source, "text", ratios)
      .select("doc_id", "log_weight").as[(Long, Double)].collect().toMap
    val b = Dsir.scoreWithRatios(source, "text", back)
      .select("doc_id", "log_weight").as[(Long, Double)].collect().toMap
    assert(a == b)
    // corrupted (non-contiguous) artifact refused loudly
    Seq((0, 0.5), (2, -0.5)).toDF("bucket", "log_ratio")
      .write.mode("overwrite").parquet(dir)
    val e = intercept[IllegalArgumentException](Dsir.loadHashedRatios(spark, dir))
    assert(e.getMessage.contains("contiguous"))
  }

  test("resampleByWeight matches an independent Gumbel top-k reference") {
    val rows = (0L until 200L).map(id => (id, (id % 7).toDouble - 3.0))
    val df = rows.toDF("id", "lw")
    val got = Dsir.resampleByWeight(df, "lw", 20, "id", "s9")
      .select("id").as[Long].collect().toSet
    val want = rows.map { case (id, lw) =>
      val u = (java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils
          .md5Hex("s9" + id).substring(0, 8), 16) + 1.0) / 4294967296.0
      (math.log(-math.log(u)) - lw, id)
    }.sortBy(identity).take(20).map(_._2).toSet
    assert(got == want)
  }

  test("resampleByWeight favours heavy log weights deterministically") {
    // +10 vs -10 log weight: the Gumbel perturbation (range ~[-3, 3]
    // at these uniforms) cannot bridge a 20-unit gap
    val df = (0L until 50L).map(id => (id, if (id < 10) 10.0 else -10.0))
      .toDF("id", "lw")
    val got = Dsir.resampleByWeight(df, "lw", 10, "id", "x")
      .select("id").as[Long].collect().toSet
    assert(got == (0L until 10L).toSet)
    // reproducible: same salt → same set
    val again = Dsir.resampleByWeight(df, "lw", 10, "id", "x")
      .select("id").as[Long].collect().toSet
    assert(again == got)
  }

  test("resampleByWeight plans a bounded top-k, not a global sort") {
    val df = (0L until 100L).map(id => (id, 0.0)).toDF("id", "lw")
    val plan = Dsir.resampleByWeight(df, "lw", 5, "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
