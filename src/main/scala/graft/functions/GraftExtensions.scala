package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the native kernels.
  *
  * Session-extension route (spark.sql.extensions=
  * graft.functions.GraftExtensions) injects the functions at session
  * build; [[GraftFunctions.register]] adds them to an already-running
  * session. Either way `spark.sql("SELECT minhash_signature(...)")`
  * plans the same codegen'd expressions the Column API uses.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, info, builder) triples shared by both registration routes. */
  val descriptors: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("minhash_signature",
      new ExpressionInfo(classOf[MinHashSignatureExpr].getName, "minhash_signature"),
      { args =>
        require(args.size == 2, "minhash_signature(hashes, numHashes)")
        MinHashSignatureExpr(args.head, intArg(args(1), "numHashes"))
      }),
    ("simhash64",
      new ExpressionInfo(classOf[SimHashExpr].getName, "simhash64"),
      { args =>
        require(args.size == 1, "simhash64(tokenHashes)")
        SimHashExpr(args.head)
      }),
    ("simhash128",
      new ExpressionInfo(classOf[SimHash128Expr].getName, "simhash128"),
      { args =>
        require(args.size == 1, "simhash128(tokenHashes)")
        SimHash128Expr(args.head)
      }),
    ("ngram_hashes",
      new ExpressionInfo(classOf[NgramHashesExpr].getName, "ngram_hashes"),
      { args =>
        require(args.size == 2, "ngram_hashes(text, n)")
        NgramHashesExpr(args.head, intArg(args(1), "n"))
      }),
    ("shingle_hashes",
      new ExpressionInfo(classOf[ShingleHashesExpr].getName, "shingle_hashes"),
      { args =>
        require(args.size == 2, "shingle_hashes(tokens, k)")
        ShingleHashesExpr(args.head, intArg(args(1), "k"))
      }),
    ("token_hashes",
      new ExpressionInfo(classOf[TokenHashesExpr].getName, "token_hashes"),
      { args =>
        require(args.size == 1, "token_hashes(tokens)")
        TokenHashesExpr(args.head)
      }),
    ("hash_jaccard",
      new ExpressionInfo(classOf[HashJaccardExpr].getName, "hash_jaccard"),
      { args =>
        require(args.size == 2, "hash_jaccard(a, b)")
        HashJaccardExpr(args.head, args(1))
      }),
    ("cosine_sim",
      new ExpressionInfo(classOf[CosineSimExpr].getName, "cosine_sim"),
      { args =>
        require(args.size == 2, "cosine_sim(a, b)")
        CosineSimExpr(args.head, args(1))
      }),
    ("band_buckets",
      new ExpressionInfo(classOf[BandBucketsExpr].getName, "band_buckets"),
      { args =>
        require(args.size == 3, "band_buckets(signature, bands, rows)")
        BandBucketsExpr(args.head, intArg(args(1), "bands"), intArg(args(2), "rows"))
      }),
    ("hyperplane_bucket",
      new ExpressionInfo(classOf[HyperplaneBucketExpr].getName, "hyperplane_bucket"),
      { args =>
        require(args.size == 4, "hyperplane_bucket(vec, dim, numPlanes, seed)")
        HyperplaneBucketExpr(args.head, intArg(args(1), "dim"),
          intArg(args(2), "numPlanes"), intArg(args(3), "seed"))
      }),
    ("jaro_winkler",
      new ExpressionInfo(classOf[JaroWinklerExpr].getName, "jaro_winkler"),
      { args =>
        require(args.size == 2, "jaro_winkler(a, b)")
        JaroWinklerExpr(args.head, args(1))
      }),
    ("jaro",
      new ExpressionInfo(classOf[JaroExpr].getName, "jaro"),
      { args =>
        require(args.size == 2, "jaro(a, b)")
        JaroExpr(args.head, args(1))
      }),
  )

  /** Register the functions on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info, builder)
    }
}
