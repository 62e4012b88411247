package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern substring automaton for blocklist-style
  * keyword curation over a 100 TB corpus (the reference's pipelines
  * filter documents on word lists; C4/Gopher-style curation does the
  * same with thousands of entries).
  *
  * One pass over the text finds EVERY pattern — O(|text| + matches)
  * regardless of how many patterns the list holds — where the naive
  * higher-order-function form (`filter(patterns, p -> contains(text,
  * p)))`) rescans the document once per pattern, O(|text| × P). At a
  * 10^4-entry blocklist over 100 TB that difference is the job.
  *
  * The automaton is built ONCE driver-side (pattern lists are
  * blocklist-cardinality, never corpus data), serialised into the task
  * binary by `addReferenceObj`, and invoked from generated code as a
  * plain JVM call — the scan stays inside whole-stage codegen exactly
  * like the hash kernels in [[HashKernels]].
  *
  * Match semantics are plain substring containment (no word
  * boundaries), byte-for-byte what `contains(lower(text), pattern)`
  * computes when `caseInsensitive` — so every operator built on it is
  * exactly oracle-checkable. Case folding is `Character.toLowerCase`
  * per char, which agrees with SQL `lower()` on ASCII and the BMP.
  */
final class AhoCorasick(rawPatterns: Array[String], val caseInsensitive: Boolean)
    extends Serializable {

  require(rawPatterns.nonEmpty, "AhoCorasick: empty pattern list")
  require(rawPatterns.forall(p => p != null && p.nonEmpty),
    "AhoCorasick: null/empty pattern")

  /** Distinct patterns in lexicographic order — match output indexes
    * into this, so reported matches are already sorted. */
  val patterns: Array[String] = rawPatterns.distinct.sorted

  // trie: per-node char→node transitions, fail links, and the pattern
  // indices terminating at (or reachable by fail links from) each node
  private val gotoMaps = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
  private val failLink = mutable.ArrayBuffer(0)
  private val outputs = mutable.ArrayBuffer[List[Int]](Nil)

  private def fold(c: Char): Char =
    if (caseInsensitive) Character.toLowerCase(c) else c

  patterns.zipWithIndex.foreach { case (p, idx) =>
    var node = 0
    p.foreach { ch =>
      val c = fold(ch)
      node = gotoMaps(node).getOrElseUpdate(c, {
        gotoMaps += mutable.Map.empty[Char, Int]
        failLink += 0
        outputs += Nil
        gotoMaps.length - 1
      })
    }
    outputs(node) = idx :: outputs(node)
  }

  // BFS fail links; outputs inherit the fail target's outputs so a
  // match of "slow scan" also reports the nested "scan"
  locally {
    val queue = mutable.Queue.empty[Int]
    gotoMaps(0).valuesIterator.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val v = queue.dequeue()
      gotoMaps(v).foreach { case (c, u) =>
        var f = failLink(v)
        while (f != 0 && !gotoMaps(f).contains(c)) f = failLink(f)
        failLink(u) = if (gotoMaps(f).contains(c) && gotoMaps(f)(c) != u)
          gotoMaps(f)(c) else 0
        outputs(u) = outputs(u) ++ outputs(failLink(u))
        queue.enqueue(u)
      }
    }
  }

  // frozen arrays for the match loop (the mutable builders above only
  // run at construction, driver-side)
  private val gotoArr: Array[Map[Char, Int]] = gotoMaps.map(_.toMap).toArray
  private val failArr: Array[Int] = failLink.toArray
  private val outArr: Array[Array[Int]] = outputs.map(_.toArray).toArray
  private val patUtf8: Array[UTF8String] =
    patterns.map(UTF8String.fromString)

  private def step(state: Int, c: Char): Int = {
    var s = state
    while (s != 0 && !gotoArr(s).contains(c)) s = failArr(s)
    gotoArr(s).getOrElse(c, 0)
  }

  /** Distinct patterns occurring in `text`, lexicographically sorted
    * (indices into the sorted `patterns` array are emitted in order). */
  def findDistinct(text: UTF8String): ArrayData = {
    val s = text.toString
    val hit = new Array[Boolean](patterns.length)
    var nHits = 0
    var state = 0
    var i = 0
    val n = s.length
    while (i < n && nHits < patterns.length) {
      state = step(state, fold(s.charAt(i)))
      val out = outArr(state)
      var j = 0
      while (j < out.length) {
        if (!hit(out(j))) { hit(out(j)) = true; nHits += 1 }
        j += 1
      }
      i += 1
    }
    val res = new Array[AnyRef](nHits)
    var k = 0
    var p = 0
    while (p < patterns.length) {
      if (hit(p)) { res(k) = patUtf8(p); k += 1 }
      p += 1
    }
    new GenericArrayData(res)
  }

  /** Replace every leftmost-longest non-overlapping pattern occurrence
    * with `replacement` — dictionary masking (badword masking, term
    * normalisation) in the same one-pass scan. Semantics are EXACTLY
    * those of a regex alternation ordered longest-first under
    * leftmost-first matching (`(p1|p2|…)` with the branches sorted by
    * length descending): at each position take the longest match
    * starting there, then resume after its end — which is what makes
    * the operator oracle-checkable against `regexp_replace`. Patterns
    * are LITERAL strings (never interpreted as regex). */
  def maskAll(text: UTF8String, replacement: String): UTF8String = {
    val s = text.toString
    val n = s.length
    if (n == 0) return text
    // best(start) = longest pattern length matching at start
    val best = new Array[Int](n)
    var state = 0
    var i = 0
    while (i < n) {
      state = step(state, fold(s.charAt(i)))
      val out = outArr(state)
      var j = 0
      while (j < out.length) {
        val len = patterns(out(j)).length
        val st = i - len + 1
        if (len > best(st)) best(st) = len
        j += 1
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(n)
    i = 0
    while (i < n) {
      if (best(i) > 0) { sb.append(replacement); i += best(i) }
      else { sb.append(s.charAt(i)); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }

  /** True iff ANY pattern occurs — early-exits on the first hit, the
    * fast path for blocklist filtering. */
  def containsAny(text: UTF8String): Boolean = {
    val s = text.toString
    var state = 0
    var i = 0
    val n = s.length
    while (i < n) {
      state = step(state, fold(s.charAt(i)))
      if (outArr(state).nonEmpty) return true
      i += 1
    }
    false
  }
}

/** string → array&lt;string&gt; of the distinct patterns found in the
  * text, sorted (see [[AhoCorasick.findDistinct]]). */
case class KeywordMatchesExpr(
    child: Expression,
    patterns: Seq[String],
    caseInsensitive: Boolean)
    extends UnaryExpression {

  @transient private lazy val ac =
    new AhoCorasick(patterns.toArray, caseInsensitive)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "keyword_matches"

  override def nullSafeEval(input: Any): Any =
    ac.findDistinct(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ahoCorasick", ac, classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.findDistinct($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): KeywordMatchesExpr =
    copy(child = newChild)
}

/** string → string with every leftmost-longest pattern occurrence
  * replaced (see [[AhoCorasick.maskAll]]). */
case class KeywordMaskExpr(
    child: Expression,
    patterns: Seq[String],
    caseInsensitive: Boolean,
    replacement: String)
    extends UnaryExpression {

  @transient private lazy val ac =
    new AhoCorasick(patterns.toArray, caseInsensitive)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "keyword_mask"

  override def nullSafeEval(input: Any): Any =
    ac.maskAll(input.asInstanceOf[UTF8String], replacement)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ahoCorasick", ac, classOf[AhoCorasick].getName)
    val repRef = ctx.addReferenceObj("maskReplacement", replacement, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"$acRef.maskAll($c, $repRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): KeywordMaskExpr =
    copy(child = newChild)
}

/** string → boolean: does ANY pattern occur in the text (early-exit —
  * see [[AhoCorasick.containsAny]]). */
case class KeywordContainsExpr(
    child: Expression,
    patterns: Seq[String],
    caseInsensitive: Boolean)
    extends UnaryExpression {

  @transient private lazy val ac =
    new AhoCorasick(patterns.toArray, caseInsensitive)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.sql}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "keyword_contains"

  override def nullSafeEval(input: Any): Any =
    ac.containsAny(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ahoCorasick", ac, classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.containsAny($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): KeywordContainsExpr =
    copy(child = newChild)
}
