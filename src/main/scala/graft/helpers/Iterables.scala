package graft.helpers

/** Driver-side collection utilities.
  *
  * Reference: rdsa_utils/helpers/python.py:24-576 — iterable coercion,
  * set/flatten/interleave/pairwise helpers and dict-product expansion
  * used to build parameter grids and compose configs. Scala-first these
  * are thin, typed wrappers; they exist so pipeline code written against
  * the reference surface has direct equivalents.
  */
object Iterables {

  /** python.py:34-43 tuple_convert / list_convert: lift a scalar into a
    * collection, pass collections through, None → empty. Strings count
    * as scalars (the reference's always_iterable base_type rule). */
  def listConvert(obj: Any): List[Any] = obj match {
    case null       => Nil
    case s: String  => List(s)
    case l: List[_] => l
    case i: Iterable[_] => i.toList
    case other      => List(other)
  }

  /** python.py:44-111 extend_lists: append `additions` to `base`,
    * skipping entries already present (order-preserving). */
  def extendList[A](base: List[A], additions: Seq[A]): List[A] =
    base ++ additions.filterNot(base.contains)

  /** python.py:215-248 calc_product_of_dict_values: cartesian product
    * over the value lists of a map → one map per combination. */
  def productOfMapValues(m: Map[String, Seq[Any]]): Seq[Map[String, Any]] = {
    val keys = m.keys.toSeq
    keys.map(m).foldLeft(Seq(Seq.empty[Any])) { (acc, vs) =>
      for (a <- acc; v <- vs) yield a :+ v
    }.map(combo => keys.zip(combo).toMap)
  }

  /** python.py:351-383 setdiff: elements of a not in b, de-duplicated,
    * original order NOT guaranteed by the reference (set-based) — here
    * first-seen order for determinism. */
  def setdiff[A](a: Iterable[A], b: Iterable[A]): List[A] = {
    val bs = b.toSet
    a.toList.distinct.filterNot(bs)
  }

  /** python.py:384-439 flatten_iterable: one level of flattening,
    * scalars pass through. */
  def flatten(xs: Iterable[Any]): List[Any] = xs.toList.flatMap {
    case s: String      => List(s)
    case i: Iterable[_] => i.toList
    case other          => List(other)
  }

  /** python.py:484-538 interleave_iterables: a1 b1 a2 b2 …; requires
    * equal lengths like the reference. */
  def interleave[A](xs: Seq[A], ys: Seq[A]): List[A] = {
    require(xs.length == ys.length,
      s"interleave: lengths differ (${xs.length} vs ${ys.length})")
    xs.zip(ys).flatMap { case (a, b) => Seq(a, b) }.toList
  }

  /** python.py:539-576 pairwise_iterable: sliding pairs (a,b) (b,c) … */
  def pairwise[A](xs: Iterable[A]): List[(A, A)] =
    xs.toList.sliding(2).collect { case List(a, b) => (a, b) }.toList

  /** python.py:440-483 convert_types_iterable, generic form: map every
    * element through `convert` (the Scala rendering of passing a target
    * `dtype` callable — any A => B works, exactly as the reference
    * accepts `ord` alongside `float`/`str`/`int`). */
  def convertTypes[A, B](xs: Iterable[A])(convert: A => B): List[B] =
    xs.toList.map(convert)

  /** [[convertTypes]] with the reference's default dtype (`float`):
    * numerics and numeric strings → Double. */
  def toDoubles(xs: Iterable[Any]): List[Double] = convertTypes(xs) {
    case n: Number => n.doubleValue()
    case s: String => s.toDouble
    case other => throw new IllegalArgumentException(s"not numeric: $other")
  }

  /** convert_types_iterable(dtype=str) analogue. */
  def toStrings(xs: Iterable[Any]): List[String] =
    convertTypes(xs)(String.valueOf)

  /** convert_types_iterable(dtype=int) analogue: numerics truncate,
    * integer strings parse. */
  def toLongs(xs: Iterable[Any]): List[Long] = convertTypes(xs) {
    case n: Number => n.longValue()
    case s: String => s.trim.toLong
    case other => throw new IllegalArgumentException(s"not integral: $other")
  }

  /** python.py:1082-1160 validate_env_vars: all present and non-empty
    * or an error listing the missing ones. */
  def validateEnvVars(
      required: Seq[String],
      env: Map[String, String] = sys.env): Unit = {
    val missing = required.filter(v => env.get(v).forall(_.isEmpty))
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"Missing required environment variables: ${missing.mkString(", ")}")
  }
}
