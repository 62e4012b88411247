package graft.helpers

import org.scalatest.funsuite.AnyFunSuite

class IterablesSpec extends AnyFunSuite {

  test("listConvert lifts scalars including strings, passes collections") {
    assert(Iterables.listConvert("x") == List("x"))
    assert(Iterables.listConvert(7) == List(7))
    assert(Iterables.listConvert(List(1, 2)) == List(1, 2))
    assert(Iterables.listConvert(null) == Nil)
  }

  test("extendList appends without duplicating existing entries") {
    assert(Iterables.extendList(List("a", "b"), Seq("b", "c")) == List("a", "b", "c"))
  }

  test("productOfMapValues builds the cartesian grid") {
    val grid = Iterables.productOfMapValues(
      Map("a" -> Seq(1, 2), "b" -> Seq("x", "y")))
    assert(grid.size == 4)
    assert(grid.toSet.contains(Map("a" -> 1, "b" -> "y")))
    assert(Iterables.productOfMapValues(Map.empty) == Seq(Map.empty))
  }

  test("setdiff keeps first-seen order, drops b members") {
    assert(Iterables.setdiff(Seq(3, 1, 2, 1), Seq(2)) == List(3, 1))
  }

  test("flatten goes one level, strings stay intact") {
    assert(Iterables.flatten(Seq(Seq(1, 2), 3, "ab")) == List(1, 2, 3, "ab"))
  }

  test("interleave alternates equal-length sequences, rejects ragged") {
    assert(Iterables.interleave(Seq(1, 3), Seq(2, 4)) == List(1, 2, 3, 4))
    assertThrows[IllegalArgumentException](Iterables.interleave(Seq(1), Seq(1, 2)))
  }

  test("pairwise sliding pairs") {
    assert(Iterables.pairwise(Seq(1, 2, 3)) == List((1, 2), (2, 3)))
    assert(Iterables.pairwise(Seq(1)) == Nil)
  }

  test("convertTypes maps through any target conversion (reference doctests)") {
    // convert_types_iterable([1, 2, 3]) -> [1.0, 2.0, 3.0]
    assert(Iterables.toDoubles(Seq(1, 2, 3)) == List(1.0, 2.0, 3.0))
    // convert_types_iterable((10, 20, 30), dtype=str) -> ['10', '20', '30']
    assert(Iterables.toStrings(Seq(10, 20, 30)) == List("10", "20", "30"))
    // convert_types_iterable(['10', '20', '30'], dtype=int) -> [10, 20, 30]
    assert(Iterables.toLongs(Seq("10", "20", "30")) == List(10L, 20L, 30L))
    // convert_types_iterable({'a','b','c'}, dtype=ord) -> [97, 98, 99]
    assert(Iterables.convertTypes(Seq('a', 'b', 'c'))(_.toInt) == List(97, 98, 99))
  }

  test("toDoubles converts numbers and numeric strings") {
    assert(Iterables.toDoubles(Seq(1, "2.5", 3L)) == List(1.0, 2.5, 3.0))
    assertThrows[IllegalArgumentException](Iterables.toDoubles(Seq(Map.empty)))
  }

  test("validateEnvVars lists all missing variables") {
    Iterables.validateEnvVars(Seq("A"), Map("A" -> "set"))
    val e = intercept[IllegalStateException](
      Iterables.validateEnvVars(Seq("A", "B"), Map("A" -> "")))
    assert(e.getMessage.contains("A") && e.getMessage.contains("B"))
  }
}
