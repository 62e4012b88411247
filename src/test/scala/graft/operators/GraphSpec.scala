package graft.operators

import graft.SparkTestBase

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  // two components {1,2,3,4} (path + chord) and {10, 11}; 20-20 self-loop
  private def edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (1L, 3L),
    (11L, 10L), (20L, 20L)).toDF("a", "b")

  test("connectedComponents labels by component minimum (both paths)") {
    for (localMax <- Seq(1000000L, 0L)) { // driver shortcut AND distributed
      val got = Graph.connectedComponents(edges, "a", "b", localMaxEdges = localMax)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        10L -> 10L, 11L -> 10L), s"localMaxEdges=$localMax")
    }
  }

  test("componentSizes: histogram largest-first") {
    val got = Graph.componentSizes(edges, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 4L), (10L, 2L)))
  }

  test("degrees: undirected, parallel edges once, self-loops ignored") {
    val withDup = edges.union(Seq((1L, 2L), (3L, 2L)).toDF("a", "b"))
    val got = Graph.degrees(withDup, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L,
      10L -> 1L, 11L -> 1L))
  }

  test("non-integral id columns fail loudly instead of nulling edges") {
    val strEdges = Seq(("u1", "u2"), ("u2", "u3")).toDF("a", "b")
    val dblEdges = Seq((1.5, 2.0)).toDF("a", "b")
    for (bad <- Seq(strEdges, dblEdges)) {
      assertThrows[IllegalArgumentException](
        Graph.connectedComponents(bad, "a", "b"))
      assertThrows[IllegalArgumentException](Graph.degrees(bad, "a", "b"))
      assertThrows[IllegalArgumentException](
        Graph.componentSizes(bad, "a", "b"))
    }
    // int ids remain fine (widening cast is lossless)
    val intEdges = Seq((1, 2), (2, 3)).toDF("a", "b")
    assert(Graph.connectedComponents(intEdges, "a", "b").count() == 3)
  }
}
