package graft.analytics

import graft.SparkSpec

class TriangleSpec extends SparkSpec {
  import spark.implicits._

  private def counts(edges: Seq[(String, String)]): Map[String, Long] =
    GraphOps.triangleCounts(edges.toDF("src", "dst"))
      .as[(String, Long)].collect().toMap

  test("K4: every vertex sits in C(3,2)=3 triangles") {
    val k4 = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c",
      "b" -> "d", "c" -> "d")
    assert(counts(k4) == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
  }

  test("chains and stars have no triangles") {
    assert(counts(Seq("a" -> "b", "b" -> "c", "c" -> "d")).isEmpty)
    assert(counts(Seq("hub" -> "x", "hub" -> "y", "hub" -> "z")).isEmpty)
  }

  test("orientation, duplicates, and self-loops don't change the counts") {
    val messy = Seq("a" -> "b", "b" -> "a", "c" -> "a", "b" -> "c",
      "b" -> "c", "a" -> "a")
    assert(counts(messy) == Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("triangle + pendant edge: only the triangle's corners count") {
    val g = Seq("a" -> "b", "b" -> "c", "a" -> "c", "c" -> "d")
    assert(counts(g) == Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("wedges enumerate from the oriented adjacency only (hub-safe plan)") {
    // a hub of degree n generates ZERO wedges when oriented low→high:
    // all its edges point INTO it. The counts being right on the star
    // (above) pins the semantics; this pins the mechanism on a bigger hub.
    val star = (1 to 50).map(i => ("hub", s"leaf$i"))
    val tri = Seq("leaf1" -> "leaf2", "hub" -> "x")
    val c = counts(star ++ tri ++ Seq("leaf2" -> "hub"))
    // hub-leaf1-leaf2 IS a triangle via the closing leaf1-leaf2 edge
    assert(c("hub") == 1L && c("leaf1") == 1L && c("leaf2") == 1L)
  }
}
