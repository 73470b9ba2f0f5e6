package graft

import graft.pipeline.Graph

/** Unit checks for the join-iterated graph operators on hand-computable
  * graphs — the driver's q136/q139 oracle rows cover corpus scale. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("triangleCounts: K4 gives every node 3 triangles") {
    // all 6 edges of the complete graph on {1,2,3,4}, deliberately fed as a
    // mix of directions plus duplicates — canonicalization must absorb both
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (3L, 2L),
      (2L, 4L), (4L, 3L), (1L, 2L)).toDF("src", "dst")
    val got = Graph.triangleCounts(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: two triangles sharing an edge, pendant node absent") {
    // triangles (1,2,3) and (2,3,4) share edge (2,3); node 5 is pendant
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 4L),
      (1L, 5L)).toDF("src", "dst")
    val got = Graph.triangleCounts(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
    assert(!got.contains(5L), "triangle-free nodes emit no row")
  }

  test("triangleCounts: self-loops and triangle-free graphs count nothing") {
    val edges = Seq((1L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Graph.triangleCounts(edges, "src", "dst").count() == 0)
  }

  test("triangleCounts: degree orientation agrees with naive a<b<c enumeration") {
    // pseudo-random graph (deterministic LCG), checked against an exact
    // naive count — the orientation-invariance claim the q139 oracle uses
    var seed = 12345L
    def next(): Long = { seed = (seed * 1103515245L + 12345L) % 2147483648L; seed }
    val es = (1 to 300).map(_ => ((next() % 30).toInt, (next() % 30).toInt))
    val edges = es.map { case (a, b) => (a.toLong, b.toLong) }.toDF("src", "dst")
    val canon = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct.toSet
    val nodes = canon.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val naive = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      a <- nodes; b <- nodes if a < b && canon((a, b))
      c <- nodes if b < c && canon((b, c)) && canon((a, c))
    } Seq(a, b, c).foreach(n => naive(n.toLong) += 1L)
    val got = Graph.triangleCounts(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == naive.toMap)
  }
}
