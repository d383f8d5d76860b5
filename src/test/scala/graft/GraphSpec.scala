package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("integer PageRank on a hand-checked star graph") {
    // star: 1..4 all point to 0; 0 points back to 1 — node 0 must
    // dominate, spokes 2..4 (no inbound except none) sit at base
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L))
      .toDF("src", "dst")
    val got = Graph.pageRankInt(edges, col("src"), col("dst"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 5)
    val base = 15000000000L / (100L * 5)
    assert(got(2L) == base && got(3L) == base && got(4L) == base)
    assert(got(0L) > got(1L) && got(1L) > got(2L),
      s"hub/spoke ordering violated: $got")
  }

  test("ranks are layout-independent and sum to ~1 (floor leakage only)") {
    val edges = (0 until 400).map(i =>
      (i.toLong % 37, (i * 7 + 3).toLong % 37)).toDF("src", "dst")
    val a = Graph.pageRankInt(edges, col("src"), col("dst"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.pageRankInt(edges.repartition(11), col("src"),
        col("dst"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "integer PageRank depends on layout")
    val mass = a.values.sum
    // every div floors at most one 1e-9 unit per node per term
    assert(mass <= 1000000000L && mass > 990000000L,
      s"rank mass out of envelope: $mass")
  }

  test("zero iterations returns the uniform initialization") {
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val got = Graph.pageRankInt(edges, col("src"), col("dst"), 0)
      .collect().map(_.getLong(1)).toSet
    assert(got == Set(500000000L))
  }

  test("connectedComponents labels every node with its component min") {
    // two chains + a triangle with a self-loop and reversed/dup edges
    val edges = Seq(
      (5L, 3L), (3L, 9L),            // component {3,5,9} min 3
      (10L, 11L),                    // component {10,11} min 10
      (20L, 21L), (21L, 22L), (22L, 20L), // triangle min 20
      (22L, 22L),                    // self-loop: no connectivity
      (9L, 5L)                       // reversed duplicate
    ).toDF("src", "dst")
    val got = Graph.connectedComponents(edges, col("src"), col("dst"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      3L -> 3L, 5L -> 3L, 9L -> 3L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
    // layout independence
    val re = Graph.connectedComponents(
      edges.repartition(7), col("src"), col("dst"))
      .as[(Long, Long)].collect().toMap
    assert(re == got)
  }
}
