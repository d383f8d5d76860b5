package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Operator-level scaling harness for [[graft.ops.Graph]] — measures
  * triangleCounts on a synthetic COMMUNITY graph that replicates
  * linearly with the scale knob, isolating the operator from the
  * co-purchase fixture (whose synth replication multiplies supports
  * and densifies super-linearly; PLANS_r11 §2).
  *
  * Graph: `c` communities of `S` = 30 nodes; within community k the
  * undirected edge (i, j), i < j, exists iff (i·7 + j·13 + i·j) % 3
  * == 0 — a fixed ~1/3-dense pattern, so edges, degrees and triangle
  * counts all scale EXACTLY linearly in `c` and the expected plan
  * work is m^1.5-free by the degree-ordered orientation (every
  * out-neighborhood ≤ S).
  *
  * Usage: runMain graft.tools.GraphScale <communities> [runs]
  * Prints one JSON line {"communities":c,"edges":m,"triangles":t,
  * "sec":median}.
  */
object GraphScale {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GraphScale <communities> [runs]")
    val c = args(0).toLong
    val runs = if (args.length > 1) args(1).toInt else 3
    val S = 30
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession =
      GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val pairs = for {
      i <- 0 until S; j <- (i + 1) until S
      if (i * 7 + j * 13 + i * j) % 3 == 0
    } yield (i, j)
    val edges = spark.range(c)
      .select(col("id").as("k"),
        explode(typedlit(pairs)).as("e"))
      .select((col("k") * S + col("e._1")).as("src"),
        (col("k") * S + col("e._2")).as("dst"))
      .repartition(32)
      .persist()
    val m = edges.count() // materialize the input OUTSIDE the timing

    var tri = 0L
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      val out = graft.ops.Graph
        .triangleCounts(edges, col("src"), col("dst"))
        .agg(sum(col("n_triangles")).cast("long")).as[Long]
      tri = out.head() / 3 // each triangle counted at 3 nodes
      (System.nanoTime() - t0) / 1e9
    }.sorted
    val med = times((runs - 1) / 2)
    println(s"""{"communities":$c,"edges":$m,"triangles":$tri,""" +
      s""""sec":${"%.3f".format(med)}}""")
    spark.stop()
  }
}
