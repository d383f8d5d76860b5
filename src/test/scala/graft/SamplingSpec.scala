package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** The rate samplers are certified end-to-end by their oracle queries
  * (q_sample_hash / q_sample_stratified / q_kfold / …); this spec
  * covers the weighted sampler's properties that the single oracle
  * parameterization cannot: the clamp guarantee, expectation
  * tracking, and layout independence.
  */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private val rows = (0 until 2000).map { i =>
    (i.toLong, 1L + (i % 10))
  }
  private lazy val df = rows.toDF("id", "w")

  test("weightedSample keeps clamped heavy rows ALWAYS") {
    // one row carries half the total weight: k*w/W >= 1 for k >= 2
    val heavy = ((0 until 100).map(i => (i.toLong, 1L)) :+ (999L, 100L))
      .toDF("id", "w")
    (2L to 16L by 7).foreach { k =>
      val kept = Sampling.weightedSample(heavy,
          col("id"), col("w"), expectedK = k)
        .select("id").as[Long].collect().toSet
      assert(kept.contains(999L), s"clamped heavy row lost at k=$k")
    }
  }

  test("weightedSample tracks the expected size and is layout-stable") {
    val k = 200L
    val kept = Sampling.weightedSample(df, col("id"), col("w"), k)
      .select("id").as[Long].collect().toSet
    // E[|S|] = k when nothing clamps (here max k*w/W = 200*10/11000 < 1);
    // |S| ~ Poisson-binomial, sd ~ sqrt(k) — 5 sigma envelope
    assert(math.abs(kept.size - k) < 5 * math.sqrt(k.toDouble),
      s"sample size ${kept.size} too far from expectation $k")
    val again = Sampling.weightedSample(df.repartition(13),
        col("id"), col("w"), k)
      .select("id").as[Long].collect().toSet
    assert(again == kept, "weighted sample depends on layout")
    // the kept set must skew toward heavy weights: mean kept weight
    // strictly above the population mean
    val meanKept = rows.filter(r => kept.contains(r._1)).map(_._2).sum
      .toDouble / kept.size
    val meanAll = rows.map(_._2).sum.toDouble / rows.size
    assert(meanKept > meanAll,
      f"no weight skew: kept mean $meanKept%.2f vs pop $meanAll%.2f")
  }

  test("weightedSample drops zero-weight rows and nulls pin to top band") {
    val mixed = Seq((1L, 0L), (2L, 5L), (3L, 0L))
      .toDF("id", "w")
    val kept = Sampling.weightedSample(mixed, col("id"), col("w"), 1L)
      .select("id").as[Long].collect().toSet
    assert(!kept.contains(1L) && !kept.contains(3L),
      "zero-weight row sampled")
    // null key keeps only where probability clamps to 1
    val nk = Seq((Option.empty[String], 10L), (Some("a"), 10L))
      .toDF("key", "w")
    val keptNull = Sampling.weightedSample(nk, col("key"), col("w"), 2L)
      .count()
    assert(keptNull == 2L, "p=1 rows must survive regardless of key")
  }

  test("popularityNegatives: inverse-CDF draws match a replay; " +
    "collisions filtered; layout-independent") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val pos = Seq((1L, 10L), (1L, 20L), (2L, 10L)).toDF("u", "i")
    val w = Seq((10L, 5L), (20L, 3L), (30L, 2L)).toDF("item", "w")
    val got = Sampling.popularityNegatives(
        pos, col("u"), col("i"), w, col("item"), col("w"), k = 4)
      .as[(Long, Long, Int, Long)].collect().toSet
    // independent Scala replay of the documented draw rule
    val items = Array(10L, 20L, 30L)
    val starts = Array(0L, 5L, 8L); val total = 10L
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = (for {
      (u, p) <- Seq((1L, 10L), (1L, 20L), (2L, 10L)); j <- 0 until 4
    } yield {
      val hex = md.digest(s"neg:$u:$p:$j".getBytes("UTF-8"))
        .take(6).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex, 16) % total
      val idx = starts.lastIndexWhere(_ <= h)
      (u, p, j, items(idx))
    }).filterNot { case (u, _, _, n) =>
      Seq((1L, 10L), (1L, 20L), (2L, 10L)).contains((u, n))
    }.toSet
    assert(got == expect && expect.nonEmpty)
    // layout-independence: same result from a repartitioned input
    val got2 = Sampling.popularityNegatives(
        pos.repartition(7), col("u"), col("i"),
        w, col("item"), col("w"), k = 4)
      .as[(Long, Long, Int, Long)].collect().toSet
    assert(got2 == got)
    // every surviving draw is a catalog item and never a positive
    assert(got.forall { case (u, _, _, n) =>
      items.contains(n) && !Seq((1L, 10L), (1L, 20L), (2L, 10L))
        .contains((u, n)) })
  }
}
