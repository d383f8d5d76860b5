package graft

import org.apache.spark.sql.functions._
import graft.ops.Packing

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  // one bucket → the fold order is plain doc_id order, so expected
  // window indices can be written by hand
  private def pack1(rows: Seq[(Long, String)], capacity: Long) =
    Packing.packSequences(
      rows.toDF("doc_id", "text"), "doc_id", "text",
      capacity = capacity, buckets = 1)
      .select("doc_id", "n_tokens", "win_idx")
      .as[(Long, Long, Long)].collect().sortBy(_._1)

  test("greedy fill: window rolls exactly when the next doc would overflow") {
    // token counts 3,3,3 at capacity 7 → [0,0,1]: 3+3=6 fits, +3 would be 9
    val got = pack1(Seq(
      (1L, "a b c"), (2L, "d e f"), (3L, "g h i")), capacity = 7)
    assert(got.map(r => r._1 -> r._3).toSeq ==
      Seq(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("exact fit does not roll; the next token after a full window does") {
    // 4+3=7 == capacity exactly → same window; next doc rolls
    val got = pack1(Seq(
      (1L, "a b c d"), (2L, "e f g"), (3L, "h")), capacity = 7)
    assert(got.map(_._3).toSeq == Seq(0L, 0L, 1L))
  }

  test("an oversize document occupies a window alone") {
    val got = pack1(Seq(
      (1L, "a b"),                       // win 0
      (2L, "c d e f g h i j"),           // 8 tokens > 5 → rolls to win 1, alone
      (3L, "k")), capacity = 5)          // fill 8 > 5 → rolls to win 2
    assert(got.map(_._3).toSeq == Seq(0L, 1L, 2L))
  }

  test("a leading oversize document stays in window 0") {
    val got = pack1(Seq(
      (1L, "a b c d e f"), (2L, "g")), capacity = 3)
    assert(got.map(_._3).toSeq == Seq(0L, 1L))
  }

  test("a zero-token doc at the head does not shield an oversize follower") {
    // the oracle's recursive step rolls on fill + n > capacity even at
    // fill 0 — only the seed row is exempt; empty text packs at width 0
    val got = pack1(Seq(
      (1L, ""), (2L, "a b c d e f g h"), (3L, "x")), capacity = 5)
    assert(got.map(r => (r._2, r._3)).toSeq ==
      Seq((0L, 0L), (8L, 1L), (1L, 2L)))
  }

  test("buckets partition by doc_id mod and pack independently") {
    val rows = (0L until 20L).map(i => (i, ("t " * 10).trim))
    val got = Packing.packSequences(
      rows.toDF("doc_id", "text"), "doc_id", "text",
      capacity = 25, buckets = 4)
      .select("doc_id", "bucket", "win_idx")
      .as[(Long, Long, Long)].collect()
    assert(got.forall { case (id, b, _) => b == id % 4 })
    // 5 docs × 10 tokens per bucket at capacity 25 → windows of 2 docs:
    // per-bucket win sequence is [0,0,1,1,2] in doc_id order
    got.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.sortBy(_._1).map(_._3).toSeq == Seq(0L, 0L, 1L, 1L, 2L))
    }
  }

  test("every document is assigned exactly once (exhaustive, exclusive)") {
    val docs = Tables.documents(spark, sfDir)
    val packed = Packing.packSequences(docs, "doc_id", "text")
    assert(packed.count() == docs.count())
    assert(packed.select("doc_id").distinct().count() == docs.count())
  }

  test("packedWindows fill never exceeds capacity except single-doc windows") {
    val docs = Tables.documents(spark, sfDir)
    val bad = Packing.packedWindows(docs, "doc_id", "text", capacity = 256L)
      .filter(col("fill_tokens") > 256 && col("n_docs") > 1)
    assert(bad.count() == 0,
      "multi-doc windows must fit the token budget")
  }

  test("PackWindows invariants hold on randomized count sequences") {
    // pure-JVM property pass over the native fold: windows are a
    // contiguous monotone partition, multi-doc windows respect the
    // capacity, and zero/oversize counts follow the oracle's seed rule
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(20260812)
    (1 to 200).foreach { _ =>
      val cap = 1L + rnd.nextInt(40)
      val counts = Array.fill(rnd.nextInt(60)) {
        val r = rnd.nextInt(10)
        if (r == 0) 0L else if (r == 9) cap + 1 + rnd.nextInt(20) else 1L + rnd.nextInt(12)
      }
      val wins = graft.functions.PackWindows.eval(
        new GenericArrayData(counts), cap)
      assert(wins.length == counts.length)
      if (wins.nonEmpty) assert(wins.head == 0L)
      wins.sliding(2).foreach { case Array(a, b) =>
        assert(b == a || b == a + 1, s"window ids must be contiguous: $a -> $b")
      case _ => ()
      }
      counts.indices.groupBy(wins(_)).foreach { case (w, idxs) =>
        val fill = idxs.map(counts(_)).sum
        if (idxs.size > 1)
          assert(fill <= cap,
            s"multi-doc window $w overfilled: $fill > $cap " +
              s"(counts ${counts.mkString(",")})")
      }
      // reference fold: only the first element is exempt from rolling
      var win = 0L; var fill = 0L
      counts.zipWithIndex.foreach { case (c, i) =>
        if (i > 0 && fill + c > cap) { win += 1; fill = c } else fill += c
        assert(wins(i) == win)
      }
    }
  }

  test("PackWindows expression matches a reference Scala fold on the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val perBucket = Packing.packSequences(docs, "doc_id", "text")
      .select("bucket", "doc_id", "n_tokens", "win_idx")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    perBucket.foreach { case (_, rs) =>
      var win = 0L; var fill = 0L; var first = true
      rs.sortBy(_._2).foreach { case (_, _, n, gotWin) =>
        if (!first && fill + n > 256) { win += 1; fill = n }
        else fill += n
        first = false
        assert(gotWin == win)
      }
    }
  }
}
