package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed build keys — the standard remedy when a
  * handful of hot keys concentrate a material fraction of the probe
  * side and one shuffle partition becomes the straggler.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin`, pinned on in
  * [[graft.GraftSession]]) already handles MOST skew at runtime by
  * splitting oversized partitions, but it only applies to sort-merge /
  * shuffled-hash joins and only after materializing map outputs. The
  * explicit salt is the deterministic, planner-independent form: it
  * works under any join strategy, guarantees the fan-out up front, and
  * is the shape to reach for when a pipeline's skew is KNOWN (a null
  * bucket, a celebrity user, a default category).
  *
  * Mechanics: the big (probe) side gets a salt in `[0, salts)` derived
  * by hashing `saltSource` (pick a high-cardinality column — a row id —
  * so hot join keys spread evenly); the small (build) side is
  * replicated `salts` times via an exploded literal sequence. The join
  * key becomes (`keys`, salt), so each hot key's rows land on `salts`
  * different reducers instead of one. Build-side cost is |R|·salts —
  * keep `salts` modest (8–64) and the build side the smaller input.
  *
  * Correctness is layout-independent: the salt is content-derived
  * (xxhash64, same on any cluster), and every big-side row meets every
  * matching small-side row exactly once (the replica with its salt).
  * Inner-join semantics; null join keys drop on both sides as usual.
  */
object SkewJoin {

  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salts: Int,
      saltSource: Column): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(!(big.columns ++ small.columns).contains("_salt"),
      "column name _salt is reserved by saltedJoin")
    val probe = big.withColumn("_salt", pmod(xxhash64(saltSource), lit(salts)))
    val build = small.withColumn(
      "_salt", explode(sequence(lit(0L), lit(salts - 1L))))
    probe.join(build, keys :+ "_salt").drop("_salt")
  }
}
