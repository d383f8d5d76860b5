package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Marketing-touch attribution over an event stream: for every
  * conversion event, which earlier touch event gets the credit. The
  * reference's event log (producer's click/view/signup/purchase
  * stream) answers "what drove this purchase" with exactly this
  * operator; it is also the session-stitching primitive behind ads
  * ROI dashboards.
  *
  * Two standard models in one pass: FIRST-touch (the touch that
  * opened the user's history) and LAST-touch (the most recent touch
  * strictly before the conversion). Both are window lookups over the
  * user's own timeline — `(ts, id)` ordered, so the order is total
  * and the result layout-independent — computed with
  * `first/last(ignoreNulls)` over a strictly-preceding ROWS frame.
  * Conversions with no preceding touch attribute to NULL (surface it
  * as 'none' downstream — deliberate, not silently dropped: unmatched
  * conversions are the metric that catches instrumentation gaps).
  *
  * 100 TB shape: ONE exchange, hash-partitioned on the user key; the
  * windows are user-partitioned sorts (bounded by one user's
  * history, never a global sort), and both models plus any
  * downstream per-channel aggregate reuse the same partitioning.
  * Event-time skew (one bot user with 10⁸ events) is the only
  * hazard; cap per-user history upstream if the log has one.
  */
object Attribution {

  /** Per-conversion attribution rows.
    *
    * @param touchTypes     event types that can carry credit
    * @param conversionType the event type being attributed
    * @return one row per conversion event: the conversion's id
    *         column, user, ts, `channel_first`, `channel_last`
    *         (NULL when no touch precedes), and the conversion's
    *         `value`
    */
  def attribute(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      idCol: Column,
      typeCol: Column,
      valueCol: Column,
      touchTypes: Seq[String],
      conversionType: String): DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    val touch = when(typeCol.isin(touchTypes: _*), typeCol)
    val w = Window.partitionBy(userCol).orderBy(tsCol, idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("channel_first", first(touch, ignoreNulls = true).over(w))
      .withColumn("channel_last", last(touch, ignoreNulls = true).over(w))
      .filter(typeCol === conversionType)
      .select(idCol.as("conversion_id"), userCol.as("user"),
        tsCol.as("ts"), col("channel_first"), col("channel_last"),
        valueCol.as("value"))
  }

  /** Markov-chain journey transition counts — the sufficient
    * statistic behind [[markovAttribution]], exposed separately so
    * tests (and incremental maintenance: counts are additive) can
    * pin it. A journey is one user's `(ts, id)`-ordered run of touch
    * events up to and including a conversion; the conversion closes
    * the journey and the next touch opens a fresh one from 'start'.
    * Emitted states: 'start' → first touch of each journey, touch →
    * touch for consecutive touches, touch/'start' → 'conv' at the
    * conversion, and last-touch → 'null' for the one trailing
    * journey that never converted (instrumented explicitly — the
    * non-converting mass is what the absorption model needs).
    *
    * 100 TB shape: ONE user-keyed exchange (both windows share the
    * user partitioning; the journey boundary reads `lag` of the
    * running conversion count instead of re-partitioning by
    * `(user, journey)`), then a k²-row aggregate.
    */
  def markovTransitions(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      idCol: Column,
      typeCol: Column,
      touchTypes: Seq[String],
      conversionType: String): DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(!touchTypes.contains(conversionType),
      "conversionType cannot also be a touch type")
    val w = Window.partitionBy(col("u")).orderBy(col("us"), col("id"))
    val rel = events
      .filter(typeCol.isin((touchTypes :+ conversionType): _*) &&
        userCol.isNotNull && tsCol.isNotNull)
      .select(userCol.as("u"), unix_micros(tsCol).as("us"),
        idCol.as("id"), typeCol.as("t"))
      // journey = conversions strictly before this row; lag(j) ≠ j
      // marks a journey boundary without a second partitioning
      .withColumn("j", coalesce(
        sum(when(col("t") === conversionType, 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("pj", lag(col("j"), 1).over(w))
      .withColumn("pt", lag(col("t"), 1).over(w))
      .withColumn("nt", lead(col("t"), 1).over(w))
    val src = when(col("pj").isNull || col("pj") =!= col("j"),
      lit("start")).otherwise(col("pt"))
    val dst = when(col("t") === conversionType, lit("conv"))
      .otherwise(col("t"))
    rel
      .select(explode(array_compact(array(
        struct(src.as("src"), dst.as("dst")),
        when(col("nt").isNull && col("t") =!= conversionType,
          struct(col("t").as("src"), lit("null").as("dst")))))).as("e"))
      .groupBy(col("e.src").as("src"), col("e.dst").as("dst"))
      .agg(count(lit(1)).as("n"))
  }

  /** Removal-effect (Markov-chain) attribution: each channel's credit
    * is how much the corpus-wide conversion probability DROPS when
    * that channel's touches stop converting anyone — the
    * data-driven model that, unlike first/last-touch, pays assist
    * channels. P(conversion) is the absorption probability of the
    * journey chain from 'start'; removing channel c redirects every
    * transition INTO c to the non-converting sink (denominators
    * unchanged, c contributes zero mass onward).
    *
    * Numerics are the pageRankInt discipline: ranks live as
    * 10⁻⁹-scale longs and every iteration step is one exact integer
    * floor division per state — `v'ᵢ = (Σⱼ nᵢⱼ·vⱼ + nᵢ,conv·10⁹) ÷
    * totᵢ` — so the `iters`-step truncated fixpoint is bit-identical
    * on any engine, any layout (a float solve's summation order
    * could never promise that). The map is monotone and bounded, so
    * v ascends to the fixpoint and removal effects are provably ≥ 0
    * even under truncation. Convergence is geometric in the
    * touch→touch mass; the default 60 steps puts the residual well
    * below 10⁻⁴ relative on event streams whose touch-chain
    * continuation probability is ≤ 0.85 — and the truncation itself
    * is part of the operator's definition, not an error term.
    *
    * 100 TB shape: the bulk work is [[markovTransitions]] (one
    * user-keyed exchange + a k²-row aggregate); the solve touches
    * only the collected (k+1)×(k+3) count matrix — driver state is
    * O(k²), never O(rows) — and runs once per channel plus once for
    * the full chain. Emits one row per touch channel:
    * `removal_effect_e9` (ΔP in 10⁻⁹ units) and `share_ppm`
    * (normalized credit, parts-per-million, exact floor division).
    */
  def markovAttribution(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      idCol: Column,
      typeCol: Column,
      touchTypes: Seq[String],
      conversionType: String,
      iters: Int = 60): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = events.sparkSession
    val cntRows = markovTransitions(events, userCol, tsCol, idCol,
      typeCol, touchTypes, conversionType).collect()
    val cnt: Map[(String, String), Long] = cntRows
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val states = "start" +: touchTypes
    val tot: Map[String, Long] = states.map { s =>
      s -> cnt.collect { case ((i, _), n) if i == s => n }.sum
    }.toMap
    val Scale = BigInt(1000000000L)

    def solve(removed: Option[String]): BigInt = {
      var v: Map[String, BigInt] = states.map(_ -> BigInt(0)).toMap
      for (_ <- 1 to iters) {
        v = states.map { i =>
          val t = tot(i)
          i -> (if (t == 0L) BigInt(0)
          else {
            val cont = states.iterator
              .filterNot(removed.contains)
              .map(jj => BigInt(cnt.getOrElse((i, jj), 0L)) * v(jj))
              .sum
            val absorb = BigInt(cnt.getOrElse((i, "conv"), 0L)) * Scale
            (cont + absorb) / BigInt(t)
          })
        }.toMap
      }
      v("start")
    }

    val full = solve(None)
    val effects = touchTypes.map(c => c -> (full - solve(Some(c))))
    val sumE = effects.map(_._2).sum
    val out = effects.map { case (c, e) =>
      val share = if (sumE == 0) BigInt(0) else e * BigInt(1000000L) / sumE
      (c, e.toLong, share.toLong)
    }
    import spark.implicits._
    out.toDF("channel", "removal_effect_e9", "share_ppm")
  }
}
