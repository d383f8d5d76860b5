package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponentially-weighted moving average per key — the smoothing
  * primitive behind latency dashboards, anomaly baselines and
  * forecast seeds: `s₁ = x₁`, `sₜ = α·xₜ + (1−α)·sₜ₋₁`.
  *
  * EWMA is a RECURRENCE, which no window frame expresses — but it is
  * a sequential left-fold over the key's history in time order, and
  * both engines can run exactly that fold: here
  * `aggregate(array_sort(collect_list(struct(ts, tie, x))), …)`, in
  * the oracle `list_reduce(list(… ORDER BY ts, tie), …)`. Because
  * BOTH sides execute the identical addition/multiplication chain in
  * the identical order, the result is bit-identical cross-engine —
  * the same sequential-fold discipline as
  * [[graft.similarity.Knn.dot]] — even though floating-point EWMA is
  * order-sensitive by nature.
  *
  * 100 TB shape: one key-partitioned exchange (the collect_list
  * aggregate, map-side combinable); state is one key's history,
  * which is the irreducible minimum for a sequential recurrence —
  * bounded by the same per-key-history envelope as every window
  * operator here. For unbounded histories, checkpoint the smoothed
  * value per key and fold only the increment (the recurrence
  * composes: EWMA(history ++ batch) = fold(batch) seeded with
  * EWMA(history)).
  *
  * `alpha` must be a small-denominator rational (e.g. 0.25) given as
  * numerator/denominator so the literal is the same double in both
  * engines.
  */
object Ewma {

  /** @return (key, ewma, n_samples): the final smoothed value per key
    *         after folding the key's full (ts, tie)-ordered history
    */
  def ewmaLast(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      tieCol: Column,
      valueCol: Column,
      alphaNum: Int,
      alphaDen: Int): DataFrame = {
    require(alphaDen > 0 && alphaNum > 0 && alphaNum <= alphaDen,
      s"alpha must be in (0,1]: $alphaNum/$alphaDen")
    val a = lit(alphaNum.toDouble / alphaDen.toDouble)
    df.filter(keyCol.isNotNull && tsCol.isNotNull && valueCol.isNotNull)
      .select(keyCol.as("key"),
        struct(unix_micros(tsCol).as("us"), tieCol.as("tie"),
          valueCol.cast("double").as("x")).as("s"))
      .groupBy(col("key"))
      .agg(array_sort(collect_list(col("s"))).as("hist"))
      .select(col("key"),
        aggregate(col("hist"),
          lit(Double.NaN),
          (acc, e) => when(isnan(acc), e.getField("x"))
            .otherwise(a * e.getField("x") + (lit(1.0) - a) * acc))
          .as("ewma"),
        size(col("hist")).as("n_samples"))
  }
}
