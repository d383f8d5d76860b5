package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}

/** 2-dimensional skyline (Pareto frontier): the rows not DOMINATED by
  * any other row, where `q` dominates `p` iff `q` is no worse on both
  * dimensions and strictly better on at least one. The
  * price-vs-quality frontier of product search, the cost-vs-recall
  * frontier of model selection, the classic Börzsönyi SKYLINE OF
  * operator (ICDE'01) — restricted here to the 2-D case, where an
  * EXACT distributed evaluation needs no pairwise comparison at all.
  *
  * Canonical orientation: minimize `x`, maximize `y` (the flags flip
  * either). The 2-D structure collapses dominance to two aggregates:
  * a row is in the skyline iff its `y` is the maximum of its own
  * x-class AND strictly above the best `y` over all strictly-smaller
  * `x` — so the whole frontier falls out of one x-keyed aggregate
  * plus a strictly-preceding running max. Ties survive: rows equal on
  * BOTH dimensions dominate neither, and all of them are emitted
  * (same as the `NOT EXISTS` dominance SQL the oracle runs).
  *
  * 100 TB shape (the banded two-pass discipline of
  * [[Sampling.tokenBudgetSample]]): the running max over
  * strictly-smaller x is NOT a global window. `x` is banded into
  * `bands` fixed-width value ranges; per-band maxima (≤ `bands` rows)
  * collect to the driver, their strict-prefix maxima broadcast back,
  * and the within-band strict-prefix max runs as a BAND-partitioned
  * window over the x-CLASS table (one row per distinct x, partitions
  * ~1/bands of the class space each). Bulk rows shuffle exactly once
  * (the x-class aggregate, map-side combined); nothing sorts
  * globally. Banding is purely an execution device — band edges
  * cannot change the answer, only the partition sizes — so the float
  * arithmetic in the band id never touches correctness.
  *
  * NULL on either dimension excludes the row (a null coordinate
  * neither dominates nor defends — the dominance SQL's comparison
  * semantics, made explicit).
  */
object Skyline {

  def skyline2d(
      df: DataFrame,
      xCol: Column,
      yCol: Column,
      minimizeX: Boolean = true,
      maximizeY: Boolean = true,
      bands: Int = 256): DataFrame = {
    require(bands >= 1, s"bands must be >= 1, got $bands")
    val base = df.filter(xCol.isNotNull && yCol.isNotNull)
    val sx = (if (minimizeX) xCol else -xCol).cast("double")
    val sy = (if (maximizeY) yCol else -yCol).cast("double")
    val withXY = base.withColumn("_sx", sx).withColumn("_sy", sy)

    // one bulk shuffle: the x-class table (one row per distinct x)
    val cls = withXY.groupBy(col("_sx")).agg(max(col("_sy")).as("_smax"))

    // fixed-width value bands over x — execution partitioning only
    val boundsRow = withXY.agg(min(col("_sx")), max(col("_sx"))).first()
    if (boundsRow.isNullAt(0)) return base.limit(0).drop("_sx", "_sy")
    val lo = boundsRow.getDouble(0)
    val hi = boundsRow.getDouble(1)
    val width = if (hi > lo) (hi - lo) / bands else 1.0
    val bandOf = greatest(lit(0),
      least(lit(bands - 1),
        floor((col("_sx") - lit(lo)) / lit(width)).cast("int")))
    val clsB = cls.withColumn("_band", bandOf)

    // per-band maxima -> driver (≤ bands rows) -> strict-prefix maxima
    val bandMax = clsB.groupBy(col("_band")).agg(max(col("_smax")).as("_bm"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val spark = df.sparkSession
    var run = Double.NegativeInfinity
    val prevRows = (0 until bands).map { b =>
      val prev = if (run == Double.NegativeInfinity) null
        else java.lang.Double.valueOf(run)
      bandMax.get(b).foreach(m => run = math.max(run, m))
      Row(b, prev)
    }
    val prevDf = spark.createDataFrame(
      spark.sparkContext.parallelize(prevRows, 1),
      StructType(Seq(StructField("_band", IntegerType, nullable = false),
        StructField("_prevband", DoubleType, nullable = true))))

    // within-band strict-prefix max over x-classes (band-local window)
    val w = Window.partitionBy(col("_band")).orderBy(col("_sx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val flagged = clsB
      .join(broadcast(prevDf), Seq("_band"), "left")
      .withColumn("_previn", max(col("_smax")).over(w))
      .withColumn("_maxlt", greatest(col("_prevband"), col("_previn")))
      .filter(col("_maxlt").isNull || col("_maxlt") < col("_smax"))
      .select(col("_sx"), col("_smax"))

    withXY
      .join(flagged, Seq("_sx"))
      .filter(col("_sy") === col("_smax"))
      .drop("_sx", "_sy", "_smax")
  }
}
