package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.datasketches.theta.{Intersection, SetOperation, Sketches, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}

import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable sketch aggregates over the bundled Apache DataSketches
  * library (the "Mergeable Summaries" algebra, Agarwal et al.
  * PODS'12), complementing Spark's built-in HLL pair:
  *
  *  - [[KllSketchAgg]] / [[KllMergeAgg]] / [[KllQuantile]] — KLL
  *    streaming quantiles (Karnin, Lang, Liberty FOCS'16): per-epoch
  *    distribution state in ~3 KB that answers any quantile later,
  *    and UNIONS across epochs without re-scanning them. Spark's own
  *    `approx_percentile` aggregates in one job but its state is not
  *    a storable column — this is the persistable form.
  *  - [[ThetaSketchAgg]] / [[ThetaUnionAgg]] / [[ThetaIntersectAgg]] /
  *    [[ThetaEstimate]] — Theta sketches: distinct-count state that
  *    supports INTERSECTION (and union) estimates. HLL unions but
  *    cannot intersect; retention/overlap questions ("users active in
  *    BOTH January and June") need theta.
  *
  * All are TypedImperativeAggregates: partial sketches combine
  * map-side, so a group-by shuffles one ≤~2^lgK-byte sketch per
  * (group × partition) regardless of row count. Theta sketch state is
  * a pure set property of the input's hash values (the k smallest
  * hashes), so its estimates are DETERMINISTIC under any partitioning
  * or row order; KLL compaction is order-sensitive, so KLL estimates
  * carry rank-error bounds (±1.65% at k=200) but may vary at the
  * margin across layouts — oracle checks must assert rank bounds, not
  * exact values (the q_sketch_accuracy pattern).
  */
object SketchAggs {

  private def toColumn(e: Expression): Column =
    org.apache.spark.sql.GraftSqlShims.column(e)
  private def exprOf(c: Column): Expression =
    org.apache.spark.sql.GraftSqlShims.expression(c)

  def kllSketchAgg(value: Column, k: Int = 200): Column =
    toColumn(KllSketchAgg(exprOf(value), k).toAggregateExpression())

  def kllMergeAgg(sketch: Column): Column =
    toColumn(KllMergeAgg(exprOf(sketch)).toAggregateExpression())

  def kllQuantile(sketch: Column, rank: Double): Column =
    toColumn(KllQuantile(exprOf(sketch), rank))

  def thetaSketchAgg(value: Column): Column =
    toColumn(ThetaSketchAgg(exprOf(value)).toAggregateExpression())

  def thetaUnionAgg(sketch: Column): Column =
    toColumn(ThetaUnionAgg(exprOf(sketch)).toAggregateExpression())

  def thetaIntersectAgg(sketch: Column): Column =
    toColumn(ThetaIntersectAgg(exprOf(sketch)).toAggregateExpression())

  def thetaEstimate(sketch: Column): Column =
    toColumn(ThetaEstimate(exprOf(sketch)))

  def freqSketchAgg(item: Column, maxMapSize: Int = 256): Column =
    toColumn(FreqSketchAgg(exprOf(item), maxMapSize).toAggregateExpression())

  def freqMergeAgg(sketch: Column, maxMapSize: Int = 256): Column =
    toColumn(FreqMergeAgg(exprOf(sketch), maxMapSize).toAggregateExpression())

  def freqItems(sketch: Column): Column =
    toColumn(FreqItems(exprOf(sketch)))

  def freqMaxError(sketch: Column): Column =
    toColumn(FreqMaxError(exprOf(sketch)))
}

/** KLL doubles sketch of a numeric column → binary sketch bytes. */
case class KllSketchAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: NumericType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kll_sketch_agg requires numeric input, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    child.eval(input) match {
      case null                => ()
      case n: java.lang.Number => buf.update(n.doubleValue())
      case d: Decimal          => buf.update(d.toDouble)
    }
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KllSketchAgg = copy(child = c.head)
}

/** Union of stored KLL sketches (binary column) → binary sketch. */
case class KllMergeAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kll_merge_agg requires binary sketches, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KllMergeAgg = copy(child = c.head)
}

/** Quantile readout of a stored KLL sketch at `rank` ∈ [0,1]
  * (inclusive criteria); null for an empty sketch. Post-aggregation
  * scalar — runs on ≤|groups| rows, so CodegenFallback costs nothing.
  */
case class KllQuantile(child: Expression, rank: Double)
  extends UnaryExpression with CodegenFallback {

  require(rank >= 0.0 && rank <= 1.0, s"rank $rank outside [0,1]")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kll_quantile requires binary sketch, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val sk = KllDoublesSketch.heapify(
      Memory.wrap(input.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else java.lang.Double.valueOf(
      sk.getQuantile(rank, QuantileSearchCriteria.INCLUSIVE))
  }

  override protected def withNewChildInternal(c: Expression): KllQuantile =
    copy(child = c)
}

private object ThetaBuffers {
  def newUnion(): Union = SetOperation.builder().buildUnion()
  def newIntersection(): Intersection =
    SetOperation.builder().buildIntersection()

  /** (de)serialize a union through its COMPACT result — the union's
    * state is itself a theta set, so union(result) is lossless.
    */
  def serializeUnion(u: Union): Array[Byte] = u.getResult.toByteArray
  def deserializeUnion(bytes: Array[Byte]): Union = {
    val u = newUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  /** A virgin intersection is the identity (the universal set) and
    * serializes as zero bytes; otherwise its compact result.
    */
  def serializeIntersection(i: Intersection): Array[Byte] =
    if (!i.hasResult) Array.emptyByteArray else i.getResult.toByteArray
  def deserializeIntersection(bytes: Array[Byte]): Intersection = {
    val i = newIntersection()
    if (bytes.nonEmpty) i.intersect(Sketches.wrapSketch(Memory.wrap(bytes)))
    i
  }
}

/** Theta sketch of a column's distinct values → binary compact sketch.
  * Accepts long, int, double, string, or binary inputs.
  */
case class ThetaSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | DoubleType | StringType | BinaryType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        "theta_sketch_agg requires bigint/int/double/string/binary, got " +
          other.catalogString)
    }

  override def createAggregationBuffer(): Union = ThetaBuffers.newUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    child.eval(input) match {
      case null             => ()
      case l: java.lang.Long    => buf.update(l.longValue())
      case i: java.lang.Integer => buf.update(i.longValue())
      case d: java.lang.Double  => buf.update(d.doubleValue())
      case s: UTF8String        => buf.update(s.toString)
      case b: Array[Byte]       => buf.update(b)
      case other => throw new IllegalStateException(
        s"unsupported theta input $other")
    }
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult); buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] =
    ThetaBuffers.serializeUnion(buf)
  override def deserialize(bytes: Array[Byte]): Union =
    ThetaBuffers.deserializeUnion(bytes)

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): ThetaSketchAgg = copy(child = c.head)
}

/** Union of stored theta sketches (binary column) → binary sketch. */
case class ThetaUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"theta_union_agg requires binary sketches, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): Union = ThetaBuffers.newUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult); buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] =
    ThetaBuffers.serializeUnion(buf)
  override def deserialize(bytes: Array[Byte]): Union =
    ThetaBuffers.deserializeUnion(bytes)

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): ThetaUnionAgg = copy(child = c.head)
}

/** Intersection of stored theta sketches — the estimate HLL cannot
  * give. Null over an empty group (an empty intersection is the
  * universal set, which has no meaningful sketch).
  */
case class ThetaIntersectAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Intersection] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"theta_intersect_agg requires binary sketches, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): Intersection =
    ThetaBuffers.newIntersection()

  override def update(buf: Intersection, input: InternalRow): Intersection = {
    val v = child.eval(input)
    if (v != null)
      buf.intersect(Sketches.wrapSketch(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: Intersection, other: Intersection): Intersection = {
    if (other.hasResult) buf.intersect(other.getResult)
    buf
  }

  override def eval(buf: Intersection): Any =
    if (!buf.hasResult) null else buf.getResult.toByteArray
  override def serialize(buf: Intersection): Array[Byte] =
    ThetaBuffers.serializeIntersection(buf)
  override def deserialize(bytes: Array[Byte]): Intersection =
    ThetaBuffers.deserializeIntersection(bytes)

  override def withNewMutableAggBufferOffset(o: Int): ThetaIntersectAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaIntersectAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): ThetaIntersectAgg = copy(child = c.head)
}

/** Distinct-count estimate of a stored theta sketch. Deterministic:
  * theta state is the set of k smallest hashes — a pure set property
  * of the input, independent of row order or partitioning.
  */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"theta_estimate requires binary sketch, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(
      Sketches.wrapSketch(Memory.wrap(input.asInstanceOf[Array[Byte]]))
        .getEstimate)

  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}

/** Frequent-items ("heavy hitters") sketch aggregate — the
  * Metwally/Agrawal/El Abbadi SpaceSaving algebra as mergeable column
  * state (Misra-Gries family; the DataSketches ItemsSketch). Per
  * group the state holds at most `maxMapSize` counters; merge is
  * counter union with error accumulation. Two HARD guarantees survive
  * any partitioning/merge order (the stored estimates themselves are
  * insertion-order dependent, so queries assert the guarantees, not
  * the raw estimates — the KLL discipline):
  *  - lowerBound ≤ true count ≤ upperBound for every tracked item;
  *  - NO_FALSE_NEGATIVES: every item whose true count exceeds
  *    `getMaximumError` appears in the returned list.
  * At 100 TB: per-epoch term sketches persist as binary columns and
  * the corpus-wide heavy-hitter list folds from closed epochs without
  * re-scanning them — the same rationale as the HLL/KLL/theta state.
  */
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[
    org.apache.datasketches.frequencies.ItemsSketch[String]] {
  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"maxMapSize must be a power of 2 >= 8, got $maxMapSize")

  private type Sk = org.apache.datasketches.frequencies.ItemsSketch[String]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"freq_sketch_agg requires string input, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): Sk =
    new org.apache.datasketches.frequencies.ItemsSketch[String](maxMapSize)

  override def update(buf: Sk, input: InternalRow): Sk = {
    child.eval(input) match {
      case null          => ()
      case s: UTF8String => buf.update(s.toString)
    }
    buf
  }

  override def merge(buf: Sk, other: Sk): Sk = { buf.merge(other); buf }

  override def eval(buf: Sk): Any = serialize(buf)
  override def serialize(buf: Sk): Array[Byte] =
    buf.toByteArray(new org.apache.datasketches.common.ArrayOfStringsSerDe())
  override def deserialize(bytes: Array[Byte]): Sk =
    org.apache.datasketches.frequencies.ItemsSketch.getInstance(
      Memory.wrap(bytes),
      new org.apache.datasketches.common.ArrayOfStringsSerDe())

  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): FreqSketchAgg = copy(child = c.head)
}

/** Union of serialized frequent-items sketches (the fold across
  * epoch/group states).
  */
case class FreqMergeAgg(
    child: Expression,
    maxMapSize: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[
    org.apache.datasketches.frequencies.ItemsSketch[String]] {
  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"maxMapSize must be a power of 2 >= 8, got $maxMapSize")

  private type Sk = org.apache.datasketches.frequencies.ItemsSketch[String]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"freq_merge_agg requires binary sketch input, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): Sk =
    new org.apache.datasketches.frequencies.ItemsSketch[String](maxMapSize)

  override def update(buf: Sk, input: InternalRow): Sk = {
    child.eval(input) match {
      case null           => ()
      case b: Array[Byte] => buf.merge(deserialize(b))
    }
    buf
  }

  override def merge(buf: Sk, other: Sk): Sk = { buf.merge(other); buf }

  override def eval(buf: Sk): Any = serialize(buf)
  override def serialize(buf: Sk): Array[Byte] =
    buf.toByteArray(new org.apache.datasketches.common.ArrayOfStringsSerDe())
  override def deserialize(bytes: Array[Byte]): Sk =
    org.apache.datasketches.frequencies.ItemsSketch.getInstance(
      Memory.wrap(bytes),
      new org.apache.datasketches.common.ArrayOfStringsSerDe())

  override def withNewMutableAggBufferOffset(o: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): FreqMergeAgg = copy(child = c.head)
}

/** NO_FALSE_NEGATIVES readout of a serialized frequent-items sketch:
  * `array<struct<item, est, lb, ub>>` — a superset of every item whose
  * true count exceeds the sketch's maximum error.
  */
case class FreqItems(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_items"
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"freq_items requires binary sketch input, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val sk = org.apache.datasketches.frequencies.ItemsSketch.getInstance(
      Memory.wrap(input.asInstanceOf[Array[Byte]]),
      new org.apache.datasketches.common.ArrayOfStringsSerDe())
    val rows = sk.getFrequentItems(
      org.apache.datasketches.frequencies.ErrorType.NO_FALSE_NEGATIVES)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      rows.map(r => InternalRow(
        UTF8String.fromString(r.getItem),
        r.getEstimate, r.getLowerBound, r.getUpperBound): Any))
  }

  override protected def withNewChildInternal(c: Expression): FreqItems =
    copy(child = c)
}

/** The sketch's maximum per-item estimation error (0 while the map has
  * never evicted — the exact regime).
  */
case class FreqMaxError(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_max_error"
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"freq_max_error requires binary sketch input, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    org.apache.datasketches.frequencies.ItemsSketch.getInstance(
      Memory.wrap(input.asInstanceOf[Array[Byte]]),
      new org.apache.datasketches.common.ArrayOfStringsSerDe())
      .getMaximumError

  override protected def withNewChildInternal(c: Expression): FreqMaxError =
    copy(child = c)
}
