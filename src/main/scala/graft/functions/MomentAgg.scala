package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact first+second vector moments in ONE aggregate, no explode —
  * the fit-side engine of [[graft.similarity.Pca]].
  *
  * The explode form (one (i, j, xᵢ·xⱼ) row per cell per vector —
  * d(d+3)/2 ≈ 2 100 rows for d = 64) is algebraically clean but pays
  * struct allocation, a DECIMAL cast, and hash-aggregate bookkeeping
  * PER CELL PER ROW: ~4 s of the 5.8 s PCA fit at sf0.1 was that
  * machinery, not arithmetic. This aggregate consumes the raw
  * `array<double>` column and keeps the whole moment vector as ONE
  * Array[Long] state per partition — map-side combine is elementwise
  * integer addition, the exchange carries d(d+3)/2 longs per
  * partition, and there are no per-cell objects at all.
  *
  * Exactness contract (bit-compatible with the explode form, which
  * the pinned PCA model literals in the q_pca_project oracle and
  * golden depend on): each product is rounded to 12 decimal places
  * exactly as Spark's `Cast(double → DECIMAL(28,12))` rounds —
  * `BigDecimal.valueOf` (shortest decimal representation) then
  * HALF_UP — and summed as an unscaled long. Integer addition is
  * associative and commutative, so any partitioning/merge order gives
  * the identical sum, which is the identical DECIMAL the old groupBy
  * produced. Range: per-value |x| < 9.2·10⁶ and per-cell sums within
  * ±9.2·10¹⁸ unscaled (`Math.addExact`/`longValueExact` throw loudly
  * on violation — embeddings are unit-scale, leaving 12 orders of
  * headroom; data outside that envelope should use the explode form's
  * wider DECIMAL(38,12) headroom instead).
  *
  * State layout: cells(0..d-1) = Σ xᵢ (12-dp unscaled); then the
  * upper triangle Σ xᵢ·xⱼ (j ≥ i) row-major; plus the row count.
  * Output: struct(n: long, cells: array<long>).
  */
case class MomentSumAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MomentSumAgg.State] {

  private val nCells = dim + dim * (dim + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("cells", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"moment_sum_agg requires array<double>, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): MomentSumAgg.State =
    new MomentSumAgg.State(new Array[Long](nCells), 0L)

  override def update(
      buf: MomentSumAgg.State, input: InternalRow): MomentSumAgg.State = {
    child.eval(input) match {
      case null => buf
      case a: ArrayData =>
        // null-full or wrong-dim rows are the caller's filter contract
        // (same as the explode form's size(v) === dim guard)
        if (a.numElements() != dim) buf
        else {
          val x = a.toDoubleArray()
          val c = buf.cells
          var i = 0
          var idx = dim
          while (i < dim) {
            c(i) = Math.addExact(c(i), MomentSumAgg.unscaled12(x(i)))
            var j = i
            while (j < dim) {
              c(idx) = Math.addExact(c(idx), MomentSumAgg.unscaled12(x(i) * x(j)))
              idx += 1
              j += 1
            }
            i += 1
          }
          buf.n += 1
          buf
        }
    }
  }

  override def merge(
      buf: MomentSumAgg.State, other: MomentSumAgg.State): MomentSumAgg.State = {
    val a = buf.cells; val b = other.cells
    var i = 0
    while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
    buf.n += other.n
    buf
  }

  override def eval(buf: MomentSumAgg.State): Any =
    InternalRow(buf.n, new GenericArrayData(buf.cells))

  override def serialize(buf: MomentSumAgg.State): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * (buf.cells.length + 1))
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(buf.n)
    buf.cells.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MomentSumAgg.State = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = bb.getLong
    val cells = new Array[Long](nCells)
    var i = 0
    while (i < nCells) { cells(i) = bb.getLong; i += 1 }
    new MomentSumAgg.State(cells, n)
  }

  override def withNewMutableAggBufferOffset(o: Int): MomentSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MomentSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MomentSumAgg = copy(child = c.head)
}

object MomentSumAgg {
  final class State(val cells: Array[Long], var n: Long)

  /** Exactly `Cast(double → DECIMAL(_,12))`: shortest-repr decimal
    * (`BigDecimal.valueOf`) rounded HALF_UP to 12 dp, as an unscaled
    * long. `longValueExact` refuses values whose unscaled form
    * overflows (|x| ≥ ~9.2·10⁶).
    */
  def unscaled12(v: Double): Long =
    JBigDecimal.valueOf(v).setScale(12, RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
}
