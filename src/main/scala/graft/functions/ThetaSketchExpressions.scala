package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, Intersection, SetOperation, Sketch, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Theta-sketch distinct-set aggregation as a native Catalyst
  * TypedImperativeAggregate — the INTERSECTABLE sketch the HLL store
  * can't be (HLL unions; Theta unions, intersects, and differences),
  * so set-overlap questions (shared distinct users between two event
  * streams) become sketch algebra over stored bytes instead of a
  * re-scan of raw events.
  *
  * Same execution contract as Spark's own hll_sketch_agg: the buffer
  * is an on-heap datasketches Union, map-side partials update it with
  * raw longs, shuffle serializes the compact form (bytes track the
  * RETAINED entries — ≤ 8·k plus header, never the stream), and merge
  * unions compact sketches. Output is the compact sketch's wire bytes
  * (stable public format, readable by any datasketches binding).
  */
case class ThetaSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def prettyName: String = "graft_theta_sketch"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: Long => buffer.update(l)
      case i: Int  => buffer.update(i.toLong)
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(storage: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(CompactSketch.heapify(Memory.wrap(storage)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** Column surface + driver-side sketch algebra over the emitted
  * bytes. The algebra helpers operate on sketch-count-bounded data
  * (one compact sketch per GROUP, never per row) — the q_theta_sets
  * operator collects #event_type sketches and combines pairs. */
object ThetaFns {
  def thetaSketchAgg(c: Column): Column =
    ColumnBridge.column(
      ThetaSketchAgg(ColumnBridge.expression(c)).toAggregateExpression())

  def sketch(bytes: Array[Byte]): Sketch =
    CompactSketch.heapify(Memory.wrap(bytes))

  def estimate(bytes: Array[Byte]): Double = sketch(bytes).getEstimate

  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val i: Intersection = SetOperation.builder().buildIntersection()
    i.intersect(sketch(a))
    i.intersect(sketch(b))
    i.getResult.getEstimate
  }

  def unionEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val u: Union = SetOperation.builder().buildUnion()
    u.union(sketch(a))
    u.union(sketch(b))
    u.getResult.getEstimate
  }

  /** |A \ B| — the difference leg that completes the algebra (union /
    * intersection / aNotB are the three theta set operations). */
  def aNotBEstimate(a: Array[Byte], b: Array[Byte]): Double =
    SetOperation.builder().buildANotB()
      .aNotB(sketch(a), sketch(b)).getEstimate
}
