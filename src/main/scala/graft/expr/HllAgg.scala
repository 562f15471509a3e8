package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

import graft.core.Hll

/**
 * Mergeable HyperLogLog distinct-count sketches (see [[graft.core.Hll]])
 * — the bloom-family API shape:
 *
 *  - `hll_agg(xxhash64(key), p)` → binary sketch blob per group;
 *  - `hll_merge_agg(blob)`       → register-max merge of same-p blobs
 *    (per-round delta sketches fold into carried state byte-identically
 *    to a full rebuild — the [[BloomMergeAgg]] incremental pattern);
 *  - `hll_estimate(blob)`        → bias-corrected cardinality estimate.
 *
 * At 10^10 URLs the per-host distinct contribution is m bytes of state
 * per host, never a distinct set; q101 asserts the estimate against the
 * exact count at sandbox scale.
 */
case class HllAgg(
    child: Expression, // LONG values, pre-hashed (xxhash64 convention)
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Hll] with UnaryLike[Expression] {

  override def prettyName: String = "hll_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_agg expects BIGINT (pre-hashed), got ${child.dataType.sql}")

  override def createAggregationBuffer(): Hll = new Hll(p)

  override def update(buf: Hll, input: InternalRow): Hll = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Hll, other: Hll): Hll = buf.mergeInPlace(other)
  override def eval(buf: Hll): Any = buf.serialize()
  override def serialize(buf: Hll): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): Hll = Hll.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): HllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllAgg =
    copy(child = c)
}

/** Register-max merge of serialized same-precision sketches (see
  * [[HllAgg]]); null until the first blob, like [[BloomMergeAgg]]. */
case class HllMergeAgg(
    child: Expression, // BINARY serialized sketches, same p
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Hll] with UnaryLike[Expression] {

  override def prettyName: String = "hll_merge_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_merge_agg expects BINARY sketches, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Hll = null

  override def update(buf: Hll, input: InternalRow): Hll = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val h = Hll.deserialize(v.asInstanceOf[Array[Byte]])
      if (buf == null) h else buf.mergeInPlace(h)
    }
  }

  override def merge(buf: Hll, other: Hll): Hll =
    if (buf == null) other
    else if (other == null) buf
    else buf.mergeInPlace(other)

  override def eval(buf: Hll): Any =
    if (buf == null) null else buf.serialize()
  override def serialize(buf: Hll): Array[Byte] =
    if (buf == null) Array.empty else buf.serialize()
  override def deserialize(bytes: Array[Byte]): Hll =
    if (bytes.isEmpty) null else Hll.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllMergeAgg =
    copy(child = c)
}

/** Cardinality estimate of a serialized sketch blob. */
case class HllEstimate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_estimate expects BINARY sketch, got ${child.dataType.sql}")
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hll_estimate"
  override protected def nullSafeEval(v: Any): Any =
    Hll.estimateBytes(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Hll.estimateBytes($c)")
  override protected def withNewChildInternal(c: Expression): HllEstimate =
    copy(child = c)
}
