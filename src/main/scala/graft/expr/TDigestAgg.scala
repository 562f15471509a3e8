package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

import graft.core.TDigest

/**
 * Mergeable t-digest quantile sketches (see [[graft.core.TDigest]]) —
 * the sketch-family API shape ([[HllAgg]]/[[BloomFilterAgg]]):
 *
 *  - `tdigest_agg(value, δ)`    → binary digest blob per group;
 *  - `tdigest_merge_agg(blob)`  → fold same-δ blobs (two-level /
 *    incremental aggregation without rescanning values);
 *  - `tdigest_quantile(blob, q)` → interpolated quantile estimate;
 *  - `tdigest_weight(blob)`      → total observation count.
 *
 * Unlike the HLL/Bloom merges, a digest merge is order-dependent in
 * its BYTES; only the O(1/δ) rank-error bound is invariant — driver
 * queries oracle exact percentiles and assert the bound in-query.
 */
case class TDigestAgg(
    child: Expression, // DOUBLE values
    delta: Double = 100.0,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] with UnaryLike[Expression] {

  override def prettyName: String = "tdigest_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tdigest_agg expects DOUBLE, got ${child.dataType.sql}")

  override def createAggregationBuffer(): TDigest = new TDigest(delta)

  override def update(buf: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: TDigest, other: TDigest): TDigest =
    buf.mergeInPlace(other)
  override def eval(buf: TDigest): Any = buf.serialize()
  override def serialize(buf: TDigest): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest =
    TDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TDigestAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TDigestAgg =
    copy(child = c)
}

/** Fold serialized same-δ digests (see [[TDigestAgg]]); null until the
  * first blob, like [[HllMergeAgg]]. */
case class TDigestMergeAgg(
    child: Expression, // BINARY serialized digests, same delta
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] with UnaryLike[Expression] {

  override def prettyName: String = "tdigest_merge_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tdigest_merge_agg expects BINARY digests, got ${child.dataType.sql}")

  override def createAggregationBuffer(): TDigest = null

  override def update(buf: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val d = TDigest.deserialize(v.asInstanceOf[Array[Byte]])
      if (buf == null) d else buf.mergeInPlace(d)
    }
  }

  override def merge(buf: TDigest, other: TDigest): TDigest =
    if (buf == null) other
    else if (other == null) buf
    else buf.mergeInPlace(other)

  override def eval(buf: TDigest): Any =
    if (buf == null) null else buf.serialize()
  override def serialize(buf: TDigest): Array[Byte] =
    if (buf == null) Array.empty else buf.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest =
    if (bytes.isEmpty) null else TDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TDigestMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TDigestMergeAgg =
    copy(child = c)
}

/** Interpolated quantile estimate from a serialized digest blob. */
case class TDigestQuantile(left: Expression, right: Expression)
  extends BinaryExpression with BinaryLike[Expression] {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tdigest_quantile expects (BINARY, DOUBLE), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "tdigest_quantile"
  override protected def nullSafeEval(b: Any, q: Any): Any =
    TDigest.quantileBytes(b.asInstanceOf[Array[Byte]], q.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, q) => s"graft.core.TDigest.quantileBytes($b, $q)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TDigestQuantile = copy(left = l, right = r)
}

/** Total observation count of a serialized digest blob. */
case class TDigestWeight(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tdigest_weight expects BINARY digest, got ${child.dataType.sql}")
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "tdigest_weight"
  override protected def nullSafeEval(v: Any): Any =
    TDigest.weightBytes(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.TDigest.weightBytes($c)")
  override protected def withNewChildInternal(c: Expression): TDigestWeight =
    copy(child = c)
}
