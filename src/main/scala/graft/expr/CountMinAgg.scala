package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

import graft.core.CountMin

/**
 * Mergeable count-min point-frequency sketches (see [[graft.core.CountMin]])
 * — the sketch-family API shape ([[HllAgg]]/[[TDigestAgg]]):
 *
 *  - `count_min_agg(hashedKey, weight, d, w)` → binary sketch per group;
 *  - `count_min_merge_agg(blob)` → fold same-shape blobs (two-level /
 *    incremental aggregation; vector-add merge ⇒ any fold order is
 *    byte-identical to a one-shot build — the CountingBloom property);
 *  - `count_min_query(blob, hashedKey)` → long estimate (≥ true count,
 *    ≤ true + (e/w)·N w.p. ≥ 1 − e^−d);
 *  - `count_min_total(blob)` → total added weight N.
 *
 * Keys are pre-hashed LONGs (xxhash64 on the Spark side, the HllAgg
 * convention); weights non-negative LONGs.
 */
case class CountMinAgg(
    left: Expression,  // LONG pre-hashed key
    right: Expression, // LONG non-negative weight
    depth: Int = 4,
    width: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMin] with BinaryLike[Expression] {

  override def prettyName: String = "count_min_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_min_agg expects (BIGINT, BIGINT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def createAggregationBuffer(): CountMin = CountMin.create(depth, width)

  override def update(buf: CountMin, input: InternalRow): CountMin = {
    val k = left.eval(input)
    val w = right.eval(input)
    if (k != null && w != null)
      buf.add(k.asInstanceOf[Long], w.asInstanceOf[Long])
    buf
  }

  override def merge(buf: CountMin, other: CountMin): CountMin =
    buf.mergeInPlace(other)
  override def eval(buf: CountMin): Any = buf.serialize()
  override def serialize(buf: CountMin): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): CountMin =
    CountMin.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CountMinAgg = copy(left = l, right = r)
}

/** Fold serialized same-shape sketches (see [[CountMinAgg]]); null until
  * the first blob, like [[HllMergeAgg]]/[[TDigestMergeAgg]]. */
case class CountMinMergeAgg(
    child: Expression, // BINARY serialized sketches, same (d, w)
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMin] with UnaryLike[Expression] {

  override def prettyName: String = "count_min_merge_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_min_merge_agg expects BINARY sketches, got ${child.dataType.sql}")

  override def createAggregationBuffer(): CountMin = null

  override def update(buf: CountMin, input: InternalRow): CountMin = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val s = CountMin.deserialize(v.asInstanceOf[Array[Byte]])
      if (buf == null) s else buf.mergeInPlace(s)
    }
  }

  override def merge(buf: CountMin, other: CountMin): CountMin =
    if (buf == null) other
    else if (other == null) buf
    else buf.mergeInPlace(other)

  override def eval(buf: CountMin): Any =
    if (buf == null) null else buf.serialize()
  override def serialize(buf: CountMin): Array[Byte] =
    if (buf == null) Array.empty else buf.serialize()
  override def deserialize(bytes: Array[Byte]): CountMin =
    if (bytes.isEmpty) null else CountMin.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CountMinMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CountMinMergeAgg =
    copy(child = c)
}

/** Point-frequency estimate of a pre-hashed key from a sketch blob. */
case class CountMinQuery(left: Expression, right: Expression)
  extends BinaryExpression with BinaryLike[Expression] {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_min_query expects (BINARY, BIGINT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "count_min_query"
  override protected def nullSafeEval(b: Any, k: Any): Any =
    CountMin.estimateBytes(b.asInstanceOf[Array[Byte]], k.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, k) => s"graft.core.CountMin.estimateBytes($b, $k)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CountMinQuery = copy(left = l, right = r)
}

/** Total added weight N of a sketch blob. */
case class CountMinTotal(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_min_total expects BINARY sketch, got ${child.dataType.sql}")
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "count_min_total"
  override protected def nullSafeEval(v: Any): Any =
    CountMin.totalBytes(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.CountMin.totalBytes($c)")
  override protected def withNewChildInternal(c: Expression): CountMinTotal =
    copy(child = c)
}
