package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.SpaceSaving

/**
 * `space_saving_agg(item, weight, capacity)` — mergeable SpaceSaving
 * frequent-items aggregate (see [[graft.core.SpaceSaving]] for the
 * algorithm and its bounds). Returns `array<struct<item,est,err,total>>`
 * sorted by (est desc, item asc); `total` repeats the group's exact
 * stream weight so the N/m error bound is readable from the output.
 *
 * 100 TB shape: partial aggregation applies — every map task folds its
 * partition into an m-entry summary and only summaries cross the wire,
 * so finding hot terms/hosts over the full corpus shuffles
 * O(partitions·m) rows instead of O(distinct keys). While a group's
 * distinct count stays ≤ m the result is EXACT (err=0) and
 * partitioning-invariant; beyond m it degrades gracefully with proven
 * overestimate bounds instead of OOMing the frequency table.
 */
case class SpaceSavingAgg(
    first: Expression,   // item (string)
    second: Expression,  // weight (long)
    third: Expression,   // capacity (int literal)
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSaving] with TernaryLike[Expression] {

  override def prettyName: String = "space_saving_agg"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false),
    StructField("total", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  private lazy val capacity: Int =
    third.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  override def createAggregationBuffer(): SpaceSaving = new SpaceSaving(capacity)

  override def update(buf: SpaceSaving, input: InternalRow): SpaceSaving = {
    val item = first.eval(input)
    if (item != null) {
      val w = second.eval(input)
      if (w != null) buf.add(item.asInstanceOf[UTF8String].toString, w.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: SpaceSaving, other: SpaceSaving): SpaceSaving = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: SpaceSaving): Any =
    new GenericArrayData(buf.sorted.map { case (item, est, err) =>
      InternalRow(UTF8String.fromString(item), est, err, buf.total)
    }.toArray[Any])

  override def serialize(buf: SpaceSaving): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): SpaceSaving =
    SpaceSaving.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SpaceSavingAgg =
    copy(first = f, second = s, third = t)
}
