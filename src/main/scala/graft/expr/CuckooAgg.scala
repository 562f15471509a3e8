package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._
import graft.core.CuckooFilter

/**
 * Cuckoo-filter aggregates/expressions — the COMPACT deletable seen
 * pre-filter (see [[graft.core.CuckooFilter]] for the answer-identity
 * merge contract vs the counting Bloom's byte-identity). Same four-piece
 * incremental state algebra as the counting filter:
 *
 *   state₀  = cuckoo_agg(seenHash, n)                    (build)
 *   state' = cuckoo_merge_agg(state ∪ addDelta)          (multiset union)
 *   state' = cuckoo_subtract(state, removeDelta)         (multiset minus)
 *   test    = cuckoo_might_contain(state, urlHash)
 *
 * where add/remove deltas are cuckoo_agg outputs of the SAME shape.
 * Partial-buffer merge order varies run to run, so downstream code must
 * treat the serialized bytes as opaque (answers are deterministic;
 * bytes are not) — never hash or compare the blob itself.
 */
case class CuckooAgg(
    left: Expression,   // LONG values to insert
    right: Expression,  // expected distinct items (long literal)
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CuckooFilter] with BinaryLike[Expression] {

  override def prettyName: String = "cuckoo_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  private lazy val expectedItems: Long =
    right.eval(InternalRow.empty).asInstanceOf[Number].longValue()

  override def createAggregationBuffer(): CuckooFilter =
    CuckooFilter.create(math.max(expectedItems, 1L))

  override def update(buf: CuckooFilter, input: InternalRow): CuckooFilter = {
    val v = left.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: CuckooFilter, other: CuckooFilter): CuckooFilter =
    buf.mergeInPlace(other)

  override def eval(buf: CuckooFilter): Any = buf.serialize

  override def serialize(buf: CuckooFilter): Array[Byte] = buf.serialize
  override def deserialize(bytes: Array[Byte]): CuckooFilter =
    CuckooFilter.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CuckooAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CuckooAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CuckooAgg =
    copy(left = l, right = r)
}

/** `cuckoo_merge_agg(ckfBytes)` — multiset-union merge of serialized
  * cuckoo filters of identical shape (answers equal a rebuild from the
  * union of inputs). Null until the first filter arrives. */
case class CuckooMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CuckooFilter] with UnaryLike[Expression] {

  override def prettyName: String = "cuckoo_merge_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): CuckooFilter = null

  override def update(buf: CuckooFilter, input: InternalRow): CuckooFilter = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val f = CuckooFilter.deserialize(v.asInstanceOf[Array[Byte]])
      if (buf == null) f else buf.mergeInPlace(f)
    }
  }

  override def merge(buf: CuckooFilter, other: CuckooFilter): CuckooFilter =
    if (buf == null) other
    else if (other == null) buf
    else buf.mergeInPlace(other)

  override def eval(buf: CuckooFilter): Any =
    if (buf == null) null else buf.serialize

  override def serialize(buf: CuckooFilter): Array[Byte] =
    if (buf == null) Array.emptyByteArray else buf.serialize
  override def deserialize(bytes: Array[Byte]): CuckooFilter =
    if (bytes.isEmpty) null else CuckooFilter.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CuckooMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CuckooMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CuckooMergeAgg =
    copy(child = c)
}

/** `cuckoo_subtract(stateBytes, deleteBytes)` — retire a deletion batch
  * (itself a cuckoo filter over the deleted keys, same shape): remove
  * one matching fingerprint copy per delta entry. Deleted keys must have
  * been inserted (class contract). */
case class CuckooSubtract(left: Expression, right: Expression)
  extends BinaryExpression with codegen.CodegenFallback {

  override def prettyName: String = "cuckoo_subtract"
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(state: Any, delta: Any): Any =
    CuckooFilter.deserialize(state.asInstanceOf[Array[Byte]])
      .subtractEntriesOf(
        CuckooFilter.deserialize(delta.asInstanceOf[Array[Byte]]))
      .serialize

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CuckooSubtract =
    copy(left = l, right = r)
}

/** `cuckoo_might_contain(ckfBytes, longValue)` — deserialization cached
  * per byte-array identity (same rationale as [[MightContainLong]]). */
case class CuckooMightContain(left: Expression, right: Expression)
  extends BinaryExpression with codegen.CodegenFallback {

  override def prettyName: String = "cuckoo_might_contain"
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedFilter: CuckooFilter = _

  override protected def nullSafeEval(ckfBytes: Any, value: Any): Any = {
    val bytes = ckfBytes.asInstanceOf[Array[Byte]]
    if (cachedFilter == null || (cachedBytes ne bytes)) {
      cachedFilter = CuckooFilter.deserialize(bytes)
      cachedBytes = bytes
    }
    cachedFilter.mightContain(value.asInstanceOf[Long])
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CuckooMightContain =
    copy(left = l, right = r)
}
