package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Mutable buffer: the best ordering key seen and its (copied) struct value. */
final class MaxByRowBuffer(var ord: Long, var value: InternalRow) extends Serializable

/** `max_by` over a STRUCT value with a LONG ordering key, as a
  * [[TypedImperativeAggregate]] — i.e. hash-based.
  *
  * Why it exists: the built-in `max_by(struct(...), lsn)` is a
  * DeclarativeAggregate whose buffer holds the struct; buffers with
  * strings/structs are not mutable-primitive, so HashAggregateExec rejects the
  * plan and Catalyst falls back to SortAggregate — TWO full sorts of the fat
  * CDC payload per merge (measured 2-3x slower at bench scale). A
  * TypedImperativeAggregate runs in ObjectHashAggregateExec: hash-based, keeps
  * map-side partial aggregation (duplicate storms on hot keys collapse before
  * the shuffle), no sorts, graceful sort-based fallback if a partition's group
  * count exceeds spark.sql.objectHashAggregate.sortBased.fallbackThreshold.
  *
  * Restriction: ordering key must be LongType (the CDC LSN).
  *
  * Tie-break: since the row-LSN change, equal ordering keys ARE reachable —
  * a base row re-entering a merge at its stored `_lsn` ties a redelivered
  * event carrying that same LSN (same event, so the payloads are identical;
  * only the metadata op differs: null for the base row, 'U' for the event).
  * First-seen resolution would be partition-order-dependent, so ties resolve
  * DETERMINISTICALLY by the serialized row bytes (larger wins) — plan-stable
  * under any input order, and semantically neutral because reachable ties
  * are payload-identical by the LSN-uniqueness contract.
  */
case class MaxByRow(
    valueExpr: Expression,
    ordExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MaxByRowBuffer] with BinaryLike[Expression] {

  // expressions arrive unresolved from the Column API: type-check after
  // analysis, not at construction
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (ordExpr.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"max_by_row ordering key must be LONG, got ${ordExpr.dataType.simpleString}")
    else if (!valueExpr.dataType.isInstanceOf[StructType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"max_by_row value must be a STRUCT, got ${valueExpr.dataType.simpleString}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }
  @transient private lazy val structType = valueExpr.dataType.asInstanceOf[StructType]

  override def left: Expression = valueExpr
  override def right: Expression = ordExpr
  override def dataType: DataType = valueExpr.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "max_by_row"

  override def createAggregationBuffer(): MaxByRowBuffer = new MaxByRowBuffer(Long.MinValue, null)

  /** Deterministic tie-break: unsigned lexicographic compare of the two
    * UnsafeRows' bytes (buffers only ever hold UnsafeRows — see update/
    * deserialize). Rare path: runs only when ordering keys collide. */
  private def bytesGreater(a: InternalRow, b: InternalRow): Boolean = {
    val ab = a.asInstanceOf[UnsafeRow].getBytes
    val bb = b.asInstanceOf[UnsafeRow].getBytes
    val n = math.min(ab.length, bb.length)
    var i = 0
    while (i < n) {
      val d = (ab(i) & 0xff) - (bb(i) & 0xff)
      if (d != 0) return d > 0
      i += 1
    }
    ab.length > bb.length
  }

  override def update(b: MaxByRowBuffer, input: InternalRow): MaxByRowBuffer = {
    val o = ordExpr.eval(input)
    if (o != null) {
      val ord = o.asInstanceOf[Long]
      if (ord > b.ord || b.value == null) {
        val v = valueExpr.eval(input)
        b.ord = ord
        // deep-copy: struct eval can return rows whose strings point into the
        // reused input buffer; project to UnsafeRow (serializes field bytes)
        // then copy to detach from the projection's reused output buffer
        b.value = if (v == null) null else ser(v.asInstanceOf[InternalRow]).copy()
      } else if (ord == b.ord) {
        val v = valueExpr.eval(input)
        if (v != null) {
          val cand = ser(v.asInstanceOf[InternalRow])
          if (bytesGreater(cand, b.value)) b.value = cand.copy()
        }
      }
    }
    b
  }

  override def merge(b: MaxByRowBuffer, o: MaxByRowBuffer): MaxByRowBuffer = {
    if (o.value != null && (b.value == null || o.ord > b.ord ||
        (o.ord == b.ord && bytesGreater(o.value, b.value)))) {
      b.ord = o.ord; b.value = o.value
    }
    b
  }

  override def eval(b: MaxByRowBuffer): Any = b.value

  @transient private lazy val ser =
    UnsafeProjection.create(structType.fields.map(_.dataType))

  override def serialize(b: MaxByRowBuffer): Array[Byte] = {
    val rowBytes: Array[Byte] =
      if (b.value == null) Array.emptyByteArray
      else {
        val ur = b.value match {
          case u: UnsafeRow => u
          case r => ser(r)
        }
        ur.getBytes
      }
    val out = java.nio.ByteBuffer.allocate(8 + rowBytes.length)
    out.putLong(b.ord).put(rowBytes)
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): MaxByRowBuffer = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val ord = in.getLong
    if (bytes.length == 8) new MaxByRowBuffer(ord, null)
    else {
      val row = new UnsafeRow(structType.size)
      row.pointTo(bytes, 8 + org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length - 8)
      // copy out of the shared byte buffer
      new MaxByRowBuffer(ord, row.copy())
    }
  }

  override def withNewMutableAggBufferOffset(n: Int): MaxByRow = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MaxByRow = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MaxByRow =
    copy(valueExpr = l, ordExpr = r)
}

object MaxByRow {
  /** Column-level API: hash-based max_by(struct, longOrd). */
  def maxByRow(value: Column, ord: Column): Column =
    Bridge.column(
      MaxByRow(Bridge.expression(value), Bridge.expression(ord))
        .toAggregateExpression())
}
