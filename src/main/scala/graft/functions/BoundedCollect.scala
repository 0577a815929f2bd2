package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType}

/**
 * `collect_list` with a hard per-group element cap — the aggregation
 * buffer never holds more than `cap` elements, so a degenerate hot key
 * (a boilerplate shingle present in 10^9 documents at 100 TB) costs
 * O(cap) memory instead of OOMing the executor the way stock
 * `collect_list` does. Pair it with a same-pass `count(*)` and filter
 * `df < cap` to know when the list is exhaustive: groups small enough
 * to matter are complete, groups past the cap were never wanted.
 *
 * Used by the n-gram Jaccard dedup (rare-shingle posting lists,
 * `queries/TextOps.scala`): postings group by shingle in ONE exchange
 * and pairs expand from each bounded list with array HOFs, replacing
 * the df-join + self-join formulation that recomputed the shingle
 * pipeline three times.
 *
 * Buffer elements are single-field UnsafeRow copies (schema
 * `[child.dataType]`), so serialize/deserialize for partial-aggregate
 * shuffle is a length-prefixed byte concat with no reflection.
 */
case class BoundedCollectList(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[UnsafeRow]]
  with UnaryLike[Expression] {

  require(cap > 0, "BoundedCollectList cap must be positive")

  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))
  @transient private lazy val holder = new Array[Any](1)

  override def createAggregationBuffer(): ArrayBuffer[UnsafeRow] =
    ArrayBuffer.empty[UnsafeRow]

  override def update(buffer: ArrayBuffer[UnsafeRow], input: InternalRow)
      : ArrayBuffer[UnsafeRow] = {
    if (buffer.size < cap) {
      val v = child.eval(input)
      if (v != null) {
        holder(0) = v
        buffer += proj(InternalRow.fromSeq(holder.toSeq)).copy()
      }
    }
    buffer
  }

  override def merge(b1: ArrayBuffer[UnsafeRow], b2: ArrayBuffer[UnsafeRow])
      : ArrayBuffer[UnsafeRow] = {
    val room = cap - b1.size
    if (room >= b2.size) b1 ++= b2 else b1 ++= b2.take(math.max(0, room))
    b1
  }

  override def eval(buffer: ArrayBuffer[UnsafeRow]): Any =
    new GenericArrayData(
      buffer.map(r => InternalRow.copyValue(r.get(0, child.dataType))).toArray)

  override def serialize(buffer: ArrayBuffer[UnsafeRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { r =>
      val bytes = r.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[UnsafeRow] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = new ArrayBuffer[UnsafeRow](n)
    var i = 0
    while (i < n) {
      val len = in.getInt
      val rowBytes = new Array[Byte](len)
      in.get(rowBytes)
      val row = new UnsafeRow(1)
      row.pointTo(rowBytes, len)
      buf += row
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectList =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "bounded_collect_list"
}

object BoundedCollect {
  /** collect at most `cap` values of `c` per group (order within the
    * group is not defined, like `collect_list` — callers must not rank
    * on list position). */
  def list(c: Column, cap: Int): Column =
    Bridge.column(
      BoundedCollectList(Bridge.expression(c), cap).toAggregateExpression())
}
