package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a [[TypedImperativeAggregate]].
  *
  * Tracks at most `capacity` candidate items; any item occurring more
  * than N/(capacity+1) times is guaranteed present, and reported counts
  * are within N/(capacity+1) of truth. When the true distinct count
  * never exceeds `capacity` the sketch is EXACT (no eviction fires) —
  * which is what lets the driver's SQL oracle check it at test scale.
  *
  * Scale properties (the reason this exists): fixed O(capacity) memory
  * regardless of input size, one pass, and buffers MERGE — so Spark
  * plans it partial/final like any algebraic aggregate, shuffling one
  * small sketch per partition instead of the full key space. The exact
  * top-k alternative (groupBy + orderBy + limit) shuffles every
  * distinct key.
  */
case class MisraGries(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  private def add(b: java.util.HashMap[String, Long], k: String, c: Long): Unit = {
    val cur = b.get(k)
    if (b.containsKey(k)) b.put(k, cur + c)
    else if (b.size < capacity) b.put(k, c)
    else {
      // Misra-Gries decrement step: reduce every counter by the new
      // item's weight; drop zeros. The new item is absorbed.
      var mn = Long.MaxValue
      val vit = b.values.iterator()
      while (vit.hasNext) { val v = vit.next(); if (v < mn) mn = v }
      val min = math.min(c, mn)
      val it = b.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - min
        if (nv <= 0) it.remove() else e.setValue(nv)
      }
      val rem = c - min
      if (rem > 0 && b.size < capacity) b.put(k, rem)
    }
  }

  override def update(b: java.util.HashMap[String, Long], input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(b, v.asInstanceOf[UTF8String].toString, 1L)
    b
  }

  override def merge(b: java.util.HashMap[String, Long],
                     o: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    o.forEach((k, c) => add(b, k, c))
    b
  }

  override def eval(b: java.util.HashMap[String, Long]): Any = {
    val keys = new Array[Any](b.size)
    val vals = new Array[Any](b.size)
    var i = 0
    b.forEach { (k, c) =>
      keys(i) = UTF8String.fromString(k); vals(i) = c; i += 1
    }
    ArrayBasedMapData(keys, vals)
  }

  override def serialize(b: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.forEach { (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) { b.put(in.readUTF(), in.readLong()); i += 1 }
    b
  }

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_heavy_hitters"
  override def withNewMutableAggBufferOffset(o: Int): MisraGries = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MisraGries = copy(child = c)
}

object HeavyHitters {
  /** Aggregate column: approximate item→count map of the heaviest
    * items in `c`. */
  def sketch(c: Column, capacity: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(c), capacity).toAggregateExpression())
}
