package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise sum of `array(double)` columns as a
  * [[TypedImperativeAggregate]] — the aggregate a distributed k-means
  * update step needs (sum of member vectors per cluster, then divide by
  * the count).
  *
  * Scale properties: the buffer is one fixed-size double array per
  * (partition, group); buffers MERGE, so Spark plans it partial/final
  * like any algebraic aggregate — each cluster shuffles one `dim`-sized
  * vector per partition, never its member vectors. The explode-based
  * alternative (posexplode + groupBy(cid, pos) avg) shuffles dim rows
  * PER MEMBER vector: dim× the exchange volume of this aggregate's
  * per-partition constant.
  */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with UnaryLike[Expression] {

  /** Empty marker until the first row fixes the dimension. */
  override def createAggregationBuffer(): Array[Double] = Array.empty[Double]

  override def update(b: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return b
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf = if (b.length == 0) new Array[Double](n) else b
    val m = math.min(n, buf.length)
    var i = 0
    while (i < m) { buf(i) += arr.getDouble(i); i += 1 }
    buf
  }

  override def merge(b: Array[Double], o: Array[Double]): Array[Double] = {
    if (o.length == 0) return b
    if (b.length == 0) return o
    var i = 0
    while (i < b.length && i < o.length) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Double]): Any =
    if (b.length == 0) null else new GenericArrayData(b)

  override def serialize(b: Array[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.length)
    var i = 0
    while (i < b.length) { out.writeDouble(b(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new Array[Double](n)
    var i = 0
    while (i < n) { b(i) = in.readDouble(); i += 1 }
    b
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vector_sum"
  override def withNewMutableAggBufferOffset(o: Int): VectorSum = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSum = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): VectorSum = copy(child = c)
}

object VectorAgg {
  /** Aggregate column: element-wise sum of double-array `c`. */
  def vectorSum(c: Column): Column =
    ColumnBridge.column(
      VectorSum(ColumnBridge.expression(c)).toAggregateExpression())
}
