package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Shared count-min-sketch geometry/hashing for the aggregate (build)
  * and the scalar query expression (probe). Row `d`'s hash is Murmur3
  * over the value bytes with a per-row seed — pairwise-independent
  * enough for the CMS bound, deterministic across JVMs/executors
  * (Murmur3 is content-defined, unlike `Object.hashCode`).
  */
private[functions] object Cms {
  def slot(value: UTF8String, d: Int, width: Int): Int = {
    val h = Murmur3_x86_32.hashUnsafeBytes(
      value.getBaseObject, value.getBaseOffset, value.numBytes,
      d * 0x9747b28c + 104729)
    math.floorMod(h, width)
  }
}

/** Count-min sketch over a string column as a native
  * `TypedImperativeAggregate` — the bounded-memory frequency sketch for
  * cardinalities where an exact `groupBy(key).count` no longer fits
  * (the heavy-hitter / frequency-bound primitive at 100 TB): the state
  * is a fixed depth×width counter matrix regardless of key cardinality,
  * updates are O(depth), and merge is element-wise addition — fully
  * map-side combinable, one tiny row per partition crosses the shuffle.
  *
  * Guarantees (standard CMS): estimate ≥ true count always;
  * estimate ≤ true count + (e/width)·N with probability 1−(1/e)^depth.
  * Emits the matrix as `array<bigint>` (row-major) for [[CmsQuery]].
  */
case class CmsSketch(child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && width >= 2, "cms_sketch needs depth >= 1, width >= 2")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_sketch expects a string column, got $other")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var d = 0
      while (d < depth) {
        buf(d * width + Cms.slot(s, d, width)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): CmsSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "cms_sketch"
}

/** Point query against a [[CmsSketch]] matrix: min over the depth rows
  * of the counter at the key's slot. Interpreted eval (CodegenFallback)
  * is fine here: probes run over key-cardinality-sized frames (the
  * distinct keys you ask about), never over the raw data.
  */
case class CmsQuery(sketch: Expression, key: Expression, depth: Int, width: Int)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(sketch, key)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (sketch.dataType, key.dataType) match {
      case (ArrayType(LongType, _), StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cms_query expects (array<bigint>, string), got $other")
    }

  override def eval(input: InternalRow): Any = {
    val sk = sketch.eval(input)
    val k = key.eval(input)
    if (sk == null || k == null) null
    else {
      val arr = sk.asInstanceOf[ArrayData]
      val s = k.asInstanceOf[UTF8String]
      var best = Long.MaxValue
      var d = 0
      while (d < depth) {
        val c = arr.getLong(d * width + Cms.slot(s, d, width))
        if (c < best) best = c
        d += 1
      }
      best
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sketch = newChildren(0), key = newChildren(1))
  override def prettyName: String = "cms_query"
}
