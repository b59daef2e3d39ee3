package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Whole-matrix feature covariance in ONE narrow pass — a native
  * `TypedImperativeAggregate` whose state is the full d(d+1)/2
  * sum-of-products grid plus the d per-dimension sums and the row
  * count (the [[CmsSketch]] fixed-size-mergeable-state pattern): each
  * input vector updates the grid in-place (the d²·N multiply work is
  * the irreducible FLOP count of covariance itself), partial grids
  * merge element-wise, and exactly ONE grid per partition crosses the
  * single exchange. This replaces the posexplode-d²-rows-per-vector
  * formulation, whose d²·N-row shuffle-side stream was pure constant-
  * factor overhead over the same arithmetic.
  *
  * Cross-engine exactness (the contract the SQL formulation had):
  * inputs are quantized to the integer grid `floor(x·10⁶)` (IEEE-
  * identical everywhere), and every accumulation is EXACT 128-bit
  * integer arithmetic — products via `Math.multiplyHigh` + low-word
  * multiply, sums via carry-propagated (hi, lo) pairs — so the state
  * is order-free and partial-merge safe with no overflow cliff (a
  * plain long sum of 10¹²-scale products overflows past ~10⁷ rows;
  * 128 bits absorb 10¹⁸ rows of any realistic embedding). The only
  * float work is the fixed per-cell finalization in `eval`, which
  * reproduces Spark/DuckDB `round(x, 9)` via HALF_UP BigDecimal.
  *
  * Emits `array<struct<i,j,cov>>` (upper triangle, row-major) from the
  * final single-row aggregate; the caller explodes it — a d²-element
  * driver-side-free expansion, not a data-scale one.
  */
case class CovGrid(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("cov", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cov_grid expects array<float|double>, got $other")
  }

  // Buffer layout (all longs): [0]=d (0 until first row — the empty
  // sentinel is the 1-element array), [1]=n, then d (hi,lo) 128-bit
  // per-dim sums, then d(d+1)/2 (hi,lo) 128-bit cell sums (upper
  // triangle, row-major). d is bound by the FIRST vector seen; a
  // ragged corpus fails loudly rather than folding mismatched dims.
  override def createAggregationBuffer(): Array[Long] = new Array[Long](1)

  /** (hi, lo) += (dHi, dLo), 128-bit signed with carry out of the
    * unsigned low word.
    */
  @inline private def add128(buf: Array[Long], idx: Int, dHi: Long, dLo: Long): Unit = {
    val s = buf(idx + 1) + dLo
    val carry = if (java.lang.Long.compareUnsigned(s, dLo) < 0) 1L else 0L
    buf(idx + 1) = s
    buf(idx) += dHi + carry
  }

  override def update(buf0: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf0
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    var buf = buf0
    if (buf.length == 1) {
      buf = new Array[Long](2 + d * 2 + d * (d + 1))
      buf(0) = d
    }
    require(buf(0) == d,
      s"cov_grid: ragged embedding dims (${buf(0)} then $d)")
    val q = new Array[Long](d)
    var i = 0
    while (i < d) {
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      q(i) = math.floor(x * 1000000.0).toLong
      i += 1
    }
    buf(1) += 1L
    var off = 2
    i = 0
    while (i < d) {
      add128(buf, off, q(i) >> 63, q(i))
      off += 2
      i += 1
    }
    i = 0
    while (i < d) {
      val qi = q(i)
      var j = i
      while (j < d) {
        add128(buf, off, Math.multiplyHigh(qi, q(j)), qi * q(j))
        off += 2
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b.length == 1) return a
    if (a.length == 1) return b
    require(a(0) == b(0),
      s"cov_grid: ragged embedding dims (${a(0)} vs ${b(0)})")
    a(1) += b(1)
    var k = 2
    while (k < a.length) {
      add128(a, k, b(k), b(k + 1))
      k += 2
    }
    a
  }

  private val Mask64 = (BigInt(1) << 64) - 1

  override def eval(buf: Array[Long]): Any = {
    if (buf.length == 1) return new GenericArrayData(Array.empty[Any])
    val d = buf(0).toInt
    val n = buf(1)
    def big(idx: Int): BigInt = (BigInt(buf(idx)) << 64) + (BigInt(buf(idx + 1)) & Mask64)
    val dimSum = Array.tabulate(d)(i => big(2 + 2 * i))
    val nB = BigInt(n)
    val nD = n.toDouble
    val out = new Array[Any](d * (d + 1) / 2)
    var off = 2 + 2 * d
    var k = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val diff = nB * big(off) - dimSum(i) * dimSum(j)
        // replicate round(CAST(diff AS DOUBLE) / n² / 1e12, 9) exactly:
        // one exact-integer→double conversion, two IEEE divisions,
        // HALF_UP decimal rounding (Spark Round / DuckDB round)
        val x = diff.doubleValue / (nD * nD) / 1.0e12
        val cov = java.math.BigDecimal.valueOf(x)
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
        out(k) = InternalRow(i.toLong, j.toLong, cov)
        off += 2
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): CovGrid =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CovGrid =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "cov_grid"
}
