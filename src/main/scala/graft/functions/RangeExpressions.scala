package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `sorted_count_between(sortedArr, lo, hi)` — how many elements of a
  * SORTED ascending array fall in the closed interval `[lo, hi]`,
  * answered with two binary searches (lower bound of `lo`, upper bound
  * of `hi`) inside whole-stage codegen.
  *
  * This is the kernel of the broadcast range join: when the point set
  * of an interval-containment join is small and bounded (month starts,
  * calendar holidays, rate-change dates), the scalable plan is not a
  * join at all — broadcast the sorted point array once and count
  * matches per fact row in O(log n), a pure narrow map with no explode,
  * no shuffle, and no join. (Reference counterpart: the watchdog-style
  * interval scans in `query_poll_table.py`; the binned equi-join this
  * replaces was measured 5× slower than the oracle at sf0.1.)
  *
  * Supported element types are the fixed-width comparables that Spark
  * stores as primitives (date = int days, timestamp = long micros,
  * int/long/short/byte); `lo`/`hi` must match the element type. Array
  * elements are assumed non-null (build the array with
  * `sort_array(collect_list(...))`, which drops nulls).
  */
case class SortedCountBetween(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  private def elemType: DataType = first.dataType match {
    case ArrayType(et, _) => et
    case other => other
  }

  private def supported(t: DataType): Boolean = t match {
    case DateType | TimestampType | IntegerType | LongType | ShortType | ByteType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case ArrayType(et, _) if supported(et) &&
        second.dataType == et && third.dataType == et =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "sorted_count_between expects (array<T>, T, T) with date/timestamp/integral T, got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, ${third.dataType.simpleString})")
  }

  override def nullSafeEval(arrAny: Any, loAny: Any, hiAny: Any): Any = {
    val arr = arrAny.asInstanceOf[ArrayData]
    val n = arr.numElements()
    def get(i: Int): Long = elemType match {
      case TimestampType | LongType => arr.getLong(i)
      case DateType | IntegerType => arr.getInt(i).toLong
      case ShortType => arr.getShort(i).toLong
      case ByteType => arr.getByte(i).toLong
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    def asLong(v: Any): Long = v match {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    val lo = asLong(loAny)
    val hi = asLong(hiAny)
    var l = 0
    var h = n
    while (l < h) { val m = (l + h) >>> 1; if (get(m) < lo) l = m + 1 else h = m }
    val lb = l
    h = n
    while (l < h) { val m = (l + h) >>> 1; if (get(m) <= hi) l = m + 1 else h = m }
    (l - lb).toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, lo, hi) => {
      val n = ctx.freshName("n")
      val l = ctx.freshName("l")
      val h = ctx.freshName("h")
      val m = ctx.freshName("m")
      val lb = ctx.freshName("lb")
      val getM = CodeGenerator.getValue(arr, elemType, m)
      s"""
         |int $n = $arr.numElements();
         |int $l = 0;
         |int $h = $n;
         |while ($l < $h) { int $m = ($l + $h) >>> 1; if ($getM < $lo) $l = $m + 1; else $h = $m; }
         |int $lb = $l;
         |$h = $n;
         |while ($l < $h) { int $m = ($l + $h) >>> 1; if ($getM <= $hi) $l = $m + 1; else $h = $m; }
         |${ev.value} = (long) ($l - $lb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
