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
/** `sorted_intersect_count(a, b)` — |a ∩ b| as SETS for two SORTED
  * ascending arrays of an integral/date/timestamp element type, by a
  * single allocation-free merge inside whole-stage codegen.
  *
  * This replaces `size(array_intersect(a, b))` in the adjacency-array
  * hot paths (triangle/support/common-neighbor counting): ArrayIntersect
  * builds a fresh hash set over one side PER ROW — profiled as the
  * dominant CPU (and GC) of the kTruss support and link-prediction
  * stages at sf0.1 — while the producers already emit
  * `sort_array(collect_set(...))`, so a dup-skipping merge counts the
  * same distinct overlap with zero allocation and long comparisons
  * only. Count semantics match array_intersect's set semantics on any
  * sorted input (duplicates skipped on both sides). Array elements are
  * assumed non-null (collect_set never emits one).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = children.exists(_.nullable)

  private def elemType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case other => other
  }

  private def supported(t: DataType): Boolean = t match {
    case DateType | TimestampType | IntegerType | LongType | ShortType | ByteType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(a, _), ArrayType(b, _)) if supported(a) && a == b =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "sorted_intersect_count expects (array<T>, array<T>) with date/timestamp/integral T, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(aAny: Any, bAny: Any): Any = {
    val a = aAny.asInstanceOf[ArrayData]
    val b = bAny.asInstanceOf[ArrayData]
    def get(arr: ArrayData, i: Int): Long = elemType match {
      case TimestampType | LongType => arr.getLong(i)
      case DateType | IntegerType => arr.getInt(i).toLong
      case ShortType => arr.getShort(i).toLong
      case ByteType => arr.getByte(i).toLong
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = get(a, i)
      val y = get(b, j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        c += 1
        while (i < na && get(a, i) == x) i += 1
        while (j < nb && get(b, j) == x) j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val jt = CodeGenerator.javaType(elemType)
      val getAi = CodeGenerator.getValue(a, elemType, i)
      val getBj = CodeGenerator.getValue(b, elemType, j)
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0;
         |int $j = 0;
         |int $c = 0;
         |while ($i < $na && $j < $nb) {
         |  $jt $x = $getAi;
         |  $jt $y = $getBj;
         |  if ($x < $y) { $i++; }
         |  else if ($x > $y) { $j++; }
         |  else {
         |    $c++;
         |    while ($i < $na && $getAi == $x) { $i++; }
         |    while ($j < $nb && $getBj == $x) { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

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
