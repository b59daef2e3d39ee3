package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** `pair_explode(arr)` — one output row per ordered pair (arr[i],
  * arr[j]), i < j: the candidate-pair expansion of bucketed dedup
  * (each LSH/shingle bucket's doc list becomes its C(k,2) pairs).
  *
  * The composable alternative —
  * `explode(flatten(transform(sequence(...), i -> transform(slice(...),
  * ...))))` — materializes the bucket's ENTIRE pair array through
  * interpreted higher-order lambdas before the explode even starts:
  * O(k²) allocations plus a lambda dispatch per element. This
  * generator walks the index pair lazily and allocates only the row
  * being emitted, which is also the shape that survives an oversized
  * bucket (a pathological boilerplate shingle) without building its
  * square in memory.
  */
case class PairExplode(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case other => other
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("a", elemType), StructField("b", elemType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pair_explode expects an array, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) Iterator.empty
    else {
      val n = arr.numElements()
      val et = elemType
      new Iterator[InternalRow] {
        private var i = 0
        private var j = 1
        override def hasNext: Boolean = i < n - 1
        override def next(): InternalRow = {
          val row = InternalRow(arr.get(i, et), arr.get(j, et))
          j += 1
          if (j >= n) { i += 1; j = i + 1 }
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
