package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, FloatType}

import graft.functions.CovGrid

/** Property check of the 128-bit covariance grid against a direct
  * BigInt reference: for arbitrary vectors, partition splits and merge
  * orders (plus a serialize/deserialize round trip), the accumulator
  * must equal exact integer arithmetic bit-for-bit — including value
  * ranges where a plain 64-bit product sum has long since overflowed.
  * Pure-JVM: exercises the aggregate object directly, no session.
  */
class CovGridPropertySpec extends AnyFunSuite {

  private def reference(rows: List[Array[Float]]): Seq[(Long, Long, Double)] = {
    if (rows.isEmpty) return Seq.empty
    val d = rows.head.length
    val q = rows.map(_.map(x => math.floor(x.toDouble * 1000000.0).toLong))
    val n = q.size
    val si = Array.tabulate(d)(i => q.map(v => BigInt(v(i))).sum)
    val out = Seq.newBuilder[(Long, Long, Double)]
    for (i <- 0 until d; j <- i until d) {
      val spq = q.map(v => BigInt(v(i)) * BigInt(v(j))).sum
      val diff = BigInt(n) * spq - si(i) * si(j)
      val x = diff.doubleValue / (n.toDouble * n.toDouble) / 1.0e12
      out += ((i.toLong, j.toLong, java.math.BigDecimal.valueOf(x)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()))
    }
    out.result()
  }

  private def viaAggregate(parts: List[List[Array[Float]]]): Seq[(Long, Long, Double)] = {
    val agg = CovGrid(BoundReference(0, ArrayType(FloatType, containsNull = false),
      nullable = true))
    val partials = parts.map { rows =>
      var buf = agg.createAggregationBuffer()
      rows.foreach { v =>
        buf = agg.update(buf, InternalRow(ArrayData.toArrayData(v)))
      }
      // serialize/deserialize round trip: what the exchange does
      agg.deserialize(agg.serialize(buf))
    }
    val merged = partials.foldLeft(agg.createAggregationBuffer())(agg.merge)
    agg.eval(merged).asInstanceOf[GenericArrayData].array.toSeq.map { r =>
      val row = r.asInstanceOf[InternalRow]
      (row.getLong(0), row.getLong(1), row.getDouble(2))
    }
  }

  test("cov_grid equals the BigInt reference under splits, merges and overflow") {
    // |x| up to 4000 -> quantized 4e9, squared products 1.6e19 — past
    // Long.MaxValue from the second row on
    val vecGen = for {
      d <- Gen.chooseNum(1, 6)
      n <- Gen.chooseNum(1, 12)
      rows <- Gen.listOfN(n, Gen.listOfN(d,
        Gen.chooseNum(-4000.0f, 4000.0f)).map(_.toArray))
    } yield rows
    val prop = Prop.forAll(vecGen, Gen.chooseNum(1, 4)) {
      (rows: List[Array[Float]], nParts: Int) =>
        val parts = rows.zipWithIndex
          .groupBy(_._2 % nParts).toList.sortBy(_._1)
          .map(_._2.map(_._1))
        viaAggregate(parts) == reference(rows)
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }
}
