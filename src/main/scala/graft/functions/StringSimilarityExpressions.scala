package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static Jaro / Jaro-Winkler kernel — the generated code calls
  * straight into it, one virtual-free static call per row pair.
  *
  * Semantics are pinned to the oracle engine's `jaro_winkler_similarity`
  * (probed empirically, all cases spec'd in StringSimSpec):
  *   - operates on RAW UTF-8 BYTES, not codepoints ('éa' vs 'ea' → 0.0
  *     because the 2-byte é shifts every window) — which also makes the
  *     kernel allocation-free on the string content;
  *   - match window = max(0, max(len_a, len_b)/2 - 1) (integer floor;
  *     'ab' vs 'ba' → 0.0 because the window is 0);
  *   - either side empty → 0.0 (including BOTH empty — not 1.0);
  *   - transpositions = floor(mismatched_matches / 2) ('XYZpqr' vs
  *     'YZXpqr' → 0.9444…, the 3-cycle's 3 mismatches floor to 1);
  *   - Winkler boost only when jaro > 0.7, prefix capped at 4 bytes,
  *     scale 0.1: jw = j + prefix·0.1·(1 − j).
  */
object StringSimKernel {

  def jaro(a: UTF8String, b: UTF8String): Double = {
    val la = a.numBytes
    val lb = b.numBytes
    if (la == 0 || lb == 0) return 0.0
    if (a.equals(b)) return 1.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (!found && j <= hi) {
        if (!mb(j) && a.getByte(i) == b.getByte(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mismatch = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.getByte(i) != b.getByte(k)) mismatch += 1
        k += 1
      }
      i += 1
    }
    val t = mismatch / 2
    val md = m.toDouble
    (md / la + md / lb + (md - t) / md) / 3.0
  }

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    val cap = math.min(4, math.min(a.numBytes, b.numBytes))
    var p = 0
    while (p < cap && a.getByte(p) == b.getByte(p)) p += 1
    j + p * 0.1 * (1.0 - j)
  }
}

/** Jaro-Winkler similarity as a codegen'd Catalyst expression — the
  * classic entity-resolution verifier for short identifying strings
  * (names, titles, heads), complementing Spark's built-in
  * `levenshtein`: edit distance penalizes ALL edits equally, while
  * Jaro-Winkler discounts transpositions and rewards shared prefixes —
  * the error shapes of human-entered near-duplicates. Spark ships no
  * Jaro function; a Scala UDF would serialize per row and fall out of
  * whole-stage codegen exactly on the blocked self-join hot path where
  * millions of in-block pairs are scored.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects two string columns, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimKernel.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSimKernel.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "jaro_winkler"
}
