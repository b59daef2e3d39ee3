package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters state: at most `k` (item, weight)
  * counters. The classic frequency-estimation summary with the
  * MERGEABLE bound (Agarwal et al., "Mergeable Summaries", PODS'12):
  * after any sequence of inserts and arbitrary-order merges totalling
  * n items, every item with true frequency > n/(k+1) still holds a
  * counter. That one-sided guarantee is what makes the TWO-PASS
  * heavy-hitters pipeline exact: pass 1 produces a ≤k-item candidate
  * superset in O(k) memory per partition, pass 2 recounts ONLY the
  * candidates exactly and filters on the true threshold — no false
  * positives (exact recount) and no false negatives (the bound).
  */
final class MGState(val k: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def insert(item: String): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1)
      case None if counts.size < k => counts.update(item, 1L)
      case None =>
        // full and unseen: decrement every counter, drop zeros — the
        // textbook O(k) step, amortized O(1) per distinct evicted unit
        val dead = mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace((_, c) => c - 1)
        counts.foreach { case (key, c) => if (c <= 0) dead += key }
        dead.foreach(counts.remove)
    }
  }

  /** Merge-side combine: sum counters, then restore the ≤k bound by
    * subtracting the (k+1)-th largest weight from every counter and
    * dropping non-positives — the mergeable-summaries reduction that
    * preserves the n/(k+1) retention guarantee under any merge tree.
    */
  def mergeFrom(other: MGState): Unit = {
    other.counts.foreach { case (key, c) =>
      counts.update(key, counts.getOrElse(key, 0L) + c)
    }
    if (counts.size > k) {
      val weights = counts.values.toArray
      java.util.Arrays.sort(weights)
      val cut = weights(weights.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace((_, c) => c - cut)
      counts.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(counts.remove)
    }
  }
}

/** `mg_candidates(item, k)` — bounded-memory heavy-hitter CANDIDATES
  * over a string column: an array of ≤k items guaranteed to contain
  * every item occurring more than n/(k+1) times, in O(k) state per
  * partition with map-side combining. At 100 TB this replaces the
  * "group by every distinct item" full-cardinality exchange with a
  * k-counter sketch per partition; the caller's exact-recount second
  * pass (see `Relational.a13HeavyHitters`) shuffles only candidate
  * rows. Output is sorted lexicographically — the candidate SET can
  * legitimately vary with partitioning (only its superset property is
  * guaranteed), so downstream results must depend on it solely
  * through the exact recount.
  */
case class MGCandidates(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGState] {

  require(k >= 1, "mg_candidates needs k >= 1")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mg_candidates expects a string item column, got $other")
  }

  override def createAggregationBuffer(): MGState = new MGState(k)

  override def update(buf: MGState, input: InternalRow): MGState = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: MGState, b: MGState): MGState = { a.mergeFrom(b); a }

  override def eval(buf: MGState): Any = {
    val items = buf.counts.keysIterator.toArray
    java.util.Arrays.sort(items, implicitly[Ordering[String]])
    new GenericArrayData(items.map(UTF8String.fromString(_).asInstanceOf[Any]))
  }

  override def serialize(buf: MGState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (key, c) => out.writeUTF(key); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val st = new MGState(k)
    var i = 0
    while (i < n) { val key = in.readUTF(); st.counts.update(key, in.readLong()); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): MGCandidates =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MGCandidates =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "mg_candidates"
}
