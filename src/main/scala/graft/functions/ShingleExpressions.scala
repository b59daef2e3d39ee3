package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenize → n-gram shingle → distinct kernel.
  *
  * The composable route — `array_distinct(transform(sequence(...), i ->
  * concat(ws[i], ' ', ws[i+1], ...)))` over `ws =
  * regexp_extract_all(lower(text), '[a-z0-9]+')` — has two structural
  * costs on Spark that only show up in real plans:
  *
  *  1. higher-order-function lambdas are evaluated interpreted, and
  *     when `ws` is inlined into the lambda (alias substitution during
  *     predicate pushdown has no cheapness check), the tokenizer regex
  *     re-runs for EVERY array element of every row;
  *  2. `InferFiltersFromGenerate` clones the whole shingle expression
  *     into a `size(...) > 0` filter that pushdown moves to the scan,
  *     so the interpreted monster runs once more per input row — on the
  *     scan side, before any repartitioning can spread it out.
  *
  * One codegen'd expression removes the class of problem: a single
  * scan of the lower-cased text builds maximal `[a-z0-9]+` token runs
  * and emits distinct space-joined n-grams (first-occurrence order) in
  * one pass. Wherever the optimizer copies it, each copy is one tight
  * per-row call, never a per-element regex.
  *
  * Token/lowercase semantics are byte-identical to
  * `regexp_extract_all(lower(text), '[a-z0-9]+', 0)`: same UTF8String
  * lowercasing, and a scan for maximal ASCII `[a-z0-9]` runs is exactly
  * that regex (multi-byte code points can't match the class).
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  require(n >= 1 && n <= 8, s"shingle width must be in [1,8], got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects a string column, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.shingles(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleKernel.shingles($c, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fixed-token-window chunking kernel: the document's token stream cut
  * into consecutive `chunkTokens`-token windows (last one partial),
  * each space-joined — the context-window packing primitive of a
  * training-data pipeline. Same fused single-pass design (and the same
  * tokenizer) as [[WordShingles]]; one codegen'd call per row.
  */
case class WordChunks(child: Expression, chunkTokens: Int)
    extends UnaryExpression {

  require(chunkTokens >= 1, s"chunk size must be positive, got $chunkTokens")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_chunks expects a string column, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.chunks(input.asInstanceOf[UTF8String], chunkTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleKernel.chunks($c, $chunkTokens);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused tokenize → per-document term-frequency kernel: one pass over
  * the text emits `array<struct<term, tf>>` (first-occurrence order).
  * Because a document's tokens all live in ONE row, tf is a per-row
  * computation — no (doc, term) shuffle — so downstream tf-idf only
  * shuffles the vocabulary-bounded document-frequency aggregate and
  * the per-doc ranking. Same tokenizer semantics as [[WordShingles]].
  */
case class WordTermFreqs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_term_freqs expects a string column, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.termFreqs(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleKernel.termFreqs($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleKernel {

  /** (term, tf) pairs of the token stream in first-occurrence order —
    * the per-row half of tf-idf. One tokenizer pass + one LinkedHashMap.
    */
  def termFreqs(text: UTF8String): GenericArrayData = {
    val toksArr = shingles(text, 1, distinct = false)
    val n = toksArr.numElements()
    val counts = new java.util.LinkedHashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val t = toksArr.getUTF8String(i).toString
      // unboxToLong(null) == 0, so absent keys read as 0
      counts.put(t, counts.get(t) + 1L)
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var o = 0
    while (it.hasNext) {
      val e = it.next()
      out(o) = org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(e.getKey), e.getValue)
      o += 1
    }
    new GenericArrayData(out)
  }

  /** Space-joined word n-grams of `text` in document order — distinct
    * first-occurrence set (`distinct = true`, the shingle shape) or the
    * full occurrence list (`distinct = false`, the frequency shape).
    * One pass: lowercase once, scan token runs, slide a window. Static
    * and allocation-lean so the codegen call site JITs well.
    */
  def shingles(text: UTF8String, n: Int, distinct: Boolean): GenericArrayData = {
    // identical to lower(text) in SQL (UTF8String.toLowerCase)
    val s = text.toLowerCase.toString
    val toks = new java.util.ArrayList[String](64)
    var i = 0
    val len = s.length
    while (i < len) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val start = i
        i += 1
        while (i < len && {
          val d = s.charAt(i); (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) i += 1
        toks.add(s.substring(start, i))
      } else i += 1
    }
    val m = toks.size - n + 1
    if (m <= 0) return new GenericArrayData(new Array[Any](0))
    val grams = new java.util.ArrayList[String](m)
    val seen = if (distinct) new java.util.HashSet[String](m * 2) else null
    val sb = new java.lang.StringBuilder(32)
    var k = 0
    while (k < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks.get(k + j))
        j += 1
      }
      val g = sb.toString
      if (seen == null || seen.add(g)) grams.add(g)
      k += 1
    }
    val out = new Array[Any](grams.size)
    var o = 0
    while (o < grams.size) { out(o) = UTF8String.fromString(grams.get(o)); o += 1 }
    new GenericArrayData(out)
  }

  /** Consecutive `c`-token windows of the token stream, space-joined;
    * the final window may be shorter. Shares the tokenizer semantics of
    * [[shingles]] exactly.
    */
  def chunks(text: UTF8String, c: Int): GenericArrayData = {
    val toksArr = shingles(text, 1, distinct = false)
    val nToks = toksArr.numElements()
    if (nToks == 0) return new GenericArrayData(new Array[Any](0))
    val nChunks = (nToks + c - 1) / c
    val out = new Array[Any](nChunks)
    val sb = new java.lang.StringBuilder(64)
    var k = 0
    while (k < nChunks) {
      sb.setLength(0)
      var j = k * c
      val end = math.min(j + c, nToks)
      while (j < end) {
        if (j > k * c) sb.append(' ')
        sb.append(toksArr.getUTF8String(j).toString)
        j += 1
      }
      out(k) = UTF8String.fromString(sb.toString)
      k += 1
    }
    new GenericArrayData(out)
  }
}
