package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import graft.functions.TopKAgg

/** Optimizer rule: rewrite the classic top-n-per-group WINDOW plan
  *
  *   Project(p…, id, rn)
  *     Filter(rn <= k)
  *       Window(rn = row_number() OVER (PARTITION BY p… ORDER BY s DESC, id ASC))
  *
  * into the bounded-aggregate shape this engine serves ANN/ranking
  * from ([[graft.functions.TopKAgg]]):
  *
  *   Project(p…, id = tk.id, rn = pos + 1)
  *     Generate(posexplode(tk))
  *       Aggregate(p…, top_k_agg(s, id, k))
  *
  * The window shape shuffles and sorts EVERY row on the partition key;
  * the aggregate shape map-side combines so only ≤ k (score, id) pairs
  * per group per input partition cross the exchange and nothing sorts.
  * Same rewrite a builder does by hand (`Relational.w3TopNAgg` vs
  * `w3TopNPerGroup`) — here as a Catalyst `Rule[LogicalPlan]` so ANY
  * query in the pattern gets it, including pure-SQL ones.
  *
  * Scope guards (the rewrite only fires when it is provably
  * equivalent):
  *  - the ORDER BY is exactly (double-attr DESC [NULLS LAST],
  *    long-attr ASC) — TopKAgg's deterministic total order. NULLS
  *    FIRST descending (Spark's default for DESC) is accepted only
  *    when the score attribute is non-nullable, because TopKAgg ranks
  *    rows with both inputs non-null and drops null-input rows,
  *    whereas the window would rank score-nulls FIRST and push real
  *    rows out of the top k.
  *  - the filter is a bare `rn <= int-literal` (or `rn < lit`) on the
  *    row_number output, k ≥ 1;
  *  - every column the enclosing Project uses is a grouping key, the
  *    id, the score, or rn — anything else cannot survive an
  *    aggregate;
  *  - grouping keys are plain attributes.
  *
  * Opt-in via `spark.graft.rewriteTopK=true` (session conf): a plan
  * rewrite that changes physical shape should be a deliberate switch,
  * not ambient magic — and the engine's own windowed twins
  * (`w3_topn_per_group`) must keep demonstrating the window plan when
  * the flag is off.
  *
  * Null inputs: TopKAgg skips rows where score or id is null, while
  * the window ranks them (nulls last for the score under the guard
  * above; a null id sorts first among score ties). The rewrite
  * therefore assumes ranking keys are de-facto non-null — true of
  * every ranking in this engine and of any sane top-k — and the flag
  * is opt-in precisely so that assumption is the caller's explicit
  * call.
  *
  * Tie semantics: for rows DUPLICATED in (score, id) within a group,
  * `row_number` numbers the copies in partition-arrival order — an
  * already-nondeterministic result — while TopKAgg's set semantics
  * keeps one. The rewrite therefore changes results only where the
  * window's own output was not well-defined; with per-group-unique
  * (score, id) pairs (every ranking in this engine) the two plans are
  * row-identical.
  */
object TopKWindowRewrite extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.rewriteTopK"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "false").toBoolean) plan
    else plan.transformUp {
      case p @ Project(projList,
          f @ Filter(cond,
            w @ Window(Seq(rnAlias @ Alias(WindowExpression(
                _: RowNumber, WindowSpecDefinition(part, order, _)), _)),
              _, _, child, _))) =>
        rewriteOrKeep(p, projList, f, cond, rnAlias, part, order, child)
    }

  // (score, id) if the order spec is TopKAgg's total order, else None
  private def rankedAttrs(order: Seq[SortOrder],
      child: LogicalPlan): Option[(Attribute, Attribute)] = order match {
    case Seq(
        SortOrder(s: AttributeReference, Descending, sNulls, _),
        SortOrder(i: AttributeReference, Ascending, _, _))
      if s.dataType == DoubleType && i.dataType == LongType &&
        child.outputSet.contains(s) && child.outputSet.contains(i) &&
        // NullsFirst (Spark's DESC default) only safe when no nulls exist
        (sNulls == NullsLast || !s.nullable) =>
      Some((s, i))
    case _ => None
  }

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType))
        if a.exprId == rn.exprId && k >= 1 => Some(k)
      case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
        if a.exprId == rn.exprId && k >= 2 => Some(k - 1)
      case _ => None
    }

  private def rewriteOrKeep(keep: Project, projList: Seq[NamedExpression],
      f: Filter, cond: Expression, rnAlias: Alias, part: Seq[Expression],
      order: Seq[SortOrder], child: LogicalPlan): LogicalPlan = {
    val rnAttr = rnAlias.toAttribute
    val partAttrs = part.collect { case a: AttributeReference => a }
    if (partAttrs.size != part.size) return keep
    (rankedAttrs(order, child), limitOf(cond, rnAttr)) match {
      case (Some((score, id)), Some(k)) =>
        val allowed = AttributeSet(partAttrs ++ Seq(score, id, rnAttr))
        if (!projList.forall(_.references.subsetOf(allowed))) return keep

        // InferWindowGroupLimit (an earlier optimizer batch) may have
        // planted WindowGroupLimit(rank ≤ k) pruning below this very
        // window; the aggregate computes the same top-k without the
        // sort+exchange those nodes force, so strip the ones that
        // belong to THIS window spec (same partition, order, limit)
        val sameSpec = (p2: Seq[Expression], o2: Seq[SortOrder]) =>
          p2.size == part.size &&
            p2.zip(part).forall { case (a, b) => a.semanticEquals(b) } &&
            o2.size == order.size &&
            o2.zip(order).forall { case (a, b) => a.semanticEquals(b) }
        val pruned = child.transformUp {
          case wgl @ WindowGroupLimit(p2, o2, _: RowNumber, limit, c)
            if limit == k && sameSpec(p2, o2) => c
        }

        val tkAlias = Alias(AggregateExpression(
          TopKAgg(score, id, k),
          aggregate.Complete, isDistinct = false), "tk")()
        val agg = Aggregate(partAttrs, partAttrs :+ tkAlias, pruned)

        val posAttr = AttributeReference("pos", IntegerType, nullable = false)()
        val colAttr = AttributeReference("col",
          TopKAgg(score, id, k).dataType.asInstanceOf[
            org.apache.spark.sql.types.ArrayType].elementType,
          nullable = false)()
        val gen = Generate(PosExplode(tkAlias.toAttribute),
          unrequiredChildIndex = Seq(agg.output.size - 1), outer = false,
          qualifier = None, generatorOutput = Seq(posAttr, colAttr), agg)

        // rebuild each projected column on top of the generate output,
        // preserving names AND exprIds so parents above stay bound
        val rebuilt = projList.map { ne =>
          val swapped = ne.transform {
            case a: AttributeReference if a.exprId == score.exprId =>
              GetStructField(colAttr, 0, Some("score"))
            case a: AttributeReference if a.exprId == id.exprId =>
              GetStructField(colAttr, 1, Some("id"))
            case a: AttributeReference if a.exprId == rnAttr.exprId =>
              Add(posAttr, Literal(1))
          }
          swapped match {
            case keepNamed: NamedExpression
              if keepNamed.exprId == ne.exprId => keepNamed
            case other => Alias(other, ne.name)(exprId = ne.exprId)
          }
        }
        Project(rebuilt, gen)
      case _ => keep
    }
  }
}
