package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY §2.11): rewrite the universal per-group top-k
  * SQL idiom
  *
  * {{{ ... WHERE row_number() OVER (PARTITION BY p ORDER BY o) <= k }}}
  *
  * into the [[TopKPerKeyPlan]] bounded-heap operator. Spark's own
  * `InferWindowGroupLimit` (3.5+) caps how many rows per key reach the
  * Window, but the full input is STILL range-exchanged and sorted per
  * partition on both sides; after this rewrite only the ≤ k×keys
  * surviving rows are exchanged, and the only sort left is the trivial
  * one numbering those survivors — O(n log k) heap comparisons replace
  * the O(n log n) sort of everything.
  *
  * The rewrite keeps the Window (so `rn` stays available to downstream
  * expressions, renumbered over exactly the surviving rows) and keeps
  * the Filter (a no-op after the rewrite, and a safety net if a heap
  * ever under-fills). A second pattern then removes BOTH when they are
  * provably dead: a Project straight above the Filter that never
  * references `rn` means nothing downstream can see the row numbers, so
  * the renumbering Window (and its per-key sort of the survivors) and
  * the no-op Filter are dropped — the typical `...filter(rn <= k)
  * .select(cols-without-rn)` query then runs as the bare heap operator
  * with zero Window overhead. It fires only for `row_number` — `rank`/
  * `dense_rank` admit >k survivors on ties, which a k-bounded heap
  * cannot represent. Like `row_number` itself, boundary ties under a
  * non-total `ORDER BY` are broken arbitrarily; with a total order the
  * rewrite is exactly equivalent.
  *
  * Registered via `injectOptimizerRule` ([[graft.GraftExtensions]]), so
  * it composes with predicate pushdown inside the operator-optimization
  * fixpoint and needs nothing from the user: any existing window-idiom
  * query on a Graft session silently gets the heap plan.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  /** k such that `cond` ≡ rn <= k, if `cond` is that shape. */
  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(v)) if a.semanticEquals(rn) => Some(v)
    case LessThan(a: Attribute, IntegerLiteral(v)) if a.semanticEquals(rn) => Some(v - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case GreaterThanOrEqual(IntegerLiteral(v), a: Attribute) if a.semanticEquals(rn) => Some(v)
    case GreaterThan(IntegerLiteral(v), a: Attribute) if a.semanticEquals(rn) => Some(v - 1)
    case _ => None
  }

  /** The single window expression `row_number() OVER (... ROWS BETWEEN
    * UNBOUNDED PRECEDING AND CURRENT ROW)` (row_number's only frame). */
  private object RowNumberExpr {
    def unapply(ne: NamedExpression): Option[Attribute] = ne match {
      case al @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(_, _,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _) =>
        Some(al.toAttribute)
      case _ => None
    }
  }

  /** Spark's InferWindowGroupLimit may already have inserted its partial
    * limit below the Window; the heap operator subsumes it. */
  private def stripGroupLimit(p: LogicalPlan): LogicalPlan = p match {
    case WindowGroupLimit(_, _, _, _, child) => child
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(Seq(RowNumberExpr(rn)), keys, order, wchild, _))
        if keys.nonEmpty && order.nonEmpty &&
          !stripGroupLimit(wchild).isInstanceOf[TopKPerKeyPlan] =>
      limitOf(cond, rn) match {
        case Some(k) if k > 0 =>
          f.copy(child = w.withNewChildren(
            Seq(TopKPerKeyPlan(keys, order, k, stripGroupLimit(wchild)))))
        case _ => f
      }

    // dead-rn elision (transformUp visits the Filter first, so by the
    // time the parent Project is reached the heap node is already in
    // place): the Project proves no downstream expression can reference
    // the row number, the heap already emits exactly the ≤ k survivors
    // the Filter would keep — drop both and run the bare heap operator
    case p @ Project(projList,
        Filter(cond, Window(Seq(RowNumberExpr(rn)), _, _, tk: TopKPerKeyPlan, _)))
        if limitOf(cond, rn).contains(tk.k) &&
          !projList.exists(_.references.contains(rn)) =>
      p.copy(child = tk)
  }
}
