package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Optimizer rule (SURVEY §2.11): rewrite a pure interval/range join —
  * an inner join whose ONLY link between the sides is a band predicate
  *
  * {{{ point >= lo AND point < hi        -- any >=/>, </<= mix }}}
  *
  * with `point` from one side and `lo`/`hi` from the other — into the
  * bin-bucketed equi-join [[graft.operators.Joins.rangeJoin]] builds by
  * hand. Without an equi key Spark has no hash/sort strategy and plans
  * BroadcastNestedLoopJoin: O(|L|·|R|) comparisons, the plan that
  * simply never finishes at 100 TB. After the rewrite both sides gain a
  * `floor(x / W)` bin column (the interval side exploding to its ≤
  * len/W + 1 covering bins), the join becomes a shuffled equi-join on
  * the bin, and the original band predicate stays as the exact filter —
  * identical results, shuffle volume |points| + ~(len/W + 1)·|intervals|.
  *
  * Like the public engines' range-join optimizations (Databricks'
  * RANGE_JOIN hint — the user supplies the bin width there too), the
  * rewrite is gated on an explicit width: set
  * `spark.graft.rangeJoin.binWidth` to a positive long in the units of
  * the band columns (epoch-µs timestamps here; pick ≥ the typical
  * interval length so intervals replicate ~2×). Unset/0 disables.
  *
  * Fires only when no equi-join conjunct exists (with one, Spark
  * already has a hash join and the band is a cheap post-filter), only
  * for integral band columns (bin math in exact long floor-division,
  * correct for negative epochs where `div` truncation is not), and
  * never re-fires on its own output (the rewritten join HAS an equi
  * conjunct). Joins with lo > hi rows are pre-filtered — an inner band
  * join can never match them, and it keeps the generated bin sequences
  * ascending. */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val WidthConf = "spark.graft.rangeJoin.binWidth"

  /** Exact floor(x / w) on longs: x − pmod(x, w) is divisible, so the
    * truncating IntegralDivide equals floor division. */
  private def floorDiv(x: Expression, w: Long): Expression =
    IntegralDivide(Subtract(Cast(x, LongType), Pmod(Cast(x, LongType),
      Literal(w))), Literal(w))

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def sideOf(e: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[Boolean] =
    if (e.references.isEmpty) None
    else if (e.references.subsetOf(left.outputSet)) Some(true)
    else if (e.references.subsetOf(right.outputSet)) Some(false)
    else None

  /** (point, lo, hi, upperInclusive, pointOnLeft) if the conjuncts form
    * a band join between the two sides and nothing else links them. */
  private def extractBand(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean, Boolean)] = {
    // any conjunct referencing both sides must be part of the band —
    // an equi conjunct means Spark already has a hash join
    val cross = conjuncts.filter(c =>
      c.references.intersect(left.outputSet).nonEmpty &&
        c.references.intersect(right.outputSet).nonEmpty)
    if (cross.exists { case _: EqualTo | _: EqualNullSafe => true; case _ => false })
      return None
    // normalize every cross-side comparison to (small, large, strict)
    val ordered = cross.flatMap {
      case LessThan(a, b) => Some((a, b, true))
      case LessThanOrEqual(a, b) => Some((a, b, false))
      case GreaterThan(a, b) => Some((b, a, true))
      case GreaterThanOrEqual(a, b) => Some((b, a, false))
      case _ => None
    }
    if (ordered.size != cross.size || cross.size != 2) return None
    // one conjunct bounds the point from below (lo ≤/< pt), the other
    // from above (pt </≤ hi); the point expr must match semantically
    val pairs = for {
      (lo, pt1, _) <- ordered
      (pt2, hi, hiStrict) <- ordered
      if !(lo eq pt2) || !(pt1 eq hi) // not the same conjunct twice
      if pt1.semanticEquals(pt2)
      ptSide <- sideOf(pt1, left, right)
      loSide <- sideOf(lo, left, right)
      hiSide <- sideOf(hi, left, right)
      if loSide == hiSide && loSide != ptSide
      if Seq(pt1, lo, hi).forall(e => integral(e.dataType))
      if pt1.deterministic && lo.deterministic && hi.deterministic
    } yield (pt1, lo, hi, !hiStrict, ptSide)
    pairs.headOption
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthConf, "0").toLong
    if (width <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && !j.isStreaming =>
        extractBand(splitConjunctivePredicates(cond), left, right) match {
          case Some((pt, lo, hi, upperIncl, ptOnLeft)) =>
            val (ptPlan, ivPlan) = if (ptOnLeft) (left, right) else (right, left)
            // point side: its single covering bin
            val pAlias = Alias(floorDiv(pt, width), "_graft_pbin")()
            val pBin = pAlias.toAttribute
            val ptSide = Project(ptPlan.output :+ pAlias, ptPlan)
            // interval side: drop never-matching rows, explode to the
            // covering bins [floor(lo/W) .. floor((hi-1|hi)/W)]
            val lastIn = if (upperIncl) hi else Subtract(hi, Literal(1L))
            val iBin = AttributeReference("_graft_ibin", LongType,
              nullable = false)()
            val seq = Sequence(floorDiv(lo, width), floorDiv(lastIn, width),
              Some(Literal(1L)), Some(conf.sessionLocalTimeZone))
            val ivSide = Generate(Explode(seq), unrequiredChildIndex = Nil,
              outer = false, qualifier = None, generatorOutput = Seq(iBin),
              Filter(LessThanOrEqual(lo, hi), ivPlan))
            val (nl, nr) = if (ptOnLeft) (ptSide, ivSide) else (ivSide, ptSide)
            // bins equi-join; the original band stays as the exact filter
            val rewritten = Join(nl, nr, Inner,
              Some(And(EqualTo(pBin, iBin), cond)), hint)
            Project(j.output, rewritten)
          case None => j
        }
    }
  }
}
