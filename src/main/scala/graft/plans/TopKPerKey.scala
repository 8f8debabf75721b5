package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension (SURVEY §2.11): top-k rows PER KEY as a
  * first-class plan node.
  *
  * The DataFrame idiom for per-group top-k — `row_number() OVER
  * (PARTITION BY key ORDER BY s) <= k` — plans as Sort → WindowGroupLimit
  * → Window: Spark's built-in `InferWindowGroupLimit` (3.5+) caps how
  * many rows per key flow into the Window, but the per-partition SORT of
  * every input row still runs on both sides of the exchange. This
  * operator is the per-key analogue of `TakeOrderedAndProject`: a
  * bounded heap per key on the map side (partial), one shuffle clustered
  * by key, bounded heaps again on the reduce side (final). No sort ever
  * happens — O(n log k) comparisons instead of O(n log n) per partition —
  * and memory is O(keys-per-partition × k).
  *
  * Registered through `SparkSessionExtensions.injectPlannerStrategy`
  * ([[graft.GraftExtensions]]) — the logical node is planned by
  * [[TopKPerKeyStrategy]] into the two-phase exec, and
  * `EnsureRequirements` inserts the hash exchange demanded by the final
  * phase's `ClusteredDistribution`.
  */
case class TopKPerKeyPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Bounded per-key heap over the child's rows. `partial = true` runs
  * map-side before the exchange (a combiner: at most keys×k rows leave
  * each input partition); `partial = false` requires co-location by key
  * and emits the exact per-key top-k. */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions({ iter =>
      val keyGen = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(sortOrder, childOutput)
      // max-heap under ord: head is the WORST of the kept k, evicted
      // when a better row arrives — TakeOrderedAndProject's heap, per key
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val heap = heaps.getOrElseUpdate(
          keyGen(row).copy(),
          scala.collection.mutable.PriorityQueue.empty[InternalRow](ord))
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ord.lt(row, heap.head)) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Plans [[TopKPerKeyPlan]] as final-over-partial heap execs. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  /** Per-key top-k of `df` under `orderBy` (Columns, `.desc`/`.asc`
    * respected; a bare column sorts ascending). Requires a session built
    * with [[graft.GraftExtensions]]. Output order within/across keys is
    * unspecified — add an `orderBy` downstream for presentation.
    *
    * Implementation note: Spark 4 Columns carry a lazy ColumnNode AST
    * that only the analyzer converts to (serializable) catalyst
    * expressions — so the sort columns are resolved by analyzing a
    * throwaway `sortWithinPartitions` and harvesting its `SortOrder`s. */
  def apply(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val analyzedSort = df.sortWithinPartitions(orderBy: _*)
      .queryExecution.analyzed
    val (resolvedOrder, child) = analyzedSort match {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => (s.order, s.child)
      case other => throw new IllegalStateException(
        s"expected a Sort node from sortWithinPartitions, got ${other.nodeName}")
    }
    val resolver = df.sparkSession.sessionState.analyzer.resolver
    val keyAttrs = keyCols.map { c =>
      child.output.find(a => resolver(a.name, c)).getOrElse(
        throw new IllegalArgumentException(
          s"no column '$c' in ${child.output.map(_.name).mkString(", ")}"))
    }
    GraftSql.dataFrameOf(df.sparkSession,
      TopKPerKeyPlan(keyAttrs, resolvedOrder, k, child))
  }
}
