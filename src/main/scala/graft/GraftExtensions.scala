package graft

import graft.functions.{DotProduct, NGramDistinct}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral}

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions for SQL use, so
  * `spark.sql("SELECT dot_product(a, b) ...")` runs the same codegen'd
  * kernel as the DataFrame API.
  *
  * Wire up with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension: per-key top-k as bounded heaps instead
    // of a windowed full sort (graft.plans.TopKPerKey)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    // optimizer rewrite: `row_number() OVER (...) <= k` filters route
    // into the heap operator automatically (graft.plans.WindowTopKRewrite)
    ext.injectOptimizerRule(_ => graft.plans.WindowTopKRewrite)
    // optimizer rewrite: pure band joins (point BETWEEN lo AND hi, no
    // equi key) become bin-bucketed equi-joins instead of a nested-loop
    // cross product — gated on spark.graft.rangeJoin.binWidth
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[DotProduct].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions._
        val (a, b) = (children(0), children(1))
        val denom = Multiply(
          Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b)))
        CaseWhen(
          Seq((EqualTo(denom, Literal(0d)), Literal(0d))),
          Some(Divide(DotProduct(a, b), denom)))
      }))
    // ngrams_distinct(tokens, n): distinct space-joined word n-grams in
    // one compiled loop (the gram kernel behind the dedup operators)
    ext.injectFunction((
      new FunctionIdentifier("ngrams_distinct"),
      new ExpressionInfo(classOf[NGramDistinct].getName, "ngrams_distinct"),
      (children: Seq[Expression]) => children match {
        case Seq(toks, IntegerLiteral(n)) => NGramDistinct(toks, n)
        case _ => throw new IllegalArgumentException(
          "ngrams_distinct(tokens, n) expects exactly two arguments with " +
            s"n an integer literal; got ${children.length} argument(s): " +
            children.map(_.sql).mkString(", "))
      }))
  }
}
