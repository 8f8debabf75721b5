package graft

/** Physical-plan regression guards: the properties that make these
  * queries scale (pushdown, pruning, broadcast direction, top-k via
  * TakeOrderedAndProject) must survive future edits. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf())
    df.queryExecution.executedPlan.toString()
  }

  test("q01: segment filter is pushed to the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      p.contains("LessThanOrEqual(l_shipdate"), p.take(2000))
  }

  test("q02: the dim side is broadcast, not the fact table") {
    val df = SparkEntry.queries("q02_top_revenue_orders")(spark, sf())
    // sparkPlan = physical plan before AQE wrapping / exchange insertion:
    // broadcast intent shows as BroadcastHashJoinExec build sides
    import org.apache.spark.sql.catalyst.optimizer.BuildLeft
    val exec = df.queryExecution.sparkPlan
    val joins = exec.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(joins.nonEmpty, exec.toString.take(500))
    // the SF-growing tables must stream: neither lineitem NOR orders may
    // ever sit on a broadcast build side (a build side that merely
    // *contains* a fact table inverts into a broadcast OOM at scale)
    val buildSides = joins.map(j =>
      (if (j.buildSide == BuildLeft) j.left else j.right).toString)
    assert(!buildSides.exists(s =>
      s.contains("lineitem.parquet") || s.contains("orders.parquet")),
      buildSides.map(_.take(300)).mkString("\n"))
  }

  test("q44: conflict candidates come from an equi-join, never a cartesian") {
    val df = SparkEntry.queries("q44_conflicts")(spark, sf())
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
  }

  test("q49: LSH near-dup joins on the bucket key, never a nested loop") {
    val df = SparkEntry.queries("q49_near_dup_lsh")(spark, sf())
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
  }

  test("q46: indexed BM25 prunes postings partitions by term bucket") {
    val df = SparkEntry.queries("q46_bm25_indexed")(spark, sf())
    val p = df.queryExecution.executedPlan.toString()
    // the term_bucket partition filter must reach the postings scan
    assert(p.contains("term_bucket"), p.take(2000))
  }

  test("q52: per-key top-k plans through the custom heap operator, no Window") {
    val df = SparkEntry.queries("q52_topk_per_key")(spark, sf())
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("TopKPerKey"), p.take(1500))
    assert(!p.contains("Window"), p.take(1500))
  }

  test("q55: the window idiom is rewritten into the heap operator") {
    val df = SparkEntry.queries("q55_topk_window_rewrite")(spark, sf())
    // AQE wraps the real plan; collect() doesn't descend into the wrapper
    val exec = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case p => p
    }
    val heaps = exec.collect { case t: graft.plans.TopKPerKeyExec => t }
    assert(heaps.nonEmpty, exec.toString.take(1500))
    // below the partial heap: the raw scan — never a sort, window or
    // exchange (the full input is neither sorted nor shuffled)
    val partial = heaps.last // deepest = partial side
    val below = partial.child.collect {
      case s: org.apache.spark.sql.execution.SortExec => s
      case w: org.apache.spark.sql.execution.window.WindowExec => w
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(below.isEmpty, exec.toString.take(1500))
    // the surviving Window (renumbering ≤ 3×keys rows) sits ABOVE the
    // final heap — the only sort left is over survivors
    assert(exec.toString.contains("Window"), "rn must still be produced")
  }

  test("q20: top-k runs as TakeOrderedAndProject with pruned columns") {
    val p = plan("q20_knn_cosine")
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
    assert(p.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"),
      "label column must be pruned from the scan")
  }

  test("q12: tenant filter reaches the events scan") {
    val p = plan("q12_user_events")
    assert(p.contains("EqualTo(user_id,3)"), p.take(2000))
  }

  test("facade query prunes to the tenant's user bucket partitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("plan").toString
    val engine = new graft.pipeline.MemFuse(spark, dir)
    engine.ingest(Seq(graft.pipeline.Schemas.Message(
      "m1", "s1", "u1", "r1", 1, "user", "hello world",
      java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))).toDF())
    val p = engine.m1.filter(org.apache.spark.sql.functions.col("user_id") === "u1")
      .queryExecution.executedPlan.toString()
    // partition column present in the scan's partition filters
    assert(p.contains("user_bucket"), p.take(2000))
  }
}
