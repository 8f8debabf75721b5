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

  test("q136: six-table Q5 plan broadcasts every dim, no cartesian") {
    val p = plan("q136_tpch_q5")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q127: prefix-filter candidates and verify are equi-joins, never a nested loop") {
    val p = plan("q127_prefix_filter_jaccard")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
  }

  test("q328: frontier cuts ride the bounded heap, not corpus-sized rank windows") {
    // the per-combo candidate cut and the exact top-10 must plan
    // through TopKPerKeyExec (per-partition heaps): a row_number window
    // partitioned only by (qid, combo) would sort corpus-sized
    // partitions with parallelism capped at |qids|·|combos|
    val df = SparkEntry.queries("q328_ann_autotune_recall")(spark, sf())
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("TopKPerKey"), p.take(3000))
  }

  test("q326: the corpus shingle index streams map-side; no corpus-keyed exchange") {
    // the membership pass must broadcast the BATCH key set against the
    // index and the final position filter must broadcast the hit set —
    // a SortMergeJoin here would mean the corpus-sized index gets
    // shuffled+sorted per ingest batch, the exact anti-pattern the
    // persisted index exists to remove
    val p = plan("q326_incremental_spans_indexed")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(3000))
  }

  test("q125: the winsorize bounds sit on a broadcast build side") {
    val p = plan("q125_winsorized_stats")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q153: bucketed tables join with NO shuffle; only the agg exchanges") {
    val df = SparkEntry.queries("q153_bucketed_join")(spark, sf())
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("SortMergeJoin"), p.take(2000))
    // count shuffle exchanges in the rendered plan (AQE hides the tree
    // from collect until execution; "Exchange ...partitioning" is the
    // shuffle node's rendering, BroadcastExchange is excluded): the agg
    // and the final ORDER BY shuffle — the JOIN sides must not
    val shuffles = "(?<!Broadcast)Exchange".r.findAllIn(p).length
    assert(shuffles == 2, s"bucketed co-location: only the aggregation and " +
      s"the output sort may shuffle, found $shuffles\n${p.take(3000)}")
    assert("Bucketed: true".r.findAllIn(p).length == 2,
      s"both scans must report the bucketed layout\n${p.take(3000)}")
  }

  test("q146: the lang filter is a partition filter, not a row filter") {
    val p = plan("q146_lang_partitioned_scan")
    assert(p.contains("PartitionFilters") && p.contains("= en"), p.take(2000))
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

  /** True iff `p` is a BARE corpus scan — only Project/Filter above a
    * documents.parquet file scan, no aggregate/limit/join that would
    * shrink it. A bare corpus scan on a broadcast build side is the
    * inversion that OOMs at 100× (the planner happily does it at toy SF
    * where the whole corpus is a few MB). */
  private def bareDocScan(p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.execution._
    p match {
      case s: FileSourceScanExec => s.toString.contains("documents.parquet")
      case pr: ProjectExec       => bareDocScan(pr.child)
      case f: FilterExec         => bareDocScan(f.child)
      case g: GenerateExec       => bareDocScan(g.child)
      case _                     => false
    }
  }

  private def broadcastBuildSides(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.catalyst.optimizer.BuildLeft
    df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        if (j.buildSide == BuildLeft) j.left else j.right
    }
  }

  test("q67: the per-doc keyword cut runs through the heap operator, window only on survivors") {
    val df = SparkEntry.queries("q67_tfidf_keywords")(spark, sf())
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("TopKPerKey"), p.take(2000))
    // the Window that numbers ranks must sit ABOVE the heap cut (tiny
    // survivor set), never below it on the corpus-sized score table
    val windowIdx = p.indexOf("Window")
    val heapIdx = p.indexOf("TopKPerKey")
    assert(windowIdx >= 0 && heapIdx > windowIdx,
      s"window@$windowIdx heap@$heapIdx\n" + p.take(2000))
  }

  test("q19: corpus-sized doclen never sits on a broadcast build side") {
    val df = SparkEntry.queries("q19_bm25")(spark, sf())
    // df/stats broadcasts are per-query-term tiny aggregates; the
    // one-row-per-doc doclen projection must stream through a shuffled
    // hash join instead
    val bad = broadcastBuildSides(df).filter(bareDocScan)
    assert(bad.isEmpty, bad.map(_.toString.take(400)).mkString("\n"))
    assert(df.queryExecution.sparkPlan.toString.contains("ShuffledHashJoin"),
      df.queryExecution.sparkPlan.toString.take(1500))
  }

  test("q65: the boost's single-row max-ts frame broadcasts; no cartesian blowup") {
    val df = SparkEntry.queries("q65_fusion_boosted")(spark, sf())
    val p = df.queryExecution.executedPlan.toString()
    // the only nested-loop allowed is the 1-row max-ts broadcast; and no
    // BARE corpus scan may sit on a broadcast build side (the fused
    // LIMIT-40 frame and the per-term df aggregate are fine — they merely
    // DERIVE from documents; a raw documents projection is not)
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    val bad = broadcastBuildSides(df).filter(bareDocScan)
    assert(bad.isEmpty, bad.map(_.toString.take(400)).mkString("\n"))
  }

  test("q46: indexed BM25 prunes postings partitions by term bucket") {
    val df = SparkEntry.queries("q46_bm25_indexed")(spark, sf())
    val p = df.queryExecution.executedPlan.toString()
    // the term_bucket partition filter must reach the postings scan
    assert(p.contains("term_bucket"), p.take(2000))
    // scan-count guard (round-10 verdict #5): the per-query plan reads
    // the postings exactly twice (the df derivation + the scored join)
    // and doclen once. q46's clean-frame drift (1.73x vs r4) profiled
    // to AMBIENT suite pressure — in isolation it runs at the r4 level
    // (0.29 s vs r4's ~0.28 s) — so this pins that no PLAN fan-in ever
    // hides under that ambient as the postings lifecycle grows.
    val exec = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case other => other
    }
    val scans = exec.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    def nScans(sub: String) = scans.count(_.relation.location.rootPaths
      .exists(_.toString.contains(sub)))
    assert(nScans("/postings") == 2 && nScans("/doclen") == 1,
      scans.map(_.toString.take(150)).mkString("\n"))
  }

  test("spanRemoval: the corpus-wide doc_id sort is opt-in, not in the operator") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
    def globalSorts(df: org.apache.spark.sql.DataFrame) = {
      val exec = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.inputPlan
        case p => p
      }
      exec.collect {
        case s: org.apache.spark.sql.execution.SortExec if s.global => s
      }
    }
    // default: no global Exchange+Sort of the whole cleaned corpus —
    // the only sorts left are the per-doc window's local ones (r11
    // verdict #4: the total order existed only for the oracle hash)
    assert(globalSorts(Dedup.spanRemoval(docs, k = 8, hashKeys = true)).isEmpty)
    // the oracle wrapper opts in and gets exactly the ordered frame
    assert(globalSorts(Dedup.spanRemoval(docs, k = 8, hashKeys = true,
      ordered = true)).nonEmpty)
  }

  test("dedup family: deterministic total orders are opt-in, not in the operators") {
    // r12 verdict next-round #5 (the spanRemoval guard above, swept
    // across the family): every data-sized dedup output used to end in
    // a global orderBy that existed only for the oracle hash — and
    // internal consumers (q310's cluster input, q62's pair mining, the
    // blocking sweeps' simhash ranking) paid a full Exchange+Sort they
    // immediately re-partitioned away. Default plans must carry NO
    // global sort; the declared queries opt in with `ordered = true`.
    import graft.operators.Dedup
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
      .filter(col("doc_id") < 60)
    def globalSorts(df: org.apache.spark.sql.DataFrame) = {
      val exec = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.inputPlan
        case p => p
      }
      exec.collect {
        case s: org.apache.spark.sql.execution.SortExec if s.global => s
      }
    }
    val defaults = Seq(
      "exact" -> Dedup.exact(docs),
      "simhash" -> Dedup.simhash(docs, bits = 16),
      "minhashLsh" -> Dedup.minhashLsh(docs),
      "minhashEstimatePairs" -> Dedup.minhashEstimatePairs(docs),
      "ngramJaccardPairs" -> Dedup.ngramJaccardPairs(docs, 3, 0.5),
      "containmentPairs" -> Dedup.containmentPairs(docs, 3, 0.5),
      "simhashNeighborhood" -> Dedup.simhashNeighborhood(docs),
      "paragraphDedup" -> Dedup.paragraphDedup(docs))
    defaults.foreach { case (name, df) =>
      assert(globalSorts(df).isEmpty,
        s"$name default plan must not carry a global sort")
    }
    // and the opt-in actually orders (spot-check two shapes)
    assert(globalSorts(Dedup.exact(docs, ordered = true)).nonEmpty)
    assert(globalSorts(Dedup.simhashNeighborhood(docs,
      ordered = true)).nonEmpty)
  }

  test("q248: psi decile edges ride the sweep, not a global row_number window") {
    val df = SparkEntry.queries("q248_psi_drift")(spark, sf())
    val exec = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case p => p
    }
    val p = exec.toString()
    // the reference side is data-sized: its decile ranks must come off
    // the orderedPrefixSums sweep, never a single-partition row_number
    // window over the rows (r13 verdict #6)
    assert(!p.contains("row_number"), p.take(2000))
    // the one surviving global window is the bounded (≤ bins+1 rows)
    // PSI headline sum over the bin aggregate — report-sized by contract
    val wins = exec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.size <= 1, p.take(2000))
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
    // q55's final select drops rn, so the dead-rn elision must also have
    // removed the renumbering Window and the no-op Filter entirely — the
    // query runs as the bare heap operator (parity with q52's direct call)
    assert(!exec.toString.contains("Window"),
      "dead rn: the retained Window must be elided\n" + exec.toString.take(1500))
  }

  test("window rewrite keeps the Window when rn survives into the output") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val df = Tables.lineitem(spark, sf())
      .select("l_suppkey", "l_extendedprice", "l_orderkey", "l_linenumber")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("l_suppkey", "rn") // rn USED downstream → renumbering required
    val exec = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case p => p
    }
    assert(exec.collect { case t: graft.plans.TopKPerKeyExec => t }.nonEmpty,
      exec.toString.take(1500))
    assert(exec.toString.contains("Window"),
      "rn is referenced: Window must survive\n" + exec.toString.take(1500))
  }

  test("q69: the passage cut is the two-phase heap around ONE hash exchange") {
    val p = plan("q69_paragraph_dedup")
    assert(p.contains("TopKPerKey"), p.take(3000))
    // no Window and no Sort anywhere in the first-occurrence cut (the
    // only Sort allowed is the final presentation orderBy)
    assert(!p.contains("Window"), p.take(3000))
    // the cut's exchange is keyed on the passage hash
    assert(p.contains("Exchange hashpartitioning(phash"), p.take(3000))
  }

  test("q70: ADC scans codes against a BROADCAST lut; one exchange to aggregate") {
    val p = plan("q70_knn_pq")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    // the m-rows-per-vector code table must never shuffle by (sub, code)
    assert(!p.contains("Exchange hashpartitioning(sub"), p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("q80: IVF-PQ probe prunes code partitions; per-cell lut broadcasts; one aggregate exchange") {
    val p = plan("q80_knn_ivfpq")
    // the nProbe cell filter must reach the cluster-partitioned scan as
    // a partition filter — the probe IS partition pruning
    assert(p.contains("PartitionFilters") && p.contains("cluster"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    // codes must never shuffle by the join key; the only exchange is
    // the per-vector aggregation
    assert(!p.contains("Exchange hashpartitioning(cluster"), p.take(3000))
    assert(!p.contains("Exchange hashpartitioning(sub"), p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("q74: incremental near-dup candidates come from a band equi-join, no nested loop") {
    val p = plan("q74_incremental_dedup")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    // the candidate stage itself (eagerly checkpointed inside q74, so
    // its plan is no longer visible in the final query's): new×old
    // pairing must be an equi-join keyed on (band, bkey) — inspected
    // through the SAME method incrementalDedup calls
    import org.apache.spark.sql.functions._
    val docs = spark.range(0, 8)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 to 9).map(i => lit(s"w$i")): _*).as("text"))
    val sh = graft.operators.Dedup.shingleArrays(docs, 3)
    val cand = graft.operators.Dedup.incrementalCandidates(sh, sh, 4, 2)
      .queryExecution.executedPlan.toString()
    assert(cand.contains("bkey"), cand.take(3000))
    assert(!cand.contains("CartesianProduct") &&
      !cand.contains("BroadcastNestedLoopJoin"), cand.take(3000))
  }

  test("q58: shared passages shuffle exactly once, keyed on the gram") {
    import org.apache.spark.sql.functions._
    // 64 input partitions ≥ defaultParallelism, so the conditional
    // fan-out repartition must NOT fire: the only exchange left is the
    // gram-keyed groupBy (per-doc dedup is narrow, count(*) replaces the
    // second dedup-shuffle a countDistinct would plan)
    val docs = spark.range(0, 512, 1, 64)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 to 11).map(i =>
          concat(lit(s"w$i"), col("id") % 7)): _*).as("text"))
    val p = graft.operators.Dedup.sharedPassages(docs, n = 8)
      .queryExecution.executedPlan.toString()
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, p.take(3000))
    assert(p.contains("Exchange hashpartitioning(shingle"), p.take(3000))
  }

  test("q63: the recipe's first-wins dedup auto-routes through the heap operator") {
    val df = SparkEntry.queries("q63_clean_corpus")(spark, sf())
    val exec = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case p => p
    }
    // the rn=1 window idiom rewrote into TopKPerKey (k=1 heaps) and the
    // dead rn elided the Window entirely — composition for free
    assert(exec.collect { case t: graft.plans.TopKPerKeyExec => t }.nonEmpty,
      exec.toString.take(2000))
    assert(!exec.toString.contains("Window"), exec.toString.take(2000))
  }

  test("q61: the eval gram set broadcasts; the corpus never shuffles by gram") {
    val p = SparkEntry.queries("q61_decontamination")(spark, sf())
      .queryExecution.executedPlan.toString()
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q86: block packing never plans a single-partition window cumsum") {
    val plan = SparkEntry.queries("q86_block_pack")(spark, sf())
      .queryExecution.executedPlan.toString()
    // the prefix sum is the two-phase mapPartitions form; a Window over
    // ORDER BY doc_id would collapse the corpus to one partition
    assert(!plan.contains("Window"), plan.take(2000))
    assert(!plan.contains("SinglePartition"), plan.take(2000))
  }

  test("q163: the bloom probe sits below the semi-join, no cartesian") {
    val df = SparkEntry.queries("q163_bloom_semi_join")(spark, sf())
    val p = df.queryExecution.executedPlan.toString()
    assert(p.toLowerCase.contains("bloommightcontain"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q83: the bloom probe filters the train grams BELOW the verify join") {
    val plan = SparkEntry.queries("q83_decontamination_bloom")(spark, sf())
      .queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case p => p
    }
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    assert(joins.nonEmpty, plan.toString.take(2000))
    // the probe expression lives in the join's train-side subtree — the
    // map-side cut happens before any exchange ships a gram
    assert(joins.exists(_.children.exists(
      _.toString.contains("bloommightcontain"))), plan.toString.take(3000))
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

  test("facade tenant read prunes to the user's bucket at file-list time") {
    import graft.pipeline.TableOps
    import spark.implicits._
    val dir = graft.TempDirs.create("plan").toString
    val engine = new graft.pipeline.MemFuse(spark, dir)
    val t = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    // a second user hashed to a DIFFERENT bucket, so pruning is observable
    val u2 = (1 to 40).map(i => s"z$i").find(u =>
      TableOps.bucketOf(spark, u) != TableOps.bucketOf(spark, "u1")).get
    engine.ingest(Seq(
      graft.pipeline.Schemas.Message("m1", "s1", "u1", "r1", 1, "user", "hello world", t),
      graft.pipeline.Schemas.Message("m2", "s2", u2, "r2", 1, "user", "other tenant", t)
    ).toDF())
    val b = TableOps.bucketOf(spark, "u1")
    // the manifest resolves to ONLY u1's bucket dirs before any job runs —
    // every root path of the scan is inside user_bucket=<b>
    val scans = engine.m1ForUser("u1").queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val roots = scans.flatMap(_.relation.location.rootPaths.map(_.toString))
    assert(roots.nonEmpty && roots.forall(_.contains(s"user_bucket=$b")),
      roots.mkString("\n"))
    // and the full view still sees both tenants
    assert(engine.m1.select("user_id").distinct().count() == 2)
    assert(engine.m1ForUser("u1").select("user_id").distinct().count() == 1)
  }

  test("pure band join rewrites to a binned equi-join, no nested loop, same rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pts = (0L until 500L).map(i => (i, i * 97 % 10000)).toDF("pid", "ts")
    val ivs = (0L until 60L).map(i => (i, i * 160L, i * 160L + 200L))
      .toDF("iid", "s", "e")
    def run() = pts.join(ivs, col("ts") >= col("s") && col("ts") < col("e"))
      .select("pid", "iid").orderBy("pid", "iid")
    // disabled (default): Spark has no equi key — nested loop
    spark.conf.unset("spark.graft.rangeJoin.binWidth")
    val naive = run()
    assert(naive.queryExecution.executedPlan.toString.contains("NestedLoop"))
    val expect = naive.collect().toSeq
    // enabled: binned equi-join, no nested loop anywhere, same result
    spark.conf.set("spark.graft.rangeJoin.binWidth", "256")
    try {
      val opt = run()
      val p = opt.queryExecution.executedPlan.toString
      assert(!p.contains("NestedLoop"), p.take(1500))
      assert(p.contains("_graft_pbin"), p.take(1500))
      assert(opt.collect().toSeq == expect)
      // an equi-keyed band join is left alone (hash join + post-filter)
      val keyed = pts.withColumn("k", col("pid") % 7)
        .join(ivs.withColumn("k", col("iid") % 7),
          Seq("k")).filter(col("ts") >= col("s") && col("ts") < col("e"))
      assert(!keyed.queryExecution.executedPlan.toString.contains("_graft_pbin"))
    } finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
  }

  test("shared-SQL q169: WindowTopKRewrite routes row_number()<=k from spark.sql into TopKPerKey") {
    val p = SparkEntry.queries("q169_sql_topk_per_group")(spark, sf())
      .queryExecution.executedPlan.toString()
    assert(p.contains("TopKPerKey"),
      "the SQL-path window-topk must hit the heap operator, not a full sort: " + p.take(2000))
  }

  test("shared-SQL q170: dot_product from spark.sql resolves to the codegen'd DotProduct") {
    val p = SparkEntry.queries("q170_sql_dot_product")(spark, sf())
      .queryExecution.executedPlan.toString()
    assert(p.contains("dotproduct("),
      "the registered function must be on the SQL plan: " + p.take(2000))
  }

  test("q183/q185: sweep queries stay window-free; q184 is a single scan") {
    def plan(q: String) = SparkEntry.queries(q)(spark, sf())
      .queryExecution.executedPlan.toString()
    // the exact-median/MAD/quantile family rides the keyed prefix
    // sweep — a partitioned window over the 3-value flag would be
    // |keys| single-task corpus sorts, the trap this guard pins shut
    Seq("q183_exact_median", "q192_exact_quantiles", "q202_mad_outliers",
      "q212_weighted_quantiles").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Window"),
        s"$q must ride the prefix sweep, not a window: " + p.take(1500))
    }
    // scd2: change-detect and version-close windows share the key sort
    val scd = plan("q185_scd2")
    assert(scd.sliding("Exchange".length).count(_ == "Exchange") <= 3,
      "scd2 must stack both windows on one shuffle: " + scd.take(1500))
    // corr matrix: ONE fact-table scan feeds all six pairs (a union of
    // per-pair selects would re-scan per pair)
    val corr = plan("q184_corr_matrix")
    assert(corr.sliding("Scan parquet".length).count(_ == "Scan parquet") == 1,
      "corr matrix must aggregate the fact table exactly once: " + corr.take(1500))
  }
}
