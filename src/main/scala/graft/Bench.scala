package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** The blessed canary reference window: per-query seconds of 15
    * code-frozen, shape-diverse probe queries (scan-agg, joins, window,
    * text row-local, vector, sketch, graph, MVCC read) in the round-10
    * baseline record (min-of-3 passes, sf0.1/local[32], -Xms pinned).
    * A run's machine-speed scale = MEDIAN over canaries of
    * (time_now / time_ref) — the median estimator was validated against
    * a deliberately window-split same-tree run pair: the 5-query
    * total-ratio over-corrected (+9% vs the 356-entry suite median)
    * because short shuffle-heavy probes swing harder than the suite
    * mix, while this basket's median landed within 2%. Robust to one
    * canary's code changing; re-pin an entry ONLY when its own code
    * changes — never to flatter a window. */
  private val CanaryRef: Map[String, Double] = Map(
    "q01_pricing_summary" -> 0.5034,
    "q02_top_revenue_orders" -> 0.6640,
    "q104_value_histogram" -> 0.1984,
    "q130_percent_rank" -> 0.8161,
    "q136_tpch_q5" -> 1.1088,
    "q141_snapshot_diff" -> 0.5568,
    "q144_degree_histogram" -> 0.1373,
    "q16_lang_id" -> 0.3180,
    "q190_benford" -> 0.3194,
    "q20_knn_cosine" -> 0.2207,
    "q222_sql_tpch_q10" -> 0.7169,
    "q28_dedup_exact" -> 0.3382,
    "q33_message_chunks" -> 0.1959,
    "q72_hll_distinct" -> 0.5082,
    "q92_rolling_window" -> 0.5034,
  )

  /** ISOLATED-entry canaries (round-10 verdict #4): the comparative
    * basket above corrects the pass-loop entries to ~2.5% but the
    * isolated x9* cycles run AFTER the passes in a different ambient
    * (single-process stream scheduling + churn I/O swing ±30%), so
    * their window swings need their own probe. Iso scale = MEDIAN of
    * (time_now / time_ref) over the KEPT probes, applied to isolated
    * entries in `queries_normalized`. Refs in BLESSED-window units
    * (run time ÷ that run's comparative scale). Falls back to the
    * comparative scale when a probe failed or the run is filtered.
    *
    * Round-13 (r12 verdict #2): the 3-probe basket let 2 per-entry
    * anomalies (x90 3.3×, x96 2.35× in the r12 cross-record split)
    * drag the median to 2.08 while 9 of 11 iso entries agreed at
    * ~1.0 — over-normalizing the whole block. Now (a) SIX shape-
    * diverse probes (two churn-maintain cycles, four stream-ingest
    * sizes), and (b) an OUTLIER RULE: a probe whose ratio departs
    * >1.5× from the all-probe median is excluded from the scale and
    * named in the artifact (`iso_outliers`) — a machine-speed shift
    * moves every probe together, so a lone 2-3× probe is a per-entry
    * anomaly, not ambient speed. Refs re-pinned at the round-12
    * same-tree committed record (4a0bce4; every iso entry's
    * measurement harness changed in r12 when the block moved to a
    * forked child JVM, so older vintages are not comparable). */
  private val IsoCanaryRef: Map[String, Double] = Map(
    "x90_facade_churn_maintain" -> 6.7977,
    "x91_facade_churn_pq" -> 6.1117,
    "x93_stream_ingest_e2e" -> 5.7299,
    "x96_stream_ingest_6k" -> 5.9150,
    "x97_stream_ingest_60k" -> 6.4308,
    "x9a_stream_ingest_600k" -> 11.1066,
  )

  /** A probe whose now/ref ratio is more than this factor off the
    * all-probe median is excluded from the iso scale (see above). */
  private val IsoOutlierFactor = 1.5

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // oracle-checked queries + bench-only x* entries (index/facade paths);
    // SPARK_GRAFT_FILTER (regex, find-anywhere) narrows the set for
    // isolating one query's cost during iteration
    val filter = sys.env.get("SPARK_GRAFT_FILTER").map(_.r)
    val allUnfiltered =
      (SparkEntry.queries ++ SparkEntry.benchExtras).toSeq.sortBy(_._1)
    val all = allUnfiltered
      .filter { case (n, _) => filter.forall(_.findFirstIn(n).isDefined) }
    // x9* entries are SIDE-EFFECTFUL cycles (ingest→delete→maintain):
    // their heavy I/O + GC churn measurably inflates every other query
    // when interleaved (verified: untouched queries ran 1.2-1.5× slower
    // with the churn entry in the pass loop), so they run once, AFTER
    // the comparative passes
    val (isolated, ordered) = all.partition(_._1.startsWith("x9"))
    // full-evaluation sink: a count() would let column pruning ELIDE the
    // output projections (a scan-speed text query would be timed as a
    // bare row count — measured 30× under-reporting on q56) — the noop
    // datasource consumes every row with every column materialized, the
    // standard Spark benchmarking sink, with no driver-collect skew
    def evaluate(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // untimed setup phase: build ALL session fixtures (warehouses,
    // indexes, persisted embeddings) before any timing, so construction
    // never happens lazily inside a pass and the heap reaches its
    // steady resident shape up front
    // heap attribution: the session fixtures (warehouses, index
    // families, persisted labels/edges/embeddings) stay resident across
    // every pass by design; recording used-heap at each stage boundary
    // makes any ambient round-over-round drift attributable to resident
    // size instead of guessed at (post-GC used heap is the resident
    // set; the JVM-wide peak bounds transient pressure)
    def heapUsed(): Long = {
      System.gc()
      val rt = Runtime.getRuntime
      rt.totalMemory() - rt.freeMemory()
    }
    val heapStart = heapUsed()
    // per-fixture-group resident footprint: post-GC used heap after each
    // group's build, committed as data so any round-over-round residency
    // drift is attributable to a NAMED group, not the session at large
    val fixtureHeap = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    try SparkEntry.warmFixtures(spark, sfDir,
      afterEach = name => fixtureHeap += name -> heapUsed())
    catch { case _: Throwable => () }
    val heapAfterFixtures = heapUsed()
    // untimed warmup pass: JIT, whole-stage-codegen compilation and file
    // index caches, so the timed pass measures steady-state throughput
    // (set SPARK_GRAFT_WARMUP=0 for cold-start numbers)
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0") {
      ordered.foreach { case (_, fn) =>
        try evaluate(fn(spark, sfDir)) catch { case _: Throwable => () }
      }
    }
    // forked iso child of a FULL run: replay the whole comparative
    // warmup once (untimed) before timing the isolated block. The
    // churn cycles' IVF-PQ legs JIT-compile through the comparative
    // entries' row volume — a cold child measured x92 ~1.7x slower
    // with identical plans, purely code-path warmth. One warmup pass
    // restores the regime both records share while keeping the fresh
    // heap (no timed-pass wake ever accumulates here). Parent sets
    // ISO_WARM=full only for unfiltered runs, so hand-filtered
    // iteration children stay fast.
    if (sys.env.get("SPARK_GRAFT_ISO_WARM").contains("full") &&
        sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0") {
      allUnfiltered.filterNot(_._1.startsWith("x9")).foreach { case (_, fn) =>
        try evaluate(fn(spark, sfDir)) catch { case _: Throwable => () }
      }
    }
    // settle the heap before timing: fixture construction leaves a large
    // collectible wake (shuffle buffers, codegen classes); one full GC
    // here keeps it out of the first timed pass
    System.gc()
    // min of n>=3 timed passes: one-off GC/compilation hiccups otherwise
    // dominate sub-second queries. A query that throws is recorded as
    // failed (time -1) instead of silently contributing a near-zero time.
    // Heap-drain policy between entries: a heavy predecessor (the
    // HITS/graph trio's checkpointed iteration blocks, shuffle buffers)
    // leaves a collectible wake whose GC + ContextCleaner work lands
    // INSIDE the next short query's timing — measured 1.9× on
    // q24_fusion_rrf run directly after q239 vs in isolation, with
    // identical plans; min-of-passes can't fix it because every pass has
    // the same predecessor order. Round 8 drained before EVERY entry and
    // the forced full GCs were NOT free: the r7→r8 fleet comparison
    // showed a ~15% median slowdown (291→327 s total, 59 queries >1.3×)
    // with no plan changes — a full GC's own follow-on work (heap
    // uncommit/re-commit, code-cache and metadata churn) lands inside
    // the NEXT timed window. So the drain is now targeted: only after a
    // predecessor whose own time exceeded drainAfterSec (the graph/churn
    // heavies that motivated it), and -Xms is pinned to -Xmx in
    // build.sbt so a full GC can never uncommit heap. SPARK_GRAFT_DRAIN
    // = all|heavy|none overrides for A/B runs.
    val drainMode = sys.env.getOrElse("SPARK_GRAFT_DRAIN", "heavy")
    require(Set("all", "heavy", "none")(drainMode),
      s"SPARK_GRAFT_DRAIN must be all|heavy|none, got '$drainMode'")
    val drainAfterSec = 2.0
    def pass() = {
      // seeded past the threshold: the PREVIOUS pass's last entry may
      // have been a heavy, so each pass opens drained — otherwise the
      // first entry's samples in passes 2..n carry that wake and
      // min-of-passes degenerates to pass 1's single clean sample
      var prevSec = Double.MaxValue
      ordered.map { case (name, fn) =>
        if (drainMode == "all" || (drainMode == "heavy" && prevSec > drainAfterSec))
          System.gc()
        val t0 = System.nanoTime()
        val ok = try { evaluate(fn(spark, sfDir)); true } catch { case _: Throwable => false }
        prevSec = (System.nanoTime() - t0) / 1e9
        (name, prevSec, ok)
      }
    }
    val heapBeforeTimed = heapUsed()
    val nPasses = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val passes = (1 to nPasses).map(_ => pass())
    // per-cycle phase capture: churnPhaseTimings holds the LAST run's
    // phases, so each timed cycle's snapshot is taken right after it —
    // the emitted phases come from the cycle that produced the min
    // time, keeping the artifact internally consistent (a phases block
    // can no longer sum past its own entry total)
    val isoPhases = scala.collection.mutable.Map.empty[String, Seq[(String, Double)]]
    def runIsolatedInProcess() = isolated.map { case (name, fn) =>
      // first run is untimed setup (warehouse build, index bootstrap);
      // then min of 2 timed steady-state cycles — these single-process
      // entries were the noisiest in cross-run comparisons (stream
      // micro-batch scheduling and churn I/O swing ±30%), and min-of-n
      // is the same estimator the comparative passes already use
      try evaluate(fn(spark, sfDir)) catch { case _: Throwable => () }
      val cycles = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { evaluate(fn(spark, sfDir)); true } catch { case _: Throwable => false }
        (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0, ok,
          SparkEntry.churnPhaseTimings.get(name))
      }
      val allOk = cycles.forall(_._2)
      if (allOk)
        cycles.minBy(_._1)._3.foreach(p => isoPhases(name) = p)
      (name, if (allOk) cycles.map(_._1).min else -1.0, allOk)
    }
    // the isolated x9* block runs in a FRESH FORKED JVM by default
    // (round-11 verdict #2): after a full comparative suite the parent
    // heap carries every resident fixture plus the passes' collectible
    // wake, and that ambient GC regime — 52.8 vs 18.9 GB same-tree peak
    // splits — was the one thing keeping driver and builder records
    // from agreeing on the longest stream rung. A child JVM re-runs
    // this main with a filter pinned to exactly the isolated entries
    // (its own comparative loop is then empty), so the block times
    // against a cold, fixture-only heap every run, on either side.
    // SPARK_GRAFT_ISO_FORK=0 forces in-process; any fork failure falls
    // back silently (iso_forked=false in the artifact says which ran).
    val isChild = sys.env.contains("SPARK_GRAFT_ISO_CHILD")
    def forkIsolated(): Option[(Seq[(String, Double, Boolean)],
        Map[String, Seq[(String, Double)]], Long)] =
      try {
        val javaBin = new java.io.File(new java.io.File(
          System.getProperty("java.home"), "bin"), "java").getAbsolutePath
        val inherited = java.lang.management.ManagementFactory
          .getRuntimeMXBean.getInputArguments
          .toArray(Array.empty[AnyRef]).map(_.toString).toSeq
          .filterNot(a => a.startsWith("-agentlib") ||
            a.startsWith("-javaagent") || a.startsWith("-Xrunjdwp"))
        // the child's heap is PINNED to min(parent Xmx, 24g) — the
        // blessed bench methodology's heap — instead of inheriting the
        // parent's sizing verbatim: an environment that hands the
        // parent an oversized SPARK_DRIVER_MEM otherwise changes the
        // child's GC regime wholesale (r12 cross-record split: child
        // peak 63 GB on one side vs 18 GB on the other over identical
        // trees, the x90/x96 divergence), and the iso block exists
        // precisely so both records time against the same ambient.
        // Xms pins to the same value (the r8 uncommit lesson).
        // bytes per unit: suffix-less -Xmx is raw bytes (r13 advice —
        // it was stripped but unparsed, silently yielding the default)
        def mb(a: String): Option[Long] =
          "(?i)^-Xmx(\\d+)([kmgt]?)$".r.findFirstMatchIn(a).map { m =>
            val unit = m.group(2).toLowerCase match {
              case "" => 1L; case "k" => 1024L; case "m" => 1024L * 1024
              case "g" => 1024L * 1024 * 1024; case _ => 1024L * 1024 * 1024 * 1024
            }
            m.group(1).toLong * unit / (1024L * 1024)
          }
        // no -Xmx at all (or unparsable) falls back to the PARENT's
        // effective heap, not a hard 24 g: a host whose default heap is
        // far under 24 g must not hand the child more than the parent
        // itself has (r13 advice — the stated rule is min(parent, 24g))
        val parentMb = inherited.flatMap(mb).lastOption
          .getOrElse(Runtime.getRuntime.maxMemory() / (1024L * 1024))
        val childMb = math.max(1024L, math.min(parentMb, 24L * 1024))
        val jvmArgs = inherited.filterNot(a =>
          a.startsWith("-Xmx") || a.startsWith("-Xms")) ++
          Seq(s"-Xmx${childMb}m", s"-Xms${childMb}m")
        val cmd = Seq(javaBin) ++ jvmArgs ++
          Seq("-cp", System.getProperty("java.class.path"), "graft.Bench")
        val pb = new ProcessBuilder(cmd: _*)
        pb.environment().put("SPARK_GRAFT_ISO_CHILD", "1")
        pb.environment().put("SPARK_GRAFT_FILTER",
          isolated.map(_._1).mkString("^(", "|", ")$"))
        if (filter.isEmpty)
          pb.environment().put("SPARK_GRAFT_ISO_WARM", "full")
        // child logs join the parent's stderr stream (same place the
        // parent's own Spark logs go); stdout carries the JSON line
        pb.redirectError(ProcessBuilder.Redirect.INHERIT)
        val proc = pb.start()
        // stdout drains on its own thread so the parent can bound the
        // wait: a WEDGED (not crashed) child previously blocked the
        // whole bench forever — the nonzero-exit fallback never fired.
        // On expiry the child is killed and the block falls back to
        // the in-process path (iso_forked=false says which ran).
        val lineBuf = new java.util.concurrent.LinkedBlockingQueue[String]()
        val reader = new Thread(() =>
          try scala.io.Source.fromInputStream(proc.getInputStream, "UTF-8")
            .getLines().foreach(lineBuf.put)
          catch { case _: Throwable => () })
        reader.setDaemon(true)
        reader.start()
        val timeoutMin =
          sys.env.getOrElse("SPARK_GRAFT_ISO_TIMEOUT_MIN", "45").toLong
        val finished =
          proc.waitFor(timeoutMin, java.util.concurrent.TimeUnit.MINUTES)
        if (!finished) { proc.destroyForcibly(); proc.waitFor() }
        reader.join(10000)
        val lines = {
          val l = new java.util.ArrayList[String](); lineBuf.drainTo(l)
          scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.toList
        }
        val code = if (finished) proc.exitValue() else -1
        val line = lines.find(_.contains("\"metric\""))
        if (code != 0 || line.isEmpty) None
        else {
          val root = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(line.get)
          val qn = root.get("queries")
          val res = isolated.map { case (n, _) =>
            val v = Option(qn.get(n)).map(_.asDouble(-1.0)).getOrElse(-1.0)
            (n, v, v >= 0)
          }
          val ph = scala.collection.mutable.Map
            .empty[String, Seq[(String, Double)]]
          Option(root.get("phases")).foreach { p =>
            val it = p.fields()
            while (it.hasNext) {
              val e = it.next()
              val inner = scala.collection.mutable.ListBuffer
                .empty[(String, Double)]
              val fit = e.getValue.fields()
              while (fit.hasNext) {
                val f = fit.next()
                // the child's derived residual re-derives parent-side
                if (f.getKey != "query")
                  inner += f.getKey -> f.getValue.asDouble()
              }
              ph(e.getKey) = inner.toSeq
            }
          }
          val childPeak = Option(root.get("heap_bytes"))
            .flatMap(h => Option(h.get("peak"))).map(_.asLong(0L))
            .getOrElse(0L)
          Some((res, ph.toMap, childPeak))
        }
      } catch { case _: Throwable => None }
    val forkWanted = !isChild && isolated.nonEmpty &&
      sys.env.getOrElse("SPARK_GRAFT_ISO_FORK", "1") != "0"
    val forked = if (forkWanted) forkIsolated() else None
    val isoForked = forked.isDefined
    val isoChildPeak = forked.map(_._3).getOrElse(0L)
    val isoResults = forked match {
      case Some((res, ph, _)) => isoPhases ++= ph; res
      case None => runIsolatedInProcess()
    }
    val results = ordered.indices.map { i =>
      val rs = passes.map(_(i))
      val ok = rs.forall(_._3)
      (rs.head._1, if (ok) rs.map(_._2).min else -1.0, ok)
    } ++ isoResults
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (n, _, false) => s"\"" + n + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    // canary normalization (round-9 gap: two same-tree records differed
    // 1.18× across platform windows with nothing in the artifact to say
    // so — code-untouched queries regressed in lockstep, forcing manual
    // triangulation). 15 code-frozen queries act as a machine-speed
    // probe: scale = MEDIAN of per-canary (now / blessed-reference)
    // ratios (see CanaryRef). Each entry also ships canary-normalized,
    // so same-tree runs taken in different windows agree on the
    // normalized record and a real regression stands out from ambient
    // machine speed. Raw stays primary.
    val canaryOk = results
      .filter(r => CanaryRef.contains(r._1) && r._3 && r._2 > 0)
    // a filtered/partial run can't normalize — scale pins to 1
    val scale =
      if (canaryOk.size == CanaryRef.size) {
        val rs = canaryOk.map { case (n, v, _) => v / CanaryRef(n) }.sorted
        rs(rs.size / 2)
      } else 1.0
    // isolated-block scale: median over the KEPT iso canaries — probes
    // departing >IsoOutlierFactor from the all-probe median are
    // per-entry anomalies (ambient speed moves every probe together)
    // and are excluded AND named, not averaged in. Falls back to the
    // comparative scale on a filtered/partial run.
    val isoOk = results
      .filter(r => IsoCanaryRef.contains(r._1) && r._3 && r._2 > 0)
    val (isoScale, isoOutliers) =
      if (isoOk.size == IsoCanaryRef.size) {
        val ratios = isoOk.map { case (n, v, _) => n -> v / IsoCanaryRef(n) }
        val all = ratios.map(_._2).sorted
        val m0 = all(all.size / 2)
        val (kept, out) = ratios.partition { case (_, r) =>
          r <= m0 * IsoOutlierFactor && r >= m0 / IsoOutlierFactor
        }
        val ks = kept.map(_._2).sorted
        (ks(ks.size / 2), out.map(_._1))
      } else (scale, Seq.empty[String])
    val canaryJson = {
      val entries = canaryOk.map { case (n, v, _) =>
        s"\"" + n + "\":{\"sec\":" + v + ",\"ref\":" + CanaryRef(n) + "}"
      }.mkString("{", ",", "}")
      val isoEntries = isoOk.map { case (n, v, _) =>
        s"\"" + n + "\":{\"sec\":" + v + ",\"ref\":" + IsoCanaryRef(n) + "}"
      }.mkString("{", ",", "}")
      val outJson = isoOutliers.map("\"" + _ + "\"").mkString("[", ",", "]")
      s"""{"entries":$entries,"scale":$scale,"iso_entries":$isoEntries,"iso_scale":$isoScale,"iso_outliers":$outJson}"""
    }
    val isolatedNames = isolated.map(_._1).toSet
    val qsNorm = results.map { case (k, v, ok) =>
      val s0 = if (isolatedNames(k)) isoScale else scale
      s"\"" + k + "\":" + (if (ok && v >= 0) v / s0 else v)
    }.mkString("{", ",", "}")
    val totalNorm = results.collect { case (n, v, true) if v >= 0 =>
      v / (if (isolatedNames(n)) isoScale else scale) }.sum
    // per-phase attribution of the isolated churn cycles: recorded
    // phases from the MIN-time cycle (the one the entry total reports)
    // + the residual "query" phase (entry total minus attributed time —
    // the indexed query's plan execution through the noop sink, which
    // happens outside churnCycle). Snapshot-per-cycle keeps phases and
    // total from the same run; the 0-clamp stays as a pure safety net.
    val entryTime = results.map { case (n, v, _) => n -> v }.toMap
    val phases = (SparkEntry.churnPhaseTimings.toMap ++ isoPhases)
      .toSeq.sortBy(_._1)
      .filter { case (n, _) => entryTime.get(n).exists(_ >= 0) }
      .map { case (n, ps) =>
        val residual = math.max(0.0, entryTime(n) - ps.map(_._2).sum)
        val inner = (ps :+ ("query" -> residual))
          .map { case (p, t) => s"\"" + p + "\":" + t }.mkString(",")
        s"\"" + n + "\":{" + inner + "}"
      }.mkString("{", ",", "}")
    val heapEnd = heapUsed()
    val heapPeak = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
      .asInstanceOf[java.util.List[java.lang.management.MemoryPoolMXBean]]
      .toArray(Array.empty[java.lang.management.MemoryPoolMXBean])
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(p => Option(p.getPeakUsage).map(_.getUsed).getOrElse(0L)).sum
    val fixtures = fixtureHeap
      .map { case (n, h) => s"\"" + n + "\":" + h }.mkString("{", ",", "}")
    val heap = s"""{"start":$heapStart,"after_fixtures":$heapAfterFixtures,""" +
      s""""before_timed":$heapBeforeTimed,"end":$heapEnd,"peak":$heapPeak,""" +
      s""""fixtures":$fixtures}"""
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"canary":$canaryJson,"total_normalized":$totalNorm,"queries_normalized":$qsNorm,"phases":$phases,"heap_bytes":$heap,"iso_forked":$isoForked,"iso_child_heap_peak":$isoChildPeak,"sf":"$sfDir"}"""
    println(line)
    // COMPACT trailer line (r13 verdict #1): the driver captures only
    // the last ~2000 chars of combined sbt output, so the full record
    // line above (~30 KB at 374 entries) has NEVER parsed driver-side —
    // BENCH_r01..r13 all carry parsed:null with the tail starting
    // mid-object, which left PERF per-query comparison and the c8/c32
    // scaling block empty every round. The full line stays first (the
    // fork protocol and grep-based iteration read it, and it is the
    // bytes written to target/bench.json + BENCH_LATEST.json — no
    // per-query entry is removed or renamed anywhere); this short
    // summary is the LAST stdout write so any tail capture holds one
    // COMPLETE metric JSON line. Per-query data lives in the committed
    // BENCH_LATEST.json the summary points at. The failed list is
    // capped so a pathological run cannot blow the line past the tail.
    val failedNames = results.collect { case (n, _, false) => n }
    val failedCompact = (failedNames.take(10).map("\"" + _ + "\"") ++
      (if (failedNames.size > 10)
        Seq("\"+" + (failedNames.size - 10) + "_more\"") else Nil))
      .mkString("[", ",", "]")
    val isoOutCompact = isoOutliers.take(6).map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val compact =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":{},""" +
      s""""n":${results.size},"n_ok":${results.count(r => r._3 && r._2 >= 0)},""" +
      s""""failed":$failedCompact,"total_normalized":$totalNorm,""" +
      s""""canary_scale":$scale,"iso_scale":$isoScale,""" +
      s""""iso_outliers":$isoOutCompact,"iso_forked":$isoForked,""" +
      s""""queries_in":"BENCH_LATEST.json","sf":"$sfDir"}"""
    println(compact)
    // also to files: the driver's log tail truncates long lines, which
    // cost round-over-round comparability (BENCH_r04 lost q01-q10).
    // BENCH_LATEST.json is the COMMITTED sibling — target/ is gitignored
    // and wiped by clean, so the repo-root copy is the durable per-query
    // record each round's comparison reads.
    val bytes = (line + "\n").getBytes("UTF-8")
    val out = java.nio.file.Paths.get("target/bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, bytes)
    // only a FULL run may replace the committed record — a filtered
    // iteration run would silently shrink it to the filtered subset
    if (filter.isEmpty)
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LATEST.json"), bytes)
    spark.stop()
  }
}
