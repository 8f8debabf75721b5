package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-level statistics for data pipelines: resampled
  * confidence intervals, two-sample distribution tests, market-basket
  * rule mining. Everything is aggregation-shaped (map-side combinable,
  * no driver-side data) and engine-deterministic: randomness comes from
  * md5 slices, constants are pinned driver-side, outputs are trunc6'd.
  */
object Stats {

  /** Ceiling on the per-partition key subtotals [[keyedPrefixSums]]
    * ships to the driver (partitions × |keys| tuples of a few dozen
    * bytes each — 4M ≈ low hundreds of MB, far below any sane driver
    * heap). Crossing it means the key is NOT low-cardinality and the
    * sweep's design premise is void. */
  private[operators] val maxDriverSubtotals: Int = 4 * 1000 * 1000

  /** CDF of Poisson(1) at k = 0..7: e⁻¹·Σ_{j≤k} 1/j!. Pinned here once
    * so the Spark when-chain and the oracle CASE interpolate the SAME
    * doubles — inverse-CDF thresholds for hash-derived uniforms. */
  val PoissonCdf1: Array[Double] = {
    val eInv = java.lang.Math.exp(-1.0)
    val fact = (0 to 7).map(i => (1 to i).foldLeft(1.0)(_ * _))
    fact.scanLeft(0.0)((acc, f) => acc + 1.0 / f).tail.map(_ * eInv).toArray
  }

  /** MINSTD-Lehmer modulus 2³¹−1 — shared with the oracle SQL. */
  val LehmerM: Long = 2147483647L

  /** 48271^(r+1) mod 2³¹−1 for r = 0 until n: the pinned per-replicate
    * multipliers of [[poissonBootstrap]]'s row-seeded Lehmer stream. */
  def lehmerPowers(n: Int): Array[Long] =
    Array.iterate(48271L, n)(p => p * 48271L % LehmerM)

  /** Bootstrap confidence interval for the mean via the POISSON
    * bootstrap (Chamandy et al. 2012; the resampling scheme that
    * distributes): instead of drawing n rows with replacement — which
    * needs global coordination — every row independently contributes
    * Poisson(1) copies to each replicate, so the whole resample is one
    * row-local weight column and the R replicate means are one
    * map-side-combinable aggregation. At 100 TB that is R partial
    * aggregations riding a single scan; no shuffle grows with data.
    * Determinism: the Poisson draw inverts [[PoissonCdf1]] at a
    * md5-derived uniform, so every engine resamples identically.
    * Percentile convention: rank ⌈q·R⌉ of the sorted replicate means
    * (the q192 rule). */
  def poissonBootstrap(df: DataFrame, valueCol: String, idCol: String,
      replicates: Int = 32, salt: String = "pb"): DataFrame = {
    // ONE md5 per ROW (not per row×replicate — at R=32 that was 32×
    // the hash/concat cost for the same scan); the R per-replicate
    // uniforms are MINSTD-Lehmer steps off the shared 31-bit seed:
    // u_r = (h · 48271^(r+1) mod 2³¹−1) / (2³¹−1), i.e. element r+1 of
    // the Park–Miller sequence seeded at h (Park & Miller 1988). The
    // multiplier powers are pinned driver-side LITERALS, products stay
    // < 2⁶² so the modular math is exact BIGINT in every engine.
    val base = df.select(col(idCol).cast("string").as("id"),
      col(valueCol).cast("double").as("x"))
    val overall = base.agg(count(lit(1)).as("n"),
      (xsum(col("x")) / count(lit(1))).as("mean_raw"))
    val aPow = lehmerPowers(replicates)
    val u = ((col("h") * col("ar")) % lit(LehmerM)).cast("double") /
      lit(LehmerM.toDouble)
    val weight = PoissonCdf1.zipWithIndex
      .foldLeft(Option.empty[Column]) { case (acc, (c, k)) =>
        Some(acc.fold(when(col("u") < lit(c), k.toLong))(
          _.when(col("u") < lit(c), k.toLong)))
      }.get.otherwise(lit(PoissonCdf1.length.toLong))
    val means = base
      .withColumn("h",
        md5Long(concat(lit(salt + "|"), col("id"))) % lit(LehmerM))
      .select(col("x"), col("h"),
        explode(sequence(lit(0), lit(replicates - 1))).as("r"))
      .withColumn("ar", element_at(array(aPow.map(lit): _*), col("r") + 1))
      .withColumn("u", u)
      .withColumn("w", weight)
      .groupBy("r")
      .agg(psum6(col("w").cast("double") * col("x")).as("wx"),
        sum(col("w")).as("nw"))
      .select(col("r"), (col("wx") / col("nw").cast("double")).as("m"))
    import org.apache.spark.sql.expressions.Window
    val ranked = means
      .withColumn("rn", row_number()
        .over(Window.orderBy(col("m"), col("r"))).cast("long"))
    val lo = math.max(1, math.ceil(0.05 * replicates).toInt)
    val hi = math.max(1, math.ceil(0.95 * replicates).toInt)
    ranked.filter(col("rn") === lo || col("rn") === hi)
      .agg(trunc6(min(col("m"))).as("boot_p05"),
        trunc6(max(col("m"))).as("boot_p95"))
      .crossJoin(broadcast(overall))
      .select(col("n"), lit(replicates.toLong).as("n_replicates"),
        trunc6(col("mean_raw")).as("mean"),
        col("boot_p05"), col("boot_p95"))
  }

  /** Two-phase distributed prefix sums over value-ordered count rows
    * (the shardByTokens pattern): range-partition by the sort value,
    * per-partition totals to the driver (two longs per partition),
    * prefix-scan there, per-row running totals seeded by the broadcast
    * offsets. This is how [[ksTest]] and [[aucRankSum]] sweep a
    * continuous score's distinct values WITHOUT a single-partition
    * global window — the distinct-value frame is data-sized for
    * continuous scores, so the sweep must scale like the data. The
    * sorted RDD is locally checkpointed between phases: recomputation
    * could re-sample range boundaries and silently shift every offset,
    * so losing the blocks must fail the job, not corrupt the sums.
    * Input (v, na, nb) with distinct v; output adds exact cumulative
    * (ca, cb) in ascending-v order. `preMaterialized` mirrors
    * [[keyedPrefixSums]]: a caller that already checkpointed the count
    * frame (because it derives totals/ties from the SAME frame) skips
    * the internal copy, so the upstream aggregation runs exactly once. */
  private[operators] def orderedPrefixSums(counts: DataFrame,
      preMaterialized: Boolean = false): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val base = counts
      .select(col("v").cast("double"), col("na").cast("long"),
        col("nb").cast("long"))
    val sized = (
      // materialize before the range exchange — boundary sampling would
      // otherwise run the upstream plan a second time
      if (preMaterialized) base else base.localCheckpoint())
      .repartitionByRange(col("v"))
      .sortWithinPartitions("v")
      .as[(Double, Long, Long)].rdd.localCheckpoint()
    val partSums = sized.mapPartitionsWithIndex { case (i, it) =>
      var a = 0L; var b = 0L
      it.foreach { r => a += r._2; b += r._3 }
      Iterator((i, a, b))
    }.collect().sortBy(_._1)
    val offA = partSums.map(_._2).scanLeft(0L)(_ + _)
    val offB = partSums.map(_._3).scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast((offA, offB))
    sized.mapPartitionsWithIndex { case (i, it) =>
      var ca = bc.value._1(i); var cb = bc.value._2(i)
      it.map { case (v, a, b) => ca += a; cb += b; (v, a, b, ca, cb) }
    }.toDF("v", "na", "nb", "ca", "cb")
  }

  /** KEYED variant of [[orderedPrefixSums]]: exact cumulative (ca, cb)
    * within each key in ascending-v order, without a per-key global
    * window. A `Window.partitionBy(key)` over a LOW-cardinality key
    * degenerates to |keys| single-task sorts of data-sized groups —
    * the exact-median-per-flag trap — so instead the frame is
    * range-partitioned by (k, v) (a key may span partitions), each
    * partition ships its per-key subtotal to the driver (≤ partitions
    * × |keys| pairs — this path is FOR the few-big-groups regime;
    * many-small-groups should keep the plain window, whose groups fit
    * a task), and the second pass seeds per-row running sums from the
    * broadcast offsets. Checkpointed between phases for the same
    * boundary-resampling reason as [[orderedPrefixSums]]. Input
    * (k, v, na, nb) with (k, v) distinct. */
  private[graft] def keyedPrefixSums(counts: DataFrame,
      preMaterialized: Boolean = false,
      maxSubtotals: Int = maxDriverSubtotals): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val base = counts
      .select(col("k").cast("string"), col("v").cast("double"),
        col("na").cast("long"), col("nb").cast("long"))
    // checkpoint BEFORE the range exchange: RangePartitioner SAMPLES
    // its child to pick boundaries, so an unmaterialized input would
    // execute its whole upstream plan twice (once to sample, once to
    // exchange); callers that already hold a checkpointed frame skip
    // the extra copy
    val sized = (if (preMaterialized) base else base.localCheckpoint())
      .repartitionByRange(col("k"), col("v"))
      .sortWithinPartitions("k", "v")
      .as[(String, Double, Long, Long)].rdd.localCheckpoint()
    // this path is FOR the few-big-groups regime: the driver holds
    // partitions × |keys| subtotal tuples, so a high-cardinality key
    // must fail fast with a named reason instead of a driver OOM. The
    // guard is FUSED into the subtotal pass (r13 paid a separate full
    // counting scan per sweep — one extra data-sized job at any scale,
    // guide §1.2): each task bounds ITS map at maxSubtotals while
    // building it (the common out-of-contract key fails executor-side,
    // O(1) per row), the driver re-checks the total after the collect,
    // and a pathological spread that passes per-task but not in total
    // is stopped by spark.driver.maxResultSize with its own named
    // error before it can OOM the driver.
    val capMsg = s"keyedPrefixSums subtotal cap $maxSubtotals exceeded: " +
      "the key column has too many distinct values for the " +
      "few-big-groups sweep - use a Window.partitionBy(key) instead " +
      "for many small groups"
    val partSums = sized.mapPartitionsWithIndex { case (i, it) =>
      val m = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
      it.foreach { case (k, _, a, b) =>
        val (pa, pb) = m.getOrElse(k, (0L, 0L)); m(k) = (pa + a, pb + b)
        require(m.size <= maxSubtotals, capMsg)
      }
      m.iterator.map { case (k, (a, b)) => (i, k, a, b) }
    }.collect().sortBy(_._1)
    require(partSums.length <= maxSubtotals, capMsg)
    val run = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
    val off = Map.newBuilder[(Int, String), (Long, Long)]
    partSums.foreach { case (i, k, a, b) =>
      val cur = run.getOrElse(k, (0L, 0L))
      off += (((i, k), cur))
      run(k) = (cur._1 + a, cur._2 + b)
    }
    val bc = spark.sparkContext.broadcast(off.result())
    sized.mapPartitionsWithIndex { case (i, it) =>
      // explicit seeded flag: a null FIRST key would otherwise never
      // trigger offset seeding (null != null is false) and restart the
      // null group's cumulative sums at partition boundaries
      var seeded = false
      var curK: String = null; var ca = 0L; var cb = 0L
      it.map { case (k, v, a, b) =>
        if (!seeded || k != curK) {
          seeded = true
          curK = k
          val o = bc.value((i, k)); ca = o._1; cb = o._2
        }
        ca += a; cb += b; (k, v, a, b, ca, cb)
      }
    }.toDF("k", "v", "na", "nb", "ca", "cb")
  }

  /** Per-key exact midrank AUC — [[aucRankSum]] generalized over the
    * [[keyedPrefixSums]] sweep, so a k-fold cross-validated ranking
    * metric (key = fold) runs as ONE plan: one (key, score) count
    * rollup, one keyed sweep, integer rank algebra per key, a single
    * double division per output row. Like every sweep-family
    * operator, the group key returns as STRING (the sweep's portable
    * key form) — cast at the call site when a numeric fold is
    * wanted; null score rows are excluded by contract. */
  def aucByKey(df: DataFrame, key: Column, scoreCol: String,
      isPos: Column): DataFrame = {
    val counts = df.select(key.as("k"), col(scoreCol).as("v"),
        when(isPos, 1L).otherwise(0L).as("pos"))
      .filter(col("v").isNotNull)
      .groupBy("k", "v")
      .agg(count(lit(1)).as("na"), sum(col("pos")).as("nb"))
    keyedPrefixSums(counts)
      .select(col("k"), col("na").as("cnt"), col("nb").as("n_pos"),
        col("ca").as("cum"))
      .withColumn("r2",
        lit(2L) * (col("cum") - col("cnt")) + col("cnt") + lit(1L))
      .groupBy(col("k").as("fold"))
      .agg(sum(col("n_pos") * col("r2")).as("sum_r2"),
        sum(col("n_pos")).as("np"),
        sum(col("cnt") - col("n_pos")).as("nn"))
      .select(col("fold"), col("np").as("n_pos"), col("nn").as("n_neg"),
        trunc6((col("sum_r2") - col("np") * (col("np") + lit(1L))).cast("double") /
          (lit(2L) * col("np") * col("nn")).cast("double")).as("auc"))
      .orderBy("fold")
  }

  /** Exact per-group median report — the [[Sketches]] DDSketch path's
    * exact twin — on the [[keyedPrefixSums]] sweep: group keys here
    * are few and data-sized, where a partitioned window collapses to
    * |keys| single-task sorts. n_mid (1 for odd groups, 2 for even)
    * and the mid-rank midpoint match the row-level convention
    * bit-for-bit, because the value at a rank never depends on
    * intra-tie order. Null values excluded by contract; the key
    * returns as STRING (the sweep-family key form). */
  def exactMedianReport(df: DataFrame, key: String,
      value: String): DataFrame = {
    val vc = df.select(col(key).cast("string").as("k"),
        col(value).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("k", "v").agg(count(lit(1)).as("na"))
      .localCheckpoint()
    val tot = vc.groupBy("k").agg(sum(col("na")).as("n"))
    keyedExactMedian(vc, "med", preMaterialized = true)
      .join(broadcast(tot), "k")
      .select(col("k").as(key),
        (lit(2L) - col("n") % lit(2L)).as("n_mid"),
        trunc6(col("med")).as("median"))
      .orderBy(key)
  }

  /** Exact per-group quantiles at arbitrary probes (rank = ⌈q·n⌉,
    * floored at 1 — the lower-value convention) via the same sweep:
    * the probe fan-out joins key-locally, so the only data-sized work
    * is the one count rollup and the two sweep passes. Null values
    * excluded by contract; the key returns as STRING. */
  def exactQuantilesPerKey(df: DataFrame, key: String, value: String,
      qs: Seq[Double]): DataFrame = {
    val vc = df.select(col(key).cast("string").as("k"),
        col(value).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("k", "v").agg(count(lit(1)).as("na"))
      .withColumn("nb", lit(0L))
      .localCheckpoint()
    val probes = vc.groupBy("k").agg(sum(col("na")).as("n"))
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .withColumn("rank", greatest(lit(1L),
        ceil(col("q") * col("n").cast("double")).cast("long")))
      .select(col("k"), col("q"), col("rank"))
    keyedPrefixSums(vc, preMaterialized = true)
      .join(broadcast(probes), "k")
      .filter(col("ca") >= col("rank") &&
        col("ca") - col("na") < col("rank"))
      .select(col("k").as(key), col("q"), col("v").as("value"))
      .orderBy(key, "q")
  }

  /** 2-D Pareto frontier (skyline, Börzsönyi et al. 2001): the points
    * not dominated under (minimize `minCol`, maximize `maxCol`) —
    * j dominates i when v_j ≤ v_i ∧ s_j ≥ s_i with one strict. In 2-D
    * the skyline is exactly the rows whose s exceeds the running max
    * of s over all strictly-cheaper rows, so instead of the naive
    * O(n²) dominance self-join the plan is: one (v → max s) value
    * rollup, a range-partitioned PREFIX-MAX sweep (per-partition max
    * to the driver — one long per partition — then a seeded running
    * max; the [[orderedPrefixSums]] two-phase shape), and one join
    * back to count the items at each frontier point. */
  def paretoFrontier2d(df: DataFrame, minCol: String,
      maxCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pts = df.select(col(minCol).cast("double").as("v"),
      col(maxCol).cast("long").as("s"))
    val sized = pts.groupBy("v").agg(max(col("s")).as("s"))
      // materialized before the range exchange's boundary sampling
      .localCheckpoint()
      .repartitionByRange(col("v")).sortWithinPartitions("v")
      .as[(Double, Long)].rdd.localCheckpoint()
    val partMax = sized.mapPartitionsWithIndex { case (i, it) =>
      var m = Long.MinValue
      it.foreach(r => if (r._2 > m) m = r._2)
      Iterator((i, m))
    }.collect().sortBy(_._1)
    val off = partMax.map(_._2).scanLeft(Long.MinValue)(math.max)
    val bc = spark.sparkContext.broadcast(off)
    val frontier = sized.mapPartitionsWithIndex { case (i, it) =>
      var m = bc.value(i)
      it.flatMap { case (v, s) =>
        val keep = s > m
        if (keep) m = s
        if (keep) Some((v, s)) else None
      }
    }.toDF("v", "s")
    frontier.join(pts, Seq("v", "s"))
      .groupBy("v", "s").agg(count(lit(1)).as("n_items"))
      .select(col("v").as(minCol), col("s").as(maxCol), col("n_items"))
      .orderBy(minCol)
  }

  /** Exact per-key medians off a (k, v, na)-count frame via the
    * [[keyedPrefixSums]] sweep: the value at global rank r within key
    * k is the first v whose cumulative count reaches r, so the
    * lower/upper middle ranks (n+1)÷2 and (n+2)÷2 select ≤ 2 rows per
    * key and the median is their min/max midpoint — rank-identical to
    * a partitioned row_number window, because equal values are
    * adjacent under ANY tiebreak and the value at a rank never depends
    * on intra-tie order. Output (k, med). */
  private[operators] def keyedExactMedian(countsIn: DataFrame,
      out: String, preMaterialized: Boolean = false): DataFrame = {
    val counts0 = countsIn.select(col("k"), col("v"), col("na"))
      .withColumn("nb", lit(0L))
    // ONE materialization feeds both consumers: `tot` and the sweep
    // read the same count frame, so an unmaterialized input would run
    // its whole upstream aggregation twice (once for the totals, once
    // for the sweep's own checkpoint) — guide §1.2/§5. Callers that
    // already checkpointed (madOutliers' vc) skip the extra copy.
    val counts =
      if (preMaterialized) counts0 else counts0.localCheckpoint()
    val tot = counts.groupBy("k").agg(sum(col("na")).as("n"))
    val r1 = expr("(n + 1) div 2")
    val r2 = expr("(n + 2) div 2")
    val covers = (r: Column) =>
      col("ca") >= r && (col("ca") - col("na")) < r
    keyedPrefixSums(counts, preMaterialized = true)
      .join(broadcast(tot), "k")
      .filter(covers(r1) || covers(r2))
      .groupBy("k")
      .agg(((min(col("v")) + max(col("v"))) / lit(2.0)).as(out))
  }

  /** Two-sample Kolmogorov–Smirnov test, exact: D = max |F₁(v) − F₂(v)|
    * over the distinct observed values, with the large-sample critical
    * value c(α)·√((n₁+n₂)/(n₁·n₂)) (Smirnov 1939). One value-keyed
    * count aggregation, then the [[orderedPrefixSums]] two-phase sweep
    * — continuous scores make the distinct-value frame data-sized, so
    * no global window appears anywhere in this plan. `cAlpha` must be
    * pinned by the caller (√(−ln(α/2)/2)) so both engines compare
    * against the same double. */
  def ksTest(df: DataFrame, valueCol: String, isA: Column,
      cAlpha: Double): DataFrame = {
    val counts = df
      .select(col(valueCol).as("v"),
        when(isA, 1L).otherwise(0L).as("a"),
        when(isA, 0L).otherwise(1L).as("b"))
      .groupBy("v").agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))
      // one materialization for both consumers (totals + sweep): the
      // value-count aggregation over the raw rows runs exactly once
      .localCheckpoint()
    val tot = counts.agg(sum(col("na")).as("n1"), sum(col("nb")).as("n2"))
    val d = (c: String) => col(c).cast("double")
    orderedPrefixSums(counts, preMaterialized = true)
      .crossJoin(broadcast(tot))
      .agg(max(abs(d("ca") / d("n1") - d("cb") / d("n2"))).as("d_raw"),
        max(col("n1")).as("n1"), max(col("n2")).as("n2"))
      .select(col("n1"), col("n2"),
        trunc6(col("d_raw")).as("d_stat"),
        trunc6(lit(cAlpha) *
          sqrt((d("n1") + d("n2")) / (d("n1") * d("n2")))).as("d_crit"))
      .withColumn("reject", col("d_stat") > col("d_crit"))
  }

  /** Lorenz concentration table: entities ranked by their total value
    * DESCENDING, cut into equal-count bins, each reporting its share
    * and the running cumulative share — "the top 10% of customers carry
    * X% of revenue", the curve whose area is q195's Gini. Entity totals
    * are 8-decimal scaled LONGS and stay integer through the bin sums
    * and the running sum, so shares are one exact division per output
    * row. One entity rollup + bin aggregation over an entity-sized
    * frame; at billions of entities the decile rank rides the same
    * two-phase prefix COUNT as [[orderedPrefixSums]] (range-partition
    * by (total desc, key), per-partition row counts to the driver)
    * instead of this global row_number. */
  def lorenzDeciles(df: DataFrame, key: String, value: String,
      bins: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spend = df.select(col(key).as("k"),
        floor(col(value) * lit(1e8) + lit(0.5)).cast("long").as("v8"))
      .groupBy("k").agg(sum(col("v8")).as("s8"))
    val tot = spend.agg(count(lit(1)).as("n_all"), sum(col("s8")).as("t8"))
    val wr = Window.orderBy(col("s8").desc, col("k"))
    val binned = spend
      .withColumn("rn", row_number().over(wr).cast("long"))
      .crossJoin(broadcast(tot))
      .withColumn("bin", expr(s"(rn - 1) * $bins div n_all"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_entities"), sum(col("s8")).as("b8"),
        max(col("t8")).as("t8"))
    val wc = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned
      .withColumn("c8", sum(col("b8")).over(wc))
      .select(col("bin"), col("n_entities"),
        trunc6(col("b8").cast("double") / col("t8").cast("double")).as("share"),
        trunc6(col("c8").cast("double") / col("t8").cast("double"))
          .as("cum_share"))
      .orderBy("bin")
  }

  /** AUC of a score as a binary ranker, exact, via the Mann–Whitney
    * rank-sum identity with midrank tie handling — and INTEGER
    * arithmetic end to end: per distinct score, twice-the-average-rank
    * is `2·(count below) + count + 1` (an integer), so the rank sum,
    * the U statistic and both class totals are exact longs and the one
    * double division at the end is engine-deterministic. One
    * score-keyed aggregation, then the [[orderedPrefixSums]] two-phase
    * sweep — a continuous score makes the distinct frame data-sized,
    * so no global window appears in this plan either. */
  def aucRankSum(df: DataFrame, scoreCol: String, isPos: Column): DataFrame = {
    val counts = df
      .select(col(scoreCol).as("v"),
        when(isPos, 1L).otherwise(0L).as("pos"))
      .groupBy("v")
      .agg(count(lit(1)).as("na"), sum(col("pos")).as("nb"))
    orderedPrefixSums(counts)
      .select(col("na").as("cnt"), col("nb").as("n_pos"), col("ca").as("cum"))
      // 2·avgRank of this score's tie group = 2·(cum − cnt) + cnt + 1
      .withColumn("r2", lit(2L) * (col("cum") - col("cnt")) + col("cnt") + lit(1L))
      .agg(sum(col("n_pos") * col("r2")).as("sum_r2"),
        sum(col("n_pos")).as("np"),
        sum(col("cnt") - col("n_pos")).as("nn"))
      .select(col("np").as("n_pos"), col("nn").as("n_neg"),
        trunc6((col("sum_r2") - col("np") * (col("np") + lit(1L))).cast("double") /
          (lit(2L) * col("np") * col("nn")).cast("double")).as("auc"))
  }

  /** Exact weighted quantiles per group: the value whose cumulative
    * weight first reaches q·W — the lower weighted median convention,
    * decided entirely in INTEGER arithmetic (`4·cumw ≥ k·W` for
    * quarters), so no engine's floating point can flip a boundary row.
    * Group keys here are LOW-cardinality (return flags) with
    * data-sized groups, so a partitioned window would collapse to
    * |keys| single-task sorts; instead per-(key, value) weight totals
    * ride the [[keyedPrefixSums]] two-phase sweep and the crossing
    * value is the unique row with 4·prev < k·W ≤ 4·cum — identical to
    * the first-ranked-row rule, because every row of a value tie-group
    * shares its value. Weights must be non-negative integers
    * (cast-checked by the caller); null values are excluded by
    * contract and the key returns as STRING (the sweep-family key
    * form). An all-zero-weight group degenerates to its minimum value
    * at every quantile — the first-ranked-row rule's own limit. */
  def weightedQuantiles(df: DataFrame, key: String, value: String,
      weight: String): DataFrame = {
    val counts = df
      .select(col(key).cast("string").as("k"),
        col(value).cast("double").as("v"),
        col(weight).cast("long").as("na"))
      .filter(col("v").isNotNull)
      .groupBy("k", "v").agg(sum(col("na")).as("na"))
      .withColumn("nb", lit(0L))
      // one materialization for both consumers (per-key totals + sweep)
      .localCheckpoint()
    val tot = counts.groupBy("k")
      .agg(sum(col("na")).as("w_total"), min(col("v")).as("v_min"))
    keyedPrefixSums(counts, preMaterialized = true)
      .join(broadcast(tot), "k")
      .select(col("k"), col("v"), col("na"), col("ca"), col("w_total"),
        col("v_min"), explode(array(lit(1L), lit(2L), lit(3L))).as("qk"))
      .filter((lit(4L) * col("ca") >= col("qk") * col("w_total") &&
        lit(4L) * (col("ca") - col("na")) < col("qk") * col("w_total")) ||
        // W = 0: every cumulative weight ties at the threshold, and the
        // min-rank rule picks the group's first value — same as the
        // oracle's `4·cumw ≥ k·W` selecting rank 1
        (col("w_total") === 0L && col("v") === col("v_min")))
      .select(col("k").as(key),
        (col("qk").cast("double") / lit(4.0)).as("q"),
        col("w_total"), col("v").as("value"))
      .orderBy(key, "q")
  }

  /** Mutual information between two discrete columns, exact: the
    * dependence screen run before trusting a feature pair. Each cell's
    * contribution `(n_xy/N)·ln(N·n_xy/(n_x·n_y))` rides ONE
    * product-form log; the (possibly negative) terms sum on the
    * 12-decimal decimal grid, order-free. Marginal entropies come from
    * the same counts, so the normalized score NMI = MI/√(H_x·H_y)
    * ships too. Contingency cells are vocabulary-sized — nothing here
    * scales with rows except the first count. */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df.select(col(xCol).as("x"), col(yCol).as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("n_xy"))
    val mx = cells.groupBy("x").agg(sum(col("n_xy")).as("n_x"))
    val my = cells.groupBy("y").agg(sum(col("n_xy")).as("n_y"))
    val tot = cells.agg(sum(col("n_xy")).as("n"))
    val d = (c: String) => col(c).cast("double")
    val joined = cells.join(broadcast(mx), "x").join(broadcast(my), "y")
      .crossJoin(broadcast(tot))
    val mi = joined.agg(
      count(lit(1)).as("n_cells"),
      dsum12((d("n_xy") / d("n")) *
        log(d("n") * d("n_xy") / (d("n_x") * d("n_y")))).as("mi_raw"))
    val hx = mx.crossJoin(broadcast(tot))
      .agg(dsum12(-(d("n_x") / d("n")) * log(d("n_x") / d("n"))).as("h_x"))
    val hy = my.crossJoin(broadcast(tot))
      .agg(dsum12(-(d("n_y") / d("n")) * log(d("n_y") / d("n"))).as("h_y"))
    mi.crossJoin(hx).crossJoin(hy)
      .select(col("n_cells"), trunc6(col("mi_raw")).as("mi"),
        trunc6(col("h_x")).as("h_x"), trunc6(col("h_y")).as("h_y"),
        trunc6(col("mi_raw") / sqrt(col("h_x") * col("h_y"))).as("nmi"))
  }

  /** Spearman rank correlation, exact with midrank ties: Pearson over
    * twice-the-midranks, which are INTEGERS (`2·(count below) + count
    * + 1`, the q211 identity), so every rank is exact and the moment
    * sums ride the 12-decimal order-free decimal grid over
    * integer-valued doubles (products stay exactly representable while
    * 4n² < 2⁵³, i.e. n below ~47 M rows — past that, swap the moment
    * sums to DECIMAL(38,0) accumulation; the rank sweep itself already
    * scales). Ranks come from the [[orderedPrefixSums]] two-phase sweep
    * — continuous values make the distinct frame data-sized, so no
    * global window appears — and rejoin by value (two value-keyed
    * shuffles). Doubling ranks cancels in the correlation ratio. */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val rows = df.select(col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y"))
    def ranks(c: String) = orderedPrefixSums(
        rows.groupBy(col(c).as("v")).agg(count(lit(1)).as("na"))
          .withColumn("nb", lit(0L)))
      .select(col("v"),
        (lit(2L) * (col("ca") - col("na")) + col("na") + lit(1L)).as("r2"))
    val d = (c: String) => col(c).cast("double")
    rows
      .join(ranks("x").toDF("x", "r2x"), "x")
      .join(ranks("y").toDF("y", "r2y"), "y")
      // the doubled midranks are integers, so their double products are
      // exact (≤ 2⁵³ up to ~9·10⁷ rows) and psum6's scaled-long sum is
      // bit-equal to the oracle's decimal sum — minus the per-row
      // BigDecimal cast dsum12 paid on all three moment columns
      .agg(count(lit(1)).as("n"),
        sum(col("r2x")).as("sx"), sum(col("r2y")).as("sy"),
        psum6(d("r2x") * d("r2y")).as("sxy"),
        psum6(d("r2x") * d("r2x")).as("sxx"),
        psum6(d("r2y") * d("r2y")).as("syy"))
      .select(col("n"),
        trunc6((d("n") * col("sxy") - d("sx") * d("sy")) /
          sqrt((d("n") * col("sxx") - d("sx") * d("sx")) *
            (d("n") * col("syy") - d("sy") * d("sy")))).as("rho"))
  }

  /** Pearson chi-square test of independence over two discrete columns
    * + Cramér's V effect size: the categorical counterpart of
    * [[mutualInformation]], same contingency-cell plan (one count
    * aggregation, broadcast marginals, nothing else scales with rows).
    * The statistic sums over ALL r×c cells of the marginal cross
    * product — an observed-zero cell still contributes its full E
    * (dropping them understates χ² exactly where association is
    * strongest). Expected counts and the (O−E)²/E terms are double
    * math from exact integer counts, summed on the 12-decimal
    * order-free grid. */
  def chiSquareIndependence(df: DataFrame, xCol: String,
      yCol: String): DataFrame = {
    val cells = df.select(col(xCol).as("x"), col(yCol).as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("n_xy"))
    val mx = cells.groupBy("x").agg(sum(col("n_xy")).as("n_x"))
    val my = cells.groupBy("y").agg(sum(col("n_xy")).as("n_y"))
    val tot = cells.agg(sum(col("n_xy")).as("n"),
      countDistinct(col("x")).as("r"), countDistinct(col("y")).as("c"))
    val d = (c: String) => col(c).cast("double")
    val e = d("n_x") * d("n_y") / d("n")
    mx.crossJoin(my)
      .join(cells, Seq("x", "y"), "left")
      .withColumn("n_xy", coalesce(col("n_xy"), lit(0L)))
      .crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n"), max(col("r")).as("r"), max(col("c")).as("c"),
        dsum12((d("n_xy") - e) * (d("n_xy") - e) / e).as("chi2_raw"))
      .select(col("n"), col("r"), col("c"),
        ((col("r") - lit(1L)) * (col("c") - lit(1L))).as("dof"),
        trunc6(col("chi2_raw")).as("chi2"),
        trunc6(sqrt(col("chi2_raw") / (d("n") *
          least(col("r") - lit(1L), col("c") - lit(1L)).cast("double"))))
          .as("cramers_v"))
  }

  /** Per-group Welch moments on centi-scaled integer values → the
    * t statistic and Welch–Satterthwaite df, computed IN v2 units
    * (both are invariant under common scaling, so the /100 never
    * appears and no rescaling FP runs). Sample variance from exact
    * long moments; one aggregation, no shuffle beyond it. */
  private def welchFrom(g: DataFrame): DataFrame = {
    val d = (c: String) => col(c).cast("double")
    val va = (d("qa") - d("sa") * d("sa") / d("na")) / (d("na") - lit(1.0))
    val vb = (d("qb") - d("sb") * d("sb") / d("nb")) / (d("nb") - lit(1.0))
    val sea = va / d("na")
    val seb = vb / d("nb")
    g.withColumn("t_raw", (d("sa") / d("na") - d("sb") / d("nb")) / sqrt(sea + seb))
      .withColumn("df_raw", (sea + seb) * (sea + seb) /
        (sea * sea / (d("na") - lit(1.0)) + seb * seb / (d("nb") - lit(1.0))))
  }

  /** Welch two-sample t-test (unequal variances): group A = `isA`
    * rows, group B = the rest. Values are centi-scaled to exact longs
    * (the q224 grid), so n/Σv/Σv² are exact integers and the only
    * doubles are the final t and df expressions — which are computed in
    * scaled units because both are scale-invariant. One
    * map-side-combinable aggregation over the whole frame. */
  def welchTTest(df: DataFrame, valueCol: String, isA: Column): DataFrame = {
    val v2 = floor(col(valueCol) * lit(100.0) + lit(0.5)).cast("long")
    val base = df.select(when(isA, 1L).otherwise(0L).as("a"), v2.as("v2"))
    val g = base.agg(
      sum(col("a")).as("na"), sum(col("a") * col("v2")).as("sa"),
      sum(col("a") * col("v2") * col("v2")).as("qa"),
      sum(lit(1L) - col("a")).as("nb"),
      sum((lit(1L) - col("a")) * col("v2")).as("sb"),
      sum((lit(1L) - col("a")) * col("v2") * col("v2")).as("qb"))
    welchFrom(g).select(col("na").as("n_a"), col("nb").as("n_b"),
      trunc6(col("sa").cast("double") / col("na").cast("double") / lit(100.0))
        .as("mean_a"),
      trunc6(col("sb").cast("double") / col("nb").cast("double") / lit(100.0))
        .as("mean_b"),
      trunc6(col("t_raw")).as("t"), trunc6(col("df_raw")).as("df"))
  }

  /** Standard-normal upper tail 1 − Φ(x), x ≥ 0, via the Abramowitz &
    * Stegun 26.2.17 five-term polynomial (|ε| < 7.5e-8) in Horner form —
    * every coefficient a pinned literal, so both engines execute the
    * identical IEEE expression tree. */
  private[operators] def normalUpperTail(x: Column): Column = {
    val k = lit(1.0) / (lit(1.0) + lit(0.2316419) * x)
    val poly = k * (lit(0.319381530) + k * (lit(-0.356563782) +
      k * (lit(1.781477937) + k * (lit(-1.821255978) + k * lit(1.330274429)))))
    exp(-(x * x) / lit(2.0)) * lit(InvSqrt2Pi) * poly
  }

  /** 1/√(2π), pinned once so the Spark expression and the oracle text
    * interpolate the SAME double. */
  val InvSqrt2Pi: Double = 1.0 / math.sqrt(2.0 * math.Pi)

  /** Benjamini–Hochberg FDR over one Welch t-test per key (group B =
    * `isB` rows within the key): the multiple-testing control run over
    * a metrics sweep before believing any "segment X moved" readout.
    * Per-key exact moments ride one aggregation; the m test rows are
    * key-sized, so the BH rank window is tiny BY CONSTRUCTION (one row
    * per key — this is the rare case where a global window is correct
    * at any data scale). p-values use the large-sample normal
    * approximation through [[normalUpperTail]]. Rejects every p at
    * rank i ≤ max{i : p_i ≤ i·α/m} (the step-up rule). */
  def bhFdr(df: DataFrame, key: String, valueCol: String, isB: Column,
      alpha: Double = 0.05): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v2 = floor(col(valueCol) * lit(100.0) + lit(0.5)).cast("long")
    val base = df.select(col(key), when(isB, 0L).otherwise(1L).as("a"),
      v2.as("v2"))
    val g = base.groupBy(key).agg(
      sum(col("a")).as("na"), sum(col("a") * col("v2")).as("sa"),
      sum(col("a") * col("v2") * col("v2")).as("qa"),
      sum(lit(1L) - col("a")).as("nb"),
      sum((lit(1L) - col("a")) * col("v2")).as("sb"),
      sum((lit(1L) - col("a")) * col("v2") * col("v2")).as("qb"))
      .filter(col("na") >= 2 && col("nb") >= 2)
    val tested = welchFrom(g)
      .withColumn("p_raw", lit(2.0) * normalUpperTail(abs(col("t_raw"))))
    val wr = Window.orderBy(col("p_raw"), col(key))
    val wAll = Window.partitionBy()
    val ranked = tested
      .withColumn("rank", row_number().over(wr).cast("long"))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("p_cut",
        col("rank").cast("double") * lit(alpha) / col("m").cast("double"))
      .withColumn("k_star", max(when(col("p_raw") <= col("p_cut"),
        col("rank"))).over(wAll))
    ranked.select(col(key), col("rank"),
        col("na").as("n_a"), col("nb").as("n_b"),
        trunc6(col("t_raw")).as("t"), trunc6(col("p_raw")).as("p"),
        coalesce(col("rank") <= col("k_star"), lit(false)).as("reject"))
      .orderBy("rank")
  }

  /** Kaplan–Meier survival estimator over (duration, observed) rows —
    * right-censored lifetimes, the churn curve. At each distinct
    * OBSERVED duration t: d = events at t, n = subjects with duration
    * ≥ t; the log-survival is the running sum of ln(1 − d/n) in
    * ascending-t order. The t-frame is duration-valued (days), so the
    * windows run over a bounded frame. Each ln term is half-up
    * quantized to the 12-decimal grid and the running sum rides exact
    * LONGS — a windowed double sum would be at the mercy of the
    * engine's frame-evaluation order (segment trees regroup FP adds);
    * the integer grid is order-free by construction. Survival itself
    * is one exp of the running log-sum. */
  def kaplanMeier(durations: DataFrame, durCol: String,
      observedCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = durations.select(col(durCol).cast("long").as("t"),
      when(col(observedCol), 1L).otherwise(0L).as("ev"))
    val tot = base.agg(count(lit(1)).as("n_all"))
    val byT = base.groupBy("t")
      .agg(count(lit(1)).as("n_t"), sum(col("ev")).as("d"))
    val d = (c: String) => col(c).cast("double")
    byT.crossJoin(broadcast(tot))
      .withColumn("n_risk", col("n_all") -
        coalesce(sum(col("n_t")).over(Window.orderBy("t")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("d") > 0)
      // d == n_risk is the terminal drop to S = 0 (only possible on the
      // last event row): ln is −∞ there, so it is excluded from the
      // grid sum and reported as NULL ln / 0 survival
      .withColumn("lt12", when(col("d") < col("n_risk"),
        floor(log(lit(1.0) - d("d") / d("n_risk")) *
          lit(1e12) + lit(0.5)).cast("long")))
      .withColumn("ln_s", when(col("d") < col("n_risk"),
        sum(col("lt12")).over(Window.orderBy("t")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double") / lit(1e12)))
      .select(col("t"), col("n_risk"), col("d"),
        trunc6(col("ln_s")).as("ln_survival"),
        when(col("d") < col("n_risk"), trunc6(exp(col("ln_s"))))
          .otherwise(lit(0.0)).as("survival"))
      .orderBy("t")
  }

  /** Mann–Kendall trend test per group over a (group, t, value) series
    * with values pre-quantized to exact longs: S = Σ_{i<j}
    * sign(x_j − x_i) stays INTEGER, the tie-corrected variance
    * n(n−1)(2n+5)/18 − Σ_t t(t−1)(2t+5)/18 uses exact tie counts from
    * the quantized values, and the continuity-corrected z is the only
    * double math. The pairwise join is per-group over the bounded
    * t-frame (days) — never over raw rows; a decade is ~3.7k points,
    * 7M pairs per group, each a subtraction. `zCrit` must be pinned by
    * the caller (e.g. 1.959964 for α=0.05). */
  def mannKendall(series: DataFrame, key: String, tCol: String,
      v8Col: String, zCrit: Double): DataFrame = {
    val a = series.select(col(key), col(tCol).as("ti"), col(v8Col).as("xi"))
    val b = series.select(col(key), col(tCol).as("tj"), col(v8Col).as("xj"))
    val s = a.join(b, key).filter(col("ti") < col("tj"))
      .groupBy(key)
      .agg(sum(signum(col("xj") - col("xi")).cast("long")).as("s"),
        count(lit(1)).as("n_pairs"))
    val n = series.groupBy(key).agg(count(lit(1)).as("n"))
    val ties = series.groupBy(key, v8Col).agg(count(lit(1)).as("t"))
      .groupBy(key)
      .agg(sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5)).as("tie_sum"))
    val d = (c: String) => col(c).cast("double")
    val varS = (d("n") * (d("n") - lit(1.0)) * (lit(2.0) * d("n") + lit(5.0)) -
      d("tie_sum")) / lit(18.0)
    val z = when(col("s") > 0, (d("s") - lit(1.0)) / sqrt(varS))
      .when(col("s") < 0, (d("s") + lit(1.0)) / sqrt(varS))
      .otherwise(lit(0.0))
    s.join(n, key).join(ties, key)
      .select(col(key), col("n"), col("s"),
        trunc6(varS).as("var_s"), trunc6(z).as("z"),
        when(z > lit(zCrit), "increasing")
          .when(z < -lit(zCrit), "decreasing")
          .otherwise("no trend").as("trend"))
      .orderBy(key)
  }

  /** Theil–Sen robust slope per group: the LOWER MEDIAN of all
    * pairwise slopes (x_j − x_i)/(t_j − t_i), i<j — the estimator that
    * shrugs off ~29% outliers where OLS folds. Values arrive as exact
    * 8-decimal scaled longs, each slope is one pinned double
    * expression, and the median is rank-picked under a fully
    * tie-broken order (slope, ti, tj) — the q192 lower-rank
    * convention, decided by integer comparison. Pairs are per-group
    * over the bounded t-frame, same cost envelope as [[mannKendall]].
    */
  def theilSen(series: DataFrame, key: String, tCol: String,
      v8Col: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = series.select(col(key), col(tCol).as("ti"), col(v8Col).as("xi"))
    val b = series.select(col(key), col(tCol).as("tj"), col(v8Col).as("xj"))
    val d = (c: String) => col(c).cast("double")
    val slopes = a.join(b, key).filter(col("ti") < col("tj"))
      .select(col(key), col("ti"), col("tj"),
        (((d("xj") - d("xi")) / lit(1e8)) /
          (d("tj") - d("ti"))).as("slope"))
    val w = Window.partitionBy(key)
      .orderBy(col("slope"), col("ti"), col("tj"))
    slopes
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n_pairs", count(lit(1)).over(Window.partitionBy(key)))
      .filter(col("rn") === expr("(n_pairs + 1) div 2"))
      .select(col(key), col("n_pairs"), trunc6(col("slope")).as("median_slope"))
      .orderBy(key)
  }

  /** Population Stability Index between a reference and a current
    * population of `valueCol` (the model-monitoring drift gate):
    * decile edges come from the REFERENCE side by the q192 integer
    * rank convention on centi-quantized values, both sides bin by
    * integer comparison against the broadcast edge array, proportions
    * are Laplace-smoothed (+1 / +bins — an empty current bin must
    * contribute finitely), and each bin's (p−q)·ln(p/q) lands on the
    * 12-decimal grid; the headline PSI is an order-free integer window
    * sum of the quantized contributions. One rank sweep over the
    * reference + one bin count — nothing scales past the two scans. */
  def psi(df: DataFrame, valueCol: String, isRef: Column,
      bins: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(when(isRef, 1L).otherwise(0L).as("ref"),
      floor(col(valueCol) * lit(100.0) + lit(0.5)).cast("long").as("v2"))
    val ref = base.filter(col("ref") === 1L)
    // Decile edges by the q192 integer rank rule — edge k is the value
    // at rank ⌈k·n/bins⌉ (the least rn with bins·rn ≥ k·n) — read off
    // the [[orderedPrefixSums]] VALUE-level sweep instead of a global
    // row_number window: the reference side is data-sized, and the old
    // single-partition Window sorted all of it in one task (r13 verdict
    // #6). The value at a rank never depends on intra-tie order, so the
    // covering count row carries exactly the ranked row's v2; duplicate
    // edge values (two ks landing in one tie group) survive via one
    // (k, v2) row per probe, keeping `es` the same multiset. v2 is a
    // centi-quantized long ≪ 2^53, so the sweep's double round-trips
    // exactly.
    val cnts = ref.groupBy("v2")
      .agg(count(lit(1)).as("na"))
      .select(col("v2").cast("double").as("v"), col("na"), lit(0L).as("nb"))
      // one materialization for both consumers (reference total + sweep)
      .localCheckpoint()
    val refTot = cnts.agg(sum(col("na")).as("n"))
    val edges: DataFrame = orderedPrefixSums(cnts, preMaterialized = true)
      .crossJoin(broadcast(refTot))
      .select(col("v"), col("na"), col("ca"), col("n"),
        explode(sequence(lit(1), lit(bins - 1))).as("k"))
      .withColumn("rk", expr(s"(k * n + ${bins - 1}) div $bins"))
      .filter(col("ca") >= col("rk") && col("ca") - col("na") < col("rk"))
      .agg(sort_array(collect_list(col("v").cast("long"))).as("es"))
    val d = (c: String) => col(c).cast("double")
    val binned = base.crossJoin(broadcast(edges))
      .withColumn("bin", expr("size(filter(es, e -> v2 > e))").cast("long"))
      .groupBy("bin")
      .agg(sum(col("ref")).as("n_ref"), sum(lit(1L) - col("ref")).as("n_cur"))
    val tot = binned.agg(sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
    val p = (d("n_ref") + lit(1.0)) / (d("t_ref") + lit(bins.toDouble))
    val q = (d("n_cur") + lit(1.0)) / (d("t_cur") + lit(bins.toDouble))
    binned.crossJoin(broadcast(tot))
      .withColumn("contrib_raw", (p - q) * log(p / q))
      .withColumn("c12", floor(col("contrib_raw") * lit(1e12) + lit(0.5)).cast("long"))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        trunc6(col("contrib_raw")).as("contribution"),
        trunc6(sum(col("c12")).over(Window.partitionBy()).cast("double") / lit(1e12))
          .as("psi"))
      .orderBy("bin")
  }

  /** Grouped simple-OLS diagnostics beyond q132's slope/intercept:
    * R², residual standard error, the slope's standard error and its
    * t statistic — all from the SAME five exact moment sums (scaled-
    * long / million-base), one aggregation, centered second moments in
    * pinned double expressions. The inference layer every "the metric
    * moved with X" claim should pass before shipping. */
  def olsDiagnostics(df: DataFrame, key: String, xCol: String,
      yCol: String): DataFrame = {
    val (x, y) = (col(xCol), col(yCol))
    val d = (c: String) => col(c).cast("double")
    val sxx = col("sxx") - d("sx") * d("sx") / d("n")
    val sxy = col("sxy") - d("sx") * d("sy") / d("n")
    val syy = col("syy") - d("sy") * d("sy") / d("n")
    val slope = sxy / sxx
    val sse = syy - slope * sxy
    val s2 = sse / (d("n") - lit(2.0))
    val seSlope = sqrt(s2 / sxx)
    df.groupBy(key)
      .agg(count(lit(1)).as("n"),
        xsum(x).as("sx"), xsum(y).as("sy"),
        psum6(x * y).as("sxy"), psum6(x * x).as("sxx"), psum6(y * y).as("syy"))
      .select(col(key), col("n"),
        trunc6(slope).as("slope"),
        trunc6((col("sy") - slope * col("sx")) / d("n")).as("intercept"),
        trunc6(sxy * sxy / (sxx * syy)).as("r2"),
        trunc6(sqrt(s2)).as("resid_se"),
        trunc6(seSlope).as("slope_se"),
        trunc6(slope / seSlope).as("t_slope"))
      .orderBy(key)
  }

  /** Information gain of each categorical feature against a binary
    * label (the decision-stump screen run before any feature makes it
    * into a model): IG = H(label) − Σ_v (n_v/n)·H(label|v), entropies
    * from exact counts with the 0·ln0 convention, conditional terms on
    * the 12-decimal order-free grid. Input is the melted
    * (feature, value, label) frame; cells are vocabulary-sized after
    * one count. */
  def informationGain(df: DataFrame, featureCol: String, valueCol: String,
      labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = (c: String) => col(c).cast("double")
    def h(pos: Column, n: Column): Column = {
      val p = pos.cast("double") / n.cast("double")
      when(pos === 0L || pos === n, lit(0.0))
        .otherwise(-p * log(p) - (lit(1.0) - p) * log(lit(1.0) - p))
    }
    val cells = df.select(col(featureCol).as("f"), col(valueCol).as("v"),
        col(labelCol).cast("long").as("y"))
      .groupBy("f", "v")
      .agg(count(lit(1)).as("n_v"), sum(col("y")).as("pos_v"))
    val perF = cells.groupBy("f")
      .agg(sum(col("n_v")).as("n"), sum(col("pos_v")).as("pos"),
        count(lit(1)).as("n_values"))
    val cond = cells.join(broadcast(perF.select(col("f"), col("n"))), "f")
      .groupBy("f")
      .agg(dsum12((d("n_v") / d("n")) * h(col("pos_v"), col("n_v"))).as("h_cond"))
    perF.join(cond, "f")
      // IG is provably ≥ 0; the 12-decimal grid can land an ulp below,
      // which floor-truncation would show as −1e-6 — clamp it
      .withColumn("ig_raw",
        greatest(h(col("pos"), col("n")) - col("h_cond"), lit(0.0)))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("ig_raw").desc, col("f"))).cast("long"))
      .select(col("rank"), col("f").as("feature"), col("n_values"),
        trunc6(col("ig_raw")).as("info_gain"))
      .orderBy("rank")
  }

  /** Item–item cosine similarity over binary basket co-occurrence
    * (the classic Sarwar et al. 2001 item-based CF kernel): sim(a,b) =
    * n_ab / √(n_a·n_b), mined with the row-local sorted-pair fan-out
    * (no basket self-join) and a support floor that doubles as the
    * hub cap. Counts stay integer to the one final double expression.
    * Returns the UNDIRECTED pair list above `minPairs`. */
  def itemCosine(baskets: DataFrame, basketCol: String, itemCol: String,
      minPairs: Long = 2): DataFrame = {
    val b = baskets.select(col(basketCol).as("bid"), col(itemCol).as("item"))
    // collect_set IS the per-basket distinct, so the raw rows shuffle
    // ONCE (bid-keyed, with map-side partial sets combining repeats) —
    // the former standalone .distinct() paid a second full exchange of
    // the same rows keyed (bid, item) for rows this aggregation was
    // about to dedup anyway (guide §2.4). Item supports then come off
    // the basket arrays (one row per distinct (bid, item) by
    // construction), not from a second pass over the raw frame.
    val ps = b.groupBy("bid")
      .agg(sort_array(collect_set(col("item"))).as("ps"))
      .localCheckpoint()
    val itemCnt = ps.select(explode(col("ps")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("n_item"))
    val d = (c: String) => col(c).cast("double")
    ps
      // sequence(1, 0) is DESCENDING in Spark — guard 1-item baskets
      .filter(size(col("ps")) >= 2)
      .select(explode(expr(
        "flatten(transform(sequence(1, size(ps) - 1), " +
          "i -> transform(slice(ps, i + 1, size(ps) - i), " +
          "x -> struct(ps[i - 1] AS ia, x AS ib))))")).as("p"))
      .groupBy(col("p.ia").as("ia"), col("p.ib").as("ib"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairs)
      .join(broadcast(itemCnt.toDF("ia", "n_a")), "ia")
      .join(broadcast(itemCnt.toDF("ib", "n_b")), "ib")
      .select(col("ia"), col("ib"), col("n_ab"), col("n_a"), col("n_b"),
        trunc6(d("n_ab") / sqrt(d("n_a") * d("n_b"))).as("sim"))
  }

  /** Item-based CF recommendations: each user's candidate items are
    * the similarity-neighbors of what they already hold, scored by the
    * SUM of link similarities (12-decimal order-free), already-held
    * items anti'd out, top-`topN` per user via the per-key rank. The
    * join fan-out is (holdings × neighbor degree) — bounded by the
    * support floor inside [[itemCosine]]; user holdings and the pair
    * graph co-partition on item, so at catalog scale this is two
    * item-keyed shuffles and one user-keyed rank. */
  def recommendItems(baskets: DataFrame, userCol: String, basketCol: String,
      itemCol: String, minPairs: Long = 2, topN: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sims = itemCosine(baskets, basketCol, itemCol, minPairs)
    val directed = sims.select(col("ia").as("item"), col("ib").as("cand"), col("sim"))
      .unionAll(sims.select(col("ib").as("item"), col("ia").as("cand"), col("sim")))
    val held = baskets.select(col(userCol).as("user"), col(itemCol).as("item"))
      .distinct()
    val w = Window.partitionBy("user")
      .orderBy(col("score").desc, col("cand"))
    held.join(directed, "item")
      .groupBy("user", "cand")
      // sims sit on the trunc6 grid, so the 8-decimal scaled-long sum
      // is exact and bit-equal to the oracle's decimal sum — without
      // dsum12's per-row BigDecimal cast on the holdings×degree fan-out
      .agg(zsum8(col("sim")).as("score_raw"), count(lit(1)).as("n_links"))
      .join(held.select(col("user"), col("item").as("cand")),
        Seq("user", "cand"), "left_anti")
      .withColumn("score", trunc6(col("score_raw")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topN)
      .select(col("user"), col("rank"), col("cand").as("item"),
        col("n_links"), col("score"))
      .orderBy("user", "rank")
  }

  /** Seasonal-naive forecast backtest over a per-group daily series on
    * the 8-decimal integer grid: forecast(t) = value(t − `season`),
    * matched by exact day join (gap-safe, unlike a row lag). MAE rides
    * integer absolute diffs; sMAPE terms are one pinned double
    * expression on the 12-decimal grid; MASE scales MAE by the
    * in-sample naive-1 MAE (day−1 join), the Hyndman & Koehler 2006
    * denominator. One self-join per horizon over the bounded day
    * frame. */
  def forecastBacktest(series: DataFrame, key: String, tCol: String,
      v8Col: String, season: Int = 7): DataFrame = {
    val cur = series.select(col(key), col(tCol).as("t"), col(v8Col).as("v8"))
    val sea = series.select(col(key), (col(tCol) + lit(season.toLong)).as("t"),
      col(v8Col).as("f8"))
    val one = series.select(col(key), (col(tCol) + lit(1L)).as("t"),
      col(v8Col).as("p8"))
    val d = (c: String) => col(c).cast("double")
    val joined = cur.join(sea, Seq(key, "t")).join(one, Seq(key, "t"))
    joined.groupBy(key)
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("v8") - col("f8"))).as("ae8"),
        sum(abs(col("v8") - col("p8"))).as("naive8"),
        dsum12(lit(2.0) * abs(d("v8") - d("f8")) /
          (abs(d("v8")) + abs(d("f8")))).as("smape_raw"))
      .select(col(key), col("n_days"),
        trunc6(d("ae8") / d("n_days") / lit(1e8)).as("mae"),
        trunc6(col("smape_raw") / d("n_days")).as("smape"),
        trunc6(d("ae8") / d("naive8")).as("mase"))
      .orderBy(key)
  }

  /** Nelson–Aalen cumulative hazard over the [[kaplanMeier]] input
    * frame: H(t) = Σ_{tᵢ ≤ t} d/n, each term half-up quantized to the
    * 12-decimal grid so the running sum rides exact longs (same
    * order-free-window rationale as KM's log-survival). */
  def nelsonAalen(durations: DataFrame, durCol: String,
      observedCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = durations.select(col(durCol).cast("long").as("t"),
      when(col(observedCol), 1L).otherwise(0L).as("ev"))
    val tot = base.agg(count(lit(1)).as("n_all"))
    val byT = base.groupBy("t")
      .agg(count(lit(1)).as("n_t"), sum(col("ev")).as("d"))
    val d = (c: String) => col(c).cast("double")
    byT.crossJoin(broadcast(tot))
      .withColumn("n_risk", col("n_all") -
        coalesce(sum(col("n_t")).over(Window.orderBy("t")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("d") > 0)
      .withColumn("h12", floor(d("d") / d("n_risk") * lit(1e12) + lit(0.5))
        .cast("long"))
      .withColumn("haz", sum(col("h12")).over(Window.orderBy("t")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double") / lit(1e12))
      .select(col("t"), col("n_risk"), col("d"),
        trunc6(col("haz")).as("cum_hazard"))
      .orderBy("t")
  }

  /** Frequent 3-itemsets over (basket, item) pairs: the next lattice
    * level above [[associationRules]]' pairs, mined with the same
    * ROW-LOCAL fan-out — each basket's sorted distinct item array
    * expands to its C(n,3) ordered triples in place, so no basket
    * self-join ever happens and the only data-sized exchange is the
    * basket groupBy. The support floor prunes before the global count
    * ships anything wide. Top-k by support with full tie-breaks. */
  def frequentTriples(baskets: DataFrame, basketCol: String,
      itemCol: String, minSupport: Long = 2, topK: Int = 15): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // collect_set IS the per-basket distinct — no standalone exchange
    // ahead of it (the itemCosine/associationRules treatment, §2.4)
    baskets.select(col(basketCol).as("bid"), col(itemCol).as("item"))
      .groupBy("bid")
      .agg(sort_array(collect_set(col("item"))).as("ps"))
      .filter(size(col("ps")) >= 3)
      .select(explode(expr(
        "flatten(transform(sequence(1, size(ps) - 2), i -> " +
          "flatten(transform(sequence(i + 1, size(ps) - 1), j -> " +
          "transform(slice(ps, j + 1, size(ps) - j), x -> " +
          "struct(ps[i - 1] AS a, ps[j - 1] AS b, x AS c))))))")).as("t"))
      .groupBy(col("t.a").as("a"), col("t.b").as("b"), col("t.c").as("c"))
      .agg(count(lit(1)).as("n_baskets"))
      .filter(col("n_baskets") >= minSupport)
      .withColumn("rank", row_number().over(Window.orderBy(
        col("n_baskets").desc, col("a"), col("b"), col("c"))).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("rank"), col("a"), col("b"), col("c"), col("n_baskets"))
      .orderBy("rank")
  }

  /** Two-proportion z-test (pooled variance): the A/B readout for
    * binary outcomes — conversion in cohort A vs cohort B. All counts
    * exact integers from one aggregation; the pooled rate, z and the
    * verdict against the caller-pinned normal cut are the only double
    * math. */
  def twoProportionZ(df: DataFrame, isA: Column, isSuccess: Column,
      zCrit: Double): DataFrame = {
    val d = (c: String) => col(c).cast("double")
    val g = df.select(when(isA, 1L).otherwise(0L).as("a"),
        when(isSuccess, 1L).otherwise(0L).as("s"))
      .agg(sum(col("a")).as("n1"), sum(col("a") * col("s")).as("x1"),
        sum(lit(1L) - col("a")).as("n2"),
        sum((lit(1L) - col("a")) * col("s")).as("x2"))
    val p1 = d("x1") / d("n1")
    val p2 = d("x2") / d("n2")
    val pp = (d("x1") + d("x2")) / (d("n1") + d("n2"))
    val z = (p1 - p2) / sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / d("n1") + lit(1.0) / d("n2")))
    g.select(col("n1"), col("x1"), col("n2"), col("x2"),
      trunc6(p1).as("p1"), trunc6(p2).as("p2"), trunc6(z).as("z"),
      (abs(z) > lit(zCrit)).as("significant"))
  }

  /** Association rules over (basket, item) pairs (Agrawal & Srikant
    * 1994): support / confidence / lift for every directed rule whose
    * item pair co-occurs in ≥ `minPairs` baskets, top-k by lift. The
    * pair fan-out is ROW-LOCAL from each basket's sorted distinct item
    * array (the q154 pattern — no basket self-join), item and basket
    * totals are broadcast-sized, and lift rides one product-form
    * expression. At 100 TB the only data-sized exchange is the basket
    * groupBy; candidate pairs are pruned by the support floor before
    * any join. */
  def associationRules(baskets: DataFrame, basketCol: String,
      itemCol: String, minPairs: Long = 3, topK: Int = 15): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = baskets.select(col(basketCol).as("bid"), col(itemCol).as("item"))
    // collect_set IS the per-basket distinct (the itemCosine treatment,
    // guide §2.4): the raw rows shuffle ONCE, bid-keyed with map-side
    // partial sets combining repeats — the former standalone
    // .distinct() paid a second full exchange keyed (bid, item) for
    // rows this aggregation dedups anyway, and the basket total +
    // item supports each re-scanned that deduped frame. Both now come
    // off the basket arrays: one row per basket (so count(1) IS
    // countDistinct(bid)), one element per distinct (bid, item).
    val ps = b.groupBy("bid")
      .agg(sort_array(collect_set(col("item"))).as("ps"))
      .localCheckpoint()
    val nBaskets = ps.agg(count(lit(1)).as("n_baskets"))
    val itemCnt = ps.select(explode(col("ps")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("n_item"))
    val pairs = ps
      // sequence(1, 0) is DESCENDING in Spark — guard 1-item baskets
      .filter(size(col("ps")) >= 2)
      .select(explode(expr(
        "flatten(transform(sequence(1, size(ps) - 1), " +
          "i -> transform(slice(ps, i + 1, size(ps) - i), " +
          "x -> struct(ps[i - 1] AS ia, x AS ib))))")).as("p"))
      .groupBy(col("p.ia").as("ia"), col("p.ib").as("ib"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairs)
    val directed = pairs
      .select(col("ia").as("antecedent"), col("ib").as("consequent"), col("n_ab"))
      .unionAll(pairs
        .select(col("ib").as("antecedent"), col("ia").as("consequent"), col("n_ab")))
    val d = (c: String) => col(c).cast("double")
    val scored = directed
      .join(broadcast(itemCnt.toDF("antecedent", "n_ante")), "antecedent")
      .join(broadcast(itemCnt.toDF("consequent", "n_cons")), "consequent")
      .crossJoin(broadcast(nBaskets))
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        trunc6(d("n_ab") / d("n_baskets")).as("support"),
        trunc6(d("n_ab") / d("n_ante")).as("confidence"),
        trunc6(d("n_ab") * d("n_baskets") / (d("n_ante") * d("n_cons")))
          .as("lift"))
    val w = Window.orderBy(col("lift").desc, col("antecedent"), col("consequent"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("rank"), col("antecedent"), col("consequent"),
        col("n_ab"), col("support"), col("confidence"), col("lift"))
      .orderBy("rank")
  }

  /** One-way ANOVA F across the groups of `groupCol`: does the group
    * mean differ anywhere. Values ride the centi-scaled long grid (the
    * q227 Welch convention), so per-group n/Σv are exact integers and
    * Σv² is an exactly-representable double (each v2² ≤ ~2.4e9 < 2^53);
    * the between/within sums of squares come off those moments —
    * reported in ORIGINAL units (one /1e4 rescale at the end) — and F
    * is the only ratio. ONE map-side-combinable aggregation per group +
    * a k-row reduction: nothing scales with rows. Cross-group term sums
    * ride the 12-decimal decimal grid so the k-row reduction is
    * order-free. */
  def anovaF(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val v2 = floor(col(valueCol) * lit(100.0) + lit(0.5)).cast("long")
    val d = (c: String) => col(c).cast("double")
    val perGroup = df.select(col(groupCol).as("g"), v2.as("v2"))
      .groupBy("g")
      .agg(count(lit(1)).as("n_i"), sum(col("v2")).as("s_i"),
        sum(d("v2") * d("v2")).as("q_i"))
    perGroup
      .agg(count(lit(1)).as("k"), sum(col("n_i")).as("n"),
        sum(col("s_i")).as("s"), dsum12(col("q_i")).as("q"),
        dsum12(d("s_i") * d("s_i") / d("n_i")).as("sg"))
      .select(col("k"), col("n"),
        (col("k") - lit(1L)).as("df1"), (col("n") - col("k")).as("df2"),
        trunc6((col("sg") - d("s") * d("s") / d("n")) / lit(1e4))
          .as("ss_between"),
        trunc6((col("q") - col("sg")) / lit(1e4)).as("ss_within"),
        trunc6(((col("sg") - d("s") * d("s") / d("n")) /
            (col("k") - lit(1L)).cast("double")) /
          ((col("q") - col("sg")) / (col("n") - col("k")).cast("double")))
          .as("f"))
  }

  /** Kruskal–Wallis H (rank-based one-way ANOVA): the distribution-free
    * twin of [[anovaF]] for when normality is off the table. Values are
    * centi-quantized, DOUBLED midranks come from the same two-phase
    * distributed prefix-sum as [[spearman]] (grid-value frame only —
    * never a row-sized sort), per-group rank sums are exact longs, and
    * the tie correction 1 − Σ(t³−t)/(N³−N) uses exact tie counts. The
    * per-group terms (Σr)²/(4n_i) are deterministic double casts of
    * exact longs, reduced on the 12-decimal grid. `hCrit` is the
    * chi-square critical value at k−1 df, pinned by the caller. */
  def kruskalWallis(df: DataFrame, valueCol: String, groupCol: String,
      hCrit: Double): DataFrame = {
    val v2 = floor(col(valueCol) * lit(100.0) + lit(0.5)).cast("long")
    val rows = df.select(col(groupCol).as("g"), v2.as("v2"))
    val counts = rows.groupBy(col("v2").as("v")).agg(count(lit(1)).as("na"))
      .withColumn("nb", lit(0L))
      // one materialization for both consumers (tie correction + sweep)
      .localCheckpoint()
    val ranks = orderedPrefixSums(counts, preMaterialized = true)
      .select(col("v").as("v2"),
        (lit(2L) * (col("ca") - col("na")) + col("na") + lit(1L)).as("r2"))
    val d = (c: String) => col(c).cast("double")
    val perGroup = rows.join(ranks, "v2")
      .groupBy("g")
      .agg(count(lit(1)).as("n_i"), sum(col("r2")).as("s_i"))
    val ties = counts
      .agg(sum(col("na") * col("na") * col("na") - col("na")).as("tsum"))
    val h = perGroup
      .agg(count(lit(1)).as("k"), sum(col("n_i")).as("n"),
        dsum12(d("s_i") * d("s_i") / (lit(4.0) * d("n_i"))).as("sr"))
      .crossJoin(broadcast(ties))
      .withColumn("h_raw",
        lit(12.0) / (d("n") * (d("n") + lit(1.0))) * col("sr") -
          lit(3.0) * (d("n") + lit(1.0)))
      .withColumn("cf", lit(1.0) -
        d("tsum") / (d("n") * d("n") * d("n") - d("n")))
    h.select(col("k"), col("n"), (col("k") - lit(1L)).as("df"),
      trunc6(col("h_raw")).as("h"),
      trunc6(col("h_raw") / col("cf")).as("h_tie_corrected"),
      (col("h_raw") / col("cf") > lit(hCrit)).as("reject"))
  }

  /** Kendall tau-b between two INTEGER-grid columns of a bounded frame
    * (daily aggregates, not raw rows — the pair join is O(frame²), so
    * the caller aggregates first; a decade of days is ~7M pairs).
    * Concordant/discordant/tie counts are pure integer comparisons;
    * tau-b and the normal-approximation z are the only doubles.
    * Complements [[spearman]] (which needs no pair join but is less
    * robust to ties) and [[mannKendall]] (x = time). */
  def kendallTau(frame: DataFrame, ordCol: String, xCol: String,
      yCol: String): DataFrame = {
    val a = frame.select(col(ordCol).as("o1"), col(xCol).as("x1"),
      col(yCol).as("y1"))
    val b = frame.select(col(ordCol).as("o2"), col(xCol).as("x2"),
      col(yCol).as("y2"))
    val d = (c: String) => col(c).cast("double")
    val pairs = a.join(b, col("o1") < col("o2"))
      .select(
        (when(col("x1") < col("x2") && col("y1") < col("y2"), 1L)
          .when(col("x1") > col("x2") && col("y1") > col("y2"), 1L)
          .otherwise(0L)).as("c"),
        (when(col("x1") < col("x2") && col("y1") > col("y2"), 1L)
          .when(col("x1") > col("x2") && col("y1") < col("y2"), 1L)
          .otherwise(0L)).as("dc"),
        when(col("x1") === col("x2"), 1L).otherwise(0L).as("tx"),
        when(col("y1") === col("y2"), 1L).otherwise(0L).as("ty"))
    val n = frame.agg(count(lit(1)).as("n"))
    pairs
      .agg(sum(col("c")).as("nc"), sum(col("dc")).as("nd"),
        sum(col("tx")).as("ntx"), sum(col("ty")).as("nty"))
      .crossJoin(broadcast(n))
      .withColumn("n0", (col("n") * (col("n") - lit(1L)) / lit(2L)))
      .select(col("n"), col("nc"), col("nd"),
        trunc6((d("nc") - d("nd")) /
          sqrt((d("n0") - d("ntx")) * (d("n0") - d("nty")))).as("tau_b"),
        trunc6(lit(3.0) * (d("nc") - d("nd")) /
          sqrt(d("n") * (d("n") - lit(1.0)) *
            (lit(2.0) * d("n") + lit(5.0)) / lit(2.0))).as("z"))
  }

  /** Geometric decay weights (1−α)^k, k = 0..maxK, computed ONCE
    * driver-side so the Spark plan and the SQL oracle interpolate the
    * SAME doubles — pow() inside either engine is not guaranteed
    * correctly rounded, a pinned literal array is. */
  def holtWeights(alpha: Double, maxK: Int): Array[Double] = {
    val r = 1.0 - alpha
    Iterator.iterate(1.0)(_ * r).take(maxK + 1).toArray
  }

  /** Truncated-memory Holt linear forecast backtest per key: level =
    * decay-weighted mean of the train values, trend = decay-weighted
    * mean of the train first-differences (weights anchored at the
    * split day), forecast = level + h·trend over the held-out horizon.
    * This is the fixed-anchor variant of Holt's recursion — the
    * geometric weights are exactly Holt's when the memory covers the
    * frame, and here maxK ≥ the whole bounded day frame. Weights ride
    * a pinned literal array (see [[holtWeights]]); weighted sums are
    * 8-decimal-quantized per term so the reduction is order-free. One
    * window pass for the diffs, one grouped aggregation per key —
    * nothing scales with raw rows, the series frame is day-valued. */
  def holtForecast(series: DataFrame, key: String, tCol: String,
      v8Col: String, alpha: Double = 0.3, beta: Double = 0.2,
      horizon: Int = 7, maxK: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wl = holtWeights(alpha, maxK)
    val wb = holtWeights(beta, maxK)
    def wAt(ws: Array[Double], k: Column): Column =
      when(k.between(0, maxK),
        element_at(array(ws.map(lit).toIndexedSeq: _*),
          (k + lit(1L)).cast("int"))).otherwise(lit(0.0))
    val d = (c: String) => col(c).cast("double")
    val base = series.select(col(key).as("k"), col(tCol).as("t"),
      col(v8Col).as("v8"))
    val split = base.groupBy("k")
      .agg((max(col("t")) - lit(horizon.toLong)).as("t_split"))
    val wOrd = Window.partitionBy("k").orderBy("t")
    val train = base.join(split, "k").filter(col("t") <= col("t_split"))
      .withColumn("d8", col("v8") - lag(col("v8"), 1).over(wOrd))
      .withColumn("kk", col("t_split") - col("t"))
    val anchor = train.groupBy("k", "t_split")
      .agg(
        zsum8(wAt(wl, col("kk")) * d("v8") / lit(1e8)).as("lv_num"),
        zsum8(wAt(wl, col("kk"))).as("lv_den"),
        zsum8(wAt(wl, col("kk")) * d("kk")).as("mu_num"),
        zsum8(when(col("d8").isNotNull,
          wAt(wb, col("kk")) * d("d8") / lit(1e8)).otherwise(lit(0.0)))
          .as("tr_num"),
        zsum8(when(col("d8").isNotNull, wAt(wb, col("kk")))
          .otherwise(lit(0.0))).as("tr_den"))
      // the raw weighted mean lags the anchor by the weighted mean
      // age μ = Σw·k/Σw on any trending series; adding trend·μ
      // re-centers the level AT the split day (exact for a linear
      // series — the steady-state Holt level)
      .select(col("k"), col("t_split"),
        (col("lv_num") / col("lv_den") +
          (col("tr_num") / col("tr_den")) * (col("mu_num") / col("lv_den")))
          .as("level"),
        (col("tr_num") / col("tr_den")).as("trend"))
    base.join(anchor, "k").filter(col("t") > col("t_split"))
      .select(col("k").as(key), col("t").as("day"),
        trunc6(d("v8") / lit(1e8)).as("actual"),
        trunc6(col("level") +
          (col("t") - col("t_split")).cast("double") * col("trend"))
          .as("forecast"),
        trunc6(abs(d("v8") / lit(1e8) - (col("level") +
          (col("t") - col("t_split")).cast("double") * col("trend"))))
          .as("abs_err"))
      .orderBy(key, "day")
  }

  /** Lead/lag cross-correlation between two keyed series of one
    * (key, t, v8) frame: Pearson corr(x_t, y_{t+lag}) for lag =
    * 0..maxLag — "does X move Y h days later". Values drop to the
    * centi grid (8-grid div 1e6) so every moment — Σxy, Σx², cross
    * products — stays an exact long on the bounded day frame; the
    * correlation ratio is the only double math. The lag fan-out is a
    * tiny crossJoin (maxLag+1 rows) against the day frame. */
  def crossCorrelation(series: DataFrame, key: String, tCol: String,
      v8Col: String, typeX: String, typeY: String,
      maxLag: Int = 7): DataFrame = {
    val v2 = expr(s"$v8Col div 1000000")
    val x = series.filter(col(key) === typeX)
      .select(col(tCol).as("t"), v2.as("x2"))
    val y = series.filter(col(key) === typeY)
      .select(col(tCol).as("ty"), v2.as("y2"))
    val lags = series.sparkSession.range(maxLag + 1)
      .select(col("id").as("lag"))
    val d = (c: String) => col(c).cast("double")
    x.crossJoin(broadcast(lags))
      .join(y, col("ty") === col("t") + col("lag"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n"),
        sum(col("x2")).as("sx"), sum(col("y2")).as("sy"),
        sum(col("x2") * col("y2")).as("sxy"),
        sum(col("x2") * col("x2")).as("sxx"),
        sum(col("y2") * col("y2")).as("syy"))
      .select(col("lag"), col("n"),
        trunc6((d("n") * d("sxy") - d("sx") * d("sy")) /
          sqrt((d("n") * d("sxx") - d("sx") * d("sx")) *
            (d("n") * d("syy") - d("sy") * d("sy")))).as("ccf"))
      .orderBy("lag")
  }

  /** Binary-segmentation changepoint (one split) on a (t, v8) series:
    * the split day maximizing the between-segment sum-of-squares gain
    * S_l²/n_l + S_r²/n_r − S²/n — equivalently the largest SSE drop of
    * any single cut, the first step of classic binary segmentation and
    * the offline complement of [[EventOps]]' CUSUM. Prefix moments off
    * one cumulative window over the bounded day frame; gains reported
    * in original units, trunc6'd BEFORE the top-k cut (ranking rule),
    * day ascending as the tie-break. */
  def binarySegmentation(series: DataFrame, tCol: String, v8Col: String,
      topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = series.select(col(tCol).as("t"),
      expr(s"$v8Col div 1000000").as("v2"))
    val w = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = base.agg(count(lit(1)).as("n_all"), sum(col("v2")).as("s_all"))
    val d = (c: String) => col(c).cast("double")
    val gain = (d("cs") * d("cs") / d("cn") +
      (d("s_all") - d("cs")) * (d("s_all") - d("cs")) /
        (d("n_all") - d("cn")) -
      d("s_all") * d("s_all") / d("n_all")) / lit(1e4)
    base
      .withColumn("cn", count(lit(1)).over(w))
      .withColumn("cs", sum(col("v2")).over(w))
      .crossJoin(broadcast(tot))
      .filter(col("cn") < col("n_all"))
      .select(col("t").as("split_day"), col("cn").as("n_left"),
        (col("n_all") - col("cn")).as("n_right"),
        trunc6(d("cs") / d("cn") / lit(100.0)).as("mean_left"),
        trunc6((d("s_all") - d("cs")) / (d("n_all") - d("cn")) / lit(100.0))
          .as("mean_right"),
        trunc6(gain).as("gain"))
      .orderBy(col("gain").desc, col("split_day"))
      .limit(topK)
  }

  /** Two-arm log-rank test on right-censored (duration, observed, arm)
    * rows — "do the two survival curves differ": the hypothesis test
    * that belongs next to [[kaplanMeier]]. At each duration with ≥1
    * observed event and ≥2 at risk: O1 = arm-1 deaths, E1 = d·n1/n,
    * hypergeometric variance d·(n1/n)·(1−n1/n)·(n−d)/(n−1); z =
    * (ΣO1−ΣE1)/√ΣV. Risk counts come from ONE cumulative window over
    * the duration-valued frame (bounded, the q229 argument); the E/V
    * term sums ride the 12-decimal grid so the reduction is order-free.
    * `zCrit` pinned by the caller (1.959964 at α=0.05). */
  def logRank(durations: DataFrame, durCol: String, observedCol: String,
      armCol: String, zCrit: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = durations.select(col(durCol).cast("long").as("t"),
      when(col(observedCol), 1L).otherwise(0L).as("ev"),
      when(col(armCol) === 1, 1L).otherwise(0L).as("a1"))
    val tot = base.agg(count(lit(1)).as("n_all"), sum(col("a1")).as("n1_all"))
    val byT = base.groupBy("t")
      .agg(count(lit(1)).as("n_t"), sum(col("ev")).as("d"),
        sum(col("a1")).as("n1_t"), sum(col("ev") * col("a1")).as("d1"))
    val w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    val d = (c: String) => col(c).cast("double")
    val p1 = d("n1_risk") / d("n_risk")
    byT.crossJoin(broadcast(tot))
      .withColumn("n_risk",
        col("n_all") - coalesce(sum(col("n_t")).over(w), lit(0L)))
      .withColumn("n1_risk",
        col("n1_all") - coalesce(sum(col("n1_t")).over(w), lit(0L)))
      .filter(col("d") > 0 && col("n_risk") >= 2)
      .agg(max(col("n_all")).as("n"), max(col("n1_all")).as("n_1"),
        sum(col("d1")).as("o1"),
        dsum12(d("d") * p1).as("e1"),
        dsum12(d("d") * p1 * (lit(1.0) - p1) *
          (d("n_risk") - d("d")) / (d("n_risk") - lit(1.0))).as("v"))
      .select(col("n"), col("n_1"), col("o1"),
        trunc6(col("e1")).as("e1"),
        trunc6((d("o1") - col("e1")) / sqrt(col("v"))).as("z"),
        trunc6((d("o1") - col("e1")) * (d("o1") - col("e1")) / col("v"))
          .as("chi2"),
        (abs((d("o1") - col("e1")) / sqrt(col("v"))) > lit(zCrit))
          .as("reject"))
  }

  /** Cohen's κ inter-rater agreement (Cohen 1960) between two
    * categorical labelings of the same rows: observed agreement po =
    * Σ n_kk / n against chance agreement pe = Σ rowₖ·colₖ / n². The
    * label space is data-derived (no fixed class list), so the plan is
    * one grouped count over (a, b) plus two marginal re-aggregations of
    * that tiny cell frame — at 100 TB exactly one data-sized shuffle
    * (the cell groupBy), everything downstream is label-cardinality-
    * sized. Counts are exact longs; the three ratios are single double
    * divisions, trunc6'd. */
  def cohenKappa(df: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    val d = (c: String) => col(c).cast("double")
    val cells = df.select(raterA.as("a"), raterB.as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val rows = cells.groupBy("a").agg(sum(col("cnt")).as("row_n"))
    val cols = cells.groupBy("b").agg(sum(col("cnt")).as("col_n"))
    val agree = cells.agg(
      sum(col("cnt")).as("n"),
      sum(when(col("a") === col("b"), col("cnt")).otherwise(lit(0L)))
        .as("n_agree"))
    val chance = rows.join(cols, col("a") === col("b"))
      .agg(sum(col("row_n") * col("col_n")).as("rc"))
    val po = d("n_agree") / d("n")
    val pe = d("rc") / (d("n") * d("n"))
    agree.crossJoin(chance)
      .select(col("n"), col("n_agree"),
        trunc6(po).as("po"), trunc6(pe).as("pe"),
        trunc6((po - pe) / (lit(1.0) - pe)).as("kappa"))
  }

  /** Matthews correlation coefficient of a scored binary classifier at
    * a rank cut: the top ⌈n/cutDiv⌉ rows by (score desc, id) are
    * predicted positive, the 2×2 confusion counts are exact longs, and
    * MCC = (tp·tn − fp·fn)/√((tp+fp)(tp+fn)(tn+fp)(tn+fn)) rides one
    * double expression. The global rank is a single window over the
    * scored frame — classifier-eval frames are labeled-set-sized, not
    * corpus-sized (the q254 precedent); for corpus-scale screens use a
    * scalar threshold instead. */
  def mccAtRankCut(df: DataFrame, scoreCol: String, idCol: String,
      isPos: Column, cutDiv: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = (c: String) => col(c).cast("double")
    val ranked = df.select(col(scoreCol).as("score"), col(idCol).as("id"),
        when(isPos, 1L).otherwise(0L).as("y"))
      .withColumn("rn", row_number()
        .over(Window.orderBy(col("score").desc, col("id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
    val conf = ranked
      .select(when(col("rn") * lit(cutDiv.toLong) <= col("n"), 1L)
        .otherwise(0L).as("p"), col("y"))
      .agg(sum(col("p") * col("y")).as("tp"),
        sum(col("p") * (lit(1L) - col("y"))).as("fp"),
        sum((lit(1L) - col("p")) * col("y")).as("fn"),
        sum((lit(1L) - col("p")) * (lit(1L) - col("y"))).as("tn"))
    conf.select(col("tp"), col("fp"), col("fn"), col("tn"),
      trunc6((d("tp") * d("tn") - d("fp") * d("fn")) /
        sqrt((d("tp") + d("fp")) * (d("tp") + d("fn")) *
          (d("tn") + d("fp")) * (d("tn") + d("fn")))).as("mcc"))
  }

  /** Temporal-holdout Brier score of a per-segment base-rate model:
    * fit p̂(seg) = successes/total on the train slice, score the test
    * slice with mean (p̂ − y)². The canonical probability-forecast
    * audit (Brier 1950) for a segment model — two grouped aggregations
    * joined on the segment key, so the only data-sized exchanges are
    * the two segment groupBys. Each squared error is quantized to a
    * 1e-12 grid before summation so the reduction is order-free in any
    * engine; p̂ itself is a single long/long double division. Segments
    * with no train rows are dropped (no model to score). */
  def brierBySegment(df: DataFrame, segCol: String, isTrain: Column,
      yCol: Column): DataFrame = {
    val d = (c: String) => col(c).cast("double")
    val base = df.select(col(segCol).as("seg"),
      when(isTrain, 1L).otherwise(0L).as("tr"),
      when(yCol, 1L).otherwise(0L).as("y"))
    val fit = base.filter(col("tr") === 1L).groupBy("seg")
      .agg(count(lit(1)).as("n_train"), sum(col("y")).as("x_train"))
    val phat = d("x_train") / d("n_train")
    val err = phat - d("y")
    base.filter(col("tr") === 0L)
      .join(fit, "seg")
      .withColumn("se8",
        floor(err * err * lit(1e12) + lit(0.5)).cast("long"))
      .groupBy("seg")
      .agg(count(lit(1)).as("n_test"), sum(col("y")).as("x_test"),
        max(col("n_train")).as("n_train"), max(col("x_train")).as("x_train"),
        sum(col("se8")).as("se_sum"))
      .select(col("seg"), col("n_train"), col("x_train"),
        col("n_test"), col("x_test"),
        trunc6(phat).as("p_hat"),
        trunc6(d("se_sum") / lit(1e12) / d("n_test")).as("brier"))
      .orderBy("seg")
  }

  /** Split-conformal prediction interval for a per-key OLS fit
    * (Vovk et al. 2005; Lei et al. 2018): fit y ≈ a + b·x on the train
    * slice, take the ⌈0.9·n⌉-th smallest absolute calibration residual
    * as the interval half-width q̂, and report empirical coverage on
    * the held-out test slice — the distribution-free "are my error
    * bars honest" audit. Residuals are quantized to an integer 1e-8
    * grid BEFORE ranking, so the order statistic is engine-exact
    * (ties collapse: the k-th smallest VALUE needs no tie-break); the
    * rank itself is integer arithmetic (⌈9n/10⌉ = (9n+9) div 10).
    * Plan: one moment aggregation, one per-key histogram + cumulative
    * window over DISTINCT residual values (bounded by the grid, not
    * the data), one test-slice pass. */
  def conformalOls(df: DataFrame, key: String, xCol: String, yCol: String,
      splitCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = (c: String) => col(c).cast("double")
    val base = df.select(col(key).as("k"), col(xCol).as("x"),
      col(yCol).as("y"), splitCol.as("sp"))
    val fit0 = base.filter(col("sp") <= 1).groupBy("k")
      .agg(count(lit(1)).as("n"), xsum(col("x")).as("sx"),
        xsum(col("y")).as("sy"), psum6(col("x") * col("y")).as("sxy"),
        psum6(col("x") * col("x")).as("sxx"))
    val sxxC = col("sxx") - d("sx") * d("sx") / d("n")
    val sxyC = col("sxy") - d("sx") * d("sy") / d("n")
    val slope = sxyC / sxxC
    val fit = fit0.select(col("k"), col("n").as("n_train"),
      slope.as("b"), ((col("sy") - slope * col("sx")) / d("n")).as("a"))
    val r8 = floor(abs(col("y") - (col("a") + col("b") * col("x"))) *
      lit(1e8) + lit(0.5)).cast("long")
    val cal = base.filter(col("sp") === 2).join(fit, "k")
      .select(col("k"), r8.as("r8"))
    val calCnt = cal.groupBy("k").agg(count(lit(1)).as("n_cal"))
    val wcum = Window.partitionBy("k").orderBy("r8")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val qhat = cal.groupBy("k", "r8").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wcum))
      .join(calCnt, "k")
      .filter(col("cum") >= expr("(n_cal * 9 + 9) div 10"))
      .groupBy("k").agg(min(col("r8")).as("q8"), max(col("n_cal")).as("n_cal"))
    base.filter(col("sp") === 3).join(fit, "k").join(qhat, "k")
      .groupBy(col("k"), col("n_train"), col("n_cal"), col("q8"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(r8 <= col("q8"), 1L).otherwise(0L)).as("n_cov"))
      .select(col("k"), col("n_train"), col("n_cal"), col("n_test"),
        trunc6(d("q8") / lit(1e8)).as("q_hat"),
        trunc6(d("n_cov") / d("n_test")).as("coverage"))
      .orderBy("k")
  }

  /** Bradley–Terry preference strengths from (winner, loser) duel rows
    * via the MM algorithm (Bradley & Terry 1952; Hunter 2004): p_i ←
    * W_i / Σ_j n_ij/(p_i+p_j). The likelihood is scale-invariant and
    * the MM update propagates a uniform rescale linearly, so the chain
    * runs UN-normalized and divides by Σp once at the end — the q238
    * lesson applied (no per-round double-reference, every frame in the
    * loop is player-cardinality-sized and checkpointed). The only
    * data-sized work is the two duel aggregations; preference corpora
    * at 100 TB reduce to a players×players frame before any iteration.
    * Per-round denominators ride the 12-decimal grid so the fixpoint
    * is engine-deterministic. */
  def bradleyTerry(duels: DataFrame, winCol: String, loseCol: String,
      iters: Int = 8): DataFrame = {
    // materialize the duel frame ONCE: it has THREE data-sized readers
    // (the wins aggregation and both unionAll legs of the pair
    // aggregation), so an un-materialized input — q293's is a full
    // keyed window over lineitem — re-executed its whole upstream plan
    // per reader (guide §1.2/§5; the pageRank edge-list lesson).
    val du = duels.select(col(winCol), col(loseCol)).localCheckpoint()
    val wins = du.groupBy(col(winCol).as("p"))
      .agg(count(lit(1)).as("w"))
    val games = du.select(col(winCol).as("a"), col(loseCol).as("b"))
      .unionAll(du.select(col(loseCol).as("a"), col(winCol).as("b")))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    // The preference frame is players×players-bounded; when it is
    // SMALL (≤ 4096 met pairs — the checkpoint makes the count free),
    // the MM fixpoint runs on the driver with bit-identical arithmetic
    // (dsum12Local ≡ dsum12; the groupBy replays the keyed decimal
    // sum): the distributed loop paid 8 rounds of two joins + an
    // exchange + an eager checkpoint over a handful of rows — pure
    // scheduling overhead. Past the guard (true many-player corpora,
    // where the pair frame is data) the distributed loop stands.
    val p =
      if (games.count() <= 4096) {
        import graft.functions.TextFunctions.dsum12Local
        val g = games.collect().map(r => (r.get(0), r.get(1), r.getLong(2)))
        val winMap = wins.collect().map(r => r.get(0) -> r.getLong(1)).toMap
        val players = g.map(_._1).distinct
        val w: Map[Any, Long] =
          players.map(pl => pl -> winMap.getOrElse(pl, 0L)).toMap
        var x: Map[Any, Double] = players.map(_ -> 1.0).toMap
        for (_ <- 1 to iters) {
          val den = g.groupBy(_._1).map { case (a, rows) =>
            a -> dsum12Local(rows.map { case (_, b, n) =>
              n.toDouble / (x(a) + x(b)) })
          }
          x = players.map(a => a -> w(a).toDouble / den(a)).toMap
        }
        val spark = duels.sparkSession
        val schema = org.apache.spark.sql.types.StructType(Seq(
          games.schema("a"),
          org.apache.spark.sql.types.StructField("w",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("x",
            org.apache.spark.sql.types.DoubleType, nullable = false)))
        spark.createDataFrame(
          java.util.Arrays.asList(players.map(a =>
            org.apache.spark.sql.Row(a, w(a), x(a))): _*), schema)
      } else {
        var pd = games.select(col("a")).distinct()
          .join(wins, col("a") === col("p"), "left")
          .select(col("a"), coalesce(col("w"), lit(0L)).as("w"),
            lit(1.0).as("x"))
          .localCheckpoint()
        for (_ <- 1 to iters) {
          val pa = pd.select(col("a"), col("w"), col("x").as("xa"))
          val pb = pd.select(col("a").as("b"), col("x").as("xb"))
          pd = games.join(pa, "a").join(pb, "b")
            .groupBy(col("a"), col("w"))
            .agg(dsum12(col("n").cast("double") / (col("xa") + col("xb")))
              .as("den"))
            .select(col("a"), col("w"),
              (col("w").cast("double") / col("den")).as("x"))
            .localCheckpoint()
        }
        pd
      }
    val tot = p.agg(dsum12(col("x")).as("tot"))
    p.crossJoin(broadcast(tot))
      .select(col("a").as("player"), col("w").as("n_wins"),
        trunc6(col("x") / col("tot")).as("strength"))
      .orderBy("player")
  }

  /** Directed pairwise win rates with the Wilson 95% lower bound
    * (Wilson 1927) — the preference-data QC table: for every ordered
    * pair that met at least once, wins/games and the score-interval
    * floor that a downstream filter can threshold without being fooled
    * by tiny samples. Counts are exact longs from one grouped pass
    * over the doubled duel frame; the bound is a single pinned-z
    * double expression. */
  def pairwiseWilson(duels: DataFrame, winCol: String, loseCol: String,
      z: Double): DataFrame = {
    val d = (c: String) => col(c).cast("double")
    val directed = duels.select(col(winCol).as("a"), col(loseCol).as("b"),
        lit(1L).as("won"))
      .unionAll(duels.select(col(loseCol).as("a"), col(winCol).as("b"),
        lit(0L).as("won")))
    val g = directed.groupBy("a", "b")
      .agg(sum(col("won")).as("w"), count(lit(1)).as("n"))
    val z2 = z * z
    val phat = d("w") / d("n")
    val low = (phat + lit(z2) / (lit(2.0) * d("n")) -
      lit(z) * sqrt(phat * (lit(1.0) - phat) / d("n") +
        lit(z2) / (lit(4.0) * d("n") * d("n")))) /
      (lit(1.0) + lit(z2) / d("n"))
    g.select(col("a"), col("b"), col("w"), col("n"),
        trunc6(phat).as("win_rate"), trunc6(low).as("wilson_low"))
      .orderBy("a", "b")
  }

  /** Exhaustive best-split scan for a one-level decision stump: over
    * every distinct value t of `xCol`, the weighted Gini impurity of
    * the (x ≤ t | x > t) partition against a binary label, minimized.
    * The CART split-finder primitive (Breiman et al. 1984). Candidate
    * counts come from one value-keyed aggregation and the left/right
    * tallies from the [[orderedPrefixSums]] two-phase sweep — no global
    * window, so the scan holds at 100 TB where candidates are
    * distinct-value-sized. Impurities are pure double expressions over
    * exact long counts, trunc6'd before the argmin so the (gini, t)
    * tie-break is grid-deterministic. */
  def bestGiniSplit(df: DataFrame, xCol: String, yCol: Column): DataFrame = {
    val d = (c: String) => col(c).cast("double")
    val counts = df.select(col(xCol).cast("double").as("v"),
        when(yCol, 1L).otherwise(0L).as("y"))
      .groupBy("v")
      .agg(sum(col("y")).as("na"), sum(lit(1L) - col("y")).as("nb"))
    val cum = orderedPrefixSums(counts)
    val tot = cum.agg(max(col("ca") + col("cb")).as("n_all"),
      max(col("ca")).as("ta"), max(col("cb")).as("tb"))
    val nl = col("ca") + col("cb")
    val nr = col("n_all") - nl
    val gl = lit(1.0) -
      ((d("ca") / nl.cast("double")) * (d("ca") / nl.cast("double")) +
        (d("cb") / nl.cast("double")) * (d("cb") / nl.cast("double")))
    val ra = col("ta") - col("ca")
    val rb = col("tb") - col("cb")
    val gr = lit(1.0) -
      ((ra.cast("double") / nr.cast("double")) * (ra.cast("double") / nr.cast("double")) +
        (rb.cast("double") / nr.cast("double")) * (rb.cast("double") / nr.cast("double")))
    cum.crossJoin(broadcast(tot))
      .filter(nl < col("n_all"))
      .select(col("v").as("split_value"),
        trunc6((nl.cast("double") * gl + nr.cast("double") * gr) /
          d("n_all")).as("gini"),
        nl.as("n_left"), nr.as("n_right"))
      .orderBy(col("gini"), col("split_value"))
      .limit(1)
  }
}
