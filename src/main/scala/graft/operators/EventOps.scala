package graft.operators

import graft.functions.TextFunctions.{davg, dsum, dsum12, trunc6, xsum}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operators over the `events` stream table: rollups, freshness boosting,
  * sessionization, quality gates (SURVEY §2.4 A6/A8, §2.5 K11, §2.8).
  *
  * All timestamp math is done on epoch microseconds (long) so it is exact
  * and engine-portable. Partition-by-user windows shuffle once on user_id;
  * at 100 TB the events table would be date-partitioned and the window
  * co-partitioned by (user_id) — no further design change needed.
  */
object EventOps {

  /** A6 stats rollup: counts + exact sums per (event_type, day). */
  def rollup(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("value")).as("total_value"),
        davg(col("value")).as("avg_value"))
      .orderBy(col("event_type"), col("day"))

  /** Mergeable rollup PARTIALS — the incremental-maintenance shape of
    * [[rollup]]: per (event_type, day), a count plus the two integer
    * legs of the scaled-long exact sum (xsum's floor part and half-up-
    * rounded 8-decimal frac part). Integer partials merge by ADDITION
    * with no precision question, so a daily ingest delta updates a
    * 100 TB rollup by merging its (days×types)-sized partial — history
    * is never rescanned. The HLL/CMS sketches carry the same property
    * for distincts/frequencies; this completes it for sums. */
  def rollupPartial(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col("value")).cast("long")).as("sum_int"),
        sum(floor((col("value") - floor(col("value"))) * lit(1e8) + lit(0.5))
          .cast("long")).as("sum_frac8"))

  /** Merge any number of partials (shards, deltas, yesterday's state):
    * pure integer addition per key. */
  def mergeRollupPartials(parts: DataFrame*): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy("event_type", "day")
      .agg(sum(col("n")).as("n"), sum(col("sum_int")).as("sum_int"),
        sum(col("sum_frac8")).as("sum_frac8"))

  /** Finalize partials into the [[rollup]] report shape — same values
    * as running the full aggregation over the union of the raw rows
    * (xsum ≡ dsum on nonnegative inputs, which event values are). */
  def finalizeRollup(partial: DataFrame): DataFrame =
    partial.select(col("event_type"), col("day"), col("n"),
      (col("sum_int").cast("double") +
        col("sum_frac8").cast("double") / lit(1e8)).as("total_value"))
      .withColumn("avg_value",
        (col("total_value") / col("n")).cast("double"))
      .orderBy("event_type", "day")

  /** K11 freshness boost: score ×= 1 + boost·max(0, 1 − age_hours/24),
    * age relative to the corpus max timestamp
    * (reference: rag/retrieve/hybrid.py:517-562). */
  def freshnessBoost(events: DataFrame, boost: Double, topK: Int): DataFrame = {
    val maxTs = events.agg(max(unix_micros(col("ts"))).as("max_us"))
    events
      .crossJoin(broadcast(maxTs))
      .withColumn("age_hours",
        (col("max_us") - unix_micros(col("ts"))).cast("double") / 3.6e9)
      .withColumn("boosted",
        graft.functions.TextFunctions.trunc6(col("value") *
          (lit(1.0) + lit(boost) * greatest(lit(0.0), lit(1.0) - col("age_hours") / 24.0))))
      .select(col("event_id"), col("user_id"), col("boosted"))
      .orderBy(col("boosted").desc, col("event_id"))
      .limit(topK)
  }

  /** K11 applied to retrieval results (the reference applies the recency
    * boost INSIDE hybrid retrieval, rag/retrieve/hybrid.py:517-562): the
    * multiplicative factor 1 + boost·max(0, 1 − age_hours/24) on a fused
    * score, with age measured against `maxUs` — the corpus max
    * created_at, the deterministic stand-in for wall-clock now. Column
    * form so the facade and the oracle-checked query share one kernel. */
  def boostedScore(score: org.apache.spark.sql.Column,
      createdUs: org.apache.spark.sql.Column,
      maxUs: org.apache.spark.sql.Column,
      boost: Double): org.apache.spark.sql.Column =
    trunc6(score * (lit(1.0) + lit(boost) * greatest(lit(0.0),
      lit(1.0) - (maxUs - createdUs).cast("double") / 3.6e9 / 24.0)))

  /** Sessionize: per user, a new session starts when the gap from the
    * previous event exceeds `gapSeconds`. Returns one row per session.
    * (The reference's RoundBuffer cuts batches on session change /
    * token budget — buffer/round_buffer.py:104-120; this is the
    * event-time analogue that Structured Streaming expresses as
    * session_window.) */
  def sessionize(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gap = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser)
    events
      .withColumn("new_session",
        when(gap.isNull || gap > gapSeconds * 1000000L, 1).otherwise(0))
      .withColumn("session_idx",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"),
        dsum(col("value")).as("session_value"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** Rolling event-time aggregate: for every event, the count and exact
    * sum of `value` over the trailing `windowUs` microseconds of the
    * same user (inclusive frame ends at the event itself). One shuffle
    * on user_id; the RANGE frame is a linear two-pointer pass per
    * partition — at 100 TB the events table is date-partitioned and the
    * window co-partitions by user, same as [[sessionize]].
    *
    * The windowed sum runs over half-up-rounded 8-decimal scaled longs
    * (the xsum trick): integer accumulation is order-independent and
    * engine-exact where a running double sum drifts in the last ulps. */
  def rollingWindow(events: DataFrame,
      windowUs: Long = 86400000000L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
      .rangeBetween(-windowUs, 0)
    events
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("v8", floor(col("value") * 1e8 + 0.5).cast("long"))
      .withColumn("n_trailing", count(lit(1)).over(w))
      .withColumn("sum_trailing",
        (sum(col("v8")).over(w).cast("double") / 1e8).cast("double"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("n_trailing"), col("sum_trailing"))
      .orderBy(col("event_id"))
  }

  /** Ordered funnel: per user, the first `steps.head` event, then the
    * first `steps(1)` event strictly after it, and so on — the classic
    * product-analytics conversion funnel (a restricted
    * MATCH_RECOGNIZE). Each step is one co-partitioned aggregation +
    * join on user_id: step frames are |users|-sized, so the whole
    * funnel is `steps.length` small hash joins against one events scan
    * — never a per-user loop or a sequence self-join. Returns one row
    * per user reaching step 1, with each step's first-completion time
    * (epoch µs, null once the chain breaks) and the depth reached. */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val evts = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"))
    val first = evts.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("ts_us").as("t1"))
    val chained = steps.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (step, i)) =>
        // first occurrence of this step STRICTLY after the prior step's
        // completion; users whose chain already broke stay null
        val prev = s"t$i"
        val cur = s"t${i + 1}"
        val nxt = evts.filter(col("event_type") === step)
          .join(acc.select(col("user_id"), col(prev).as("_prev")), "user_id")
          .filter(col("_prev").isNotNull && col("ts_us") > col("_prev"))
          .groupBy("user_id").agg(min("ts_us").as(cur))
        acc.join(nxt, Seq("user_id"), "left_outer")
    }
    val depth = (1 to steps.length)
      .map(i => when(col(s"t$i").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    chained.withColumn("depth", depth.cast("long")).orderBy("user_id")
  }

  /** Cohort retention triangle: users bucketed by first-active day
    * (their cohort), then for each (cohort_day, day_offset) the number
    * of cohort members active that day — the classic product-analytics
    * retention report. Day arithmetic is integer epoch-day `div` (exact
    * at any offset, engine-portable; no date/tz semantics involved).
    *
    * Scale shape: the raw stream first collapses to the DISTINCT
    * (user, day) activity grid (map-side combinable, ≪ events), the
    * cohort table is one user-keyed min (users-sized), and the join
    * back is user-co-partitioned with the grid — after which each user
    * contributes at most one row per (cohort, offset) cell, so the
    * final rollup is a plain count, not a count-distinct expand. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val active = events
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val cohorts = active.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    active.join(cohorts, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Trailing-window distinct actives (the WAU curve): for every day
    * present in the stream, the distinct users active in the previous
    * `windowDays` days. The raw stream collapses to the distinct
    * (user, day) grid first; each grid cell then fans out ROW-LOCALLY
    * to the `windowDays` observation days it supports (an |grid|×W
    * explode — no day-band self-join), and one count-distinct per day
    * finishes. Exactness at 100 TB: the grid is users×days ≪ events;
    * swap the final count for [[Sketches.hllSketch]] merges when even
    * the grid is too hot. */
  def rollingDistinctUsers(events: DataFrame,
      windowDays: Int = 7): DataFrame = {
    val grid = events.select(col("user_id"),
      expr("unix_micros(ts) div 86400000000").as("day")).distinct()
    grid
      .withColumn("obs_day",
        explode(sequence(col("day"), col("day") + (windowDays - 1))))
      .groupBy("obs_day")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .join(grid.select(col("day").as("obs_day")).distinct(), "obs_day")
      .orderBy("obs_day")
  }

  /** Per-user inter-arrival gap profile: count / max / mean of the
    * microsecond gaps between consecutive events — the latency /
    * engagement-cadence report, and the empirical input to choosing a
    * [[sessionize]] gap threshold. One shuffle on user_id (the same
    * co-partitioned window as sessionize); gaps are exact integer µs,
    * so the aggregation is pure integer math until the final pinned
    * mean division. */
  def sessionGaps(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser))
      .filter(col("gap_us").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
        max(col("gap_us")).as("max_gap_us"),
        trunc6(sum(col("gap_us")).cast("double") /
          count(lit(1)).cast("double")).as("mean_gap_us"))
      .orderBy("user_id")
  }

  /** Gap-filled daily time series: per event_type, the count and exact
    * value sum for EVERY day between that type's first and last
    * activity, with silent days materialized as zero rows — the
    * resample-to-daily / zero-fill step every downstream charting or
    * anomaly job needs (a plain groupBy silently omits gap days). The
    * day grid fans out ROW-LOCALLY from one |types|-sized span
    * aggregate (`sequence` explode), so the only shuffles are the two
    * small aggregations; no calendar table is ever joined at corpus
    * width. Integer epoch-days end to end — nothing to drift. */
  def gapFillDaily(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"), col("value"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"), xsum(col("value")).as("day_value"))
    val grid = daily.groupBy("event_type")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    grid.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("day_value"), lit(0.0)).as("day_value"))
      .orderBy("event_type", "day")
  }

  /** Per-user z-score outliers: events whose value sits more than
    * `threshold` standard deviations from that user's mean. Mean and
    * population variance come from the exact decimal-widened moment
    * sums (one map-side-combinable aggregation, |users| rows), joined
    * back in a broadcast — the same two-pass shape that works when the
    * per-user history is 100 TB wide. The z-score itself is pure IEEE
    * arithmetic on those exact sums (sqrt is correctly rounded by the
    * standard), truncated to the 6-decimal grid BEFORE the threshold
    * cut so both engines keep identical row sets. */
  def zscoreAnomalies(events: DataFrame, threshold: Double = 2.5): DataFrame = {
    val moments = events.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        dsum(col("value")).as("sx"),
        dsum12(col("value") * col("value")).as("sxx"))
      .filter(col("n") >= 2)
    val nD = col("n").cast("double")
    val mean = col("sx") / nD
    val variance = (nD * col("sxx") - col("sx") * col("sx")) / (nD * nD)
    val std = sqrt(variance)
    events
      .join(broadcast(moments), Seq("user_id"))
      .filter(variance > 0)
      .withColumn("z", trunc6((col("value") - mean) / std))
      .filter(abs(col("z")) > threshold)
      .select(col("event_id"), col("user_id"), col("value"), col("z"))
      .orderBy(col("event_id"))
  }

  /** A8 buffer quality: avg(score)×0.6 + recency_ratio×0.4 per user,
    * recency = share of events within `recentHours` of the corpus max ts
    * (reference: buffer/query_buffer.py:217-255). */
  def qualityAssessment(events: DataFrame, recentHours: Double): DataFrame = {
    val maxTs = events.agg(max(unix_micros(col("ts"))).as("max_us"))
    events
      .crossJoin(broadcast(maxTs))
      .withColumn("is_recent",
        when(col("max_us") - unix_micros(col("ts")) <= (recentHours * 3.6e9).toLong, 1)
          .otherwise(0))
      .groupBy("user_id")
      .agg(
        trunc6(
          davg(col("value")) * 0.6 +
            (sum(col("is_recent")).cast("double") / count(lit(1))) * 0.4).as("quality"),
        count(lit(1)).as("n"))
      .orderBy(col("user_id"))
  }

  /** Exponentially-weighted moving average of `value` per user over
    * event-time order, as a FIXED-DEPTH unrolled kernel: y_t =
    * Σ_{j=0..depth} α^j·x_{t−j} / Σ_{j present} α^j (normalized over
    * the lags that exist, so the first rows of a user are averages of
    * what is there, not biased toward zero). The truncated kernel is
    * the operator's definition — α^depth+1 tail mass is dropped — which
    * makes it a pure per-row expression over `depth` lag() calls: one
    * user-keyed shuffle, no recursive state, and an IDENTICAL unrolled
    * SQL twin (a true recursive EWMA is order-dependent running state
    * that neither engine evaluates reproducibly across partitionings).
    * The α^j weights are computed driver-side once and pinned into
    * both texts. */
  def ewma(events: DataFrame, alpha: Double, depth: Int = 5): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
    val weights = (0 to depth).map(j => math.pow(alpha, j))
    val src = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"), col("value"))
    val lags = (0 to depth).map { j =>
      if (j == 0) col("value") else lag(col("value"), j).over(byUser)
    }
    val num = lags.zip(weights).map { case (x, w) =>
      when(x.isNotNull, x * lit(w)).otherwise(lit(0.0))
    }.reduce(_ + _)
    val den = lags.zip(weights).map { case (x, w) =>
      when(x.isNotNull, lit(w)).otherwise(lit(0.0))
    }.reduce(_ + _)
    src
      .withColumn("ewma", trunc6(num / den))
      .select(col("user_id"), col("event_id"), col("ts_us"), col("ewma"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** First-touch / last-touch conversion attribution: for every
    * conversion event, the earliest and the most recent non-conversion
    * event type in the same user's prior history, rolled up into the
    * channel report both attribution models read. One shuffle on
    * user_id, one ordered window pass with ignore-nulls first/last
    * (both engines share the frame semantics), the two models emitted
    * from a single pass via explode — the window is never recomputed.
    * Conversions with no prior touch land in the '(none)' channel. */
  def attribution(events: DataFrame,
      conversionType: String = "purchase"): DataFrame = {
    val ev = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"), col("event_type"))
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= conversionType, col("event_type"))
    ev
      .withColumn("first_touch", first(touch, ignoreNulls = true).over(w))
      .withColumn("last_touch", last(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === conversionType)
      .select(explode(array(
        struct(lit("first").as("touch"),
          coalesce(col("first_touch"), lit("(none)")).as("channel")),
        struct(lit("last").as("touch"),
          coalesce(col("last_touch"), lit("(none)")).as("channel")))).as("t"))
      .select(col("t.touch").as("touch"), col("t.channel").as("channel"))
      .groupBy("touch", "channel").agg(count(lit(1)).as("n_conversions"))
      .orderBy("touch", "channel")
  }

  /** Expanding (history-so-far) z-score per event: each event scored
    * against its user's STRICTLY PRIOR events — the batch twin of the
    * streaming stateful anomaly screen
    * ([[graft.streaming.StreamingIngest.streamingZscore]]), kept
    * op-for-op identical so stream ≡ batch is a spec, not a hope.
    * Moments ride centi-scaled LONGS (exact cumulative sums in any
    * engine's window order); the z expression is the only double math.
    * Events with under 2 prior observations or zero prior variance
    * emit NULL z and never flag. */
  def expandingZscore(events: DataFrame, zCut: Double = 3.0): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val d = (c: Column) => c.cast("double")
    val base = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"),
      floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("v2"))
    val withM = base
      .withColumn("n_prior", count(lit(1)).over(w))
      .withColumn("s_prior", sum(col("v2")).over(w))
      .withColumn("q_prior", sum(col("v2") * col("v2")).over(w))
    val mean2 = d(col("s_prior")) / d(col("n_prior"))
    val var2 = d(col("q_prior")) / d(col("n_prior")) - mean2 * mean2
    val sd2 = sqrt(var2)
    val z = (d(col("v2")) - mean2) / sd2
    withM
      .withColumn("z", when(col("n_prior") >= 2 && sd2 > lit(0.0),
        trunc6(z)).otherwise(lit(null).cast("double")))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > lit(zCut), lit(false)))
      .select(col("user_id"), col("event_id"), col("z"), col("is_anomaly"))
      .orderBy("user_id", "event_id")
  }

  /** RFM (recency / frequency / monetary) segmentation: each entity
    * scored 1–4 on how recently it acted (days from the dataset's max
    * activity timestamp, integer µs `div`), how often, and how much
    * (8-decimal exact monetary total), then rolled up to segment
    * counts. Quartile scores are NTILE(4) under tie-broken total
    * orders — the q218-proven shared extras-go-early convention; the
    * per-entity frame is entity-sized, so at catalog scale the three
    * rank windows ride the same two-phase prefix-count path as
    * [[Stats.orderedPrefixSums]] instead of a global window. Segment
    * monetary totals re-sum the already-grid-exact entity totals via
    * the same scaled-long sum, so they stay order-free exact. */
  def rfmSegments(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val per = df.select(col(keyCol).as("k"),
        unix_micros(col(tsCol).cast("timestamp")).as("us"), col(valueCol).as("v"))
      .groupBy("k")
      .agg(max(col("us")).as("last_us"), count(lit(1)).as("f"),
        xsum(col("v")).as("m"))
    val ref = per.agg(max(col("last_us")).as("ref_us"))
    val scored = per.crossJoin(broadcast(ref))
      .withColumn("recency_days",
        expr("(ref_us - last_us) div 86400000000"))
      .withColumn("r_score", ntile(4).over(
        Window.orderBy(col("recency_days"), col("k"))).cast("long"))
      .withColumn("f_score", ntile(4).over(
        Window.orderBy(col("f").desc, col("k"))).cast("long"))
      .withColumn("m_score", ntile(4).over(
        Window.orderBy(col("m").desc, col("k"))).cast("long"))
    scored.groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_entities"),
        sum(col("f")).as("n_actions"),
        xsum(col("m")).as("monetary"))
      .orderBy("r_score", "f_score", "m_score")
  }

  /** Classical additive seasonal decomposition of the daily total
    * series (trend = centered 7-day moving average, seasonal = mean
    * detrended value per weekday, residual = the rest) — the
    * moving-average STL-lite every metrics stack runs before calling
    * an anomaly. Daily totals ride 8-decimal scaled LONGS, the MA(7)
    * is an integer window sum over the day-sized frame divided once,
    * and the per-weekday seasonal means are 12-decimal order-free
    * sums. Edge days (incomplete 7-day window) are dropped, so every
    * emitted row has the full decomposition. The windows run over the
    * bounded day frame; at multi-decade scale the same sweep rides
    * the two-phase prefix path ([[Stats.orderedPrefixSums]]). Assumes
    * a gap-free daily series (gap-fill first — q115 — if not). */
  def seasonalDecompose(events: DataFrame): DataFrame = {
    val daily = events
      .select(expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * lit(1e8) + lit(0.5)).cast("long").as("v8"))
      .groupBy("day").agg(sum(col("v8")).as("t8"))
    val w7 = Window.orderBy("day").rowsBetween(-3, 3)
    val d = (c: String) => col(c).cast("double")
    val trended = daily
      .withColumn("n_win", count(lit(1)).over(w7))
      .withColumn("ma8", sum(col("t8")).over(w7))
      .filter(col("n_win") === 7)
      .withColumn("dow", col("day") % 7)
      .withColumn("value", d("t8") / lit(1e8))
      .withColumn("trend", d("ma8") / lit(7.0e8))
      .withColumn("detr", col("value") - col("trend"))
    val seasonal = trended.groupBy("dow")
      .agg((dsum12(col("detr")) / count(lit(1)).cast("double")).as("seas"))
    trended.join(broadcast(seasonal), "dow")
      .select(col("day"), col("dow"),
        trunc6(col("value")).as("value"),
        trunc6(col("trend")).as("trend"),
        trunc6(col("seas")).as("seasonal"),
        trunc6(col("value") - col("trend") - col("seas")).as("residual"))
      .orderBy("day")
  }

  /** Seasonal-adjusted anomaly screen: z-score of each day's
    * [[seasonalDecompose]] residual against the residual series' own
    * exact moments (residuals already sit on the 6-decimal grid, so
    * the moments ride MILLI-scaled longs — the q224/q227 pattern, but
    * at 1e3 because daily-total residuals are value-sum-sized and the
    * squared micro-grid moment overflows a long; z is computed in grid
    * units because it is scale-invariant). The
    * honest version of "alert when today deviates": trend and weekday
    * effects are removed BEFORE the threshold, so a busy Monday never
    * pages. */
  def seasonalAnomalies(events: DataFrame, zCut: Double = 2.0): DataFrame = {
    val dec = seasonalDecompose(events)
      .select(col("day"), col("residual"),
        floor(col("residual") * lit(1e3) + lit(0.5)).cast("long").as("r6"))
    val mom = dec.agg(count(lit(1)).as("n"), sum(col("r6")).as("s"),
      sum(col("r6") * col("r6")).as("q"))
    val d = (c: String) => col(c).cast("double")
    val mean = d("s") / d("n")
    val sd = sqrt(d("q") / d("n") - mean * mean)
    val z = when(sd > lit(0.0), trunc6((d("r6") - mean) / sd))
      .otherwise(lit(null).cast("double"))
    dec.crossJoin(broadcast(mom))
      .select(col("day"), col("residual"), z.as("z"),
        coalesce(abs(z) > lit(zCut), lit(false)).as("is_anomaly"))
      .orderBy("day")
  }

  /** Markov transition frame shared by [[markovStationary]] and
    * [[conversionWithin]]: per-user lag pairs → row-stochastic
    * P(prev → next) with exact integer counts behind each double
    * ratio. Checkpointed so the fixed-unroll iterations reference a
    * materialized 25-row frame, not the re-derived window subtree
    * (the q99 lineage-cut lesson). */
  private def transitionMatrix(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val trans = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val tot = trans.groupBy("prev_type").agg(sum(col("n")).as("tot"))
    trans.join(tot, "prev_type")
      .select(col("prev_type"), col("next_type"),
        (col("n").cast("double") / col("tot").cast("double")).as("p"))
      .localCheckpoint()
  }

  /** Stationary distribution of the event-type Markov chain via a
    * fixed 20-step power iteration from uniform, next to the empirical
    * type share — "where does behavior settle vs where is it today";
    * a gap between the two flags a population mid-shift. The chain is
    * type-valued (states = event types), so every iteration is a
    * 25-row join + 5-row decimal-summed aggregation — the [[GraphOps]]
    * PageRank shape on a bounded state space; the raw event pass
    * happens ONCE in [[transitionMatrix]]. */
  def markovStationary(events: DataFrame, iters: Int = 20,
      driverCap: Int = maxDriverMatrixRows): DataFrame = {
    val pm = transitionMatrix(events)
    val spark = events.sparkSession
    import spark.implicits._
    // The corpus pass happens once in transitionMatrix; the fixpoint
    // itself runs over a frame bounded by |event types|² BY CONTRACT
    // (states = the type alphabet), so it iterates on the DRIVER with
    // bit-identical arithmetic (dsum12Local ≡ dsum12; the flatMap/
    // groupBy replays the inner join + keyed decimal sum exactly).
    // The distributed loop planned 2·iters exchanges of ≤ 25 rows —
    // pure scheduling overhead (2.85 s → sub-second at sf0.1) that
    // would dwarf the real work at ANY scale, because the matrix stays
    // alphabet-sized no matter the corpus. The collect is GUARDED by
    // the bradleyTerry cardinality pattern (the checkpoint makes the
    // count free): an out-of-contract high-cardinality type column
    // falls back to the distributed loop instead of OOMing the driver.
    val pi = collectMatrix(pm, driverCap) match {
      case Some(rows) => powerIteration(rows, iters).toSeq.toDF("state", "pi")
      case None => stationaryDistributed(pm, iters)
    }
    val emp = events.groupBy(col("event_type").as("state"))
      .agg(count(lit(1)).as("n"))
    val empTot = emp.agg(sum(col("n")).as("n_all"))
    pi
      .join(emp.crossJoin(broadcast(empTot)), "state")
      .select(col("state"), trunc6(col("pi")).as("stationary"),
        trunc6(col("n").cast("double") / col("n_all").cast("double"))
          .as("empirical"),
        trunc6(col("pi") -
          col("n").cast("double") / col("n_all").cast("double")).as("gap"))
      .orderBy("state")
  }

  /** Markov-family collect guard (the [[Stats.bradleyTerry]] pattern):
    * the checkpointed transition frame is |event types|²-bounded BY
    * CONTRACT, but an out-of-contract high-cardinality type column must
    * degrade to the distributed loop, not collect itself onto the
    * driver. The count is one cheap job over the already-materialized
    * checkpoint blocks. */
  private[graft] val maxDriverMatrixRows = 4096
  private def collectMatrix(pm: DataFrame,
      cap: Int): Option[Array[(String, String, Double)]] =
    if (pm.count() <= cap)
      Some(pm.collect().map(r =>
        (r.getString(0), r.getString(1), r.getDouble(2))))
    else None

  /** Distributed power-iteration fallback past [[collectMatrix]]'s
    * guard — the pre-r13 loop shape with a per-round localCheckpoint so
    * the composed plan stays linear. Arithmetic is dsum12, the exact
    * distributed twin of the driver path's dsum12Local. */
  private def stationaryDistributed(pm: DataFrame,
      iters: Int): DataFrame = {
    import graft.functions.TextFunctions.dsum12
    val states = pm.select(col("prev_type").as("state")).distinct()
      .localCheckpoint()
    val nS = lit(states.count())
    var pi = states.select(col("state"), (lit(1.0) / nS).as("pi"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      pi = pm.join(pi.select(col("state").as("prev_type"), col("pi")),
          "prev_type")
        .select(col("next_type").as("state"), (col("pi") * col("p")).as("c"))
        .groupBy("state").agg(dsum12(col("c")).as("pi"))
        .localCheckpoint()
    }
    pi
  }

  /** Driver-side power iteration over a collected (prev, next, p)
    * transition list — the exact replay of the former distributed
    * loop: start uniform over the distinct prev states, and each step
    * keeps exactly the states reachable via some (prev ∈ π) row (the
    * inner-join semantics), with contributions decimal-summed at 12
    * places ([[graft.functions.TextFunctions.dsum12Local]]). */
  private def powerIteration(rows: Array[(String, String, Double)],
      iters: Int): Map[String, Double] = {
    import graft.functions.TextFunctions.dsum12Local
    val states = rows.map(_._1).distinct
    var pi: Map[String, Double] =
      states.map(_ -> 1.0 / states.length).toMap
    for (_ <- 1 to iters) {
      pi = rows.flatMap { case (prev, next, p) =>
        pi.get(prev).map(v => next -> v * p)
      }.groupBy(_._1).map { case (s, cs) => s -> dsum12Local(cs.map(_._2)) }
    }
    pi
  }

  /** Finite-horizon absorption: probability that a user starting at
    * each state reaches `target` within `k` transitions — the
    * funnel-free "how close is each behavior to converting" readout
    * with exact semantics (no convergence cutoff: the k-step
    * probability IS the quantity). p₀ = 1{target}; pᵢ₊₁(s) =
    * Σ_t P(s,t)·pᵢ(t) for s ≠ target, target pinned at 1. Same
    * bounded-state iteration shape as [[markovStationary]]. */
  def conversionWithin(events: DataFrame, target: String = "purchase",
      k: Int = 7, driverCap: Int = maxDriverMatrixRows): DataFrame = {
    import graft.functions.TextFunctions.dsum12Local
    val pm = transitionMatrix(events)
    val spark = events.sparkSession
    import spark.implicits._
    // bounded-alphabet driver fixpoint (the [[markovStationary]]
    // shape): backward absorption over the collected matrix, target
    // pinned at 1 each step, missing states coalesce to 0 — the exact
    // replay of the former states-join-left loop. Same collect guard
    // as the rest of the family: past the cap the distributed loop
    // (the pre-r13 shape, per-round checkpointed) stands.
    val pi = collectMatrix(pm, driverCap) match {
      case Some(rows) =>
        val states = rows.map(_._1).distinct
        var pr: Map[String, Double] =
          states.map(s => s -> (if (s == target) 1.0 else 0.0)).toMap
        for (_ <- 1 to k) {
          val cont = rows.flatMap { case (prev, next, p) =>
            pr.get(next).map(v => prev -> p * v)
          }.groupBy(_._1).map { case (s, cs) => s -> dsum12Local(cs.map(_._2)) }
          pr = states.map(s => s ->
            (if (s == target) 1.0 else cont.getOrElse(s, 0.0))).toMap
        }
        pr.toSeq.toDF("state", "pr")
      case None =>
        import graft.functions.TextFunctions.dsum12
        val states = pm.select(col("prev_type").as("state")).distinct()
          .localCheckpoint()
        var pr = states.select(col("state"),
          when(col("state") === target, lit(1.0)).otherwise(lit(0.0)).as("pr"))
          .localCheckpoint()
        for (_ <- 1 to k) {
          val nxt = pm.join(pr.select(col("state").as("next_type"), col("pr")),
              "next_type")
            .select(col("prev_type").as("state"), (col("p") * col("pr")).as("c"))
            .groupBy("state").agg(dsum12(col("c")).as("cont"))
          pr = states.join(nxt, Seq("state"), "left")
            .select(col("state"),
              when(col("state") === target, lit(1.0))
                .otherwise(coalesce(col("cont"), lit(0.0))).as("pr"))
            .localCheckpoint()
        }
        pr
    }
    pi.select(col("state"), trunc6(col("pr")).as("p_within_k"))
      .orderBy("state")
  }

  /** Dwell time per transition: how long users linger on `prev` before
    * `next`, within-session only (gaps past `gapSeconds` are session
    * breaks, the q124 convention, and would poison the means). Exact
    * integer micros behind the mean; the p50 is the LOWER median —
    * picked by rank, engine-portable, no interpolation. The per-pair
    * rank window partitions by transition pair, so it distributes. */
  def transitionDwell(events: DataFrame,
      gapSeconds: Long = 3600L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val gaps = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .filter(col("prev_type").isNotNull &&
        col("gap_us") <= gapSeconds * 1000000L)
    val byPair = Window.partitionBy("prev_type", "next_type")
      .orderBy(col("gap_us"), col("event_id"))
    val ranked = gaps
      .select(col("prev_type"), col("event_type").as("next_type"),
        col("gap_us"), col("event_id"))
      .withColumn("rn", row_number().over(byPair).cast("long"))
    val agg = ranked.groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n"), sum(col("gap_us")).as("sum_us"))
    val med = ranked.join(agg, Seq("prev_type", "next_type"))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("prev_type"), col("next_type"),
        col("gap_us").as("p50_us"))
    agg.join(med, Seq("prev_type", "next_type"))
      .select(col("prev_type"), col("next_type"), col("n"),
        trunc6(col("sum_us").cast("double") / col("n").cast("double") /
          lit(1e6)).as("mean_sec"),
        trunc6(col("p50_us").cast("double") / lit(1e6)).as("p50_sec"))
      .orderBy("prev_type", "next_type")
  }

  /** Day-of-week seasonality profile per event type: mean value by
    * weekday index and its seasonal ratio against the type's overall
    * mean — the first chart read before any anomaly threshold is set
    * on weekly-patterned traffic. The weekday is the calendar-free
    * `epoch_day % 7` (0 = Thursday), exact in any engine; means ride
    * scaled-long sums so shard order can't move them. Two tiny
    * aggregations, broadcast join on the 5-row type totals. */
  def dowSeasonality(events: DataFrame): DataFrame = {
    val base = events.select(col("event_type"),
      expr("unix_micros(ts) div 86400000000 % 7").as("dow"), col("value"))
    val byDow = base.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n"), xsum(col("value")).as("sv"))
      .withColumn("mean_dow", col("sv") / col("n").cast("double"))
    // overall mean from the raw rows through the SAME order-free exact
    // sum — re-summing the per-dow doubles would be order-dependent
    val overall = base.groupBy("event_type")
      .agg((xsum(col("value")) / count(lit(1)).cast("double")).as("mean_all"))
    byDow.join(broadcast(overall), "event_type")
      .select(col("event_type"), col("dow"), col("n"),
        trunc6(col("mean_dow")).as("mean_value"),
        trunc6(col("mean_dow") / col("mean_all")).as("seasonal_index"))
      .orderBy("event_type", "dow")
  }

  /** CUSUM changepoint scan per event type (Page 1954): the day where
    * the cumulative deviation of daily totals from their overall mean
    * peaks — the classic "when did the level shift" detector. All
    * arithmetic stays on INTEGERS until the final report: daily totals
    * are 8-decimal scaled longs and the cumulative statistic is
    * `D·cumsum(T) − d·ΣT` (the mean-centered CUSUM scaled by the day
    * count), so no engine's summation order or windowed-double drift
    * can move the argmax. Day frames are tiny (one row per day per
    * type); the only data-sized pass is the daily rollup. */
  def cusumChangepoint(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * lit(1e8) + lit(0.5)).cast("long").as("v8"))
      .groupBy("event_type", "day").agg(sum(col("v8")).as("t"))
    val tot = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum(col("t")).as("sum_t"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wd = Window.partitionBy("event_type").orderBy("day")
    val scored = daily
      .withColumn("cum_t", sum(col("t")).over(w))
      .withColumn("d_idx", row_number().over(wd).cast("long"))
      .join(broadcast(tot), "event_type")
      .withColumn("s_scaled",
        col("n_days") * col("cum_t") - col("d_idx") * col("sum_t"))
    val pick = Window.partitionBy("event_type")
      .orderBy(abs(col("s_scaled")).desc, col("day"))
    scored.withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("n_days"),
        col("day").as("cp_day"),
        trunc6(abs(col("s_scaled")).cast("double") /
          (col("n_days").cast("double") * lit(1e8))).as("max_abs_cusum"))
      .orderBy("event_type")
  }

  /** Time-to-convert report for each funnel transition: exact median /
    * min / max latency between consecutive completed steps, over the
    * same strictly-after first-occurrence chain as [[funnel]] (which
    * this calls — one definition of "converted"). Medians use the
    * mid-rank convention (average of ranks ⌈n/2⌉, ⌈(n+1)/2⌉ under a
    * user-id-tie-broken order); latencies are integer µs so everything
    * up to the final half-sum is exact. Converted-user frames are tiny
    * next to the event stream — the rank windows cost nothing at
    * scale. */
  def funnelLatency(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.length >= 2, "latency needs at least one transition")
    val f = funnel(events, steps)
    val lats = steps.indices.drop(1).map { i =>
      f.filter(col(s"t${i + 1}").isNotNull)
        .select(lit(s"${steps(i - 1)}->${steps(i)}").as("step"),
          col("user_id"),
          (col(s"t${i + 1}") - col(s"t$i")).as("lat_us"))
    }.reduce(_ unionAll _)
    val stats = lats.groupBy("step").agg(count(lit(1)).as("n_converted"),
      min(col("lat_us")).as("min_us"), max(col("lat_us")).as("max_us"))
    val w = Window.partitionBy("step").orderBy(col("lat_us"), col("user_id"))
    val med = lats
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("step")))
      .filter(col("rn") === expr("(n + 1) div 2") ||
        col("rn") === expr("(n + 2) div 2"))
      .groupBy("step")
      .agg(trunc6((min(col("lat_us")) + max(col("lat_us"))) / lit(2.0))
        .as("median_us"))
    stats.join(med, "step")
      .select(col("step"), col("n_converted"), col("median_us"),
        col("min_us"), col("max_us"))
      .orderBy("step")
  }

  /** Top clickstream paths: the ordered event-type sequence of each
    * gap-session (capped at the first `maxSteps` events — the cap is
    * what keeps path strings bounded at any scale), counted and
    * ranked. The per-session ordering is materialized by sorting the
    * (ts, event_id, type) struct array INSIDE the row — collect order
    * never matters — mirroring engines that support ordered string
    * aggregation directly. */
  def sessionPaths(events: DataFrame, gapSeconds: Long,
      maxSteps: Int = 8, topK: Int = 10): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val ev = events.select(col("user_id"), col("event_id"),
      col("event_type"), unix_micros(col("ts")).as("us"))
    val gap = col("us") - lag(col("us"), 1).over(byUser)
    val sessions = ev
      .withColumn("ns",
        when(gap.isNull || gap > gapSeconds * 1000000L, 1).otherwise(0))
      .withColumn("sid", sum(col("ns")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("step", row_number().over(Window
        .partitionBy("user_id", "sid").orderBy(col("us"), col("event_id"))))
      .filter(col("step") <= maxSteps)
    val paths = sessions
      .groupBy("user_id", "sid")
      .agg(array_join(expr(
        "transform(sort_array(collect_list(struct(us, event_id, event_type))), " +
          "x -> x.event_type)"), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
    val w = Window.orderBy(col("n_sessions").desc, col("path"))
    paths.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("rank"), col("path"), col("n_sessions"))
      .orderBy("rank")
  }

  /** Autocorrelation function of the daily value series at lags
    * 1..`maxLag` — the periodicity detector behind seasonality choices
    * (a weekly cycle shows as a lag-7 peak). Daily totals are 8-decimal
    * scaled longs; deviations from the mean multiply as doubles and sum
    * on the order-free 12-decimal grid, so shard order can't move the
    * coefficients. The day series is tiny; the only data-sized pass is
    * the daily rollup. Gaps in the calendar are treated as missing
    * days (lag pairs use the DAY index, not row adjacency). */
  def dailyAcf(events: DataFrame, maxLag: Int = 7): DataFrame = {
    val daily = events
      .select(expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * lit(1e8) + lit(0.5)).cast("long").as("v8"))
      .groupBy("day").agg(sum(col("v8")).as("t8"))
    val tot = daily.agg(count(lit(1)).as("n_days"), sum(col("t8")).as("sum8"))
    val dev = daily.crossJoin(broadcast(tot))
      .select(col("day"),
        (col("t8").cast("double") / lit(1e8) -
          col("sum8").cast("double") / (col("n_days").cast("double") * lit(1e8)))
          .as("dev"))
    val den = dev.agg(dsum12(col("dev") * col("dev")).as("ss"))
    val lagged = dev.toDF("day", "dev_a")
      .select(col("day"), col("dev_a"),
        explode(sequence(lit(1), lit(maxLag))).as("lag"))
      .join(dev.toDF("day_b", "dev_b"),
        col("day_b") === col("day") + col("lag"))
    lagged.groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"),
        dsum12(col("dev_a") * col("dev_b")).as("sp"))
      .crossJoin(broadcast(den))
      .select(col("lag").cast("long").as("lag"), col("n_pairs"),
        trunc6(col("sp") / col("ss")).as("acf"))
      .orderBy("lag")
  }

  /** Inter-event burstiness per event type (Goh & Barabási 2008):
    * the coefficient of variation of per-user inter-arrival gaps and
    * B = (CV−1)/(CV+1) — 0 for Poisson arrivals, →1 for bursty trains,
    * <0 for pacemaker-regular ones. Gaps quantize to whole SECONDS so
    * the moment sums stay exact longs (µs² would overflow); one window
    * pass + one aggregation. */
  def burstiness(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type", "user_id")
      .orderBy(col("us"), col("event_id"))
    val gaps = events
      .select(col("event_type"), col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      // integer `div`, NOT `/`: Spark's `/` on longs detours through
      // DOUBLE, whose rounding can land a hair above the true quotient
      // and truncate to the wrong second
      .withColumn("gap_s", expr("gap_us div 1000000"))
      .filter(col("gap_s").isNotNull)
    val d = (c: String) => col(c).cast("double")
    gaps.groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap_s")).as("sg"),
        sum(col("gap_s") * col("gap_s")).as("sgg"))
      .withColumn("mean_s", d("sg") / d("n_gaps"))
      .withColumn("cv",
        sqrt(d("sgg") / d("n_gaps") - col("mean_s") * col("mean_s")) /
          col("mean_s"))
      .select(col("event_type"), col("n_gaps"),
        trunc6(col("mean_s")).as("mean_gap_s"),
        trunc6(col("cv")).as("cv"),
        trunc6((col("cv") - lit(1.0)) / (col("cv") + lit(1.0)))
          .as("burstiness"))
      .orderBy("event_type")
  }

  /** Peak session concurrency per day via the classic sweep line:
    * gap-sessionize (same 3600 s rule as [[sessionize]]), emit a +1
    * point at each session start and a −1 at its end, and take the
    * daily max of the running sum. Starts sort before ends at the same
    * instant (delta DESC), so touching sessions count as overlapping.
    * The running sum here is one global ordered window — correct and
    * simplest at report scale; at 100 TB the same sweep runs as a
    * range-partitioned sort plus per-partition prefix offsets (the
    * two-phase pattern TextAnalysis.packSequences ships), because
    * session-boundary points are ~2 rows per session, orders of
    * magnitude smaller than the event stream that produced them. */
  def sessionConcurrency(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val ev = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"))
    val gap = col("us") - lag(col("us"), 1).over(byUser)
    val sessions = ev
      .withColumn("ns",
        when(gap.isNull || gap > gapSeconds * 1000000L, 1).otherwise(0))
      .withColumn("sid", sum(col("ns")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min(col("us")).as("s_us"), max(col("us")).as("e_us"))
    val pts = sessions.select(col("s_us").as("us"), lit(1L).as("delta"))
      .unionAll(sessions.select(col("e_us").as("us"), lit(-1L).as("delta")))
    val sweep = Window.orderBy(col("us"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.withColumn("conc", sum(col("delta")).over(sweep))
      .groupBy(expr("us div 86400000000").as("day"))
      .agg(max(col("conc")).as("max_concurrent"),
        count(when(col("delta") === 1L, 1)).as("n_starts"))
      .orderBy("day")
  }

  /** Entropy rate of the event-type Markov chain (Shannon 1948):
    * H = −Σᵢ πᵢ Σⱼ Pᵢⱼ ln Pᵢⱼ, with π from the same 20-step power
    * iteration as [[markovStationary]]. Per-state conditional entropy
    * h(i) = −Σⱼ P ln P comes from one 25-row aggregation; the raw
    * event pass happens once in [[transitionMatrix]]. Output is
    * per-state (π, h, contribution) so the rate decomposes — the
    * "how predictable is behavior from each state" readout. */
  def markovEntropyRate(events: DataFrame, iters: Int = 20,
      driverCap: Int = maxDriverMatrixRows): DataFrame = {
    val pm = transitionMatrix(events)
    val spark = events.sparkSession
    import spark.implicits._
    // same bounded-alphabet driver fixpoint as [[markovStationary]],
    // behind the same collect guard with the same distributed fallback
    val pi = collectMatrix(pm, driverCap) match {
      case Some(rows) => powerIteration(rows, iters).toSeq.toDF("state", "pi")
      case None => stationaryDistributed(pm, iters)
    }
    val rowH = pm.groupBy(col("prev_type").as("state"))
      .agg(dsum12(-(col("p") * log(col("p")))).as("h_state"))
    pi
      .join(rowH, "state")
      .select(col("state"), trunc6(col("pi")).as("stationary"),
        trunc6(col("h_state")).as("h_state"),
        trunc6(col("pi") * col("h_state")).as("contribution"))
      .orderBy("state")
  }

  /** Difference-in-differences on the event-value metric: mean value
    * per (treatment × period) cell around `splitDay`, and the DiD
    * estimate (ΔT − ΔC) — the parallel-trends experiment readout
    * (Card & Krueger 1994). Assignment is a caller-supplied row
    * predicate; the whole computation is ONE conditional aggregation
    * over the stream (four filtered sum/count pairs), so at 100 TB it
    * is a single map-side-combinable pass. Cell sums ride the
    * 12-decimal grid; means and the estimate are pinned-form double
    * divisions. */
  def diffInDiff(events: DataFrame, isTreat: Column,
      splitDay: Long): DataFrame = {
    val day = expr("unix_micros(ts) div 86400000000")
    val base = events.select(col("value"),
      when(isTreat, 1L).otherwise(0L).as("tr"),
      when(day >= splitDay, 1L).otherwise(0L).as("post"))
    def cell(t: Int, p: Int, agg: Column) =
      sum(when(col("tr") === t && col("post") === p, agg))
    val g = base.agg(
      cell(1, 0, lit(1L)).as("n_t_pre"), cell(1, 1, lit(1L)).as("n_t_post"),
      cell(0, 0, lit(1L)).as("n_c_pre"), cell(0, 1, lit(1L)).as("n_c_post"),
      dsum12(when(col("tr") === 1L && col("post") === 0L, col("value"))
        .otherwise(lit(0.0))).as("s_t_pre"),
      dsum12(when(col("tr") === 1L && col("post") === 1L, col("value"))
        .otherwise(lit(0.0))).as("s_t_post"),
      dsum12(when(col("tr") === 0L && col("post") === 0L, col("value"))
        .otherwise(lit(0.0))).as("s_c_pre"),
      dsum12(when(col("tr") === 0L && col("post") === 1L, col("value"))
        .otherwise(lit(0.0))).as("s_c_post"))
    def m(s: String, n: String) = col(s) / col(n).cast("double")
    g.select(col("n_t_pre"), col("n_t_post"), col("n_c_pre"), col("n_c_post"),
      trunc6(m("s_t_pre", "n_t_pre")).as("m_t_pre"),
      trunc6(m("s_t_post", "n_t_post")).as("m_t_post"),
      trunc6(m("s_c_pre", "n_c_pre")).as("m_c_pre"),
      trunc6(m("s_c_post", "n_c_post")).as("m_c_post"),
      trunc6((m("s_t_post", "n_t_post") - m("s_t_pre", "n_t_pre")) -
        (m("s_c_post", "n_c_post") - m("s_c_pre", "n_c_pre"))).as("did"))
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker 2013): per
    * user, x = pre-period mean value and y = post-period mean value;
    * θ = cov(x,y)/var(x) pooled over users, adjusted lift =
    * (ȳT − ȳC) − θ(x̄T − x̄C), and the theoretical variance-reduction
    * ratio ρ² = cov²/(var(x)·var(y)). Only users observed in BOTH
    * periods enter. Two grouped passes (user rollup, then one global
    * moment aggregation on the user-sized frame) — the user frame is
    * population-sized, not event-sized, so the moments pass is cheap
    * at any scale. All moment sums ride the 12-decimal grid. */
  def cuped(events: DataFrame, isTreat: Column,
      splitDay: Long): DataFrame = {
    val day = expr("unix_micros(ts) div 86400000000")
    val byUser = events
      .select(col("user_id"), col("value"),
        when(day < splitDay, 1L).otherwise(0L).as("pre"))
      .groupBy("user_id")
      .agg(sum(col("pre")).as("nx"), sum(lit(1L) - col("pre")).as("ny"),
        dsum12(when(col("pre") === 1L, col("value")).otherwise(lit(0.0)))
          .as("sx"),
        dsum12(when(col("pre") === 0L, col("value")).otherwise(lit(0.0)))
          .as("sy"))
      .filter(col("nx") > 0L && col("ny") > 0L)
      .select(col("user_id"),
        (col("sx") / col("nx").cast("double")).as("x"),
        (col("sy") / col("ny").cast("double")).as("y"),
        when(isTreat, 1L).otherwise(0L).as("tr"))
    val g = byUser.agg(count(lit(1)).as("n"),
      dsum12(col("x")).as("sx"), dsum12(col("y")).as("sy"),
      dsum12(col("x") * col("y")).as("sxy"),
      dsum12(col("x") * col("x")).as("sxx"),
      dsum12(col("y") * col("y")).as("syy"),
      sum(col("tr")).as("n_t"),
      dsum12(when(col("tr") === 1L, col("x")).otherwise(lit(0.0))).as("sx_t"),
      dsum12(when(col("tr") === 1L, col("y")).otherwise(lit(0.0))).as("sy_t"))
    val nD = col("n").cast("double")
    val nT = col("n_t").cast("double")
    val nC = (col("n") - col("n_t")).cast("double")
    val covxy = (nD * col("sxy") - col("sx") * col("sy")) / (nD * nD)
    val varx = (nD * col("sxx") - col("sx") * col("sx")) / (nD * nD)
    val vary = (nD * col("syy") - col("sy") * col("sy")) / (nD * nD)
    val theta = covxy / varx
    val rawLift = col("sy_t") / nT - (col("sy") - col("sy_t")) / nC
    val adjLift = rawLift -
      theta * (col("sx_t") / nT - (col("sx") - col("sx_t")) / nC)
    g.select(col("n").as("n_users"), col("n_t").as("n_treat"),
      trunc6(theta).as("theta"), trunc6(rawLift).as("raw_lift"),
      trunc6(adjLift).as("adj_lift"),
      trunc6(covxy * covxy / (varx * vary)).as("var_reduction"))
  }
}
