package graft.operators

import graft.functions.TextFunctions.{davg, dsum, trunc6}
import org.apache.spark.sql.DataFrame
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
}
