package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling — the pre-flight report run before any
  * pipeline touches an unfamiliar table (null density, cardinality,
  * value bounds per column). Reference analogue: the stats/health
  * endpoints every store exposes (memfuse `get_stats` surfaces row
  * counts only; this is the per-column generalization a 100 TB lake
  * actually needs before choosing join/broadcast/partition strategy).
  */
object Profile {

  /** One-pass profile of the chosen columns: null count, exact
    * distinct count, min/max rendered as strings. All measures ride a
    * SINGLE aggregation job (Spark expands the multi-distinct into one
    * pass over the scan — |cols|× row expansion, no per-column jobs);
    * the result is one collected row (bounded: 4 scalars per column)
    * pivoted into a |cols|-row report on the driver. Swap the exact
    * distinct for [[Sketches.hllSketch]] merges when even the expanded
    * pass is too hot. String rendering note: profile numeric-exact
    * (int/string/date) columns for engine-portable min/max strings —
    * double formatting differs across engines. */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = cols.flatMap { c =>
      Seq(count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.map { c =>
      (c, row.getAs[Long](s"${c}__nulls"), row.getAs[Long](s"${c}__distinct"),
        row.getAs[String](s"${c}__min"), row.getAs[String](s"${c}__max"))
    }.toDF("col_name", "n_nulls", "n_distinct", "min_str", "max_str")
      .orderBy("col_name")
  }

  /** The 100 TB profile: same report with the exact multi-distinct
    * replaced by per-column HLL sketches, ALL built in one pass — the
    * table unfolds row-locally to (col_name, stringified value) and a
    * single sketch aggregation keyed by col_name produces every
    * column's register table (|cols|·2^b rows, map-side combinable,
    * shard-mergeable), where [[tableProfile]]'s exact path pays a
    * |cols|× expand into a full distinct-aggregate. Nulls and
    * lexicographic min/max stay exact in the same long form. Estimates
    * use the engine-portable md5 HLL ([[Sketches.hllSketch]]), so the
    * whole report is oracle-checkable. */
  def tableProfileSketched(df: DataFrame, cols: Seq[String],
      b: Int = 6): DataFrame = {
    val longF = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*))
      .as("r"))
      .select(col("r.col_name"), col("r.v"))
    val est = Sketches.hllEstimate(
      Sketches.hllSketch(longF.filter(col("v").isNotNull),
        Seq("col_name"), col("v"), b),
      Seq("col_name"), b)
    val stats = longF.groupBy("col_name").agg(
      count(when(col("v").isNull, 1)).as("n_nulls"),
      min(col("v")).as("min_str"), max(col("v")).as("max_str"))
    stats.join(est, Seq("col_name"))
      .select(col("col_name"), col("n_nulls"), col("est_distinct"),
        col("min_str"), col("max_str"))
      .orderBy("col_name")
  }

  /** Robust per-group outlier screen on the modified z-score
    * (Iglewicz & Hoaglin 1993): median and MAD replace mean/stddev so a
    * few extreme rows can't inflate their own yardstick — the failure
    * mode of the plain z-score screen. Medians are exact (average of
    * ranks ⌈n/2⌉ and ⌈(n+1)/2⌉), and because the screen keys are
    * LOW-cardinality flags with data-sized groups, each median rides
    * the [[Stats.keyedExactMedian]] two-phase prefix-count sweep — a
    * `Window.partitionBy(key)` here would collapse to |keys|
    * single-task sorts of the whole corpus. Two sweeps (value, then
    * absolute deviation) + two key-sized broadcast joins. `mad = 0`
    * groups (over half the values identical) flag NO rows, by
    * explicit contract — the modified z is undefined there, and the
    * guard is a lazy CASE so the division never evaluates (ANSI-safe)
    * rather than an IEEE ±Inf comparison. */
  def madOutliers(df: DataFrame, key: String, value: String,
      zCut: Double = 3.5): DataFrame = {
    // everything past the first rollup is VALUE-level: the z flag
    // depends only on |x − med| (IEEE |a·b/c| = |a|·|b|/|c| bit-exact
    // for c > 0), so rows collapse to (k, value, count) once and the
    // sweeps, the deviation rollup and the final flag count all work
    // on checkpointed count frames — no second scan of the input
    val vc = df.select(col(key).cast("string").as("k"),
        col(value).cast("double").as("v"))
      .groupBy("k", "v").agg(count(lit(1)).as("na"))
      .localCheckpoint()
    val med = Stats.keyedExactMedian(vc, "med", preMaterialized = true)
    val devc = vc.join(broadcast(med), "k")
      .groupBy(col("k"), abs(col("v") - col("med")).as("v"))
      .agg(sum(col("na")).as("na"))
      .localCheckpoint()
    val mad = Stats.keyedExactMedian(devc, "mad", preMaterialized = true)
    import graft.functions.TextFunctions.trunc6
    val z = lit(0.6745) * col("v") / col("mad")
    val flagged = when(col("mad") > lit(0.0), abs(z) > lit(zCut))
      .otherwise(lit(false))
    devc.join(broadcast(mad), "k").join(broadcast(med), "k")
      .groupBy(col("k").as(key))
      .agg(sum(col("na")).as("n"),
        trunc6(max(col("med"))).as("median"),
        trunc6(max(col("mad"))).as("mad"),
        sum(when(flagged, col("na")).otherwise(lit(0L))).as("n_outliers"))
      .orderBy(key)
  }
}
