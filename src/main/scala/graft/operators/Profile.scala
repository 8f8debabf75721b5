package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.trunc6

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
    // null measures are excluded by contract; the key returns as
    // STRING (the sweep-family key form)
    val vc = df.select(col(key).cast("string").as("k"),
        col(value).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("k", "v").agg(count(lit(1)).as("na"))
      .localCheckpoint()
    val med = Stats.keyedExactMedian(vc, "med", preMaterialized = true)
    // the deviation frame is NOT re-aggregated: the sweep's rank probes
    // are correct over duplicate (k, v) count rows (cumulative
    // intervals still partition the rank line and duplicates of a
    // value are adjacent under the sweep's sort, so the covering row's
    // v is unchanged) — the old groupBy(k, |v−med|) re-exchange merged
    // at most the v = med±d twins and cost a full data-sized Exchange
    // for it (guide §2.4). One broadcast join + checkpoint replaces
    // exchange + checkpoint; row count is vc's, same order of size.
    val devc = vc.join(broadcast(med), "k")
      .select(col("k"), abs(col("v") - col("med")).as("v"), col("na"))
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

  /** Join-cardinality estimate from equi-depth histograms — the
    * System-R statistics pass an engine runs BEFORE choosing a join
    * strategy (Selinger et al. 1979; per-bucket containment
    * assumption: |b₁⋈b₂| ≈ n₁·n₂ / max(d₁, d₂)). Cut points are the
    * left side's exact `buckets`-quantiles (the q192 rank rule);
    * BOTH sides bucket at VALUE level (distinct keys × buckets
    * row-local fan-out — never a row-level expansion), so the whole
    * estimate reads two key-count rollups plus bounded bucket math,
    * while the audit column pays the real join once. */
  def joinCardinalityEstimate(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String, buckets: Int = 16): DataFrame = {
    import graft.functions.TextFunctions.dsum12
    val lv = left.select(col(leftKey).cast("long").as("v"))
      .groupBy("v").agg(count(lit(1)).as("n")).localCheckpoint()
    val rv = right.select(col(rightKey).cast("long").as("v"))
      .groupBy("v").agg(count(lit(1)).as("n")).localCheckpoint()
    val qs = (1 until buckets).map(k => k.toDouble / buckets)
    val cuts = Stats.exactQuantilesPerKey(
      left.select(col(leftKey).cast("long").as("x"))
        .withColumn("k0", lit("all")), "k0", "x", qs)
      .select(col("value").as("cut"))
    def bucketed(vals: DataFrame) = vals
      .crossJoin(broadcast(cuts))
      .groupBy("v", "n")
      .agg(sum(when(col("v").cast("double") > col("cut"), 1L)
        .otherwise(0L)).as("bucket"))
    val lb = bucketed(lv).groupBy("bucket")
      .agg(sum(col("n")).as("n1"), count(lit(1)).as("d1"))
    val rb = bucketed(rv).groupBy("bucket")
      .agg(sum(col("n")).as("n2"), count(lit(1)).as("d2"))
    val d = (c: String) => col(c).cast("double")
    val est = lb.join(rb, "bucket")
      .agg(dsum12(d("n1") * d("n2") / greatest(d("d1"), d("d2")))
        .as("est_rows_raw"))
    val actual = lv.toDF("v", "n1").join(rv.toDF("v", "n2"), "v")
      .agg(sum(col("n1") * col("n2")).as("actual_rows"))
    est.crossJoin(broadcast(actual))
      .select(lit(buckets.toLong).as("n_buckets"),
        trunc6(col("est_rows_raw")).as("est_rows"),
        col("actual_rows"),
        // disjoint key sets make the real join empty; a 0-row audit
        // has no relative error to report (null, not NaN/÷0)
        when(col("actual_rows") > 0,
          trunc6(abs(col("est_rows_raw") - col("actual_rows").cast("double")) /
            col("actual_rows").cast("double"))).as("rel_error"))
  }

  /** One-pass declarative expectations gate (the great-expectations
    * shape): every metric is an aggregate column over a SINGLE scan,
    * pass = observed ∈ [lo, hi] on the trunc6 grid. The audit is the
    * contract a pipeline checks before trusting a new drop of data —
    * row volume, key uniqueness, null shares, domain membership. */
  def expectationsAudit(df: DataFrame,
      metrics: Seq[(String, Column, Double, Double)]): DataFrame = {
    val agg = df.agg(metrics.head._2.as(metrics.head._1),
      metrics.tail.map(m => m._2.as(m._1)): _*)
    val rows = metrics.map { case (name, _, lo, hi) =>
      struct(lit(name).as("expectation"),
        trunc6(col(name).cast("double")).as("observed"),
        lit(lo).as("lo"), lit(hi).as("hi"))
    }
    agg.select(explode(array(rows: _*)).as("e"))
      .select(col("e.expectation").as("expectation"),
        col("e.observed").as("observed"),
        // a null observation (e.g. avg over an empty scan) must FAIL
        // the gate, not vanish from `WHERE NOT pass` checks downstream
        coalesce(col("e.observed") >= col("e.lo") &&
          col("e.observed") <= col("e.hi"), lit(false)).as("pass"))
      .orderBy("expectation")
  }

  /** Deterministic stratified k-fold assignment + balance report: the
    * fold of a row is a salted hash of its id (engine-portable, no
    * RNG state), so folds are reproducible across runs AND engines;
    * the report shows each stratum's fold shares so a skewed stratum
    * is caught before training. One tag pass + two bounded rollups. */
  def stratifiedKfold(df: DataFrame, stratum: String, id: Column,
      k: Int = 5, salt: String = "fold"): DataFrame = {
    import graft.functions.TextFunctions.md5Long
    val tagged = df.select(col(stratum).as("stratum"),
      (md5Long(concat(lit(salt + "|"), id.cast("string"))) % k).as("fold"))
    val tot = tagged.groupBy("stratum").agg(count(lit(1)).as("n_stratum"))
    tagged.groupBy("stratum", "fold").agg(count(lit(1)).as("n"))
      .join(broadcast(tot), "stratum")
      .select(col("stratum"), col("fold"), col("n"),
        trunc6(col("n").cast("double") / col("n_stratum").cast("double"))
          .as("share"))
      .orderBy("stratum", "fold")
  }

  /** Majority-class downsampling by hash gate toward 1:1 — the
    * imbalance fix that distributes (each row decides locally from a
    * salted hash; no global shuffle, no RNG coordination). The keep
    * probability n_min/n_maj is floored to the 10⁻⁶ grid so both
    * engines compare the SAME integer threshold, and the report ships
    * ln(keep_rate) — the logit correction that undoes the prior shift
    * at scoring time (King & Zeng 2001). */
  def balancedDownsample(df: DataFrame, isPos: Column, id: Column,
      salt: String = "bal"): DataFrame = {
    import graft.functions.TextFunctions.md5Long
    val base = df.select(isPos.as("pos"),
      md5Long(concat(lit(salt + "|"), id.cast("string"))).as("h"))
    val counts = base.groupBy("pos").agg(count(lit(1)).as("n_before"))
    val sizes = counts.agg(min(col("n_before")).as("n_min"))
    val d = (c: String) => col(c).cast("double")
    base.join(broadcast(counts), "pos")
      .crossJoin(broadcast(sizes))
      .withColumn("thr",
        floor(d("n_min") / d("n_before") * lit(1e6)).cast("long"))
      .withColumn("keep", col("n_before") === col("n_min") ||
        col("h") % lit(1000000L) < col("thr"))
      .groupBy(col("pos").as("is_positive"))
      .agg(max(col("n_before")).as("n_before"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_after"))
      .select(col("is_positive"), col("n_before"), col("n_after"),
        trunc6(d("n_after") / d("n_before")).as("keep_rate"),
        trunc6(log(d("n_after") / d("n_before"))).as("logit_correction"))
      .orderBy("is_positive")
  }
}
