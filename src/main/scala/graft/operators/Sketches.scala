package graft.operators

import graft.functions.TextFunctions.trunc6
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches for corpus profiling at 100 TB —
  * distinct URLs / fingerprints / n-grams per shard without an exact
  * distinct (whose shuffle is corpus-sized). HyperLogLog (Flajolet et
  * al. 2007) with a twist that makes it ORACLE-CHECKABLE: every piece —
  * the hash (md5), the register index (a hex slice), the rank (a
  * trailing-zeros CASE chain), the harmonic estimate (exact powers of
  * two through a decimal-widened sum) — is deterministic and computes
  * bit-identically in any engine, unlike the implementation-defined
  * `approx_count_distinct` sketches.
  *
  * Shape at scale: the sketch is ONE map-side-combinable groupBy
  * (max per register) producing `m` rows per group — merging shards is
  * the same max, so shard sketches union and re-aggregate without
  * touching raw data again. Standard error ≈ 1.04/√m.
  */
object Sketches {

  /** Trailing-zeros rank (Flajolet's ρ) of a 52-bit md5-derived value:
    * the CASE chain `h % 2^k == 2^(k-1) → k` — mechanically identical
    * to the SQL twin's generated CASE. ρ(0) = 53 (all bits zero). */
  private def rho(h: Column): Column =
    (1 to 52).foldLeft[Option[Column]](None) { (acc, k) =>
      val cond = h % lit(1L << k) === lit(1L << (k - 1))
      Some(acc.fold(when(cond, k))(_.when(cond, k)))
    }.get.otherwise(53)

  /** Per-group HLL register table: (keys..., register, max_rho) — at
    * most `2^b` rows per group. The register index and the rank body
    * come from disjoint hex slices of one salted md5. */
  def hllSketch(df: DataFrame, keys: Seq[String], value: Column, b: Int = 6): DataFrame = {
    val m = 1 << b
    val h = md5(concat(lit("hll|"), value))
    val reg = conv(substring(h, 1, 8), 16, 10).cast("long") % m
    val body = conv(substring(h, 9, 13), 16, 10).cast("long") // 52 bits
    df.select(keys.map(col) :+ reg.as("register") :+ rho(body).as("r"): _*)
      .groupBy(keys.map(col) :+ col("register"): _*)
      .agg(max(col("r")).as("max_rho"))
  }

  /** Cardinality estimate per group from a register table (merging
    * shard sketches first is the same max-aggregation). Standard HLL:
    * E = α·m² / Σ 2^(−M_j) with empty registers contributing 2⁰, and
    * the linear-counting small-range correction when E ≤ 2.5m and
    * empty registers exist. The harmonic sum is computed as an exact
    * INTEGER — each 2^(−ρ) scaled by 2^53 (ρ ≤ 53, so every term and
    * the ≤ m·2^53 total fit a long exactly) — so no float-summation
    * order or decimal rounding can diverge across engines. */
  def hllEstimate(sketch: DataFrame, keys: Seq[String], b: Int = 6): DataFrame = {
    val m = 1 << b
    // α_m per the paper: 0.673 (m=16), 0.697 (m=32), 0.709 (m=64),
    // 0.7213/(1+1.079/m) beyond
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1 + 1.079 / m)
    }
    val agg = sketch.groupBy(keys.map(col): _*)
      .agg(sum(pow(lit(2.0), lit(53) - col("max_rho")).cast("long"))
        .as("present_scaled"),
        count(lit(1)).as("n_present"))
    val zeros = (lit(m) - col("n_present")).cast("long")
    // Σ 2^(−ρ) scaled by 2^53; empty registers contribute 2⁰ = 2^53/2^53
    val totalScaled = col("present_scaled") + zeros * pow(lit(2.0), 53).cast("long")
    val rawE = lit(alpha * m * m) * pow(lit(2.0), 53) / totalScaled.cast("double")
    val est = when(rawE <= lit(2.5 * m) && zeros > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
      .otherwise(rawE)
    agg.select(keys.map(col) :+ trunc6(est).as("est_distinct"): _*)
      .orderBy(keys.map(col): _*)
  }

  /** Sketch + estimate in one call — the registered query shape. */
  def hllDistinct(df: DataFrame, keys: Seq[String], value: Column, b: Int = 6): DataFrame =
    hllEstimate(hllSketch(df, keys, value, b), keys, b)

  /** Set-overlap estimate by inclusion–exclusion over HLL sketches
    * (Flajolet et al. 2007 — register tables merge by MAX, so |A∪B|
    * reads off the same two sketches without touching the stream
    * again): one tagged sketch pass over the filtered rows, one
    * register-max merge, three estimates, |A∩B| ≈ Ea + Eb − E∪. The
    * intersection's relative error inflates as the true overlap
    * shrinks (difference of estimates) — callers pair it with the
    * exact count, the q152 audit convention. */
  def hllOverlap(df: DataFrame, tagCol: String, tagA: String,
      tagB: String, value: Column, b: Int = 10): DataFrame = {
    val tagged = df.filter(col(tagCol).isin(tagA, tagB))
      .select(col(tagCol).as("tag"), value.as("v"))
    // register table is tags × m rows — checkpointed so the per-tag
    // estimates and the union merge don't re-scan the stream
    val sk = hllSketch(tagged, Seq("tag"), col("v"), b).localCheckpoint()
    val est = hllEstimate(sk, Seq("tag"), b)
    val estU = hllEstimate(
      sk.groupBy("register").agg(max(col("max_rho")).as("max_rho"))
        .withColumn("tag", lit("union")),
      Seq("tag"), b)
    est.filter(col("tag") === tagA)
      .select(col("est_distinct").as("est_a"))
      .crossJoin(est.filter(col("tag") === tagB)
        .select(col("est_distinct").as("est_b")))
      .crossJoin(estU.select(col("est_distinct").as("est_union")))
      .select(col("est_a"), col("est_b"), col("est_union"),
        // inclusion–exclusion is a DIFFERENCE of estimates: for a small
        // true overlap the noise can push it negative, and a negative
        // cardinality is never a meaningful answer — clamp at zero
        trunc6(greatest(lit(0.0),
          col("est_a") + col("est_b") - col("est_union")))
          .as("est_intersection"))
  }

  /** Rolling window-distinct users via MERGEABLE per-day HLL sketches
    * — the 100 TB path for the exact rolling-actives report: each day
    * keeps m registers, and a w-day window is a register-max merge of
    * w day sketches (a row-local day → day..day+w−1 fan-out of the
    * day-sized register table), never a re-scan of raw events. The
    * exact twin rides the same fan-out so the report ships its own
    * accuracy audit. */
  def rollingHllWau(events: DataFrame, windowDays: Int = 7,
      b: Int = 10): DataFrame = {
    val days = events.select(
      expr("unix_micros(ts) div 86400000000").as("day"),
      col("user_id").cast("string").as("u"))
    val observed = days.select("day").distinct()
    val span = lit((windowDays - 1).toLong)
    val rolled = hllSketch(days, Seq("day"), col("u"), b)
      .select(explode(sequence(col("day"), col("day") + span)).as("day_t"),
        col("register"), col("max_rho"))
      .groupBy(col("day_t").as("day"), col("register"))
      .agg(max(col("max_rho")).as("max_rho"))
    val est = hllEstimate(rolled, Seq("day"), b)
    val exact = days.distinct()
      .select(explode(sequence(col("day"), col("day") + span)).as("day_t"),
        col("u"))
      .groupBy(col("day_t").as("day"))
      .agg(countDistinct(col("u")).as("exact_wau"))
    est.join(exact, "day").join(observed, Seq("day"), "left_semi")
      .select(col("day"), col("est_distinct").as("est_wau"),
        col("exact_wau"),
        trunc6(abs(col("est_distinct") - col("exact_wau").cast("double")) /
          col("exact_wau").cast("double")).as("rel_error"))
      .orderBy("day")
  }

  /** Count–min sketch (Cormode & Muthukrishnan 2005): a depth×width
    * counter table over a value stream. Like [[hllSketch]], every hash
    * is a salted md5 slice, so the sketch computes bit-identically in
    * any engine. ONE map-side-combinable groupBy builds it (the depth-
    * way row expansion is row-local); shard sketches merge by SUMMING
    * counters — the property that lets 1000 executors sketch 100 TB
    * locally and ship depth×width longs each, never the key set. */
  def cmsSketch(df: DataFrame, value: Column,
      depth: Int = 4, width: Int = 256): DataFrame = {
    val rows = (0 until depth).map { d =>
      val h = md5(concat(lit(s"cms$d|"), value))
      struct(lit(d).as("depth"),
        (conv(substring(h, 1, 13), 16, 10).cast("long") % width).as("bucket"))
    }
    df.select(explode(array(rows: _*)).as("r"))
      .groupBy(col("r.depth").as("depth"), col("r.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for a probe set: min over the depth
    * probed counters — an UPPER bound on the true count (CMS never
    * underestimates; error ≤ e/width · N with prob 1 − e^−depth). The
    * sketch is ≤ depth×width rows, so it broadcasts; probes never
    * shuffle. `probes` must carry a `term` column. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame,
      depth: Int = 4, width: Int = 256): DataFrame = {
    val rows = (0 until depth).map { d =>
      val h = md5(concat(lit(s"cms$d|"), col("term")))
      struct(lit(d).as("depth"),
        (conv(substring(h, 1, 13), 16, 10).cast("long") % width).as("bucket"))
    }
    probes
      .withColumn("r", explode(array(rows: _*)))
      .select(probes.columns.map(col) :+
        col("r.depth").as("depth") :+ col("r.bucket").as("bucket"): _*)
      .join(broadcast(sketch.withColumnRenamed("cnt", "cms_cnt")),
        Seq("depth", "bucket"), "left")
      .groupBy(probes.columns.map(col): _*)
      .agg(min(coalesce(col("cms_cnt"), lit(0L))).as("est"))
  }

  /** DDSketch bucket table (Masson, Lee & Rim, VLDB 2019): a mergeable
    * quantile sketch with a RELATIVE-error guarantee — any quantile
    * estimate is within α of the true value (multiplicatively), using
    * O(log(max/min)/α) buckets regardless of row count. Bucket index
    * for x > 0 is ⌈log_γ x⌉ with γ = (1+α)/(1−α); the whole sketch is
    * ONE map-side-combinable groupBy producing ≤ a few hundred rows per
    * group, and shard sketches merge by SUMMING bucket counts — so 1000
    * executors sketch 100 TB locally and ship bucket tables, never
    * values. This is the exact-quantile alternative `percentile_cont`
    * can't offer at scale (it sorts) and `approx_percentile`'s KLL
    * can't replay in another engine (implementation-defined); every
    * piece here — ln, the pinned 1/ln γ literal, ceil, integer counts —
    * computes identically in any engine.
    *
    * ln γ is pre-computed on the driver and embedded as one double
    * literal so both engines divide by the SAME constant (two libm
    * ln(γ) calls could differ in the last ulp). */
  def ddSketch(df: DataFrame, keys: Seq[String], value: Column,
      alpha: Double = 0.01): DataFrame = {
    val lnGamma = math.log((1 + alpha) / (1 - alpha))
    df.filter(value > 0)
      .select(keys.map(col) :+
        ceil(log(value.cast("double")) / lit(lnGamma)).cast("long")
          .as("bucket"): _*)
      .groupBy(keys.map(col) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates from a DDSketch bucket table (merge shard
    * sketches first by summing counts — same groupBy). For each probe
    * quantile q the answer is the FIRST bucket whose running count
    * reaches rank max(1, ⌈q·n⌉), estimated at the bucket's γ-midpoint
    * 2γⁱ/(γ+1). The bucket table is tiny (≤ hundreds of rows per
    * group), so the cumulative window and the probe fan-out cost
    * nothing; all rank logic is integer-exact. */
  def ddQuantiles(sketch: DataFrame, keys: Seq[String], qs: Seq[Double],
      alpha: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gamma = (1 + alpha) / (1 - alpha)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("bucket"))
    val wAll = Window.partitionBy(keys.map(col): _*)
    val cum = sketch
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(wAll))
    val probed = cum
      .withColumn("q", explode(array(qs.map(q => lit(q)): _*)))
      .withColumn("rank",
        greatest(lit(1L), ceil(col("q") * col("n").cast("double")).cast("long")))
      .filter(col("cum") >= col("rank"))
      .groupBy(keys.map(col) :+ col("q"): _*)
      .agg(min(col("bucket")).as("qbucket"), max(col("n")).as("n"))
    probed
      .select(keys.map(col) :+ col("q") :+ col("n") :+
        trunc6(lit(2.0) * pow(lit(gamma), col("qbucket").cast("double")) /
          lit(gamma + 1)).as("est"): _*)
      .orderBy(keys.map(col) :+ col("q"): _*)
  }

  /** Sketch + quantile probe in one call — the registered query shape. */
  def ddSketchQuantiles(df: DataFrame, keys: Seq[String], value: Column,
      qs: Seq[Double], alpha: Double = 0.01): DataFrame =
    ddQuantiles(ddSketch(df, keys, value, alpha), keys, qs, alpha)

  /** Sketch-driven winsorized statistics: clip `value` into its own
    * group's DDSketch [p`loQ`, p`hiQ`] estimates, then exact-sum the
    * clipped column — the robust-mean that survives heavy-tailed
    * corpora (a handful of pathological rows otherwise own the sum).
    * The classic two-pass shape at scale: pass 1 is the mergeable
    * sketch (bucket tables, ≤ hundreds of rows per group), whose
    * bounds BROADCAST back onto pass 2's scan; the clip is row-local
    * (`least`/`greatest` on pinned doubles) and the sum is the exact
    * scaled-long path. No sort, no quantile shuffle, ever.
    *
    * Domain: `value` must be strictly positive — the DDSketch bucket
    * formula (log_γ) only sees rows with value > 0, so clip bounds are
    * positive quantiles; a zero/negative row in the final pass would be
    * raised to the positive lo bound and counted, skewing the robust
    * mean. Filter non-positive rows out before calling. */
  def winsorizedStats(df: DataFrame, keys: Seq[String], value: Column,
      loQ: Double = 0.05, hiQ: Double = 0.95,
      alpha: Double = 0.01): DataFrame = {
    val quants = ddQuantiles(ddSketch(df, keys, value, alpha), keys,
      Seq(loQ, hiQ), alpha)
    val bounds = quants.groupBy(keys.map(col): _*)
      .agg(min(when(col("q") === loQ, col("est"))).as("lo"),
        min(when(col("q") === hiQ, col("est"))).as("hi"))
    df.join(broadcast(bounds), keys)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        graft.functions.TextFunctions.xsum(
          least(greatest(value, col("lo")), col("hi"))).as("winsorized_sum"),
        min(col("lo")).as("lo"), min(col("hi")).as("hi"))
      .orderBy(keys.map(col): _*)
  }
}
