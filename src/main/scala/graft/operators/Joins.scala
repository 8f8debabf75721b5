package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively: as-of join and
  * point-in-interval (range) join. Both are built so the heavy side
  * never cross-products:
  *
  *  - [[asofJoin]] is the union-window formulation — ONE shuffle on the
  *    key, no join at all: both sides land in the same (key)-partitioned
  *    ts-ordered window and each left row picks up the most recent right
  *    payload with a running `last(_, ignoreNulls)`. This is the
  *    formulation that survives 100 TB: a naive
  *    `left.ts >= right.ts` theta-join is a per-key cross product, and a
  *    per-row correlated lookup is a driver loop. Cost here is exactly
  *    one exchange of (|L| + |R|) rows plus a linear window pass.
  *  - [[rangeJoin]] buckets intervals into fixed-width bins (an interval
  *    of length ≤ binWidth covers ≤ 2 bins) and equi-joins points on
  *    (key, bin) before the exact containment filter — the standard
  *    bin-bucketed interval join: shuffle volume is |points| + ~2·
  *    |intervals|, never |points|·|intervals|.
  */
object Joins {

  /** As-of join: for every left row, attach the payload of the LATEST
    * right row of the same key with `right.ts <= left.ts` (ties at equal
    * ts match — the right row is visible to a left row at the same
    * instant). Unmatched left rows keep null payloads (left-outer
    * semantics — DuckDB's `ASOF LEFT JOIN`).
    *
    * `tsCol` must be a monotone orderable column with the SAME name on
    * both sides (epoch-microsecond longs here — exact and
    * engine-portable). `payloadCols` are the right-side columns carried
    * onto matches; every right payload lands under its own name suffixed
    * with nothing (caller pre-names). The right side must be UNIQUE per
    * (keys, ts) or the match is ambiguous — pre-aggregate duplicates
    * away (the q90 entry takes max(value) per instant).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // align schemas: left rows carry null payloads, right rows carry
    // null left-only columns; _side orders right BEFORE left at equal ts
    // so an equal-instant right row is visible to the left row
    val l = payloadCols.foldLeft(left.withColumn("_side", lit(1))) {
      (df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    val r = leftCols.filterNot(keys.contains).filterNot(_ == tsCol)
      .foldLeft(right.withColumn("_side", lit(0))) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val unioned = l.select((leftCols ++ payloadCols :+ "_side").map(col): _*)
      .unionByName(r.select((leftCols ++ payloadCols :+ "_side").map(col): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = payloadCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    matched.filter(col("_side") === 1).drop("_side")
  }

  /** Point-in-interval join: every (point, interval) pair of the same
    * key with `start <= pt < end` (half-open), via fixed-width bin
    * bucketing. `ptCol`/`startCol`/`endCol` are epoch-microsecond longs;
    * `binWidth` should be ≥ the typical interval length (an interval
    * covers ceil(len/binWidth)+1 ≤ 2 bins when len ≤ binWidth, so the
    * interval side replicates at most 2×). Output: one row per matching
    * pair with both sides' columns (caller pre-names collisions away).
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      ptCol: String, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // end-exclusive: the last covered bin is the one holding end-1
    val binned = intervals
      .filter(col(startCol) < col(endCol))
      .withColumn("_bin", explode(sequence(
        floor(col(startCol) / binWidth).cast("long"),
        floor((col(endCol) - 1) / binWidth).cast("long"))))
    val pts = points.withColumn("_bin", floor(col(ptCol) / binWidth).cast("long"))
    // a point has exactly ONE bin, so each pair matches at most once —
    // no post-join distinct needed
    pts.join(binned, keys :+ "_bin")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("_bin")
  }

  /** Bloom-filtered semi-join (semi-join reduction): keep left rows
    * whose `key` appears in `right` — but probe a Bloom filter of the
    * right keys MAP-SIDE before the exact join, so rows that cannot
    * match never enter the exchange. The general form of the q83
    * decontamination plan: with a selective right side the filter is
    * MBs where the shuffle would be GBs, and the exact join over the
    * thin survivor stream kills the false positives, so the result is
    * EXACTLY the plain semi-join (the oracle states the naive
    * semantics). At 100 TB this is the difference between shuffling
    * the fact table and shuffling its matching sliver; engines call
    * the automatic variant "runtime filter" / Bloom join — here it is
    * explicit and composable. */
  def bloomSemiJoin(left: DataFrame, right: DataFrame, key: String,
      fpp: Double = 0.01): DataFrame = {
    import graft.functions.TextFunctions.bloomMightContain
    val keys = right.select(col(key).cast("string").as(key)).distinct()
    val expected = math.max(keys.count(), 1L)
    val bloom = keys.stat.bloomFilter(key, expected, fpp)
    val bloomBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    left
      .filter(bloomMightContain(col(key).cast("string"), bloomBytes))
      .join(keys.select(col(key).cast("string").as("_bk")),
        left(key).cast("string") === col("_bk"), "left_semi")
  }

  /** Blocked fuzzy self-match (entity resolution): distinct value pairs
    * of `valueCol` whose edit distance is ≤ `maxDist`, compared only
    * WITHIN a blocking key (here: the value's first whitespace token) —
    * the classic blocking-then-verify shape that replaces the O(n²)
    * all-pairs Levenshtein with per-block products. The value set is
    * deduplicated BEFORE pairing, so duplicated rows never multiply the
    * comparison count; at 100 TB the distinct-value table is the
    * (small) dictionary, not the corpus. Pairs missed by blocking
    * (typo in the first token) are the standard recall trade — widen
    * with a second blocking pass on a different key if needed. */
  def fuzzyBlockedPairs(df: DataFrame, valueCol: String,
      maxDist: Int): DataFrame = {
    val names = df.select(col(valueCol).as("name")).distinct()
      .withColumn("block", split(col("name"), " ").getItem(0))
    val a = names.select(col("block"), col("name").as("name_a"))
    val b = names.select(col("block"), col("name").as("name_b"))
    a.join(b, "block")
      .filter(col("name_a") < col("name_b"))
      // thresholded levenshtein: the banded DP abandons a pair the
      // moment its distance exceeds maxDist (O(len·maxDist) per pair
      // instead of O(len²)) and returns −1 — exact distances for every
      // kept pair, so the plain-levenshtein oracle still matches
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist").cast("long").as("dist"))
      .orderBy("name_a", "name_b")
  }
}
