package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustered layout — multi-dimensional data skipping
  * for the 100 TB scan path (the design behind Delta's OPTIMIZE ZORDER;
  * stats-based pruning per Moerkotte, "Small Materialized Aggregates",
  * VLDB 1998). Rows sorted by the bit-interleaving of their rank-
  * normalized key columns land in files whose per-file min/max envelope
  * is NARROW on EVERY key dimension — so a predicate on ANY of the keys
  * prunes most files via footer/manifest stats, where a plain sort
  * clusters only its leading column and leaves the others full-range in
  * every file.
  *
  * Scale shape: the z-value is one row-local codegen'd expression; the
  * layout write is ONE range exchange on it (the same shuffle a plain
  * global sort pays). Column min/max for rank normalization is a
  * 2-scalars-per-column aggregate (bounded collect, codebook pattern).
  */
object Layout {

  /** Morton code of `cols` (numeric), each rank-normalized to `bits`
    * bits against its [mn, mx] corpus range and bit-interleaved
    * round-robin. `bits × cols.size` must fit a signed long. */
  def zValue(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double],
      bits: Int = 16): Column = {
    val k = cols.size
    require(k >= 1 && bits * k <= 62, s"$bits bits × $k cols must fit a long")
    val top = (1L << bits) - 1
    val ranks = cols.zip(mins.zip(maxs)).map { case (c, (mn, mx)) =>
      if (mx == mn) lit(0L)
      else floor((c.cast("double") - lit(mn)) / lit(mx - mn) *
        lit(top.toDouble) + lit(0.5)).cast("long")
    }
    (0 until bits).flatMap { i =>
      ranks.zipWithIndex.map { case (r, c) =>
        shiftleft(shiftright(r, i).bitwiseAND(lit(1L)), i * k + c)
      }
    }.reduce[Column](_ + _)
  }

  /** Write `df` to `path` z-ordered on `zcols`: min/max per key (one
    * bounded aggregate), then one range repartition + within-partition
    * sort on the Morton code. `nFiles` sets the layout granularity —
    * at cluster scale, one file per executor-sized chunk. */
  def writeZOrdered(df: DataFrame, path: String, zcols: Seq[String],
      nFiles: Int, bits: Int = 16): Unit = {
    val aggs = zcols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"mn_$c"),
      max(col(c).cast("double")).as(s"mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val mins = zcols.indices.map(i => row.getDouble(2 * i))
    val maxs = zcols.indices.map(i => row.getDouble(2 * i + 1))
    df.withColumn("_z", zValue(zcols.map(col), mins, maxs, bits))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file clustering report for a parquet layout: for each file and
    * each of `cols`, the fraction of the column's global range the file
    * spans (0 = perfectly clustered, 1 = file spans everything). The
    * evidence a stats-pruning scan planner would act on. */
  def fileSpans(df: DataFrame, cols: Seq[String]): DataFrame = {
    val withFile = df.withColumn("_f", input_file_name())
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"mn_$c"),
      max(col(c).cast("double")).as(s"mx_$c")))
    val perFile = withFile.groupBy("_f").agg(aggs.head, aggs.tail: _*)
    val gAggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"gmn_$c"),
      max(col(c).cast("double")).as(s"gmx_$c")))
    val globals = withFile.agg(gAggs.head, gAggs.tail: _*)
    val spans = cols.map { c =>
      ((col(s"mx_$c") - col(s"mn_$c")) /
        (col(s"gmx_$c") - col(s"gmn_$c"))).as(s"span_$c")
    }
    perFile.crossJoin(broadcast(globals))
      .select(col("_f").as("file") +: spans: _*)
  }
}
