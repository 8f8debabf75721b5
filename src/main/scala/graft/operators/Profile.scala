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
}
