package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All readers are plain parquet scans so Catalyst predicate pushdown /
  * column pruning reach the source. At cluster scale these would be
  * partitioned tables (e.g. events by date, chunks by user bucket); the
  * loader is the single place to swap that in.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` has shipped in two parquet layouts: TIMESTAMP(NANOS)
    * (readable only as a raw long under
    * `spark.sql.legacy.parquet.nanosAsLong`) and, in current testdata,
    * TIMESTAMP(MICROS). Branch on the read schema so both normalize to a
    * session-zone microsecond timestamp — with the UTC session this makes
    * NTZ-vs-instant a wall-clock no-op, matching DuckDB's view of the file. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // harmless for MICROS files; required before schema inference for the
    // legacy NANOS layout (the read itself throws without it)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case TimestampType => raw
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case LongType =>
        // legacy nanos-as-long layout: integer div, not `/` — `/` widens to
        // double and a ns epoch (~1.7e18) exceeds the 53-bit double mantissa
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case other =>
        throw new IllegalStateException(s"unsupported events.ts type: $other")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
