package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Shared table-layout helpers: every writer of the m0/m1 tables goes
  * through the same 16-way `user_bucket` hash partitioning (the tenant
  * filter then prunes partitions — reference: WHERE user_id,
  * pgvectorscale_store.py:594-619), and every mutation is
  * PARTITION-SCOPED: a one-user delete or a backfill rewrites only the
  * affected bucket directory, with a recovery-ordered swap (write aside →
  * rename live → rename new in → drop old) instead of round-1's
  * delete-then-rename which could lose the whole table on a crash. This
  * is the plain-parquet stand-in for the reference's transactional
  * storage (postgres.py:167-253); on a Delta-enabled cluster these become
  * MERGE/DELETE on the same layout.
  */
object TableOps {

  val BucketCount = 16

  /** The partitioning expression — identical for every writer so batch
    * ingest, streaming sinks and rewrites share one table layout. */
  def userBucket: Column = pmod(xxhash64(col("user_id")), lit(BucketCount))

  def withUserBucket(df: DataFrame): DataFrame =
    df.withColumn("user_bucket", userBucket)

  /** Bucket id of one user — evaluated through the same engine expression
    * as the write path (a one-row local job, never a guess). */
  def bucketOf(spark: SparkSession, userId: String): Long = {
    import spark.implicits._
    Seq(userId).toDF("user_id").select(userBucket).head().getLong(0)
  }

  /** Rewrite a single `user_bucket=<bucket>` partition of `tablePath`
    * through `f`, leaving every other partition's files untouched.
    * Swap order: write the new partition aside, rename the live
    * partition dir to `.old`, rename the new one in, then drop `.old` —
    * a crash mid-swap leaves either the old or the new partition (plus a
    * recoverable aside dir), never nothing. */
  def rewriteBucket(spark: SparkSession, tablePath: String, bucket: Long)(
      f: DataFrame => DataFrame): Unit = {
    val base = new Path(tablePath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val partDir = new Path(base, s"user_bucket=$bucket")
    if (!fs.exists(partDir)) return
    val cur = spark.read.parquet(tablePath).filter(col("user_bucket") === bucket)
    val next = f(cur).drop("user_bucket")
    val aside = new Path(tablePath + s"_rw$bucket")
    val old = new Path(tablePath + s"_oldrw$bucket")
    next.write.mode(SaveMode.Overwrite).parquet(aside.toString)
    if (fs.exists(old)) fs.delete(old, true)
    fs.rename(partDir, old)
    fs.rename(aside, partDir)
    fs.delete(old, true)
  }

  def exists(spark: SparkSession, tablePath: String): Boolean = {
    val p = new Path(tablePath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Whole-table rewrite for small unpartitioned tables (knowledge,
    * catalog) with the same recovery-ordered swap. */
  def rewriteTable(spark: SparkSession, tablePath: String)(
      f: DataFrame => DataFrame): Unit = {
    val base = new Path(tablePath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val aside = new Path(tablePath + "_tmp")
    val old = new Path(tablePath + "_old")
    f(spark.read.parquet(tablePath)).write.mode(SaveMode.Overwrite).parquet(aside.toString)
    if (fs.exists(old)) fs.delete(old, true)
    fs.rename(base, old)
    fs.rename(aside, base)
    fs.delete(old, true)
  }
}
