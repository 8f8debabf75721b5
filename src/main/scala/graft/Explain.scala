package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection utility: `sbt "runMain graft.Explain q02_top_revenue_orders [sfDir]"`
  * prints the formatted physical plan for one registered query. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .withExtensions(new GraftExtensions) // audit the plans users GET
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
