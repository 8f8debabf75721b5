package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection utility:
  * `sbt "runMain graft.Explain q02_top_revenue_orders [sfDir]"` prints
  * the formatted physical plan for one registered query. With
  * `-o <dir>` as the first two args, every following name's plan is
  * WRITTEN to `<dir>/<name>.txt` instead (one Spark session for the
  * whole batch — the round-boundary plan dumps under plans/rNN). */
object Explain {
  def main(args: Array[String]): Unit = {
    val (outDir, rest) =
      if (args.length >= 2 && args(0) == "-o") (Some(args(1)), args.drop(2))
      else (None, args)
    val (names, sfDir) = rest.partition(_.startsWith("q"))
    val dir = sfDir.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .withExtensions(new GraftExtensions) // audit the plans users GET
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      outDir match {
        case Some(d) =>
          val p = java.nio.file.Paths.get(d)
          java.nio.file.Files.createDirectories(p)
          java.nio.file.Files.write(p.resolve(s"$name.txt"),
            plan.getBytes("UTF-8"))
        case None => println(plan)
      }
    }
    spark.stop()
  }
}
