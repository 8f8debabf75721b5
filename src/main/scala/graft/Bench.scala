package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // untimed warmup pass: JIT, whole-stage-codegen compilation and file
    // index caches, so the timed pass measures steady-state throughput
    // (set SPARK_GRAFT_WARMUP=0 for cold-start numbers)
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0") {
      ordered.foreach { case (_, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
    }
    // min of two timed passes: one-off GC/compilation hiccups otherwise
    // dominate sub-second queries. A query that throws is recorded as
    // failed (time -1) instead of silently contributing a near-zero time.
    def pass() = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val (p1, p2) = (pass(), pass())
    val results = p1.zip(p2).map { case ((n, a, ok1), (_, b, ok2)) =>
      (n, if (ok1 && ok2) math.min(a, b) else -1.0, ok1 && ok2)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (n, _, false) => s"\"" + n + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
