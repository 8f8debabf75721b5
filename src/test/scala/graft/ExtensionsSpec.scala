package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  // extensions bind only when a NEW SparkSession is built — clear the
  // JVM-wide default (shared by other suites via getOrCreate) so the
  // builder actually constructs one (the underlying SparkContext is
  // reused, so this is cheap and non-destructive)
  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("dot_product and cosine_sim are callable from SQL") {
    val row = spark.sql(
      """SELECT dot_product(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
        |       cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
        |       cosine_sim(array(0.0F, 0.0F), array(1.0F, 0.0F)) AS z
        |""".stripMargin).collect().head
    assert(row.getDouble(0) == 11.0)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
    assert(row.getDouble(2) == 0.0)
  }
}
