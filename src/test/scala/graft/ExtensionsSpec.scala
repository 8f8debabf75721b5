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

  test("TopKPerKey: bounded-heap plan matches windowed row_number, sort-free") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (1 to 2000).map { i =>
      (s"key${i % 13}", (i * 37 % 500).toDouble, i.toLong)
    }.toDF("key", "score", "id")

    val viaHeap = graft.plans.TopKPerKey(
      df, Seq("key"), Seq(col("score").desc, col("id")), k = 5)
      .select("key", "score", "id")
      .as[(String, Double, Long)].collect().toSet

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
      .as[(String, Double, Long)].collect().toSet

    assert(viaHeap == viaWindow)

    // the whole point: no Window, no Sort — two heap phases around one
    // hash exchange
    val plan = graft.plans.TopKPerKey(
      df, Seq("key"), Seq(col("score").desc, col("id")), k = 5)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("TopKPerKey"), plan.take(1500))
    assert(!plan.contains("Window"), plan.take(1500))
    assert(!plan.contains("Sort "), plan.take(1500))
  }

  test("WindowTopKRewrite: the window idiom routes through the heap, stays correct") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (1 to 2000).map { i =>
      (s"key${i % 13}", (i * 37 % 500).toDouble, i.toLong)
    }.toDF("key", "score", "id")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("id"))
    val out = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)

    assert(out.queryExecution.executedPlan.toString().contains("TopKPerKey"),
      "the optimizer rule must fire on the plain window idiom")

    // expected computed OFF Spark from the raw rows — the rewrite can't
    // fool this baseline
    val expected = (1 to 2000).map { i =>
      (s"key${i % 13}", (i * 37 % 500).toDouble, i.toLong)
    }.groupBy(_._1).flatMap { case (_, g) =>
      g.sortBy(t => (-t._2, t._3)).take(5)
    }.toSet
    val got = out.select("key", "score", "id")
      .as[(String, Double, Long)].collect().toSet
    assert(got == expected)

    // rn survives the rewrite, renumbered 1..k over exactly the survivors
    val rns = out.select("key", "rn").as[(String, Int)].collect()
      .groupBy(_._1).values
    assert(rns.forall(_.map(_._2).sorted.toSeq == (1 to 5)))

    // rank() admits ties past k — the rule must NOT touch it
    val ranked = df.withColumn("rk", rank().over(w)).filter(col("rk") <= 5)
    assert(!ranked.queryExecution.executedPlan.toString().contains("TopKPerKey"))
  }

  test("queryPerSession auto-routes through the heap operator on an extended session") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = graft.TempDirs.create("heapq").toString
    val engine = new graft.pipeline.MemFuse(spark, dir)
    def ts(i: Int) = new java.sql.Timestamp(1717200000000L + i * 1000L)
    engine.ingest(Seq(
      graft.pipeline.Schemas.Message("m1", "s1", "u1", "r1", 1, "user", "spark tuning advice", ts(1)),
      graft.pipeline.Schemas.Message("m2", "s2", "u1", "r2", 1, "user", "spark shuffle details", ts(2)),
      graft.pipeline.Schemas.Message("m3", "s3", "u1", "r3", 1, "user", "cast iron cooking", ts(3))).toDF())
    val out = engine.queryPerSession("spark shuffle", "u1", topKPerSession = 1)
    val plan = out.queryExecution.executedPlan.toString()
    assert(plan.contains("TopKPerKey"), plan.take(1500))
    val rows = out.select("session_id", "rank_in_session")
      .as[(String, Int)].collect().toSet
    assert(rows == Set(("s1", 1), ("s2", 1), ("s3", 1)))
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

  test("ngrams_distinct is callable from SQL; kernel matches the lambda chain") {
    val row = spark.sql(
      "SELECT ngrams_distinct(split('a b c a b c', ' '), 2) AS g").collect().head
    assert(row.getSeq[String](0) == Seq("a b", "b c", "c a"))
    // value-identical to the array_distinct∘transform∘slice lambda chain
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(200)
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val lambda = array_distinct(transform(
      sequence(lit(0), size(toks) - 3),
      i => array_join(slice(toks, i + 1, lit(3)), " ")))
    val mismatches = docs.filter(size(toks) >= 3)
      .select(graft.functions.TextFunctions.ngramsDistinct(toks, 3).as("k"),
        lambda.as("l"))
      .filter(col("k") =!= col("l"))
      .count()
    assert(mismatches == 0)
    // wrong arity is a clear signature error, not an IndexOutOfBounds
    val err = intercept[Exception] {
      spark.sql("SELECT ngrams_distinct(split('a b', ' '))").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("expects exactly two arguments")),
      s"got: ${messages(err).mkString(" | ")}")
  }

  test("the SQL-authored window idiom also elides through the heap operator") {
    Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_suppkey", "l_extendedprice", "l_orderkey", "l_linenumber")
      .createOrReplaceTempView("li_win")
    val df = spark.sql(
      """SELECT l_suppkey, l_extendedprice FROM (
        |  SELECT *, row_number() OVER (PARTITION BY l_suppkey
        |    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM li_win) WHERE rn <= 2""".stripMargin)
    val exec = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case p => p
    }
    assert(exec.collect { case t: graft.plans.TopKPerKeyExec => t }.nonEmpty,
      exec.toString.take(1500))
    assert(!exec.toString.contains("Window"),
      "rn unused in the outer select: Window must be elided\n" +
        exec.toString.take(1500))
  }
}
