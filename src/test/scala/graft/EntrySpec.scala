package graft

class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query runs at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf()).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(100)}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("oracle coverage: every query has oracle SQL, none orphaned") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, noOracle.toString)
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, orphans.toString)
  }

  test("every bench-only extra runs at sf0.001") {
    // the amortization rungs are the SAME code as x93/x94 with bigger
    // fixed message/doc constants (they ignore sf) — smoking them here
    // would push 60k driver-built messages through the pipeline for
    // zero extra coverage
    val sizeOnlyRungs = Set("x96_stream_ingest_6k", "x97_stream_ingest_60k",
      "x99_stream_clean_24k", "x9a_stream_ingest_600k")
    val failures = SparkEntry.benchExtras.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => sizeOnlyRungs(name) }
      .flatMap { case (name, fn) =>
        try { fn(spark, sf()).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(100)}") }
      }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
