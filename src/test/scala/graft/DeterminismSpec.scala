package graft

class DeterminismSpec extends SparkSpec {

  test("every registered query is run-to-run deterministic at sf0.001") {
    val unstable = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val a = fn(spark, sf()).collect().map(_.toString).toSeq
      val b = fn(spark, sf()).collect().map(_.toString).toSeq
      if (a == b) None else Some(name)
    }
    assert(unstable.isEmpty, s"nondeterministic: $unstable")
  }
}
