package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The scaling ladder's data generator must amplify WITHOUT changing
  * the statistical character the scaling claims rest on: referential
  * integrity intact (islands, shared dims), no cross-island exact
  * duplicates (identical replicas would turn the dedup benches into a
  * quadratic-pair-density artifact), token-set overlap vs the original
  * below every dedup threshold in use, and embedding geometry
  * preserved within an island. */
class ScaleUpSpec extends SparkSpec {

  private lazy val dst = {
    val dir = graft.TempDirs.create("scaleup").toString
    ScaleUp.main(Array(sf(), dir, "3"))
    dir
  }
  private def t(name: String) = spark.read.parquet(s"$dst/$name.parquet")

  test("every table replicates by the factor; shared dims stay single") {
    val src = Tables.lineitem(spark, sf()).count()
    assert(t("lineitem").count() == 3 * src)
    assert(t("documents").count() ==
      3 * Tables.documents(spark, sf()).count())
    assert(t("nation").count() == Tables.nation(spark, sf()).count())
  }

  test("FK graph stays referentially intact across islands") {
    val orphans = t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"), "left_anti")
      .count()
    assert(orphans == 0, "every replicated lineitem resolves its order")
    val custOrphans = t("orders")
      .join(t("customer"), col("o_custkey") === col("c_custkey"), "left_anti")
      .count()
    assert(custOrphans == 0)
    val natOrphans = t("customer")
      .join(t("nation"), col("c_nationkey") === col("n_nationkey"), "left_anti")
      .count()
    assert(natOrphans == 0, "islands reference the shared dimensions")
  }

  test("document replicas are new content, not duplicate density") {
    val docs = t("documents")
    // no two rows share exact content
    val dupContents = docs.groupBy("text").count()
      .filter(col("count") > 1).count()
    assert(dupContents == 0, "no cross-island exact duplicates")
    // token-set Jaccard of replica vs original stays under the 0.5
    // dedup threshold (odd positions rewritten -> shared ~1/2,
    // union ~3/2 -> ~1/3)
    val a = docs.filter(col("doc_id") < 1000)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ta"))
    val b = docs.filter(col("doc_id") >= 100000000L && col("doc_id") < 100001000L)
      .select((col("doc_id") - 100000000L).as("doc_id"),
        array_distinct(split(col("text"), " ")).as("tb"))
    val jac = a.join(b, "doc_id")
      .select((size(array_intersect(col("ta"), col("tb"))).cast("double") /
        size(array_union(col("ta"), col("tb"))).cast("double")).as("j"))
    val maxJ = jac.agg(max(col("j"))).head().getDouble(0)
    assert(maxJ < 0.5, s"replica-vs-original token Jaccard must stay " +
      s"under the dedup threshold, got $maxJ")
  }

  test("embedding replicas preserve norms (rotation), decorrelate ids") {
    val emb = t("embeddings")
    val norms = emb
      .filter(col("vec_id") < 100 ||
        (col("vec_id") >= 100000000L && col("vec_id") < 100000100L))
      .select((col("vec_id") % 100000000L).as("base"),
        aggregate(col("embedding").cast("array<double>"), lit(0.0),
          (acc, x) => acc + x * x).as("nsq"))
      .groupBy("base").agg((max(col("nsq")) - min(col("nsq"))).as("d"))
    val maxD = norms.agg(max(col("d"))).head().getDouble(0)
    assert(maxD < 1e-9, "cyclic rotation must preserve the norm exactly " +
      s"(got max |delta| = $maxD)")
  }
}
