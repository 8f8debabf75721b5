package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-factor amplifier for the scaling-curve bench:
  * replicates every source table `factor`× by id-offsetting each
  * replica into its own key island (offset = replica · 10⁸ added to
  * every PK/FK of the island, so the FK graph stays referentially
  * intact — dimension keys nation/region are shared across islands
  * like real reference data), with text and embeddings RE-SALTED so
  * replicas are genuinely new content:
  *
  *  - documents: every odd-position token of a replica is rewritten to
  *    a replica-unique token. Exact hashes differ, token-set Jaccard
  *    vs the original ≈ 1/3 (below every dedup threshold in use), and
  *    every 3-token shingle spans a rewritten position — so dedup /
  *    LSH queries see 10× corpus, NOT 10× duplicate density (identical
  *    replicas would explode candidate pairs quadratically and measure
  *    a data artifact, not the operator).
  *  - embeddings: each replica's vector is cyclically rotated by the
  *    replica index — norms and within-island geometry preserved,
  *    cross-island similarity decorrelated, IVF cell balance kept.
  *  - events: user/event ids offset per island, timestamps unchanged
  *    (10× concurrent users over the same window — the realistic way
  *    event volume grows).
  *
  * Usage: runMain graft.ScaleUp <srcDir> <dstDir> <factor>
  */
object ScaleUp {
  private val Off = 100000000L

  def main(args: Array[String]): Unit = {
    val (src, dst, factor) = (args(0), args(1), args(2).toInt)
    // reentrant from tests: getOrCreate returns any active session —
    // only stop the session if this main actually created it
    val preExisting = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isDefined
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")

    def replicate(df: DataFrame, keyCols: Seq[String])
        (tweak: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map { i =>
        val off = i.toLong * Off
        val offset = keyCols.foldLeft(df)((d, k) =>
          d.withColumn(k, col(k) + lit(off)))
        if (i == 0) df else tweak(offset, i)
      }.reduce(_ unionByName _)

    val ident = (d: DataFrame, _: Int) => d

    // shared dimensions: one copy, every island references them
    write(read("region"), "region")
    write(read("nation"), "nation")
    write(replicate(read("supplier"), Seq("s_suppkey"))(ident), "supplier")
    write(replicate(read("part"), Seq("p_partkey"))(ident), "part")
    write(replicate(read("customer"), Seq("c_custkey"))(ident), "customer")
    write(replicate(read("orders"), Seq("o_orderkey", "o_custkey"))(ident),
      "orders")
    write(replicate(read("lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey"))(ident), "lineitem")
    write(replicate(read("events"), Seq("event_id", "user_id"))(ident),
      "events")
    // documents: rewrite odd-position tokens to island-unique ones
    write(replicate(read("documents"), Seq("doc_id")) { (d, i) =>
      d.withColumn("text", array_join(
        zip_with(
          split(col("text"), " "),
          sequence(lit(0), size(split(col("text"), " ")) - 1),
          (t, p) => when(p % 2 === 1,
            concat(lit(s"z${i}q"), p.cast("string"))).otherwise(t)),
        " "))
    }, "documents")
    // embeddings: rotate each replica's vector by the island index
    write(replicate(read("embeddings"), Seq("vec_id")) { (d, i) =>
      val dim = 64
      d.withColumn("embedding",
        transform(sequence(lit(0), lit(dim - 1)),
          j => element_at(col("embedding"), ((j + lit(i)) % dim) + 1)))
    }, "embeddings")

    println(s"scaled $src -> $dst x$factor")
    if (!preExisting) spark.stop()
  }
}
