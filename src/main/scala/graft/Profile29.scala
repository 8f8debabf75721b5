package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q29 stages (temporary). */
object Profile29 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d).select("doc_id", "text")
    val corpus = docs.unionByName(docs.select((col("doc_id") + 10000).as("doc_id"),
      expr("substring(text, instr(text, ' ') + 1)").as("text")))

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val sharr = Dedup.shingleArrays(corpus, 3).cache()
    time("shingleArrays+cache")(sharr.count())
    val sig = Dedup.minhashSignature(sharr, 8)
    time("signature")(sig.count())
    time("full minhashLsh")(Dedup.minhashLsh(corpus, 3, 4, 2, 0.5).count())
    time("full again")(Dedup.minhashLsh(corpus, 3, 4, 2, 0.5).count())
    spark.stop()
  }
}
