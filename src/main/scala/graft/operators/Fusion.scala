package graft.operators

import graft.functions.TextFunctions.{dsum12, trunc6}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-fusion strategies over per-store scored results
  * (SURVEY §2.4 A1–A3; reference: rag/fusion/strategies.py).
  *
  * Input convention: DataFrame(id, score double, store_type string) — the
  * union of the per-store retrieval results (each already top-k'd, so the
  * fusion input is small; the window partitions by store_type which is
  * low-cardinality but also low-volume, so no skew concern).
  */
object Fusion {

  /** A1 SimpleWeightedSum: per id, Σ score·weight(store_type)
    * (reference: rag/fusion/strategies.py:31-95). */
  def weightedSum(results: DataFrame, weights: Map[String, Double], topK: Int): DataFrame = {
    val w = weightExpr(weights)
    results
      .groupBy("id")
      .agg(trunc6(dsum12(col("score") * w)).as("fused_score"))
      .orderBy(col("fused_score").desc, col("id"))
      .limit(topK)
  }

  /** A2 NormalizedWeightedSum: min-max normalize within each store_type,
    * then weighted sum (reference: strategies.py:98-218). */
  def normalizedWeightedSum(results: DataFrame, weights: Map[String, Double], topK: Int): DataFrame = {
    val byStore = Window.partitionBy("store_type")
    val range = max(col("score")).over(byStore) - min(col("score")).over(byStore)
    val norm = when(range === 0d, lit(1.0))
      .otherwise((col("score") - min(col("score")).over(byStore)) / range)
    results
      .withColumn("nscore", norm)
      .groupBy("id")
      .agg(trunc6(dsum12(col("nscore") * weightExpr(weights))).as("fused_score"))
      .orderBy(col("fused_score").desc, col("id"))
      .limit(topK)
  }

  /** A3 ReciprocalRankFusion: rank within store by (score desc, id), then
    * per id Σ weight·1/(k+rank) (reference: strategies.py:221-373; k=60
    * per config/retrieval/default.yaml). */
  def rrf(results: DataFrame, k: Double, weights: Map[String, Double], topK: Int): DataFrame = {
    val rankW = Window.partitionBy("store_type").orderBy(col("score").desc, col("id"))
    results
      .withColumn("rank", row_number().over(rankW))
      .groupBy("id")
      .agg(trunc6(dsum12(weightExpr(weights) / (lit(k) + col("rank")))).as("fused_score"))
      .orderBy(col("fused_score").desc, col("id"))
      .limit(topK)
  }

  private def weightExpr(weights: Map[String, Double]) =
    weights.foldLeft(lit(0.0)) { case (acc, (store, w)) =>
      when(col("store_type") === store, lit(w)).otherwise(acc)
    }
}
