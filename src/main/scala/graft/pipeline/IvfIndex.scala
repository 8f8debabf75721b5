package graft.pipeline

import graft.functions.TextFunctions.trunc6
import graft.functions.VectorFunctions
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index: k-means coarse quantizer + cluster
  * assignment, probe the nProbe nearest centroids at query time and
  * exact-rescore inside them.
  *
  * This is the realistic 100 TB replacement for the reference's
  * StreamingDiskANN index (models/schema/m1_episodic.py:148-162): the
  * centroid table is tiny (broadcast), the vector table is written
  * partitioned by `cluster` so a probe reads nProbe/nlist of the data as
  * pure partition pruning, and both build and query are plain DataFrame
  * jobs. Recall is tuned with nProbe.
  */
class IvfIndex private (
    val centroids: Array[(Int, Array[Double])],
    val assigned: DataFrame) {

  /** Top-k cosine neighbors of `queryVec`, probing `nProbe` clusters. */
  def query(queryVec: Array[Float], topK: Int, nProbe: Int = 2): DataFrame = {
    def dist2(c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < c.length) { val d = c(i) - queryVec(i); s += d * d; i += 1 }
      s
    }
    val probed = centroids.sortBy { case (_, c) => dist2(c) }
      .take(nProbe).map(_._1).toSeq
    val qvec = typedlit(queryVec.toSeq)
    assigned
      .filter(col("cluster").isin(probed: _*)) // partition pruning at scale
      .withColumn("score", trunc6(VectorFunctions.cosine(col("embedding"), qvec)))
      .select(col("vec_id").as("id"), col("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
  }
}

object IvfIndex {

  /** Build the index: fit k-means (fixed seed → deterministic) on the
    * embedding column and attach a `cluster` id to every row. At scale
    * the fit runs on a sample and `assigned` is persisted bucketed by
    * `cluster`. */
  def build(
      spark: SparkSession,
      embeddings: DataFrame,
      nlist: Int,
      seed: Long = 42L): IvfIndex = {
    val toVec = udf((a: scala.collection.Seq[Float]) =>
      Vectors.dense(a.map(_.toDouble).toArray))
    val withFeatures = embeddings.withColumn("features", toVec(col("embedding")))
    val model = new KMeans()
      .setK(nlist).setSeed(seed).setFeaturesCol("features")
      .fit(withFeatures)
    val assigned = model.transform(withFeatures)
      .withColumnRenamed("prediction", "cluster")
      .select("vec_id", "embedding", "cluster")
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray) }
    new IvfIndex(centroids, assigned)
  }
}
