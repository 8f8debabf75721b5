package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental side-index upkeep for the STREAMING ingest path — the
  * twin of the per-batch maintenance [[MemFuse.ingest]] performs inline
  * (the reference maintains FTS5/vector stores on every insert no
  * matter which path wrote the row; a streamed chunk must be reachable
  * through the indexes without a manual rebuild).
  *
  * Differences from the facade path, both deliberate:
  *  - ids already present in an index are ANTI-JOINED away first, which
  *    makes absorption idempotent: a crash-replayed micro-batch, or
  *    identical content re-sent later (content-addressed chunk_ids
  *    collide by construction), must not append duplicate postings —
  *    BM25 df/doclen would double and ANN fusion would see duplicate
  *    candidates. The facade's batch path reaches the same guarantee
  *    through its `preIndexedIds` mutation protocol.
  *  - quantizer re-fit is NOT triggered here: a micro-batch stays
  *    latency-bounded, so drift accrues in the persisted fit metadata
  *    until `maintain()` or the next batch-path rebuild picks it up.
  *
  * Handles are opened per batch (a centroid/codebook collect — KBs);
  * at micro-batch cadence that cost is noise next to the appends.
  */
object IndexUpkeep {

  /** Absorb new chunks (chunk_id, content, embedding) into whichever
    * side indexes exist under `$base/index`. No-op when none exist. */
  def absorbBatch(spark: SparkSession, base: String, chunks: DataFrame): Unit = {
    val idxBase = s"$base/index"
    def has(k: String) = TableOps.currentArtifactDir(spark, idxBase, k).isDefined
    if (!(has("kw") || has("ivf") || has("pq") || has("ivfpq"))) return
    if (has("kw")) {
      val kw = new KeywordIndex(spark, idxBase)
      kw.addDocuments(
        chunks.select(col("chunk_id").as("doc_id"), col("content").as("text"))
          .join(kw.indexedDocIds, Seq("doc_id"), "left_anti"))
    }
    val vecs = chunks.select(col("chunk_id").as("vec_id"), col("embedding"))
    if (has("ivf")) {
      val h = IvfIndex.load(spark, idxBase)
      h.addVectors(vecs.join(h.assigned.select("vec_id"),
        Seq("vec_id"), "left_anti"), idxBase)
    }
    if (has("pq")) {
      val h = PqIndex.load(spark, idxBase)
      h.addVectors(vecs.join(h.codesArr.select("vec_id"),
        Seq("vec_id"), "left_anti"), idxBase)
    }
    if (has("ivfpq")) {
      val h = IvfPq.load(spark, idxBase)
      h.addVectors(vecs.join(h.codesArr.select("vec_id"),
        Seq("vec_id"), "left_anti"), idxBase)
    }
  }
}
