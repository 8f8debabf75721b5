package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}

/** C3 "situating context" stage (reference rag/chunk/contextual.py:
  * 263-380): after token-budget packing and before encoding, each chunk
  * is sent to an external model that prepends a short context situating
  * the chunk within its conversation. The external client is expensive
  * and batched, so the stage receives an ITERATOR of chunk texts per
  * partition batch and must return exactly one situated text per input,
  * in order — the `mapPartitions` shape of every external-call stage in
  * this engine (same as TextEncoder.encode). The shipped default is the
  * identity pass-through; a real LLM client drops into [[situate]]
  * without touching the pipeline. */
trait SituatingStage extends Serializable {
  /** MUST be 1:1 and order-preserving. */
  def situate(texts: Iterator[String]): Iterator[String]
}

/** Pass-through stage: the pipeline seam exercised with no model. */
case object IdentitySituating extends SituatingStage {
  def situate(texts: Iterator[String]): Iterator[String] = texts
}

object SituatingStage {
  /** Route `stage` over the `content` column in partition-local batches
    * of `batchSize` (bounded memory, batched external calls), leaving
    * every other column untouched. */
  def apply(df: DataFrame, stage: SituatingStage, batchSize: Int = 64): DataFrame = {
    val schema = df.schema
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = schema.fieldIndex("content")
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { group =>
        val situated = stage.situate(group.iterator.map(_.getString(idx))).toSeq
        require(situated.length == group.length,
          s"situating stage returned ${situated.length} texts for ${group.length} chunks")
        group.lazyZip(situated).map { (r, text) =>
          Row.fromSeq(r.toSeq.updated(idx, text))
        }
      }
    }(enc)
  }
}
