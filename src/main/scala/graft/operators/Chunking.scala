package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chunking strategies (SURVEY §2.9; reference: rag/chunk/).
  * All are narrow, generator-style transforms (explode) — no shuffle.
  */
object Chunking {

  /** C2 CharacterChunkStrategy: fixed-size character windows with overlap
    * (reference: rag/chunk/character.py:7-127 — 1000-char windows,
    * 100 overlap; parameterized here). Start positions advance by
    * (size − overlap) while they fall inside the text. */
  def characterChunks(
      docs: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int): DataFrame = {
    require(overlap < size, "overlap must be < size")
    val stride = size - overlap
    val lastIdx = floor((length(col(textCol)) - 1) / stride).cast("int")
    // fan out before the explode: a narrow generator inherits the input
    // file's partition count and would serialize the substring work
    docs
      .filter(length(col(textCol)) > 0)
      .repartition(col(idCol))
      .select(col(idCol), col(textCol),
        explode(sequence(lit(0), lastIdx)).as("chunk_idx"))
      .select(
        col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col(textCol).substr(col("chunk_idx") * stride + 1, lit(size))
          .as("chunk_text"))
      .orderBy(col(idCol), col("chunk_idx"))
  }

  /** C1 MessageChunkStrategy: one chunk per group — role-prefixed lines
    * joined in-order (reference: rag/chunk/message.py:7-56, format
    * "[role]: content" per rag/chunk/base.py:63-88). Ordering inside the
    * group is made deterministic by sorting collected (seq, line) structs.
    */
  def messageChunks(
      messages: DataFrame, groupCol: String, seqCol: String,
      roleCol: String, contentCol: String): DataFrame = {
    val line = concat(lit("["), col(roleCol), lit("]: "), col(contentCol))
    messages
      .select(col(groupCol), struct(col(seqCol), line.as("line")).as("entry"))
      .groupBy(groupCol)
      .agg(array_sort(collect_list(col("entry"))).as("entries"))
      .select(
        col(groupCol),
        concat_ws("\n", transform(col("entries"), e => e.getField("line")))
          .as("chunk_text"))
      .orderBy(groupCol)
  }

  /** C3-lite ContextualChunkStrategy grouping: pack consecutive messages
    * into chunks of ≤ budget tokens (reference: rag/chunk/contextual.py:
    * 140-196). Greedy packing is inherently sequential per group; at scale
    * each group (session) is small, so this is a per-group flatMap — the
    * cross-group parallelism is what matters. Returns (group, chunk_idx,
    * chunk_text, n_tokens). */
  def tokenBudgetChunks(
      messages: DataFrame, groupCol: String, seqCol: String,
      contentCol: String, budget: Int,
      idCol: Option[String] = None): DataFrame = {
    import messages.sparkSession.implicits._
    val idExpr = idCol.map(c => col(c).cast("string")).getOrElse(lit(""))
    val grouped = messages
      .select(col(groupCol).cast("string").as("g"),
        col(seqCol).cast("long").as("seq"),
        col(contentCol).cast("string").as("content"),
        idExpr.as("mid"))
      .as[(String, Long, String, String)]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val rows = it.toSeq.sortBy(_._2)
        val out =
          scala.collection.mutable.ArrayBuffer.empty[(String, Int, String, Int, Seq[String])]
        var buf = scala.collection.mutable.ArrayBuffer.empty[String]
        var ids = scala.collection.mutable.ArrayBuffer.empty[String]
        var tok = 0
        var idx = 0
        def flush(): Unit = if (buf.nonEmpty) {
          out += ((g, idx, buf.mkString("\n"), tok, ids.toSeq)); idx += 1
          buf = scala.collection.mutable.ArrayBuffer.empty[String]
          ids = scala.collection.mutable.ArrayBuffer.empty[String]
          tok = 0
        }
        rows.foreach { case (_, _, content, mid) =>
          // split with limit -1 keeps trailing empty tokens, matching
          // SQL string_split semantics
          val n = content.split(" ", -1).length
          if (tok + n > budget && buf.nonEmpty) flush()
          buf += content; ids += mid; tok += n
          if (tok > budget) flush() // oversized single message: own chunk
        }
        flush()
        out
      }
    grouped.toDF("group_id", "chunk_idx", "chunk_text", "n_tokens", "m0_raw_ids")
      .select(col("group_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk_text"), col("n_tokens").cast("long").as("n_tokens"),
        col("m0_raw_ids"))
      .orderBy("group_id", "chunk_idx")
  }
}
