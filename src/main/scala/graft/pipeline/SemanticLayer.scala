package graft.pipeline

import graft.functions.TextFunctions.trunc6
import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** M2 semantic derivations (SURVEY §2.10 H2/H3/H6/H7).
  *
  * The reference extracts facts/entities with an LLM
  * (fact_extraction_processor.py) and falls back to rule-based
  * extraction (:434-472); conflict detection compares new facts against
  * similar existing facts (conflict_detection.py:55-160). Here the LLM
  * stage is the same deterministic rule-based shape — an LLM swap-in is a
  * `mapPartitions` stage with identical inputs/outputs — while the joins,
  * lineage and similarity prefilter are the real distributed plumbing.
  */
object SemanticLayer {

  /** H2/H3 fact extraction (rule-based): one fact per "X is/are/has Y"
    * line of a chunk. Output: (fact_id, chunk_id, user_id, subject,
    * predicate, object, fact_text, confidence). */
  def extractFacts(chunks: DataFrame): DataFrame = {
    val line = explode(split(col("content"), "\n")).as("line")
    val cleaned = regexp_replace(col("line"), "^\\[[a-z]+\\]: ", "")
    val pattern = "^(.*?)\\s+(is|are|has|have)\\s+(.*)$"
    chunks
      .select(col("chunk_id"), col("user_id"), line)
      .withColumn("clean", cleaned)
      .withColumn("subject", regexp_extract(col("clean"), pattern, 1))
      .withColumn("predicate", regexp_extract(col("clean"), pattern, 2))
      .withColumn("object", regexp_extract(col("clean"), pattern, 3))
      .filter(col("subject") =!= "" && col("object") =!= "")
      .withColumn("fact_text",
        concat_ws(" ", col("subject"), col("predicate"), col("object")))
      .withColumn("fact_id", concat(col("chunk_id"), lit("|"), md5(col("fact_text"))))
      // rule-based extraction confidence mirrors the reference fallback's
      // fixed mid confidence (vs LLM-scored)
      .withColumn("confidence", lit(0.6))
      .select("fact_id", "chunk_id", "user_id", "subject", "predicate",
        "object", "fact_text", "confidence")
  }

  /** H3 entity/relationship extraction: entities are distinct non-stop
    * tokens of fact subjects/objects; edges connect subject-entity to
    * object-entity per fact, weighted by how many facts support them. */
  def extractGraph(facts: DataFrame): (DataFrame, DataFrame) = {
    def headToken(c: Column) = lower(element_at(split(trim(c), " "), 1))
    val edges = facts
      .select(headToken(col("subject")).as("src"),
        headToken(col("object")).as("dst"),
        col("predicate").as("relation"))
      .filter(col("src") =!= "" && col("dst") =!= "")
      .groupBy("src", "dst", "relation")
      .agg(count(lit(1)).cast("double").as("weight"))
    val vertices = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id")))
      .distinct()
      .withColumn("type", lit("entity"))
    (vertices, edges)
  }

  /** H2 episode formation: chunks of a session that fall within
    * `gapSeconds` of each other fold into one episode, in time order,
    * with an extractive summary (top content tokens by frequency, ties
    * alphabetical) and full chunk lineage. The reference forms episodes
    * with LLM summaries; this is the deterministic extractive stand-in —
    * an LLM swap-in replaces only the summary expression with a
    * mapPartitions stage over the same episode rows. */
  def formEpisodes(m1: DataFrame, gapSeconds: Long = 3600, summaryTokens: Int = 5): DataFrame = {
    val w = Window.partitionBy("user_id", "session_id")
      .orderBy(col("created_at"), col("chunk_id"))
    val gapped = m1
      .withColumn("prev_at", lag(col("created_at"), 1).over(w))
      .withColumn("new_episode",
        when(col("prev_at").isNull ||
          unix_timestamp(col("created_at")) - unix_timestamp(col("prev_at")) > gapSeconds, 1)
          .otherwise(0))
      .withColumn("episode_idx",
        sum(col("new_episode")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val episodes = gapped
      .select(col("user_id"), col("session_id"), col("episode_idx"),
        col("created_at"), col("chunk_id"),
        struct(col("created_at"), col("chunk_id"), col("content")).as("entry"),
        col("m0_raw_ids"))
      .groupBy("user_id", "session_id", "episode_idx")
      .agg(
        concat_ws("\n\n",
          transform(array_sort(collect_list(col("entry"))), _.getField("content")))
          .as("content"),
        flatten(collect_list(col("m0_raw_ids"))).as("m0_raw_ids"),
        count(lit(1)).as("n_chunks"),
        min(col("created_at")).as("started_at"),
        max(col("created_at")).as("ended_at"))
      .withColumn("episode_id",
        concat(col("session_id"), lit("~"), col("episode_idx")))
    // extractive summary: top content tokens by (freq desc, token asc)
    val tokenCounts = episodes
      .select(col("episode_id"),
        explode(graft.functions.TextFunctions.contentTokens(col("content"))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("episode_id", "tok").agg(count(lit(1)).as("n"))
    val topTokens = tokenCounts
      .withColumn("rnk", row_number().over(
        Window.partitionBy("episode_id").orderBy(col("n").desc, col("tok"))))
      .filter(col("rnk") <= summaryTokens)
      .groupBy("episode_id")
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("rnk"), col("tok")))),
          _.getField("tok"))).as("summary"))
    episodes.join(topTokens, Seq("episode_id"), "left")
      .withColumn("summary", coalesce(col("summary"), lit("")))
      .select("episode_id", "user_id", "session_id", "episode_idx", "summary",
        "content", "m0_raw_ids", "n_chunks", "started_at", "ended_at")
  }

  /** H6 conflict detection (reference: hierarchy/conflict_detection.py:
    * 55-160, which prefilters candidates through a vector similarity
    * search precisely to avoid comparing every fact with every fact).
    *
    * Candidate generation here is an EQUI-join on the subject's head
    * token: a conflict verdict (DIRECT/SEMANTIC) requires the full
    * subjects to match, and equal subjects share a head token, so the
    * bucketed join loses nothing while turning the all-pairs cartesian
    * into one key-partitioned shuffle that scales linearly with the fact
    * tables. (A hot head token — "the …" subjects — is a bounded skew
    * bucket; AQE skew-join or SkewOps salting splits it.) Candidates are
    * then cosine-verified against `similarityThreshold` and classified:
    * DIRECT_CONTRADICTION when subject and predicate agree but the
    * object differs, SEMANTIC_CONFLICT when only the subjects collide. */
  def detectConflicts(
      newFacts: DataFrame,
      existingFacts: DataFrame,
      encoder: TextEncoder,
      similarityThreshold: Double = 0.5): DataFrame = {
    val enc = encoder
    def embed(df: DataFrame, prefix: String) =
      enc.encode(df.select(
        col("fact_id").as(s"${prefix}_id"), col("subject").as(s"${prefix}_subject"),
        col("predicate").as(s"${prefix}_predicate"), col("object").as(s"${prefix}_object"),
        col("fact_text").as(s"${prefix}_text")), s"${prefix}_text")
        .withColumnRenamed("embedding", s"${prefix}_emb")
        .withColumn(s"${prefix}_key",
          lower(element_at(split(trim(col(s"${prefix}_subject")), " "), 1)))
    val n = embed(newFacts, "new")
    val e = embed(existingFacts, "old")
    n.join(e, col("new_key") === col("old_key") && col("new_id") =!= col("old_id"))
      .withColumn("similarity",
        trunc6(VectorFunctions.cosine(col("new_emb"), col("old_emb"))))
      .filter(col("similarity") >= similarityThreshold)
      .withColumn("conflict_type",
        when(col("new_subject") === col("old_subject") &&
          col("new_predicate") === col("old_predicate") &&
          col("new_object") =!= col("old_object"), "DIRECT_CONTRADICTION")
          .when(col("new_subject") === col("old_subject"), "SEMANTIC_CONFLICT")
          .otherwise("RELATED"))
      .filter(col("conflict_type") =!= "RELATED")
      .select(col("new_id"), col("old_id"), col("conflict_type"), col("similarity"))
  }

  /** H7 multi-layer fan-out: score every layer with the same query text
    * and union with a layer tag. `m0`/`m1`/`m2facts` must carry a text
    * column named content/content/fact_text respectively.
    *
    * Layers that already persist an `embedding` column (m1 always, m2
    * facts since buildSemanticLayer encodes them) are scored on the
    * STORED vectors — re-encoding a layer per query is cheap with the
    * hash stub but catastrophic with a real model, and is exactly the
    * anti-pattern the reference avoids by persisting pgvector columns.
    * Only m0 (raw messages, never embedded at ingest) encodes on the
    * fly. */
  def queryAllLayers(
      m0: DataFrame, m1: DataFrame, m2facts: DataFrame,
      encoder: TextEncoder, queryText: String, topKPerLayer: Int): DataFrame = {
    val qvec = typedlit(encoder.encodeOne(queryText).toSeq)
    def score(df: DataFrame, idCol: String, textCol: String, layer: String) = {
      val enc = encoder
      val withEmb =
        if (df.columns.contains("embedding"))
          df.select(col(idCol).as("id"), col(textCol).as("content"), col("embedding"))
        else
          enc.encode(df.select(col(idCol).as("id"), col(textCol).as("content")), "content")
      withEmb
        .withColumn("score", trunc6(VectorFunctions.cosine(col("embedding"), qvec)))
        .select(col("id"), col("content"), col("score"))
        .orderBy(col("score").desc, col("id"))
        .limit(topKPerLayer)
        .withColumn("layer", lit(layer))
    }
    score(m0, "message_id", "content", "m0")
      .unionByName(score(m1, "chunk_id", "content", "m1"))
      .unionByName(score(m2facts, "fact_id", "fact_text", "m2"))
  }
}
