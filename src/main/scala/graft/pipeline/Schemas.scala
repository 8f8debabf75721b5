package graft.pipeline

import org.apache.spark.sql.types._

/** Typed schemas for the memory-layer tables (SURVEY §1; reference:
  * models/schema/m0_raw.py:10-114, m1_episodic.py:13-144 and the catalog
  * DDL in database/postgres.py:167-253). UUIDs are strings, pgvector
  * becomes ArrayType(FloatType), JSONB becomes MapType(String,String).
  */
object Schemas {

  val EmbeddingDim = 64

  /** m0_raw: one row per ingested message (reference m0_raw.py:10-114).
    * `metadata` is the JSONB column as MapType — free-form per-item
    * metadata (models/core.py:42), parsed from JSON at the ingest edge. */
  case class M0Raw(
      message_id: String,
      content: String,
      role: String, // CHECK role IN (user, assistant, system) enforced on write
      user_id: String,
      session_id: String,
      round_id: String,
      sequence_number: Int,
      token_count: Int,
      created_at: java.sql.Timestamp,
      updated_at: java.sql.Timestamp, // maintained by every mutation (m0_raw.py:156-183 trigger)
      processing_status: String,
      metadata: Map[String, String])

  /** m1_episodic: one row per chunk (reference m1_episodic.py:13-144;
    * metadata JSONB per :103-109). */
  case class M1Episodic(
      chunk_id: String,
      content: String,
      chunking_strategy: String,
      token_count: Int,
      embedding: Array[Float],
      m0_raw_ids: Array[String], // lineage (GIN-indexed in the reference)
      user_id: String,
      session_id: String,
      needs_embedding: Boolean,
      created_at: java.sql.Timestamp,
      updated_at: java.sql.Timestamp, // bumped by mutations (embedding backfill)
      metadata: Map[String, String])

  /** Incoming message batch row (the ingest API shape, reference
    * models/core.py:92-98). */
  case class Message(
      message_id: String,
      session_id: String,
      user_id: String,
      round_id: String,
      sequence_number: Int,
      role: String,
      content: String,
      created_at: java.sql.Timestamp)

  /** Hybrid retrieval result row (reference models/core.py:75-82). */
  case class QueryResult(
      id: String,
      content: String,
      score: Double,
      store_type: String)

  val ValidRoles = Seq("user", "assistant", "system")

  /** JSONB → MapType(String, String): the storage type of the free-form
    * metadata column (scalar JSON values arrive as their string forms). */
  val MetadataType: MapType = MapType(StringType, StringType)

  // ---- relational catalog tables (reference postgres.py:167-253) ----

  val usersSchema: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("created_at", TimestampType)))

  val agentsSchema: StructType = StructType(Seq(
    StructField("agent_id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("created_at", TimestampType)))

  val sessionsSchema: StructType = StructType(Seq(
    StructField("session_id", StringType, nullable = false),
    StructField("user_id", StringType),
    StructField("agent_id", StringType),
    StructField("created_at", TimestampType)))

  val roundsSchema: StructType = StructType(Seq(
    StructField("round_id", StringType, nullable = false),
    StructField("session_id", StringType),
    StructField("created_at", TimestampType)))

  val apiKeysSchema: StructType = StructType(Seq(
    StructField("key_id", StringType, nullable = false),
    StructField("user_id", StringType),
    StructField("key_hash", StringType),
    StructField("permissions", MapType(StringType, StringType)), // JSONB (postgres.py:247)
    StructField("expires_at", TimestampType), // NULL = never expires
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType)))

  val knowledgeSchema: StructType = StructType(Seq(
    StructField("knowledge_id", StringType, nullable = false),
    StructField("user_id", StringType),
    StructField("content", StringType),
    StructField("embedding", ArrayType(FloatType, containsNull = false)),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType)))

  val m0Schema: StructType = StructType(Seq(
    StructField("message_id", StringType, nullable = false),
    StructField("content", StringType, nullable = false),
    StructField("role", StringType, nullable = false),
    StructField("user_id", StringType),
    StructField("session_id", StringType),
    StructField("round_id", StringType),
    StructField("sequence_number", IntegerType),
    StructField("token_count", IntegerType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType),
    StructField("processing_status", StringType),
    StructField("metadata", MapType(StringType, StringType))))

  val m1Schema: StructType = StructType(Seq(
    StructField("chunk_id", StringType, nullable = false),
    StructField("content", StringType, nullable = false),
    StructField("chunking_strategy", StringType),
    StructField("token_count", IntegerType),
    StructField("embedding", ArrayType(FloatType, containsNull = false)),
    StructField("m0_raw_ids", ArrayType(StringType, containsNull = false)),
    StructField("user_id", StringType),
    StructField("session_id", StringType),
    StructField("needs_embedding", BooleanType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType),
    StructField("metadata", MapType(StringType, StringType))))
}
