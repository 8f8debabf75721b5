package graft

import graft.pipeline._
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The 7-table relational catalog (reference postgres.py:167-253) and
  * knowledge participation in retrieval. */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) =
    new java.sql.Timestamp(java.sql.Timestamp.valueOf("2024-06-01 00:00:00").getTime + i * 1000L)

  private def msg(id: String, session: String, user: String, round: String,
      seq: Int, content: String) =
    Schemas.Message(id, session, user, round, seq, "user", content, ts(seq))

  private def populated(): MemFuse = {
    val dir = graft.TempDirs.create("catalog").toString
    val engine = new MemFuse(spark, dir)
    engine.createUser("u1", "Alice")
    engine.createUser("u2", "Bob")
    engine.createAgent("a1", "assistant-alpha")
    engine.createSession("s1", "u1", "a1")
    engine.createSession("s2", "u2", "a1")
    engine.createRound("r1", "s1")
    engine.createRound("r2", "s1")
    engine.createRound("r3", "s2")
    engine.createApiKey("k1", "u1", "hash-one")
    engine.ingest(Seq(
      msg("m1", "s1", "u1", "r1", 1, "first round text"),
      msg("m2", "s1", "u1", "r2", 2, "second round text"),
      msg("m3", "s2", "u2", "r3", 1, "other user text")).toDF())
    engine
  }

  test("catalog CRUD round-trip and rounds-join message read") {
    val engine = populated()
    assert(engine.users.count() == 2)
    assert(engine.agents.count() == 1)
    assert(engine.sessions.count() == 2)
    assert(engine.rounds.count() == 3)
    assert(engine.apiKeys.count() == 1)
    val viaRounds = engine.messagesBySessionViaRounds("s1")
      .select("message_id").as[String].collect()
    assert(viaRounds.toSeq == Seq("m1", "m2"))
  }

  test("deleteUser cascades through sessions, rounds, api_keys, knowledge") {
    val engine = populated()
    engine.addKnowledge("u1", Seq("likes scala"))
    engine.deleteUser("u1")
    assert(engine.users.select("user_id").as[String].collect().toSeq == Seq("u2"))
    assert(engine.sessions.select("session_id").as[String].collect().toSeq == Seq("s2"))
    assert(engine.rounds.select("round_id").as[String].collect().toSeq == Seq("r3"))
    assert(engine.apiKeys.count() == 0)
    assert(engine.knowledge("u1").count() == 0)
    assert(engine.m0.select("user_id").as[String].collect().toSet == Set("u2"))
  }

  test("deleteSession cascades rounds and the session's m0/m1 rows only") {
    val engine = populated()
    engine.deleteSession("s1")
    assert(engine.sessions.select("session_id").as[String].collect().toSeq == Seq("s2"))
    assert(engine.rounds.select("round_id").as[String].collect().toSeq == Seq("r3"))
    assert(engine.m0.select("session_id").as[String].collect().toSet == Set("s2"))
    // the user record itself survives a session delete
    assert(engine.users.count() == 2)
  }

  test("deleteAgent cascades sessions, rounds and both users' m0/m1 rows") {
    val engine = populated()
    engine.createAgent("a2", "assistant-beta")
    engine.createSession("s3", "u1", "a2")
    engine.createRound("r4", "s3")
    engine.ingest(Seq(msg("m4", "s3", "u1", "r4", 1, "survives the cascade")).toDF())

    engine.deleteAgent("a1") // owns s1 (u1) and s2 (u2)
    assert(engine.agents.select("agent_id").as[String].collect().toSeq == Seq("a2"))
    assert(engine.sessions.select("session_id").as[String].collect().toSeq == Seq("s3"))
    assert(engine.rounds.select("round_id").as[String].collect().toSeq == Seq("r4"))
    // m0/m1 rows of BOTH users' a1-sessions are gone; the a2 session survives
    assert(engine.m0.select("message_id").as[String].collect().toSeq == Seq("m4"))
    assert(engine.m1.select("session_id").as[String].collect().toSet == Set("s3"))
    // users themselves survive an agent delete
    assert(engine.users.count() == 2)
  }

  test("api key validation: expiry filter and permission check") {
    val engine = populated()
    val past = ts(-3600)
    val future = new java.sql.Timestamp(System.currentTimeMillis() + 3600 * 1000L)
    engine.createApiKey("k2", "u1", "hash-expired", expiresAt = Some(past))
    engine.createApiKey("k3", "u1", "hash-live",
      permissions = Map("read" -> "true", "write" -> "false"),
      expiresAt = Some(future))

    assert(engine.validateKey("hash-one")) // no expiry = never expires
    assert(!engine.validateKey("hash-expired"))
    assert(!engine.validateKey("no-such-hash"))
    assert(engine.validateKey("hash-live"))
    assert(engine.validateKey("hash-live", permission = Some("read")))
    assert(!engine.validateKey("hash-live", permission = Some("write")))
    assert(!engine.validateKey("hash-live", permission = Some("admin")))
  }

  test("mutations bump updated_at and never touch created_at") {
    val engine = populated()
    engine.addKnowledge("u1", Seq("likes scala"))
    val before = engine.knowledge("u1")
      .select("knowledge_id", "created_at", "updated_at").collect().head
    assert(before.getTimestamp(1) == before.getTimestamp(2),
      "insert: updated_at starts equal to created_at")

    Thread.sleep(5)
    engine.updateKnowledge(before.getString(0), "loves spark")
    val after = engine.knowledge("u1")
      .select("created_at", "updated_at", "content").collect().head
    assert(after.getTimestamp(0) == before.getTimestamp(1), "created_at unchanged")
    assert(after.getTimestamp(1).after(before.getTimestamp(2)), "updated_at bumped")
    assert(after.getString(2) == "loves spark")

    // m0/m1 inserts carry updated_at = created_at
    val m1Row = engine.m1.select("created_at", "updated_at").collect().head
    assert(m1Row.getTimestamp(0) == m1Row.getTimestamp(1))
  }

  test("include_knowledge surfaces embedded knowledge rows in the hybrid query") {
    val engine = populated()
    engine.addKnowledge("u1", Seq("favorite language is scala zqx"))
    val without = engine.query("scala zqx", "u1", topK = 3).collect()
    assert(!without.exists(_.getAs[String]("content").contains("zqx")))
    val withKn = engine.query("scala zqx", "u1", topK = 3, includeKnowledge = true)
      .collect()
    assert(withKn.exists(_.getAs[String]("content").contains("zqx")))
    assert(withKn.exists(_.getAs[String]("session_id") == "knowledge"))
  }
}
