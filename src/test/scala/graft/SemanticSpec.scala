package graft

import graft.pipeline._
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SemanticSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) =
    new java.sql.Timestamp(java.sql.Timestamp.valueOf("2024-06-01 00:00:00").getTime + i * 1000L)

  private def msg(id: String, seq: Int, role: String, content: String) =
    Schemas.Message(id, "s1", "u1", s"r$seq", seq, role, content, ts(seq))

  private def engineWithFacts(): MemFuse = {
    val dir = graft.TempDirs.create("sem").toString
    val engine = new MemFuse(spark, dir)
    engine.ingest(Seq(
      msg("m1", 1, "user", "the capital of france is paris"),
      msg("m2", 2, "assistant", "paris is the largest french city"),
      msg("m3", 3, "user", "spark has lazy evaluation")).toDF())
    engine.buildSemanticLayer()
    engine
  }

  test("fact extraction finds is/has statements with lineage") {
    val engine = engineWithFacts()
    val facts = engine.m2Facts.collect()
    assert(facts.length == 3)
    val texts = facts.map(_.getAs[String]("fact_text")).toSet
    assert(texts.contains("the capital of france is paris"))
    assert(texts.contains("spark has lazy evaluation"))
    // lineage: every fact points at an existing chunk
    val chunkIds = engine.m1.select("chunk_id").as[String].collect().toSet
    assert(facts.forall(f => chunkIds.contains(f.getAs[String]("chunk_id"))))
  }

  test("entity graph derives weighted edges from facts") {
    val engine = engineWithFacts()
    val edges = spark.read.parquet(
      engine.m2Facts.inputFiles.head.replaceAll("/m2_facts/.*", "/m2_edges"))
    val e = edges.select("src", "dst", "relation").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(e.contains(("spark", "lazy", "has")))
    assert(e.contains(("paris", "the", "is")))
  }

  test("semantic-layer rebuild never yanks files from frames resolved before it") {
    val engine = engineWithFacts()
    engine.buildEpisodes()
    // frames resolved NOW pin the current version dirs (the q59-style
    // graph leg included)
    val factsBefore = engine.m2Facts
    val graphLeg = engine.semanticGraphQuery("spark evaluation", topK = 5)
    val episodesBefore = engine.episodes
    val nFacts = factsBefore.count()
    val nEpisodes = episodesBefore.count()
    // rebuild both layers: a new version dir is committed, the old one
    // stays on disk for the pinned frames
    engine.buildSemanticLayer()
    engine.buildEpisodes()
    assert(factsBefore.count() == nFacts, "pinned facts frame still answers")
    assert(graphLeg.collect().nonEmpty, "pinned graph-leg query still answers")
    assert(episodesBefore.count() == nEpisodes, "pinned episodes frame still answers")
    // fresh frames resolve the new committed version
    assert(engine.m2Facts.count() == nFacts)
    // vacuum reclaims superseded versions; current reads stay intact
    val base = factsBefore.inputFiles.head
      .stripPrefix("file:").replaceAll("/sem_v.*", "")
    TableOps.vacuumArtifacts(spark, base, "sem", keep = 1)
    val vers = new java.io.File(base).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("sem_v"))
    assert(vers == 1, "one committed version survives vacuum")
    assert(engine.m2Facts.count() == nFacts)
  }

  test("conflict detection flags contradicting objects") {
    val mk = (id: String, s: String, p: String, o: String) =>
      (id, s, p, o, s"$s $p $o")
    val newF = Seq(mk("f1", "the capital", "is", "paris"))
      .toDF("fact_id", "subject", "predicate", "object", "fact_text")
    val oldF = Seq(
      mk("f2", "the capital", "is", "lyon"),
      mk("f3", "something else", "is", "entirely unrelated words"))
      .toDF("fact_id", "subject", "predicate", "object", "fact_text")
    val conflicts = SemanticLayer.detectConflicts(newF, oldF, HashingEncoder(), 0.3)
      .collect()
    assert(conflicts.length == 1)
    assert(conflicts.head.getAs[String]("conflict_type") == "DIRECT_CONTRADICTION")
    assert(conflicts.head.getAs[String]("old_id") == "f2")
  }

  test("queryAllLayers unions tagged per-layer results") {
    val engine = engineWithFacts()
    val out = engine.queryAllLayers("capital of france", "u1", topKPerLayer = 2)
    val layers = out.select("layer").as[String].collect().toSet
    assert(layers == Set("m0", "m1", "m2"))
    val top = out.orderBy(col("score").desc).select("layer", "content")
      .as[(String, String)].collect().head
    assert(top._2.contains("capital"))
  }

  test("graph semantic query scores persisted vertex embeddings (K5)") {
    val engine = engineWithFacts()
    val out = engine.semanticGraphQuery("spark", topK = 3).collect()
    assert(out.nonEmpty)
    // exact-token vertex must rank first (cosine 1.0 with itself)
    assert(out.head.getAs[String]("id") == "spark")
  }

  test("queryAllLayers scores m1/m2 on stored embeddings, only m0 encodes") {
    val engine = engineWithFacts()
    val plan = engine.queryAllLayers("capital", "u1", 2)
      .queryExecution.executedPlan.toString()
    val n = "MapPartitions".r.findAllIn(plan).length
    assert(n == 1, s"expected exactly one encode stage (m0), got $n:\n" + plan.take(1500))
  }

  test("episode formation: time-gap split, lineage, extractive summary") {
    val dir = graft.TempDirs.create("epi").toString
    val engine = new MemFuse(spark, dir)
    def at(hours: Int, id: String, round: String, seq: Int, content: String) =
      Schemas.Message(id, "s1", "u1", round, seq, "user", content,
        new java.sql.Timestamp(
          java.sql.Timestamp.valueOf("2024-06-01 00:00:00").getTime + hours * 3600000L))
    engine.ingest(Seq(
      at(0, "m1", "r1", 1, "spark spark shuffle tuning"),
      at(0, "m2", "r2", 2, "spark partition advice"),
      // > 1h gap → second episode
      at(3, "m3", "r3", 3, "completely new topic cooking")).toDF())
    engine.buildEpisodes(gapSeconds = 3600)
    val eps = engine.episodes.orderBy("episode_idx").collect()
    assert(eps.length == 2)
    assert(eps(0).getAs[Long]("n_chunks") == 2)
    assert(eps(1).getAs[Long]("n_chunks") == 1)
    // lineage covers every source message exactly once across episodes
    val lineage = eps.flatMap(_.getAs[scala.collection.Seq[String]]("m0_raw_ids"))
    assert(lineage.sorted.toSeq == Seq("m1", "m2", "m3"))
    // extractive summary: most frequent content token leads
    assert(eps(0).getAs[String]("summary").startsWith("spark"))
  }

  test("knowledge CRUD round-trip") {
    val dir = graft.TempDirs.create("kn").toString
    val engine = new MemFuse(spark, dir)
    engine.addKnowledge("u1", Seq("likes scala", "dislikes yaml"))
    engine.addKnowledge("u2", Seq("other user"))
    assert(engine.knowledge("u1").count() == 2)
    val kid = engine.knowledge("u1")
      .filter(col("content") === "likes scala")
      .select("knowledge_id").as[String].collect().head
    engine.updateKnowledge(kid, "loves scala")
    assert(engine.knowledge("u1").filter(col("content") === "loves scala").count() == 1)
    engine.deleteKnowledge(kid)
    assert(engine.knowledge("u1").count() == 1)
    assert(engine.knowledge("u2").count() == 1)
  }
}
