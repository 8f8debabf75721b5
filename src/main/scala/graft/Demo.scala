package graft

import graft.pipeline.{MemFuse, Schemas}
import graft.operators.{Dedup, Multimodal, TextAnalysis}
import org.apache.spark.sql.SparkSession

/** Usage example for the library surface: batch ingest → hybrid query →
  * lineage → cascade delete, plus the multimodal plumbing. Run with
  * `sbt "runMain graft.Demo"`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = graft.TempDirs.create("memfuse-demo").toString
    val engine = new MemFuse(spark, base)

    def ts(i: Int) = new java.sql.Timestamp(1717200000000L + i * 1000L)
    engine.ingest(Seq(
      Schemas.Message("m1", "s1", "alice", "r1", 1, "user",
        "how should i size spark shuffle partitions", ts(1)),
      Schemas.Message("m2", "s1", "alice", "r1", 2, "assistant",
        "start with the number of cores and tune from shuffle spill metrics", ts(2)),
      Schemas.Message("m3", "s1", "alice", "r2", 3, "user",
        "when does a broadcast join help", ts(3)),
      Schemas.Message("m4", "s1", "alice", "r2", 4, "assistant",
        "when one side fits in executor memory broadcast avoids the shuffle", ts(4)),
      Schemas.Message("m5", "s9", "bob", "r9", 1, "user",
        "what temperature to bake sourdough bread", ts(5))).toDF())

    println(s"m0 rows: ${engine.m0.count()}, m1 chunks: ${engine.m1.count()}")

    println("\n-- alice asks about shuffle partitions --")
    engine.query("size spark shuffle partitions", "alice", topK = 2).show(false)

    println("-- bob must not see alice's chunks (tenant isolation) --")
    engine.query("spark shuffle partitions", "bob", topK = 3).show(false)

    println("-- unknown tenant: empty, no error --")
    println("rows: " + engine.query("anything", "nobody", topK = 3).count())

    println("-- lineage of every chunk --")
    engine.chunkLineage.show(false)

    println("-- relational catalog: sessions/rounds + rounds-join read --")
    engine.createUser("alice", "Alice")
    engine.createUser("bob", "Bob")
    engine.createAgent("a1", "helper")
    engine.createSession("s1", "alice", "a1")
    engine.createRound("r1", "s1")
    engine.createRound("r2", "s1")
    engine.messagesBySessionViaRounds("s1")
      .select("message_id", "role", "content").show(false)

    println("-- knowledge participates in retrieval (include_knowledge) --")
    engine.addKnowledge("alice", Seq("alice prefers parquet over csv for archives"))
    engine.query("parquet preference archives", "alice", topK = 2,
      includeKnowledge = true).show(false)

    println("-- index-lookup query path (BM25 postings + IVF probe) --")
    engine.buildIndexes(nlist = 2)
    engine.query("broadcast join help", "alice", topK = 2, useIndexes = true).show(false)

    println("-- session/agent-scoped retrieval --")
    engine.query("spark shuffle", "alice", topK = 2, sessionId = Some("s1")).show(false)

    println("-- fusion strategy + freshness boost knobs --")
    engine.query("broadcast join help", "alice", topK = 2,
      fusion = "weighted", freshness = Some(0.5)).show(false)

    println("-- message update: m0 mutates in place, the round re-chunks --")
    engine.updateMessage("m2", "size partitions from the shuffle spill metrics and core count")
    engine.query("shuffle spill metrics", "alice", topK = 1).show(false)

    println("-- deletes tombstone the side indexes; maintain() rebuilds past threshold --")
    engine.deleteMessage("m5")
    println(f"index stale fraction after delete: ${engine.indexStaleFraction}%.2f")

    println("-- storage maintenance: compact segments + vacuum + marker fold + index rebuild --")
    engine.maintain(maxSegments = 1, indexStaleThreshold = 0.1)
    println(f"index stale fraction after maintain: ${engine.indexStaleFraction}%.2f")

    engine.deleteUser("alice")
    println(s"after deleteUser(alice) cascade: m0=${engine.m0.count()} " +
      s"m1=${engine.m1.count()} sessions=${engine.sessions.count()} " +
      s"rounds=${engine.rounds.count()}")

    println("\n-- multimodal: features + frames from binary payloads --")
    val media = Multimodal.synthesize(
      Seq((1L, "abcdefghijklmnop"), (2L, "0123456789")).toDF("doc_id", "text"),
      "doc_id", "text")
    Multimodal.extractFeatures(media, 8).show(false)
    Multimodal.sampleFrames(media).show(false)

    println("-- M2 semantic layer: facts + multi-layer query --")
    val sem = new MemFuse(spark, graft.TempDirs.create("sem").toString)
    sem.ingest(Seq(
      Schemas.Message("f1", "s1", "carol", "r1", 1, "user",
        "the capital of france is paris", ts(10)),
      Schemas.Message("f2", "s1", "carol", "r2", 2, "user",
        "spark has lazy evaluation", ts(11))).toDF())
    sem.buildSemanticLayer()
    sem.m2Facts.select("subject", "predicate", "object", "confidence").show(false)
    sem.queryAllLayers("capital of france", "carol", 1).show(false)

    println("-- graph semantic query over persisted vertex embeddings --")
    sem.semanticGraphQuery("spark", topK = 3).show(false)

    println("-- conflict detection: new facts vs stored facts --")
    import graft.pipeline.SemanticLayer
    val newFacts = SemanticLayer.extractFacts(
      Seq(("c9", "carol", "the capital of france is lyon"))
        .toDF("chunk_id", "user_id", "content"))
    SemanticLayer.detectConflicts(
      newFacts, sem.m2Facts, graft.pipeline.HashingEncoder(), 0.3).show(false)

    println("-- IVF ANN index over the testdata embeddings --")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val ivf = graft.pipeline.IvfIndex.build(spark, emb, nlist = 8)
    val qv = emb.filter(org.apache.spark.sql.functions.col("vec_id") === 0L)
      .select("embedding").as[Seq[Float]].collect().head.toArray
    ivf.query(qv, topK = 5, nProbe = 2).show(false)

    println("-- PQ: 16-byte codes + ADC, exact rescore recovers recall --")
    val pq = graft.pipeline.PqIndex.build(emb)
    pq.query(qv, topK = 5, excludeId = Some(0L)).show(false)
    pq.query(qv, topK = 5, excludeId = Some(0L),
      rescoreFrom = Some(emb)).show(false)

    println("-- IVF-PQ: coarse cells + residual codes, probe 2 of 8 --")
    val ivfpq = graft.pipeline.IvfPq.build(emb, nlist = 8)
    ivfpq.query(qv, topK = 5, nProbe = 2, excludeId = Some(0L),
      rescoreFrom = Some(emb)).show(false)

    println("-- training-data pipeline: clean -> mix -> pack, one call --")
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    TextAnalysis.trainingExport(corpus, Oracles.LangMarkers,
      TextAnalysis.CleanRecipe(langs = Seq("en", "fr"), minQuality = 0.3,
        maxRepRatio = 0.2, sampleRate = 0.8, salt = "clean"),
      alpha = 0.7, seqTokens = 1024L)
      .selectExpr("seq_id", "n_docs", "n_tokens", "substring(text, 1, 60) AS preview")
      .show(5, truncate = false)

    println("-- incremental dedup: today's batch against the corpus --")
    val batch = corpus.filter($"doc_id" < 20)
      .select(($"doc_id" + 9000).as("doc_id"), $"text")
    Dedup.incrementalDedup(batch, corpus).groupBy("status").count().show(false)

    println("-- substring dedup: duplicated spans in the batch vs corpus --")
    Dedup.incrementalSpans(batch, corpus, k = 8).show(5, truncate = false)
    Dedup.duplicationReport(corpus.unionByName(batch), k = 8).show(false)

    spark.stop()
  }
}
