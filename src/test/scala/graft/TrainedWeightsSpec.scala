package graft

import graft.pipeline._
import java.nio.file.Files

/** The shipped trained tensors (src/main/resources/graft/weights, fit
  * offline by graft.tools.TrainWeights on a public synonym lexicon)
  * actually score SEMANTICS: synonym paraphrases with ZERO token overlap
  * rank above unrelated text — the capability that separates "a model
  * actually scoring" from the hash-kernel stand-ins (K8/K9). */
class TrainedWeightsSpec extends SparkSpec {
  import spark.implicits._

  // (query, paraphrase sharing NO surface token with the query, unrelated)
  private val triples = Seq(
    ("the car is fast", "an automobile seems quick", "the weather is cold"),
    ("doctor treats illness", "physician cures sickness", "ship sails on the ocean"),
    ("buy big house now", "purchase that large residence", "children stroll in the forest"))

  private def cos(x: Array[Float], y: Array[Float]): Double =
    x.zip(y).map { case (p, q) => p.toDouble * q }.sum

  test("trained encoder embeds zero-overlap synonym paraphrases near the query") {
    val enc = RandomProjectionEncoder.trained
    // tensors load (not regenerate): two instances agree bit for bit
    assert(enc.encodeOne("the car is fast").toSeq ==
      RandomProjectionEncoder.trained.encodeOne("the car is fast").toSeq)
    triples.foreach { case (q, para, unrel) =>
      assert(para.split(" ").toSet.intersect(q.split(" ").toSet).isEmpty,
        s"fixture broken: '$para' shares tokens with '$q'")
      val (vq, vp, vu) = (enc.encodeOne(q), enc.encodeOne(para), enc.encodeOne(unrel))
      assert(cos(vq, vp) > cos(vq, vu) + 0.1,
        s"'$q': paraphrase ${cos(vq, vp)} not above unrelated ${cos(vq, vu)}")
    }
    // the untrained hash kernel CANNOT separate these (zero overlap both
    // ways): trained-vs-hash on the same triple shows the learned gap
    val hash = HashingEncoder()
    val (hq, hp) = (hash.encodeOne("the car is fast"),
      hash.encodeOne("an automobile seems quick"))
    assert(math.abs(cos(hq, hp)) < 0.3, "hash kernel should see ~orthogonal")
  }

  test("trained cross-encoder scores paraphrase relevance above unrelated") {
    val ce = ProjectionCrossEncoder.trained
    triples.foreach { case (q, para, unrel) =>
      assert(ce.score(q, para) > ce.score(q, unrel),
        s"'$q': ${ce.score(q, para)} !> ${ce.score(q, unrel)}")
    }
    // deterministic load
    assert(ce.score("the car is fast", "an automobile seems quick") ==
      ProjectionCrossEncoder.trained.score("the car is fast", "an automobile seems quick"))
  }

  test("facade retrieves + reranks a zero-token-overlap paraphrase end to end") {
    val dir = graft.TempDirs.create("trained").toString
    val engine = new MemFuse(spark, dir,
      encoder = RandomProjectionEncoder.trained,
      reranker = ProjectionCrossEncoder.trained)
    def msg(id: String, session: String, round: String, seq: Int, content: String) =
      Schemas.Message(id, session, "u1", round, seq, "user", content,
        java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
    engine.ingest(Seq(
      msg("m1", "s1", "r1", 1, "an automobile seems quick"),
      msg("m2", "s2", "r2", 1, "the weather is cold"),
      msg("m3", "s3", "r3", 1, "children stroll in the forest")).toDF())
    // no keyword can match — only the trained embedding space connects
    // "the car is fast" to the automobile chunk
    val top = engine.query("the car is fast", "u1", topK = 1).collect()
    assert(top.nonEmpty)
    // C1 chunking role-prefixes the stored content
    assert(top.head.getAs[String]("content").contains("an automobile seems quick"))
  }
}
