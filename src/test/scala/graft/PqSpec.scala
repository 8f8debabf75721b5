package graft

import graft.operators.Retrieval
import graft.pipeline.PqIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  private def qvec(emb: DataFrame, id: Long = 0L): Array[Float] =
    emb.filter(col("vec_id") === id)
      .select("embedding").as[Seq[Float]].collect().head.toArray

  test("pq: deterministic training; adc recall; rescore recovers recall") {
    val emb = Tables.embeddings(spark, sf())
    def train() = PqIndex.trainCodebooks(
      emb, m = 16, ksub = 16, iters = 2, sampleRows = 256)
    val cb = train()
    assert(cb.length == 16 * 16)
    // bit-identical across runs: md5 seed order + decimal-widened means
    assert(cb.zip(train()).forall { case ((s1, c1, v1), (s2, c2, v2)) =>
      s1 == s2 && c1 == c2 && v1.sameElements(v2)
    }, "training must be deterministic")

    val codes = PqIndex.encode(emb, cb.toSeq, m = 16)
    val q = qvec(emb)
    val lut = PqIndex.adcLut(q, cb.toSeq, m = 16)
    val exact = Retrieval.cosineKnn(emb, 0L, 20).select("id").as[Long].collect()
    val adc = PqIndex.adcTopK(codes, lut, 20, excludeId = Some(0L))
      .select("id").as[Long].collect().toSet
    val adcHits = (adc & exact.toSet).size
    assert(adcHits >= 8, s"ADC overlap@20 too low: $adcHits (adc=$adc)")

    // FAISS-style refine: exact cosine over the 4× ADC candidates
    val rescored = PqIndex.adcTopKRescored(
      codes, lut, emb, q, 20, oversample = 4, excludeId = Some(0L))
      .select("id").as[Long].collect().toSet
    val reHits = (rescored & exact.toSet).size
    assert(reHits >= 15, s"rescored overlap@20 too low: $reHits")
    assert(reHits >= adcHits, "rescore must not lose recall")
    assert(rescored.contains(exact.head), "rescore must recover the exact top-1")
  }

  test("pq fast path: codegen'd array ADC matches the row-layout ranking, scan has no exchange") {
    val emb = Tables.embeddings(spark, sf())
    val idx = PqIndex.build(emb, m = 16, ksub = 16, iters = 2, sampleRows = 256)
    val q = qvec(emb)
    val lut = PqIndex.adcLut(q, idx.codebook.toSeq, m = 16)

    val row = PqIndex.adcTopK(idx.codes, lut, 20, excludeId = Some(0L)).collect()
    val fast = PqIndex.adcTopKArrays(idx.codesArr, lut, ksub = 16, 20,
      excludeId = Some(0L)).collect()
    assert(row.map(_.getLong(0)).toSeq == fast.map(_.getLong(0)).toSeq,
      "array fast path must rank exactly like the decimal row path")
    row.zip(fast).foreach { case (a, b) =>
      assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-9,
        s"adc_dist drift: ${a.getDouble(1)} vs ${b.getDouble(1)}")
    }

    // over a LOADED index the fast scan is one projected parquet pass
    // feeding TakeOrdered — no shuffle exchange, no join, no aggregate
    val dir = graft.TempDirs.create("pqfast").toString
    idx.save(dir)
    val loaded = PqIndex.load(spark, dir)
    assert(loaded.query(q, 20, excludeId = Some(0L), fast = true)
      .collect().map(_.getLong(0)).toSeq == row.map(_.getLong(0)).toSeq)
    val plan = loaded.query(q, 20, fast = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange"), s"fast ADC scan must not shuffle:\n$plan")
    assert(!plan.contains("HashAggregate"), s"fast ADC scan must not aggregate:\n$plan")

    // rescored queries return backend-identical results either way
    val slow = idx.query(q, 10, rescoreFrom = Some(emb)).collect().toSeq
    val fastQ = idx.query(q, 10, rescoreFrom = Some(emb), fast = true).collect().toSeq
    assert(slow == fastQ, "exact rescore must erase the candidate-path difference")
  }

  test("pq index: save/load answers identically; incremental adds encode new vectors") {
    val emb = Tables.embeddings(spark, sf())
    val old = emb.filter(col("vec_id") < 400)
    val idx = PqIndex.build(old, m = 16, ksub = 16, iters = 2, sampleRows = 256)
    val dir = graft.TempDirs.create("pqsave").toString
    idx.save(dir)
    val loaded = PqIndex.load(spark, dir)
    assert(loaded.m == 16 && loaded.ksub == 16)
    val q = qvec(emb)
    assert(idx.query(q, 10).collect().toSeq ==
      loaded.query(q, 10).collect().toSeq,
      "loaded index must answer exactly like the built one")

    // incremental add: new vectors encode against the EXISTING codebook
    // and the drift ratio reports the unfit fraction
    val drift = loaded.addVectors(emb.filter(col("vec_id") >= 400), dir)
    assert(math.abs(drift - 100.0 / 500.0) < 1e-9, s"drift $drift")
    val re = PqIndex.load(spark, dir)
    assert(re.codes.select("vec_id").distinct().count() == emb.count())
    // a query at a newly-added vector's own position finds it
    val top = re.query(qvec(emb, 450L), 5).select("id").as[Long].collect()
    assert(top.contains(450L), s"self-query misses the added vector: ${top.toSeq}")
  }
}
