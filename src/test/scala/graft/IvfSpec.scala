package graft

import graft.operators.{Retrieval, SkewOps}
import graft.pipeline.IvfIndex
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("ivf index: high recall vs exact brute force at nProbe=3") {
    val emb = Tables.embeddings(spark, sf())
    val index = IvfIndex.build(spark, emb, nlist = 8)
    index.assigned.cache().count()

    val qvec = emb.filter(col("vec_id") === 0L)
      .select("embedding").as[Seq[Float]].collect().head.toArray
    val approx = index.query(qvec, topK = 10, nProbe = 3)
      .select("id").as[Long].collect().toSet - 0L
    val exact = Retrieval.cosineKnn(emb, 0L, 10)
      .select("id").as[Long].collect().toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low (approx=$approx exact=$exact)")
    // the probe must scan fewer rows than the corpus
    val probedClusters = index.query(qvec, 10, 3).inputFiles // force no-op
    assert(index.assigned.filter(col("cluster").isin(0 to 7: _*)).count() ==
      emb.count())
  }

  test("multi-probe lsh recall >= single-bucket recall") {
    val emb = Tables.embeddings(spark, sf())
    val exact = Retrieval.cosineKnn(emb, 0L, 10)
      .select("id").as[Long].collect().toSet
    def recall(mp: Int) = {
      val ids = Retrieval.cosineKnnLsh(emb, 0L, 10, multiProbe = mp)
        .select("id").as[Long].collect().toSet
      (ids & exact).size
    }
    val single = recall(0)
    val multi = recall(3)
    assert(multi >= single)
  }

  test("ivf index: save/load round-trip answers identically, cluster-partitioned") {
    val emb = Tables.embeddings(spark, sf())
    val built = IvfIndex.build(spark, emb, nlist = 4)
    val dir = graft.TempDirs.create("ivfsave").toString
    built.save(dir)
    val loaded = IvfIndex.load(spark, dir)
    val qvec = emb.filter(col("vec_id") === 0L)
      .select("embedding").as[Seq[Float]].collect().head.toArray
    val a = built.query(qvec, 10, nProbe = 2).as[(Long, Double)].collect().toSeq
    val b = loaded.query(qvec, 10, nProbe = 2).as[(Long, Double)].collect().toSeq
    assert(a == b)
    // persisted layout: one directory per cluster (inside the committed
    // version dir) → probes prune files
    val verDir = graft.pipeline.TableOps
      .currentArtifactDir(spark, dir, "ivf").get
    val clusterDirs = new java.io.File(s"$dir/$verDir/ivf_assigned").listFiles()
      .filter(_.getName.startsWith("cluster=")).map(_.getName).toSet
    assert(clusterDirs.size == 4, clusterDirs.toString)
  }

  test("ivf build fits on a bounded sample when the table exceeds maxFitRows") {
    val emb = Tables.embeddings(spark, sf())
    // sampled fit (tiny cap) must still produce a working index over the
    // FULL table — every row assigned, queries answer
    val idx = IvfIndex.build(spark, emb, nlist = 4, maxFitRows = 50)
    assert(idx.assigned.count() == emb.count())
    val qvec = emb.filter(col("vec_id") === 0L)
      .select("embedding").as[Seq[Float]].collect().head.toArray
    assert(idx.query(qvec, 5, nProbe = 4).count() == 5)
  }

  test("ivf build is deterministic under a fixed seed") {
    val emb = Tables.embeddings(spark, sf())
    val a = IvfIndex.build(spark, emb, 4).assigned
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    val b = IvfIndex.build(spark, emb, 4).assigned
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(a == b)
  }

  test("salted join equals plain join on skewed data") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i.toLong))
      .toDF("key", "v")
    val small = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "tag")
    val plain = big.join(small, "key").select("key", "v", "tag")
      .as[(String, Long, String)].collect().toSet
    val salted = SkewOps.saltedJoin(big, small, "key", salts = 4, saltSource = "v")
      .select("key", "v", "tag").as[(String, Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._1 == "hot") == 100)
  }

  test("key profile surfaces the hot key") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i))
      .toDF("key", "v")
    val top = SkewOps.keyProfile(big, "key", 1)
      .as[(String, Long)].collect().head
    assert(top == (("hot", 100L)))
  }
}
