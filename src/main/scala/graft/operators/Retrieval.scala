package graft.operators

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity / ranking kernels (SURVEY §2.5).
  *
  * Conventions: every scorer returns lowercase-named columns and rounds the
  * final score to 6 decimals BEFORE ranking, so ordering and top-k cuts are
  * bit-stable across engines (scores are then tie-broken by id). At cluster
  * scale the score scan is embarrassingly parallel (no shuffle until the
  * top-k, which Spark executes as TakeOrderedAndProject — per-partition
  * heap + driver merge, no global sort).
  */
object Retrieval {

  /** Brute-force cosine top-k against the embedding of `queryId`
    * (reference: store/vector_store/numpy_store.py:558-626; self-exclusion
    * per :628-655). The one-row query side is broadcast. */
  def cosineKnn(
      embeddings: DataFrame,
      queryId: Long,
      topK: Int,
      threshold: Double = Double.NegativeInfinity,
      excludeSelf: Boolean = true): DataFrame = {
    val q = embeddings
      .filter(col("vec_id") === queryId)
      .select(col("embedding").as("qvec"))
    var scored = embeddings
      .crossJoin(broadcast(q))
      .withColumn("score",
        trunc6(VectorFunctions.cosine(col("embedding"), col("qvec"))))
      .select(col("vec_id").as("id"), col("score"))
    if (excludeSelf) scored = scored.filter(col("id") =!= queryId)
    scored
      .filter(col("score") >= threshold)
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
  }

  /** Batched multi-query exact KNN: every query's top-k from ONE
    * corpus scan — the batched-serving pattern that amortizes the scan
    * across a request batch (N separate scans read the corpus N
    * times; at 100 TB the scan IS the cost). The query block
    * broadcasts, scoring is a row-local fan-out (|corpus|×|batch|
    * cosines, still one pass over the vectors), and the per-query cut
    * rides the bounded-heap TopKPerKey operator — no corpus-wide
    * window sort. */
  def cosineKnnBatch(embeddings: DataFrame, queryIds: Seq[Long],
      topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qs = embeddings.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val scored = embeddings.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("id"),
        trunc6(VectorFunctions.cosine(col("embedding"), col("qvec")))
          .as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("id"))
    val heapRegistered = embeddings.sparkSession.sessionState.planner
      .strategies.exists(_ eq graft.plans.TopKPerKeyStrategy)
    val cut = // plain sessions (no GraftExtensions) fall back to the window
      if (heapRegistered)
        graft.plans.TopKPerKey(scored, Seq("qid"),
          Seq(col("score").desc, col("id")), topK)
          .withColumn("rank", row_number().over(w).cast("long"))
      else
        scored.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= topK)
    cut.orderBy("qid", "rank")
  }

  /** Contrastive-training triplet construction — the DPR/InfoNCE data
    * shape (Karpukhin et al. 2020): per query vector, the POSITIVE is
    * its exact cosine top-1 neighbor and the `negatives` NEGATIVES are
    * hash-ranked draws from the corpus (salted md5 per (query,
    * candidate) — deterministic across runs AND engines, no RNG
    * state), excluding the query itself and its positive. The negative
    * draw is a per-query top-k by hash, so it rides the same bounded-
    * heap TopK path as retrieval; at corpus scale gate candidates by
    * hash threshold first so the ranked set is ~k·oversample per
    * query, never the corpus. */
  def tripletMine(embeddings: DataFrame, queryIds: Seq[Long],
      negatives: Int = 4, salt: String = "neg"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions.md5Long
    val pos = cosineKnnBatch(embeddings, queryIds, topK = 1)
      .select(col("qid"), col("id").as("pos_id"),
        col("score").as("pos_score"))
    val w = Window.partitionBy("qid").orderBy(col("h"), col("neg_id"))
    embeddings.select(col("vec_id").as("neg_id"))
      .crossJoin(broadcast(pos))
      .filter(col("neg_id") =!= col("qid") && col("neg_id") =!= col("pos_id"))
      .withColumn("h", md5Long(concat(lit(salt + "|"),
        col("qid").cast("string"), lit("|"), col("neg_id").cast("string"))))
      .withColumn("neg_rank", row_number().over(w).cast("long"))
      .filter(col("neg_rank") <= negatives)
      .select(col("qid"), col("pos_id"), col("pos_score"),
        col("neg_rank"), col("neg_id"))
      .orderBy("qid", "neg_rank")
  }

  /** Matryoshka-truncated KNN (Kusupati et al. 2022): cosine top-k
    * over only the FIRST `dims` components of every embedding — the
    * coarse stage of matryoshka retrieval, where an MRL-trained
    * embedding's prefix carries most of the signal and the scan's
    * bytes-per-vector (and cache footprint) shrink dims/64×. Compose
    * with [[cosineKnn]] on the survivors for the full-dim exact
    * rescore, exactly like the PQ refine pattern. */
  def cosineKnnTruncated(embeddings: DataFrame, queryId: Long, topK: Int,
      dims: Int): DataFrame =
    cosineKnn(embeddings.select(col("vec_id"),
      slice(col("embedding"), 1, dims).as("embedding")), queryId, topK)

  /** IVF-style approximate KNN: probe only the query's coarse cluster
    * (the `label` column plays the IVF centroid-assignment role). At scale
    * the table is partitioned by label so the probe prunes all other
    * partitions; recall is traded for a ~nlist× scan cut, mirroring
    * DiskANN's role in the reference (models/schema/m1_episodic.py:148-162). */
  def cosineKnnIvf(
      embeddings: DataFrame,
      queryId: Long,
      topK: Int): DataFrame = {
    val q = embeddings
      .filter(col("vec_id") === queryId)
      .select(col("embedding").as("qvec"), col("label").as("qlabel"))
    embeddings
      .crossJoin(broadcast(q))
      .filter(col("label") === col("qlabel") && col("vec_id") =!= queryId)
      .withColumn("score",
        trunc6(VectorFunctions.cosine(col("embedding"), col("qvec"))))
      .select(col("vec_id").as("id"), col("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
  }

  /** Document clustering over the embedding column — the corpus-curation
    * primitive behind cluster-based diversity balancing and semantic
    * dedup (SemDeDup-style recipes). Runs the same deterministic,
    * SQL-replayable k-means as [[graft.pipeline.PqIndex]] with ONE
    * subspace spanning the full vector (md5-ordered seed rows, Lloyd
    * means through decimal-widened sums), so the oracle replays
    * training and assignment exactly. Returns (vec_id, cluster). */
  def kmeansClusters(
      embeddings: DataFrame, k: Int, iters: Int = 2,
      sampleRows: Int = 256): DataFrame = {
    val cb = graft.pipeline.PqIndex.trainCodebooks(
      embeddings, m = 1, ksub = k, iters = iters, sampleRows = sampleRows)
    graft.pipeline.PqIndex.encode(embeddings, cb.toSeq, m = 1)
      .select(col("vec_id"), col("code").cast("long").as("cluster"))
      .orderBy("vec_id")
  }

  /** Simplified (centroid-based) silhouette per cluster over the
    * [[kmeansClusters]] labeling: a = distance to own centroid, b =
    * nearest other centroid, s = (b−a)/max(a,b) — the cluster-quality
    * readout that says whether k was right BEFORE any downstream
    * SemDeDup/diversity step trusts the cells. The vector-vs-centroid
    * distances ride the component frame (vec_id, dim, x) joined to the
    * k×d centroid table — k·d rows, broadcast-sized for any sane k —
    * with order-free 12-dec grid inner sums; distances are trunc6'd
    * BEFORE the min over other clusters (the ranking rule). Medoid-free
    * by design: the exact silhouette's all-pairs term is corpus², this
    * variant is O(n·k·d) and is the form large-scale cluster audits
    * actually run. */
  def silhouette(embeddings: DataFrame, k: Int): DataFrame = {
    import graft.functions.TextFunctions.{davg, dsum12, trunc6}
    val labels = kmeansClusters(embeddings, k)
    val labeled = embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .join(labels, "vec_id")
    val dims = labeled.select(col("vec_id"), col("cluster"),
      posexplode(col("emb")).as(Seq("i", "x")))
    val cent = dims.groupBy(col("cluster").as("c2"), col("i"))
      .agg(davg(col("x")).as("c"))
    // The k·d centroid table folds to ONE broadcast row of (c2, array)
    // structs and every vector computes its k distances ROW-LOCALLY:
    // zip_with pairs component x with centroid c by array position
    // (array_sort on struct(i, c) is the posexplode index order). Each
    // (x−c)² term takes THE SAME double→decimal cast as dsum12's
    // per-row cast (shortest-string BigDecimal, HALF_UP at scale 12),
    // and the terms then sum as their exact UNSCALED LONGS — the ×10¹²
    // product of a scale-12 decimal is an integer, so the cast to
    // bigint is exact, long addition is closed and exact (a plain
    // decimal `+` lambda cannot hold scale 12 at precision 38: Add
    // promotes (38,12)+(38,12) → (38,11), silently rounding the 12th
    // digit per step), and the final /10¹² division reconstitutes a
    // decimal(38,12) whose 12-decimal quotient is exact — then the
    // same decimal→string→double exit, sqrt, trunc6 as before.
    // Envelope: |x−c| ≤ ~3.8·10² per component keeps the 64-term long
    // sum within ±2⁶³ (embedding clouds sit orders of magnitude
    // inside). The former shape exchanged an n·d·k join fan-out into a
    // (vec_id, c2) aggregation and re-joined labels for n·k more rows
    // (guide §2.3/§2.4); both exchanges are gone, and a/b fall out of
    // the per-row distance array (min is order-free; the own-cluster
    // pick matches exactly one entry, so collect_list's
    // nondeterministic struct order is harmless).
    val cents = cent.groupBy("c2")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("c")))),
        s => s.getField("c")).as("carr"))
      .agg(collect_list(struct(col("c2"), col("carr"))).as("cents"))
    val distSql =
      "cast(floor(sqrt(cast(cast(cast(aggregate(" +
        "zip_with(emb, ct.carr, (x, c) -> " +
          "cast(cast((x - c) * (x - c) as decimal(26,12)) * " +
          "1000000000000 as bigint)), " +
        "cast(0 as bigint), (acc, t) -> acc + t) " +
        "as decimal(26,0)) / cast(1000000000000 as decimal(13,0)) " +
        "as string) as double)) * 1e6) / 1e6 as double)"
    val ab = labeled.crossJoin(broadcast(cents))
      .withColumn("ds",
        expr(s"transform(cents, ct -> struct(ct.c2 as c2, $distSql as d))"))
      .select(col("vec_id"), col("cluster"),
        expr("filter(ds, s -> s.c2 = cluster)[0].d").as("a"),
        expr("array_min(transform(filter(ds, s -> s.c2 != cluster), " +
          "s -> s.d))").as("b"))
    val sil = when(greatest(col("a"), col("b")) > lit(0.0),
      (col("b") - col("a")) / greatest(col("a"), col("b")))
      .otherwise(lit(0.0))
    val d = (c: String) => col(c).cast("double")
    ab.select(col("cluster"), sil.as("sil"), col("a"), col("b"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"), dsum12(col("sil")).as("ss"),
        dsum12(col("a")).as("sa"), dsum12(col("b")).as("sb"))
      .select(col("cluster"), col("n"),
        trunc6(col("ss") / d("n")).as("mean_silhouette"),
        trunc6(col("sa") / d("n")).as("mean_a"),
        trunc6(col("sb") / d("n")).as("mean_b"))
      .orderBy("cluster")
  }

  /** Cluster-balanced diversity sampling: up to `perCluster` vectors
    * per k-means cluster, picked in md5 order (a reproducible
    * pseudo-random draw) — the "keep a spread, not the head" sampling
    * step of diversity-aware curation. The per-cluster cut runs through
    * the bounded-heap TopKPerKey operator on extended sessions. */
  def diverseSample(
      embeddings: DataFrame, k: Int, perCluster: Int,
      iters: Int = 2, salt: String = "div"): DataFrame = {
    import graft.functions.TextFunctions.md5LongSalted
    val clustered = kmeansClusters(embeddings, k, iters)
      .withColumn("pick", md5LongSalted(col("vec_id").cast("string"), salt))
    val heapRegistered = embeddings.sparkSession.sessionState.planner.strategies
      .exists(_ eq graft.plans.TopKPerKeyStrategy)
    val cut =
      if (heapRegistered)
        graft.plans.TopKPerKey(clustered, Seq("cluster"),
          Seq(col("pick"), col("vec_id")), perCluster)
      else {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("cluster").orderBy(col("pick"), col("vec_id"))
        clustered.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= perCluster).drop("rn")
      }
    cut.select("vec_id", "cluster").orderBy("vec_id")
  }

  /** Per-dimension scalar-quantization training stats (dim, mn, mx):
    * one row-local posexplode + map-side-combinable groupBy — the
    * 8-bit-scalar-quantizer analogue of FAISS `ScalarQuantizer`
    * training. The result is dim-sized (64 rows), a bounded scalar
    * collect like the PQ codebooks. */
  def sq8Stats(embeddings: DataFrame): DataFrame =
    embeddings
      .select(posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "v")))
      .groupBy("dim")
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))

  /** 8-bit scalar-quantized cosine top-k: every corpus vector is
    * encoded per dimension to `floor((v−mn)/(mx−mn)·255 + 0.5)` — 4×
    * smaller than float32 on disk — and search ranks the RECONSTRUCTED
    * vectors against the full-precision query (the asymmetric-distance
    * trick: only the stored side pays the quantization error). The
    * encode→reconstruct round trip is one row-local `transform` against
    * the broadcast dim stats, so the scan stays codegen'd and
    * exchange-free up to the TakeOrdered cut; like q70/q80 the LOSSY
    * ranking itself is deterministic and replays exactly in SQL. */
  def sq8TopK(
      embeddings: DataFrame,
      queryId: Long,
      topK: Int): DataFrame = {
    val stats = sq8Stats(embeddings).orderBy("dim").collect()
    val mns = array(stats.map(r => lit(r.getDouble(1))): _*)
    val mxs = array(stats.map(r => lit(r.getDouble(2))): _*)
    // recon_d = mn + floor((v−mn)/(mx−mn)·255 + 0.5)/255·(mx−mn); flat
    // dimensions (mx = mn) carry no information and reconstruct to mn
    val recon = transform(col("embedding").cast("array<double>"), (v, i) => {
      val mn = element_at(mns, i + 1)
      val mx = element_at(mxs, i + 1)
      when(mx === mn, mn).otherwise(
        mn + floor((v - mn) / (mx - mn) * lit(255.0) + lit(0.5)) /
          lit(255.0) * (mx - mn))
    })
    val q = embeddings
      .filter(col("vec_id") === queryId)
      .select(col("embedding").cast("array<double>").as("qvec"))
    embeddings
      .select(col("vec_id"), recon.as("rvec"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= queryId)
      .withColumn("score", trunc6(VectorFunctions.cosine(col("rvec"), col("qvec"))))
      .select(col("vec_id").as("id"), col("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
  }

  /** Per-label centroid-similarity scoring — the embedding-curation
    * outlier filter (low cosine to your own class centroid ⇒ likely
    * mislabeled / off-distribution, the CLIP-score-shaped gate of
    * image-text curation pipelines). Centroids are decimal-widened
    * per-dimension means (engine-exact, the Lloyd-mean arithmetic), a
    * labels×dim table — a bounded collect like the PQ codebooks — so
    * the scoring scan is row-local against literal centroid vectors:
    * exchange-free, codegen'd, embarrassingly parallel at 100 TB. */
  def centroidOutliers(embeddings: DataFrame): DataFrame = {
    val pos = embeddings.select(col("label"),
      posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "v")))
    val cent = pos.groupBy("label", "dim")
      .agg(graft.functions.TextFunctions.davg(col("v")).as("c"))
      .orderBy("label", "dim").collect()
    val byLabel = cent.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map {
      case (l, rows) => l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
    }
    val centCol = byLabel.tail.foldLeft(
      when(col("label") === byLabel.head._1, typedlit(byLabel.head._2))) {
      case (acc, (l, arr)) => acc.when(col("label") === l, typedlit(arr))
    }
    embeddings.select(col("vec_id"), col("label").cast("long").as("label"),
      trunc6(VectorFunctions.cosine(
        col("embedding").cast("array<double>"), centCol)).as("centroid_sim"))
      .orderBy("vec_id")
  }

  /** Johnson–Lindenstrauss random projection (Achlioptas 2001, the
    * ±1 database-friendly variant): project each embedding to `outDim`
    * dimensions through a deterministic md5-derived sign matrix —
    * pairwise distances are preserved within O(√(ln n / outDim))
    * distortion, which is what makes downstream clustering/ANN on the
    * narrow vectors sound. The matrix never materializes on the
    * driver: it is an (outDim×dim)-row frame derived from the SAME md5
    * expression any SQL engine can replay, broadcast into one
    * dim-keyed join against the row-local posexploded components; the
    * per-(vec, out_dim) dot product is an order-independent
    * decimal-widened sum, so the projection is bit-reproducible under
    * any partitioning. At 100 TB this is one broadcast join + one
    * map-side-combinable aggregation — no shuffle of the wide vectors. */
  def randomProject(embeddings: DataFrame, outDim: Int = 16,
      dim: Int = 64): DataFrame = {
    val spark = embeddings.sparkSession
    val signs = spark.range(outDim).toDF("out_dim")
      .crossJoin(spark.range(dim).toDF("dim"))
      .withColumn("s", when(
        md5Long(concat(lit("rp|"), col("out_dim").cast("string"),
          lit("|"), col("dim").cast("string"))) % 2 === 0, lit(1.0))
        .otherwise(lit(-1.0)))
    val pos = embeddings.select(col("vec_id"),
      posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "v")))
      .withColumn("dim", col("dim").cast("long"))
    pos.join(broadcast(signs), "dim")
      .groupBy("vec_id", "out_dim")
      .agg(trunc6(zsum8(col("v") * col("s"))).as("proj"))
      .orderBy("vec_id", "out_dim")
  }

  /** Exact covariance matrix of the embedding dimensions — the input
    * to PCA/whitening decisions (which dims carry variance, which are
    * redundant) and the data-health check before any distance-based
    * dedup. One narrow posexplode to (vec_id, dim, x) — d rows per
    * vector, no wide array ever carried through the fan-out — then a
    * vec_id-keyed self-join pairs the dims (i ≤ j) and ONE
    * map-side-combinable aggregation of scaled-long moment sums
    * finishes; cov = (n·Σxy − Σx·Σy)/n². The join exchanges only the
    * d-per-vector component rows (the first cut carried the full
    * 64-double array into every one of the d²/2 pair rows — 7× the
    * memory traffic, measured 5× slower); moment sums merge across
    * shards by addition. */
  def covarianceMatrix(embeddings: DataFrame, dim: Int = 64): DataFrame = {
    val nD = col("n").cast("double")
    val pos = embeddings.select(col("vec_id"),
      posexplode(slice(col("embedding").cast("array<double>"), 1, dim))
        .as(Seq("i", "x")))
      .withColumn("i", col("i").cast("long"))
    val a = pos.toDF("vec_id", "i", "xi")
    val b = pos.toDF("vec_id", "j", "xj")
    a.join(b, "vec_id")
      .filter(col("i") <= col("j"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"),
        zsum8(col("xi") * col("xj")).as("sxy"),
        zsum8(col("xi")).as("sx"),
        zsum8(col("xj")).as("sy"))
      .select(col("i"), col("j"), col("n"),
        trunc6((nD * col("sxy") - col("sx") * col("sy")) / (nD * nD))
          .as("cov"))
      .orderBy("i", "j")
  }

  /** The full symmetric covariance matrix as a (i, j, cov) frame: the
    * [[covarianceMatrix]] upper triangle (already grid-quantized to
    * 1e-6, which pins every downstream iteration to the same doubles
    * in any engine) mirrored across the diagonal. 64×64 rows —
    * checkpointed once so the power-iteration chain below references a
    * materialized frame instead of re-expanding the pair join per
    * round (the q238 lesson). */
  private def covFull(embeddings: DataFrame, dim: Int): DataFrame = {
    val up = covarianceMatrix(embeddings, dim)
    val lower = up.filter(col("i") < col("j"))
      .select(col("j").as("i"), col("i").as("j"), col("cov"))
    up.select("i", "j", "cov").unionAll(lower).localCheckpoint()
  }

  /** Driver-cap for the collected covariance matrix: dim² rows, BOUNDED
    * BY THE `dim` PARAMETER (never by data) — 4096 rows at the default
    * dim = 64, the same cap class as EventOps.maxDriverMatrixRows. A
    * caller passing a pathological dim falls back to the distributed
    * chain below. */
  private val maxDriverCovRows = 4096L

  /** Driver-side twin of [[powerIterate]], bit-identical by
    * construction (the EventOps markov-family pattern, r13): the
    * matvec's inner join + keyed 12-decimal sum replays as flatMap +
    * groupBy + dsum12Local (≡ dsum12, pinned by OperatorSpec), the L2
    * renormalization is the same sqrt-of-decimal-sum over the same
    * double products, and the division is the same double division.
    * The distributed loop planned 2·iters dim-sized exchanges + iters
    * checkpoints of a 64-ROW frame — pure scheduling overhead at any
    * corpus size, because the matrix is dim²-bounded BY PARAMETER (the
    * only data-sized work in the PCA family is the covariance pass
    * itself, which stays distributed). Returns (v_final sorted by dim
    * index, ‖C·v‖ of the last round). */
  private def powerIterateLocal(rows: Array[(Long, Long, Double)],
      dim: Int, iters: Int): (Seq[(Long, Double)], Double) = {
    import graft.functions.TextFunctions.dsum12Local
    var v: Map[Long, Double] =
      (0L until dim.toLong).map(_ -> 0.125).toMap
    var nrm = 1.0
    for (_ <- 1 to iters) {
      // inner-join semantics: only (i, j) rows whose j survives in v
      // contribute, and w keeps exactly the i's with ≥ 1 contribution
      val w = rows.flatMap { case (i, j, c) =>
        v.get(j).map(x => i -> c * x)
      }.groupBy(_._1).map { case (i, cs) => i -> dsum12Local(cs.map(_._2)) }
      nrm = math.sqrt(dsum12Local(w.map { case (_, x) => x * x }))
      v = w.map { case (i, x) => i -> x / nrm }
    }
    (v.toSeq.sortBy(_._1), nrm)
  }

  /** Collect the dim²-bounded covariance frame for the driver chain;
    * None past the parameter cap (→ distributed fallback). */
  private def collectCov(cov: DataFrame, dim: Int):
      Option[Array[(Long, Long, Double)]] =
    if (dim.toLong * dim <= maxDriverCovRows)
      Some(cov.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))))
    else None

  /** One normalized power-iteration chain over the covariance matrix
    * (von Mises & Pollaczek-Geiringer 1929): v₀ uniform (0.125 = 1/√64
    * exactly representable), each round w = C·v via a dim-keyed join +
    * 12-decimal exact sum, then an L2 renormalization — the rescale
    * keeps components O(0.1) so the DECIMAL(38,12) grid never loses
    * the signal (an UN-normalized chain would decay like λᵏ into the
    * quantization floor). Every v is a dim-sized frame, checkpointed
    * per round: the matvec is the only join, so the chain is linear in
    * both engines. Returns (v_final, norm_final); ‖C·v‖ of the last
    * round is the Rayleigh-quotient estimate of λ₁ for a unit v.
    * DISTRIBUTED FALLBACK past [[collectCov]]'s parameter cap — the
    * default dim = 64 runs [[powerIterateLocal]] instead. */
  private def powerIterate(cov: DataFrame, dim: Int,
      iters: Int): (DataFrame, DataFrame) = {
    val spark = cov.sparkSession
    var v = spark.range(dim).toDF("j")
      .select(col("j").cast("long").as("j"), lit(0.125).as("x"))
      .localCheckpoint()
    var nrm = v.agg(lit(1.0).as("nrm"))
    for (_ <- 1 to iters) {
      val w = cov.join(v, "j").groupBy(col("i"))
        .agg(dsum12(col("cov") * col("x")).as("w"))
      nrm = w.agg(sqrt(dsum12(col("w") * col("w"))).as("nrm"))
      v = w.crossJoin(broadcast(nrm))
        .select(col("i").as("j"), (col("w") / col("nrm")).as("x"))
        .localCheckpoint()
    }
    (v, nrm)
  }

  /** Top principal component of the embedding cloud: the dominant
    * eigenvector of the exact [[covarianceMatrix]], by [[powerIterate]].
    * At 100 TB the only data-sized work is the covariance pass itself
    * (one pair-join aggregation); the iteration runs entirely on the
    * dim²-sized matrix frame. Loadings are trunc6'd per dim. */
  def pcaTopComponent(embeddings: DataFrame, dim: Int = 64,
      iters: Int = 6): DataFrame = {
    val cov = covFull(embeddings, dim)
    val spark = embeddings.sparkSession
    import spark.implicits._
    val v = collectCov(cov, dim) match {
      case Some(rows) =>
        powerIterateLocal(rows, dim, iters)._1.toDF("j", "x")
      case None => powerIterate(cov, dim, iters)._1
    }
    v.select(col("j").cast("long").as("dim"),
        trunc6(col("x")).as("loading"))
      .orderBy("dim")
  }

  /** Spectral summary of the same chain: λ₁ ≈ ‖C·v‖ from the final
    * round, the trace Σᵢ C(i,i) as the total variance, and the
    * explained-variance ratio λ₁/tr(C) — the "how much does one axis
    * carry" number that decides whether matryoshka truncation is safe
    * (the q80/q81 design input). */
  def pcaExplained(embeddings: DataFrame, dim: Int = 64,
      iters: Int = 6): DataFrame = {
    val cov = covFull(embeddings, dim)
    val spark = embeddings.sparkSession
    import spark.implicits._
    val nrmTr = collectCov(cov, dim) match {
      case Some(rows) =>
        // trace = dsum12 over the diagonal, replayed with dsum12Local
        // on the same collected rows the iteration uses
        val nrmD = powerIterateLocal(rows, dim, iters)._2
        val trD = graft.functions.TextFunctions.dsum12Local(
          rows.collect { case (i, j, c) if i == j => c })
        Seq((nrmD, trD)).toDF("nrm", "trace")
      case None =>
        val (_, nrm) = powerIterate(cov, dim, iters)
        val tr = cov.filter(col("i") === col("j"))
          .agg(dsum12(col("cov")).as("trace"))
        nrm.crossJoin(tr)
    }
    nrmTr
      .select(trunc6(col("nrm")).as("lambda1"),
        trunc6(col("trace")).as("trace"),
        trunc6(col("nrm") / col("trace")).as("explained_ratio"))
  }

  /** Greedy k-center coreset selection (Gonzalez 1985, the 2-approx
    * farthest-point heuristic): start from `startId`, then repeatedly
    * take the point farthest from its nearest chosen center — the
    * classic diverse-subset picker for training-data selection. Each
    * round is one 64-row broadcast join + one per-vector exact
    * squared-distance sum, then a 1-ROW argmax collect (bounded: k
    * iterations of one scalar each, never a data-sized collect); the
    * min-distance frame updates by a single `least`. Distances ride
    * the 12-decimal sum grid and are quantized to integer 1e-8 before
    * the argmax, so selection is engine-deterministic. At 100 TB the
    * candidate pool would be LSH-bucketed first (q49's path); the
    * greedy loop itself touches each vector k times — linear, no
    * pairwise blowup. */
  def kCenterGreedy(embeddings: DataFrame, k: Int = 5,
      startId: Long = 0L): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val pos = embeddings.select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("i", "x")))
      .localCheckpoint()
    def dist8To(cid: Long): DataFrame = {
      val c = pos.filter(col("vec_id") === cid)
        .select(col("i"), col("x").as("cx"))
      pos.join(broadcast(c), "i")
        .groupBy("vec_id")
        .agg(floor(dsum12((col("x") - col("cx")) * (col("x") - col("cx"))) *
          lit(1e8) + lit(0.5)).cast("long").as("d8"))
    }
    var centers = Seq((0L, startId, 0L))
    var mind = dist8To(startId).localCheckpoint()
    for (step <- 1 until k) {
      val top = mind.orderBy(col("d8").desc, col("vec_id")).limit(1)
        .collect()(0)
      val (cid, d8) = (top.getLong(0), top.getLong(1))
      centers = centers :+ ((step.toLong, cid, d8))
      if (step < k - 1)
        mind = mind.join(dist8To(cid).withColumnRenamed("d8", "nd8"),
            "vec_id")
          .select(col("vec_id"), least(col("d8"), col("nd8")).as("d8"))
          .localCheckpoint()
    }
    centers.toDF("pos", "vec_id", "d8")
      .select(col("pos"), col("vec_id"),
        (col("d8").cast("double") / lit(1e8)).as("dist2"))
      .orderBy("pos")
  }

  /** Deterministic random-hyperplane family for sign-LSH: plane p,
    * dim d → md5-derived value in [-1, 1). Derived from the digest so
    * Spark and any SQL oracle can reproduce the exact same planes. */
  def hyperplanes(planes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(planes, dim) { (p, d) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"hp|$p|$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 13)
      (java.lang.Long.parseLong(hex, 16) % 2000) / 1000.0 - 1.0
    }

  /** Sign-LSH bucket id: bit p set iff dot(v, plane_p) > 0. */
  def lshBucket(v: Column, hp: Array[Array[Double]]): Column =
    hp.zipWithIndex.map { case (plane, p) =>
      when(VectorFunctions.dot(v, typedlit(plane.toSeq)) > 0d, lit(1 << p))
        .otherwise(lit(0))
    }.reduce(_ + _)

  /** Random-hyperplane LSH approximate KNN: probe the query's sign
    * bucket, exact-rescore inside it. With `planes` hyperplanes the scan
    * shrinks ~2^planes×; at cluster scale the table is written bucketed
    * on this id so the probe is pure partition pruning.
    *
    * `multiProbe = m` additionally probes every bucket at Hamming
    * distance 1 whose flipped plane is among the `m` smallest-margin
    * planes of the query (the classic multi-probe recall boost without
    * re-hashing the corpus). */
  def cosineKnnLsh(
      embeddings: DataFrame,
      queryId: Long,
      topK: Int,
      planes: Int = 6,
      dim: Int = 64,
      multiProbe: Int = 0): DataFrame = {
    val hp = hyperplanes(planes, dim)
    val withBucket = embeddings
      .withColumn("bucket", lshBucket(col("embedding"), hp))
    val q = withBucket
      .filter(col("vec_id") === queryId)
      .select(col("embedding").as("qvec"), col("bucket").as("qbucket"),
        array((0 until planes).map(p =>
          abs(VectorFunctions.dot(col("embedding"), typedlit(hp(p).toSeq)))): _*)
          .as("margins"))
    // probe mask: qbucket itself plus qbucket with one low-margin bit flipped
    val probes = if (multiProbe <= 0) array(col("qbucket"))
    else {
      // rank planes by |margin| ascending; flip the multiProbe smallest
      val idxByMargin = array_sort(
        array((0 until planes).map(p =>
          struct(element_at(col("margins"), p + 1).as("m"), lit(p).as("p"))): _*))
      val flipped = (0 until multiProbe).map { r =>
        col("qbucket").bitwiseXOR(
          pow(lit(2), element_at(idxByMargin, r + 1).getField("p")).cast("int"))
      }
      array(col("qbucket") +: flipped: _*)
    }
    withBucket
      .crossJoin(broadcast(q.withColumn("probes", probes)))
      .filter(array_contains(col("probes"), col("bucket")) && col("vec_id") =!= queryId)
      .withColumn("score",
        trunc6(VectorFunctions.cosine(col("embedding"), col("qvec"))))
      .select(col("vec_id").as("id"), col("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
  }

  /** Word-overlap keyword score |q ∩ c| / |q| with stop-word removal
    * (reference: rag/retrieve/buffer.py:219-309). */
  def keywordOverlap(
      docs: DataFrame,
      queryText: String,
      topK: Int): DataFrame = {
    val qTokens = queryText.split(" ").distinct.filterNot(StopWords.contains)
    docs
      .withColumn("score",
        trunc6(
          size(array_intersect(tokenSet(col("text")),
            lit(qTokens))).cast("double") / lit(qTokens.length.toDouble)))
      .filter(col("score") > 0d)
      .select(col("doc_id").as("id"), col("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
  }

  /** BM25 over whitespace tokens, k1/b per the reference defaults
    * (reference: store/keyword_store/bm25_store.py:171-250 — idf =
    * ln((N-df+0.5)/(df+0.5)+1), tf·(k1+1)/(tf+k1·(1-b+b·len/avglen))).
    *
    * Corpus statistics (N, avglen, df) are tiny aggregates broadcast back
    * against the postings — at 100 TB the postings stay distributed and
    * only the per-query-term df rows move.
    */
  def bm25(
      docs: DataFrame,
      queryTerms: Seq[String],
      topK: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val terms = queryTerms.distinct
    // doc length is size(tokens) — a narrow projection, no explode/shuffle;
    // only QUERY-term postings ever explode (filtered before grouping).
    // At scale both sides are precomputed index tables (KeywordIndex) and
    // this becomes a pure index lookup.
    val docLen = docs.select(
      col("doc_id"), size(tokens(col("text"))).cast("long").as("dl"))
    val stats = docLen.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val postings = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = postings.groupBy("term").agg(count(lit(1)).as("df"))
    // postings⋈docLen is pinned to a SHUFFLED hash join with the
    // query-term postings as build side: docLen is one row per corpus
    // document, and at toy SF the planner would happily put that
    // corpus-sized projection on a broadcast build side — the exact
    // inversion that OOMs at 100× (PlanSpec guards it)
    val scored = postings
      .join(broadcast(dfreq), "term")
      .hint("shuffle_hash")
      .join(docLen, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("tscore",
        col("idf") * (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(trunc6(dsum12(col("tscore"))).as("score"))
    scored
      .select(col("doc_id").as("id"), col("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
  }

  /** Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998):
    * greedy diversified selection from an exact top-`poolK` candidate
    * pool — step score λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s), ties by
    * id. The pool and its poolK² pairwise cosines are BOUNDED by
    * construction (topKPerQuery-sized, not corpus-sized), computed once
    * and checkpointed; each of the `selectK` greedy steps is then one
    * tiny aggregation + a 1-row argmax (the q84 bounded-head pattern).
    * All similarities are trunc6'd on the 6-decimal grid before any
    * comparison, and λ/(1−λ) are pinned literals, so the greedy path
    * is engine-deterministic. At corpus scale only the pool query
    * touches the data — MMR itself never scales past poolK. */
  def mmrRerank(embeddings: DataFrame, queryId: Long, poolK: Int = 20,
      selectK: Int = 5, lambda: Double = 0.7,
      lambdaComp: Double = 0.3): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cands = cosineKnn(embeddings, queryId, poolK)
      .join(embeddings.select(col("vec_id").as("id"), col("embedding")), "id")
      .localCheckpoint()
    val pairSims = cands.select(col("id").as("ia"), col("embedding").as("ea"))
      .crossJoin(cands.select(col("id").as("ib"), col("embedding").as("eb")))
      .filter(col("ia") =!= col("ib"))
      .select(col("ia"), col("ib"),
        trunc6(VectorFunctions.cosine(col("ea"), col("eb"))).as("psim"))
      .localCheckpoint()
    var selected = Vector.empty[(Long, Double, Long)]
    for (step <- 1 to selectK) {
      val selIds = selected.map(_._1)
      val remaining = cands.filter(!col("id").isin(selIds: _*))
      val maxSim =
        if (selIds.isEmpty) remaining.select(col("id"), lit(0.0).as("ms"))
        else pairSims.filter(col("ib").isin(selIds: _*))
          .groupBy(col("ia").as("id")).agg(max(col("psim")).as("ms"))
      val top = remaining.join(maxSim, Seq("id"), "left")
        .withColumn("mmr", lit(lambda) * col("score") -
          lit(lambdaComp) * coalesce(col("ms"), lit(0.0)))
        .orderBy(col("mmr").desc, col("id"))
        .select("id", "mmr")
        .head() // bounded: argmax over ≤ poolK rows
      selected :+= ((top.getLong(0), top.getDouble(1), step.toLong))
    }
    selected.toDF("id", "mmr_raw", "rank")
      .join(cands.select(col("id"), col("score").as("qsim")), "id")
      .select(col("rank"), col("id"), trunc6(col("mmr_raw")).as("mmr"),
        col("qsim"))
      .orderBy("rank")
  }

  /** ANN operating-point AUTO-TUNER over a measured frontier table
    * (n_probe, oversample, overlap_at_10 — the q168 sweep): the
    * CHEAPEST operating point whose measured overlap@k meets
    * `minOverlap`, minimizing n_probe first (the corpus-touching knob —
    * probe width scales the candidate scan) and oversample second (the
    * exact-rescore pool, a topK-bounded fetch). The knob a production
    * ANN deployment actually sets, picked from measured recall instead
    * of guessed — the same contract as `Dedup.blockingAutoTune`. If no
    * point meets the target, the fallback is explicit and flagged by
    * `met_target`: the highest-overlap point, cheapest first. One row. */
  def annAutoTune(frontier: DataFrame, minOverlap: Long): DataFrame = {
    val met = col("overlap_at_10") >= minOverlap
    frontier
      .withColumn("met_target", met)
      .withColumn("regime", when(met, 0).otherwise(1))
      .withColumn("pref", when(met, col("n_probe").cast("double"))
        .otherwise(-col("overlap_at_10").cast("double")))
      .orderBy(col("regime"), col("pref"), col("n_probe"), col("oversample"))
      .limit(1)
      .select(col("n_probe"), col("oversample"), col("overlap_at_10"),
        col("met_target"))
  }

  /** Recall-targeting mode of [[annAutoTune]]: the q321 tuner selects
    * on ONE tuning query's overlap@10; the number a deployment
    * actually SLAs is measured MEAN RECALL over a held-out query set.
    * Input frontier rows are (n_probe, oversample, mean_recall) where
    * mean_recall = Σ overlap@k / (k · |held-out set|), trunc6'd on the
    * comparison grid upstream. Selection contract identical to
    * [[annAutoTune]]: the CHEAPEST point whose measured mean recall
    * meets `minRecall` — n_probe (the corpus-touching knob) minimized
    * first, oversample second; if no point qualifies the fallback is
    * the highest-recall point, cheapest first, flagged by
    * `met_target`. One row. */
  def annAutoTuneRecall(frontier: DataFrame, minRecall: Double): DataFrame = {
    val met = col("mean_recall") >= minRecall
    frontier
      .withColumn("met_target", met)
      .withColumn("regime", when(met, 0).otherwise(1))
      .withColumn("pref", when(met, col("n_probe").cast("double"))
        .otherwise(-col("mean_recall")))
      .orderBy(col("regime"), col("pref"), col("n_probe"), col("oversample"))
      .limit(1)
      .select(col("n_probe"), col("oversample"), col("mean_recall"),
        col("met_target"))
  }
}
