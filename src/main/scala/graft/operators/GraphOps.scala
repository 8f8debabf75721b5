package graft.operators

import graft.functions.TextFunctions.trunc6
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph operators over (vertices, edges) DataFrames — the GraphFrames
  * convention (edges: src, dst, relation, weight).
  *
  * The reference's graph store is igraph/GraphML with 1-hop expansion and
  * edge lookups (SURVEY §2.3 J3/J4; reference: store/graph_store/
  * igraph_store.py:437-566). In Spark these are joins: the vertex side of
  * a 1-hop expansion is broadcast when small, and multi-hop = iterated
  * joins with the frontier kept distributed.
  */
object GraphOps {

  /** J3: 1-hop out-neighbors of `src`, optional relation filter, sorted by
    * edge weight desc, top-k. */
  def neighbors(
      edges: DataFrame,
      vertices: DataFrame,
      srcId: Long,
      relation: Option[String],
      topK: Int): DataFrame = {
    val e0 = edges.filter(col("src") === srcId)
    val e = relation.fold(e0)(r => e0.filter(col("relation") === r))
    e.join(vertices, e("dst") === vertices("id"))
      .select(col("dst"), col("name"), col("weight"), col("relation"))
      .orderBy(col("weight").desc, col("dst"))
      .limit(topK)
  }

  /** J4: edges between a (src, dst) pair, optional relation filter. */
  def edgesBetween(
      edges: DataFrame, srcId: Long, dstId: Long,
      relation: Option[String]): DataFrame = {
    val e0 = edges.filter(col("src") === srcId && col("dst") === dstId)
    relation.fold(e0)(r => e0.filter(col("relation") === r))
      .orderBy(col("weight").desc, col("relation"))
  }

  /** K5: semantic query over vertices carrying an `embedding` column —
    * brute-force cosine top-k over the vertex table (the graph analogue
    * of K1), matching the reference's graph store which scores every
    * node embedding against the query (store/graph_store/graphml_store
    * .py:611-704). At scale this is a narrow scan + TakeOrdered; swap in
    * the LSH/IVF candidate path for very large vertex sets. */
  def semanticQuery(
      vertices: DataFrame,
      queryVec: Array[Float],
      topK: Int): DataFrame = {
    val qvec = typedlit(queryVec.toSeq)
    vertices
      .withColumn("score",
        trunc6(graft.functions.VectorFunctions.cosine(col("embedding"), qvec)))
      .drop("embedding")
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
  }

  /** PageRank (Page et al. 1999) over an edge list, fixed iteration
    * count: rank' = (1−d)/N + d·Σ_in rank/outdeg. The vertex set is the
    * edge list's src side (pass a symmetrized list for undirected
    * graphs — then every vertex has in- and out-edges and there is no
    * dangling mass to redistribute).
    *
    * Scale shape: each iteration is ONE src-keyed join (ranks are
    * |V|-sized against the |E|-sized edge list) + one dst-keyed
    * aggregation — the standard distributed formulation; with edges
    * pre-partitioned by src the join side of every iteration reuses one
    * partitioning. Per-vertex contribution sums run decimal-widened
    * ([[graft.functions.TextFunctions.dsum12]]) so the result is
    * addition-order-free and replays exactly in SQL — a plain double
    * sum would drift with partitioning. */
  def pageRank(edges: DataFrame, iters: Int = 5,
      damping: Double = 0.85): DataFrame = {
    import graft.functions.TextFunctions.dsum12
    // materialize the edge list ONCE: every iteration (and deg/nv)
    // references it, and without the lineage cut Spark re-evaluates the
    // whole upstream edge-derivation subtree per iteration — measured
    // 3.8 s → 0.9 s on q99, where mining the near-dup pairs six times
    // over was the entire cost. At cluster scale this is the persisted,
    // src-partitioned edge table every PageRank implementation keeps.
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).localCheckpoint()
    // |V| as a bounded scalar (the codebook pattern) instead of a
    // per-iteration aggregate + broadcast: same LONG the SQL twin's
    // n_v CTE carries, divided in the same double ops
    val nV = lit(deg.count())
    val ed = e.join(deg, "src")
    var ranks = deg.select(col("src").as("v"))
      .select(col("v"), (lit(1.0) / nV).as("rank"))
    for (_ <- 1 to iters) {
      // (1−d) computed IN the plan (1.0 − 0.85), not as a Scala
      // constant: both engines must subtract the same doubles
      ranks = ed.join(ranks.select(col("v").as("src"), col("rank")), "src")
        .select(col("dst").as("v"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("v").agg(dsum12(col("c")).as("s"))
        .select(col("v"),
          ((lit(1.0) - lit(damping)) / nV +
            lit(damping) * col("s")).as("rank"))
    }
    ranks.select(col("v"), trunc6(col("rank")).as("rank")).orderBy("v")
  }

  /** Personalized PageRank from one source (teleport mass returns to
    * `source` only) — the relevance-propagation kernel of graph-based
    * memory retrieval: how strongly each memory item relates to the
    * query's anchor through the link structure, not just direct
    * neighbors (the [[pageRank]] twin of the 1-hop/2-hop expansions).
    * Same shape as [[pageRank]]: checkpointed edge list, one src-keyed
    * join + dst-keyed decimal-summed aggregation per iteration, fixed
    * unroll = the SQL twin; unreached vertices (rank 0) are dropped
    * and the output is relevance-ordered. */
  def personalizedPageRank(edges: DataFrame, source: Long, iters: Int = 5,
      damping: Double = 0.85): DataFrame = {
    import graft.functions.TextFunctions.dsum12
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).localCheckpoint()
    val ed = e.join(deg, "src")
    var ranks = deg.select(col("src").as("v"))
      .select(col("v"),
        when(col("v") === source, lit(1.0)).otherwise(lit(0.0)).as("rank"))
    for (_ <- 1 to iters) {
      ranks = ed.join(ranks.select(col("v").as("src"), col("rank")), "src")
        .select(col("dst").as("v"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("v").agg(dsum12(col("c")).as("s"))
        .select(col("v"),
          (when(col("v") === source, lit(1.0) - lit(damping))
            .otherwise(lit(0.0)) + lit(damping) * col("s")).as("rank"))
    }
    ranks.filter(col("rank") > 0)
      .select(col("v"), trunc6(col("rank")).as("rank"))
      .orderBy(col("rank").desc, col("v"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) for community
    * detection, fixed round count: every vertex adopts the most
    * frequent label among its in-neighbors each round (count desc,
    * label asc tie-break — fully deterministic, unlike the classic
    * random-order variant, so the unrolled rounds replay exactly in
    * SQL). Pass a symmetrized edge list for undirected graphs. Each
    * round is one src-keyed join + one (dst, label) count + an argmax
    * that rides the row_number idiom (heap-rewritten on graft
    * sessions); the edge list materializes once. */
  def labelPropagation(edges: DataFrame, rounds: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint()
    var labels = e.select(col("src").as("v")).distinct()
      .withColumn("label", col("v"))
    for (_ <- 1 to rounds) {
      val counts = e
        .join(labels.select(col("v").as("src"), col("label")), "src")
        .groupBy(col("dst").as("v"), col("label"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("v").orderBy(col("n").desc, col("label"))
      labels = counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select(col("v"), col("label"))
    }
    labels.orderBy("v")
  }

  /** k-core by iterative peeling (Seidman 1983; the Batagelj–Zaveršnik
    * distributed variant): repeatedly drop vertices of degree < k and
    * the edges touching them until a fixpoint — the dense backbone of
    * the near-dup graph (vertices in large mutually-duplicating
    * families), the standard community-strength gate. Each round is
    * ONE degree aggregation + a two-sided semi-join on the
    * checkpointed symmetric edge list; `rounds` is fixed so the SQL
    * twin can unroll identically, and since peeling past the fixpoint
    * is the identity, a run that CONVERGES within `rounds` matches any
    * unroll ≥ its convergence round — convergence is asserted (one
    * extra peel must be a no-op), so non-convergence fails loudly
    * instead of silently returning a non-core. Returns each surviving
    * vertex with its within-core degree. */
  def kCore(edges: DataFrame, k: Int, rounds: Int = 4): DataFrame = {
    var e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = e.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("src")
      e = e.join(keep, "src").join(keep.toDF("dst"), "dst")
        .select("src", "dst").localCheckpoint()
    }
    val keep = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= k).select("src")
    val after = e.join(keep, "src").join(keep.toDF("dst"), "dst").count()
    require(after == e.count(),
      s"k-core peeling did not converge within $rounds rounds")
    e.groupBy(col("src").as("v")).agg(count(lit(1)).as("deg")).orderBy("v")
  }

  /** Triangle count via the ordered-wedge join (the standard
    * O(E^{3/2})-work distributed formulation): canonicalize to a < b,
    * build wedges (b, c) sharing a low endpoint, close them against the
    * edge set. Each triangle {x<y<z} is counted exactly once — as the
    * wedge (y, z) at its lowest vertex x. Two equi-joins, no enumeration
    * of neighborhoods in memory. */
  def triangleCount(edges: DataFrame): DataFrame = {
    val e = edges
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val wedges = e.join(e.toDF("a", "c"), "a")
      .filter(col("b") < col("c"))
      .select(col("b").as("a"), col("c").as("b"))
    wedges.join(e, Seq("a", "b"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** BFS distance labels within `rounds` hops of `source` (level-
    * synchronous frontier expansion — each round is ONE src-keyed join
    * + min-aggregation over the checkpointed edge list; the frontier
    * never leaves the cluster). `rounds` is a fixed horizon so the SQL
    * twin unrolls identically; vertices beyond it are simply absent
    * (the output is "distance ≤ rounds", not all-pairs reachability —
    * an unbounded BFS would be [[kCore]]-style convergence-checked). */
  def bfsLevels(edges: DataFrame, source: Long, rounds: Int = 4): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint()
    var dist = e.select(col("src").as("v")).distinct()
      .withColumn("dist",
        when(col("v") === source, 0L).otherwise(lit(null).cast("long")))
    for (_ <- 1 to rounds) {
      val prop = e
        .join(dist.select(col("v").as("src"), col("dist").as("sd")), "src")
        .filter(col("sd").isNotNull)
        .groupBy(col("dst").as("v")).agg(min(col("sd") + 1).as("nd"))
      dist = dist.join(prop, Seq("v"), "left")
        .select(col("v"),
          when(col("dist").isNull, col("nd"))
            .when(col("nd").isNull, col("dist"))
            .otherwise(least(col("dist"), col("nd"))).as("dist"))
        .localCheckpoint()
    }
    dist.filter(col("dist").isNotNull).orderBy("v")
  }

  /** Local clustering coefficient: 2·t(v) / (deg(v)·(deg(v)−1)) — how
    * close each vertex's neighborhood is to a clique, the per-vertex
    * refinement of [[triangleCount]] (a near-1 coefficient over the
    * dup graph marks a mutually-duplicating family; low marks a hub
    * stitching unrelated docs). Same ordered-wedge join, but the
    * (a,b,c) triple is kept and exploded so each triangle credits its
    * three corners; degrees come from one explode-count over the
    * canonical edge set. */
  def clusteringCoefficient(edges: DataFrame): DataFrame = {
    val e = edges
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val wedges = e.join(e.toDF("a", "c"), "a")
      .filter(col("b") < col("c"))
    val tri = wedges.join(e.toDF("b", "c"), Seq("b", "c"))
    val tv = tri.select(explode(array(col("a"), col("b"), col("c"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_tri"))
    val deg = e.select(col("a").as("v"))
      .unionByName(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val nTri = coalesce(col("n_tri"), lit(0L))
    deg.join(tv, Seq("v"), "left")
      .select(col("v"), col("deg"), nTri.as("n_tri"),
        trunc6(when(col("deg") >= 2,
          lit(2.0) * nTri.cast("double") /
            (col("deg").cast("double") * (col("deg") - 1).cast("double")))
          .otherwise(lit(0.0))).as("coeff"))
      .orderBy("v")
  }

  /** 2-hop neighborhood with multiplied edge weights — iterated join,
    * frontier stays distributed. */
  def twoHop(edges: DataFrame, srcId: Long, topK: Int): DataFrame = {
    val hop1 = edges.filter(col("src") === srcId)
      .select(col("dst").as("mid"), col("weight").as("w1"))
    val hop2 = edges.select(
      col("src").as("mid"), col("dst"), col("weight").as("w2"))
    hop1.join(hop2, "mid")
      .filter(col("dst") =!= srcId)
      .groupBy("dst")
      .agg(trunc6(max(col("w1") * col("w2"))).as("path_weight"))
      .orderBy(col("path_weight").desc, col("dst"))
      .limit(topK)
  }

  /** Single-source shortest paths over WEIGHTED edges within a fixed
    * `rounds` horizon (Bellman–Ford, level-synchronous: each round is
    * ONE src-keyed join + min-aggregation over the checkpointed edge
    * list — the distributed min-plus relaxation, never a driver-side
    * frontier). The fixed horizon makes the SQL twin an identical
    * unroll; weights must be non-negative (relaxation monotone).
    * Weight sums stay raw IEEE doubles through the rounds — the same
    * left-fold in both engines — and truncate once at the output.
    * On the near-dup graph with w = 1 − jaccard this ranks how
    * "duplicate-reachable" every doc is from the source family. */
  def sssp(edges: DataFrame, source: Long, rounds: Int = 4): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"),
      col("w").cast("double").as("w")).localCheckpoint()
    var dist = e.select(col("src").as("v")).distinct()
      .withColumn("dist",
        when(col("v") === source, lit(0.0)).otherwise(lit(null).cast("double")))
    for (_ <- 1 to rounds) {
      val prop = e
        .join(dist.select(col("v").as("src"), col("dist").as("sd")), "src")
        .filter(col("sd").isNotNull)
        .groupBy(col("dst").as("v")).agg(min(col("sd") + col("w")).as("nd"))
      dist = dist.join(prop, Seq("v"), "left")
        .select(col("v"),
          when(col("dist").isNull, col("nd"))
            .when(col("nd").isNull, col("dist"))
            .otherwise(least(col("dist"), col("nd"))).as("dist"))
        .localCheckpoint()
    }
    dist.filter(col("dist").isNotNull)
      .select(col("v"), trunc6(col("dist")).as("dist"))
      .orderBy("v")
  }

  /** Degree assortativity (Newman 2002): the Pearson correlation of
    * endpoint degrees over the directed-both-ways edge list — positive
    * when hubs link hubs, negative for hub-and-spoke. INTEGER moment
    * sums end to end (degrees and their products are exact longs; by
    * symmetry Σx = Σy and Σx² = Σy², so the denominator is one integer
    * too) with a single double division at the end — no engine can
    * drift it. Two joins against the broadcast-sized degree table. */
  /** Adamic–Adar link prediction (Adamic & Adar 2003): for every
    * non-adjacent pair sharing ≥1 neighbor, Σ_w 1/ln(deg w) over the
    * common neighbors — the inverse-log weighting that discounts hub
    * intermediaries. One wedge self-join through the shared vertex
    * (u→w, w→v, u<v), degree broadcast, anti-join against existing
    * edges; terms sum on the 12-decimal order-free grid. Every common
    * neighbor has degree ≥ 2 by construction (it touches both
    * endpoints), so ln(deg) > 0 always. Scale note: wedge fan-out
    * through a hub w is deg(w)² — at corpus scale cap or sample
    * hub neighborhoods before the self-join (their 1/ln contribution
    * is smallest, so the cap biases least where it prunes most);
    * the q154-style pair graph here is support-thresholded, which is
    * that cap. Expects a symmetrized (both-directions) edge list. */
  def adamicAdar(edges: DataFrame, topK: Int = 15): DataFrame = {
    import graft.functions.TextFunctions.dsum12
    import org.apache.spark.sql.expressions.Window
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val wedges = e.toDF("u", "w")
      .join(e.toDF("w", "v"), "w")
      .filter(col("u") < col("v"))
      .join(broadcast(deg.toDF("w", "degw")), "w")
    val cand = wedges.groupBy("u", "v")
      .agg(count(lit(1)).as("n_common"),
        dsum12(lit(1.0) / log(col("degw").cast("double"))).as("aa_raw"))
      .join(e.filter(col("src") < col("dst")).toDF("u", "v"), Seq("u", "v"),
        "left_anti")
    cand
      .withColumn("rank", row_number().over(
        Window.orderBy(col("aa_raw").desc, col("u"), col("v"))).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("rank"), col("u"), col("v"), col("n_common"),
        trunc6(col("aa_raw")).as("aa"))
      .orderBy("rank")
  }

  /** HITS hubs & authorities (Kleinberg 1999), fixed iteration count
    * with L1 normalization (sum-to-one keeps the per-round rescale a
    * single exact-decimal total instead of an L2 sqrt): auth(v) =
    * Σ h(u) over in-edges, hub(u) = Σ a(v) over out-edges, each round
    * one src-keyed join + one dst-keyed decimal-summed aggregation —
    * the [[pageRank]] plan shape on a DIRECTED edge list (run it on a
    * bipartite buyer→item graph and hubs are broad buyers, authorities
    * popular items).
    *
    * Normalization happens ONCE at the end, not per round: every
    * per-round L1 rescale is a uniform scalar, so the final normalized
    * scores are identical (exact arithmetic) while the iteration chain
    * stays LINEAR — a per-round normalizer references its round's raw
    * scores twice, and both engines re-expand that shared subtree per
    * reference, 2^(2·iters) plan blowup (the first cut measured 343 s
    * at sf0.01; this one runs the whole chain as one job). Values grow
    * ~(avg deg)^iters between rescales — bounded within double/decimal
    * range for any practical round count. The two finals are
    * checkpointed (each is referenced by both its L1 total and the
    * output join), and the totals are bounded 1-row scalars, the
    * [[pageRank]] nV pattern.
    *
    * Each round's score vector is VERTEX-sized — orders of magnitude
    * under the edge list — so every iteration checkpoints its vector
    * and rebroadcasts it (`broadcastVectors`), keeping the cached edge
    * list shuffle-FREE across all 2·iters joins: the only per-round
    * exchange is the map-side-combined partial aggregation. (The
    * r6-bench shuffle-join chain re-exchanged the edge list 10×: 7.2 s
    * → this plan. For web-scale vertex sets that outgrow a broadcast,
    * pass broadcastVectors = false to fall back to shuffle joins.) */
  def hits(edges: DataFrame, iters: Int = 5,
      broadcastVectors: Boolean = true): DataFrame = {
    import graft.functions.TextFunctions.dsum12
    val side = (df: DataFrame) =>
      if (broadcastVectors) broadcast(df) else df
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint()
    val srcs = e.select(col("src").as("v")).distinct().localCheckpoint()
    val nS = lit(srcs.count())
    var hub = srcs.select(col("v"), (lit(1.0) / nS).as("h"))
      .localCheckpoint()
    var auth: DataFrame = null
    // ONE action per round, not two: auth is referenced exactly once
    // inside the round (by hub) and once after the LAST round (totals +
    // output join), so the intra-round auth checkpoint bought nothing —
    // hub's own checkpoint truncates the lineage to depth 2 every
    // round, the plan stays linear (no double-reference blowup, see
    // scaladoc), and the vertex-sized auth vector materializes as the
    // broadcast build INSIDE hub's job instead of as its own job +
    // block-manager write. Only the final auth is checkpointed (it is
    // referenced twice: its L1 total and the output join). Arithmetic
    // is untouched — dsum12 is order-free exact, so scores are
    // bit-identical to the two-action form.
    for (i <- 1 to iters) {
      auth = e.join(side(hub.select(col("v").as("src"), col("h"))), "src")
        .groupBy(col("dst").as("v")).agg(dsum12(col("h")).as("a"))
      val authRef =
        if (i == iters) { auth = auth.localCheckpoint(); auth } else auth
      hub = e.join(side(authRef.select(col("v").as("dst"), col("a"))), "dst")
        .groupBy(col("src").as("v")).agg(dsum12(col("a")).as("h"))
      // checkpoint cadence 2 (and always the last round): hub and auth
      // are each referenced exactly ONCE by the next step, so two
      // un-checkpointed rounds compose a depth-4 linear plan — no
      // double-reference blowup — and the round loop pays iters/2
      // actions instead of iters. Arithmetic untouched (same operator
      // chain, just fused into fewer jobs).
      if (i % 2 == 0 || i == iters) hub = hub.localCheckpoint()
    }
    // both L1 totals in ONE action: a cross join of two 1-row exact
    // aggregates (the former two .head() jobs each re-read a
    // checkpointed vector — same aggregations, one job)
    val tots = auth.agg(dsum12(col("a")).as("at"))
      .crossJoin(hub.agg(dsum12(col("h")).as("ht"))).head()
    val aTot = lit(tots.getDouble(0))
    val hTot = lit(tots.getDouble(1))
    hub.select(col("v"), (col("h") / hTot).as("h"))
      .join(auth.select(col("v"), (col("a") / aTot).as("a")),
        Seq("v"), "full_outer")
      .select(col("v"), trunc6(coalesce(col("h"), lit(0.0))).as("hub"),
        trunc6(coalesce(col("a"), lit(0.0))).as("authority"))
      .orderBy("v")
  }

  /** Newman modularity (Newman & Girvan 2004) of a community
    * assignment over a SYMMETRIC edge list: per community c,
    * Q_c = e_c/m − (d_c/2m)² where e_c counts intra-community
    * undirected edges, d_c sums member degrees and m is the undirected
    * edge total — the standard score for judging [[labelPropagation]]
    * output (Q > 0.3 ≈ real structure). Everything stays INTEGER
    * (directed-edge counts, degree sums) until one pinned double
    * expression per community; Σ contribution = Q. Plan: one degree
    * aggregation + one two-sided label join + two label-keyed
    * aggregations — the labels frame is vertex-sized and each join is
    * key-partitioned, so the shape survives any graph that fits its
    * edge list. */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val lab = labels.select(col("v").cast("long").as("v"),
      col("label").cast("long").as("label"))
    // m2 = directed edge count = 2m; a 1-row bounded scalar
    val m2 = e.agg(count(lit(1)).as("m2"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val dC = deg.join(lab.withColumnRenamed("v", "src"), "src")
      .groupBy("label")
      .agg(count(lit(1)).as("n_vertices"), sum(col("deg")).as("d_c"))
    val intra = e
      .join(lab.select(col("v").as("src"), col("label").as("ls")), "src")
      .join(lab.select(col("v").as("dst"), col("label").as("ld")), "dst")
      .filter(col("ls") === col("ld"))
      .groupBy(col("ls").as("label"))
      // the symmetric list counts every intra edge twice — exact halve
      .agg(expr("count(1) div 2").as("intra_edges"))
    val m2d = col("m2").cast("double")
    dC.join(intra, Seq("label"), "left_outer")
      .withColumn("intra_edges", coalesce(col("intra_edges"), lit(0L)))
      .crossJoin(broadcast(m2))
      .select(col("label"), col("n_vertices"), col("intra_edges"),
        col("d_c").as("degree_sum"),
        trunc6((lit(2L) * col("intra_edges")).cast("double") / m2d -
          (col("d_c").cast("double") / m2d) *
            (col("d_c").cast("double") / m2d)).as("contribution"))
      .orderBy("label")
  }

  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val xy = edges
      .join(broadcast(deg.toDF("src", "dx")), "src")
      .join(broadcast(deg.toDF("dst", "dy")), "dst")
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    xy.agg(count(lit(1)).as("n"),
        sum(col("dx")).as("sx"),
        sum(col("dx") * col("dy")).as("sxy"),
        sum(col("dx") * col("dx")).as("sxx"))
      .select(col("n").as("n_directed_edges"),
        // a degree-regular graph has zero degree variance — the
        // coefficient is undefined there, reported as NULL (ANSI-safe)
        when(den === 0L, lit(null).cast("double")).otherwise(
          trunc6((col("n") * col("sxy") - col("sx") * col("sx")).cast("double") /
            den.cast("double"))).as("assortativity"))
  }
}
