package graft

/** DuckDB oracle SQL for every SQL-expressible entry in
  * [[SparkEntry.queries]]. The driver runs these over the same parquet
  * tables (registered under their bare names) and hash-compares against
  * the Spark results, so every fragment here mirrors the Spark plan's
  * arithmetic EXACTLY — same literals, same operation order, same
  * `floor(x*1e6)/1e6` truncation, same DECIMAL-widened sums.
  */
object Oracles {

  /** Language-ID marker sets (shared with the Spark side). */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "and", "of", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  // ---- SQL fragment helpers (DuckDB dialect) ----
  private val stop = graft.functions.TextFunctions.StopWords
    .map(w => s"'$w'").mkString("[", ",", "]")

  private def t6(x: String) = s"floor(($x) * 1e6) / 1e6"
  // BOTH decimal boundary crossings go via VARCHAR so each engine's
  // cast is the same correctly-rounded decimal-string operation:
  //  - decimal→double: DuckDB's direct DECIMAL→DOUBLE cast can be
  //    1 ulp off Java's (double-rounds through the int128 numerator);
  //  - double→decimal: DuckDB's direct cast multiplies the BINARY
  //    double by 10^scale and rounds THAT, while Spark rounds the
  //    SHORTEST DECIMAL STRING (BigDecimal.valueOf) — on knife-edge
  //    terms the two differ by 1 unit in the last place of the
  //    decimal, which is exactly how q241/q257 diverged at sf0.001
  //    (found round 14; DuckDB's double→VARCHAR is shortest-round-trip,
  //    so VARCHAR→DECIMAL replays Java's path bit-for-bit).
  private def dsum(x: String) =
    s"CAST(CAST(SUM(CAST(CAST(($x) AS VARCHAR) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)"
  private def dsum12(x: String) =
    s"CAST(CAST(SUM(CAST(CAST(($x) AS VARCHAR) AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE)"
  private def davg(x: String) =
    s"CAST(${dsum(x)} / COUNT($x) AS DOUBLE)"
  /** The scaled-long exact sum (TextFunctions.xsum): floor part and
    * half-up-rounded 8-decimal frac part summed as integers — same
    * semantics as dsum, no decimal casts, nonnegative inputs only. */
  private def xsum(x: String) =
    s"(CAST(SUM(CAST(floor($x) AS BIGINT)) AS DOUBLE) + " +
      s"CAST(SUM(CAST(floor((($x) - floor($x)) * 1e8 + 0.5) AS BIGINT)) AS DOUBLE) / 1e8)"
  private def xavg(x: String) =
    s"CAST(${xsum(x)} / COUNT($x) AS DOUBLE)"
  /** Signed scaled-long exact sum (TextFunctions.zsum8): one half-up
    * 8-decimal quantization per row, plain long accumulation. */
  private def zsum8(x: String) =
    s"CAST(CAST(SUM(CAST(floor(($x) * 1e8 + 0.5) AS BIGINT)) AS DOUBLE) / 1e8 AS DOUBLE)"
  /** Non-negative product sum at the 6-decimal grid via million-base
    * hi/lo/frac long accumulators (TextFunctions.psum6): the hi/lo
    * split of floor(x) is integer-exact, and the CAST of the exact
    * integer-valued double rounds and truncates to the same BIGINT in
    * both engines. */
  private def psum6(x: String) = {
    val vi = s"CAST(floor($x) AS BIGINT)"
    s"(CAST(SUM(CAST(CAST(($vi - ($vi % 1000000)) AS DOUBLE) / 1e6 AS BIGINT)) AS DOUBLE) * 1e6 + " +
      s"CAST(SUM($vi % 1000000) AS DOUBLE) + " +
      s"CAST(SUM(CAST(floor((($x) - floor($x)) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6)"
  }
  private def toks(x: String) = s"string_split($x, ' ')"
  private def contentToks(x: String) =
    s"list_filter(${toks(x)}, t -> NOT list_contains($stop, t))"
  private def tokenSet(x: String) = s"list_distinct(${contentToks(x)})"
  private def md5Long(x: String) =
    s"CAST(concat('0x', substr(md5($x), 1, 13)) AS BIGINT)"
  /** events.ts is TIMESTAMP_NS in DuckDB; epoch µs after the same ns→µs
    * truncation the Spark loader applies. */
  private val tsUs = "epoch_us(CAST(ts AS TIMESTAMP))"

  /** q241's additive seasonal decomposition as a WITH-clause prefix
    * ending in `dec` (day, dow, value, trend, seasonal, residual — all
    * trunc6'd), shared with q257's anomaly screen. Mirrors
    * EventOps.seasonalDecompose exactly. */
  private lazy val seasonalDecomposeCtes: String =
    s"""daily AS (SELECT CAST($tsUs // 86400000000 AS BIGINT) AS day,
       |                 CAST(sum(CAST(floor(value * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS t8
       |          FROM events GROUP BY 1),
       |w AS (SELECT day, t8,
       |             CAST(count(*) OVER win AS BIGINT) AS n_win,
       |             CAST(sum(t8) OVER win AS BIGINT) AS ma8
       |      FROM daily
       |      WINDOW win AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
       |tr AS (SELECT day, day % 7 AS dow,
       |              CAST(t8 AS DOUBLE) / 1e8 AS value,
       |              CAST(ma8 AS DOUBLE) / 7e8 AS trend
       |       FROM w WHERE n_win = 7),
       |tr2 AS (SELECT *, value - trend AS detr FROM tr),
       |seas AS (SELECT dow, ${dsum12("detr")} / CAST(count(*) AS DOUBLE) AS seas
       |         FROM tr2 GROUP BY dow),
       |dec AS (SELECT day, dow, ${t6("value")} AS value, ${t6("trend")} AS trend,
       |               ${t6("seas")} AS seasonal,
       |               ${t6("value - trend - seas")} AS residual
       |        FROM tr2 JOIN seas USING (dow))""".stripMargin

  /** Right-censored gap-session lifetimes + at-risk counts — the shared
    * WITH-clause prefix of q229 (Kaplan–Meier) and q247 (Nelson–Aalen),
    * ending in `risk` (t, n_t, d, n_risk). Mirrors
    * SparkEntry.sessionDurations exactly. */
  private lazy val survivalRiskCtes: String =
    s"""e AS (SELECT user_id, event_id, $tsUs AS us FROM events),
       |g AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 3600000000
       |                     THEN 1 ELSE 0 END AS ns
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
       |s AS (SELECT *, CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
       |                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM g),
       |sess AS (SELECT user_id, sid, min(us) AS s_us, max(us) AS e_us
       |         FROM s GROUP BY user_id, sid),
       |h AS (SELECT max(e_us) AS h_us FROM sess),
       |dur AS (SELECT CAST((e_us - s_us) // 60000000 AS BIGINT) AS t,
       |               CASE WHEN h_us - e_us > 3600000000 THEN 1 ELSE 0 END AS ev
       |        FROM sess CROSS JOIN h),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM dur),
       |byt AS (SELECT t, CAST(count(*) AS BIGINT) AS n_t, CAST(sum(ev) AS BIGINT) AS d
       |        FROM dur GROUP BY t),
       |risk AS (SELECT t, n_t, d,
       |                n_all - coalesce(CAST(sum(n_t) OVER (ORDER BY t
       |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS n_risk
       |         FROM byt CROSS JOIN tot)""".stripMargin

  /** Row-stochastic event-type transition matrix as a WITH-clause
    * prefix ending in `p` (prev_type, next_type, p) — shared by
    * q276/q277. Mirrors EventOps.transitionMatrix. */
  private lazy val markovCtes: String =
    s"""e0 AS (SELECT user_id, event_id, event_type, $tsUs AS us FROM events),
       |lg AS (SELECT event_type,
       |              lag(event_type) OVER (PARTITION BY user_id
       |                ORDER BY us, event_id) AS prev_type
       |       FROM e0),
       |trans AS (SELECT prev_type, event_type AS next_type,
       |                 CAST(count(*) AS BIGINT) AS n
       |          FROM lg WHERE prev_type IS NOT NULL GROUP BY 1, 2),
       |tt AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot
       |       FROM trans GROUP BY 1),
       |p AS (SELECT trans.prev_type, next_type,
       |             CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS p
       |      FROM trans JOIN tt USING (prev_type))""".stripMargin

  /** Sign-LSH bucket id of embedding expression `e` — the exact SQL
    * mirror of Retrieval.lshBucket over the md5-derived hyperplanes.
    * (DuckDB parses plain decimal literals as DECIMAL; exponent notation
    * forces DOUBLE so the dot products run in the same IEEE
    * arithmetic.) */
  private def lshBucketSql(e: String, planes: Int = 6, dim: Int = 64): String = {
    def dlit(d: Double) = { val s = d.toString; if (s.contains("E")) s else s + "e0" }
    val hp = graft.operators.Retrieval.hyperplanes(planes, dim)
    hp.zipWithIndex.map { case (plane, p) =>
      val arr = plane.map(dlit).mkString("[", ",", "]")
      s"CASE WHEN list_dot_product(CAST($e AS DOUBLE[]), $arr) > 0 THEN ${1 << p} ELSE 0 END"
    }.mkString("(", " + ", ")")
  }

  /** cosine(a, b) with the zero-denominator guard, mirroring
    * VectorFunctions.cosine: dot(a,b) / (sqrt(dot(a,a))·sqrt(dot(b,b))). */
  private def cosine(a: String, b: String): String = {
    val denom = s"sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))"
    s"CASE WHEN $denom = 0 THEN 0.0 ELSE list_dot_product($a, $b) / ($denom) END"
  }

  /** The vector-store scan: cosine top-k vs the embedding of `qid`. */
  private def vectorScanSql(qid: Long, topK: Int): String =
    s"""SELECT id, score FROM (
       |  SELECT e.vec_id AS id,
       |         ${t6(cosine("CAST(e.embedding AS DOUBLE[])", "q.qv"))} AS score
       |  FROM embeddings e,
       |       (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = $qid) q
       |  WHERE e.vec_id != $qid)
       |ORDER BY score DESC, id LIMIT $topK""".stripMargin

  /** The PQ pipeline (q70/q71) as a WITH-clause prefix ending in
    * `codes` (vec_id, sub, code) and `lut` (sub, code, d): md5-ordered
    * sample, seed codebook from the first ksub rows, `PqIters` unrolled
    * Lloyd steps with decimal-widened centroid means, corpus encode
    * against the final codebook, query LUT. Every distance is the same
    * ‖x‖²−2x·c+‖c‖² float form as the Spark side, so codes and
    * distances are bit-identical. */
  private lazy val pqPipelineSql: String =
    pqPipelineSqlFor(SparkEntry.PqM, SparkEntry.PqKsub,
      SparkEntry.PqIters, SparkEntry.PqSample, withLut = true)

  /** ‖x‖² − 2·x·c + ‖c‖² — the one distance form every quantizer stage
    * uses (same parenthesization as the Spark/driver code). */
  private def pqDist(xx: String, x: String, c: String) =
    s"($xx - 2.0 * list_dot_product($x, $c)) + list_dot_product($c, $c)"

  /** L2-normalized embeddings as a (vec_id, uvec) SELECT body — the
    * corpus input of every quantizer pipeline (PqIndex.unitVec). */
  private val unitFromEmbeddingsSql =
    """SELECT vec_id,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |      v -> CASE WHEN nrm = 0 THEN 0.0 ELSE v / nrm END) AS uvec
      |  FROM (SELECT vec_id, embedding,
      |          sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                CAST(embedding AS DOUBLE[]))) AS nrm
      |        FROM embeddings)""".stripMargin

  /** One full Lloyd train+encode chain as CTE definitions (no leading
    * WITH) — the SQL twin of [[graft.pipeline.PqIndex.trainCodebooksOn]]
    * + encodeOn over `srcSql` (any SELECT yielding (vec_id, uvec)),
    * with CTE names prefixed `p` so two chains (IVF-PQ's coarse +
    * residual stages) compose in one query. Ends at `${p}codes`
    * (vec_id, sub, code); the final codebook is `${p}cb$iters`. */
  private def lloydChainSql(
      p: String, srcSql: String, salt: String,
      m: Int, ksub: Int, iters: Int, sampleRows: Int): String = {
    val dsub = 64 / m
    def sv(u: String, s: String) = s"$u[($s*$dsub+1):($s*$dsub+$dsub)]"
    val dist = pqDist(_, _, _)
    val iterBlocks = (1 to iters).map { t =>
      s"""${p}asg$t AS (
         |  SELECT s.vec_id, s.sub, c.code, s.subvec,
         |         ${dist("s.xx", "s.subvec", "c.centroid")} AS d
         |  FROM ${p}srx s JOIN ${p}cb${t - 1} c USING (sub)),
         |${p}best$t AS (
         |  SELECT vec_id, sub, code, subvec FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY vec_id, sub ORDER BY d, code) AS rn FROM ${p}asg$t)
         |  WHERE rn = 1),
         |${p}mean$t AS (
         |  SELECT sub, code, pos, ${davg("v")} AS mv
         |  FROM (SELECT sub, code, unnest(subvec) AS v,
         |               generate_subscripts(subvec, 1) AS pos FROM ${p}best$t)
         |  GROUP BY sub, code, pos),
         |${p}cent$t AS (SELECT sub, code, list(mv ORDER BY pos) AS centroid
         |           FROM ${p}mean$t GROUP BY sub, code),
         |${p}cb$t AS (SELECT c.sub, c.code, coalesce(n.centroid, c.centroid) AS centroid
         |         FROM ${p}cb${t - 1} c LEFT JOIN ${p}cent$t n
         |           ON n.sub = c.sub AND n.code = c.code)""".stripMargin
    }.mkString(",\n")
    s"""${p}unit AS (
       |  SELECT vec_id, uvec,
       |         md5(concat('$salt|', CAST(vec_id AS VARCHAR))) AS mh
       |  FROM ($srcSql)),
       |${p}sample AS (SELECT vec_id, uvec FROM ${p}unit ORDER BY mh, vec_id LIMIT $sampleRows),
       |${p}srx AS (
       |  SELECT vec_id, sub, subvec, list_dot_product(subvec, subvec) AS xx
       |  FROM (SELECT vec_id, sub, ${sv("uvec", "sub")} AS subvec
       |        FROM (SELECT vec_id, uvec, unnest(generate_series(0, ${m - 1})) AS sub
       |              FROM ${p}sample))),
       |${p}seeds AS (SELECT vec_id, uvec,
       |            row_number() OVER (ORDER BY mh, vec_id) - 1 AS code
       |          FROM ${p}unit ORDER BY mh, vec_id LIMIT $ksub),
       |${p}cb0 AS (SELECT sub, CAST(code AS INT) AS code, ${sv("uvec", "sub")} AS centroid
       |        FROM (SELECT code, uvec, unnest(generate_series(0, ${m - 1})) AS sub
       |              FROM ${p}seeds)),
       |$iterBlocks,
       |${p}csrx AS (
       |  SELECT vec_id, sub, subvec, list_dot_product(subvec, subvec) AS xx
       |  FROM (SELECT vec_id, sub, ${sv("uvec", "sub")} AS subvec
       |        FROM (SELECT vec_id, uvec, unnest(generate_series(0, ${m - 1})) AS sub
       |              FROM ${p}unit))),
       |${p}casg AS (
       |  SELECT s.vec_id, s.sub, c.code,
       |         ${dist("s.xx", "s.subvec", "c.centroid")} AS d
       |  FROM ${p}csrx s JOIN ${p}cb$iters c USING (sub)),
       |${p}codes AS (
       |  SELECT vec_id, sub, code FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY vec_id, sub ORDER BY d, code) AS rn FROM ${p}casg)
       |  WHERE rn = 1)""".stripMargin
  }

  private def pqPipelineSqlFor(
      m: Int, ksub: Int, iters: Int, sampleRows: Int, withLut: Boolean): String = {
    val dsub = 64 / m
    val qid = SparkEntry.KnnQueryId
    def sv(u: String, s: String) = s"$u[($s*$dsub+1):($s*$dsub+$dsub)]"
    "WITH " +
      lloydChainSql("", unitFromEmbeddingsSql, "pq", m, ksub, iters, sampleRows) +
      (if (!withLut) "" else
        s""",
         |qs AS (SELECT sub, ${sv("uvec", "sub")} AS qsub
         |       FROM (SELECT uvec, unnest(generate_series(0, ${m - 1})) AS sub
         |             FROM (SELECT uvec FROM unit WHERE vec_id = $qid))),
         |lut AS (SELECT c.sub, c.code,
         |          ${pqDist("list_dot_product(q.qsub, q.qsub)", "q.qsub", "c.centroid")} AS d
         |        FROM cb$iters c JOIN qs q USING (sub))""".stripMargin)
  }

  /** The IVF-PQ replay (q80): coarse chain (salt 'pq', one full-vector
    * subspace, nlist codes — identical to IvfPq.train's coarse stage),
    * residual chain (salt 'ivfpq') over (uvec − coarse centroid), then
    * the query side — rank cells by the same distance form, keep
    * `nProbe`, build a PER-CELL LUT from the query's residual against
    * that cell, ADC-sum over the probed cells only. Mirrors
    * [[graft.pipeline.IvfPq.adcTopK]] op-for-op. */
  private def ivfPqSql(
      nlist: Int, m: Int, ksub: Int, iters: Int, sampleRows: Int,
      nProbe: Int, topK: Int): String = {
    val dsub = 64 / m
    val qid = SparkEntry.KnnQueryId
    def sv(u: String, s: String) = s"$u[($s*$dsub+1):($s*$dsub+$dsub)]"
    val coarse =
      lloydChainSql("c", unitFromEmbeddingsSql, "pq", 1, nlist, iters, sampleRows)
    val resSrc =
      s"""SELECT u.vec_id,
         |    list_transform(generate_series(1, 64),
         |      i -> u.uvec[i] - cb.centroid[i]) AS uvec
         |  FROM cunit u
         |  JOIN ccodes k ON k.vec_id = u.vec_id
         |  JOIN ccb$iters cb ON cb.code = k.code""".stripMargin
    val resid = lloydChainSql("r", resSrc, "ivfpq", m, ksub, iters, sampleRows)
    s"""WITH $coarse,
       |$resid,
       |qv AS (SELECT uvec FROM cunit WHERE vec_id = $qid),
       |probed AS (
       |  SELECT cb.code AS cluster, cb.centroid
       |  FROM ccb$iters cb, qv q
       |  ORDER BY ${pqDist("list_dot_product(q.uvec, q.uvec)", "q.uvec", "cb.centroid")},
       |           cb.code
       |  LIMIT $nProbe),
       |qres AS (
       |  SELECT p.cluster,
       |         list_transform(generate_series(1, 64),
       |           i -> q.uvec[i] - p.centroid[i]) AS uvec
       |  FROM probed p, qv q),
       |qsub AS (
       |  SELECT cluster, sub, ${sv("uvec", "sub")} AS qsub
       |  FROM (SELECT cluster, uvec, unnest(generate_series(0, ${m - 1})) AS sub
       |        FROM qres)),
       |lut AS (
       |  SELECT q.cluster, c.sub, c.code,
       |         ${pqDist("list_dot_product(q.qsub, q.qsub)", "q.qsub", "c.centroid")} AS d
       |  FROM rcb$iters c JOIN qsub q USING (sub)),
       |jc AS (
       |  SELECT r.vec_id, k.code AS cluster, r.sub, r.code
       |  FROM rcodes r JOIN ccodes k ON k.vec_id = r.vec_id)
       |SELECT vec_id AS id, ${t6(dsum12("d"))} AS adc_dist
       |FROM jc j JOIN lut l
       |  ON j.cluster = l.cluster AND j.sub = l.sub AND j.code = l.code
       |WHERE j.vec_id != $qid
       |GROUP BY vec_id
       |ORDER BY adc_dist, id LIMIT $topK""".stripMargin
  }

  /** The keyword-store scan: BM25(k1=1.2, b=0.75) over whitespace tokens. */
  private def bm25Sql(terms: Seq[String], topK: Int): String = {
    val termList = terms.map(t => s"'$t'").mkString("(", ",", ")")
    s"""SELECT doc_id AS id, ${t6(dsum12("tscore"))} AS score FROM (
       |  SELECT p.doc_id,
       |         ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
       |           * (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)) AS tscore
       |  FROM (SELECT doc_id, term, count(*) AS tf
       |        FROM (SELECT doc_id, unnest(${toks("text")}) AS term FROM documents)
       |        GROUP BY doc_id, term) p
       |  JOIN (SELECT term, count(*) AS df
       |        FROM (SELECT doc_id, term, count(*) AS tf
       |              FROM (SELECT doc_id, unnest(${toks("text")}) AS term FROM documents)
       |              GROUP BY doc_id, term)
       |        WHERE term IN $termList GROUP BY term) f USING (term)
       |  JOIN (SELECT doc_id, count(*) AS dl
       |        FROM (SELECT doc_id, unnest(${toks("text")}) AS term FROM documents)
       |        GROUP BY doc_id) l ON p.doc_id = l.doc_id
       |  CROSS JOIN (SELECT count(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl
       |              FROM (SELECT doc_id, count(*) AS dl
       |                    FROM (SELECT doc_id, unnest(${toks("text")}) AS term FROM documents)
       |                    GROUP BY doc_id)) s
       |  WHERE p.term IN $termList)
       |GROUP BY doc_id ORDER BY score DESC, id LIMIT $topK""".stripMargin
  }

  /** vector ∪ keyword union with store_type tags (fusion input). */
  private def unitedSql: String =
    s"""SELECT id, score, 'vector' AS store_type FROM (${vectorScanSql(SparkEntry.KnnQueryId, 50)})
       |UNION ALL
       |SELECT id, score, 'keyword' AS store_type FROM (${bm25Sql(SparkEntry.Bm25Terms, 50)})""".stripMargin

  private val weightCase =
    "CASE WHEN store_type = 'vector' THEN 1.0 WHEN store_type = 'keyword' THEN 0.5 ELSE 0.0 END"

  private def rrfSql(topK: Int): String =
    s"""SELECT id, ${t6(dsum12(s"($weightCase) / (60.0 + rnk)"))} AS fused_score
       |FROM (SELECT *, row_number() OVER (PARTITION BY store_type ORDER BY score DESC, id) AS rnk
       |      FROM ($unitedSql))
       |GROUP BY id ORDER BY fused_score DESC, id LIMIT $topK""".stripMargin

  /** Shared shingle pipeline over a `corpus(doc_id, text)` CTE body:
    * distinct word 3-grams per doc, built by array slicing (mirrors
    * Dedup.shingles). DuckDB arrays are 1-based and `arr[i:j]` is
    * inclusive, so Spark's slice(toks, i+1, 3) with i in 0..len-3 is
    * arr[i:i+2] with i in 1..len-2. */
  private def shinglesSql(corpus: String): String =
    s"""WITH corpus AS ($corpus),
       |sh AS (SELECT DISTINCT doc_id, s FROM (
       |  SELECT doc_id,
       |         unnest(list_transform(generate_series(1, len(${toks("text")}) - 2),
       |                i -> array_to_string(${toks("text")}[i:i+2], ' '))) AS s
       |  FROM corpus WHERE len(${toks("text")}) >= 3))""".stripMargin

  private val nearDupCorpus =
    """SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + 10000, substr(text, strpos(text, ' ') + 1) FROM documents""".stripMargin

  /** The q44 conflict-detection oracle. Mirrors SemanticLayer.extractFacts
    * + detectConflicts with Md5SignEncoder: the encoder's unnormalized
    * sign-count vectors are exact small integers, so cosine is rebuilt
    * bit-for-bit from md5() — bucket h%64 / sign bit 6 of the 52-bit md5
    * prefix, dot via a bucket equi-join, norms from Σv², trunc6 before
    * the threshold filter (same order as the Spark plan). */
  private def conflictsSql: String = {
    val pat = """'^(.*?)\s+(is|are|has|have)\s+(.*)$'"""
    def facts(corpus: String) =
      s"""SELECT concat(chunk_id, '|', md5(fact_text)) AS fact_id,
         |       subject, predicate, object, fact_text FROM (
         |  SELECT chunk_id, subject, predicate, object,
         |         concat_ws(' ', subject, predicate, object) AS fact_text FROM (
         |    SELECT chunk_id,
         |           regexp_extract(content, $pat, 1) AS subject,
         |           regexp_extract(content, $pat, 2) AS predicate,
         |           regexp_extract(content, $pat, 3) AS object
         |    FROM ($corpus))
         |  WHERE subject <> '' AND object <> '')""".stripMargin
    def vecs(factsCte: String) =
      s"""SELECT fact_id, h % 64 AS bucket,
         |       CAST(SUM(CASE WHEN ((h >> 6) & 1) = 0 THEN 1 ELSE -1 END) AS DOUBLE) AS v
         |FROM (SELECT fact_id, CAST(concat('0x', substr(md5(t), 1, 13)) AS BIGINT) AS h
         |      FROM (SELECT fact_id, unnest(string_split(fact_text, ' ')) AS t FROM $factsCte)
         |      WHERE t <> '')
         |GROUP BY fact_id, bucket""".stripMargin
    val oldCorpus =
      """SELECT CAST(p_partkey AS VARCHAR) AS chunk_id,
        |       concat(p_name, ' is ', p_type) AS content
        |FROM part WHERE p_partkey < 500""".stripMargin
    val newCorpus =
      """SELECT CAST(p_partkey + 100000 AS VARCHAR) AS chunk_id,
        |       concat(p_name, CASE WHEN p_size % 2 = 0 THEN ' is ' ELSE ' has ' END,
        |              p_brand) AS content
        |FROM part WHERE p_partkey < 500""".stripMargin
    s"""WITH fo AS (${facts(oldCorpus)}),
       |fn AS (${facts(newCorpus)}),
       |vo AS (${vecs("fo")}),
       |vn AS (${vecs("fn")}),
       |nrmo AS (SELECT fact_id, sqrt(SUM(v * v)) AS nrm FROM vo GROUP BY fact_id),
       |nrmn AS (SELECT fact_id, sqrt(SUM(v * v)) AS nrm FROM vn GROUP BY fact_id),
       |pairs AS (SELECT n.fact_id AS new_id, o.fact_id AS old_id,
       |                 n.predicate AS np, o.predicate AS op,
       |                 n.object AS nb, o.object AS ob
       |          FROM fn n JOIN fo o ON n.subject = o.subject),
       |dots AS (SELECT p.new_id, p.old_id, SUM(a.v * b.v) AS d
       |         FROM pairs p
       |         JOIN vn a ON a.fact_id = p.new_id
       |         JOIN vo b ON b.fact_id = p.old_id AND b.bucket = a.bucket
       |         GROUP BY p.new_id, p.old_id)
       |SELECT new_id, old_id, conflict_type, similarity FROM (
       |  SELECT p.new_id, p.old_id,
       |    CASE WHEN p.np = p.op AND p.nb <> p.ob THEN 'DIRECT_CONTRADICTION'
       |         ELSE 'SEMANTIC_CONFLICT' END AS conflict_type,
       |    ${t6("CASE WHEN nn.nrm * no_.nrm = 0 THEN 0.0 ELSE coalesce(d.d, 0.0) / (nn.nrm * no_.nrm) END")} AS similarity
       |  FROM pairs p
       |  LEFT JOIN dots d ON d.new_id = p.new_id AND d.old_id = p.old_id
       |  JOIN nrmn nn ON nn.fact_id = p.new_id
       |  JOIN nrmo no_ ON no_.fact_id = p.old_id)
       |WHERE similarity >= 0.5
       |ORDER BY new_id, old_id""".stripMargin
  }

  /** q45: vertex-embedding cosine top-k. The query's md5-sign vector is
    * computed by the same Scala encoder at SQL-generation time and
    * inlined as VALUES (exponent literals force DOUBLE); vertex vectors
    * are rebuilt from md5() per q44's construction. */
  private def graphSemanticSql: String = {
    val q = graft.pipeline.Md5SignEncoder().encodeOne(SparkEntry.GraphQueryText)
    val qvals = q.zipWithIndex.collect { case (v, b) if v != 0f =>
      s"($b, ${v.toDouble}e0)"
    }.mkString(", ")
    val q2 = q.map(x => x.toDouble * x.toDouble).sum
    val qnorm = s"sqrt(${q2}e0)"
    s"""WITH names AS (SELECT p_partkey + 100000 AS id, p_name AS name FROM part),
       |vn AS (SELECT id, h % 64 AS bucket,
       |              CAST(SUM(CASE WHEN ((h >> 6) & 1) = 0 THEN 1 ELSE -1 END) AS DOUBLE) AS v
       |       FROM (SELECT id, CAST(concat('0x', substr(md5(t), 1, 13)) AS BIGINT) AS h
       |             FROM (SELECT id, unnest(string_split(name, ' ')) AS t FROM names)
       |             WHERE t <> '')
       |       GROUP BY id, bucket),
       |nrm AS (SELECT id, sqrt(SUM(v * v)) AS nrm FROM vn GROUP BY id),
       |qv(bucket, qval) AS (VALUES $qvals),
       |dots AS (SELECT vn.id, SUM(vn.v * qv.qval) AS d
       |         FROM vn JOIN qv ON qv.bucket = vn.bucket GROUP BY vn.id)
       |SELECT id, name, score FROM (
       |  SELECT n.id, n.name,
       |    ${t6(s"CASE WHEN nrm.nrm * $qnorm = 0 THEN 0.0 ELSE coalesce(d.d, 0.0) / (nrm.nrm * $qnorm) END")} AS score
       |  FROM names n JOIN nrm ON nrm.id = n.id LEFT JOIN dots d ON d.id = n.id)
       |ORDER BY score DESC, id LIMIT 20""".stripMargin
  }

  /** q59: the reference's T3 three-way hybrid — vector ∪ keyword ∪
    * graph-semantic legs, RRF-fused with per-store weights. The graph
    * leg reuses q45's md5-sign construction as top-level CTEs (g*
    * prefixed), cut to the same top-50 as the other legs before
    * fusion. */
  private def threeWayRrfSql(topK: Int): String = {
    val q = graft.pipeline.Md5SignEncoder().encodeOne(SparkEntry.GraphQueryText)
    val qvals = q.zipWithIndex.collect { case (v, b) if v != 0f =>
      s"($b, ${v.toDouble}e0)"
    }.mkString(", ")
    val q2 = q.map(x => x.toDouble * x.toDouble).sum
    val qnorm = s"sqrt(${q2}e0)"
    val w3 = "CASE WHEN store_type = 'vector' THEN 1.0 " +
      "WHEN store_type = 'keyword' THEN 0.5 " +
      "WHEN store_type = 'graph' THEN 0.75 ELSE 0.0 END"
    s"""WITH gnames AS (SELECT p_partkey + 100000 AS id, p_name AS name FROM part),
       |gvn AS (SELECT id, h % 64 AS bucket,
       |               CAST(SUM(CASE WHEN ((h >> 6) & 1) = 0 THEN 1 ELSE -1 END) AS DOUBLE) AS v
       |        FROM (SELECT id, CAST(concat('0x', substr(md5(t), 1, 13)) AS BIGINT) AS h
       |              FROM (SELECT id, unnest(string_split(name, ' ')) AS t FROM gnames)
       |              WHERE t <> '')
       |        GROUP BY id, bucket),
       |gnrm AS (SELECT id, sqrt(SUM(v * v)) AS nrm FROM gvn GROUP BY id),
       |gqv(bucket, qval) AS (VALUES $qvals),
       |gdots AS (SELECT gvn.id, SUM(gvn.v * gqv.qval) AS d
       |          FROM gvn JOIN gqv ON gqv.bucket = gvn.bucket GROUP BY gvn.id),
       |gscored AS (
       |  SELECT n.id,
       |    ${t6(s"CASE WHEN gnrm.nrm * $qnorm = 0 THEN 0.0 ELSE coalesce(d.d, 0.0) / (gnrm.nrm * $qnorm) END")} AS score
       |  FROM gnames n JOIN gnrm ON gnrm.id = n.id LEFT JOIN gdots d ON d.id = n.id),
       |united AS (
       |  SELECT id, score, 'vector' AS store_type FROM (${vectorScanSql(SparkEntry.KnnQueryId, 50)})
       |  UNION ALL
       |  SELECT id, score, 'keyword' AS store_type FROM (${bm25Sql(SparkEntry.Bm25Terms, 50)})
       |  UNION ALL
       |  SELECT id, score, 'graph' AS store_type FROM
       |    (SELECT id, score FROM gscored ORDER BY score DESC, id LIMIT 50))
       |SELECT id, ${t6(dsum12(s"($w3) / (60.0 + rnk)"))} AS fused_score
       |FROM (SELECT *, row_number() OVER (PARTITION BY store_type ORDER BY score DESC, id) AS rnk
       |      FROM united)
       |GROUP BY id ORDER BY fused_score DESC, id LIMIT $topK""".stripMargin
  }

  /** Shared scored-corpus CTE chain for the q63/q64 cleaning recipe:
    * docsWithCopies with per-row lang guess (q16's construction),
    * trunc6'd quality (q14's) and repetition ratio (q56's), and the
    * deterministic sample flag (q53's, salt "clean", rate 0.8). */
  private def cleanScoredCtes: String = {
    val langs = LangMarkers.keys.toSeq.sorted
    val scoreCols = langs.map { l =>
      val markers = LangMarkers(l).map(w => s"'$w'").mkString("[", ",", "]")
      s"CAST(len(list_intersect(${toks("text")}, $markers)) AS DOUBLE) / len(${toks("text")}) AS s_$l"
    }.mkString(",\n        ")
    val best = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
    val cases = langs.map(l => s"WHEN s_$l = best AND best > 0.0 THEN '$l'").mkString(" ")
    val quality =
      s"""(CAST(len(list_distinct(${toks("text")})) AS DOUBLE)
         |      / CAST(len(${toks("text")}) AS DOUBLE)) * 0.5
         |   + (1.0 - (CAST(len(${toks("text")}) - len(${contentToks("text")}) AS DOUBLE)
         |      / CAST(len(${toks("text")}) AS DOUBLE))) * 0.3
         |   + least((CAST(length(text) - len(${toks("text")}) + 1 AS DOUBLE)
         |      / CAST(len(${toks("text")}) AS DOUBLE)) / 8.0, 1.0) * 0.2""".stripMargin
    val rep =
      "CASE WHEN len(grams) > 0 THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams) ELSE 0.0 END"
    s"""corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id + 10000, text FROM documents),
       |ls AS (
       |  SELECT doc_id, text,
       |        $scoreCols,
       |        CASE WHEN len(${toks("text")}) >= 3
       |          THEN list_transform(generate_series(1, len(${toks("text")}) - 2),
       |                 i -> array_to_string(${toks("text")}[i:i+2], ' '))
       |          ELSE CAST([] AS VARCHAR[]) END AS grams
       |  FROM corpus),
       |scored AS (
       |  SELECT doc_id, text,
       |    CASE $cases ELSE 'und' END AS lang_guess,
       |    ${t6(quality)} AS quality,
       |    ${t6(rep)} AS rep_ratio,
       |    (CAST(${md5Long("concat(CAST(doc_id AS VARCHAR), '|clean')")} % 1000000 AS DOUBLE)
       |       < 0.8e0 * 1000000e0) AS sampled
       |  FROM (SELECT *, $best AS best FROM ls))""".stripMargin
  }

  private val CleanPhone = "'[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}'"
  private val CleanEmail = "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'"
  private val CleanPreds =
    "lang_guess IN ('en', 'fr') AND quality >= 0.3 AND rep_ratio <= 0.2"

  /** q107's multinomial Naive Bayes replay — priors + per-class
    * hashed-token counts (+1/+B smoothed), cnt-weighted scaled-long
    * log-likelihood sums, argmax by (score DESC, cls). Also wrapped
    * by q150's confusion report. */
  /** The NB CTE prefix (through `scored`: doc_id, cls, score) — shared
    * by q107's argmax, q150's confusion wrap and q215's calibration. */
  private val naiveBayesCtes: String = {
    val b = 4096
    s"""WITH tk AS (
       |  SELECT doc_id, lang, ${md5Long("concat('nb|', term)")} % $b AS bucket
       |  FROM (SELECT doc_id, lang, unnest(${toks("text")}) AS term FROM documents)),
       |classes AS (SELECT lang AS cls, count(*) AS n_docs FROM documents GROUP BY lang),
       |nt AS (SELECT SUM(n_docs) AS n_total FROM classes),
       |priors AS (SELECT cls, ln(CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE)) AS log_prior
       |           FROM classes CROSS JOIN nt),
       |ct AS (SELECT lang AS cls, bucket, count(*) AS cnt FROM tk GROUP BY 1, 2),
       |ctot AS (SELECT cls, SUM(cnt) AS cls_total FROM ct GROUP BY cls),
       |feats AS (SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS tcnt
       |          FROM tk GROUP BY 1, 2),
       |ll AS (
       |  SELECT doc_id, cls, ${zsum8(
           s"CAST(tcnt AS DOUBLE) * ln(CAST(coalesce(cnt, 0) + 1 AS DOUBLE) / CAST(cls_total + $b AS DOUBLE))")} AS ll
       |  FROM (SELECT f.doc_id, c.cls, c.cls_total, f.tcnt, x.cnt
       |        FROM feats f CROSS JOIN ctot c
       |        LEFT JOIN ct x ON x.cls = c.cls AND x.bucket = f.bucket)
       |  GROUP BY doc_id, cls),
       |scored AS (
       |  SELECT doc_id, cls, ${t6("log_prior + ll")} AS score
       |  FROM ll JOIN priors USING (cls))""".stripMargin
  }

  private val naiveBayesSql: String =
    s"""$naiveBayesCtes
       |SELECT doc_id, cls AS pred_lang, score FROM (
       |  SELECT doc_id, cls, score,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cls) AS rn
       |  FROM scored)
       |WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** q72's HLL replay — also wrapped by q152's error audit. */
  /** Generic md5-HLL cardinality estimate per `key` over `src` (a
    * FROM-able relation exposing columns `key` and `value`) — the SQL
    * twin of Sketches.hllSketch+hllEstimate for any keyed column. */
  private def hllByKeySql(src: String, key: String, value: String): String = {
    val b = 6; val m = 1 << b; val alpha = 0.709
    val rhoCase = (1 to 52).map { k =>
      s"WHEN body % ${1L << k} = ${1L << (k - 1)} THEN $k"
    }.mkString("CASE ", " ", " ELSE 53 END")
    s"""WITH hs AS (
       |  SELECT $key,
       |    CAST(concat('0x', substr(h, 1, 8)) AS BIGINT) % $m AS register,
       |    $rhoCase AS r
       |  FROM (SELECT $key, md5(concat('hll|', $value)) AS h,
       |          CAST(concat('0x', substr(md5(concat('hll|', $value)), 9, 13)) AS BIGINT) AS body
       |        FROM $src WHERE $value IS NOT NULL)),
       |sk AS (SELECT $key, register, max(r) AS max_rho
       |       FROM hs GROUP BY $key, register),
       |ag AS (SELECT $key,
       |         CAST(SUM(CAST(power(2.0, 53 - max_rho) AS BIGINT)) AS BIGINT)
       |           AS present_scaled,
       |         count(*) AS n_present
       |       FROM sk GROUP BY $key)
       |SELECT $key,
       |  ${t6(s"CASE WHEN rawE <= ${2.5 * m} AND zeros > 0 " +
           s"THEN ${m.toDouble} * ln(${m.toDouble} / CAST(zeros AS DOUBLE)) " +
           "ELSE rawE END")} AS est_distinct
       |FROM (
       |  SELECT $key, $m - n_present AS zeros,
       |    (${alpha * m * m} * power(2.0, 53)) /
       |      CAST(present_scaled + ($m - n_present) *
       |           CAST(power(2.0, 53) AS BIGINT) AS DOUBLE) AS rawE
       |  FROM ag)
       |ORDER BY $key""".stripMargin
  }

  private val hllLangSql: String = {
      val b = 6; val m = 1 << b; val alpha = 0.709
      val rhoCase = (1 to 52).map { k =>
        s"WHEN body % ${1L << k} = ${1L << (k - 1)} THEN $k"
      }.mkString("CASE ", " ", " ELSE 53 END")
      s"""WITH hs AS (
         |  SELECT lang,
         |    CAST(concat('0x', substr(h, 1, 8)) AS BIGINT) % $m AS register,
         |    $rhoCase AS r
         |  FROM (SELECT lang, md5(concat('hll|', text)) AS h,
         |          CAST(concat('0x', substr(md5(concat('hll|', text)), 9, 13)) AS BIGINT) AS body
         |        FROM documents)),
         |sk AS (SELECT lang, register, max(r) AS max_rho
         |       FROM hs GROUP BY lang, register),
         |ag AS (SELECT lang,
         |         CAST(SUM(CAST(power(2.0, 53 - max_rho) AS BIGINT)) AS BIGINT)
         |           AS present_scaled,
         |         count(*) AS n_present
         |       FROM sk GROUP BY lang)
         |SELECT lang,
         |  ${t6(s"CASE WHEN rawE <= ${2.5 * m} AND zeros > 0 " +
             s"THEN ${m.toDouble} * ln(${m.toDouble} / CAST(zeros AS DOUBLE)) " +
             "ELSE rawE END")} AS est_distinct
         |FROM (
         |  SELECT lang, $m - n_present AS zeros,
         |    (${alpha * m * m} * power(2.0, 53)) /
         |      CAST(present_scaled + ($m - n_present) *
         |           CAST(power(2.0, 53) AS BIGINT) AS DOUBLE) AS rawE
         |  FROM ag)
         |ORDER BY lang""".stripMargin
    }

  /** Register/rho case + estimate fragments at b = 10 (m = 1024),
    * mirroring Sketches.hllSketch/hllEstimate — shared by the
    * q304/q305 sketch-family oracles. */
  private val hll10Rho: String = (1 to 52).map { k =>
    s"WHEN body % ${1L << k} = ${1L << (k - 1)} THEN $k"
  }.mkString("CASE ", " ", " ELSE 53 END")

  private def hll10Est(aggFrom: String, key: String): String = {
    val m = 1024
    val alpha = 0.7213 / (1 + 1.079 / m)
    s"""SELECT $key,
       |  ${t6(s"CASE WHEN rawE <= ${2.5 * m} AND zeros > 0 " +
          s"THEN ${m.toDouble} * ln(${m.toDouble} / CAST(zeros AS DOUBLE)) " +
          "ELSE rawE END")} AS est_distinct
       |FROM (
       |  SELECT $key, $m - n_present AS zeros,
       |    (${alpha * m * m} * power(2.0, 53)) /
       |      CAST(present_scaled + ($m - n_present) *
       |           CAST(power(2.0, 53) AS BIGINT) AS DOUBLE) AS rawE
       |  FROM (SELECT $key,
       |          CAST(SUM(CAST(power(2.0, 53 - max_rho) AS BIGINT)) AS BIGINT)
       |            AS present_scaled,
       |          count(*) AS n_present
       |        FROM $aggFrom GROUP BY $key))""".stripMargin
  }

  private val base: Map[String, String] = Map(
    "q44_conflicts" -> conflictsSql,

    "q63_clean_corpus" ->
      s"""WITH ${cleanScoredCtes},
         |surv AS (
         |  SELECT doc_id, lang_guess,
         |         regexp_replace(regexp_replace(text, $CleanPhone, '[PHONE]', 'g'),
         |                        $CleanEmail, '[EMAIL]', 'g') AS redacted
         |  FROM scored WHERE $CleanPreds AND sampled),
         |keep AS (SELECT min(doc_id) AS keep_id FROM surv GROUP BY md5(redacted))
         |SELECT doc_id, lang_guess, redacted
         |FROM surv JOIN keep ON doc_id = keep_id
         |ORDER BY doc_id""".stripMargin,

    // q79: the composed export pipeline — q63's clean chain, q76's
    // temperature mix (over the guessed language), q75's pack; one
    // long CTE chain, each block the already-proven oracle fragment
    "q79_training_export" ->
      s"""WITH ${cleanScoredCtes},
         |surv AS (
         |  SELECT doc_id, lang_guess,
         |         regexp_replace(regexp_replace(text, $CleanPhone, '[PHONE]', 'g'),
         |                        $CleanEmail, '[EMAIL]', 'g') AS redacted
         |  FROM scored WHERE $CleanPreds AND sampled),
         |keep AS (SELECT min(doc_id) AS keep_id FROM surv GROUP BY md5(redacted)),
         |cleaned AS (SELECT doc_id, lang_guess, redacted
         |            FROM surv JOIN keep ON doc_id = keep_id),
         |mcounts AS (SELECT lang_guess, CAST(count(*) AS DOUBLE) AS n
         |            FROM cleaned GROUP BY lang_guess),
         |mw AS (SELECT lang_guess, power(n, ${(0.7 - 1.0).toString}) AS w FROM mcounts),
         |mrates AS (SELECT lang_guess, ${t6("w / (SELECT max(w) FROM mw)")} AS rate
         |           FROM mw),
         |mixed AS (
         |  SELECT doc_id, redacted FROM cleaned JOIN mrates USING (lang_guess)
         |  WHERE CAST(${md5Long("concat('mix|', CAST(doc_id AS VARCHAR))")} % 1000000 AS DOUBLE)
         |        < rate * 1000000e0),
         |psized AS (
         |  SELECT doc_id, redacted AS text, len(string_split(redacted, ' ')) AS n,
         |         SUM(len(string_split(redacted, ' '))) OVER (ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM mixed),
         |packs AS (
         |  SELECT doc_id, text,
         |         CAST(floor(CAST(cum - n AS DOUBLE) / 1024.0) AS BIGINT) AS seq_id
         |  FROM psized)
         |SELECT seq_id, n_docs,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, text
         |FROM (SELECT seq_id, count(*) AS n_docs,
         |             string_agg(text, ' ' ORDER BY doc_id) AS text
         |      FROM packs GROUP BY seq_id)
         |ORDER BY seq_id""".stripMargin,

    "q64_clean_report" ->
      s"""WITH ${cleanScoredCtes}
         |SELECT CAST(count(*) AS BIGINT) AS n_total,
         |  CAST(count(CASE WHEN lang_guess IN ('en', 'fr') THEN 1 END) AS BIGINT) AS n_lang,
         |  CAST(count(CASE WHEN lang_guess IN ('en', 'fr') AND quality >= 0.3 THEN 1 END) AS BIGINT) AS n_quality,
         |  CAST(count(CASE WHEN $CleanPreds THEN 1 END) AS BIGINT) AS n_repetition,
         |  CAST(count(CASE WHEN $CleanPreds AND sampled THEN 1 END) AS BIGINT) AS n_sampled,
         |  CAST(count(DISTINCT CASE WHEN $CleanPreds AND sampled
         |    THEN md5(regexp_replace(regexp_replace(text, $CleanPhone, '[PHONE]', 'g'),
         |                            $CleanEmail, '[EMAIL]', 'g')) END) AS BIGINT) AS n_deduped
         |FROM scored""".stripMargin,
    "q45_graph_semantic" -> graphSemanticSql,
    "q59_fusion_three_way" -> threeWayRrfSql(20),

    // q84: round-0 BPE pair statistics — same pre-tokenizer as q50, one
    // leading space stripped, letter/number cores only, adjacent char
    // pairs weighted by occurrence. Ties at the top-k edge break on the
    // pair string (total order).
    "q84_bpe_pair_stats" -> {
      val pat = """''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"""
      s"""WITH cores AS (
         |  SELECT CASE WHEN piece LIKE ' %' THEN substr(piece, 2) ELSE piece END AS core
         |  FROM (SELECT unnest(regexp_extract_all(text, '$pat')) AS piece FROM documents)),
         |pairs AS (
         |  SELECT unnest(list_transform(generate_series(1, length(core) - 1),
         |                i -> substr(core, i, 2))) AS pair
         |  FROM cores
         |  WHERE regexp_full_match(core, '[\\p{L}\\p{N}]+') AND length(core) >= 2)
         |SELECT pair, CAST(count(*) AS BIGINT) AS cnt
         |FROM pairs GROUP BY pair
         |ORDER BY cnt DESC, pair LIMIT 40""".stripMargin
    },

    "q50_token_count_bpe" -> {
      // same regex as TextAnalysis.BpePattern, SQL-quoted ('' escapes ')
      val pat = """''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"""
      s"""SELECT doc_id,
         |  len(regexp_extract_all(text, '$pat')) AS n_bpe_pieces,
         |  len(string_split(text, ' ')) AS n_ws_tokens
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    // q60: the EXACT BPE merge loop replayed in SQL. The shipped merge
    // table inlines as a list literal (rank = 1-based position); each
    // recursion step merges the LEFTMOST lowest-ranked adjacent pair of
    // one piece, exactly TextAnalysis.bpeMergeCount. Whitespace pieces
    // count 1; one leading space folds into its word (the Ġ convention).
    // nullif: DuckDB list_position returns 0, not NULL, on a miss.
    "q60_token_count_bpe_exact" -> {
      val pat = """''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"""
      val merges = graft.operators.TextAnalysis.BpeMergeRanks.toSeq
        .sortBy(_._2).map(_._1)
      val mergesList = merges
        .map(m => "'" + m.replace("'", "''") + "'").mkString("[", ",", "]")
      s"""WITH RECURSIVE
         |pieces AS (
         |  SELECT doc_id, unnest(regexp_extract_all(text, '$pat')) AS piece
         |  FROM documents WHERE doc_id < 60),
         |cores AS (
         |  SELECT doc_id, row_number() OVER () AS pidx,
         |         CASE WHEN starts_with(piece, ' ') THEN substr(piece, 2)
         |              ELSE piece END AS core
         |  FROM pieces WHERE NOT regexp_matches(piece, '^\\s+$$')),
         |r AS (
         |  SELECT doc_id, pidx, regexp_extract_all(core, '(?s).') AS syms, 0 AS iter
         |  FROM cores
         |  UNION ALL
         |  SELECT doc_id, pidx,
         |         syms[1:pos-1] || [syms[pos] || syms[pos+1]] || syms[pos+2:],
         |         iter + 1
         |  FROM (SELECT doc_id, pidx, syms, iter,
         |               list_min(ranks) AS best,
         |               list_position(ranks, list_min(ranks)) AS pos
         |        FROM (SELECT doc_id, pidx, syms, iter,
         |                     list_transform(generate_series(1, len(syms) - 1),
         |                       i -> coalesce(nullif(list_position($mergesList,
         |                              syms[i] || ' ' || syms[i+1]), 0), 999999)) AS ranks
         |              FROM r WHERE len(syms) >= 2))
         |  WHERE best < 999999),
         |merged AS (SELECT doc_id, pidx, arg_max(len(syms), iter) AS n
         |           FROM r GROUP BY doc_id, pidx)
         |SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens_exact FROM (
         |  SELECT doc_id, n FROM merged
         |  UNION ALL
         |  SELECT doc_id, 1 AS n FROM pieces WHERE regexp_matches(piece, '^\\s+$$'))
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    // media synthesized from text bytes (all-ASCII corpus → byte and
    // char slicing coincide); frame_len mirrors greatest(int(n/nf), 1)
    "q51_multimodal_frames" ->
      """WITH media AS (
        |  SELECT doc_id AS media_id,
        |         ['image','audio','video'][(doc_id % 3) + 1] AS kind,
        |         text, length(text) AS n_bytes, (doc_id % 7) + 1 AS nf
        |  FROM documents WHERE doc_id < 200),
        |frames AS (
        |  SELECT media_id, kind, text,
        |         greatest(CAST(floor(CAST(n_bytes AS DOUBLE) / nf) AS INT), 1) AS frame_len,
        |         unnest(generate_series(0, nf - 1)) AS frame_idx
        |  FROM media)
        |SELECT media_id, kind, frame_idx, frame_hash, frame_bytes FROM (
        |  SELECT media_id, kind, CAST(frame_idx AS BIGINT) AS frame_idx,
        |         md5(substr(text, frame_idx * frame_len + 1, frame_len)) AS frame_hash,
        |         CAST(length(substr(text, frame_idx * frame_len + 1, frame_len)) AS BIGINT) AS frame_bytes
        |  FROM frames)
        |WHERE frame_bytes > 0
        |ORDER BY media_id, frame_idx""".stripMargin,

    // exponent literals force DOUBLE so rate*1e6 is the same IEEE
    // product as Spark's lit(rate) * 1000000d (a DECIMAL 0.2 * 1000000
    // would be exactly 200000 where the double product is not)
    "q53_stratified_sample" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE CAST(${md5Long("concat(CAST(doc_id AS VARCHAR), '|s1')")} % 1000000 AS DOUBLE)
         |      < (CASE WHEN lang = 'en' THEN 0.5e0
         |              WHEN lang = 'zh' THEN 0.2e0 ELSE 1.0e0 END) * 1000000e0
         |ORDER BY doc_id""".stripMargin,

    "q54_mixture_report" ->
      s"""SELECT lang, source, n_docs, n_tokens,
         |  ${t6("CAST(n_tokens AS DOUBLE) / CAST(SUM(n_tokens) OVER () AS DOUBLE)")} AS token_share
         |FROM (SELECT lang, source, count(*) AS n_docs,
         |             CAST(SUM(len(${toks("text")})) AS BIGINT) AS n_tokens
         |      FROM documents GROUP BY lang, source)
         |ORDER BY lang, source""".stripMargin,

    "q48_metadata_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, 'k') AS BIGINT) AS k_value,
        |  len(json_keys(props)) AS n_keys,
        |  CAST(json_extract_string(props, 'k') AS BIGINT) % 10 = 0 AS k_mod10
        |FROM events
        |WHERE json_extract_string(props, 'k') IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${xsum("l_quantity")} AS sum_qty,
         |  ${xsum("l_extendedprice")} AS sum_base_price,
         |  ${xsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${xsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
         |  ${xavg("l_quantity")} AS avg_qty,
         |  ${xavg("l_extendedprice")} AS avg_price,
         |  ${xavg("l_discount")} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_top_revenue_orders" ->
      s"""SELECT o_orderkey, ${t6(xsum("l_extendedprice * (1.0 - l_discount)"))} AS revenue,
         |  CAST(o_orderdate AS DATE) AS o_orderdate
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |GROUP BY o_orderkey, o_orderdate
         |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q03_region_rollup" ->
      s"""SELECT r_name, n_name, count(*) AS n_suppliers, ${dsum("s_acctbal")} AS total_acctbal
         |FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q04_point_lookup" ->
      """SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |  c_acctbal, c_mktsegment
        |FROM customer WHERE c_custkey = 42""".stripMargin,

    "q05_order_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45.0)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q06_revenue_filter" ->
      s"""SELECT ${t6(xsum("l_extendedprice * l_discount"))} AS revenue FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0""".stripMargin,

    "q07_customer_spend" ->
      s"""SELECT c_custkey, c_name, n_orders, total_spent
         |FROM (SELECT o_custkey, count(*) AS n_orders, ${xsum("o_totalprice")} AS total_spent
         |      FROM orders GROUP BY o_custkey) o
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY total_spent DESC, c_custkey LIMIT 20""".stripMargin,

    "q08_events_rollup" ->
      s"""SELECT event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
         |  count(*) AS n, ${dsum("value")} AS total_value, ${davg("value")} AS avg_value
         |FROM events GROUP BY event_type, day ORDER BY event_type, day""".stripMargin,

    "q09_sessionize" ->
      s"""WITH e AS (SELECT user_id, event_id, value, $tsUs AS us FROM events),
         |g AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 3600000000
         |                     THEN 1 ELSE 0 END AS ns
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |s AS (SELECT *, CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
         |                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM g)
         |SELECT user_id, session_idx, count(*) AS n_events,
         |  min(event_id) AS first_event, max(event_id) AS last_event,
         |  ${dsum("value")} AS session_value
         |FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_idx""".stripMargin,

    "q10_freshness_boost" ->
      s"""SELECT event_id, user_id,
         |  ${t6(s"value * (1.0 + 0.2 * greatest(0.0, 1.0 - (CAST(m.max_us - $tsUs AS DOUBLE) / 3.6e9) / 24.0))")} AS boosted
         |FROM events, (SELECT max($tsUs) AS max_us FROM events) m
         |ORDER BY boosted DESC, event_id LIMIT 100""".stripMargin,

    "q11_quality_assessment" ->
      s"""SELECT user_id,
         |  ${t6(s"${davg("value")} * 0.6 + (CAST(SUM(CASE WHEN m.max_us - $tsUs <= 86400000000 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)) * 0.4")} AS quality,
         |  count(*) AS n
         |FROM events, (SELECT max($tsUs) AS max_us FROM events) m
         |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q12_user_events" ->
      s"""SELECT event_id, $tsUs AS ts_us, event_type, value FROM events
         |WHERE user_id = 3 ORDER BY ts_us, event_id LIMIT 20""".stripMargin,

    // DuckDB's native ASOF LEFT JOIN is the independent check of the
    // Spark union-window formulation (same >= tie rule: a click at the
    // purchase's own instant matches)
    "q90_asof_join" ->
      s"""WITH p AS (SELECT event_id, user_id, $tsUs AS ts_us, value
         |           FROM events WHERE event_type = 'purchase'),
         |     c AS (SELECT user_id, $tsUs AS ts_us, max(value) AS click_value
         |           FROM events WHERE event_type = 'click' GROUP BY 1, 2)
         |SELECT p.event_id, p.ts_us, p.value, c.click_value,
         |       c.ts_us AS click_ts_us
         |FROM p ASOF LEFT JOIN c
         |  ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
         |ORDER BY p.event_id""".stripMargin,

    "q91_range_join" ->
      s"""WITH v AS (SELECT event_id AS view_id, user_id, $tsUs AS ts_us
         |           FROM events WHERE event_type = 'view'),
         |     e AS (SELECT event_id AS error_id, user_id, $tsUs AS ws
         |           FROM events WHERE event_type = 'error')
         |SELECT v.view_id, e.error_id, v.ts_us - e.ws AS lag_us
         |FROM v JOIN e ON v.user_id = e.user_id
         |  AND v.ts_us >= e.ws AND v.ts_us < e.ws + 3600000000
         |ORDER BY view_id, error_id""".stripMargin,

    // trailing-24h RANGE frame over epoch-µs; the sum runs over half-up
    // 8-decimal scaled longs (xsum trick) so it is order-independent
    "q92_rolling_window" ->
      s"""SELECT event_id, user_id, ts_us, n_trailing, sum_trailing FROM (
         |  SELECT event_id, user_id, $tsUs AS ts_us,
         |    count(*) OVER w AS n_trailing,
         |    CAST(sum(CAST(floor(value * 1e8 + 0.5) AS BIGINT)) OVER w AS DOUBLE) / 1e8
         |      AS sum_trailing
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY $tsUs
         |               RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW))
         |ORDER BY event_id""".stripMargin,

    "q93_funnel" ->
      s"""WITH e AS (SELECT user_id, event_type, $tsUs AS ts_us FROM events),
         |s1 AS (SELECT user_id, min(ts_us) AS t1 FROM e
         |       WHERE event_type = 'view' GROUP BY 1),
         |s2 AS (SELECT e.user_id, min(ts_us) AS t2 FROM e
         |       JOIN s1 ON e.user_id = s1.user_id AND e.ts_us > s1.t1
         |       WHERE event_type = 'click' GROUP BY 1),
         |s3 AS (SELECT e.user_id, min(ts_us) AS t3 FROM e
         |       JOIN s2 ON e.user_id = s2.user_id AND e.ts_us > s2.t2
         |       WHERE event_type = 'purchase' GROUP BY 1)
         |SELECT s1.user_id, t1, t2, t3,
         |  CAST((CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END)
         |     + (CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END)
         |     + (CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS depth
         |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
         |        LEFT JOIN s3 ON s1.user_id = s3.user_id
         |ORDER BY s1.user_id""".stripMargin,

    "q13_token_stats" ->
      s"""SELECT doc_id, len(${toks("text")}) AS n_tokens,
         |  len(list_distinct(${toks("text")})) AS n_distinct,
         |  len(${toks("text")}) - len(${contentToks("text")}) AS n_stopwords,
         |  length(text) AS n_chars_computed
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q14_quality_score" ->
      s"""SELECT doc_id, ${t6("stop_ratio")} AS stop_ratio, ${t6("uniq_ratio")} AS uniq_ratio,
         |  ${t6("avg_token_len")} AS avg_token_len,
         |  ${t6("uniq_ratio * 0.5 + (1.0 - stop_ratio) * 0.3 + least(avg_token_len / 8.0, 1.0) * 0.2")} AS quality
         |FROM (SELECT doc_id,
         |        CAST(len(${toks("text")}) - len(${contentToks("text")}) AS DOUBLE)
         |          / CAST(len(${toks("text")}) AS DOUBLE) AS stop_ratio,
         |        CAST(len(list_distinct(${toks("text")})) AS DOUBLE)
         |          / CAST(len(${toks("text")}) AS DOUBLE) AS uniq_ratio,
         |        CAST(length(text) - len(${toks("text")}) + 1 AS DOUBLE)
         |          / CAST(len(${toks("text")}) AS DOUBLE) AS avg_token_len
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "q15_fingerprint" ->
      s"""SELECT doc_id, md5(array_to_string(list_sort(${tokenSet("text")}), ' ')) AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin,

    // the Gopher rule battery: every signal replayed with DuckDB list
    // functions over the same single-space split
    "q88_gopher_quality" ->
      s"""WITH w AS (SELECT doc_id, ${toks("text")} AS words FROM documents),
         |b AS (SELECT doc_id, words, len(words) AS n_words,
         |        CASE WHEN len(words) >= 2
         |             THEN list_transform(range(1, len(words)),
         |                    i -> concat(words[i], ' ', words[i + 1]))
         |             ELSE CAST([] AS VARCHAR[]) END AS bigrams
         |      FROM w),
         |m AS (SELECT doc_id,
         |        CAST(n_words AS BIGINT) AS n_words,
         |        ${t6("CAST(list_sum(list_transform(words, x -> len(x))) AS DOUBLE) / n_words")} AS mean_word_len,
         |        ${t6("1.0 - CAST(len(list_distinct(words)) AS DOUBLE) / n_words")} AS dup_word_frac,
         |        CASE WHEN n_words >= 2 THEN
         |          ${t6("CAST(list_max(list_transform(list_distinct(bigrams), bg -> len(list_filter(bigrams, x -> x = bg)))) AS DOUBLE) / (n_words - 1)")}
         |        ELSE CAST(0 AS DOUBLE) END AS top_bigram_frac,
         |        CAST(len(list_filter(['the','be','to','of','and','that','have','with','a','in'],
         |          s -> list_contains(words, s))) AS BIGINT) AS stop_hits
         |      FROM b)
         |SELECT doc_id, n_words, mean_word_len, dup_word_frac, top_bigram_frac, stop_hits,
         |  (n_words BETWEEN 25 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
         |   AND dup_word_frac <= 0.6 AND top_bigram_frac <= 0.10 AND stop_hits >= 1) AS keep
         |FROM m ORDER BY doc_id""".stripMargin,

    "q16_lang_id" -> {
      val langs = LangMarkers.keys.toSeq.sorted
      val scores = langs.map { l =>
        val markers = LangMarkers(l).map(w => s"'$w'").mkString("[", ",", "]")
        s"CAST(len(list_intersect(${toks("text")}, $markers)) AS DOUBLE) / len(${toks("text")}) AS s_$l"
      }.mkString(",\n        ")
      val best = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
      val cases = langs.map(l => s"WHEN s_$l = best AND best > 0.0 THEN '$l'").mkString(" ")
      s"""SELECT doc_id, CASE $cases ELSE 'und' END AS lang_guess, ${t6("best")} AS lang_score
         |FROM (SELECT doc_id, $best AS best, * FROM (
         |  SELECT doc_id,
         |        $scores
         |  FROM documents))
         |ORDER BY doc_id""".stripMargin
    },

    "q17_text_search" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE contains(lower(text), 'join filter') ORDER BY doc_id LIMIT 20""".stripMargin,

    "q18_keyword_overlap" -> {
      val q = SparkEntry.KwQuery.split(" ").distinct
        .filterNot(graft.functions.TextFunctions.StopWords.contains)
      val qList = q.map(t => s"'$t'").mkString("[", ",", "]")
      s"""SELECT id, score FROM (
         |  SELECT doc_id AS id,
         |    ${t6(s"CAST(len(list_intersect(${tokenSet("text")}, $qList)) AS DOUBLE) / ${q.length}.0")} AS score
         |  FROM documents)
         |WHERE score > 0.0 ORDER BY score DESC, id LIMIT 50""".stripMargin
    },

    "q19_bm25" -> bm25Sql(SparkEntry.Bm25Terms, 50),

    // indexed BM25 reads the same scores from persisted postings — the
    // oracle is therefore the q19 corpus-scan formula verbatim
    "q46_bm25_indexed" -> bm25Sql(SparkEntry.Bm25Terms, 50),

    "q20_knn_cosine" -> vectorScanSql(SparkEntry.KnnQueryId, 20),

    // exhaustive IVF probe (nProbe = nlist): every cluster is scanned, so
    // the index result must equal the brute-force KNN — q20's formula
    // checks the whole index machinery end to end
    "q47_knn_ivf_probe" -> vectorScanSql(SparkEntry.KnnQueryId, 20),

    "q21_knn_ivf" ->
      s"""SELECT id, score FROM (
         |  SELECT e.vec_id AS id,
         |         ${t6(cosine("CAST(e.embedding AS DOUBLE[])", "q.qv"))} AS score
         |  FROM embeddings e,
         |       (SELECT CAST(embedding AS DOUBLE[]) AS qv, label FROM embeddings
         |        WHERE vec_id = ${SparkEntry.IvfQueryId}) q
         |  WHERE e.label = q.label AND e.vec_id != ${SparkEntry.IvfQueryId})
         |ORDER BY score DESC, id LIMIT 20""".stripMargin,

    // q70: the full PQ pipeline replayed in SQL (see pqPipelineSql) —
    // pure ADC ranking from the codes
    "q70_knn_pq" ->
      s"""$pqPipelineSql
         |SELECT vec_id AS id, ${t6(dsum12("d"))} AS adc_dist
         |FROM codes JOIN lut USING (sub, code)
         |WHERE vec_id != ${SparkEntry.KnnQueryId}
         |GROUP BY vec_id
         |ORDER BY adc_dist, id LIMIT 20""".stripMargin,

    // q71: ADC top-(20×4) candidates exact-rescored with raw cosine
    // (FAISS refine) — only the candidate ids fetch full vectors
    "q71_knn_pq_rescored" ->
      s"""$pqPipelineSql,
         |cand AS (
         |  SELECT vec_id, ${t6(dsum12("d"))} AS adc_dist
         |  FROM codes JOIN lut USING (sub, code)
         |  WHERE vec_id != ${SparkEntry.KnnQueryId}
         |  GROUP BY vec_id
         |  ORDER BY adc_dist, vec_id LIMIT ${20 * SparkEntry.PqOversample})
         |SELECT a.vec_id AS id,
         |       ${t6(cosine("CAST(e.embedding AS DOUBLE[])", "q.qv"))} AS score
         |FROM cand a
         |JOIN embeddings e ON e.vec_id = a.vec_id,
         |     (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
         |      WHERE vec_id = ${SparkEntry.KnnQueryId}) q
         |ORDER BY score DESC, id LIMIT 20""".stripMargin,

    // q80: the full IVF-PQ build+probe+scan replay — coarse cells,
    // residual codebooks, per-cell LUTs, ADC over the probed cells only
    "q80_knn_ivfpq" ->
      ivfPqSql(SparkEntry.IvfPqNlist, SparkEntry.IvfPqM, SparkEntry.IvfPqKsub,
        SparkEntry.PqIters, SparkEntry.PqSample,
        SparkEntry.IvfPqNProbe, 20),

    // q81: IVF-PQ ADC top-(20×4) candidates exact-rescored with raw
    // cosine (FAISS refine), same shape as q71
    "q81_knn_ivfpq_rescored" ->
      s"""SELECT a.id,
         |       ${t6(cosine("CAST(e.embedding AS DOUBLE[])", "q.qv"))} AS score
         |FROM (${ivfPqSql(SparkEntry.IvfPqNlist, SparkEntry.IvfPqM,
             SparkEntry.IvfPqKsub, SparkEntry.PqIters, SparkEntry.PqSample,
             SparkEntry.IvfPqNProbe, 20 * SparkEntry.PqOversample)}) a
         |JOIN embeddings e ON e.vec_id = a.id,
         |     (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
         |      WHERE vec_id = ${SparkEntry.KnnQueryId}) q
         |ORDER BY score DESC, id LIMIT 20""".stripMargin,

    // q77/q78: the k-means clustering replay — the PQ pipeline with ONE
    // full-vector subspace; q78 adds the md5-ordered per-cluster cut
    "q77_kmeans_clusters" ->
      s"""${pqPipelineSqlFor(1, 8, 2, 256, withLut = false)}
         |SELECT vec_id, CAST(code AS BIGINT) AS cluster FROM codes
         |ORDER BY vec_id""".stripMargin,

    "q78_diverse_sample" ->
      s"""${pqPipelineSqlFor(1, 8, 2, 256, withLut = false)},
         |picked AS (
         |  SELECT vec_id, CAST(code AS BIGINT) AS cluster,
         |         ${md5Long("concat('div|', CAST(vec_id AS VARCHAR))")} AS pick
         |  FROM codes)
         |SELECT vec_id, cluster FROM (
         |  SELECT vec_id, cluster, row_number() OVER (
         |    PARTITION BY cluster ORDER BY pick, vec_id) AS rn
         |  FROM picked)
         |WHERE rn <= 10 ORDER BY vec_id""".stripMargin,

    // q279: centroid silhouette of the q77 clustering — component-frame
    // distances to all k centroids, trunc6 before the other-cluster
    // min, per-cluster means on the 12-dec grid. Mirrors
    // Retrieval.silhouette.
    "q279_silhouette" -> {
      val dd = (c: String) => s"CAST($c AS DOUBLE)"
      s"""${pqPipelineSqlFor(1, 8, 2, 256, withLut = false)},
         |labeled AS (
         |  SELECT c.vec_id, CAST(c.code AS BIGINT) AS cluster,
         |         CAST(e.embedding AS DOUBLE[]) AS emb
         |  FROM codes c JOIN embeddings e ON e.vec_id = c.vec_id),
         |dims AS (SELECT vec_id, cluster,
         |                CAST(generate_subscripts(emb, 1) AS BIGINT) AS i,
         |                CAST(unnest(emb) AS DOUBLE) AS x
         |         FROM labeled),
         |cent AS (SELECT cluster AS c2, i, ${davg("x")} AS c
         |         FROM dims GROUP BY cluster, i),
         |dt AS (SELECT vec_id, c2,
         |              ${t6(s"sqrt(${dsum12("(x - c) * (x - c)")})")} AS d
         |       FROM (SELECT vec_id, i, x FROM dims) dx JOIN cent USING (i)
         |       GROUP BY vec_id, c2),
         |ab AS (SELECT l.vec_id, l.cluster,
         |              max(CASE WHEN c2 = cluster THEN d END) AS a,
         |              min(CASE WHEN c2 <> cluster THEN d END) AS b
         |       FROM dt JOIN labeled l USING (vec_id)
         |       GROUP BY l.vec_id, l.cluster),
         |sil AS (SELECT cluster,
         |               CASE WHEN greatest(a, b) > CAST(0.0 AS DOUBLE)
         |                    THEN (b - a) / greatest(a, b)
         |                    ELSE CAST(0.0 AS DOUBLE) END AS sil, a, b
         |        FROM ab)
         |SELECT cluster, CAST(count(*) AS BIGINT) AS n,
         |       ${t6(s"${dsum12("sil")} / ${dd("count(*)")}")} AS mean_silhouette,
         |       ${t6(s"${dsum12("a")} / ${dd("count(*)")}")} AS mean_a,
         |       ${t6(s"${dsum12("b")} / ${dd("count(*)")}")} AS mean_b
         |FROM sil GROUP BY cluster ORDER BY cluster""".stripMargin
    },

    // q89 SemDeDup: the q77 clustering replay + within-cluster pairwise
    // cosine — an item is dropped iff some lower-id cluster-mate exceeds
    // the trunc6'd threshold (the one-pass, non-transitive rule)
    "q89_semantic_dedup" ->
      s"""${pqPipelineSqlFor(1, 8, 2, 256, withLut = false)},
         |labeled AS (
         |  SELECT c.vec_id, CAST(c.code AS BIGINT) AS cluster,
         |         CAST(e.embedding AS DOUBLE[]) AS emb
         |  FROM codes c JOIN embeddings e ON e.vec_id = c.vec_id),
         |dropped AS (
         |  SELECT DISTINCT b.vec_id FROM labeled a JOIN labeled b
         |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |  WHERE ${t6(cosine("a.emb", "b.emb"))} >= 0.5)
         |SELECT l.vec_id, l.cluster, d.vec_id IS NULL AS keep
         |FROM labeled l LEFT JOIN dropped d ON l.vec_id = d.vec_id
         |ORDER BY l.vec_id""".stripMargin,

    "q41_knn_lsh" -> {
      def bucket(e: String) = lshBucketSql(e)
      s"""SELECT id, score FROM (
         |  SELECT e.vec_id AS id,
         |         ${t6(cosine("CAST(e.embedding AS DOUBLE[])", "q.qv"))} AS score
         |  FROM embeddings e,
         |       (SELECT CAST(embedding AS DOUBLE[]) AS qv, ${bucket("embedding")} AS qbucket
         |        FROM embeddings WHERE vec_id = ${SparkEntry.KnnQueryId}) q
         |  WHERE ${bucket("e.embedding")} = q.qbucket
         |    AND e.vec_id != ${SparkEntry.KnnQueryId})
         |ORDER BY score DESC, id LIMIT 10""".stripMargin
    },

    // capped quadratic baseline (vec_id < 500 mirrors the Spark side)
    "q22_near_dup_vectors" ->
      s"""SELECT id_a, id_b, score FROM (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |         ${t6(cosine("CAST(a.embedding AS DOUBLE[])", "CAST(b.embedding AS DOUBLE[])"))} AS score
         |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |  WHERE a.vec_id < 500 AND b.vec_id < 500)
         |WHERE score >= 0.25 ORDER BY id_a, id_b""".stripMargin,

    // bucketed variant: candidates restricted to shared sign-LSH buckets
    "q49_near_dup_lsh" ->
      s"""WITH wb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         |                   ${lshBucketSql("embedding")} AS bucket
         |            FROM embeddings)
         |SELECT id_a, id_b, score FROM (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |         ${t6(cosine("a.e", "b.e"))} AS score
         |  FROM wb a JOIN wb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |WHERE score >= 0.25 ORDER BY id_a, id_b""".stripMargin,

    "q23_label_centroids" ->
      s"""SELECT CAST(label AS BIGINT) AS label, CAST(i - 1 AS BIGINT) AS pos,
         |  ${davg("CAST(v AS DOUBLE)")} AS centroid
         |FROM (SELECT label, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i
         |      FROM embeddings)
         |GROUP BY label, pos ORDER BY label, pos""".stripMargin,

    "q24_fusion_rrf" -> rrfSql(20),

    "q25_fusion_weighted" ->
      s"""SELECT id, ${t6(dsum12(s"score * ($weightCase)"))} AS fused_score
         |FROM ($unitedSql)
         |GROUP BY id ORDER BY fused_score DESC, id LIMIT 20""".stripMargin,

    "q26_fusion_normalized" ->
      s"""SELECT id, ${t6(dsum12(s"nscore * ($weightCase)"))} AS fused_score
         |FROM (SELECT *, CASE WHEN mx - mn = 0 THEN 1.0 ELSE (score - mn) / (mx - mn) END AS nscore
         |      FROM (SELECT *, min(score) OVER (PARTITION BY store_type) AS mn,
         |                   max(score) OVER (PARTITION BY store_type) AS mx
         |            FROM ($unitedSql)))
         |GROUP BY id ORDER BY fused_score DESC, id LIMIT 20""".stripMargin,

    // q65: weighted-sum fusion (q25's formula, LIMIT 40) with the K11
    // recency factor multiplied in — created_at is the deterministic
    // one-hour-per-doc_id fixture, "now" is the corpus max; float-op
    // order mirrors EventOps.boostedScore exactly
    "q65_fusion_boosted" -> {
      val us = s"(${SparkEntry.FreshBaseEpoch} + doc_id * 3600) * 1000000"
      val factor = s"1.0 + ${SparkEntry.FreshBoost} * greatest(0.0, " +
        s"1.0 - CAST(mx.max_us - ($us) AS DOUBLE) / 3.6e9 / 24.0)"
      s"""WITH fused AS (
         |  SELECT id, ${t6(dsum12(s"score * ($weightCase)"))} AS fused_score
         |  FROM ($unitedSql)
         |  GROUP BY id ORDER BY fused_score DESC, id LIMIT 40)
         |SELECT id, ${t6(s"fused_score * ($factor)")} AS boosted_score, lang, source
         |FROM fused
         |JOIN documents ON fused.id = documents.doc_id
         |CROSS JOIN (SELECT (${SparkEntry.FreshBaseEpoch} + max(doc_id) * 3600) * 1000000 AS max_us
         |            FROM documents) mx
         |ORDER BY boosted_score DESC, id""".stripMargin
    },

    "q27_hybrid_query" ->
      s"""SELECT id, fused_score, lang, source, substr(text, 1, 80) AS preview
         |FROM (${rrfSql(15)}) f JOIN documents ON f.id = documents.doc_id
         |ORDER BY fused_score DESC, id""".stripMargin,

    // q66: corpus-trained unigram negative log-likelihood per doc; the
    // decimal-widened average keeps the float sum order-independent
    "q66_unigram_nll" ->
      s"""WITH tk AS (SELECT doc_id, unnest(${toks("text")}) AS term FROM documents),
         |counts AS (SELECT term, count(*) AS cnt FROM tk GROUP BY term),
         |tot AS (SELECT SUM(cnt) AS n_total FROM counts)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  ${t6(davg("-ln(CAST(cnt AS DOUBLE) / CAST(n_total AS DOUBLE))"))} AS avg_nll
         |FROM tk JOIN counts USING (term) CROSS JOIN tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q85: interpolated bigram NLL — the (prev, term) expansion as a
    // struct list, the same two vocab joins, and the λ-mix spelled with
    // CAST(... AS DOUBLE) literals so both engines mix the SAME doubles
    // (DuckDB's bare 0.2 is a DECIMAL whose double cast differs from
    // Spark's 1.0 − 0.8 in the last ulp)
    "q85_bigram_nll" ->
      s"""WITH pos AS (
         |  SELECT doc_id, p.term AS term, p.prev AS prev FROM (
         |    SELECT doc_id, unnest(list_transform(generate_series(1, len(t)),
         |           i -> struct_pack(term := t[i],
         |                prev := CASE WHEN i = 1 THEN NULL ELSE t[i - 1] END))) AS p
         |    FROM (SELECT doc_id, ${toks("text")} AS t FROM documents))),
         |uni AS (SELECT term, count(*) AS u_cnt FROM pos GROUP BY term),
         |tot AS (SELECT SUM(u_cnt) AS n_total FROM uni),
         |bi AS (SELECT prev, term, count(*) AS b_cnt FROM pos
         |       WHERE prev IS NOT NULL GROUP BY prev, term)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  ${t6(davg(
             "-ln(CASE WHEN prev IS NULL " +
               "THEN CAST(u_cnt AS DOUBLE) / CAST(n_total AS DOUBLE) " +
               "ELSE CAST(0.8 AS DOUBLE) * (CAST(coalesce(b_cnt, 0) AS DOUBLE) / CAST(p_cnt AS DOUBLE)) " +
               "+ (CAST(1.0 AS DOUBLE) - CAST(0.8 AS DOUBLE)) * (CAST(u_cnt AS DOUBLE) / CAST(n_total AS DOUBLE)) END)"))} AS avg_nll
         |FROM pos
         |LEFT JOIN bi USING (prev, term)
         |JOIN uni USING (term)
         |LEFT JOIN (SELECT term AS prev, u_cnt AS p_cnt FROM uni) up USING (prev)
         |CROSS JOIN tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q67: per-doc top-3 terms by tf·ln(N/df) — the window twin of the
    // Spark side's bounded-heap TopKPerKey cut
    "q67_tfidf_keywords" ->
      s"""WITH tk AS (SELECT doc_id, unnest(${toks("text")}) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY doc_id, term),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT doc_id, term AS keyword,
         |    ${t6("CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))")} AS score
         |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
         |SELECT doc_id, keyword, score, rank FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY score DESC, keyword) AS rank
         |  FROM scored)
         |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // q68: the windowed cumsum twin of the two-phase prefix-sum sharding
    // (shard = floor(start_offset / target); start = cum − own tokens)
    "q68_token_shards" ->
      """SELECT doc_id, n_tokens,
        |  CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 20000.0) AS BIGINT) AS shard
        |FROM (
        |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        |         SUM(len(string_split(text, ' '))) OVER (ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // q86: the same windowed cumsum gives every doc's global token START;
    // each doc expands to the blocks it overlaps (integer // division),
    // per-block token spans summed. The window twin of the Spark side's
    // two-phase prefix sum + row-local block expansion.
    "q86_block_pack" ->
      """SELECT block_id, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(toks) AS BIGINT) AS n_tokens,
        |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM (
        |  SELECT doc_id, block_id,
        |         least(start + n_tokens, (block_id + 1) * 2048)
        |           - greatest(start, block_id * 2048) AS toks
        |  FROM (
        |    SELECT doc_id, n_tokens, start,
        |           unnest(generate_series(start // 2048,
        |                  (start + n_tokens - 1) // 2048)) AS block_id
        |    FROM (
        |      SELECT doc_id, n_tokens, CAST(cum - n_tokens AS BIGINT) AS start FROM (
        |        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        |               SUM(len(string_split(text, ' '))) OVER (ORDER BY doc_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |        FROM documents))))
        |GROUP BY block_id ORDER BY block_id""".stripMargin,

    // q87: q86 after the seeded md5 shuffle — the window's ORDER BY is
    // the same engine-portable 52-bit md5 key (doc_id breaks ties)
    "q87_block_pack_shuffled" ->
      s"""SELECT block_id, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(toks) AS BIGINT) AS n_tokens,
         |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM (
         |  SELECT doc_id, block_id,
         |         least(start + n_tokens, (block_id + 1) * 1024)
         |           - greatest(start, block_id * 1024) AS toks
         |  FROM (
         |    SELECT doc_id, n_tokens, start,
         |           unnest(generate_series(start // 1024,
         |                  (start + n_tokens - 1) // 1024)) AS block_id
         |    FROM (
         |      SELECT doc_id, n_tokens, CAST(cum - n_tokens AS BIGINT) AS start FROM (
         |        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
         |               SUM(len(string_split(text, ' '))) OVER (
         |                 ORDER BY ${md5Long("concat('epoch0|', CAST(doc_id AS VARCHAR))")}, doc_id
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |        FROM documents))))
         |GROUP BY block_id ORDER BY block_id""".stripMargin,

    // q72: the HLL sketch replayed exactly — same md5 slices, the same
    // generated trailing-zeros CASE chain, the same exact-integer
    // harmonic sum (every 2^(53−ρ) term is a BIGINT), the same α·m²
    // constant and linear-counting branch
    // q98: per-label centroid cosine — decimal-widened per-dim means
    // (the Lloyd-mean arithmetic), then the same guarded cosine
    "q98_centroid_outliers" ->
      s"""WITH ex AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |pos AS (SELECT label, unnest(list_transform(generate_series(1, len(e)),
         |               i -> struct_pack(d := i, v := e[i]))) AS p FROM ex),
         |cent AS (SELECT label, p.d AS d, ${davg("p.v")} AS c FROM pos GROUP BY label, p.d),
         |ca AS (SELECT label, list(c ORDER BY d) AS cv FROM cent GROUP BY label)
         |SELECT vec_id, CAST(label AS BIGINT) AS label,
         |       ${t6(cosine("e", "cv"))} AS centroid_sim
         |FROM ex JOIN ca USING (label)
         |ORDER BY vec_id""".stripMargin,

    // q99: PageRank over the symmetrized q31 near-dup pair graph — 5
    // unrolled iterations, the (1−d) subtraction and every division
    // spelled in DOUBLE, per-vertex contribution sums decimal-widened
    "q99_pagerank" -> {
      val corpus =
        s"""SELECT doc_id, text FROM ($nearDupCorpus)
           |WHERE doc_id < 100 OR (doc_id >= 10000 AND doc_id < 10100)""".stripMargin
      val iters = (1 to 5).map { i =>
        s"""r$i AS (
           |  SELECT v, (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n_v
           |            + CAST(0.85 AS DOUBLE) * s AS rank
           |  FROM (SELECT ed.dst AS v, ${dsum12("r.rank / ed.outdeg")} AS s
           |        FROM ed JOIN r${i - 1} r ON r.v = ed.src
           |        GROUP BY ed.dst) CROSS JOIN nv)""".stripMargin
      }.mkString(",\n")
      s"""${shinglesSql(corpus)},
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY doc_a, doc_b),
         |pairs AS (SELECT doc_a, doc_b FROM (
         |  SELECT doc_a, doc_b, ${t6("CAST(ni AS DOUBLE) / (ca.n + cb.n - ni)")} AS jaccard
         |  FROM inter JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b)
         |  WHERE jaccard >= 0.5),
         |ed0 AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |        UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |deg AS (SELECT src, count(*) AS outdeg FROM ed0 GROUP BY src),
         |nv AS (SELECT count(*) AS n_v FROM deg),
         |ed AS (SELECT ed0.src, ed0.dst, deg.outdeg FROM ed0 JOIN deg USING (src)),
         |r0 AS (SELECT src AS v, CAST(1.0 AS DOUBLE) / n_v AS rank FROM deg CROSS JOIN nv),
         |$iters
         |SELECT v AS doc_id, ${t6("rank")} AS rank FROM r5 ORDER BY doc_id""".stripMargin
    },

    // q100: Efraimidis–Spirakis weighted sample — the ln(u)/w key with
    // every division pinned to DOUBLE (a bare decimal literal would
    // divide in DECIMAL)
    "q100_weighted_sample" ->
      s"""SELECT doc_id, sample_key FROM (
         |  SELECT doc_id, ${t6(
             s"ln(CAST(${md5Long("concat('ws0|', CAST(doc_id AS VARCHAR))")} + 1 AS DOUBLE) " +
               "/ CAST(4503599627370497.0 AS DOUBLE)) / CAST(n_chars AS DOUBLE)")} AS sample_key
         |  FROM documents WHERE n_chars > 0)
         |ORDER BY sample_key DESC, doc_id LIMIT 50""".stripMargin,

    // q101: ROLLUP pricing report — subtotal rows carry NULL keys, so
    // the ordering pins NULLS FIRST to match Spark's asc_nulls_first
    "q101_rollup_report" ->
      s"""SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
         |       ${xsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    // q102: per-nation spend quartiles via ntile(4), total tie-break
    "q102_spend_quartiles" ->
      s"""WITH spend AS (
         |  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
         |         ${xsum("o_totalprice")} AS spend
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1, 2)
         |SELECT c_custkey, c_nationkey, spend,
         |       CAST(ntile(4) OVER (PARTITION BY c_nationkey
         |            ORDER BY spend DESC, c_custkey) AS BIGINT) AS quartile
         |FROM spend ORDER BY c_custkey""".stripMargin,

    // q103: exact Pearson correlation — the moment formula over the
    // same decimal-widened sums, every factor CAST-pinned to DOUBLE
    "q103_price_correlation" ->
      s"""SELECT l_returnflag, n, ${t6(
           "(CAST(n AS DOUBLE) * sxy - sx * sy) / " +
             "(sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) * " +
             "sqrt(CAST(n AS DOUBLE) * syy - sy * sy))")} AS corr_qty_price
         |FROM (
         |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         |         ${psum6("l_quantity * l_extendedprice")} AS sxy,
         |         ${xsum("l_quantity")} AS sx, ${xsum("l_extendedprice")} AS sy,
         |         ${psum6("l_quantity * l_quantity")} AS sxx,
         |         ${psum6("l_extendedprice * l_extendedprice")} AS syy
         |  FROM lineitem GROUP BY l_returnflag)
         |ORDER BY l_returnflag""".stripMargin,

    // q104: fixed-width value histogram — floor of a pinned double
    // division bins row-locally
    "q104_value_histogram" ->
      s"""SELECT CAST(floor(value / CAST(50.0 AS DOUBLE)) AS BIGINT) AS bin,
         |       CAST(count(*) AS BIGINT) AS n, ${xsum("value")} AS bin_sum
         |FROM events GROUP BY bin ORDER BY bin""".stripMargin,

    // q105: trailing-7-day distinct actives; the oracle's band join is
    // value-equivalent to the engine's row-local fan-out
    "q105_rolling_actives" ->
      s"""WITH grid AS (
         |  SELECT DISTINCT user_id, CAST($tsUs // 86400000000 AS BIGINT) AS day
         |  FROM events),
         |days AS (SELECT DISTINCT day FROM grid)
         |SELECT d.day AS obs_day,
         |       CAST(count(DISTINCT g.user_id) AS BIGINT) AS n_users
         |FROM days d JOIN grid g ON g.day BETWEEN d.day - 6 AND d.day
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q106: signature-agreement Jaccard estimate over q29's banded
    // candidates — same md5 hash family, Ĵ = agreeing positions / 8
    "q106_minhash_estimate" -> {
      val sigCols = (0 until 8).map { i =>
        s"list_min(list_transform(m${i / 4}, m -> CAST(concat('0x', substr(m, ${(i % 4) * 8 + 1}, 8)) AS BIGINT))) AS mh$i"
      }.mkString(",\n         ")
      val bandRowsSql = (0 until 4).map { b =>
        s"SELECT doc_id, $b AS band, concat_ws('|', mh${b * 2}, mh${b * 2 + 1}) AS bkey FROM sig"
      }.mkString("\n  UNION ALL ")
      val matchSum = (0 until 8)
        .map(i => s"CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH corpus AS ($nearDupCorpus),
         |sharr AS (SELECT doc_id,
         |    list_distinct(list_transform(generate_series(1, len(${toks("text")}) - 2),
         |        i -> array_to_string(${toks("text")}[i:i+2], ' '))) AS shingles
         |  FROM corpus WHERE len(${toks("text")}) >= 3),
         |shm AS (SELECT doc_id, shingles,
         |         list_transform(shingles, s -> md5(concat('mh0|', s))) AS m0,
         |         list_transform(shingles, s -> md5(concat('mh1|', s))) AS m1 FROM sharr),
         |sig AS (SELECT doc_id, $sigCols FROM shm),
         |bands AS ($bandRowsSql),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |         FROM bands x JOIN bands y
         |           ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b, ${t6(s"CAST($matchSum AS DOUBLE) / 8")} AS est_jaccard
         |FROM cand JOIN sig a ON a.doc_id = doc_a JOIN sig b ON b.doc_id = doc_b
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    // q107: multinomial Naive Bayes — priors + per-class hashed-token
    // counts (+1/+B smoothed), decimal-widened log-likelihood sums,
    // argmax by (score DESC, cls); every division CAST-pinned
    "q107_naive_bayes" -> naiveBayesSql,

    // q150: the q107 classifier's confusion matrix against the labels
    // it trained on — the audit every classifier-gated pipeline owes
    "q150_lang_confusion" ->
      s"""SELECT d.lang AS actual, p.pred_lang AS predicted,
         |       CAST(count(*) AS BIGINT) AS n
         |FROM ($naiveBayesSql) p JOIN documents d USING (doc_id)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q149: the HTML strip chain, replayed with RE2-portable patterns
    "q149_html_extract" -> {
      val html =
        """concat('<html><head><title>Doc ', CAST(doc_id AS VARCHAR),
          |  '</title><style>p{margin:0}</style></head><body>',
          |  '<nav>home | about | <a href="/x">links</a></nav>',
          |  '<p>intro &amp; &quot;quoted&quot;</p><p>', text,
          |  '</p><footer>site footer junk</footer></body></html>')"""
          .stripMargin.replace("\n", " ")
      val noScript =
        s"regexp_replace($html, '(?s)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g')"
      val noChrome =
        s"regexp_replace($noScript, '(?s)<(header|head|nav|footer)[^>]*>.*?</(header|head|nav|footer)>', ' ', 'g')"
      val noTags = s"regexp_replace($noChrome, '<[^>]*>', ' ', 'g')"
      val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "''", "&amp;" -> "&")
        .foldLeft(noTags) { case (acc, (ent, ch)) =>
          s"regexp_replace($acc, '$ent', '$ch', 'g')"
        }
      s"""SELECT doc_id, extracted,
         |       CAST(length(extracted) AS BIGINT) AS extracted_len
         |FROM (SELECT doc_id,
         |        trim(regexp_replace($decoded, '\\s+', ' ', 'g')) AS extracted
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin
    },

    // q108: LR epoch-0 gradient — Σ(0.5 − y)·x / n per hashed bucket,
    // label and constants CAST-pinned to DOUBLE (bare 1.0 is DECIMAL)
    "q108_lr_grad_stats" ->
      s"""WITH tk AS (
         |  SELECT doc_id, ${md5Long("concat('lr|', term)")} % 256 AS bucket
         |  FROM (SELECT doc_id, unnest(${toks("text")}) AS term FROM documents)),
         |feat AS (SELECT doc_id, bucket, count(*) AS cnt FROM tk GROUP BY 1, 2),
         |lab AS (SELECT doc_id, CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE)
         |                            ELSE CAST(0.0 AS DOUBLE) END AS y FROM documents),
         |n AS (SELECT count(*) AS n_docs FROM documents)
         |SELECT bucket, ${t6(dsum12("(CAST(0.5 AS DOUBLE) - y) * cnt") + " / n_docs")} AS grad
         |FROM feat JOIN lab USING (doc_id) CROSS JOIN n
         |GROUP BY bucket, n_docs ORDER BY bucket""".stripMargin,

    // q109: deterministic label propagation — 3 unrolled rounds of the
    // (count DESC, label) argmax over the q99 edge CTEs
    "q109_label_propagation" -> {
      val corpus =
        s"""SELECT doc_id, text FROM ($nearDupCorpus)
           |WHERE doc_id < 100 OR (doc_id >= 10000 AND doc_id < 10100)""".stripMargin
      val rounds = (1 to 3).map { i =>
        s"""l$i AS (
           |  SELECT v, label FROM (
           |    SELECT ed.dst AS v, l.label, count(*) AS n,
           |           row_number() OVER (PARTITION BY ed.dst
           |             ORDER BY count(*) DESC, l.label) AS rn
           |    FROM ed0 ed JOIN l${i - 1} l ON l.v = ed.src
           |    GROUP BY ed.dst, l.label)
           |  WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""${shinglesSql(corpus)},
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY doc_a, doc_b),
         |pairs AS (SELECT doc_a, doc_b FROM (
         |  SELECT doc_a, doc_b, ${t6("CAST(ni AS DOUBLE) / (ca.n + cb.n - ni)")} AS jaccard
         |  FROM inter JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b)
         |  WHERE jaccard >= 0.5),
         |ed0 AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |        UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |l0 AS (SELECT DISTINCT src AS v, src AS label FROM ed0),
         |$rounds
         |SELECT v AS doc_id, label FROM l3 ORDER BY doc_id""".stripMargin
    },

    // q110: triangle count — canonical a<b edges, ordered wedges closed
    // against the edge set; each triangle counted once at its low vertex
    "q110_triangle_count" -> {
      val corpus =
        s"""SELECT doc_id, text FROM ($nearDupCorpus)
           |WHERE doc_id < 100 OR (doc_id >= 10000 AND doc_id < 10100)""".stripMargin
      s"""${shinglesSql(corpus)},
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY doc_a, doc_b),
         |pairs AS (SELECT doc_a, doc_b FROM (
         |  SELECT doc_a, doc_b, ${t6("CAST(ni AS DOUBLE) / (ca.n + cb.n - ni)")} AS jaccard
         |  FROM inter JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b)
         |  WHERE jaccard >= 0.5),
         |ce AS (SELECT DISTINCT least(doc_a, doc_b) AS a, greatest(doc_a, doc_b) AS b
         |       FROM pairs WHERE doc_a != doc_b),
         |w AS (SELECT e1.b AS a, e2.b AS b FROM ce e1
         |      JOIN ce e2 ON e1.a = e2.a AND e1.b < e2.b)
         |SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM w JOIN ce USING (a, b)""".stripMargin
    },

    // q111: the oracle states the PLANTED image sizes; the Spark side
    // must recover them by parsing the synthesized PNG/JPEG/GIF bytes
    "q111_image_dims" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END AS format,
        |  CAST(100 + doc_id % 900 AS BIGINT) AS width,
        |  CAST(50 + doc_id % 500 AS BIGINT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q112: planted WAV metadata recovered by parsing the RIFF bytes
    "q112_audio_meta" ->
      """SELECT doc_id,
        |  CAST(1 + doc_id % 2 AS BIGINT) AS channels,
        |  CAST(8000 * (1 + doc_id % 3) AS BIGINT) AS sample_rate,
        |  CAST(1 + doc_id % 1000 AS BIGINT) AS n_samples
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q113: planted MP4 mvhd timescale/duration recovered by box scan
    "q113_video_meta" ->
      """SELECT doc_id,
        |  CAST(1000 * (1 + doc_id % 3) AS BIGINT) AS timescale,
        |  CAST(1 + doc_id % 100000 AS BIGINT) AS duration
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q94: cohort retention triangle — integer epoch-day division on
    // both sides (`div` / `//`), so no date/tz semantics are in play
    "q94_retention_cohorts" ->
      s"""WITH act AS (
         |  SELECT DISTINCT user_id, CAST($tsUs // 86400000000 AS BIGINT) AS day
         |  FROM events),
         |coh AS (SELECT user_id, min(day) AS cohort_day FROM act GROUP BY user_id)
         |SELECT cohort_day, day - cohort_day AS day_offset,
         |       CAST(count(*) AS BIGINT) AS n_users
         |FROM act JOIN coh USING (user_id)
         |GROUP BY cohort_day, day_offset
         |ORDER BY cohort_day, day_offset""".stripMargin,

    // q95: count–min sketch replayed — the same salted-md5 bucket per
    // (depth, term) builds the counter table and probes it; est is the
    // min over the 4 depth rows, an upper bound on the exact count
    "q95_cms_heavy_hitters" -> {
      val bucket = (t: String) =>
        s"${md5Long(s"concat('cms', d.depth, '|', $t)")} % 256"
      s"""WITH tk AS (SELECT unnest(${toks("text")}) AS term FROM documents),
         |dep AS (SELECT unnest([0, 1, 2, 3]) AS depth),
         |ex AS (SELECT term, count(*) AS cnt FROM tk GROUP BY term),
         |top AS (SELECT term, cnt FROM ex ORDER BY cnt DESC, term LIMIT 20),
         |sk AS (
         |  SELECT d.depth, ${bucket("term")} AS bucket, count(*) AS c
         |  FROM tk CROSS JOIN dep d GROUP BY 1, 2),
         |pe AS (
         |  SELECT t.term, t.cnt, d.depth, ${bucket("t.term")} AS bucket
         |  FROM top t CROSS JOIN dep d)
         |SELECT term, cnt, min(coalesce(c, 0)) AS est
         |FROM pe LEFT JOIN sk USING (depth, bucket)
         |GROUP BY term, cnt
         |ORDER BY cnt DESC, term""".stripMargin
    },

    // q96: DSIR — hashed-unigram (+1/+B smoothed) log importance ratio
    // of every non-target doc toward the en target slice
    "q96_dsir_weights" -> {
      val b = 4096
      s"""WITH tk AS (
         |  SELECT doc_id, is_target,
         |         ${md5Long("concat('dsir|', term)")} % $b AS bucket
         |  FROM (SELECT doc_id, (lang = 'en') AS is_target,
         |               unnest(${toks("text")}) AS term FROM documents)),
         |tc AS (SELECT bucket, count(*) AS t_cnt FROM tk WHERE is_target GROUP BY bucket),
         |tt AS (SELECT SUM(t_cnt) AS t_total FROM tc),
         |rc AS (SELECT bucket, count(*) AS r_cnt FROM tk WHERE NOT is_target GROUP BY bucket),
         |rt AS (SELECT SUM(r_cnt) AS r_total FROM rc)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  ${t6(davg(
             s"ln(CAST(coalesce(t_cnt, 0) + 1 AS DOUBLE) / CAST(t_total + $b AS DOUBLE)) " +
               s"- ln(CAST(coalesce(r_cnt, 0) + 1 AS DOUBLE) / CAST(r_total + $b AS DOUBLE))"))} AS avg_log_ratio
         |FROM tk LEFT JOIN tc USING (bucket) LEFT JOIN rc USING (bucket)
         |     CROSS JOIN tt CROSS JOIN rt
         |WHERE NOT is_target
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    // q97: 8-bit scalar quantization — per-dim min/max training, the
    // encode→reconstruct round trip, and the reconstructed-vs-full-
    // precision cosine ranking, all replayed (the lossy ranking itself
    // must hash-match, like q70/q80)
    "q97_sq8_knn" ->
      s"""WITH ex AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |pos AS (SELECT unnest(list_transform(generate_series(1, len(e)),
         |               i -> struct_pack(d := i, v := e[i]))) AS p FROM ex),
         |st AS (SELECT p.d AS d, min(p.v) AS mn, max(p.v) AS mx FROM pos GROUP BY 1),
         |sa AS (SELECT list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs FROM st),
         |rec AS (SELECT vec_id, list_transform(generate_series(1, len(e)), i ->
         |    CASE WHEN mxs[i] = mns[i] THEN mns[i]
         |         ELSE mns[i] + floor((e[i] - mns[i]) / (mxs[i] - mns[i]) * 255.0 + 0.5)
         |              / 255.0 * (mxs[i] - mns[i]) END) AS r
         |  FROM ex CROSS JOIN sa),
         |q AS (SELECT e AS qv FROM ex WHERE vec_id = 7)
         |SELECT vec_id AS id, ${t6(cosine("r", "qv"))} AS score
         |FROM rec CROSS JOIN q
         |WHERE vec_id != 7
         |ORDER BY score DESC, id LIMIT 10""".stripMargin,

    "q72_hll_distinct" -> hllLangSql,

    // q152: sketch-accuracy audit — HLL estimate vs the exact distinct,
    // relative error pinned to the 6-decimal grid
    "q152_hll_error_audit" ->
      s"""SELECT h.lang, e.exact_distinct, h.est_distinct,
         |       ${t6("abs(h.est_distinct - CAST(e.exact_distinct AS DOUBLE)) / CAST(e.exact_distinct AS DOUBLE)")} AS rel_error
         |FROM ($hllLangSql) h
         |JOIN (SELECT lang, CAST(count(DISTINCT text) AS BIGINT) AS exact_distinct
         |      FROM documents GROUP BY 1) e USING (lang)
         |ORDER BY lang""".stripMargin,

    "q28_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM (SELECT doc_id, text FROM documents
        |      UNION ALL SELECT doc_id + 10000, text FROM documents)
        |GROUP BY md5(text) ORDER BY keep_id""".stripMargin,

    // q75: sequence packing — the windowed-cumsum twin of the two-phase
    // prefix-sum shard assignment (q68's formula), packs reassembled
    // with an ordered string_agg
    "q75_pack_sequences" ->
      """SELECT seq_id, n_docs,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, text
        |FROM (
        |  SELECT seq_id, count(*) AS n_docs,
        |         string_agg(text, ' ' ORDER BY doc_id) AS text
        |  FROM (
        |    SELECT doc_id, text,
        |      CAST(floor(CAST(cum - n AS DOUBLE) / 2048.0) AS BIGINT) AS seq_id
        |    FROM (
        |      SELECT doc_id, text, len(string_split(text, ' ')) AS n,
        |             SUM(len(string_split(text, ' '))) OVER (ORDER BY doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM documents))
        |  GROUP BY seq_id)
        |ORDER BY seq_id""".stripMargin,

    // q76: temperature mixing — rate_i = trunc6(n_i^(α−1) / max_j) and
    // the same md5-threshold predicate as q53 (salt prefix 'mix|');
    // α−1 is embedded at full double precision so both engines raise
    // to the identical exponent
    "q76_temperature_mix" -> {
      val exp = (0.7 - 1.0).toString
      s"""WITH counts AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n
         |                FROM documents GROUP BY lang),
         |w AS (SELECT lang, power(n, $exp) AS w FROM counts),
         |rates AS (SELECT lang, ${t6("w / (SELECT max(w) FROM w)")} AS rate FROM w)
         |SELECT doc_id, lang, rate
         |FROM documents JOIN rates USING (lang)
         |WHERE CAST(${md5Long("concat('mix|', CAST(doc_id AS VARCHAR))")} % 1000000 AS DOUBLE)
         |      < rate * 1000000e0
         |ORDER BY doc_id""".stripMargin
    },

    // q73: the explicit percentile_cont replay — integer rank picks, one
    // shared interpolation formula (the builtin quantile_cont would land
    // ulps off the Spark builtin exactly on the trunc6 grid)
    "q73_length_quantiles" -> {
      val ps = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
      val pickCols = ps.map { case (name, p) =>
        s"""min(CASE WHEN rank = floor($p * (cnt - 1)) + 1 THEN v END) AS lo_$name,
           |   min(CASE WHEN rank = least(floor($p * (cnt - 1)) + 2, cnt) THEN v END) AS hi_$name""".stripMargin
      }.mkString(",\n   ")
      val outCols = ps.map { case (name, p) =>
        t6(s"lo_$name + ($p * (cnt - 1) - floor($p * (cnt - 1))) * (hi_$name - lo_$name)") +
          s" AS $name"
      }.mkString(",\n  ")
      s"""WITH tok AS (SELECT lang, CAST(len(string_split(text, ' ')) AS DOUBLE) AS v
         |             FROM documents),
         |ranked AS (SELECT lang, v, row_number() OVER (
         |             PARTITION BY lang ORDER BY v) AS rank FROM tok),
         |counts AS (SELECT lang, count(*) AS cnt FROM tok GROUP BY lang),
         |j AS (SELECT ranked.lang, v, rank, cnt FROM ranked JOIN counts USING (lang)),
         |ag AS (SELECT lang, max(cnt) AS cnt,
         |   $pickCols
         |   FROM j GROUP BY lang)
         |SELECT lang,
         |  $outCols
         |FROM ag ORDER BY lang""".stripMargin
    },

    // q69: passage dedup + reassembly — the window twin of the Spark
    // side's heap-k=1 first-occurrence cut (passage = 20-token window;
    // DuckDB list slice is 1-based end-inclusive and caps at the end)
    "q69_paragraph_dedup" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents
        |                UNION ALL SELECT doc_id + 10000, text FROM documents),
        |tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus),
        |p AS (SELECT doc_id, toks,
        |        unnest(generate_series(0, (len(toks) - 1) // 20)) AS pos
        |      FROM tk),
        |paras AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        |        array_to_string(toks[(pos * 20 + 1):(pos * 20 + 20)], ' ') AS para
        |      FROM p),
        |keep AS (SELECT doc_id, pos, para, row_number() OVER (
        |          PARTITION BY md5(para) ORDER BY doc_id, pos) AS rn
        |      FROM paras),
        |tot AS (SELECT doc_id,
        |          CAST((len(toks) - 1) // 20 + 1 AS BIGINT) AS n_paras FROM tk),
        |reb AS (SELECT doc_id, count(*) AS n_kept,
        |          string_agg(para, ' ' ORDER BY pos) AS new_text
        |      FROM keep WHERE rn = 1 GROUP BY doc_id)
        |SELECT t.doc_id, t.n_paras,
        |       coalesce(r.n_kept, 0) AS n_kept,
        |       coalesce(r.new_text, '') AS new_text
        |FROM tot t LEFT JOIN reb r USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q29_minhash_lsh" -> {
      val sigCols = (0 until 8).map { i =>
        s"list_min(list_transform(m${i / 4}, m -> CAST(concat('0x', substr(m, ${(i % 4) * 8 + 1}, 8)) AS BIGINT))) AS mh$i"
      }.mkString(",\n         ")
      val bandRows = (0 until 4).map { b =>
        s"SELECT doc_id, $b AS band, concat_ws('|', mh${b * 2}, mh${b * 2 + 1}) AS bkey FROM sig"
      }.mkString("\n  UNION ALL ")
      s"""WITH corpus AS ($nearDupCorpus),
         |sharr AS (SELECT doc_id,
         |    list_distinct(list_transform(generate_series(1, len(${toks("text")}) - 2),
         |        i -> array_to_string(${toks("text")}[i:i+2], ' '))) AS shingles
         |  FROM corpus WHERE len(${toks("text")}) >= 3),
         |shm AS (SELECT doc_id, shingles,
         |         list_transform(shingles, s -> md5(concat('mh0|', s))) AS m0,
         |         list_transform(shingles, s -> md5(concat('mh1|', s))) AS m1 FROM sharr),
         |sig AS (SELECT doc_id, $sigCols FROM shm),
         |bands AS ($bandRows),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |         FROM bands x JOIN bands y
         |           ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b, jaccard FROM (
         |  SELECT doc_a, doc_b,
         |    ${t6("CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles)))")} AS jaccard
         |  FROM cand JOIN sharr a ON a.doc_id = doc_a JOIN sharr b ON b.doc_id = doc_b)
         |WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin
    },

    // q331: LSH banding sweep — one 8-function md5 signature matrix
    // (q29's family), every (bands, rows) split mined for candidate
    // pairs, scored against exact all-pairs Jaccard truth on the
    // bounded audit slice (first 100 docs + their near-dups)
    "q331_lsh_banding_sweep" -> {
      val sigCols = (0 until 8).map { i =>
        s"list_min(list_transform(m${i / 4}, m -> CAST(concat('0x', substr(m, ${(i % 4) * 8 + 1}, 8)) AS BIGINT))) AS mh$i"
      }.mkString(",\n         ")
      def candFor(nb: Int) = {
        val r = 8 / nb
        val bandSel = (0 until nb).map { b =>
          val cols = (0 until r).map(j => s"mh${b * r + j}").mkString(", ")
          s"SELECT doc_id, $b AS band, concat_ws('|', $cols) AS bkey FROM sig"
        }.mkString("\n  UNION ALL ")
        s"""cand$nb AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
           |  FROM ($bandSel) x JOIN ($bandSel) y
           |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)""".stripMargin
      }
      def comboRow(nb: Int) =
        s"""SELECT CAST($nb AS BIGINT) AS bands, CAST(${8 / nb} AS BIGINT) AS rows_per_band,
           |  (SELECT CAST(count(*) AS BIGINT) FROM cand$nb) AS n_candidates,
           |  (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true,
           |  (SELECT CAST(count(*) AS BIGINT) FROM cand$nb c
           |     JOIN truth t ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b) AS n_hit""".stripMargin
      val jac = t6("CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) " +
        "/ (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles)))")
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 100
         |  UNION ALL
         |  SELECT doc_id + 10000, substr(text, strpos(text, ' ') + 1)
         |  FROM documents WHERE doc_id < 100),
         |sharr AS (SELECT doc_id,
         |    list_distinct(list_transform(generate_series(1, len(${toks("text")}) - 2),
         |        i -> array_to_string(${toks("text")}[i:i+2], ' '))) AS shingles
         |  FROM corpus WHERE len(${toks("text")}) >= 3),
         |shm AS (SELECT doc_id, shingles,
         |         list_transform(shingles, s -> md5(concat('mh0|', s))) AS m0,
         |         list_transform(shingles, s -> md5(concat('mh1|', s))) AS m1 FROM sharr),
         |sig AS (SELECT doc_id, $sigCols FROM shm),
         |truth AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sharr a JOIN sharr b ON a.doc_id < b.doc_id
         |  WHERE $jac >= 0.5),
         |${Seq(1, 2, 4, 8).map(candFor).mkString(",\n")}
         |SELECT bands, rows_per_band, n_candidates, n_true, n_hit,
         |  CASE WHEN n_true = 0 THEN 0.0
         |       ELSE ${t6("CAST(n_hit AS DOUBLE) / n_true")} END AS recall
         |FROM (${Seq(1, 2, 4, 8).map(comboRow).mkString("\n  UNION ALL\n")})
         |ORDER BY bands""".stripMargin
    },

    // q74: incremental dedup — exact hash join, then NEW-vs-CORPUS band
    // candidates only (same minhash machinery as q29, two corpora);
    // best match = highest trunc6'd Jaccard, ties to smallest corpus id
    "q74_incremental_dedup" -> {
      val sigCols = (0 until 8).map { i =>
        s"list_min(list_transform(m${i / 4}, m -> CAST(concat('0x', substr(m, ${(i % 4) * 8 + 1}, 8)) AS BIGINT))) AS mh$i"
      }.mkString(",\n         ")
      def bandSel(src: String) = (0 until 4).map { b =>
        s"SELECT doc_id, $b AS band, concat_ws('|', mh${b * 2}, mh${b * 2 + 1}) AS bkey FROM $src"
      }.mkString("\n  UNION ALL ")
      def sigChain(tag: String, src: String) =
        s"""sharr$tag AS (SELECT doc_id,
           |    list_distinct(list_transform(generate_series(1, len(${toks("text")}) - 2),
           |        i -> array_to_string(${toks("text")}[i:i+2], ' '))) AS shingles
           |  FROM $src WHERE len(${toks("text")}) >= 3),
           |shm$tag AS (SELECT doc_id, shingles,
           |         list_transform(shingles, s -> md5(concat('mh0|', s))) AS m0,
           |         list_transform(shingles, s -> md5(concat('mh1|', s))) AS m1 FROM sharr$tag),
           |sig$tag AS (SELECT doc_id, $sigCols FROM shm$tag),
           |bands$tag AS (${bandSel(s"sig$tag")})""".stripMargin
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
         |batch AS (
         |  SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id < 50
         |  UNION ALL
         |  SELECT doc_id + 20000, substr(text, strpos(text, ' ') + 1)
         |  FROM documents WHERE doc_id >= 50 AND doc_id < 100
         |  UNION ALL
         |  SELECT doc_id + 30000, text FROM documents WHERE doc_id >= 300 AND doc_id < 400),
         |exact AS (
         |  SELECT b.doc_id, 'exact_dup' AS status, min(c.doc_id) AS match_id,
         |         1.0 AS jaccard
         |  FROM batch b JOIN corpus c ON md5(b.text) = md5(c.text)
         |  GROUP BY b.doc_id),
         |rest AS (SELECT doc_id, text FROM batch
         |         WHERE doc_id NOT IN (SELECT doc_id FROM exact)),
         |${sigChain("N", "rest")},
         |${sigChain("O", "corpus")},
         |cand AS (SELECT DISTINCT x.doc_id AS new_id, y.doc_id AS old_id
         |         FROM bandsN x JOIN bandsO y
         |           ON x.band = y.band AND x.bkey = y.bkey),
         |ver AS (
         |  SELECT new_id, old_id,
         |    ${t6("CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles)))")} AS jaccard
         |  FROM cand JOIN sharrN a ON a.doc_id = new_id
         |            JOIN sharrO b ON b.doc_id = old_id),
         |near AS (
         |  SELECT new_id AS doc_id, 'near_dup' AS status, old_id AS match_id, jaccard
         |  FROM (SELECT *, row_number() OVER (
         |          PARTITION BY new_id ORDER BY jaccard DESC, old_id) AS rn
         |        FROM ver WHERE jaccard >= 0.5)
         |  WHERE rn = 1),
         |uniq AS (
         |  SELECT doc_id, 'unique' AS status, CAST(-1 AS BIGINT) AS match_id,
         |         0.0 AS jaccard
         |  FROM rest WHERE doc_id NOT IN (SELECT doc_id FROM near))
         |SELECT doc_id, status, match_id, jaccard FROM exact
         |UNION ALL SELECT doc_id, status, match_id, jaccard FROM near
         |UNION ALL SELECT doc_id, status, match_id, jaccard FROM uniq
         |ORDER BY doc_id""".stripMargin
    },

    "q30_simhash" ->
      s"""WITH tok AS (SELECT doc_id, ${md5Long("t")} AS h
         |            FROM (SELECT doc_id, unnest(${toks("text")}) AS t FROM documents)),
         |votes AS (SELECT doc_id, i, SUM(CASE WHEN ((h >> i) & 1) = 1 THEN 1 ELSE -1 END) AS v
         |          FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS i)
         |          GROUP BY doc_id, i)
         |SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS simhash
         |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q31_ngram_jaccard" -> {
      val corpus =
        s"""SELECT doc_id, text FROM ($nearDupCorpus)
           |WHERE doc_id < 100 OR (doc_id >= 10000 AND doc_id < 10100)""".stripMargin
      s"""${shinglesSql(corpus)},
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY doc_a, doc_b)
         |SELECT doc_a, doc_b, jaccard FROM (
         |  SELECT doc_a, doc_b, ${t6("CAST(ni AS DOUBLE) / (ca.n + cb.n - ni)")} AS jaccard
         |  FROM inter JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b)
         |WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin
    },

    // q322/q323 replay the shingle text verbatim: a token position is
    // duplicated iff its 8-token window occurs >= 2 times corpus-wide;
    // consecutive duplicated positions merge into maximal spans; removal
    // keeps each shingle's canonical first occurrence (min doc_id, pos)
    "q322_dup_spans" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM ($nearDupCorpus)
         |                WHERE doc_id < 100 OR (doc_id >= 10000 AND doc_id < 10100)),
         |tok AS (SELECT doc_id, ${toks("text")} AS tk FROM corpus),
         |sh AS (SELECT doc_id, pos, array_to_string(list_slice(tk, pos, pos + 7), ' ') AS s
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 7)) AS pos
         |             FROM tok WHERE len(tk) >= 8)),
         |dup AS (SELECT s FROM sh GROUP BY s HAVING count(*) >= 2),
         |gaps AS (SELECT doc_id, pos,
         |                CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 7
         |                     THEN 1 ELSE 0 END AS ng
         |         FROM sh WHERE s IN (SELECT s FROM dup)),
         |runs AS (SELECT doc_id, pos,
         |                SUM(ng) OVER (PARTITION BY doc_id ORDER BY pos
         |                              ROWS UNBOUNDED PRECEDING) AS grp
         |         FROM gaps)
         |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
         |       CAST(max(pos) + 7 AS BIGINT) AS span_end,
         |       CAST(max(pos) + 7 - min(pos) + 1 AS BIGINT) AS span_len
         |FROM runs GROUP BY doc_id, grp ORDER BY doc_id, span_start""".stripMargin,

    "q323_dup_span_removal" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM ($nearDupCorpus)
         |                WHERE doc_id < 100 OR (doc_id >= 10000 AND doc_id < 10100)),
         |tok AS (SELECT doc_id, ${toks("text")} AS tk FROM corpus),
         |sh AS (SELECT doc_id, pos, array_to_string(list_slice(tk, pos, pos + 7), ' ') AS s
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 7)) AS pos
         |             FROM tok WHERE len(tk) >= 8)),
         |occ AS (SELECT doc_id, pos,
         |               row_number() OVER (PARTITION BY s ORDER BY doc_id, pos) AS rn,
         |               count(*) OVER (PARTITION BY s) AS n_occ
         |        FROM sh),
         |cov AS (SELECT DISTINCT doc_id, pos + i AS t
         |        FROM (SELECT doc_id, pos, unnest(generate_series(0, 7)) AS i
         |              FROM occ WHERE n_occ >= 2 AND rn > 1)
         |        EXCEPT
         |        SELECT DISTINCT doc_id, pos + i AS t
         |        FROM (SELECT doc_id, pos, unnest(generate_series(0, 7)) AS i
         |              FROM occ WHERE n_occ >= 2 AND rn = 1)),
         |tokens AS (SELECT doc_id, pos AS t, tk[pos] AS tok
         |           FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS pos
         |                 FROM tok))
         |SELECT tokens.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |       CAST(SUM(CASE WHEN cov.t IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |       coalesce(string_agg(CASE WHEN cov.t IS NULL THEN tok END,
         |                           ' ' ORDER BY tokens.t), '') AS text_clean
         |FROM tokens LEFT JOIN cov
         |  ON tokens.doc_id = cov.doc_id AND tokens.t = cov.t
         |GROUP BY tokens.doc_id ORDER BY tokens.doc_id""".stripMargin,

    "q324_incremental_spans" ->
      s"""WITH batch AS (SELECT doc_id, text FROM ($nearDupCorpus)
         |               WHERE doc_id >= 10000 AND doc_id < 10100),
         |corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
         |bsh AS (SELECT doc_id, pos, array_to_string(list_slice(tk, pos, pos + 7), ' ') AS s
         |        FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 7)) AS pos
         |              FROM (SELECT doc_id, ${toks("text")} AS tk FROM batch)
         |              WHERE len(tk) >= 8)),
         |csh AS (SELECT DISTINCT array_to_string(list_slice(tk, pos, pos + 7), ' ') AS s
         |        FROM (SELECT tk, unnest(generate_series(1, len(tk) - 7)) AS pos
         |              FROM (SELECT ${toks("text")} AS tk FROM corpus)
         |              WHERE len(tk) >= 8)),
         |dup AS (SELECT s FROM bsh GROUP BY s HAVING count(*) >= 2
         |        UNION SELECT s FROM csh),
         |gaps AS (SELECT doc_id, pos,
         |                CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 7
         |                     THEN 1 ELSE 0 END AS ng
         |         FROM bsh WHERE s IN (SELECT s FROM dup)),
         |runs AS (SELECT doc_id, pos,
         |                SUM(ng) OVER (PARTITION BY doc_id ORDER BY pos
         |                              ROWS UNBOUNDED PRECEDING) AS grp
         |         FROM gaps)
         |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
         |       CAST(max(pos) + 7 AS BIGINT) AS span_end,
         |       CAST(max(pos) + 7 - min(pos) + 1 AS BIGINT) AS span_len
         |FROM runs GROUP BY doc_id, grp ORDER BY doc_id, span_start""".stripMargin,

    "q325_duplication_report" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM ($nearDupCorpus)
         |                WHERE doc_id < 100 OR (doc_id >= 10000 AND doc_id < 10100)),
         |tok AS (SELECT doc_id, ${toks("text")} AS tk FROM corpus),
         |sh AS (SELECT doc_id, pos, array_to_string(list_slice(tk, pos, pos + 7), ' ') AS s
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 7)) AS pos
         |             FROM tok WHERE len(tk) >= 8)),
         |dup AS (SELECT s FROM sh GROUP BY s HAVING count(*) >= 2),
         |gaps AS (SELECT doc_id, pos,
         |                CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 7
         |                     THEN 1 ELSE 0 END AS ng
         |         FROM sh WHERE s IN (SELECT s FROM dup)),
         |runs AS (SELECT doc_id, pos,
         |                SUM(ng) OVER (PARTITION BY doc_id ORDER BY pos
         |                              ROWS UNBOUNDED PRECEDING) AS grp
         |         FROM gaps),
         |spans AS (SELECT max(pos) + 7 - min(pos) + 1 AS span_len
         |          FROM runs GROUP BY doc_id, grp),
         |tot AS (SELECT CAST(SUM(len(tk)) AS BIGINT) AS total_tokens FROM tok),
         |agg AS (SELECT CAST(coalesce(SUM(span_len), 0) AS BIGINT) AS dup_tokens,
         |               CAST(count(*) AS BIGINT) AS n_spans,
         |               CAST(coalesce(MAX(span_len), 0) AS BIGINT) AS max_span_len
         |        FROM spans)
         |SELECT total_tokens, dup_tokens,
         |       CASE WHEN total_tokens = 0 THEN 0.0
         |            ELSE ${t6("CAST(dup_tokens AS DOUBLE) / total_tokens")}
         |       END AS dup_ratio,
         |       n_spans, max_span_len
         |FROM tot, agg""".stripMargin,

    "q32_char_chunks" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx, substr(text, i * 180 + 1, 200) AS chunk_text
        |FROM (SELECT doc_id, text,
        |        unnest(generate_series(0, CAST(floor((length(text) - 1) / 180.0) AS BIGINT))) AS i
        |      FROM documents WHERE doc_id < 50 AND length(text) > 0)
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    "q33_message_chunks" ->
      """SELECT user_id, string_agg(concat('[', event_type, ']: ', props), chr(10) ORDER BY event_id) AS chunk_text
        |FROM events WHERE user_id < 10 GROUP BY user_id ORDER BY user_id""".stripMargin,

    // greedy stateful token-budget packing, expressed as a per-group
    // recursive CTE advancing one row per recursion step (groups recurse
    // in lockstep on their row_number)
    "q34_token_budget_chunks" ->
      """WITH RECURSIVE inp AS (
        |  SELECT source AS g,
        |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
        |         text AS content, len(string_split(text, ' ')) AS n
        |  FROM documents),
        |r AS (
        |  SELECT g, rn, content, n, 0 AS idx, n AS acc, (n > 500) AS closed
        |  FROM inp WHERE rn = 1
        |  UNION ALL
        |  SELECT i.g, i.rn, i.content, i.n,
        |         CASE WHEN r.closed OR (r.acc + i.n > 500 AND r.acc > 0)
        |              THEN r.idx + 1 ELSE r.idx END,
        |         CASE WHEN r.closed OR (r.acc + i.n > 500 AND r.acc > 0)
        |              THEN i.n ELSE r.acc + i.n END,
        |         (CASE WHEN r.closed OR (r.acc + i.n > 500 AND r.acc > 0)
        |               THEN i.n ELSE r.acc + i.n END) > 500
        |  FROM r JOIN inp i ON i.g = r.g AND i.rn = r.rn + 1)
        |SELECT g AS group_id, CAST(idx AS BIGINT) AS chunk_idx,
        |       string_agg(content, chr(10) ORDER BY rn) AS chunk_text,
        |       CAST(SUM(n) AS BIGINT) AS n_tokens
        |FROM r GROUP BY g, idx ORDER BY group_id, chunk_idx""".stripMargin,

    "q35_graph_neighbors" ->
      """SELECT l_partkey + 100000 AS dst, p_name AS name, l_extendedprice AS weight,
        |  l_returnflag AS relation
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_suppkey = 1 AND l_returnflag = 'A'
        |ORDER BY weight DESC, dst LIMIT 20""".stripMargin,

    "q36_two_hop" ->
      s"""WITH e AS (SELECT l_suppkey AS src, l_partkey + 100000 AS dst,
         |                  l_returnflag AS relation, l_extendedprice AS weight FROM lineitem),
         |bidir AS (SELECT * FROM e
         |          UNION ALL SELECT dst AS src, src AS dst, relation, weight FROM e)
         |SELECT dst, ${t6("max(w1 * w2)")} AS path_weight
         |FROM (SELECT dst AS mid, weight AS w1 FROM bidir WHERE src = 1) h1
         |JOIN (SELECT src AS mid, dst, weight AS w2 FROM bidir) h2 USING (mid)
         |WHERE dst != 1 GROUP BY dst ORDER BY path_weight DESC, dst LIMIT 20""".stripMargin,

    "q37_edges_between" ->
      """SELECT src, dst, relation, weight
        |FROM (SELECT l_suppkey AS src, l_partkey + 100000 AS dst,
        |             l_returnflag AS relation, l_extendedprice AS weight FROM lineitem)
        |WHERE src = 1 AND dst = 101967 ORDER BY weight DESC, relation""".stripMargin,

    "q52_topk_per_key" ->
      """SELECT l_suppkey, l_extendedprice, l_orderkey,
        |       CAST(l_linenumber AS BIGINT) AS l_linenumber FROM (
        |  SELECT l_suppkey, l_extendedprice, l_orderkey, l_linenumber,
        |         row_number() OVER (PARTITION BY l_suppkey
        |           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 3
        |ORDER BY l_suppkey, l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin,

    "q56_repetition_ratio" -> {
      val toksSql = "string_split(text, ' ')"
      s"""SELECT doc_id,
         |       CAST(len(grams) AS BIGINT) AS n_grams,
         |       CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
         |       ${t6("CASE WHEN len(grams) > 0 THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams) ELSE 0.0 END")} AS rep_ratio
         |FROM (SELECT doc_id,
         |        CASE WHEN len($toksSql) >= 3
         |          THEN list_transform(generate_series(1, len($toksSql) - 2),
         |                 i -> array_to_string($toksSql[i:i+2], ' '))
         |          ELSE CAST([] AS VARCHAR[]) END AS grams
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin
    },

    "q57_pii_redaction" -> {
      val phonePat = "'[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}'"
      val emailPat = "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'"
      s"""WITH texts AS (
         |  SELECT c_custkey,
         |         CASE WHEN c_custkey % 5 = 0
         |           THEN concat(c_name, ' segment ', c_mktsegment)
         |           ELSE concat(c_name, ' reachable at ',
         |                  lpad(CAST(c_custkey % 89 + 10 AS VARCHAR), 2, '0'), '-',
         |                  lpad(CAST(c_custkey * 7 % 1000 AS VARCHAR), 3, '0'), '-',
         |                  lpad(CAST(c_custkey * 13 % 1000 AS VARCHAR), 3, '0'), '-',
         |                  lpad(CAST(c_custkey * 17 % 10000 AS VARCHAR), 4, '0'),
         |                  ' segment ', c_mktsegment) END AS text
         |  FROM customer)
         |SELECT c_custkey,
         |       regexp_replace(regexp_replace(text, $phonePat, '[PHONE]', 'g'),
         |                      $emailPat, '[EMAIL]', 'g') AS redacted,
         |       CAST(len(regexp_split_to_array(text, $phonePat)) - 1
         |          + len(regexp_split_to_array(text, $emailPat)) - 1 AS BIGINT) AS n_redacted
         |FROM texts ORDER BY c_custkey""".stripMargin
    },

    "q58_shared_passages" -> {
      val toksSql = "string_split(text, ' ')"
      s"""WITH sh AS (SELECT DISTINCT doc_id, s FROM (
         |  SELECT doc_id,
         |         unnest(list_transform(generate_series(1, len($toksSql) - 7),
         |                i -> array_to_string($toksSql[i:i+7], ' '))) AS s
         |  FROM documents WHERE len($toksSql) >= 8))
         |SELECT s AS shingle, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         |FROM sh GROUP BY s HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY n_docs DESC, shingle LIMIT 50""".stripMargin
    },

    // q62: the near-dup pairs are q31's jaccard formula over the
    // three-variant family corpus; the cluster labels are the transitive
    // closure (min reachable doc id), replayed as a recursive CTE
    "q62_duplicate_clusters" -> {
      val corpus =
        """SELECT doc_id, text FROM documents WHERE doc_id < 100
          |UNION ALL
          |SELECT doc_id + 10000, text FROM documents WHERE doc_id < 100
          |UNION ALL
          |SELECT doc_id + 20000, substr(text, strpos(text, ' ') + 1)
          |FROM documents WHERE doc_id < 100""".stripMargin
      "WITH RECURSIVE " + shinglesSql(corpus).stripPrefix("WITH ") +
        s""",
           |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
           |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
           |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           |          GROUP BY doc_a, doc_b),
           |pairs AS (SELECT doc_a, doc_b FROM (
           |    SELECT doc_a, doc_b, ${t6("CAST(ni AS DOUBLE) / (ca.n + cb.n - ni)")} AS jaccard
           |    FROM inter JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b)
           |  WHERE jaccard >= 0.5),
           |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
           |          UNION SELECT doc_b, doc_a FROM pairs),
           |reach(id, r) AS (
           |  SELECT DISTINCT src AS id, src AS r FROM edges
           |  UNION
           |  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst)
           |SELECT id AS doc_id, min(r) AS cluster_rep
           |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin
    },

    "q82_canonical_per_cluster" -> {
      val corpus =
        """SELECT doc_id, text FROM documents WHERE doc_id < 100
          |UNION ALL
          |SELECT doc_id + 10000, text FROM documents WHERE doc_id < 100
          |UNION ALL
          |SELECT doc_id + 20000, substr(text, strpos(text, ' ') + 1)
          |FROM documents WHERE doc_id < 100""".stripMargin
      "WITH RECURSIVE " + shinglesSql(corpus).stripPrefix("WITH ") +
        s""",
           |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
           |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
           |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           |          GROUP BY doc_a, doc_b),
           |pairs AS (SELECT doc_a, doc_b FROM (
           |    SELECT doc_a, doc_b, ${t6("CAST(ni AS DOUBLE) / (ca.n + cb.n - ni)")} AS jaccard
           |    FROM inter JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b)
           |  WHERE jaccard >= 0.5),
           |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
           |          UNION SELECT doc_b, doc_a FROM pairs),
           |reach(id, r) AS (
           |  SELECT DISTINCT src AS id, src AS r FROM edges
           |  UNION
           |  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst),
           |labels AS (SELECT id AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY id),
           |qual AS (SELECT doc_id,
           |    ${t6("uniq_ratio * 0.5 + (1.0 - stop_ratio) * 0.3 + least(avg_token_len / 8.0, 1.0) * 0.2")} AS quality
           |  FROM (SELECT doc_id,
           |          CAST(len(${toks("text")}) - len(${contentToks("text")}) AS DOUBLE)
           |            / CAST(len(${toks("text")}) AS DOUBLE) AS stop_ratio,
           |          CAST(len(list_distinct(${toks("text")})) AS DOUBLE)
           |            / CAST(len(${toks("text")}) AS DOUBLE) AS uniq_ratio,
           |          CAST(length(text) - len(${toks("text")}) + 1 AS DOUBLE)
           |            / CAST(len(${toks("text")}) AS DOUBLE) AS avg_token_len
           |        FROM corpus)),
           |clustered AS (SELECT q.doc_id, coalesce(l.cluster_rep, q.doc_id) AS cluster_rep,
           |                     q.quality
           |              FROM qual q LEFT JOIN labels l USING (doc_id)),
           |winner AS (SELECT cluster_rep, doc_id AS canonical_id FROM (
           |    SELECT cluster_rep, doc_id,
           |           row_number() OVER (PARTITION BY cluster_rep
           |                              ORDER BY quality DESC, doc_id) AS rn
           |    FROM clustered) WHERE rn = 1)
           |SELECT c.doc_id, c.cluster_rep, w.canonical_id,
           |       CAST(c.doc_id = w.canonical_id AS INT) AS keep
           |FROM clustered c JOIN winner w USING (cluster_rep)
           |ORDER BY doc_id""".stripMargin
    },

    "q61_decontamination" -> {
      val toksSql = "string_split(text, ' ')"
      def grams(where: String) =
        s"""SELECT DISTINCT doc_id, s FROM (
           |  SELECT doc_id,
           |         unnest(list_transform(generate_series(1, len($toksSql) - 7),
           |                i -> array_to_string($toksSql[i:i+7], ' '))) AS s
           |  FROM documents WHERE len($toksSql) >= 8 AND $where)""".stripMargin
      s"""WITH tg AS (${grams("doc_id % 10 != 0")}),
         |eg AS (SELECT DISTINCT s FROM (${grams("doc_id % 10 = 0")}))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |FROM tg JOIN eg USING (s)
         |GROUP BY doc_id HAVING count(*) >= 1
         |ORDER BY n_shared DESC, doc_id""".stripMargin
    },

    // q83 is the Bloom-prefiltered spelling of q61's exact check (the
    // exact survivor join erases the filter's false positives), so the
    // oracle is the same overlap SQL at the q83 params (6-grams, >= 2)
    "q83_decontamination_bloom" -> {
      val toksSql = "string_split(text, ' ')"
      def grams(where: String) =
        s"""SELECT DISTINCT doc_id, s FROM (
           |  SELECT doc_id,
           |         unnest(list_transform(generate_series(1, len($toksSql) - 5),
           |                i -> array_to_string($toksSql[i:i+5], ' '))) AS s
           |  FROM documents WHERE len($toksSql) >= 6 AND $where)""".stripMargin
      s"""WITH tg AS (${grams("doc_id % 10 != 0")}),
         |eg AS (SELECT DISTINCT s FROM (${grams("doc_id % 10 = 0")}))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |FROM tg JOIN eg USING (s)
         |GROUP BY doc_id HAVING count(*) >= 2
         |ORDER BY n_shared DESC, doc_id""".stripMargin
    },

    // q55 is the window-idiom spelling of q52 (rewritten to the heap
    // operator by WindowTopKRewrite): same result, same oracle
    "q55_topk_window_rewrite" ->
      """SELECT l_suppkey, l_extendedprice, l_orderkey,
        |       CAST(l_linenumber AS BIGINT) AS l_linenumber FROM (
        |  SELECT l_suppkey, l_extendedprice, l_orderkey, l_linenumber,
        |         row_number() OVER (PARTITION BY l_suppkey
        |           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 3
        |ORDER BY l_suppkey, l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin,

    "q38_lineage_join" ->
      """SELECT l_orderkey, count(DISTINCT p_brand) AS n_brands, count(*) AS n_parts
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_orderkey < 500 GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "q39_scalar_suite" ->
      s"""SELECT doc_id, md5(text) AS content_hash, ${md5Long("text")} AS h52,
         |  concat('[', lang, '] ', source) AS tag,
         |  length(text) AS n_chars_sql,
         |  contains(lower(text), 'join') AS has_join
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q42_token_count_cjk" ->
      s"""SELECT doc_id,
         |  len(${toks("text")}) AS n_ws_tokens,
         |  length(text) - length(regexp_replace(text, '\\p{Han}', '', 'g')) AS n_cjk_chars,
         |  CAST(floor((len(${toks("text")}) + length(text) - length(regexp_replace(text, '\\p{Han}', '', 'g'))) * 1.3) AS BIGINT) AS token_estimate
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q43_two_stage_rerank" -> {
      val q = SparkEntry.KwQuery.split(" ").distinct
        .filterNot(graft.functions.TextFunctions.StopWords.contains)
      val qList = q.map(t => s"'$t'").mkString("[", ",", "]")
      s"""SELECT id, score,
         |  ${t6(s"score * 0.7 + CAST(len(list_intersect(${tokenSet("text")}, $qList)) AS DOUBLE) / ${q.length}.0 * 0.3")} AS rerank_score
         |FROM (${vectorScanSql(SparkEntry.KnnQueryId, 20)}) s
         |JOIN documents ON s.id = documents.doc_id
         |ORDER BY rerank_score DESC, id LIMIT 10""".stripMargin
    },

    "q40_first_wins_dedup" ->
      s"""SELECT id, score, store_type FROM (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY priority, score DESC) AS rn
         |  FROM (SELECT id, score, store_type,
         |               CASE WHEN store_type = 'vector' THEN 1 ELSE 2 END AS priority
         |        FROM ($unitedSql)))
         |WHERE rn = 1 ORDER BY id""".stripMargin,

    // q114: DDSketch — bucket = ceil(ln x / ln γ), quantile = first
    // bucket reaching rank ⌈q·n⌉, estimate at the γ-midpoint. The ln γ
    // and γ constants are pinned driver-side literals (Double.toString
    // round-trips) so both engines divide by the SAME doubles.
    "q114_ddsketch_quantiles" -> {
      val alpha = 0.01
      val gamma = (1 + alpha) / (1 - alpha)
      val lnGamma = math.log(gamma)
      s"""WITH b AS (
         |  SELECT l_returnflag,
         |         CAST(ceil(ln(CAST(l_extendedprice AS DOUBLE)) / CAST($lnGamma AS DOUBLE)) AS BIGINT) AS bucket,
         |         CAST(count(*) AS BIGINT) AS cnt
         |  FROM lineitem WHERE l_extendedprice > 0 GROUP BY 1, 2),
         |c AS (SELECT l_returnflag, bucket, cnt,
         |        CAST(sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bucket) AS BIGINT) AS cum,
         |        CAST(sum(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
         |      FROM b),
         |p AS (SELECT l_returnflag, q, min(bucket) AS qbucket, max(n) AS n
         |      FROM c, (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q) qs
         |      WHERE cum >= greatest(1, CAST(ceil(q * CAST(n AS DOUBLE)) AS BIGINT))
         |      GROUP BY 1, 2)
         |SELECT l_returnflag, q, n,
         |       ${t6(s"2.0 * pow(CAST($gamma AS DOUBLE), CAST(qbucket AS DOUBLE)) / CAST(${gamma + 1} AS DOUBLE)")} AS est
         |FROM p ORDER BY l_returnflag, q""".stripMargin
    },

    // q115: zero-filled daily resample — integer epoch-days end to end
    "q115_gap_fill_daily" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST($tsUs // 86400000000 AS BIGINT) AS day,
         |         CAST(count(*) AS BIGINT) AS n, ${xsum("value")} AS day_value
         |  FROM events GROUP BY 1, 2),
         |span AS (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
         |grid AS (SELECT event_type, unnest(generate_series(d0, d1)) AS day FROM span)
         |SELECT g.event_type, g.day,
         |       CAST(coalesce(dy.n, 0) AS BIGINT) AS n,
         |       CAST(coalesce(dy.day_value, 0.0) AS DOUBLE) AS day_value
         |FROM grid g LEFT JOIN daily dy ON dy.event_type = g.event_type AND dy.day = g.day
         |ORDER BY 1, 2""".stripMargin,

    // q116: per-user z-score outliers from the exact moment sums; z is
    // truncated to the 6-decimal grid BEFORE the threshold cut
    "q116_zscore_anomalies" ->
      s"""WITH m AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         |         ${dsum("value")} AS sx, ${dsum12("value * value")} AS sxx
         |  FROM events GROUP BY 1 HAVING count(*) >= 2)
         |SELECT event_id, user_id, value, z FROM (
         |  SELECT e.event_id, e.user_id, e.value,
         |         (CAST(m.n AS DOUBLE) * m.sxx - m.sx * m.sx) /
         |           (CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE)) AS variance,
         |         ${t6("(e.value - m.sx / CAST(m.n AS DOUBLE)) / sqrt((CAST(m.n AS DOUBLE) * m.sxx - m.sx * m.sx) / (CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE)))")} AS z
         |  FROM events e JOIN m USING (user_id))
         |WHERE variance > 0 AND abs(z) > 2.5
         |ORDER BY event_id""".stripMargin,

    // q117: blocked fuzzy self-match on the distinct name dictionary
    "q117_fuzzy_name_pairs" ->
      s"""WITH names AS (SELECT DISTINCT p_name AS name FROM part),
         |b AS (SELECT name, split_part(name, ' ', 1) AS block FROM names)
         |SELECT a.name AS name_a, b2.name AS name_b,
         |       CAST(levenshtein(a.name, b2.name) AS BIGINT) AS dist
         |FROM b a JOIN b b2 ON a.block = b2.block AND a.name < b2.name
         |WHERE levenshtein(a.name, b2.name) <= 3
         |ORDER BY 1, 2""".stripMargin,

    // q118: containment |A∩B| / min(|A|,|B|) over the prefix-copy corpus
    "q118_containment_pairs" -> {
      val corpus =
        s"""SELECT doc_id, text FROM (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 10000 AS doc_id, substr(text, 1, length(text) // 2) AS text
           |  FROM documents)
           |WHERE doc_id < 100 OR (doc_id >= 10000 AND doc_id < 10100)""".stripMargin
      s"""${shinglesSql(corpus)},
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY doc_a, doc_b)
         |SELECT doc_a, doc_b, containment FROM (
         |  SELECT doc_a, doc_b, ${t6("CAST(ni AS DOUBLE) / CAST(least(ca.n, cb.n) AS DOUBLE)")} AS containment
         |  FROM inter JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b)
         |WHERE containment >= 0.9 ORDER BY doc_a, doc_b""".stripMargin
    },

    // q119: per-language top-5 bigrams, ties broken lexicographically
    "q119_top_bigrams_lang" ->
      s"""WITH tk AS (SELECT lang, ${toks("text")} AS t FROM documents),
         |big AS (SELECT lang,
         |          unnest(list_transform(generate_series(2, len(t)),
         |                 i -> concat(t[i - 1], ' ', t[i]))) AS bigram
         |        FROM tk WHERE len(t) >= 2),
         |cnt AS (SELECT lang, bigram, CAST(count(*) AS BIGINT) AS cnt
         |        FROM big GROUP BY 1, 2)
         |SELECT lang, bigram, cnt, rank FROM (
         |  SELECT lang, bigram, cnt,
         |         CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, bigram) AS BIGINT) AS rank
         |  FROM cnt)
         |WHERE rank <= 5 ORDER BY lang, rank""".stripMargin,

    // q120: JL ±1 projection — the sign matrix is the same md5
    // expression in both engines; the dot product is the
    // order-independent decimal-widened sum
    "q120_random_projection" ->
      s"""WITH signs AS (
         |  SELECT od.out_dim, dm.dim,
         |         CASE WHEN ${md5Long("concat('rp|', CAST(od.out_dim AS VARCHAR), '|', CAST(dm.dim AS VARCHAR))")} % 2 = 0
         |              THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END AS s
         |  FROM (SELECT unnest(generate_series(0, 15)) AS out_dim) od,
         |       (SELECT unnest(generate_series(0, 63)) AS dim) dm),
         |pos AS (
         |  SELECT vec_id, t.i AS dim, CAST(embedding[t.i + 1] AS DOUBLE) AS v
         |  FROM embeddings, (SELECT unnest(generate_series(0, 63)) AS i) t)
         |SELECT vec_id, out_dim, ${t6(zsum8("v * s"))} AS proj
         |FROM pos JOIN signs USING (dim)
         |GROUP BY vec_id, out_dim
         |ORDER BY vec_id, out_dim""".stripMargin,

    // q121: exact covariance of the embedding dims — narrow component
    // rows, vec-keyed (i ≤ j) pair join, scaled-long moment sums,
    // cov = (n·Σxy − Σx·Σy)/n²
    "q121_covariance_matrix" ->
      s"""WITH pos AS (
         |  SELECT vec_id, CAST(t.i AS BIGINT) AS i, CAST(embedding[t.i + 1] AS DOUBLE) AS x
         |  FROM embeddings, (SELECT unnest(generate_series(0, 63)) AS i) t),
         |agg AS (SELECT a.i AS i, b.i AS j, CAST(count(*) AS BIGINT) AS n,
         |          ${zsum8("a.x * b.x")} AS sxy, ${zsum8("a.x")} AS sx, ${zsum8("b.x")} AS sy
         |        FROM pos a JOIN pos b ON a.vec_id = b.vec_id AND a.i <= b.i
         |        GROUP BY 1, 2)
         |SELECT i, j, n,
         |       ${t6("(CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))")} AS cov
         |FROM agg ORDER BY i, j""".stripMargin,

    // q122: CUBE — all four grouping sets in one pass; GROUPING() bit
    // order (first arg most significant) matches Spark's grouping_id()
    "q122_cube_report" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         |       CAST(count(*) AS BIGINT) AS n, ${xsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,

    // q124: per-user inter-arrival gaps — integer µs end to end, one
    // pinned mean division
    "q124_session_gaps" ->
      s"""WITH g AS (
         |  SELECT user_id,
         |         $tsUs - lag($tsUs) OVER (PARTITION BY user_id ORDER BY $tsUs, event_id) AS gap
         |  FROM events)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
         |       CAST(max(gap) AS BIGINT) AS max_gap_us,
         |       ${t6("CAST(sum(gap) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS mean_gap_us
         |FROM g WHERE gap IS NOT NULL GROUP BY user_id ORDER BY user_id""".stripMargin,

    // q138: deterministic md5-threshold split report
    "q138_dataset_split" ->
      s"""SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(len(${toks("text")})) AS BIGINT) AS n_tokens
         |FROM (SELECT text,
         |        CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
         |      FROM (SELECT text,
         |              CAST(${md5Long("concat('split|', CAST(doc_id AS VARCHAR))")} % 1000000 AS DOUBLE) / 1e6 AS u
         |            FROM documents))
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q139: cluster-level split over the q82 closure — thresholds are
    // interpolated from the SAME Scala doubles the operator adds
    // (0.8 + 0.1 is not the literal 0.9 in IEEE)
    "q139_leakage_safe_split" -> {
      val corpus =
        """SELECT doc_id, text FROM documents WHERE doc_id < 100
          |UNION ALL
          |SELECT doc_id + 10000, text FROM documents WHERE doc_id < 100
          |UNION ALL
          |SELECT doc_id + 20000, substr(text, strpos(text, ' ') + 1)
          |FROM documents WHERE doc_id < 100""".stripMargin
      "WITH RECURSIVE " + shinglesSql(corpus).stripPrefix("WITH ") +
        s""",
           |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
           |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
           |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           |          GROUP BY doc_a, doc_b),
           |pairs AS (SELECT doc_a, doc_b FROM (
           |    SELECT doc_a, doc_b, ${t6("CAST(ni AS DOUBLE) / (ca.n + cb.n - ni)")} AS jaccard
           |    FROM inter JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b)
           |  WHERE jaccard >= 0.5),
           |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
           |          UNION SELECT doc_b, doc_a FROM pairs),
           |reach(id, r) AS (
           |  SELECT DISTINCT src AS id, src AS r FROM edges
           |  UNION
           |  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst),
           |labels AS (SELECT id AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY id),
           |assigned AS (SELECT c.doc_id, coalesce(l.cluster_rep, c.doc_id) AS cluster_rep
           |             FROM corpus c LEFT JOIN labels l USING (doc_id))
           |SELECT doc_id, cluster_rep,
           |       CASE WHEN u < ${0.8} THEN 'train'
           |            WHEN u < ${0.8 + 0.1} THEN 'val' ELSE 'test' END AS split
           |FROM (SELECT doc_id, cluster_rep,
           |        CAST(${md5Long("concat('split|', CAST(cluster_rep AS VARCHAR))")} % 1000000 AS DOUBLE) / 1e6 AS u
           |      FROM assigned)
           |ORDER BY doc_id""".stripMargin
    },

    // q140: column profile — one UNION ALL arm per profiled column
    "q140_profile_orders" ->
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
        "o_orderpriority").map { c =>
        s"""SELECT '$c' AS col_name,
           |       CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |       CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |       CAST(min($c) AS VARCHAR) AS min_str,
           |       CAST(max($c) AS VARCHAR) AS max_str
           |FROM orders""".stripMargin
      }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_name"),

    // q141: the MERGE's audit trail — every %10 key changed, every
    // +90000 key added, nothing removed
    "q141_snapshot_diff" ->
      s"""SELECT doc_id, change FROM (
         |  SELECT doc_id, 'changed' AS change FROM documents WHERE doc_id % 10 = 0
         |  UNION ALL
         |  SELECT doc_id + 90000 AS doc_id, 'added' AS change
         |  FROM documents WHERE doc_id % 7 = 0)
         |ORDER BY doc_id""".stripMargin,

    // q167: personalized PageRank — q99's unroll with the teleport
    // restricted to the source
    "q167_personalized_pagerank" -> {
      val corpus =
        s"""SELECT doc_id, text FROM ($nearDupCorpus)
           |WHERE doc_id < 100 OR (doc_id >= 10000 AND doc_id < 10100)""".stripMargin
      val iters = (1 to 5).map { i =>
        s"""r$i AS (
           |  SELECT v, CASE WHEN v = 0 THEN CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)
           |                 ELSE CAST(0.0 AS DOUBLE) END
           |            + CAST(0.85 AS DOUBLE) * s AS rank
           |  FROM (SELECT ed.dst AS v, ${dsum12("r.rank / ed.outdeg")} AS s
           |        FROM ed JOIN r${i - 1} r ON r.v = ed.src
           |        GROUP BY ed.dst))""".stripMargin
      }.mkString(",\n")
      s"""${shinglesSql(corpus)},
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY doc_a, doc_b),
         |pairs AS (SELECT doc_a, doc_b FROM (
         |  SELECT doc_a, doc_b, ${t6("CAST(ni AS DOUBLE) / (ca.n + cb.n - ni)")} AS jaccard
         |  FROM inter JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b)
         |  WHERE jaccard >= 0.5),
         |ed0 AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |        UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |deg AS (SELECT src, count(*) AS outdeg FROM ed0 GROUP BY src),
         |ed AS (SELECT ed0.src, ed0.dst, deg.outdeg FROM ed0 JOIN deg USING (src)),
         |r0 AS (SELECT src AS v,
         |         CASE WHEN src = 0 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS rank
         |       FROM deg),
         |$iters
         |SELECT v, rank FROM (
         |  SELECT v, ${t6("rank")} AS rank FROM r5 WHERE rank > 0)
         |ORDER BY rank DESC, v""".stripMargin
    },

    // q166: FK orphan counts — NOT EXISTS per relationship
    "q166_integrity_audit" ->
      """SELECT relation, n_orphans FROM (
        |  SELECT 'lineitem->orders' AS relation, CAST(count(*) AS BIGINT) AS n_orphans
        |  FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |  UNION ALL
        |  SELECT 'lineitem->part', CAST(count(*) AS BIGINT)
        |  FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
        |  UNION ALL
        |  SELECT 'orders->customer', CAST(count(*) AS BIGINT)
        |  FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |ORDER BY relation""".stripMargin,

    // q164: 4 unrolled BFS rounds over the q31 pair graph from doc 0
    "q164_bfs_levels" -> {
      val corpus =
        s"""SELECT doc_id, text FROM ($nearDupCorpus)
           |WHERE doc_id < 100 OR (doc_id >= 10000 AND doc_id < 10100)""".stripMargin
      val rounds = (1 to 4).map { i =>
        s"""p$i AS (SELECT e.dst AS v, min(d.dist + 1) AS nd
           |        FROM ed0 e JOIN d${i - 1} d ON d.v = e.src AND d.dist IS NOT NULL
           |        GROUP BY e.dst),
           |d$i AS (SELECT d.v,
           |          CASE WHEN d.dist IS NULL THEN p.nd
           |               WHEN p.nd IS NULL THEN d.dist
           |               ELSE least(d.dist, p.nd) END AS dist
           |        FROM d${i - 1} d LEFT JOIN p$i p USING (v))""".stripMargin
      }.mkString(",\n")
      s"""${shinglesSql(corpus)},
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY doc_a, doc_b),
         |pairs AS (SELECT doc_a, doc_b FROM (
         |  SELECT doc_a, doc_b, ${t6("CAST(ni AS DOUBLE) / (ca.n + cb.n - ni)")} AS jaccard
         |  FROM inter JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b)
         |  WHERE jaccard >= 0.5),
         |ed0 AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |        UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |d0 AS (SELECT DISTINCT src AS v,
         |         CASE WHEN src = 0 THEN CAST(0 AS BIGINT) ELSE NULL END AS dist
         |       FROM ed0),
         |$rounds
         |SELECT v, CAST(dist AS BIGINT) AS dist FROM d4
         |WHERE dist IS NOT NULL ORDER BY v""".stripMargin
    },

    // q180: weighted SSSP — q164's unrolled frontier chain with
    // min-plus relaxation over w = 1 − jaccard (dist doubles stay raw
    // through the rounds, truncated once at output, mirroring the
    // Spark fold op-for-op)
    "q180_sssp" -> {
      val corpus =
        s"""SELECT doc_id, text FROM ($nearDupCorpus)
           |WHERE doc_id < 100 OR (doc_id >= 10000 AND doc_id < 10100)""".stripMargin
      val rounds = (1 to 4).map { i =>
        s"""p$i AS (SELECT e.dst AS v, min(d.dist + e.w) AS nd
           |        FROM ed0 e JOIN d${i - 1} d ON d.v = e.src AND d.dist IS NOT NULL
           |        GROUP BY e.dst),
           |d$i AS (SELECT d.v,
           |          CASE WHEN d.dist IS NULL THEN p.nd
           |               WHEN p.nd IS NULL THEN d.dist
           |               ELSE least(d.dist, p.nd) END AS dist
           |        FROM d${i - 1} d LEFT JOIN p$i p USING (v))""".stripMargin
      }.mkString(",\n")
      s"""${shinglesSql(corpus)},
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY doc_a, doc_b),
         |pairs AS (SELECT doc_a, doc_b, jaccard FROM (
         |  SELECT doc_a, doc_b, ${t6("CAST(ni AS DOUBLE) / (ca.n + cb.n - ni)")} AS jaccard
         |  FROM inter JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b)
         |  WHERE jaccard >= 0.5),
         |ed0 AS (SELECT doc_a AS src, doc_b AS dst,
         |          CAST(1.0 AS DOUBLE) - jaccard AS w FROM pairs
         |        UNION ALL
         |        SELECT doc_b AS src, doc_a AS dst,
         |          CAST(1.0 AS DOUBLE) - jaccard AS w FROM pairs),
         |d0 AS (SELECT DISTINCT src AS v,
         |         CASE WHEN src = 0 THEN CAST(0.0 AS DOUBLE) ELSE NULL END AS dist
         |       FROM ed0),
         |$rounds
         |SELECT v, ${t6("dist")} AS dist FROM d4
         |WHERE dist IS NOT NULL ORDER BY v""".stripMargin
    },

    // q181: unrolled-kernel EWMA — the α^j weights are pinned
    // driver-side (α = 0.5 → exact binary fractions) and the
    // numerator/denominator CASE chains fold left in the same order as
    // the Spark expression tree
    "q181_ewma" -> {
      val (alpha, depth) = (0.5, 5)
      val ws = (0 to depth).map(j => math.pow(alpha, j))
      val lags = (0 to depth).map { j =>
        if (j == 0) "value"
        else s"lag(value, $j) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)"
      }
      val num = lags.zip(ws).map { case (x, w) =>
        s"CASE WHEN $x IS NOT NULL THEN $x * CAST(${w.toString} AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END"
      }.mkString("(", " + ", ")")
      val den = lags.zip(ws).map { case (x, w) =>
        s"CASE WHEN $x IS NOT NULL THEN CAST(${w.toString} AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END"
      }.mkString("(", " + ", ")")
      s"""SELECT user_id, event_id, ts_us, ${t6(s"$num / $den")} AS ewma
         |FROM (SELECT user_id, event_id, $tsUs AS ts_us, value FROM events)
         |ORDER BY user_id, ts_us, event_id""".stripMargin
    },

    // q182: NDCG@10 + MRR of the rescored IVF-PQ ranking vs the exact
    // scan — the q81 rescore pipeline ranked, graded by exact position,
    // ln-discounted; IDCG pinned driver-side into both texts
    "q182_ndcg_mrr" -> {
      val idcg = (1 to 10).map(i => (11 - i).toDouble / math.log(i + 1.0)).sum
      val dcgTerm = "CASE WHEN erank IS NOT NULL THEN " +
        "CAST(11 - erank AS DOUBLE) / ln(CAST(arank + 1 AS DOUBLE)) " +
        "ELSE CAST(0.0 AS DOUBLE) END"
      s"""WITH exact AS (
         |  SELECT id, CAST(row_number() OVER (ORDER BY score DESC, id) AS BIGINT) AS erank
         |  FROM (${vectorScanSql(SparkEntry.KnnQueryId, 10)})),
         |approx0 AS (
         |  SELECT a.id AS id,
         |         ${t6(cosine("CAST(e.embedding AS DOUBLE[])", "q.qv"))} AS score
         |  FROM (${ivfPqSql(SparkEntry.IvfPqNlist, SparkEntry.IvfPqM,
               SparkEntry.IvfPqKsub, SparkEntry.PqIters, SparkEntry.PqSample,
               SparkEntry.IvfPqNProbe, 40)}) a
         |  JOIN embeddings e ON e.vec_id = a.id,
         |       (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
         |        WHERE vec_id = ${SparkEntry.KnnQueryId}) q
         |  ORDER BY score DESC, id LIMIT 10),
         |approx AS (
         |  SELECT id, CAST(row_number() OVER (ORDER BY score DESC, id) AS BIGINT) AS arank
         |  FROM approx0),
         |j AS (SELECT a.arank, e.erank FROM approx a LEFT JOIN exact e USING (id))
         |SELECT ${t6(s"${dsum12(dcgTerm)} / CAST(${idcg.toString} AS DOUBLE)")} AS ndcg_at_10,
         |       ${t6("coalesce(CAST(1.0 AS DOUBLE) / CAST(min(CASE WHEN erank = 1 THEN arank END) AS DOUBLE), CAST(0.0 AS DOUBLE))")} AS mrr
         |FROM j""".stripMargin
    },

    // q183: exact per-group median — identical rank math ((n+1)//2 and
    // (n+2)//2 middle rows, min+max averaged)
    "q183_exact_median" ->
      s"""WITH r AS (
         |  SELECT l_returnflag, l_extendedprice,
         |         CAST(row_number() OVER (PARTITION BY l_returnflag
         |           ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS BIGINT) AS rn,
         |         CAST(count(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
         |  FROM lineitem)
         |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_mid,
         |       ${t6("(min(l_extendedprice) + max(l_extendedprice)) / CAST(2.0 AS DOUBLE)")} AS median
         |FROM r WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // q184: the one-pass pairwise Pearson matrix — same 15 scaled-long
    // moment slots (psum6 where extendedprice inflates the product,
    // zsum8 otherwise), six correlations off the single moment row
    "q184_corr_matrix" -> {
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      def sumf(a: String, b: String)(x: String): String =
        if (a == "l_extendedprice" || b == "l_extendedprice") psum6(x)
        else zsum8(x)
      val slots = cs.map(c => s"${xsum(c)} AS s_$c") ++
        (for { i <- cs.indices; j <- i until cs.length } yield
          s"${sumf(cs(i), cs(j))(s"${cs(i)} * ${cs(j)}")} AS p_${i}_$j")
      val rows = for { i <- cs.indices; j <- (i + 1) until cs.length } yield {
        val (sa, sb) = (s"s_${cs(i)}", s"s_${cs(j)}")
        s"""SELECT '${cs(i)}' AS col_a, '${cs(j)}' AS col_b,
           |  ${t6(s"(CAST(n AS DOUBLE) * p_${i}_$j - $sa * $sb) / " +
              s"(sqrt(CAST(n AS DOUBLE) * p_${i}_$i - $sa * $sa) * " +
              s"sqrt(CAST(n AS DOUBLE) * p_${j}_$j - $sb * $sb))")} AS corr
           |FROM m""".stripMargin
      }
      s"""WITH m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |         ${slots.mkString(",\n         ")}
         |  FROM lineitem)
         |${rows.mkString("\nUNION ALL\n")}
         |ORDER BY col_a, col_b""".stripMargin
    },

    // q185: SCD2 dimension build — change detection via null-safe
    // IS DISTINCT FROM lag over the raw feed, then lead() over the
    // surviving version starts (mirrors TableOps.scd2 op-for-op)
    "q185_scd2" ->
      s"""WITH f AS (SELECT user_id, event_type, $tsUs AS ts_us, event_id FROM events),
         |s AS (SELECT user_id, event_type, ts_us, event_id,
         |        (lag(ts_us) OVER w IS NULL OR
         |         event_type IS DISTINCT FROM lag(event_type) OVER w) AS chg
         |      FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         |v AS (SELECT user_id, event_type, ts_us, event_id FROM s WHERE chg)
         |SELECT user_id, event_type, ts_us AS valid_from,
         |       lead(ts_us) OVER w2 AS valid_to,
         |       lead(ts_us) OVER w2 IS NULL AS is_current
         |FROM v WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
         |ORDER BY user_id, valid_from""".stripMargin,

    // q186: melt ≡ the UNION ALL long form, same per-measure exact sums
    "q186_melt" ->
      s"""SELECT l_returnflag, measure, CAST(count(*) AS BIGINT) AS n,
         |       ${t6(xsum("val"))} AS total
         |FROM (
         |  SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
         |  UNION ALL SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
         |  UNION ALL SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
         |GROUP BY l_returnflag, measure
         |ORDER BY l_returnflag, measure""".stripMargin,

    // q188: the sketched table profile — one long-form unfold, the
    // generic md5-HLL per col_name, exact nulls and lexicographic
    // min/max from the same long form
    "q188_profile_sketched" -> {
      val longf = Seq("o_custkey", "o_orderkey", "o_orderpriority",
        "o_orderstatus").map(c =>
        s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS v FROM orders")
        .mkString("(", "\n   UNION ALL ", ")")
      s"""SELECT s.col_name, s.n_nulls, h.est_distinct, s.min_str, s.max_str
         |FROM (
         |  SELECT col_name, CAST(count(CASE WHEN v IS NULL THEN 1 END) AS BIGINT) AS n_nulls,
         |         min(v) AS min_str, max(v) AS max_str
         |  FROM $longf t GROUP BY col_name) s
         |JOIN (${hllByKeySql(s"$longf t2", "col_name", "v")}) h USING (col_name)
         |ORDER BY col_name""".stripMargin
    },

    // q189: point-in-time lookup — the q185 dimension re-derived, each
    // event joined to the version valid at its timestamp
    "q189_scd2_lookup" ->
      s"""WITH f AS (SELECT user_id, event_type, $tsUs AS ts_us, event_id FROM events),
         |s AS (SELECT user_id, event_type, ts_us, event_id,
         |        (lag(ts_us) OVER w IS NULL OR
         |         event_type IS DISTINCT FROM lag(event_type) OVER w) AS chg
         |      FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         |v AS (SELECT user_id, event_type, ts_us, event_id FROM s WHERE chg),
         |dim AS (
         |  SELECT user_id, ts_us AS valid_from,
         |         lead(ts_us) OVER w2 AS valid_to,
         |         CAST(row_number() OVER w2 AS BIGINT) AS version_rank
         |  FROM v WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         |ev AS (SELECT user_id, $tsUs AS ts_us FROM events)
         |SELECT d.version_rank, CAST(count(*) AS BIGINT) AS n_events,
         |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
         |FROM ev e JOIN dim d ON e.user_id = d.user_id
         |  AND e.ts_us >= d.valid_from
         |  AND (d.valid_to IS NULL OR e.ts_us < d.valid_to)
         |GROUP BY d.version_rank ORDER BY d.version_rank""".stripMargin,

    // q190: Benford audit — leading digit via the same ln-derived
    // exponent both engines compute, expectations pinned driver-side
    "q190_benford" -> {
      val expected = (1 to 9).map(dd =>
        dd -> (math.log(1.0 + 1.0 / dd) / math.log(10.0)))
      val expCase = expected.map { case (dd, f) =>
        s"WHEN digit = $dd THEN CAST(${f.toString} AS DOUBLE)"
      }.mkString("CASE ", " ", " ELSE NULL END")
      s"""WITH c AS (
         |  SELECT CAST(floor(o_totalprice /
         |           power(10.0, CAST(floor(ln(o_totalprice) / ln(10.0)) AS DOUBLE)))
         |         AS BIGINT) AS digit,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM orders WHERE o_totalprice > CAST(0.0 AS DOUBLE)
         |  GROUP BY 1),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c)
         |SELECT digit, n,
         |       ${t6("CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE)")} AS obs_freq,
         |       ${t6(expCase)} AS benford_freq
         |FROM c, t ORDER BY digit""".stripMargin
    },

    // q192: exact multi-quantiles — same rank convention as the
    // DDSketch probes (max(1, ceil(q·n))), same tie-broken sort
    "q192_exact_quantiles" ->
      s"""WITH ranked AS (
         |  SELECT l_returnflag, l_extendedprice,
         |         CAST(row_number() OVER (PARTITION BY l_returnflag
         |           ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS BIGINT) AS rn
         |  FROM lineitem),
         |probes AS (
         |  SELECT l_returnflag AS flag, q,
         |         greatest(CAST(1 AS BIGINT),
         |           CAST(ceil(q * CAST(n AS DOUBLE)) AS BIGINT)) AS rank
         |  FROM (SELECT l_returnflag, max(rn) AS n FROM ranked GROUP BY 1),
         |       (SELECT unnest([0.25e0, 0.5e0, 0.75e0, 0.95e0]) AS q))
         |SELECT p.flag AS l_returnflag, p.q, r.l_extendedprice AS value
         |FROM probes p JOIN ranked r
         |  ON p.flag = r.l_returnflag AND p.rank = r.rn
         |ORDER BY l_returnflag, q""".stripMargin,

    // q193: per-user z-score outliers — scaled-long moments, raw IEEE
    // z expression identical on both sides, truncated only at output
    "q193_zscore_outliers" ->
      s"""WITH ev AS (SELECT user_id, value FROM events),
         |m AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         |         ${xsum("value")} AS sx, ${psum6("value * value")} AS sxx
         |  FROM ev GROUP BY user_id),
         |z AS (
         |  SELECT e.user_id, m.n,
         |         (e.value - m.sx / CAST(m.n AS DOUBLE)) /
         |           sqrt(m.sxx / CAST(m.n AS DOUBLE) -
         |             (m.sx / CAST(m.n AS DOUBLE)) * (m.sx / CAST(m.n AS DOUBLE))) AS z
         |  FROM ev e JOIN m ON e.user_id = m.user_id)
         |SELECT user_id, max(n) AS n_events,
         |       CAST(count(CASE WHEN abs(z) > CAST(3.0 AS DOUBLE) THEN 1 END) AS BIGINT) AS n_outliers,
         |       ${t6("max(abs(z))")} AS max_abs_z
         |FROM z GROUP BY user_id ORDER BY user_id""".stripMargin,

    // q194: join-key skew report — exact mean frequency and max/mean
    // ratio off the per-key counts
    "q194_skew_report" ->
      s"""SELECT n_keys, max_n,
         |       ${t6("CAST(total AS DOUBLE) / CAST(n_keys AS DOUBLE)")} AS avg_n,
         |       ${t6("CAST(max_n AS DOUBLE) * CAST(n_keys AS DOUBLE) / CAST(total AS DOUBLE)")} AS skew_ratio
         |FROM (
         |  SELECT CAST(count(*) AS BIGINT) AS n_keys, CAST(max(n) AS BIGINT) AS max_n,
         |         CAST(sum(n) AS BIGINT) AS total
         |  FROM (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n
         |        FROM lineitem GROUP BY l_partkey))""".stripMargin,

    // q195: Gini of the term-frequency distribution — same ascending
    // (count, term) rank and the identical closed form
    "q195_term_gini" ->
      s"""WITH tf AS (
         |  SELECT term, CAST(count(*) AS BIGINT) AS n
         |  FROM (SELECT unnest(${toks("text")}) AS term FROM documents)
         |  GROUP BY term),
         |r AS (SELECT n, CAST(row_number() OVER (ORDER BY n, term) AS BIGINT) AS i
         |      FROM tf)
         |SELECT CAST(count(*) AS BIGINT) AS n_terms,
         |       CAST(sum(n) AS BIGINT) AS total,
         |       ${t6("CAST(2.0 AS DOUBLE) * CAST(sum(i * n) AS DOUBLE) / " +
            "(CAST(count(*) AS DOUBLE) * CAST(sum(n) AS DOUBLE)) - " +
            "CAST(count(*) + 1 AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS gini
         |FROM r""".stripMargin,

    // q196: Heaps'-law curve — first-seen credit + two running sums
    "q196_vocab_growth" ->
      s"""WITH tk AS (
         |  SELECT doc_id, unnest(${toks("text")}) AS term FROM documents),
         |fs AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS new_terms
         |  FROM (SELECT term, min(doc_id) AS doc_id FROM tk GROUP BY term)
         |  GROUP BY doc_id),
         |tc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks
         |       FROM tk GROUP BY doc_id)
         |SELECT doc_id, cum_tokens, cum_vocab FROM (
         |  SELECT tc.doc_id,
         |    CAST(sum(tc.n_toks) OVER w AS BIGINT) AS cum_tokens,
         |    CAST(sum(coalesce(fs.new_terms, 0)) OVER w AS BIGINT) AS cum_vocab
         |  FROM tc LEFT JOIN fs ON tc.doc_id = fs.doc_id
         |  WINDOW w AS (ORDER BY tc.doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |WHERE doc_id % 100 = 0 ORDER BY doc_id""".stripMargin,

    // q197: PMI collocations — the identical product-form single ln
    // (DuckDB lists are 1-based; generate_series(2, len) pairs t[i-1],
    // t[i] exactly like Spark's 0-based transform)
    "q197_pmi_collocations" ->
      s"""WITH tk AS (SELECT ${toks("text")} AS t FROM documents),
         |uni AS (
         |  SELECT term, CAST(count(*) AS BIGINT) AS n_term
         |  FROM (SELECT unnest(t) AS term FROM tk) GROUP BY term),
         |ut AS (SELECT CAST(sum(n_term) AS BIGINT) AS n_total FROM uni),
         |bigall AS (
         |  SELECT bigram, CAST(count(*) AS BIGINT) AS n_ab FROM (
         |    SELECT unnest(list_transform(generate_series(2, len(t)),
         |           i -> concat(t[i - 1], ' ', t[i]))) AS bigram
         |    FROM tk WHERE len(t) >= 2)
         |  GROUP BY bigram),
         |bt AS (SELECT CAST(sum(n_ab) AS BIGINT) AS m_total FROM bigall),
         |big AS (SELECT bigram, n_ab FROM bigall WHERE n_ab >= 5),
         |scored AS (
         |  SELECT big.bigram, big.n_ab,
         |         ${t6("ln(CAST(n_ab AS DOUBLE) * CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE) / " +
              "(CAST(m_total AS DOUBLE) * CAST(a.n_term AS DOUBLE) * CAST(b.n_term AS DOUBLE)))")} AS pmi
         |  FROM big
         |  JOIN uni a ON a.term = string_split(big.bigram, ' ')[1]
         |  JOIN uni b ON b.term = string_split(big.bigram, ' ')[2]
         |  CROSS JOIN ut CROSS JOIN bt)
         |SELECT rank, bigram, n_ab, pmi FROM (
         |  SELECT CAST(row_number() OVER (ORDER BY pmi DESC, bigram) AS BIGINT) AS rank,
         |         bigram, n_ab, pmi
         |  FROM scored)
         |WHERE rank <= 20 ORDER BY rank""".stripMargin,

    // q198: Jensen–Shannon divergence between corpus halves — 0·ln0
    // convention via CASE, order-free 12-decimal decimal sum
    "q198_corpus_divergence" -> {
      val ln2 = java.lang.Math.log(2.0).toString
      val p = "CAST(n_a AS DOUBLE) / CAST(tokens_a AS DOUBLE)"
      val q = "CAST(n_b AS DOUBLE) / CAST(tokens_b AS DOUBLE)"
      val m = s"(($p) + ($q)) / CAST(2.0 AS DOUBLE)"
      val contrib =
        s"(CASE WHEN n_a > 0 THEN ($p) * ln(($p) / ($m)) ELSE CAST(0.0 AS DOUBLE) END + " +
          s"CASE WHEN n_b > 0 THEN ($q) * ln(($q) / ($m)) ELSE CAST(0.0 AS DOUBLE) END) " +
          "* CAST(0.5 AS DOUBLE)"
      s"""WITH tk AS (
         |  SELECT CAST(doc_id % 2 AS INT) AS half, unnest(${toks("text")}) AS term
         |  FROM documents),
         |cnt AS (SELECT half, term, CAST(count(*) AS BIGINT) AS n
         |        FROM tk GROUP BY half, term),
         |a AS (SELECT term, n AS n_a FROM cnt WHERE half = 0),
         |b AS (SELECT term, n AS n_b FROM cnt WHERE half = 1),
         |ta AS (SELECT CAST(sum(n) AS BIGINT) AS tokens_a FROM cnt WHERE half = 0),
         |tb AS (SELECT CAST(sum(n) AS BIGINT) AS tokens_b FROM cnt WHERE half = 1),
         |joined AS (
         |  SELECT coalesce(a.n_a, 0) AS n_a, coalesce(b.n_b, 0) AS n_b,
         |         tokens_a, tokens_b
         |  FROM a FULL OUTER JOIN b USING (term) CROSS JOIN ta CROSS JOIN tb),
         |agg AS (
         |  SELECT CAST(count(CASE WHEN n_a > 0 THEN 1 END) AS BIGINT) AS n_terms_a,
         |         CAST(count(CASE WHEN n_b > 0 THEN 1 END) AS BIGINT) AS n_terms_b,
         |         CAST(count(CASE WHEN n_a > 0 AND n_b > 0 THEN 1 END) AS BIGINT) AS n_shared,
         |         CAST(max(tokens_a) AS BIGINT) AS tokens_a,
         |         CAST(max(tokens_b) AS BIGINT) AS tokens_b,
         |         ${dsum12(contrib)} AS jsd_raw
         |  FROM joined)
         |SELECT n_terms_a, n_terms_b, n_shared, tokens_a, tokens_b,
         |       ${t6("jsd_raw")} AS jsd,
         |       ${t6(s"jsd_raw / CAST($ln2 AS DOUBLE)")} AS jsd_bits
         |FROM agg""".stripMargin
    },

    // q199: Monroe–Colaresi–Quinn weighted log-odds with informative
    // Dirichlet prior — identical α_w / delta / variance expressions
    "q199_fightin_words" ->
      s"""WITH tk AS (SELECT lang AS grp, unnest(${toks("text")}) AS term
         |            FROM documents),
         |bygrp AS (SELECT grp, term, CAST(count(*) AS BIGINT) AS y_wi
         |          FROM tk GROUP BY grp, term),
         |corpus AS (SELECT term, CAST(sum(y_wi) AS BIGINT) AS y_w
         |           FROM bygrp GROUP BY term),
         |grptot AS (SELECT grp, CAST(sum(y_wi) AS BIGINT) AS n_i
         |           FROM bygrp GROUP BY grp),
         |alltot AS (SELECT CAST(sum(y_w) AS BIGINT) AS n FROM corpus),
         |aw AS (
         |  SELECT bygrp.grp, bygrp.term, bygrp.y_wi, corpus.y_w, grptot.n_i, alltot.n,
         |         CAST(500.0 AS DOUBLE) * CAST(y_w AS DOUBLE) / CAST(n AS DOUBLE) AS aw
         |  FROM bygrp JOIN corpus USING (term) JOIN grptot USING (grp)
         |  CROSS JOIN alltot
         |  WHERE bygrp.y_wi >= 3),
         |scored AS (
         |  SELECT grp, term, y_wi,
         |         ${t6("(ln((CAST(y_wi AS DOUBLE) + aw) / " +
              "(CAST(n_i AS DOUBLE) + CAST(500.0 AS DOUBLE) - CAST(y_wi AS DOUBLE) - aw)) - " +
              "ln((CAST(y_w AS DOUBLE) - CAST(y_wi AS DOUBLE) + aw) / " +
              "(CAST(n AS DOUBLE) - CAST(n_i AS DOUBLE) + CAST(500.0 AS DOUBLE) - " +
              "(CAST(y_w AS DOUBLE) - CAST(y_wi AS DOUBLE)) - aw))) / " +
              "sqrt(CAST(1.0 AS DOUBLE) / (CAST(y_wi AS DOUBLE) + aw) + " +
              "CAST(1.0 AS DOUBLE) / (CAST(y_w AS DOUBLE) - CAST(y_wi AS DOUBLE) + aw))")} AS z
         |  FROM aw)
         |SELECT grp, rank, term, y_wi, z FROM (
         |  SELECT grp, term, y_wi, z,
         |         CAST(row_number() OVER (PARTITION BY grp ORDER BY z DESC, term) AS BIGINT) AS rank
         |  FROM scored)
         |WHERE rank <= 3 ORDER BY grp, rank""".stripMargin,

    // q200: first/last-touch attribution — IGNORE NULLS first/last over
    // the identical preceding-rows frame; no-history conversions land
    // in '(none)'
    "q200_attribution" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, $tsUs AS us FROM events),
         |t AS (
         |  SELECT user_id, event_type,
         |         first_value(CASE WHEN event_type != 'purchase' THEN event_type END
         |           IGNORE NULLS) OVER w AS first_touch,
         |         last_value(CASE WHEN event_type != 'purchase' THEN event_type END
         |           IGNORE NULLS) OVER w AS last_touch
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         |p AS (SELECT * FROM t WHERE event_type = 'purchase'),
         |u AS (SELECT 'first' AS touch, coalesce(first_touch, '(none)') AS channel FROM p
         |      UNION ALL
         |      SELECT 'last' AS touch, coalesce(last_touch, '(none)') AS channel FROM p)
         |SELECT touch, channel, CAST(count(*) AS BIGINT) AS n_conversions
         |FROM u GROUP BY touch, channel ORDER BY touch, channel""".stripMargin,

    // q201: daily peak session concurrency — q09's gap rule builds the
    // intervals, then the sweep line (starts before ends at a tied
    // instant) and a daily max of the running sum
    "q201_session_concurrency" ->
      s"""WITH e AS (SELECT user_id, event_id, $tsUs AS us FROM events),
         |g AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 3600000000
         |                     THEN 1 ELSE 0 END AS ns
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |s AS (SELECT *, CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
         |                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM g),
         |iv AS (SELECT user_id, sid, min(us) AS s_us, max(us) AS e_us
         |       FROM s GROUP BY user_id, sid),
         |pts AS (SELECT s_us AS us, CAST(1 AS BIGINT) AS delta FROM iv
         |        UNION ALL SELECT e_us AS us, CAST(-1 AS BIGINT) AS delta FROM iv),
         |c AS (SELECT us, delta,
         |        CAST(sum(delta) OVER (ORDER BY us, delta DESC
         |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
         |      FROM pts)
         |SELECT CAST(us // 86400000000 AS BIGINT) AS day,
         |       CAST(max(conc) AS BIGINT) AS max_concurrent,
         |       CAST(count(CASE WHEN delta = 1 THEN 1 END) AS BIGINT) AS n_starts
         |FROM c GROUP BY 1 ORDER BY day""".stripMargin,

    // q202: Iglewicz–Hoaglin modified z-score outliers — exact
    // median/MAD via the mid-rank convention, 0.6745 pinned, the
    // identical z expression on both sides
    "q202_mad_outliers" ->
      s"""WITH base AS (SELECT l_returnflag, l_extendedprice AS v,
         |                     l_orderkey, l_linenumber FROM lineitem),
         |r1 AS (SELECT *,
         |         CAST(row_number() OVER (PARTITION BY l_returnflag
         |           ORDER BY v, l_orderkey, l_linenumber) AS BIGINT) AS rn,
         |         CAST(count(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
         |       FROM base),
         |med AS (SELECT l_returnflag, (min(v) + max(v)) / CAST(2.0 AS DOUBLE) AS med
         |        FROM r1 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
         |        GROUP BY l_returnflag),
         |dev AS (SELECT b.l_returnflag, b.v, b.l_orderkey, b.l_linenumber,
         |               med, abs(b.v - med) AS dev
         |        FROM base b JOIN med USING (l_returnflag)),
         |r2 AS (SELECT *,
         |         CAST(row_number() OVER (PARTITION BY l_returnflag
         |           ORDER BY dev, l_orderkey, l_linenumber) AS BIGINT) AS rn,
         |         CAST(count(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
         |       FROM dev),
         |mad AS (SELECT l_returnflag, (min(dev) + max(dev)) / CAST(2.0 AS DOUBLE) AS mad
         |        FROM r2 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
         |        GROUP BY l_returnflag)
         |SELECT d.l_returnflag, CAST(count(*) AS BIGINT) AS n,
         |       ${t6("max(med)")} AS median, ${t6("max(mad)")} AS mad,
         |       CAST(count(CASE WHEN mad > 0 AND abs(CAST(0.6745 AS DOUBLE) * (v - med) / mad)
         |         > CAST(3.5 AS DOUBLE) THEN 1 END) AS BIGINT) AS n_outliers
         |FROM dev d JOIN mad USING (l_returnflag)
         |GROUP BY d.l_returnflag ORDER BY d.l_returnflag""".stripMargin,

    // q203: Poisson-bootstrap CI — inverse-CDF Poisson(1) weights at
    // Lehmer-stream uniforms off ONE md5 seed per row (thresholds and
    // the 48271^(r+1) mod 2³¹−1 multipliers are the SAME pinned arrays
    // the Spark plan inlines; all modular math is exact BIGINT)
    "q203_poisson_bootstrap" -> {
      val cdf = graft.operators.Stats.PoissonCdf1
      val wCase = "CASE " + cdf.zipWithIndex.map { case (c, k) =>
        s"WHEN u < CAST(${c.toString} AS DOUBLE) THEN CAST($k AS BIGINT) "
      }.mkString + s"ELSE CAST(${cdf.length} AS BIGINT) END"
      val lo = math.max(1, math.ceil(0.05 * 32).toInt)
      val hi = math.max(1, math.ceil(0.95 * 32).toInt)
      val m = graft.operators.Stats.LehmerM
      val mults = graft.operators.Stats.lehmerPowers(32).zipWithIndex
        .map { case (a, r) => s"($r, $a)" }.mkString(", ")
      s"""WITH base AS (SELECT CAST(o_orderkey AS VARCHAR) AS id,
         |                     CAST(o_totalprice AS DOUBLE) AS x FROM orders),
         |overall AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |                   ${xsum("x")} / count(*) AS mean_raw FROM base),
         |seeded AS (SELECT x,
         |             CAST(${md5Long("concat('pb|', id)")} % $m AS BIGINT) AS h
         |           FROM base),
         |reps AS (SELECT x, h, r, ar
         |         FROM seeded, (VALUES $mults) AS t(r, ar)),
         |uw AS (SELECT r, x,
         |         CAST((h * ar) % $m AS DOUBLE) / CAST($m AS DOUBLE) AS u
         |       FROM reps),
         |ww AS (SELECT r, x, $wCase AS w FROM uw),
         |means AS (
         |  SELECT r, ${psum6("CAST(w AS DOUBLE) * x")} / CAST(sum(w) AS DOUBLE) AS m
         |  FROM ww GROUP BY r),
         |ranked AS (SELECT m, CAST(row_number() OVER (ORDER BY m, r) AS BIGINT) AS rn
         |           FROM means),
         |ci AS (SELECT ${t6("min(m)")} AS boot_p05, ${t6("max(m)")} AS boot_p95
         |       FROM ranked WHERE rn = $lo OR rn = $hi)
         |SELECT n, CAST(32 AS BIGINT) AS n_replicates, ${t6("mean_raw")} AS mean,
         |       boot_p05, boot_p95
         |FROM ci CROSS JOIN overall""".stripMargin
    },

    // q204: two-sample Kolmogorov–Smirnov — exact D over distinct
    // values, Smirnov critical value off the shared pinned c(0.05)
    "q204_ks_test" -> {
      val c05 = SparkEntry.KsC05.toString
      s"""WITH f AS (
         |  SELECT o_totalprice AS v,
         |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS a,
         |         CASE WHEN o_orderpriority = '1-URGENT' THEN 0 ELSE 1 END AS b
         |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
         |counts AS (SELECT v, CAST(sum(a) AS BIGINT) AS na,
         |                  CAST(sum(b) AS BIGINT) AS nb FROM f GROUP BY v),
         |tot AS (SELECT CAST(sum(na) AS BIGINT) AS n1,
         |               CAST(sum(nb) AS BIGINT) AS n2 FROM counts),
         |cum AS (SELECT CAST(sum(na) OVER w AS BIGINT) AS ca,
         |               CAST(sum(nb) OVER w AS BIGINT) AS cb
         |        FROM counts
         |        WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
         |agg AS (SELECT max(abs(CAST(ca AS DOUBLE) / CAST(n1 AS DOUBLE) -
         |                       CAST(cb AS DOUBLE) / CAST(n2 AS DOUBLE))) AS d_raw,
         |               CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2
         |        FROM cum CROSS JOIN tot)
         |SELECT n1, n2, ${t6("d_raw")} AS d_stat,
         |       ${t6(s"CAST($c05 AS DOUBLE) * sqrt((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) / " +
            "(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))")} AS d_crit,
         |       ${t6("d_raw")} > ${t6(s"CAST($c05 AS DOUBLE) * sqrt((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) / " +
            "(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))")} AS reject
         |FROM agg""".stripMargin
    },

    // q205: association rules — the oracle recomputes pairs via the
    // row-level distinct self-join (independent of Spark's row-local
    // array fan-out), identical product-form lift
    "q205_association_rules" ->
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS bid, l_partkey AS item
         |           FROM lineitem),
         |nb AS (SELECT CAST(count(DISTINCT bid) AS BIGINT) AS n_baskets FROM b),
         |ic AS (SELECT item, CAST(count(*) AS BIGINT) AS n_item FROM b GROUP BY item),
         |pr AS (SELECT a.item AS ia, c.item AS ib, CAST(count(*) AS BIGINT) AS n_ab
         |       FROM b a JOIN b c ON a.bid = c.bid AND a.item < c.item
         |       GROUP BY 1, 2 HAVING count(*) >= 3),
         |dr AS (SELECT ia AS antecedent, ib AS consequent, n_ab FROM pr
         |       UNION ALL SELECT ib AS antecedent, ia AS consequent, n_ab FROM pr),
         |sc AS (SELECT antecedent, consequent, n_ab,
         |         ${t6("CAST(n_ab AS DOUBLE) / CAST(n_baskets AS DOUBLE)")} AS support,
         |         ${t6("CAST(n_ab AS DOUBLE) / CAST(a.n_item AS DOUBLE)")} AS confidence,
         |         ${t6("CAST(n_ab AS DOUBLE) * CAST(n_baskets AS DOUBLE) / " +
              "(CAST(a.n_item AS DOUBLE) * CAST(c.n_item AS DOUBLE))")} AS lift
         |       FROM dr JOIN ic a ON a.item = dr.antecedent
         |       JOIN ic c ON c.item = dr.consequent CROSS JOIN nb)
         |SELECT rank, antecedent, consequent, n_ab, support, confidence, lift
         |FROM (SELECT *, CAST(row_number() OVER
         |        (ORDER BY lift DESC, antecedent, consequent) AS BIGINT) AS rank
         |      FROM sc)
         |WHERE rank <= 15 ORDER BY rank""".stripMargin,

    // q207: funnel time-to-convert — q93's strictly-after chain, then
    // exact median/min/max of the per-transition latencies (mid-rank
    // convention, user-id tiebreak)
    "q207_funnel_latency" ->
      s"""WITH e AS (SELECT user_id, event_type, $tsUs AS ts_us FROM events),
         |s1 AS (SELECT user_id, min(ts_us) AS t1 FROM e
         |       WHERE event_type = 'view' GROUP BY 1),
         |s2 AS (SELECT e.user_id, min(ts_us) AS t2 FROM e
         |       JOIN s1 ON e.user_id = s1.user_id AND e.ts_us > s1.t1
         |       WHERE event_type = 'click' GROUP BY 1),
         |s3 AS (SELECT e.user_id, min(ts_us) AS t3 FROM e
         |       JOIN s2 ON e.user_id = s2.user_id AND e.ts_us > s2.t2
         |       WHERE event_type = 'purchase' GROUP BY 1),
         |lat AS (
         |  SELECT 'view->click' AS step, s2.user_id, t2 - t1 AS lat_us
         |  FROM s1 JOIN s2 ON s1.user_id = s2.user_id
         |  UNION ALL
         |  SELECT 'click->purchase' AS step, s3.user_id, t3 - t2 AS lat_us
         |  FROM s2 JOIN s3 ON s2.user_id = s3.user_id),
         |stats AS (SELECT step, CAST(count(*) AS BIGINT) AS n_converted,
         |                 CAST(min(lat_us) AS BIGINT) AS min_us,
         |                 CAST(max(lat_us) AS BIGINT) AS max_us
         |          FROM lat GROUP BY step),
         |r AS (SELECT step, lat_us,
         |        CAST(row_number() OVER (PARTITION BY step
         |          ORDER BY lat_us, user_id) AS BIGINT) AS rn,
         |        CAST(count(*) OVER (PARTITION BY step) AS BIGINT) AS n
         |      FROM lat),
         |med AS (SELECT step,
         |          ${t6("(min(lat_us) + max(lat_us)) / CAST(2.0 AS DOUBLE)")} AS median_us
         |        FROM r WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
         |        GROUP BY step)
         |SELECT stats.step, n_converted, median_us, min_us, max_us
         |FROM stats JOIN med ON stats.step = med.step
         |ORDER BY stats.step""".stripMargin,

    // q208: bigram-LM next-token table — same adjacent-pair extraction
    // as q197, conditional mass over each context's bigram total
    "q208_next_token" ->
      s"""WITH tk AS (SELECT ${toks("text")} AS t FROM documents),
         |big AS (
         |  SELECT p.ctx AS ctx, p.nxt AS nxt, CAST(count(*) AS BIGINT) AS n_ab FROM (
         |    SELECT unnest(list_transform(generate_series(2, len(t)),
         |           i -> struct_pack(ctx := t[i - 1], nxt := t[i]))) AS p
         |    FROM tk WHERE len(t) >= 2)
         |  GROUP BY 1, 2),
         |ct AS (SELECT ctx, CAST(sum(n_ab) AS BIGINT) AS n_ctx FROM big GROUP BY ctx),
         |hot AS (SELECT ctx, n_ctx, crank FROM (
         |          SELECT ctx, n_ctx,
         |            CAST(row_number() OVER (ORDER BY n_ctx DESC, ctx) AS BIGINT) AS crank
         |          FROM ct)
         |        WHERE crank <= 5)
         |SELECT crank, ctx, rank, nxt, n_ab,
         |       ${t6("CAST(n_ab AS DOUBLE) / CAST(n_ctx AS DOUBLE)")} AS p
         |FROM (
         |  SELECT hot.crank, big.ctx, big.nxt, big.n_ab, hot.n_ctx,
         |         CAST(row_number() OVER (PARTITION BY big.ctx
         |           ORDER BY big.n_ab DESC, big.nxt) AS BIGINT) AS rank
         |  FROM big JOIN hot ON big.ctx = hot.ctx)
         |WHERE rank <= 3 ORDER BY crank, rank""".stripMargin,

    // q209: weekday seasonality — calendar-free epoch_day % 7, exact
    // scaled-long means on both the dow cells and the type overall
    "q209_dow_seasonality" ->
      s"""WITH base AS (SELECT event_type,
         |                CAST($tsUs // 86400000000 % 7 AS BIGINT) AS dow, value
         |              FROM events),
         |bydow AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n,
         |                 ${xsum("value")} AS sv
         |          FROM base GROUP BY event_type, dow),
         |overall AS (SELECT event_type,
         |                   ${xsum("value")} / CAST(count(*) AS DOUBLE) AS mean_all
         |            FROM base GROUP BY event_type)
         |SELECT b.event_type, dow, n,
         |       ${t6("sv / CAST(n AS DOUBLE)")} AS mean_value,
         |       ${t6("(sv / CAST(n AS DOUBLE)) / mean_all")} AS seasonal_index
         |FROM bydow b JOIN overall o ON b.event_type = o.event_type
         |ORDER BY b.event_type, dow""".stripMargin,

    // q210: CUSUM changepoint — integer-only statistic
    // D·cumsum(T) − d·ΣT over 8-decimal scaled daily totals, argmax
    // tie-broken to the earliest day
    "q210_cusum_changepoint" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST($tsUs // 86400000000 AS BIGINT) AS day,
         |         CAST(sum(CAST(floor(value * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS t
         |  FROM events GROUP BY event_type, day),
         |tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
         |               CAST(sum(t) AS BIGINT) AS sum_t
         |        FROM daily GROUP BY event_type),
         |sc AS (
         |  SELECT d.event_type, d.day, n_days,
         |         n_days * CAST(sum(t) OVER (PARTITION BY d.event_type ORDER BY day
         |           ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |           - CAST(row_number() OVER (PARTITION BY d.event_type ORDER BY day) AS BIGINT)
         |             * sum_t AS s_scaled
         |  FROM daily d JOIN tot ON d.event_type = tot.event_type)
         |SELECT event_type, n_days, day AS cp_day,
         |       ${t6("CAST(abs(s_scaled) AS DOUBLE) / (CAST(n_days AS DOUBLE) * 1e8)")} AS max_abs_cusum
         |FROM (SELECT *, row_number() OVER (PARTITION BY event_type
         |        ORDER BY abs(s_scaled) DESC, day) AS rn FROM sc)
         |WHERE rn = 1 ORDER BY event_type""".stripMargin,

    // q211: exact midrank AUC via Mann–Whitney — integer rank sums,
    // one double division at the end
    "q211_auc" ->
      s"""WITH counts AS (
         |  SELECT o_totalprice AS s, CAST(count(*) AS BIGINT) AS cnt,
         |         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
         |  FROM orders GROUP BY o_totalprice),
         |r AS (SELECT cnt, n_pos,
         |        2 * (CAST(sum(cnt) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |             - cnt) + cnt + 1 AS r2
         |      FROM counts)
         |SELECT CAST(sum(n_pos) AS BIGINT) AS n_pos,
         |       CAST(sum(cnt - n_pos) AS BIGINT) AS n_neg,
         |       ${t6("CAST(CAST(sum(n_pos * r2) AS BIGINT) - CAST(sum(n_pos) AS BIGINT) * (CAST(sum(n_pos) AS BIGINT) + 1) AS DOUBLE) / " +
            "CAST(2 * CAST(sum(n_pos) AS BIGINT) * CAST(sum(cnt - n_pos) AS BIGINT) AS DOUBLE)")} AS auc
         |FROM r""".stripMargin,

    // q212: weighted quantiles — lower-median convention decided by the
    // integer predicate 4·cumw ≥ k·W, tie-broken total order
    "q212_weighted_quantiles" ->
      s"""WITH ranked AS (
         |  SELECT l_returnflag, l_extendedprice AS v,
         |         CAST(row_number() OVER (PARTITION BY l_returnflag
         |           ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS BIGINT) AS rn,
         |         CAST(sum(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_returnflag
         |           ORDER BY l_extendedprice, l_orderkey, l_linenumber
         |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw
         |  FROM lineitem),
         |tot AS (SELECT l_returnflag, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w_total
         |        FROM lineitem GROUP BY l_returnflag),
         |hit AS (SELECT r.l_returnflag, k, min(rn) AS rn
         |        FROM ranked r JOIN tot USING (l_returnflag),
         |             (SELECT unnest([1, 2, 3]) AS k)
         |        WHERE 4 * cumw >= k * w_total
         |        GROUP BY r.l_returnflag, k)
         |SELECT h.l_returnflag, CAST(k AS DOUBLE) / CAST(4.0 AS DOUBLE) AS q,
         |       w_total, r.v AS value
         |FROM hit h
         |JOIN ranked r ON h.l_returnflag = r.l_returnflag AND h.rn = r.rn
         |JOIN tot ON tot.l_returnflag = h.l_returnflag
         |ORDER BY h.l_returnflag, q""".stripMargin,

    // q213: exact mutual information + marginal entropies — one
    // product-form ln per cell, 12-decimal order-free sums
    "q213_mutual_information" ->
      s"""WITH cells AS (SELECT CAST(l_quantity AS BIGINT) AS x, l_returnflag AS y,
         |                      CAST(count(*) AS BIGINT) AS n_xy
         |               FROM lineitem GROUP BY 1, 2),
         |mx AS (SELECT x, CAST(sum(n_xy) AS BIGINT) AS n_x FROM cells GROUP BY x),
         |my AS (SELECT y, CAST(sum(n_xy) AS BIGINT) AS n_y FROM cells GROUP BY y),
         |tot AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n FROM cells),
         |mi AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
         |              ${dsum12("(CAST(n_xy AS DOUBLE) / CAST(n AS DOUBLE)) * " +
              "ln(CAST(n AS DOUBLE) * CAST(n_xy AS DOUBLE) / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)))")} AS mi_raw
         |       FROM cells JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot),
         |hx AS (SELECT ${dsum12("-(CAST(n_x AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(n_x AS DOUBLE) / CAST(n AS DOUBLE))")} AS h_x
         |       FROM mx CROSS JOIN tot),
         |hy AS (SELECT ${dsum12("-(CAST(n_y AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(n_y AS DOUBLE) / CAST(n AS DOUBLE))")} AS h_y
         |       FROM my CROSS JOIN tot)
         |SELECT n_cells, ${t6("mi_raw")} AS mi, ${t6("h_x")} AS h_x, ${t6("h_y")} AS h_y,
         |       ${t6("mi_raw / sqrt(h_x * h_y)")} AS nmi
         |FROM mi CROSS JOIN hx CROSS JOIN hy""".stripMargin,

    // q214: top clickstream paths — q09's gap sessions, ordered string
    // aggregation of the first 8 steps
    "q214_session_paths" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, $tsUs AS us FROM events),
         |g AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 3600000000
         |                     THEN 1 ELSE 0 END AS ns
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |s AS (SELECT *, CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
         |                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM g),
         |st AS (SELECT *, row_number() OVER (PARTITION BY user_id, sid
         |                   ORDER BY us, event_id) AS step FROM s),
         |p AS (SELECT user_id, sid, string_agg(event_type, '>' ORDER BY us, event_id) AS path
         |      FROM st WHERE step <= 8 GROUP BY user_id, sid),
         |c AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions FROM p GROUP BY path)
         |SELECT rank, path, n_sessions FROM (
         |  SELECT path, n_sessions,
         |         CAST(row_number() OVER (ORDER BY n_sessions DESC, path) AS BIGINT) AS rank
         |  FROM c)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,

    // q215: NB margin calibration — same scored CTEs as q107, top-2
    // margin, rank-derived integer decile bins, accuracy per bin
    "q215_nb_calibration" ->
      s"""$naiveBayesCtes,
         |top2 AS (SELECT doc_id, cls, score,
         |           row_number() OVER (PARTITION BY doc_id
         |             ORDER BY score DESC, cls) AS rn
         |         FROM scored),
         |pm AS (SELECT a.doc_id, a.cls AS pred_lang, a.score - b.score AS margin
         |       FROM top2 a JOIN top2 b ON a.doc_id = b.doc_id
         |       WHERE a.rn = 1 AND b.rn = 2),
         |lab AS (SELECT pm.doc_id, margin,
         |               CASE WHEN pred_lang = d.lang THEN 1 ELSE 0 END AS correct
         |        FROM pm JOIN documents d ON pm.doc_id = d.doc_id),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM lab),
         |r AS (SELECT margin, correct,
         |        CAST(row_number() OVER (ORDER BY margin, doc_id) AS BIGINT) AS rn
         |      FROM lab)
         |SELECT CAST((rn - 1) * 10 // n_all AS BIGINT) AS bin,
         |       CAST(count(*) AS BIGINT) AS n,
         |       CAST(sum(correct) AS BIGINT) AS n_correct,
         |       ${t6("CAST(sum(correct) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS accuracy,
         |       ${t6(zsum8("margin") + " / CAST(count(*) AS DOUBLE)")} AS mean_margin
         |FROM r CROSS JOIN tot
         |GROUP BY bin ORDER BY bin""".stripMargin,

    // q216: Lorenz concentration — descending-rank deciles over
    // 8-decimal scaled-long entity totals, integer running share
    "q216_lorenz_deciles" ->
      s"""WITH spend AS (
         |  SELECT o_custkey AS k,
         |         CAST(sum(CAST(floor(o_totalprice * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS s8
         |  FROM orders GROUP BY o_custkey),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all,
         |               CAST(sum(s8) AS BIGINT) AS t8 FROM spend),
         |binned AS (
         |  SELECT CAST((rn - 1) * 10 // n_all AS BIGINT) AS bin,
         |         CAST(count(*) AS BIGINT) AS n_entities,
         |         CAST(sum(s8) AS BIGINT) AS b8, CAST(max(t8) AS BIGINT) AS t8
         |  FROM (SELECT s8, CAST(row_number() OVER (ORDER BY s8 DESC, k) AS BIGINT) AS rn
         |        FROM spend) CROSS JOIN tot
         |  GROUP BY bin)
         |SELECT bin, n_entities,
         |       ${t6("CAST(b8 AS DOUBLE) / CAST(t8 AS DOUBLE)")} AS share,
         |       ${t6("CAST(c8 AS DOUBLE) / CAST(t8 AS DOUBLE)")} AS cum_share
         |FROM (SELECT *, CAST(sum(b8) OVER (ORDER BY bin
         |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c8 FROM binned)
         |ORDER BY bin""".stripMargin,

    // q217: degree assortativity over the part co-occurrence graph
    // (pairs co-ordered ≥ 2×) — integer Newman moment sums, one final
    // double division
    "q217_assortativity" ->
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS bid, l_partkey AS item
         |           FROM lineitem),
         |pr AS (SELECT a.item AS ia, c.item AS ib
         |       FROM b a JOIN b c ON a.bid = c.bid AND a.item < c.item
         |       GROUP BY 1, 2 HAVING count(*) >= 2),
         |ed0 AS (SELECT ia AS src, ib AS dst FROM pr
         |        UNION ALL SELECT ib AS src, ia AS dst FROM pr),
         |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM ed0 GROUP BY 1),
         |xy AS (SELECT dx.deg AS x, dy.deg AS y
         |       FROM ed0 JOIN deg dx ON dx.src = ed0.src
         |       JOIN deg dy ON dy.src = ed0.dst),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
         |             CAST(sum(x * y) AS BIGINT) AS sxy,
         |             CAST(sum(x * x) AS BIGINT) AS sxx
         |      FROM xy)
         |SELECT n AS n_directed_edges,
         |       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
         |            ELSE ${t6("CAST(n * sxy - sx * sx AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)")}
         |       END AS assortativity
         |FROM m""".stripMargin,

    // q219: daily-value ACF — scaled-long daily totals, double
    // deviations, order-free 12-decimal product sums, day-index lags
    "q219_daily_acf" ->
      s"""WITH daily AS (
         |  SELECT CAST($tsUs // 86400000000 AS BIGINT) AS day,
         |         CAST(sum(CAST(floor(value * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS t8
         |  FROM events GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
         |               CAST(sum(t8) AS BIGINT) AS sum8 FROM daily),
         |dev AS (SELECT day,
         |          CAST(t8 AS DOUBLE) / 1e8 -
         |            CAST(sum8 AS DOUBLE) / (CAST(n_days AS DOUBLE) * 1e8) AS dev
         |        FROM daily CROSS JOIN tot),
         |den AS (SELECT ${dsum12("dev * dev")} AS ss FROM dev),
         |lagged AS (
         |  SELECT lag, a.dev AS dev_a, b.dev AS dev_b
         |  FROM dev a, (SELECT unnest(generate_series(1, 7)) AS lag) l
         |  JOIN dev b ON b.day = a.day + lag)
         |SELECT CAST(lag AS BIGINT) AS lag, CAST(count(*) AS BIGINT) AS n_pairs,
         |       ${t6(dsum12("dev_a * dev_b") + " / ss")} AS acf
         |FROM lagged CROSS JOIN den
         |GROUP BY lag, ss ORDER BY lag""".stripMargin,

    // q220: inter-event burstiness — whole-second gaps keep the moment
    // sums in exact longs; CV and B from one double step at the end
    "q220_burstiness" ->
      s"""WITH g AS (
         |  SELECT event_type,
         |         (us - lag(us) OVER (PARTITION BY event_type, user_id
         |            ORDER BY us, event_id)) // 1000000 AS gap_s
         |  FROM (SELECT event_type, user_id, event_id, $tsUs AS us FROM events)),
         |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
         |             CAST(sum(gap_s) AS BIGINT) AS sg,
         |             CAST(sum(gap_s * gap_s) AS BIGINT) AS sgg
         |      FROM g WHERE gap_s IS NOT NULL GROUP BY event_type)
         |SELECT event_type, n_gaps,
         |       ${t6("CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)")} AS mean_gap_s,
         |       ${t6("sqrt(CAST(sgg AS DOUBLE) / CAST(n_gaps AS DOUBLE) - " +
            "(CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)) * (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))) / " +
            "(CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))")} AS cv,
         |       ${t6("(sqrt(CAST(sgg AS DOUBLE) / CAST(n_gaps AS DOUBLE) - " +
            "(CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)) * (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))) / " +
            "(CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)) - CAST(1.0 AS DOUBLE)) / " +
            "(sqrt(CAST(sgg AS DOUBLE) / CAST(n_gaps AS DOUBLE) - " +
            "(CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)) * (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))) / " +
            "(CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)) + CAST(1.0 AS DOUBLE))")} AS burstiness
         |FROM m ORDER BY event_type""".stripMargin,

    // q223: BFS hop histogram from part 0 over the ≥2× co-occurrence
    // graph — q164's unrolled relaxation rounds, counts per level
    "q223_hop_histogram" -> {
      val rounds = (1 to 4).map { i =>
        s"""p$i AS (SELECT e.dst AS v, min(d.dist + 1) AS nd
           |        FROM ed0 e JOIN d${i - 1} d ON d.v = e.src AND d.dist IS NOT NULL
           |        GROUP BY e.dst),
           |d$i AS (SELECT d.v,
           |          CASE WHEN d.dist IS NULL THEN p.nd
           |               WHEN p.nd IS NULL THEN d.dist
           |               ELSE least(d.dist, p.nd) END AS dist
           |        FROM d${i - 1} d LEFT JOIN p$i p USING (v))""".stripMargin
      }.mkString(",\n")
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS bid, l_partkey AS item
         |           FROM lineitem),
         |pr AS (SELECT a.item AS ia, c.item AS ib
         |       FROM b a JOIN b c ON a.bid = c.bid AND a.item < c.item
         |       GROUP BY 1, 2 HAVING count(*) >= 2),
         |ed0 AS (SELECT ia AS src, ib AS dst FROM pr
         |        UNION ALL SELECT ib AS src, ia AS dst FROM pr),
         |d0 AS (SELECT DISTINCT src AS v,
         |         CASE WHEN src = 0 THEN CAST(0 AS BIGINT) ELSE NULL END AS dist
         |       FROM ed0),
         |$rounds
         |SELECT CAST(dist AS BIGINT) AS dist, CAST(count(*) AS BIGINT) AS n_vertices
         |FROM d4 WHERE dist IS NOT NULL
         |GROUP BY dist ORDER BY dist""".stripMargin
    },

    // q224: expanding z-score — strictly-prior centi-scaled integer
    // moments, identical double math, NULL z under 2 priors / zero
    // variance
    "q224_expanding_zscore" -> {
      val mean2 = "CAST(s_prior AS DOUBLE) / CAST(n_prior AS DOUBLE)"
      val sd2 = s"sqrt(CAST(q_prior AS DOUBLE) / CAST(n_prior AS DOUBLE) - ($mean2) * ($mean2))"
      val zRaw = s"(CAST(v2 AS DOUBLE) - ($mean2)) / ($sd2)"
      val zCase =
        s"CASE WHEN n_prior >= 2 AND $sd2 > CAST(0.0 AS DOUBLE) THEN ${t6(zRaw)} ELSE NULL END"
      s"""WITH base AS (
         |  SELECT user_id, event_id, $tsUs AS us,
         |         CAST(floor(value * CAST(100.0 AS DOUBLE) + 0.5) AS BIGINT) AS v2
         |  FROM events),
         |m AS (
         |  SELECT user_id, event_id, v2,
         |         CAST(count(*) OVER w AS BIGINT) AS n_prior,
         |         CAST(sum(v2) OVER w AS BIGINT) AS s_prior,
         |         CAST(sum(v2 * v2) OVER w AS BIGINT) AS q_prior
         |  FROM base
         |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         |SELECT user_id, event_id, $zCase AS z,
         |       coalesce(abs($zCase) > CAST(3.0 AS DOUBLE), false) AS is_anomaly
         |FROM m ORDER BY user_id, event_id""".stripMargin
    },

    // q225: Spearman rho — exact twice-the-midranks via cumulative
    // counts over distinct values, Pearson on integer-valued doubles
    "q225_spearman" -> {
      def rankCte(src: String, c: String) =
        s"""c$c AS (SELECT $c AS v, CAST(count(*) AS BIGINT) AS na FROM $src GROUP BY $c),
           |r$c AS (SELECT v AS $c,
           |          2 * (CAST(sum(na) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT)
           |               - na) + na + 1 AS r2$c
           |        FROM c$c)""".stripMargin
      val dd = (c: String) => s"CAST($c AS DOUBLE)"
      s"""WITH r0 AS (SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem),
         |${rankCte("r0", "x")},
         |${rankCte("r0", "y")},
         |j AS (SELECT r2x, r2y FROM r0 JOIN rx USING (x) JOIN ry USING (y)),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |               CAST(sum(r2x) AS BIGINT) AS sx, CAST(sum(r2y) AS BIGINT) AS sy,
         |               ${dsum12(s"${dd("r2x")} * ${dd("r2y")}")} AS sxy,
         |               ${dsum12(s"${dd("r2x")} * ${dd("r2x")}")} AS sxx,
         |               ${dsum12(s"${dd("r2y")} * ${dd("r2y")}")} AS syy
         |        FROM j)
         |SELECT n,
         |       ${t6(s"(${dd("n")} * sxy - ${dd("sx")} * ${dd("sy")}) / " +
              s"sqrt((${dd("n")} * sxx - ${dd("sx")} * ${dd("sx")}) * " +
              s"(${dd("n")} * syy - ${dd("sy")} * ${dd("sy")}))")} AS rho
         |FROM agg""".stripMargin
    },

    // q226: chi-square independence + Cramér's V — q213's contingency
    // plan with (O−E)²/E terms on the 12-decimal grid
    "q226_chi_square" -> {
      val dd = (c: String) => s"CAST($c AS DOUBLE)"
      val e = s"${dd("n_x")} * ${dd("n_y")} / ${dd("n")}"
      s"""WITH base AS (SELECT event_type AS x,
         |                     CAST($tsUs // 86400000000 % 7 AS BIGINT) AS y
         |              FROM events),
         |cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n_xy FROM base GROUP BY x, y),
         |mx AS (SELECT x, CAST(sum(n_xy) AS BIGINT) AS n_x FROM cells GROUP BY x),
         |my AS (SELECT y, CAST(sum(n_xy) AS BIGINT) AS n_y FROM cells GROUP BY y),
         |tot AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n,
         |               CAST(count(DISTINCT x) AS BIGINT) AS r,
         |               CAST(count(DISTINCT y) AS BIGINT) AS c FROM cells),
         |fx AS (SELECT mx.x, my.y, n_x, n_y, coalesce(n_xy, 0) AS n_xy
         |         FROM mx CROSS JOIN my
         |         LEFT JOIN cells ON cells.x = mx.x AND cells.y = my.y),
         |agg AS (SELECT max(n) AS n, max(r) AS r, max(c) AS c,
         |               ${dsum12(s"(${dd("n_xy")} - $e) * (${dd("n_xy")} - $e) / ($e)")} AS chi2_raw
         |        FROM fx CROSS JOIN tot)
         |SELECT n, r, c, (r - 1) * (c - 1) AS dof,
         |       ${t6("chi2_raw")} AS chi2,
         |       ${t6(s"sqrt(chi2_raw / (${dd("n")} * ${dd("least(r - 1, c - 1)")}))")} AS cramers_v
         |FROM agg""".stripMargin
    },

    // q227: Welch two-sample t — exact centi-scaled long moments, the
    // scale-invariant t/df computed in v2 units
    "q227_welch_ttest" ->
      s"""WITH base AS (SELECT CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS a,
         |                     CAST(floor(value * CAST(100.0 AS DOUBLE) + 0.5) AS BIGINT) AS v2
         |              FROM events),
         |g AS (SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(a * v2) AS BIGINT) AS sa,
         |             CAST(sum(a * v2 * v2) AS BIGINT) AS qa,
         |             CAST(sum(1 - a) AS BIGINT) AS nb, CAST(sum((1 - a) * v2) AS BIGINT) AS sb,
         |             CAST(sum((1 - a) * v2 * v2) AS BIGINT) AS qb
         |      FROM base),
         |w AS (SELECT na, nb, sa, sb,
         |             (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))
         |               / (CAST(na AS DOUBLE) - CAST(1.0 AS DOUBLE)) / CAST(na AS DOUBLE) AS sea,
         |             (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
         |               / (CAST(nb AS DOUBLE) - CAST(1.0 AS DOUBLE)) / CAST(nb AS DOUBLE) AS seb
         |      FROM g)
         |SELECT na AS n_a, nb AS n_b,
         |       ${t6("CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / CAST(100.0 AS DOUBLE)")} AS mean_a,
         |       ${t6("CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / CAST(100.0 AS DOUBLE)")} AS mean_b,
         |       ${t6("(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)) / sqrt(sea + seb)")} AS t,
         |       ${t6("(sea + seb) * (sea + seb) / (sea * sea / (CAST(na AS DOUBLE) - CAST(1.0 AS DOUBLE)) + seb * seb / (CAST(nb AS DOUBLE) - CAST(1.0 AS DOUBLE)))")} AS df
         |FROM w""".stripMargin,

    // q228: Benjamini–Hochberg over per-type weekend Welch tests — the
    // A&S 26.2.17 tail polynomial in the identical Horner order, the
    // step-up cut over the tiny per-key frame
    "q228_bh_fdr" -> {
      val tail = s"exp(-(abs(t_raw) * abs(t_raw)) / 2.0e0) * " +
        s"${graft.operators.Stats.InvSqrt2Pi.toString}e0 * " +
        "(kk * (0.31938153e0 + kk * (-0.356563782e0 + kk * (1.781477937e0 + " +
        "kk * (-1.821255978e0 + kk * 1.330274429e0)))))"
      s"""WITH base AS (SELECT event_type,
         |                     CASE WHEN CAST($tsUs // 86400000000 % 7 AS BIGINT) IN (2, 3)
         |                          THEN 0 ELSE 1 END AS a,
         |                     CAST(floor(value * CAST(100.0 AS DOUBLE) + 0.5) AS BIGINT) AS v2
         |              FROM events),
         |g AS (SELECT event_type,
         |             CAST(sum(a) AS BIGINT) AS na, CAST(sum(a * v2) AS BIGINT) AS sa,
         |             CAST(sum(a * v2 * v2) AS BIGINT) AS qa,
         |             CAST(sum(1 - a) AS BIGINT) AS nb, CAST(sum((1 - a) * v2) AS BIGINT) AS sb,
         |             CAST(sum((1 - a) * v2 * v2) AS BIGINT) AS qb
         |      FROM base GROUP BY event_type
         |      HAVING CAST(sum(a) AS BIGINT) >= 2 AND CAST(sum(1 - a) AS BIGINT) >= 2),
         |w AS (SELECT event_type, na, nb, sa, sb,
         |             (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))
         |               / (CAST(na AS DOUBLE) - CAST(1.0 AS DOUBLE)) / CAST(na AS DOUBLE) AS sea,
         |             (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
         |               / (CAST(nb AS DOUBLE) - CAST(1.0 AS DOUBLE)) / CAST(nb AS DOUBLE) AS seb
         |      FROM g),
         |tst AS (SELECT event_type, na, nb,
         |               (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
         |                 / sqrt(sea + seb) AS t_raw
         |        FROM w),
         |p AS (SELECT event_type, na, nb, t_raw,
         |             2.0e0 * ($tail) AS p_raw
         |      FROM (SELECT *, 1.0e0 / (1.0e0 + 0.2316419e0 * abs(t_raw)) AS kk FROM tst)),
         |r AS (SELECT *, CAST(row_number() OVER (ORDER BY p_raw, event_type) AS BIGINT) AS rank,
         |             CAST(count(*) OVER () AS BIGINT) AS m FROM p),
         |ks AS (SELECT *, max(CASE WHEN p_raw <= CAST(rank AS DOUBLE) * 0.05e0 / CAST(m AS DOUBLE)
         |                          THEN rank END) OVER () AS k_star
         |       FROM r)
         |SELECT event_type, rank, na AS n_a, nb AS n_b,
         |       ${t6("t_raw")} AS t, ${t6("p_raw")} AS p,
         |       coalesce(rank <= k_star, false) AS reject
         |FROM ks ORDER BY rank""".stripMargin
    },

    // q229: Kaplan–Meier over session lifetimes (q214's gap sessions,
    // minutes; last-hour sessions censored) — 12-decimal integer-grid
    // running log-survival (window FP sums are engine-frame-order-
    // dependent)
    "q229_kaplan_meier" ->
      s"""WITH $survivalRiskCtes,
         |lt AS (SELECT t, n_risk, d,
         |              CASE WHEN d < n_risk THEN
         |                CAST(floor(ln(CAST(1.0 AS DOUBLE) - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
         |                  * 1e12 + 0.5) AS BIGINT) END AS lt12
         |       FROM risk WHERE d > 0),
         |c AS (SELECT t, n_risk, d,
         |             CASE WHEN d < n_risk THEN
         |               CAST(CAST(sum(lt12) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |                 AS DOUBLE) / 1e12 END AS ln_s
         |      FROM lt)
         |SELECT t, n_risk, d, ${t6("ln_s")} AS ln_survival,
         |       CASE WHEN d < n_risk THEN ${t6("exp(ln_s)")}
         |            ELSE CAST(0.0 AS DOUBLE) END AS survival
         |FROM c ORDER BY t""".stripMargin,

    // q230: RFM segmentation — NTILE(4) quartile scores under the q218
    // shared convention, 8-decimal exact monetary totals
    "q230_rfm_segments" ->
      s"""WITH per AS (SELECT o_custkey AS k, max(epoch_us(CAST(o_orderdate AS TIMESTAMP))) AS last_us,
         |                    CAST(count(*) AS BIGINT) AS f, ${xsum("o_totalprice")} AS m
         |             FROM orders GROUP BY o_custkey),
         |ref AS (SELECT max(last_us) AS ref_us FROM per),
         |scored AS (SELECT k, f, m,
         |                  CAST((ref_us - last_us) // 86400000000 AS BIGINT) AS recency_days
         |           FROM per CROSS JOIN ref),
         |nt AS (SELECT f, m,
         |              CAST(ntile(4) OVER (ORDER BY recency_days, k) AS BIGINT) AS r_score,
         |              CAST(ntile(4) OVER (ORDER BY f DESC, k) AS BIGINT) AS f_score,
         |              CAST(ntile(4) OVER (ORDER BY m DESC, k) AS BIGINT) AS m_score
         |       FROM scored)
         |SELECT r_score, f_score, m_score, CAST(count(*) AS BIGINT) AS n_entities,
         |       CAST(sum(f) AS BIGINT) AS n_actions, ${xsum("m")} AS monetary
         |FROM nt GROUP BY r_score, f_score, m_score
         |ORDER BY r_score, f_score, m_score""".stripMargin,

    // q237: Adamic–Adar link prediction — wedge join through the shared
    // vertex over the q217 co-occurrence edges, inverse-log degree
    // weights on the 12-decimal grid, existing edges anti'd out
    "q237_adamic_adar" ->
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS bid, l_partkey AS item
         |           FROM lineitem),
         |pr AS (SELECT a.item AS ia, c.item AS ib
         |       FROM b a JOIN b c ON a.bid = c.bid AND a.item < c.item
         |       GROUP BY 1, 2 HAVING count(*) >= 2),
         |ed0 AS (SELECT ia AS src, ib AS dst FROM pr
         |        UNION ALL SELECT ib AS src, ia AS dst FROM pr),
         |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM ed0 GROUP BY 1),
         |wed AS (SELECT e1.src AS u, e1.dst AS w, e2.dst AS v
         |        FROM ed0 e1 JOIN ed0 e2 ON e1.dst = e2.src
         |        WHERE e1.src < e2.dst),
         |cand AS (SELECT u, v, CAST(count(*) AS BIGINT) AS n_common,
         |                ${dsum12("CAST(1.0 AS DOUBLE) / ln(CAST(deg AS DOUBLE))")} AS aa_raw
         |         FROM wed JOIN deg ON deg.src = wed.w
         |         GROUP BY u, v),
         |nonadj AS (SELECT * FROM cand
         |           WHERE NOT EXISTS (SELECT 1 FROM ed0
         |                             WHERE ed0.src = cand.u AND ed0.dst = cand.v))
         |SELECT rank, u, v, n_common, ${t6("aa_raw")} AS aa FROM (
         |  SELECT *, CAST(row_number() OVER (ORDER BY aa_raw DESC, u, v) AS BIGINT) AS rank
         |  FROM nonadj)
         |WHERE rank <= 15 ORDER BY rank""".stripMargin,

    // q238: HITS on the buyer→part bipartite graph — 5 unrolled
    // UN-normalized rounds (linear CTE chain; per-round rescales are
    // uniform scalars so the end-normalized result is identical), one
    // L1 division per side at the end; the finals are MATERIALIZED
    // because both the total and the output join reference them
    "q238_hits" -> {
      val iters = (1 to 5).map { i =>
        val m = if (i == 5) " MATERIALIZED" else ""
        s"""a$i AS$m (SELECT ed.dst AS v, ${dsum12("h.h")} AS a
           |          FROM ed JOIN h${i - 1} h ON h.v = ed.src GROUP BY ed.dst),
           |h$i AS$m (SELECT ed.src AS v, ${dsum12("a.a")} AS h
           |          FROM ed JOIN a$i a ON a.v = ed.dst GROUP BY ed.src)""".stripMargin
      }.mkString(",\n")
      s"""WITH ed AS (SELECT DISTINCT o_custkey AS src, l_partkey + 1000000 AS dst
         |            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |srcs AS (SELECT DISTINCT src AS v FROM ed),
         |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_s FROM srcs),
         |h0 AS (SELECT v, CAST(1.0 AS DOUBLE) / n_s AS h FROM srcs CROSS JOIN ns),
         |$iters,
         |at AS (SELECT ${dsum12("a")} AS a_tot FROM a5),
         |ht AS (SELECT ${dsum12("h")} AS h_tot FROM h5),
         |hn AS (SELECT v, h / h_tot AS h FROM h5 CROSS JOIN ht),
         |an AS (SELECT v, a / a_tot AS a FROM a5 CROSS JOIN at)
         |SELECT coalesce(h.v, a.v) AS v,
         |       ${t6("coalesce(h.h, CAST(0.0 AS DOUBLE))")} AS hub,
         |       ${t6("coalesce(a.a, CAST(0.0 AS DOUBLE))")} AS authority
         |FROM hn h FULL OUTER JOIN an a ON h.v = a.v
         |ORDER BY v""".stripMargin
    },

    // q239: TextRank keywords — PageRank (q99's unrolled text) over the
    // adjacent-content-token co-occurrence graph
    "q239_textrank" -> {
      val iters = (1 to 5).map { i =>
        s"""r$i AS (
           |  SELECT v, (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n_v
           |            + CAST(0.85 AS DOUBLE) * s AS rank
           |  FROM (SELECT ed.dst AS v, ${dsum12("r.rank / ed.outdeg")} AS s
           |        FROM ed JOIN r${i - 1} r ON r.v = ed.src
           |        GROUP BY ed.dst) CROSS JOIN nv)""".stripMargin
      }.mkString(",\n")
      s"""WITH tk AS (SELECT ${contentToks("text")} AS t FROM documents),
         |p0 AS (SELECT least(p.a, p.b) AS a, greatest(p.a, p.b) AS b FROM (
         |         SELECT unnest(list_transform(generate_series(2, len(t)),
         |                i -> struct_pack(a := t[i - 1], b := t[i]))) AS p
         |         FROM tk WHERE len(t) >= 2)),
         |und AS (SELECT a, b FROM p0 WHERE a != b GROUP BY a, b HAVING count(*) >= 2),
         |ed0 AS (SELECT a AS src, b AS dst FROM und
         |        UNION ALL SELECT b AS src, a AS dst FROM und),
         |deg AS (SELECT src, count(*) AS outdeg FROM ed0 GROUP BY src),
         |nv AS (SELECT count(*) AS n_v FROM deg),
         |ed AS (SELECT ed0.src, ed0.dst, deg.outdeg FROM ed0 JOIN deg USING (src)),
         |r0 AS (SELECT src AS v, CAST(1.0 AS DOUBLE) / n_v AS rank FROM deg CROSS JOIN nv),
         |$iters
         |SELECT pos, v AS term, ${t6("rank")} AS score FROM (
         |  SELECT v, rank,
         |         CAST(row_number() OVER (ORDER BY rank DESC, v) AS BIGINT) AS pos
         |  FROM r5)
         |WHERE pos <= 20 ORDER BY pos""".stripMargin
    },

    // q240: MMR diversified rerank — the greedy steps unrolled, each a
    // 1-row argmax over the bounded candidate pool; λ/(1−λ) pinned
    "q240_mmr_rerank" -> {
      def selPrev(i: Int) =
        (1 until i).map(j => s"SELECT id FROM s$j").mkString(" UNION ALL ")
      val steps = (1 to 5).map { i =>
        val ms =
          if (i == 1) "CAST(0.0 AS DOUBLE)"
          else s"coalesce((SELECT max(psim) FROM ps WHERE ps.ia = cv.id " +
            s"AND ps.ib IN (${selPrev(i)})), CAST(0.0 AS DOUBLE))"
        val notIn = if (i == 1) "" else s" WHERE cv.id NOT IN (${selPrev(i)})"
        s"""s$i AS (SELECT id, mmr FROM (
           |  SELECT cv.id, 0.7e0 * cv.score - 0.3e0 * $ms AS mmr
           |  FROM cv$notIn)
           |ORDER BY mmr DESC, id LIMIT 1)""".stripMargin
      }.mkString(",\n")
      val sel = (1 to 5)
        .map(i => s"SELECT CAST($i AS BIGINT) AS rank, id, mmr FROM s$i")
        .mkString(" UNION ALL ")
      s"""WITH cand AS (${vectorScanSql(0, 20)}),
         |cv AS (SELECT c.id, c.score, CAST(e.embedding AS DOUBLE[]) AS v
         |       FROM cand c JOIN embeddings e ON e.vec_id = c.id),
         |ps AS (SELECT a.id AS ia, b.id AS ib, ${t6(cosine("a.v", "b.v"))} AS psim
         |       FROM cv a JOIN cv b ON a.id != b.id),
         |$steps
         |SELECT sel.rank, sel.id, ${t6("sel.mmr")} AS mmr, cv.score AS qsim
         |FROM ($sel) sel JOIN cv ON cv.id = sel.id
         |ORDER BY sel.rank""".stripMargin
    },

    // q241: additive seasonal decomposition — integer MA(7) window sum
    // over the day frame, per-dow 12-decimal detrended means
    "q241_seasonal_decompose" ->
      s"""WITH $seasonalDecomposeCtes
         |SELECT day, dow, value, trend, seasonal, residual
         |FROM dec ORDER BY day""".stripMargin,

    // q257: seasonal-adjusted anomaly flags — z of the q241 residuals
    // on their own exact 6-decimal moments, pinned 2σ cut
    "q257_seasonal_anomalies" -> {
      val dd = (c: String) => s"CAST($c AS DOUBLE)"
      val mean = s"${dd("s")} / ${dd("n")}"
      val sd = s"sqrt(${dd("q")} / ${dd("n")} - ($mean) * ($mean))"
      val zc = s"CASE WHEN $sd > CAST(0.0 AS DOUBLE) THEN " +
        s"${t6(s"(${dd("r6")} - $mean) / ($sd)")} ELSE NULL END"
      s"""WITH $seasonalDecomposeCtes,
         |r AS (SELECT day, residual,
         |             CAST(floor(residual * 1e3 + 0.5) AS BIGINT) AS r6
         |      FROM dec),
         |mom AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(r6) AS BIGINT) AS s,
         |               CAST(sum(r6 * r6) AS BIGINT) AS q FROM r)
         |SELECT day, residual, $zc AS z,
         |       coalesce(abs($zc) > 2.0e0, false) AS is_anomaly
         |FROM r CROSS JOIN mom ORDER BY day""".stripMargin
    },

    // q266: one-way ANOVA F — centi-grid moments per group (Σv² exact
    // as integer-valued doubles), SS in original units, 12-dec grid on
    // the k-row reduction. Mirrors Stats.anovaF.
    "q266_anova_f" -> {
      val dd = (c: String) => s"CAST($c AS DOUBLE)"
      val ssb = s"(sg - ${dd("s")} * ${dd("s")} / ${dd("n")})"
      s"""WITH base AS (SELECT event_type AS g,
         |                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS v2
         |              FROM events),
         |pg AS (SELECT g, CAST(count(*) AS BIGINT) AS n_i,
         |              CAST(sum(v2) AS BIGINT) AS s_i,
         |              sum(${dd("v2")} * ${dd("v2")}) AS q_i
         |       FROM base GROUP BY g),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n_i) AS BIGINT) AS n,
         |               CAST(sum(s_i) AS BIGINT) AS s, ${dsum12("q_i")} AS q,
         |               ${dsum12(s"${dd("s_i")} * ${dd("s_i")} / ${dd("n_i")}")} AS sg
         |        FROM pg)
         |SELECT k, n, k - 1 AS df1, n - k AS df2,
         |       ${t6(s"$ssb / 1e4")} AS ss_between,
         |       ${t6("(q - sg) / 1e4")} AS ss_within,
         |       ${t6(s"($ssb / CAST(k - 1 AS DOUBLE)) / " +
             "((q - sg) / CAST(n - k AS DOUBLE))")} AS f
         |FROM agg""".stripMargin
    },

    // q267: Kruskal–Wallis — doubled midranks over the centi-grid
    // value frame (the q225 rank CTE), exact per-group rank sums,
    // exact tie correction, pinned χ²₀.₀₅(4) cut. Mirrors
    // Stats.kruskalWallis.
    "q267_kruskal_wallis" -> {
      val dd = (c: String) => s"CAST($c AS DOUBLE)"
      s"""WITH rows0 AS (SELECT event_type AS g,
         |                      CAST(floor(value * 100 + 0.5) AS BIGINT) AS v2
         |               FROM events),
         |c AS (SELECT v2 AS v, CAST(count(*) AS BIGINT) AS na FROM rows0 GROUP BY v2),
         |r AS (SELECT v AS v2,
         |             2 * (CAST(sum(na) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |                  - na) + na + 1 AS r2
         |      FROM c),
         |pg AS (SELECT g, CAST(count(*) AS BIGINT) AS n_i,
         |              CAST(sum(r2) AS BIGINT) AS s_i
         |       FROM rows0 JOIN r USING (v2) GROUP BY g),
         |ties AS (SELECT CAST(sum(na * na * na - na) AS BIGINT) AS tsum FROM c),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n_i) AS BIGINT) AS n,
         |               ${dsum12(s"${dd("s_i")} * ${dd("s_i")} / (CAST(4.0 AS DOUBLE) * ${dd("n_i")})")} AS sr
         |        FROM pg),
         |hh AS (SELECT k, n,
         |              CAST(12.0 AS DOUBLE) / (${dd("n")} * (${dd("n")} + CAST(1.0 AS DOUBLE))) * sr
         |                - CAST(3.0 AS DOUBLE) * (${dd("n")} + CAST(1.0 AS DOUBLE)) AS h_raw,
         |              CAST(1.0 AS DOUBLE) -
         |                ${dd("tsum")} / (${dd("n")} * ${dd("n")} * ${dd("n")} - ${dd("n")}) AS cf
         |       FROM agg CROSS JOIN ties)
         |SELECT k, n, k - 1 AS df, ${t6("h_raw")} AS h,
         |       ${t6("h_raw / cf")} AS h_tie_corrected,
         |       (h_raw / cf) > 9.487729036781154e0 AS reject
         |FROM hh""".stripMargin
    },

    // q268: Kendall tau-b between daily event volume and value total —
    // integer pair counts on the bounded day frame, tie-aware
    // denominator, normal-approximation z. Mirrors Stats.kendallTau
    // (x = n_events, y = t8).
    "q268_kendall_tau" -> {
      val dd = (c: String) => s"CAST($c AS DOUBLE)"
      val num = s"(${dd("nc")} - ${dd("nd")})"
      s"""WITH daily AS (SELECT CAST($tsUs // 86400000000 AS BIGINT) AS day,
         |                      CAST(sum(CAST(floor(value * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS t8,
         |                      CAST(count(*) AS BIGINT) AS n_events
         |               FROM events GROUP BY 1),
         |p AS (SELECT CASE WHEN (a.n_events < b.n_events AND a.t8 < b.t8)
         |                    OR (a.n_events > b.n_events AND a.t8 > b.t8) THEN 1 ELSE 0 END AS c,
         |             CASE WHEN (a.n_events < b.n_events AND a.t8 > b.t8)
         |                    OR (a.n_events > b.n_events AND a.t8 < b.t8) THEN 1 ELSE 0 END AS dc,
         |             CASE WHEN a.n_events = b.n_events THEN 1 ELSE 0 END AS tx,
         |             CASE WHEN a.t8 = b.t8 THEN 1 ELSE 0 END AS ty
         |      FROM daily a JOIN daily b ON a.day < b.day),
         |cnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
         |agg AS (SELECT CAST(sum(c) AS BIGINT) AS nc, CAST(sum(dc) AS BIGINT) AS nd,
         |               CAST(sum(tx) AS BIGINT) AS ntx, CAST(sum(ty) AS BIGINT) AS nty
         |        FROM p),
         |wn AS (SELECT n, nc, nd, ntx, nty,
         |              CAST(n * (n - 1) AS DOUBLE) / CAST(2 AS DOUBLE) AS n0
         |       FROM agg CROSS JOIN cnt)
         |SELECT n, nc, nd,
         |       ${t6(s"$num / sqrt((n0 - ${dd("ntx")}) * (n0 - ${dd("nty")}))")} AS tau_b,
         |       ${t6(s"CAST(3.0 AS DOUBLE) * $num / " +
             s"sqrt(${dd("n")} * (${dd("n")} - CAST(1.0 AS DOUBLE)) * " +
             s"(CAST(2.0 AS DOUBLE) * ${dd("n")} + CAST(5.0 AS DOUBLE)) / CAST(2.0 AS DOUBLE))")} AS z
         |FROM wn""".stripMargin
    },

    // q269: two-arm log-rank on the q229 gap-session lifetimes (arm =
    // user parity) — grouped risk sets off one cumulative window,
    // hypergeometric E/V terms on the 12-dec grid, pinned 1.959964
    // cut. Mirrors Stats.logRank over the survivalRiskCtes pipeline.
    "q269_log_rank" -> {
      val dd = (c: String) => s"CAST($c AS DOUBLE)"
      val p1 = s"(${dd("n1_risk")} / ${dd("n_risk")})"
      val zc = s"(${dd("o1")} - e1) / sqrt(v)"
      s"""WITH e AS (SELECT user_id, event_id, $tsUs AS us FROM events),
         |g AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 3600000000
         |                     THEN 1 ELSE 0 END AS ns
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |s AS (SELECT *, CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
         |                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM g),
         |sess AS (SELECT user_id, sid, min(us) AS s_us, max(us) AS e_us
         |         FROM s GROUP BY user_id, sid),
         |h AS (SELECT max(e_us) AS h_us FROM sess),
         |dur AS (SELECT CAST((e_us - s_us) // 60000000 AS BIGINT) AS t,
         |               CASE WHEN h_us - e_us > 3600000000 THEN 1 ELSE 0 END AS ev,
         |               CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS a1
         |        FROM sess CROSS JOIN h),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all,
         |               CAST(sum(a1) AS BIGINT) AS n1_all FROM dur),
         |byt AS (SELECT t, CAST(count(*) AS BIGINT) AS n_t, CAST(sum(ev) AS BIGINT) AS d,
         |               CAST(sum(a1) AS BIGINT) AS n1_t, CAST(sum(ev * a1) AS BIGINT) AS d1
         |        FROM dur GROUP BY t),
         |risk AS (SELECT t, d, d1, n_all, n1_all,
         |                n_all - coalesce(CAST(sum(n_t) OVER wpre AS BIGINT), 0) AS n_risk,
         |                n1_all - coalesce(CAST(sum(n1_t) OVER wpre AS BIGINT), 0) AS n1_risk
         |         FROM byt CROSS JOIN tot
         |         WINDOW wpre AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         |f AS (SELECT * FROM risk WHERE d > 0 AND n_risk >= 2),
         |agg AS (SELECT max(n_all) AS n, max(n1_all) AS n_1, CAST(sum(d1) AS BIGINT) AS o1,
         |               ${dsum12(s"${dd("d")} * $p1")} AS e1,
         |               ${dsum12(s"${dd("d")} * $p1 * (CAST(1.0 AS DOUBLE) - $p1) * " +
             s"(${dd("n_risk")} - ${dd("d")}) / (${dd("n_risk")} - CAST(1.0 AS DOUBLE))")} AS v
         |        FROM f)
         |SELECT n, n_1, o1, ${t6("e1")} AS e1,
         |       ${t6(zc)} AS z,
         |       ${t6(s"(${dd("o1")} - e1) * (${dd("o1")} - e1) / v")} AS chi2,
         |       abs($zc) > 1.959964e0 AS reject
         |FROM agg""".stripMargin
    },

    // q270: truncated-memory Holt backtest — the decay-weight arrays
    // are the SAME doubles the Spark plan pins (Stats.holtWeights),
    // interpolated as e0 literals; weighted sums on the signed 8-dec
    // grid. Mirrors Stats.holtForecast (α=0.3, β=0.2, h=7).
    "q270_holt_forecast" -> {
      def dlit(x: Double) = { val s = x.toString; if (s.contains("E")) s else s + "e0" }
      val wl = graft.operators.Stats.holtWeights(0.3, 60).map(dlit).mkString("[", ", ", "]")
      val wb = graft.operators.Stats.holtWeights(0.2, 60).map(dlit).mkString("[", ", ", "]")
      val dd = (c: String) => s"CAST($c AS DOUBLE)"
      val fc = s"(level + CAST(t - t_split AS DOUBLE) * trend)"
      s"""WITH daily AS (SELECT event_type AS k, CAST($tsUs // 86400000000 AS BIGINT) AS t,
         |                      CAST(sum(CAST(floor(value * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS v8
         |               FROM events GROUP BY 1, 2),
         |spl AS (SELECT k, max(t) - 7 AS t_split FROM daily GROUP BY k),
         |trn AS (SELECT daily.k AS k, t, v8, t_split
         |        FROM daily JOIN spl USING (k) WHERE t <= t_split),
         |tr AS (SELECT k, t, v8, t_split,
         |              v8 - lag(v8) OVER (PARTITION BY k ORDER BY t) AS d8,
         |              t_split - t AS kk
         |       FROM trn),
         |anc AS (SELECT k, t_split,
         |               ${zsum8(s"($wl)[CAST(kk + 1 AS INT)] * ${dd("v8")} / 1e8")} AS lv_num,
         |               ${zsum8(s"($wl)[CAST(kk + 1 AS INT)]")} AS lv_den,
         |               ${zsum8(s"($wl)[CAST(kk + 1 AS INT)] * ${dd("kk")}")} AS mu_num,
         |               ${zsum8(s"CASE WHEN d8 IS NOT NULL THEN ($wb)[CAST(kk + 1 AS INT)] * ${dd("d8")} / 1e8 ELSE CAST(0.0 AS DOUBLE) END")} AS tr_num,
         |               ${zsum8(s"CASE WHEN d8 IS NOT NULL THEN ($wb)[CAST(kk + 1 AS INT)] ELSE CAST(0.0 AS DOUBLE) END")} AS tr_den
         |        FROM tr GROUP BY k, t_split),
         |anc2 AS (SELECT k, t_split,
         |                lv_num / lv_den + (tr_num / tr_den) * (mu_num / lv_den) AS level,
         |                tr_num / tr_den AS trend
         |         FROM anc)
         |SELECT daily.k AS event_type, t AS day,
         |       ${t6(s"${dd("v8")} / 1e8")} AS actual,
         |       ${t6(fc)} AS forecast,
         |       ${t6(s"abs(${dd("v8")} / 1e8 - $fc)")} AS abs_err
         |FROM daily JOIN anc2 USING (k) WHERE t > t_split
         |ORDER BY event_type, day""".stripMargin
    },

    // q271: lead/lag cross-correlation view→purchase — centi-grid
    // moments are exact longs on the day frame, one double ratio per
    // lag. Mirrors Stats.crossCorrelation.
    "q271_cross_correlation" -> {
      val dd = (c: String) => s"CAST($c AS DOUBLE)"
      s"""WITH daily AS (SELECT event_type AS k, CAST($tsUs // 86400000000 AS BIGINT) AS t,
         |                      CAST(sum(CAST(floor(value * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS v8
         |               FROM events GROUP BY 1, 2),
         |x AS (SELECT t, v8 // 1000000 AS x2 FROM daily WHERE k = 'view'),
         |y AS (SELECT t AS ty, v8 // 1000000 AS y2 FROM daily WHERE k = 'purchase'),
         |l AS (SELECT CAST(range AS BIGINT) AS lag FROM range(0, 8)),
         |agg AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
         |               CAST(sum(x2) AS BIGINT) AS sx, CAST(sum(y2) AS BIGINT) AS sy,
         |               CAST(sum(x2 * y2) AS BIGINT) AS sxy,
         |               CAST(sum(x2 * x2) AS BIGINT) AS sxx,
         |               CAST(sum(y2 * y2) AS BIGINT) AS syy
         |        FROM x CROSS JOIN l JOIN y ON ty = t + lag
         |        GROUP BY lag)
         |SELECT lag, n,
         |       ${t6(s"(${dd("n")} * ${dd("sxy")} - ${dd("sx")} * ${dd("sy")}) / " +
             s"sqrt((${dd("n")} * ${dd("sxx")} - ${dd("sx")} * ${dd("sx")}) * " +
             s"(${dd("n")} * ${dd("syy")} - ${dd("sy")} * ${dd("sy")}))")} AS ccf
         |FROM agg ORDER BY lag""".stripMargin
    },

    // q272: binary-segmentation changepoint — prefix moments off one
    // cumulative window, between-SS gain in original units, trunc6
    // before the top-3 cut. Mirrors Stats.binarySegmentation.
    "q272_changepoint" -> {
      val dd = (c: String) => s"CAST($c AS DOUBLE)"
      val gain = s"(${dd("cs")} * ${dd("cs")} / ${dd("cn")} + " +
        s"(${dd("s_all")} - ${dd("cs")}) * (${dd("s_all")} - ${dd("cs")}) / " +
        s"(${dd("n_all")} - ${dd("cn")}) - " +
        s"${dd("s_all")} * ${dd("s_all")} / ${dd("n_all")}) / 1e4"
      s"""WITH daily AS (SELECT CAST($tsUs // 86400000000 AS BIGINT) AS t,
         |                      CAST(sum(CAST(floor(value * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS v8
         |               FROM events GROUP BY 1),
         |b AS (SELECT t, v8 // 1000000 AS v2 FROM daily),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all, CAST(sum(v2) AS BIGINT) AS s_all FROM b),
         |c AS (SELECT t, CAST(count(*) OVER wc AS BIGINT) AS cn,
         |             CAST(sum(v2) OVER wc AS BIGINT) AS cs
         |      FROM b WINDOW wc AS (ORDER BY t ROWS UNBOUNDED PRECEDING))
         |SELECT t AS split_day, cn AS n_left, n_all - cn AS n_right,
         |       ${t6(s"${dd("cs")} / ${dd("cn")} / CAST(100.0 AS DOUBLE)")} AS mean_left,
         |       ${t6(s"(${dd("s_all")} - ${dd("cs")}) / (${dd("n_all")} - ${dd("cn")}) / CAST(100.0 AS DOUBLE)")} AS mean_right,
         |       ${t6(gain)} AS gain
         |FROM c CROSS JOIN tot WHERE cn < n_all
         |ORDER BY gain DESC, split_day LIMIT 3""".stripMargin
    },

    // q276: Markov stationary distribution — 20 unrolled power-iteration
    // CTEs (linear chain, each referenced once — the q238 lesson) over
    // the row-stochastic transition CTE prefix, stationary vs empirical
    // share. Mirrors EventOps.markovStationary.
    "q276_markov_stationary" -> {
      val its = (1 to 20).map { i =>
        val prev = if (i == 1) "it0" else s"it${i - 1}"
        s"""it$i AS (SELECT next_type AS state, ${dsum12("pi * p")} AS pi
           |         FROM p JOIN $prev ON p.prev_type = $prev.state
           |         GROUP BY next_type)""".stripMargin
      }.mkString(",\n")
      val dd = (c: String) => s"CAST($c AS DOUBLE)"
      s"""WITH $markovCtes,
         |states AS (SELECT DISTINCT prev_type AS state FROM p),
         |nsc AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM states),
         |it0 AS (SELECT state, CAST(1.0 AS DOUBLE) / ${dd("ns")} AS pi
         |        FROM states CROSS JOIN nsc),
         |$its,
         |emp AS (SELECT event_type AS state, CAST(count(*) AS BIGINT) AS n
         |        FROM events GROUP BY 1),
         |etot AS (SELECT CAST(sum(n) AS BIGINT) AS n_all FROM emp)
         |SELECT state, ${t6("pi")} AS stationary,
         |       ${t6(s"${dd("n")} / ${dd("n_all")}")} AS empirical,
         |       ${t6(s"pi - ${dd("n")} / ${dd("n_all")}")} AS gap
         |FROM it20 JOIN emp USING (state) CROSS JOIN etot
         |ORDER BY state""".stripMargin
    },

    // q277: finite-horizon absorption — 7 unrolled steps of
    // pᵢ₊₁(s) = Σ P(s,t)·pᵢ(t) with the target pinned at 1. Mirrors
    // EventOps.conversionWithin.
    "q277_conversion_within" -> {
      val its = (1 to 7).map { i =>
        val prev = if (i == 1) "it0" else s"it${i - 1}"
        s"""nx$i AS (SELECT p.prev_type AS state, ${dsum12("p * pr")} AS cont
           |         FROM p JOIN $prev ON p.next_type = $prev.state
           |         GROUP BY p.prev_type),
           |it$i AS (SELECT s.state,
           |                CASE WHEN s.state = 'purchase' THEN CAST(1.0 AS DOUBLE)
           |                     ELSE coalesce(cont, CAST(0.0 AS DOUBLE)) END AS pr
           |         FROM states s LEFT JOIN nx$i USING (state))""".stripMargin
      }.mkString(",\n")
      s"""WITH $markovCtes,
         |states AS (SELECT DISTINCT prev_type AS state FROM p),
         |it0 AS (SELECT state,
         |               CASE WHEN state = 'purchase' THEN CAST(1.0 AS DOUBLE)
         |                    ELSE CAST(0.0 AS DOUBLE) END AS pr
         |        FROM states),
         |$its
         |SELECT state, ${t6("pr")} AS p_within_k
         |FROM it7 ORDER BY state""".stripMargin
    },

    // q278: per-transition dwell times (within-session gaps only) —
    // exact integer micros behind the mean, rank-picked lower median.
    // Mirrors EventOps.transitionDwell.
    "q278_transition_dwell" -> {
      val dd = (c: String) => s"CAST($c AS DOUBLE)"
      s"""WITH e AS (SELECT user_id, event_id, event_type, $tsUs AS us FROM events),
         |g AS (SELECT event_type, event_id,
         |             lag(event_type) OVER w AS prev_type,
         |             us - lag(us) OVER w AS gap_us
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |f AS (SELECT prev_type, event_type AS next_type, gap_us, event_id
         |      FROM g WHERE prev_type IS NOT NULL AND gap_us <= 3600000000),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY prev_type, next_type
         |                     ORDER BY gap_us, event_id) AS BIGINT) AS rn
         |      FROM f),
         |agg AS (SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n,
         |               CAST(sum(gap_us) AS BIGINT) AS sum_us
         |        FROM f GROUP BY 1, 2),
         |med AS (SELECT r.prev_type, r.next_type, gap_us AS p50_us
         |        FROM r JOIN agg USING (prev_type, next_type)
         |        WHERE rn = (n + 1) // 2)
         |SELECT prev_type, next_type, n,
         |       ${t6(s"${dd("sum_us")} / ${dd("n")} / 1e6")} AS mean_sec,
         |       ${t6(s"${dd("p50_us")} / 1e6")} AS p50_sec
         |FROM agg JOIN med USING (prev_type, next_type)
         |ORDER BY prev_type, next_type""".stripMargin
    },

    // q273: Zipf slope — OLS of ln(freq) on ln(rank) over the pinned
    // top-200, ln terms on the 12-dec grid. Mirrors
    // TextAnalysis.zipfSlope.
    "q273_zipf_slope" -> {
      val dd = (c: String) => s"CAST($c AS DOUBLE)"
      val nT = dd("n_terms")
      val num = s"($nT * sxy - sx * sy)"
      val den = s"($nT * sxx - sx * sx)"
      s"""WITH tf AS (SELECT term, CAST(count(*) AS BIGINT) AS n
         |            FROM (SELECT unnest(${toks("text")}) AS term FROM documents)
         |            GROUP BY term),
         |top AS (SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(${dd("n")}) AS y
         |        FROM (SELECT n, term,
         |                     CAST(row_number() OVER (ORDER BY n DESC, term) AS BIGINT) AS rank
         |              FROM tf)
         |        WHERE rank <= 200),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_terms,
         |               ${dsum12("x")} AS sx, ${dsum12("y")} AS sy,
         |               ${dsum12("x * y")} AS sxy, ${dsum12("x * x")} AS sxx,
         |               ${dsum12("y * y")} AS syy
         |        FROM top)
         |SELECT n_terms,
         |       ${t6(s"$num / $den")} AS slope,
         |       ${t6(s"(sy - $num / $den * sx) / $nT")} AS intercept,
         |       ${t6(s"$num * $num / ($den * ($nT * syy - sy * sy))")} AS r2
         |FROM agg""".stripMargin
    },

    // q274: Flesch / FK readability — words = space tokens, sentences =
    // [.!?]+ runs (floor 1), syllables = [aeiouy]+ vowel groups;
    // constants as e0 literals. Mirrors TextAnalysis.readability.
    "q274_readability" -> {
      val dd = (c: String) => s"CAST($c AS DOUBLE)"
      val wps = s"(${dd("n_words")} / ${dd("n_sentences")})"
      val spw = s"(${dd("n_syllables")} / ${dd("n_words")})"
      s"""WITH m AS (
         |  SELECT doc_id,
         |         CAST(len(${toks("text")}) AS BIGINT) AS n_words,
         |         greatest(CAST(1 AS BIGINT),
         |           CAST(len(regexp_split_to_array(text, '[.!?]+')) - 1 AS BIGINT)) AS n_sentences,
         |         greatest(CAST(1 AS BIGINT),
         |           CAST(len(regexp_split_to_array(lower(text), '[aeiouy]+')) - 1 AS BIGINT)) AS n_syllables
         |  FROM documents)
         |SELECT doc_id, n_words, n_sentences, n_syllables,
         |       ${t6(s"206.835e0 - 1.015e0 * $wps - 84.6e0 * $spw")} AS flesch,
         |       ${t6(s"0.39e0 * $wps + 11.8e0 * $spw - 15.59e0")} AS fk_grade
         |FROM m ORDER BY doc_id""".stripMargin
    },

    // q275: lexical richness per language — vocabulary-sized grouped
    // counts, Herdan's C as the size-robust richness. Mirrors
    // TextAnalysis.lexicalRichness.
    "q275_lexical_richness" -> {
      val dd = (c: String) => s"CAST($c AS DOUBLE)"
      s"""WITH tf AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS c
         |            FROM (SELECT lang, unnest(${toks("text")}) AS term FROM documents)
         |            GROUP BY lang, term),
         |agg AS (SELECT lang, CAST(count(*) AS BIGINT) AS types,
         |               CAST(sum(c) AS BIGINT) AS tokens,
         |               CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
         |        FROM tf GROUP BY lang)
         |SELECT lang, types, tokens, hapax,
         |       ${t6(s"${dd("types")} / ${dd("tokens")}")} AS ttr,
         |       ${t6(s"${dd("hapax")} / ${dd("types")}")} AS hapax_share,
         |       ${t6(s"ln(${dd("types")}) / ln(${dd("tokens")})")} AS herdan_c
         |FROM agg ORDER BY lang""".stripMargin
    },

    // q242: Mann–Kendall per type — integer S and tie sums, one
    // continuity-corrected z, pinned 1.96 normal cut
    "q242_mann_kendall" ->
      s"""WITH daily AS (SELECT event_type, CAST($tsUs // 86400000000 AS BIGINT) AS day,
         |                      CAST(sum(CAST(floor(value * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS t8
         |               FROM events GROUP BY 1, 2),
         |st AS (SELECT a.event_type, CAST(sum(CAST(sign(b.t8 - a.t8) AS BIGINT)) AS BIGINT) AS s
         |       FROM daily a JOIN daily b ON a.event_type = b.event_type AND a.day < b.day
         |       GROUP BY 1),
         |nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY 1),
         |ties AS (SELECT event_type, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_sum
         |         FROM (SELECT event_type, t8, CAST(count(*) AS BIGINT) AS t
         |               FROM daily GROUP BY 1, 2)
         |         GROUP BY 1),
         |vv AS (SELECT st.event_type, nn.n, st.s,
         |              (CAST(nn.n AS DOUBLE) * (CAST(nn.n AS DOUBLE) - 1.0e0)
         |                 * (2.0e0 * CAST(nn.n AS DOUBLE) + 5.0e0)
         |               - CAST(tie_sum AS DOUBLE)) / 18.0e0 AS var_s
         |       FROM st JOIN nn USING (event_type) JOIN ties USING (event_type)),
         |zc AS (SELECT *, CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0e0) / sqrt(var_s)
         |                      WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0e0) / sqrt(var_s)
         |                      ELSE 0.0e0 END AS z FROM vv)
         |SELECT event_type, n, s, ${t6("var_s")} AS var_s, ${t6("z")} AS z,
         |       CASE WHEN z > 1.959964e0 THEN 'increasing'
         |            WHEN z < -1.959964e0 THEN 'decreasing'
         |            ELSE 'no trend' END AS trend
         |FROM zc ORDER BY event_type""".stripMargin,

    // q243: Theil–Sen per type — pinned slope expression, lower-median
    // rank pick under the fully tie-broken order
    "q243_theil_sen" ->
      s"""WITH daily AS (SELECT event_type, CAST($tsUs // 86400000000 AS BIGINT) AS day,
         |                      CAST(sum(CAST(floor(value * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS t8
         |               FROM events GROUP BY 1, 2),
         |sl AS (SELECT a.event_type, a.day AS ti, b.day AS tj,
         |              ((CAST(b.t8 AS DOUBLE) - CAST(a.t8 AS DOUBLE)) / 1e8)
         |                / (CAST(b.day AS DOUBLE) - CAST(a.day AS DOUBLE)) AS slope
         |       FROM daily a JOIN daily b ON a.event_type = b.event_type AND a.day < b.day),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY event_type
         |                 ORDER BY slope, ti, tj) AS BIGINT) AS rn,
         |             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_pairs
         |      FROM sl)
         |SELECT event_type, n_pairs, ${t6("slope")} AS median_slope
         |FROM r WHERE rn = (n_pairs + 1) // 2 ORDER BY event_type""".stripMargin,

    // q244: item–item cosine CF kernel — the q154 pair-mining
    // equivalence (sorted-array fan-out ≡ a.item < c.item self-join),
    // one final double per pair, rank on the truncated sim
    "q244_item_cosine" ->
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS bid, l_partkey AS item FROM lineitem),
         |ic AS (SELECT item, CAST(count(*) AS BIGINT) AS n_item FROM b GROUP BY item),
         |pairs AS (SELECT a.item AS ia, c.item AS ib, CAST(count(*) AS BIGINT) AS n_ab
         |          FROM b a JOIN b c ON a.bid = c.bid AND a.item < c.item
         |          GROUP BY 1, 2 HAVING count(*) >= 2),
         |sims AS (SELECT ia, ib, n_ab,
         |                ${t6("CAST(n_ab AS DOUBLE) / sqrt(CAST(na.n_item AS DOUBLE) * CAST(nb.n_item AS DOUBLE))")} AS sim
         |         FROM pairs JOIN ic na ON na.item = ia JOIN ic nb ON nb.item = ib)
         |SELECT rank, ia, ib, n_ab, sim FROM (
         |  SELECT *, CAST(row_number() OVER (ORDER BY sim DESC, ia, ib) AS BIGINT) AS rank
         |  FROM sims)
         |WHERE rank <= 20 ORDER BY rank""".stripMargin,

    // q245: item-based CF recommendations — held-item neighbors scored
    // by decimal-summed link sims, holdings anti'd out, top-3 per user
    "q245_recommendations" ->
      s"""WITH bk AS (SELECT o_custkey AS u, o_orderkey AS bid, l_partkey AS item
         |            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |b AS (SELECT DISTINCT bid, item FROM bk),
         |ic AS (SELECT item, CAST(count(*) AS BIGINT) AS n_item FROM b GROUP BY item),
         |pairs AS (SELECT a.item AS ia, c.item AS ib, CAST(count(*) AS BIGINT) AS n_ab
         |          FROM b a JOIN b c ON a.bid = c.bid AND a.item < c.item
         |          GROUP BY 1, 2 HAVING count(*) >= 2),
         |sims AS (SELECT ia, ib,
         |                ${t6("CAST(n_ab AS DOUBLE) / sqrt(CAST(na.n_item AS DOUBLE) * CAST(nb.n_item AS DOUBLE))")} AS sim
         |         FROM pairs JOIN ic na ON na.item = ia JOIN ic nb ON nb.item = ib),
         |dirs AS (SELECT ia AS item, ib AS cand, sim FROM sims
         |         UNION ALL SELECT ib AS item, ia AS cand, sim FROM sims),
         |held AS (SELECT DISTINCT u, item FROM bk),
         |sc AS (SELECT h.u, d.cand, ${dsum12("d.sim")} AS score_raw,
         |              CAST(count(*) AS BIGINT) AS n_links
         |       FROM held h JOIN dirs d ON d.item = h.item
         |       GROUP BY h.u, d.cand),
         |fil AS (SELECT sc.*, ${t6("score_raw")} AS score FROM sc
         |        WHERE NOT EXISTS (SELECT 1 FROM held
         |                          WHERE held.u = sc.u AND held.item = sc.cand)),
         |rk AS (SELECT u, cand, n_links, score,
         |              CAST(row_number() OVER (PARTITION BY u
         |                ORDER BY score DESC, cand) AS BIGINT) AS rank
         |       FROM fil)
         |SELECT u AS "user", rank, cand AS item, n_links, score
         |FROM rk WHERE rank <= 3 ORDER BY "user", rank""".stripMargin,

    // q246: seasonal-naive backtest — exact day joins (gap-safe),
    // integer absolute errors, pinned sMAPE terms, naive-1 MASE scale
    "q246_forecast_backtest" ->
      s"""WITH daily AS (SELECT event_type, CAST($tsUs // 86400000000 AS BIGINT) AS day,
         |                      CAST(sum(CAST(floor(value * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS t8
         |               FROM events GROUP BY 1, 2),
         |j AS (SELECT c.event_type, c.t8 AS v8, se.t8 AS f8, o.t8 AS p8
         |      FROM daily c
         |      JOIN daily se ON se.event_type = c.event_type AND se.day + 7 = c.day
         |      JOIN daily o ON o.event_type = c.event_type AND o.day + 1 = c.day),
         |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
         |             CAST(sum(abs(v8 - f8)) AS BIGINT) AS ae8,
         |             CAST(sum(abs(v8 - p8)) AS BIGINT) AS naive8,
         |             ${dsum12("2.0e0 * abs(CAST(v8 AS DOUBLE) - CAST(f8 AS DOUBLE)) / " +
              "(abs(CAST(v8 AS DOUBLE)) + abs(CAST(f8 AS DOUBLE)))")} AS smape_raw
         |      FROM j GROUP BY event_type)
         |SELECT event_type, n_days,
         |       ${t6("CAST(ae8 AS DOUBLE) / CAST(n_days AS DOUBLE) / 1e8")} AS mae,
         |       ${t6("smape_raw / CAST(n_days AS DOUBLE)")} AS smape,
         |       ${t6("CAST(ae8 AS DOUBLE) / CAST(naive8 AS DOUBLE)")} AS mase
         |FROM a ORDER BY event_type""".stripMargin,

    // q247: Nelson–Aalen cumulative hazard — q229's risk CTEs, d/n
    // terms on the 12-decimal integer grid
    "q247_nelson_aalen" ->
      s"""WITH $survivalRiskCtes,
         |ht AS (SELECT t, n_risk, d,
         |              CAST(floor(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) * 1e12 + 0.5) AS BIGINT) AS h12
         |       FROM risk WHERE d > 0),
         |c AS (SELECT t, n_risk, d,
         |             CAST(CAST(sum(h12) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |               AS DOUBLE) / 1e12 AS haz
         |      FROM ht)
         |SELECT t, n_risk, d, ${t6("haz")} AS cum_hazard
         |FROM c ORDER BY t""".stripMargin,

    // q248: PSI drift — reference-side decile edges by the q192 rank
    // convention, smoothed proportions, 12-decimal-grid contributions
    // with an order-free integer window total
    "q248_psi_drift" -> {
      def prop(c: String, t: String) =
        s"(CAST($c AS DOUBLE) + 1.0e0) / (CAST($t AS DOUBLE) + 10.0e0)"
      val p = prop("n_ref", "t_ref")
      val q = prop("n_cur", "t_cur")
      s"""WITH ev AS (SELECT value, CAST($tsUs // 86400000000 AS BIGINT) AS day FROM events),
         |d0 AS (SELECT min(day) AS day0 FROM ev),
         |base AS (SELECT CASE WHEN day < day0 + 15 THEN 1 ELSE 0 END AS ref,
         |                CAST(floor(value * CAST(100.0 AS DOUBLE) + 0.5) AS BIGINT) AS v2
         |         FROM ev CROSS JOIN d0),
         |ranked AS (SELECT v2, CAST(row_number() OVER (ORDER BY v2) AS BIGINT) AS rn,
         |                  CAST(count(*) OVER () AS BIGINT) AS n
         |           FROM base WHERE ref = 1),
         |hit AS (SELECT k, min(rn) AS rn
         |        FROM ranked, (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS k)
         |        WHERE 10 * rn >= k * n GROUP BY k),
         |edges AS (SELECT list(v2 ORDER BY v2) AS es FROM hit JOIN ranked USING (rn)),
         |b2 AS (SELECT CAST(len(list_filter(es, e -> v2 > e)) AS BIGINT) AS bin,
         |              CAST(sum(ref) AS BIGINT) AS n_ref,
         |              CAST(sum(1 - ref) AS BIGINT) AS n_cur
         |       FROM base CROSS JOIN edges GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
         |               CAST(sum(n_cur) AS BIGINT) AS t_cur FROM b2),
         |c AS (SELECT bin, n_ref, n_cur,
         |             ($p - $q) * ln(($p) / ($q)) AS contrib_raw
         |      FROM b2 CROSS JOIN tot),
         |c2 AS (SELECT *, CAST(floor(contrib_raw * 1e12 + 0.5) AS BIGINT) AS c12 FROM c)
         |SELECT bin, n_ref, n_cur, ${t6("contrib_raw")} AS contribution,
         |       ${t6("CAST(CAST(sum(c12) OVER () AS BIGINT) AS DOUBLE) / 1e12")} AS psi
         |FROM c2 ORDER BY bin""".stripMargin
    },

    // q249: OLS diagnostics per flag — centered moments from the same
    // exact sums as q132, inference layer in pinned doubles
    "q249_ols_diagnostics" -> {
      val dd = (c: String) => s"CAST($c AS DOUBLE)"
      val cxx = s"(sxx - ${dd("sx")} * ${dd("sx")} / ${dd("n")})"
      val cxy = s"(sxy - ${dd("sx")} * ${dd("sy")} / ${dd("n")})"
      val cyy = s"(syy - ${dd("sy")} * ${dd("sy")} / ${dd("n")})"
      val slope = s"($cxy / $cxx)"
      val s2 = s"(($cyy - $slope * $cxy) / (${dd("n")} - 2.0e0))"
      val se = s"sqrt($s2 / $cxx)"
      s"""WITH g AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         |                  ${xsum("l_quantity")} AS sx, ${xsum("l_extendedprice")} AS sy,
         |                  ${psum6("l_quantity * l_extendedprice")} AS sxy,
         |                  ${psum6("l_quantity * l_quantity")} AS sxx,
         |                  ${psum6("l_extendedprice * l_extendedprice")} AS syy
         |           FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, n,
         |       ${t6(slope)} AS slope,
         |       ${t6(s"(sy - $slope * sx) / ${dd("n")}")} AS intercept,
         |       ${t6(s"$cxy * $cxy / ($cxx * $cyy)")} AS r2,
         |       ${t6(s"sqrt($s2)")} AS resid_se,
         |       ${t6(se)} AS slope_se,
         |       ${t6(s"$slope / $se")} AS t_slope
         |FROM g ORDER BY l_returnflag""".stripMargin
    },

    // q250: information-gain feature screen — exact-count entropies
    // with the 0·ln0 convention, 12-decimal conditional terms
    "q250_information_gain" -> {
      def h(pos: String, n: String) = {
        val p = s"CAST($pos AS DOUBLE) / CAST($n AS DOUBLE)"
        s"CASE WHEN $pos = 0 OR $pos = $n THEN 0.0e0 " +
          s"ELSE -($p) * ln($p) - (1.0e0 - $p) * ln(1.0e0 - $p) END"
      }
      s"""WITH o AS (SELECT o_orderpriority, o_orderstatus, c_mktsegment,
         |                  CASE WHEN o_totalprice > CAST(100000.0 AS DOUBLE) THEN 1 ELSE 0 END AS y
         |           FROM orders JOIN customer ON o_custkey = c_custkey),
         |m AS (SELECT 'priority' AS f, o_orderpriority AS v, y FROM o
         |      UNION ALL SELECT 'status' AS f, o_orderstatus AS v, y FROM o
         |      UNION ALL SELECT 'segment' AS f, c_mktsegment AS v, y FROM o),
         |cells AS (SELECT f, v, CAST(count(*) AS BIGINT) AS n_v,
         |                 CAST(sum(y) AS BIGINT) AS pos_v
         |          FROM m GROUP BY f, v),
         |perf AS (SELECT f, CAST(sum(n_v) AS BIGINT) AS n,
         |                CAST(sum(pos_v) AS BIGINT) AS pos,
         |                CAST(count(*) AS BIGINT) AS n_values
         |         FROM cells GROUP BY f),
         |cond AS (SELECT cells.f,
         |                ${dsum12("(CAST(n_v AS DOUBLE) / CAST(perf.n AS DOUBLE)) * (" + h("pos_v", "n_v") + ")")} AS h_cond
         |         FROM cells JOIN perf ON cells.f = perf.f GROUP BY cells.f),
         |ig AS (SELECT perf.f, n_values,
         |              greatest((${h("pos", "n")}) - h_cond, 0.0e0) AS ig_raw
         |       FROM perf JOIN cond ON perf.f = cond.f)
         |SELECT rank, f AS feature, n_values, ${t6("ig_raw")} AS info_gain FROM (
         |  SELECT *, CAST(row_number() OVER (ORDER BY ig_raw DESC, f) AS BIGINT) AS rank
         |  FROM ig)
         |ORDER BY rank""".stripMargin
    },

    // q251: frequent 3-itemsets — the row-local triple fan-out ≡ the
    // ordered 3-way self-join (the q154/q244 equivalence, one level up)
    "q251_frequent_triples" ->
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS bid, l_partkey AS item FROM lineitem),
         |tri AS (SELECT x.item AS a, y.item AS b, z.item AS c,
         |               CAST(count(*) AS BIGINT) AS n_baskets
         |        FROM b x JOIN b y ON x.bid = y.bid AND x.item < y.item
         |        JOIN b z ON y.bid = z.bid AND y.item < z.item
         |        GROUP BY 1, 2, 3 HAVING count(*) >= 2)
         |SELECT rank, a, b, c, n_baskets FROM (
         |  SELECT *, CAST(row_number() OVER (ORDER BY n_baskets DESC, a, b, c) AS BIGINT) AS rank
         |  FROM tri)
         |WHERE rank <= 15 ORDER BY rank""".stripMargin,

    // q252: two-proportion z — exact user-day conversion counts,
    // pooled variance, pinned 1.96 cut
    "q252_two_proportion_z" -> {
      val dd = (c: String) => s"CAST($c AS DOUBLE)"
      val p1 = s"${dd("x1")} / ${dd("n1")}"
      val p2 = s"${dd("x2")} / ${dd("n2")}"
      val pp = s"(${dd("x1")} + ${dd("x2")}) / (${dd("n1")} + ${dd("n2")})"
      val z = s"(($p1) - ($p2)) / sqrt(($pp) * (1.0e0 - ($pp)) * " +
        s"(1.0e0 / ${dd("n1")} + 1.0e0 / ${dd("n2")}))"
      s"""WITH ud AS (SELECT user_id, CAST($tsUs // 86400000000 AS BIGINT) AS day,
         |                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
         |            FROM events GROUP BY 1, 2),
         |g AS (SELECT CAST(sum(a) AS BIGINT) AS n1, CAST(sum(a * s) AS BIGINT) AS x1,
         |             CAST(sum(1 - a) AS BIGINT) AS n2, CAST(sum((1 - a) * s) AS BIGINT) AS x2
         |      FROM (SELECT CASE WHEN day % 7 IN (2, 3) THEN 1 ELSE 0 END AS a,
         |                   CASE WHEN converted = 1 THEN 1 ELSE 0 END AS s
         |            FROM ud))
         |SELECT n1, x1, n2, x2, ${t6(p1)} AS p1, ${t6(p2)} AS p2,
         |       ${t6(z)} AS z, abs($z) > 1.959964e0 AS significant
         |FROM g""".stripMargin
    },

    // q253: one-vs-rest AUC of the NB 'en' score — the shared NB CTEs
    // feeding the q211 midrank identity verbatim
    "q253_nb_auc" ->
      s"""$naiveBayesCtes,
         |lab AS (SELECT s.score AS v,
         |               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
         |        FROM scored s JOIN documents d USING (doc_id)
         |        WHERE s.cls = 'en'),
         |counts AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
         |                  CAST(sum(pos) AS BIGINT) AS n_pos
         |           FROM lab GROUP BY v),
         |r AS (SELECT cnt, n_pos,
         |        2 * (CAST(sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |             - cnt) + cnt + 1 AS r2
         |      FROM counts)
         |SELECT CAST(sum(n_pos) AS BIGINT) AS n_pos,
         |       CAST(sum(cnt - n_pos) AS BIGINT) AS n_neg,
         |       ${t6("CAST(CAST(sum(n_pos * r2) AS BIGINT) - CAST(sum(n_pos) AS BIGINT) * (CAST(sum(n_pos) AS BIGINT) + 1) AS DOUBLE) / " +
            "CAST(2 * CAST(sum(n_pos) AS BIGINT) * CAST(sum(cnt - n_pos) AS BIGINT) AS DOUBLE)")} AS auc
         |FROM r""".stripMargin,

    // q254: cumulative gains / lift deciles of the NB 'en' ranking —
    // rank-derived integer decile bins, integer cumulative counts
    "q254_gains_deciles" ->
      s"""$naiveBayesCtes,
         |lab AS (SELECT s.doc_id, s.score,
         |               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
         |        FROM scored s JOIN documents d USING (doc_id)
         |        WHERE s.cls = 'en'),
         |ranked AS (SELECT pos,
         |                  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rn,
         |                  CAST(count(*) OVER () AS BIGINT) AS n
         |           FROM lab),
         |bydec AS (SELECT (rn - 1) * 10 // n AS decile,
         |                 CAST(count(*) AS BIGINT) AS n_docs,
         |                 CAST(sum(pos) AS BIGINT) AS n_pos
         |          FROM ranked GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_all,
         |               CAST(sum(n_pos) AS BIGINT) AS pos_all FROM bydec),
         |c AS (SELECT decile, n_docs, n_pos, n_all, pos_all,
         |             CAST(sum(n_docs) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
         |             CAST(sum(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos
         |      FROM bydec CROSS JOIN tot)
         |SELECT decile, n_docs, n_pos,
         |       ${t6("CAST(cum_pos AS DOUBLE) / CAST(pos_all AS DOUBLE)")} AS gain,
         |       ${t6("(CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE)) / (CAST(pos_all AS DOUBLE) / CAST(n_all AS DOUBLE))")} AS lift
         |FROM c ORDER BY decile""".stripMargin,

    // q165: per-vertex triangles / wedges over the same graph
    "q165_clustering_coeff" -> {
      val corpus =
        s"""SELECT doc_id, text FROM ($nearDupCorpus)
           |WHERE doc_id < 100 OR (doc_id >= 10000 AND doc_id < 10100)""".stripMargin
      s"""${shinglesSql(corpus)},
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY doc_a, doc_b),
         |pairs AS (SELECT doc_a, doc_b FROM (
         |  SELECT doc_a, doc_b, ${t6("CAST(ni AS DOUBLE) / (ca.n + cb.n - ni)")} AS jaccard
         |  FROM inter JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b)
         |  WHERE jaccard >= 0.5),
         |ed0 AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |        UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |ce AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |       FROM ed0 WHERE src != dst),
         |tri AS (SELECT w.a, w.b, w.c
         |        FROM (SELECT e1.a, e1.b, e2.b AS c
         |              FROM ce e1 JOIN ce e2 ON e1.a = e2.a AND e1.b < e2.b) w
         |        JOIN ce e3 ON e3.a = w.b AND e3.b = w.c),
         |tv AS (SELECT v, CAST(count(*) AS BIGINT) AS n_tri FROM (
         |         SELECT unnest([a, b, c]) AS v FROM tri) GROUP BY 1),
         |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
         |          SELECT a AS v FROM ce UNION ALL SELECT b AS v FROM ce) GROUP BY 1)
         |SELECT d.v, d.deg, CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_tri,
         |       ${t6("CASE WHEN d.deg >= 2 THEN 2.0 * CAST(coalesce(t.n_tri, 0) AS DOUBLE) / (CAST(d.deg AS DOUBLE) * CAST(d.deg - 1 AS DOUBLE)) ELSE 0.0 END")} AS coeff
         |FROM deg d LEFT JOIN tv t USING (v) ORDER BY v""".stripMargin
    },

    // q163: the Bloom probe is a plan optimization — the answer is the
    // plain semi-join
    "q163_bloom_semi_join" ->
      s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
         |       ${t6(xsum("o_totalprice"))} AS total
         |FROM orders
         |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q162: DDSketch estimate vs the exact rank statistic — the value
    // at sorted position ⌈q·n⌉ is deterministic regardless of how ties
    // order among equal prices
    "q162_ddsketch_error_audit" -> {
      val alpha = 0.01
      val gamma = (1 + alpha) / (1 - alpha)
      val lnGamma = math.log(gamma)
      s"""WITH b AS (
         |  SELECT l_returnflag,
         |         CAST(ceil(ln(CAST(l_extendedprice AS DOUBLE)) / CAST($lnGamma AS DOUBLE)) AS BIGINT) AS bucket,
         |         CAST(count(*) AS BIGINT) AS cnt
         |  FROM lineitem WHERE l_extendedprice > 0 GROUP BY 1, 2),
         |c AS (SELECT l_returnflag, bucket, cnt,
         |        CAST(sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bucket) AS BIGINT) AS cum,
         |        CAST(sum(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
         |      FROM b),
         |p AS (SELECT l_returnflag, q, min(bucket) AS qbucket
         |      FROM c, (SELECT unnest([0.5::DOUBLE, 0.99::DOUBLE]) AS q) qs
         |      WHERE cum >= greatest(1, CAST(ceil(q * CAST(n AS DOUBLE)) AS BIGINT))
         |      GROUP BY 1, 2),
         |est AS (SELECT l_returnflag, q,
         |          ${t6(s"2.0 * pow(CAST($gamma AS DOUBLE), CAST(qbucket AS DOUBLE)) / CAST(${gamma + 1} AS DOUBLE)")} AS est
         |        FROM p),
         |rk AS (SELECT l_returnflag, l_extendedprice,
         |         CAST(row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS BIGINT) AS rn
         |       FROM lineitem),
         |nn AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY 1),
         |ex AS (SELECT rk.l_returnflag, qq.q, rk.l_extendedprice AS exact_q
         |       FROM rk JOIN nn USING (l_returnflag),
         |            (SELECT unnest([0.5::DOUBLE, 0.99::DOUBLE]) AS q) qq
         |       WHERE rk.rn = greatest(1, CAST(ceil(qq.q * CAST(nn.n AS DOUBLE)) AS BIGINT)))
         |SELECT e.l_returnflag, e.q, x.exact_q, e.est,
         |       ${t6("abs(e.est - x.exact_q) / x.exact_q")} AS rel_error
         |FROM est e JOIN ex x USING (l_returnflag, q)
         |ORDER BY 1, 2""".stripMargin
    },

    // q161: five queries, one scan — scores replayed per (qid, id)
    "q161_batched_knn" ->
      s"""WITH qs AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
         |            FROM embeddings WHERE vec_id IN (0, 7, 11, 23, 42)),
         |sc AS (SELECT q.qid, e.vec_id AS id,
         |         ${t6(cosine("CAST(e.embedding AS DOUBLE[])", "q.qv"))} AS score
         |       FROM embeddings e, qs q WHERE e.vec_id != q.qid)
         |SELECT qid, id, score, rn AS rank FROM (
         |  SELECT qid, id, score,
         |         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS BIGINT) AS rn
         |  FROM sc)
         |WHERE rn <= 5 ORDER BY qid, rank""".stripMargin,

    // q159: the IDENTICAL SQL text Spark runs — zero dialect drift
    "q159_sql_interface" -> SparkEntry.SqlInterfaceQuery,

    // q160: monthly revenue trend + MoM delta; trunc-to-month kept a
    // DATE in both engines
    "q160_monthly_revenue" ->
      s"""SELECT month, n_orders, revenue,
         |       ${t6("revenue - lag(revenue) OVER (ORDER BY month)")} AS mom_delta
         |FROM (
         |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |         CAST(count(*) AS BIGINT) AS n_orders,
         |         ${t6(xsum("o_totalprice"))} AS revenue
         |  FROM orders GROUP BY 1)
         |ORDER BY month""".stripMargin,

    // q154: parts ordered together — per-order pair fan-out
    "q154_part_cooccurrence" ->
      """SELECT part_a, part_b, n_orders FROM (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |         CAST(count(*) AS BIGINT) AS n_orders
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2)
        |ORDER BY n_orders DESC, part_a, part_b LIMIT 20""".stripMargin,

    // q155: first-order event-type transition counts per user stream
    "q155_event_transitions" ->
      s"""SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n FROM (
         |  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY $tsUs, event_id) AS prev_type,
         |         event_type AS next_type
         |  FROM events)
         |WHERE prev_type IS NOT NULL
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q156: the three media plants composed into one keep/drop gate
    "q156_media_gate" ->
      """SELECT doc_id, img_ok, aud_ok, vid_ok,
        |       (img_ok AND aud_ok AND vid_ok) AS keep
        |FROM (
        |  SELECT doc_id,
        |    (100 + doc_id % 900 >= 500 AND 50 + doc_id % 500 >= 300) AS img_ok,
        |    (8000 * (1 + doc_id % 3) >= 16000) AS aud_ok,
        |    (CAST(1 + doc_id % 100000 AS DOUBLE) /
        |       CAST(1000 * (1 + doc_id % 3) AS DOUBLE) <= 60.0) AS vid_ok
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // q151: overlap@10 of the full IVF-PQ replay against the exact scan
    "q151_ivfpq_recall" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS overlap_at_10 FROM (
         |  SELECT id FROM (${vectorScanSql(SparkEntry.KnnQueryId, 10)})
         |  INTERSECT
         |  SELECT id FROM (${ivfPqSql(SparkEntry.IvfPqNlist, SparkEntry.IvfPqM,
             SparkEntry.IvfPqKsub, SparkEntry.PqIters, SparkEntry.PqSample,
             SparkEntry.IvfPqNProbe, 10)}))""".stripMargin,

    // q168: the recall frontier — per (nProbe, oversample) operating
    // point, overlap@10 of the rescored IVF-PQ probe (q81's pipeline at
    // that point's probe width and candidate pool) against the exact
    // scan. The training chain, cell ranking, per-cell LUTs, per-vector
    // ADC distances and exact cosines are combo-INDEPENDENT, so they
    // are derived ONCE and the 12 operating points sweep over them as
    // windowed cuts — the naive 12-replay form ran >10 min in DuckDB,
    // this runs at one replay's cost.
    "q168_ann_frontier" -> AnnFrontierSql,

    // q321: the ANN auto-tuner's selection over the SAME frontier --
    // cheapest point meeting the overlap target (probe width first,
    // rescore pool second); fallback = highest overlap, flagged
    "q321_ann_autotune" ->
      s"""SELECT n_probe, oversample, overlap_at_10,
         |       (overlap_at_10 >= 8) AS met_target
         |FROM ($AnnFrontierSql) f
         |ORDER BY (CASE WHEN overlap_at_10 >= 8 THEN 0 ELSE 1 END),
         |         (CASE WHEN overlap_at_10 >= 8 THEN CAST(n_probe AS DOUBLE)
         |               ELSE -CAST(overlap_at_10 AS DOUBLE) END),
         |         n_probe, oversample
         |LIMIT 1""".stripMargin,

    // q153: the bucketed layout changes the PLAN (no join shuffle —
    // PlanSpec), not the answer
    "q153_bucketed_join" ->
      s"""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
         |       ${xsum("o_totalprice")} AS revenue
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // q145: the roundtrip must reproduce the source exactly
    "q145_jsonl_roundtrip" ->
      """SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS text_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q146: the partitioned layout changes the PLAN, not the answer
    "q146_lang_partitioned_scan" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents WHERE lang = 'en'
        |GROUP BY source ORDER BY source""".stripMargin,

    // q147: skew/kurtosis from exact power sums — the moment algebra
    // is mirrored op-for-op (left-associated products, pinned 3.0/4.0/
    // 6.0 doubles)
    "q147_moments" ->
      s"""SELECT l_returnflag, n,
         |       ${t6("m3 / pow(m2, 1.5)")} AS skewness,
         |       ${t6("m4 / (m2 * m2) - 3.0")} AS kurtosis
         |FROM (
         |  SELECT l_returnflag, n,
         |         s2 / n_d - mu * mu AS m2,
         |         s3 / n_d - 3.0 * mu * (s2 / n_d) + 2.0 * mu * mu * mu AS m3,
         |         s4 / n_d - 4.0 * mu * (s3 / n_d) + 6.0 * mu * mu * (s2 / n_d)
         |           - 3.0 * mu * mu * mu * mu AS m4
         |  FROM (
         |    SELECT l_returnflag, n, CAST(n AS DOUBLE) AS n_d,
         |           s1 / CAST(n AS DOUBLE) AS mu, s2, s3, s4
         |    FROM (
         |      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         |             ${xsum("l_quantity")} AS s1,
         |             ${psum6("l_quantity * l_quantity")} AS s2,
         |             ${psum6("l_quantity * l_quantity * l_quantity")} AS s3,
         |             ${psum6("l_quantity * l_quantity * l_quantity * l_quantity")} AS s4
         |      FROM lineitem GROUP BY l_returnflag)))
         |ORDER BY l_returnflag""".stripMargin,

    // q148: INTERSECT/EXCEPT set semantics
    "q148_set_ops" ->
      """SELECT custkey, relation FROM (
        |  SELECT o_custkey AS custkey, 'both' AS relation FROM (
        |    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |    INTERSECT
        |    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
        |  UNION ALL
        |  SELECT o_custkey AS custkey, 'urgent_only' AS relation FROM (
        |    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |    EXCEPT
        |    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'))
        |ORDER BY custkey, relation""".stripMargin,

    // q142: mutual top-1 confirmation over the q22 cap
    "q142_mutual_nn_pairs" ->
      s"""WITH sc AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |         ${t6(cosine("CAST(a.embedding AS DOUBLE[])", "CAST(b.embedding AS DOUBLE[])"))} AS sim
         |  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
         |  WHERE a.vec_id < 500 AND b.vec_id < 500),
         |top AS (SELECT id_a, id_b, sim FROM (
         |  SELECT id_a, id_b, sim,
         |         row_number() OVER (PARTITION BY id_a ORDER BY sim DESC, id_b) AS rn
         |  FROM sc) WHERE rn = 1)
         |SELECT t.id_a, t.id_b, t.sim
         |FROM top t JOIN top u ON u.id_a = t.id_b AND u.id_b = t.id_a
         |WHERE t.id_a < t.id_b ORDER BY t.id_a""".stripMargin,

    // q143: resolved-cluster size histogram over the q82 closure
    "q143_cluster_sizes" -> {
      val corpus =
        """SELECT doc_id, text FROM documents WHERE doc_id < 100
          |UNION ALL
          |SELECT doc_id + 10000, text FROM documents WHERE doc_id < 100
          |UNION ALL
          |SELECT doc_id + 20000, substr(text, strpos(text, ' ') + 1)
          |FROM documents WHERE doc_id < 100""".stripMargin
      "WITH RECURSIVE " + shinglesSql(corpus).stripPrefix("WITH ") +
        s""",
           |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
           |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
           |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           |          GROUP BY doc_a, doc_b),
           |pairs AS (SELECT doc_a, doc_b FROM (
           |    SELECT doc_a, doc_b, ${t6("CAST(ni AS DOUBLE) / (ca.n + cb.n - ni)")} AS jaccard
           |    FROM inter JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b)
           |  WHERE jaccard >= 0.5),
           |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
           |          UNION SELECT doc_b, doc_a FROM pairs),
           |reach(id, r) AS (
           |  SELECT DISTINCT src AS id, src AS r FROM edges
           |  UNION
           |  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst),
           |labels AS (SELECT id AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY id),
           |sizes AS (SELECT cluster_rep, CAST(count(*) AS BIGINT) AS sz
           |          FROM labels GROUP BY 1)
           |SELECT sz, CAST(count(*) AS BIGINT) AS n_clusters
           |FROM sizes GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // q144: degree distribution of the symmetrized q31 pair graph
    "q144_degree_histogram" -> {
      val corpus =
        s"""SELECT doc_id, text FROM ($nearDupCorpus)
           |WHERE doc_id < 100 OR (doc_id >= 10000 AND doc_id < 10100)""".stripMargin
      s"""${shinglesSql(corpus)},
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY doc_a, doc_b),
         |pairs AS (SELECT doc_a, doc_b FROM (
         |  SELECT doc_a, doc_b, ${t6("CAST(ni AS DOUBLE) / (ca.n + cb.n - ni)")} AS jaccard
         |  FROM inter JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b)
         |  WHERE jaccard >= 0.5),
         |ed0 AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |        UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM ed0 GROUP BY 1)
         |SELECT deg, CAST(count(*) AS BIGINT) AS n_vertices
         |FROM deg GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // q135: cross-source shared-gram matrix, grams deduped per source
    "q135_source_overlap" ->
      s"""WITH sh AS (SELECT DISTINCT source, s FROM (
         |  SELECT source,
         |         unnest(list_transform(generate_series(1, len(${toks("text")}) - 2),
         |                i -> array_to_string(${toks("text")}[i:i+2], ' '))) AS s
         |  FROM documents WHERE len(${toks("text")}) >= 3)),
         |cnt AS (SELECT source, count(*) AS n_sh FROM sh GROUP BY 1),
         |ov AS (SELECT a.source AS source_a, b.source AS source_b,
         |              CAST(count(*) AS BIGINT) AS n_shared
         |       FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
         |       GROUP BY 1, 2)
         |SELECT source_a, source_b, n_shared,
         |       ${t6("CAST(n_shared AS DOUBLE) / CAST(least(ca.n_sh, cb.n_sh) AS DOUBLE)")} AS share
         |FROM ov JOIN cnt ca ON ca.source = source_a JOIN cnt cb ON cb.source = source_b
         |ORDER BY source_a, source_b""".stripMargin,

    // q136: TPC-H Q5 — six-table join, same-nation constraint
    "q136_tpch_q5" ->
      s"""SELECT n_name, ${t6(xsum("l_extendedprice * (1.0 - l_discount)"))} AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    // q137: power-of-two length buckets via the exact integer
    // binary-string length (no float log at bucket edges)
    "q137_length_buckets" ->
      s"""SELECT CAST(length(bin(n_chars)) - 1 AS BIGINT) AS bucket,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM documents WHERE n_chars > 0
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q129: novelty — one gram-keyed min(doc_id) joined back
    "q129_novelty_score" -> {
      val corpus =
        s"""SELECT doc_id, text FROM ($nearDupCorpus)
           |WHERE doc_id < 100 OR (doc_id >= 10000 AND doc_id < 10100)""".stripMargin
      s"""${shinglesSql(corpus)},
         |fst AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY 1),
         |agg AS (SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |          CAST(sum(CASE WHEN f.first_doc < sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_seen
         |        FROM sh JOIN fst f USING (s) GROUP BY 1)
         |SELECT doc_id, n_grams,
         |       ${t6("1.0 - CAST(n_seen AS DOUBLE) / CAST(n_grams AS DOUBLE)")} AS novelty
         |FROM agg ORDER BY doc_id""".stripMargin
    },

    // q130: percent_rank/cume_dist — identical (rank−1)/(n−1) and
    // rows≤/n definitions in both engines under a unique composite order
    "q130_percent_rank" ->
      s"""SELECT o_orderkey, o_orderpriority, pr, cd FROM (
         |  SELECT o_orderkey, o_orderpriority,
         |         ${t6("percent_rank() OVER w")} AS pr,
         |         ${t6("cume_dist() OVER w")} AS cd
         |  FROM orders
         |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey))
         |WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey""".stripMargin,

    // q131: matryoshka scan — the q20 vector scan over the first 16
    // components of every (double-cast) embedding
    "q131_matryoshka_knn" ->
      s"""SELECT id, score FROM (
         |  SELECT e.vec_id AS id,
         |         ${t6(cosine("CAST(e.embedding AS DOUBLE[])[1:16]", "q.qv"))} AS score
         |  FROM embeddings e,
         |       (SELECT CAST(embedding AS DOUBLE[])[1:16] AS qv
         |        FROM embeddings WHERE vec_id = ${SparkEntry.KnnQueryId}) q
         |  WHERE e.vec_id != ${SparkEntry.KnnQueryId})
         |ORDER BY score DESC, id LIMIT 10""".stripMargin,

    // q132: per-group OLS from the same exact moment sums as q103; the
    // intercept reuses the RAW slope expression, mirrored verbatim
    "q132_ols_by_flag" -> {
      val slope = "(CAST(n AS DOUBLE) * sxy - sx * sy) / " +
        "(CAST(n AS DOUBLE) * sxx - sx * sx)"
      s"""SELECT l_returnflag, n, ${t6(slope)} AS slope,
         |       ${t6(s"(sy - ($slope) * sx) / CAST(n AS DOUBLE)")} AS intercept
         |FROM (
         |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         |         ${psum6("l_quantity * l_extendedprice")} AS sxy,
         |         ${xsum("l_quantity")} AS sx, ${xsum("l_extendedprice")} AS sy,
         |         ${psum6("l_quantity * l_quantity")} AS sxx
         |  FROM lineitem GROUP BY l_returnflag)
         |ORDER BY l_returnflag""".stripMargin
    },

    // q133: per-doc token entropy −Σ p·ln p, decimal-summed
    "q133_token_entropy" ->
      s"""WITH tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
         |            FROM (SELECT doc_id, unnest(${toks("text")}) AS term FROM documents)
         |            GROUP BY 1, 2),
         |nn AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM tf GROUP BY 1)
         |SELECT tf.doc_id, max(nn.n) AS n_tokens,
         |       ${t6(s"-(${dsum12("(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))")})")} AS entropy
         |FROM tf JOIN nn USING (doc_id)
         |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin,

    // q134: 2-core — 4 unrolled peeling rounds over the q31 pair graph
    // (the Spark side asserts convergence within 4, and peeling past
    // the fixpoint is the identity, so the unroll is exact)
    "q134_kcore" -> {
      val corpus =
        """SELECT doc_id, text FROM documents WHERE doc_id < 100
          |UNION ALL
          |SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id < 60
          |UNION ALL
          |SELECT doc_id + 20000 AS doc_id, substr(text, instr(text, ' ') + 1) AS text
          |FROM documents WHERE doc_id < 60
          |UNION ALL
          |SELECT doc_id + 10000 AS doc_id, substr(text, instr(text, ' ') + 1) AS text
          |FROM documents WHERE doc_id >= 60 AND doc_id < 100""".stripMargin
      val rounds = (1 to 4).map { i =>
        s"""k$i AS (SELECT src AS v FROM e${i - 1} GROUP BY src HAVING count(*) >= 2),
           |e$i AS (SELECT e.src, e.dst FROM e${i - 1} e
           |        JOIN k$i a ON a.v = e.src JOIN k$i b ON b.v = e.dst)""".stripMargin
      }.mkString(",\n")
      s"""${shinglesSql(corpus)},
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY doc_a, doc_b),
         |pairs AS (SELECT doc_a, doc_b FROM (
         |  SELECT doc_a, doc_b, ${t6("CAST(ni AS DOUBLE) / (ca.n + cb.n - ni)")} AS jaccard
         |  FROM inter JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b)
         |  WHERE jaccard >= 0.5),
         |e0 AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |       UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |$rounds
         |SELECT src AS v, CAST(count(*) AS BIGINT) AS deg
         |FROM e4 GROUP BY 1 ORDER BY v""".stripMargin
    },

    // q127: the oracle is the NAIVE all-pairs token-set Jaccard — the
    // prefix filter must be lossless, so optimized Spark ≡ naive SQL
    "q127_prefix_filter_jaccard" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM ($nearDupCorpus)
         |  WHERE doc_id < 100 OR (doc_id >= 10000 AND doc_id < 10100)),
         |tk AS (SELECT DISTINCT doc_id, unnest(list_distinct(${toks("text")})) AS term FROM corpus),
         |sz AS (SELECT doc_id, count(*) AS n FROM tk GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
         |          FROM tk a JOIN tk b ON a.term = b.term AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT doc_a, doc_b, jaccard FROM (
         |  SELECT doc_a, doc_b,
         |         ${t6("CAST(ni AS DOUBLE) / CAST(ca.n + cb.n - ni AS DOUBLE)")} AS jaccard
         |  FROM inter JOIN sz ca ON ca.doc_id = doc_a JOIN sz cb ON cb.doc_id = doc_b)
         |WHERE jaccard >= 0.8 ORDER BY doc_a, doc_b""".stripMargin,

    // q128: hottest join keys — count desc, key asc, top 20
    "q128_key_skew_profile" ->
      s"""SELECT l_partkey, CAST(count(*) AS BIGINT) AS n
         |FROM lineitem GROUP BY 1
         |ORDER BY n DESC, l_partkey LIMIT 20""".stripMargin,

    // q125: winsorized sums — the q114 DDSketch machinery at p05/p95,
    // bounds joined back onto one clipping scan
    "q125_winsorized_stats" -> {
      val alpha = 0.01
      val gamma = (1 + alpha) / (1 - alpha)
      val lnGamma = math.log(gamma)
      s"""WITH b AS (
         |  SELECT l_returnflag,
         |         CAST(ceil(ln(CAST(l_extendedprice AS DOUBLE)) / CAST($lnGamma AS DOUBLE)) AS BIGINT) AS bucket,
         |         CAST(count(*) AS BIGINT) AS cnt
         |  FROM lineitem WHERE l_extendedprice > 0 GROUP BY 1, 2),
         |c AS (SELECT l_returnflag, bucket, cnt,
         |        CAST(sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bucket) AS BIGINT) AS cum,
         |        CAST(sum(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
         |      FROM b),
         |p AS (SELECT l_returnflag, q, min(bucket) AS qbucket
         |      FROM c, (SELECT unnest([0.05::DOUBLE, 0.95::DOUBLE]) AS q) qs
         |      WHERE cum >= greatest(1, CAST(ceil(q * CAST(n AS DOUBLE)) AS BIGINT))
         |      GROUP BY 1, 2),
         |est AS (SELECT l_returnflag, q,
         |          ${t6(s"2.0 * pow(CAST($gamma AS DOUBLE), CAST(qbucket AS DOUBLE)) / CAST(${gamma + 1} AS DOUBLE)")} AS est
         |        FROM p),
         |bounds AS (SELECT l_returnflag,
         |             min(CASE WHEN q = 0.05 THEN est END) AS lo,
         |             min(CASE WHEN q = 0.95 THEN est END) AS hi
         |           FROM est GROUP BY 1)
         |SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n,
         |       ${xsum("least(greatest(l.l_extendedprice, bo.lo), bo.hi)")} AS winsorized_sum,
         |       min(bo.lo) AS lo, min(bo.hi) AS hi
         |FROM lineitem l JOIN bounds bo ON l.l_returnflag = bo.l_returnflag
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // q126: MERGE upsert semantics — matched keys replaced, unmatched
    // inserted (the manifest-layer mechanics are spec'd in TableOpsSpec;
    // the oracle checks the visible final state)
    "q126_merge_upsert" ->
      s"""WITH upd AS (
         |  SELECT doc_id, concat('UPDATED ', text) AS text FROM documents WHERE doc_id % 10 = 0
         |  UNION ALL
         |  SELECT doc_id + 90000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0),
         |final AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id NOT IN (SELECT doc_id FROM upd)
         |  UNION ALL SELECT doc_id, text FROM upd)
         |SELECT doc_id, CAST(length(text) AS BIGINT) AS text_len
         |FROM final ORDER BY doc_id""".stripMargin,

    // q123: pivoted cross-tab — Spark's pivot columns are the literal
    // return-flag values, mirrored as conditional xsum aggregates
    "q123_pivot_returnflag" ->
      s"""SELECT o_orderpriority,
         |       ${xsum("CASE WHEN l_returnflag = 'A' THEN l_quantity END")} AS "A",
         |       ${xsum("CASE WHEN l_returnflag = 'N' THEN l_quantity END")} AS "N",
         |       ${xsum("CASE WHEN l_returnflag = 'R' THEN l_quantity END")} AS "R"
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
  )

  /** Derived entries that WRAP other oracles (audit / composition
    * queries) — built after `base` so they can quote its SQL. */
  /** The q291/q292 power-iteration CTE chain: full symmetric covariance
    * (q121's grid-quantized upper triangle mirrored), uniform unit v0
    * (0.125 = 1/√64 exact), then `iters` normalized rounds — each a
    * matvec on the 12-decimal grid plus an L2 rescale. cov and every w
    * are MATERIALIZED because they are referenced twice per round (the
    * q238 re-expansion lesson). */
  private def pcaCtes(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""w$k AS MATERIALIZED (SELECT cov.i AS i, ${dsum12("cov.cov * v.x")} AS w
         |     FROM cov JOIN v${k - 1} v ON v.j = cov.j GROUP BY cov.i),
         |n$k AS (SELECT sqrt(${dsum12("w * w")}) AS nrm FROM w$k),
         |v$k AS (SELECT i AS j, w / nrm AS x FROM w$k CROSS JOIN n$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH cov_u AS MATERIALIZED (${base("q121_covariance_matrix")}),
       |cov AS MATERIALIZED (
       |  SELECT i, j, cov FROM cov_u
       |  UNION ALL
       |  SELECT j AS i, i AS j, cov FROM cov_u WHERE i < j),
       |v0 AS (SELECT CAST(t.j AS BIGINT) AS j, CAST(0.125 AS DOUBLE) AS x
       |       FROM (SELECT unnest(generate_series(0, 63)) AS j) t),
       |$rounds""".stripMargin
  }

  /** The q293/q294 duel frame: each order's top-2 lineitems by price,
    * winner flag vs runner-up flag, same-flag and single-line orders
    * dropped. */
  private val duelsCtes: String =
    """ranked AS (
      |  SELECT l_orderkey, l_returnflag,
      |         row_number() OVER (PARTITION BY l_orderkey
      |           ORDER BY l_extendedprice DESC, l_linenumber) AS rn
      |  FROM lineitem),
      |duels AS (SELECT wf, lf FROM (
      |    SELECT max(CASE WHEN rn = 1 THEN l_returnflag END) AS wf,
      |           max(CASE WHEN rn = 2 THEN l_returnflag END) AS lf
      |    FROM ranked WHERE rn <= 2 GROUP BY l_orderkey)
      |  WHERE lf IS NOT NULL AND wf != lf)""".stripMargin

  // q317/q320 shared frontier: blocking window recall/cost sweep --
  // maximal-window pair mine with rank offsets, per-window cuts as
  // filters, shared ground truth
  private lazy val BlockingFrontierSql: String =
    s"""WITH corpus AS (SELECT doc_id, text FROM documents
       |                UNION ALL
       |                SELECT doc_id + 10000, text FROM documents),
       |grp AS (SELECT md5(text) AS h, list_sort(list(doc_id)) AS ids
       |        FROM corpus GROUP BY md5(text) HAVING count(*) >= 2),
       |tp AS (SELECT CAST(p.lo AS BIGINT) AS lo, CAST(p.hi AS BIGINT) AS hi
       |       FROM (SELECT unnest(flatten(list_transform(generate_series(1, len(ids) - 1),
       |               i -> list_transform(ids[i + 1:],
       |                      x -> {'lo': ids[i], 'hi': x})))) AS p
       |             FROM grp)),
       |tok AS (SELECT doc_id, ${md5Long("t")} AS h
       |        FROM (SELECT doc_id, unnest(${toks("text")}) AS t FROM corpus)),
       |votes AS (SELECT doc_id, i, SUM(CASE WHEN ((h >> i) & 1) = 1 THEN 1 ELSE -1 END) AS v
       |          FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS i)
       |          GROUP BY doc_id, i),
       |sig AS (SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS simhash
       |        FROM votes GROUP BY doc_id),
       |ranked AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, simhash,
       |                  CAST(row_number() OVER (ORDER BY simhash, doc_id) AS BIGINT) AS r
       |           FROM sig),
       |cand AS (SELECT least(a.doc_id, b.doc_id) AS lo,
       |                greatest(a.doc_id, b.doc_id) AS hi,
       |                b.r - a.r AS off
       |         FROM ranked a JOIN ranked b ON b.r > a.r AND b.r <= a.r + 8
       |         WHERE bit_count(xor(a.simhash, b.simhash)) <= 2),
       |ws AS (SELECT CAST(unnest([1, 2, 4, 8]) AS BIGINT) AS "window"),
       |nc AS (SELECT "window", CAST(count(*) AS BIGINT) AS n_candidates
       |       FROM ws JOIN cand ON off <= "window" GROUP BY "window"),
       |nh AS (SELECT "window", CAST(count(*) AS BIGINT) AS n_hit
       |       FROM ws JOIN (SELECT c.off FROM tp JOIN cand c
       |                     ON c.lo = tp.lo AND c.hi = tp.hi) hitoff
       |            ON hitoff.off <= "window" GROUP BY "window"),
       |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_true_pairs FROM tp)
       |SELECT ws."window", n_true_pairs,
       |       COALESCE(n_candidates, CAST(0 AS BIGINT)) AS n_candidates,
       |       COALESCE(n_hit, CAST(0 AS BIGINT)) AS n_hit,
       |       ${t6("CAST(COALESCE(n_hit, 0) AS DOUBLE) / CAST(n_true_pairs AS DOUBLE)")} AS recall
       |FROM ws LEFT JOIN nc USING ("window") LEFT JOIN nh USING ("window")
       |CROSS JOIN nt ORDER BY ws."window"""".stripMargin


  // q168/q321 shared frontier: the IVF-PQ recall sweep replay -- the
  // training chain, cell ranking, per-cell LUTs, ADC distances and
  // exact cosines are combo-independent, derived ONCE; the 12
  // operating points sweep over them as windowed cuts
  private lazy val AnnFrontierSql: String = {
      val (nlist, m) = (SparkEntry.IvfPqNlist, SparkEntry.IvfPqM)
      val (ksub, iters) = (SparkEntry.IvfPqKsub, SparkEntry.PqIters)
      val sample = SparkEntry.PqSample
      val qid = SparkEntry.KnnQueryId
      val dsub = 64 / m
      def sv(u: String, s: String) = s"$u[($s*$dsub+1):($s*$dsub+$dsub)]"
      val coarse =
        lloydChainSql("c", unitFromEmbeddingsSql, "pq", 1, nlist, iters, sample)
      val resSrc =
        s"""SELECT u.vec_id,
           |    list_transform(generate_series(1, 64),
           |      i -> u.uvec[i] - cb.centroid[i]) AS uvec
           |  FROM cunit u
           |  JOIN ccodes k ON k.vec_id = u.vec_id
           |  JOIN ccb$iters cb ON cb.code = k.code""".stripMargin
      val resid = lloydChainSql("r", resSrc, "ivfpq", m, ksub, iters, sample)
      val combosVals = (for {
        np <- SparkEntry.FrontierProbes; os <- SparkEntry.FrontierOversamples
      } yield s"($np, $os)").mkString(", ")
      s"""WITH $coarse,
         |$resid,
         |combos(n_probe, oversample) AS (SELECT * FROM (VALUES $combosVals)),
         |qv AS (SELECT uvec FROM cunit WHERE vec_id = $qid),
         |cellrank AS (
         |  SELECT cb.code AS cluster, cb.centroid,
         |         row_number() OVER (ORDER BY
         |           ${pqDist("list_dot_product(q.uvec, q.uvec)", "q.uvec", "cb.centroid")},
         |           cb.code) AS cell_rank
         |  FROM ccb$iters cb, qv q),
         |qres AS (
         |  SELECT p.cluster,
         |         list_transform(generate_series(1, 64),
         |           i -> q.uvec[i] - p.centroid[i]) AS uvec
         |  FROM cellrank p, qv q),
         |qsub AS (
         |  SELECT cluster, sub, ${sv("uvec", "sub")} AS qsub
         |  FROM (SELECT cluster, uvec, unnest(generate_series(0, ${m - 1})) AS sub
         |        FROM qres)),
         |lut AS (
         |  SELECT q.cluster, c.sub, c.code,
         |         ${pqDist("list_dot_product(q.qsub, q.qsub)", "q.qsub", "c.centroid")} AS d
         |  FROM rcb$iters c JOIN qsub q USING (sub)),
         |jc AS (
         |  SELECT r.vec_id, k.code AS cluster, r.sub, r.code
         |  FROM rcodes r JOIN ccodes k ON k.vec_id = r.vec_id),
         |adc AS (
         |  SELECT j.vec_id AS id, max(cr.cell_rank) AS cell_rank,
         |         ${t6(dsum12("l.d"))} AS adc_dist
         |  FROM jc j
         |  JOIN lut l ON j.cluster = l.cluster AND j.sub = l.sub AND j.code = l.code
         |  JOIN cellrank cr ON cr.cluster = j.cluster
         |  WHERE j.vec_id != $qid
         |  GROUP BY j.vec_id),
         |cand AS (
         |  SELECT c.n_probe, c.oversample, a.id,
         |         row_number() OVER (PARTITION BY c.n_probe, c.oversample
         |                            ORDER BY a.adc_dist, a.id) AS rn
         |  FROM combos c JOIN adc a ON a.cell_rank <= c.n_probe),
         |exactscore AS (
         |  SELECT e.vec_id AS id,
         |         ${t6(cosine("CAST(e.embedding AS DOUBLE[])", "q.qv"))} AS score
         |  FROM embeddings e,
         |       (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
         |        WHERE vec_id = $qid) q
         |  WHERE e.vec_id != $qid),
         |etop AS (SELECT id FROM exactscore ORDER BY score DESC, id LIMIT 10),
         |resc AS (
         |  SELECT n_probe, oversample, id FROM (
         |    SELECT c.n_probe, c.oversample, c.id,
         |           row_number() OVER (PARTITION BY c.n_probe, c.oversample
         |                              ORDER BY s.score DESC, c.id) AS rr
         |    FROM cand c JOIN exactscore s USING (id)
         |    WHERE c.rn <= 10 * c.oversample)
         |  WHERE rr <= 10)
         |SELECT CAST(c.n_probe AS BIGINT) AS n_probe,
         |       CAST(c.oversample AS BIGINT) AS oversample,
         |       CAST(count(e.id) AS BIGINT) AS overlap_at_10
         |FROM combos c
         |LEFT JOIN resc r ON r.n_probe = c.n_probe AND r.oversample = c.oversample
         |LEFT JOIN etop e ON e.id = r.id
         |GROUP BY c.n_probe, c.oversample
         |ORDER BY n_probe, oversample""".stripMargin
  }

  // q328 frontier: AnnFrontierSql generalized to a HELD-OUT QUERY SET —
  // the training chain, corpus codes and cell assignments stay
  // query-independent (derived once); every query-side CTE carries qid
  // and partitions its window by it. The output is mean recall@10 per
  // operating point: sum of per-query exact-top-10 hits / (10 · |set|).
  private lazy val AnnFrontierHeldoutSql: String = {
      val (nlist, m) = (SparkEntry.IvfPqNlist, SparkEntry.IvfPqM)
      val (ksub, iters) = (SparkEntry.IvfPqKsub, SparkEntry.PqIters)
      val sample = SparkEntry.PqSample
      val qids = SparkEntry.HeldoutQueryIds
      val dsub = 64 / m
      def sv(u: String, s: String) = s"$u[($s*$dsub+1):($s*$dsub+$dsub)]"
      val coarse =
        lloydChainSql("c", unitFromEmbeddingsSql, "pq", 1, nlist, iters, sample)
      val resSrc =
        s"""SELECT u.vec_id,
           |    list_transform(generate_series(1, 64),
           |      i -> u.uvec[i] - cb.centroid[i]) AS uvec
           |  FROM cunit u
           |  JOIN ccodes k ON k.vec_id = u.vec_id
           |  JOIN ccb$iters cb ON cb.code = k.code""".stripMargin
      val resid = lloydChainSql("r", resSrc, "ivfpq", m, ksub, iters, sample)
      val combosVals = (for {
        np <- SparkEntry.FrontierProbes; os <- SparkEntry.FrontierOversamples
      } yield s"($np, $os)").mkString(", ")
      val qidVals = qids.map(q => s"($q)").mkString(", ")
      val denom = s"${10.0 * qids.size}"
      s"""WITH $coarse,
         |$resid,
         |combos(n_probe, oversample) AS (SELECT * FROM (VALUES $combosVals)),
         |qids(qid) AS (SELECT * FROM (VALUES $qidVals)),
         |qv AS (SELECT u.vec_id AS qid, u.uvec
         |       FROM cunit u JOIN qids ON u.vec_id = qids.qid),
         |cellrank AS (
         |  SELECT q.qid, cb.code AS cluster, cb.centroid,
         |         row_number() OVER (PARTITION BY q.qid ORDER BY
         |           ${pqDist("list_dot_product(q.uvec, q.uvec)", "q.uvec", "cb.centroid")},
         |           cb.code) AS cell_rank
         |  FROM ccb$iters cb, qv q),
         |qres AS (
         |  SELECT p.qid, p.cluster,
         |         list_transform(generate_series(1, 64),
         |           i -> q.uvec[i] - p.centroid[i]) AS uvec
         |  FROM cellrank p JOIN qv q USING (qid)),
         |qsub AS (
         |  SELECT qid, cluster, sub, ${sv("uvec", "sub")} AS qsub
         |  FROM (SELECT qid, cluster, uvec, unnest(generate_series(0, ${m - 1})) AS sub
         |        FROM qres)),
         |lut AS (
         |  SELECT q.qid, q.cluster, c.sub, c.code,
         |         ${pqDist("list_dot_product(q.qsub, q.qsub)", "q.qsub", "c.centroid")} AS d
         |  FROM rcb$iters c JOIN qsub q USING (sub)),
         |jc AS (
         |  SELECT r.vec_id, k.code AS cluster, r.sub, r.code
         |  FROM rcodes r JOIN ccodes k ON k.vec_id = r.vec_id),
         |adc AS (
         |  SELECT l.qid, j.vec_id AS id, max(cr.cell_rank) AS cell_rank,
         |         ${t6(dsum12("l.d"))} AS adc_dist
         |  FROM jc j
         |  JOIN lut l ON j.cluster = l.cluster AND j.sub = l.sub AND j.code = l.code
         |  JOIN cellrank cr ON cr.qid = l.qid AND cr.cluster = j.cluster
         |  WHERE j.vec_id != l.qid
         |  GROUP BY l.qid, j.vec_id),
         |cand AS (
         |  SELECT c.n_probe, c.oversample, a.qid, a.id,
         |         row_number() OVER (PARTITION BY a.qid, c.n_probe, c.oversample
         |                            ORDER BY a.adc_dist, a.id) AS rn
         |  FROM combos c JOIN adc a ON a.cell_rank <= c.n_probe),
         |exactscore AS (
         |  SELECT q.qid, e.vec_id AS id,
         |         ${t6(cosine("CAST(e.embedding AS DOUBLE[])", "q.qv"))} AS score
         |  FROM embeddings e,
         |       (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
         |        FROM embeddings JOIN qids ON vec_id = qids.qid) q
         |  WHERE e.vec_id != q.qid),
         |etop AS (
         |  SELECT qid, id FROM (
         |    SELECT qid, id, row_number() OVER (
         |      PARTITION BY qid ORDER BY score DESC, id) AS rn
         |    FROM exactscore)
         |  WHERE rn <= 10),
         |resc AS (
         |  SELECT n_probe, oversample, qid, id FROM (
         |    SELECT c.n_probe, c.oversample, c.qid, c.id,
         |           row_number() OVER (PARTITION BY c.qid, c.n_probe, c.oversample
         |                              ORDER BY s.score DESC, c.id) AS rr
         |    FROM cand c JOIN exactscore s ON s.qid = c.qid AND s.id = c.id
         |    WHERE c.rn <= 10 * c.oversample)
         |  WHERE rr <= 10)
         |SELECT CAST(c.n_probe AS BIGINT) AS n_probe,
         |       CAST(c.oversample AS BIGINT) AS oversample,
         |       ${t6(s"CAST(count(e.id) AS DOUBLE) / $denom")} AS mean_recall
         |FROM combos c
         |LEFT JOIN resc r ON r.n_probe = c.n_probe AND r.oversample = c.oversample
         |LEFT JOIN etop e ON e.qid = r.qid AND e.id = r.id
         |GROUP BY c.n_probe, c.oversample
         |ORDER BY n_probe, oversample""".stripMargin
  }

  val sql: Map[String, String] = base ++ Map(
    // q328: the recall-mode auto-tuner's selection over the held-out
    // frontier — cheapest point whose measured mean recall@10 meets
    // the SLA target (probe width first); fallback = highest recall
    "q328_ann_autotune_recall" -> {
      val tgt = SparkEntry.HeldoutRecallTarget
      s"""SELECT n_probe, oversample, mean_recall,
         |       (mean_recall >= $tgt) AS met_target
         |FROM ($AnnFrontierHeldoutSql) f
         |ORDER BY (CASE WHEN mean_recall >= $tgt THEN 0 ELSE 1 END),
         |         (CASE WHEN mean_recall >= $tgt THEN CAST(n_probe AS DOUBLE)
         |               ELSE -mean_recall END),
         |         n_probe, oversample
         |LIMIT 1""".stripMargin
    },

    // q326: the index-backed incremental span formulation must be
    // hash-identical to the recompute formulation — the oracle IS
    // q324's SQL, so a green row is the equivalence proof
    "q326_incremental_spans_indexed" -> base("q324_incremental_spans"),

    // q327: the hashed-shingle-key formulation must be span-identical
    // to the text-key formulation — the oracle IS q322's SQL
    "q327_dup_spans_hashed" -> base("q322_dup_spans"),

    // q329: the Bloom-prefiltered incremental formulation must be
    // exact (no false negatives + confirm kills false positives) —
    // the oracle IS q324's SQL
    "q329_incremental_spans_bloom" -> base("q324_incremental_spans"),

    // q330: the SHARDED-Bloom prefilter (per-shard filters as a table,
    // probed via cogroup — the no-driver-array form) must be exact for
    // the same reason as q329 — the oracle IS q324's SQL
    "q330_incremental_spans_bloom_sharded" -> base("q324_incremental_spans"),

    // q157: measured recall of the LSH near-dup path against the exact
    // quadratic baseline — the bucketing trade quantified as data
    "q157_lsh_recall" ->
      s"""SELECT n_exact, n_lsh, n_common,
         |       ${t6("CAST(n_common AS DOUBLE) / CAST(n_exact AS DOUBLE)")} AS recall
         |FROM (SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM (${base("q22_near_dup_vectors")})) AS n_exact,
         |  (SELECT CAST(count(*) AS BIGINT) FROM (${base("q49_near_dup_lsh")})) AS n_lsh,
         |  (SELECT CAST(count(*) AS BIGINT) FROM (
         |     SELECT id_a, id_b FROM (${base("q22_near_dup_vectors")})
         |     INTERSECT
         |     SELECT id_a, id_b FROM (${base("q49_near_dup_lsh")}))) AS n_common)""".stripMargin,

    // q158: the curation planning curve — docs/tokens surviving each
    // quality threshold (quality is the q14 trunc6'd score)
    "q158_quality_sweep" ->
      s"""WITH q AS (${base("q14_quality_score")}),
         |tk AS (SELECT doc_id, CAST(len(${toks("text")}) AS BIGINT) AS n_tokens FROM documents),
         |th AS (SELECT unnest([0.5::DOUBLE, 0.55::DOUBLE, 0.6::DOUBLE, 0.65::DOUBLE, 0.7::DOUBLE]) AS threshold)
         |SELECT threshold, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(tk.n_tokens) AS BIGINT) AS n_tokens
         |FROM q JOIN tk USING (doc_id), th
         |WHERE q.quality >= th.threshold
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q287: Cohen's κ — exact cell/marginal counts, three double
    // ratios; kappa from the RAW po/pe (trunc6 display-only)
    "q287_cohen_kappa" -> {
      val po = "CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE)"
      val pe = "CAST(rc AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))"
      s"""WITH r AS (
         |  SELECT CASE WHEN n_chars < 220 THEN 'S'
         |              WHEN n_chars < 380 THEN 'M' ELSE 'L' END AS a,
         |         CASE WHEN length(text) - length(replace(text, ' ', '')) < 38 THEN 'S'
         |              WHEN length(text) - length(replace(text, ' ', '')) < 67 THEN 'M'
         |              ELSE 'L' END AS b
         |  FROM documents),
         |cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cnt FROM r GROUP BY a, b),
         |agree AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
         |                 CAST(sum(CASE WHEN a = b THEN cnt ELSE 0 END) AS BIGINT) AS n_agree
         |          FROM cells),
         |rs AS (SELECT a, CAST(sum(cnt) AS BIGINT) AS row_n FROM cells GROUP BY a),
         |cs AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS col_n FROM cells GROUP BY b),
         |chance AS (SELECT CAST(sum(row_n * col_n) AS BIGINT) AS rc
         |           FROM rs JOIN cs ON a = b)
         |SELECT n, n_agree, ${t6(po)} AS po, ${t6(pe)} AS pe,
         |       ${t6(s"(($po) - ($pe)) / (1.0e0 - ($pe))")} AS kappa
         |FROM agree, chance""".stripMargin
    },

    // q288: MCC of the NB 'en' score at the top-quartile rank cut —
    // integer confusion counts, one double MCC expression
    "q288_nb_mcc" -> {
      val dd = (c: String) => s"CAST($c AS DOUBLE)"
      val mcc = s"(${dd("tp")} * ${dd("tn")} - ${dd("fp")} * ${dd("fn")}) / " +
        s"sqrt((${dd("tp")} + ${dd("fp")}) * (${dd("tp")} + ${dd("fn")}) * " +
        s"(${dd("tn")} + ${dd("fp")}) * (${dd("tn")} + ${dd("fn")}))"
      s"""$naiveBayesCtes,
         |lab AS (SELECT s.doc_id AS id, s.score,
         |               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
         |        FROM scored s JOIN documents d USING (doc_id)
         |        WHERE s.cls = 'en'),
         |rk AS (SELECT y,
         |              CAST(row_number() OVER (ORDER BY score DESC, id) AS BIGINT) AS rn,
         |              CAST(count(*) OVER () AS BIGINT) AS n
         |       FROM lab),
         |conf AS (SELECT CAST(sum(p * y) AS BIGINT) AS tp,
         |                CAST(sum(p * (1 - y)) AS BIGINT) AS fp,
         |                CAST(sum((1 - p) * y) AS BIGINT) AS fn,
         |                CAST(sum((1 - p) * (1 - y)) AS BIGINT) AS tn
         |         FROM (SELECT CASE WHEN rn * 4 <= n THEN 1 ELSE 0 END AS p, y FROM rk))
         |SELECT tp, fp, fn, tn, ${t6(mcc)} AS mcc FROM conf""".stripMargin
    },

    // q289: temporal-holdout Brier — per-weekday base rate from the
    // first 15 days, squared errors on a 1e-12 grid over the rest
    "q289_brier_holdout" -> {
      val phat = "CAST(x_train AS DOUBLE) / CAST(n_train AS DOUBLE)"
      val err = s"($phat - CAST(y AS DOUBLE))"
      s"""WITH ud AS (SELECT user_id, CAST($tsUs // 86400000000 AS BIGINT) AS day,
         |                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
         |            FROM events GROUP BY 1, 2),
         |b AS (SELECT day % 7 AS seg,
         |             CASE WHEN day < 19738 THEN 1 ELSE 0 END AS tr,
         |             converted AS y FROM ud),
         |fit AS (SELECT seg, CAST(count(*) AS BIGINT) AS n_train,
         |               CAST(sum(y) AS BIGINT) AS x_train
         |        FROM b WHERE tr = 1 GROUP BY seg),
         |te AS (SELECT b.seg, b.y, n_train, x_train,
         |              CAST(floor($err * $err * 1e12 + 0.5) AS BIGINT) AS se8
         |       FROM b JOIN fit USING (seg) WHERE tr = 0)
         |SELECT seg, n_train, x_train, CAST(count(*) AS BIGINT) AS n_test,
         |       CAST(sum(y) AS BIGINT) AS x_test,
         |       ${t6(phat)} AS p_hat,
         |       ${t6("CAST(CAST(sum(se8) AS BIGINT) AS DOUBLE) / 1e12 / CAST(count(*) AS DOUBLE)")} AS brier
         |FROM te GROUP BY seg, n_train, x_train ORDER BY seg""".stripMargin
    },

    // q290: CART best Gini split on order value vs urgency — distinct-
    // value candidates, integer cumulative tallies, double impurities
    "q290_best_split" -> {
      val nlD = "CAST(ca + cb AS DOUBLE)"
      val nrD = "CAST(n_all - (ca + cb) AS DOUBLE)"
      val gl = s"(1.0e0 - ((CAST(ca AS DOUBLE) / $nlD) * (CAST(ca AS DOUBLE) / $nlD) + " +
        s"(CAST(cb AS DOUBLE) / $nlD) * (CAST(cb AS DOUBLE) / $nlD)))"
      val gr = s"(1.0e0 - ((CAST(ta - ca AS DOUBLE) / $nrD) * (CAST(ta - ca AS DOUBLE) / $nrD) + " +
        s"(CAST(tb - cb AS DOUBLE) / $nrD) * (CAST(tb - cb AS DOUBLE) / $nrD)))"
      val wg = s"(($nlD * $gl + $nrD * $gr) / CAST(n_all AS DOUBLE))"
      s"""WITH lab AS (SELECT o_totalprice AS v,
         |                    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
         |             FROM orders),
         |counts AS (SELECT v, CAST(sum(y) AS BIGINT) AS na,
         |                  CAST(count(*) - sum(y) AS BIGINT) AS nb
         |           FROM lab GROUP BY v),
         |c AS (SELECT v, CAST(sum(na) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ca,
         |             CAST(sum(nb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cb
         |      FROM counts),
         |tot AS (SELECT CAST(max(ca + cb) AS BIGINT) AS n_all,
         |               CAST(max(ca) AS BIGINT) AS ta, CAST(max(cb) AS BIGINT) AS tb FROM c)
         |SELECT v AS split_value, ${t6(wg)} AS gini,
         |       ca + cb AS n_left, n_all - (ca + cb) AS n_right
         |FROM c, tot WHERE ca + cb < n_all
         |ORDER BY gini, split_value LIMIT 1""".stripMargin
    },
    // q298: split-conformal OLS interval — q249's exact moments on the
    // train slice, integer-grid residual order statistic on the
    // calibration slice, coverage on the test slice
    "q298_conformal_ols" -> {
      val dd = (c: String) => s"CAST($c AS DOUBLE)"
      val cxx = s"(sxx - ${dd("sx")} * ${dd("sx")} / ${dd("n")})"
      val cxy = s"(sxy - ${dd("sx")} * ${dd("sy")} / ${dd("n")})"
      val slope = s"($cxy / $cxx)"
      val r8 = "CAST(floor(abs(y - (a + b * x)) * 1e8 + 0.5) AS BIGINT)"
      s"""WITH base AS (SELECT l_returnflag AS k, l_quantity AS x,
         |                     l_extendedprice AS y, l_orderkey % 4 AS sp
         |              FROM lineitem),
         |fit0 AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
         |                ${xsum("x")} AS sx, ${xsum("y")} AS sy,
         |                ${psum6("x * y")} AS sxy, ${psum6("x * x")} AS sxx
         |         FROM base WHERE sp <= 1 GROUP BY k),
         |fit AS (SELECT k, n AS n_train, $slope AS b,
         |               (sy - $slope * sx) / ${dd("n")} AS a
         |        FROM fit0),
         |cal AS (SELECT k, $r8 AS r8 FROM base JOIN fit USING (k) WHERE sp = 2),
         |cc AS (SELECT k, CAST(count(*) AS BIGINT) AS n_cal FROM cal GROUP BY k),
         |hist AS (SELECT k, r8, CAST(count(*) AS BIGINT) AS c FROM cal GROUP BY k, r8),
         |cum AS (SELECT k, r8,
         |               CAST(sum(c) OVER (PARTITION BY k ORDER BY r8
         |                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |        FROM hist),
         |qh AS (SELECT k, CAST(min(r8) AS BIGINT) AS q8,
         |              CAST(max(n_cal) AS BIGINT) AS n_cal
         |       FROM cum JOIN cc USING (k)
         |       WHERE cum >= (n_cal * 9 + 9) // 10 GROUP BY k)
         |SELECT k, n_train, n_cal, CAST(count(*) AS BIGINT) AS n_test,
         |       ${t6(s"${dd("q8")} / 1e8")} AS q_hat,
         |       ${t6("CAST(CAST(sum(CASE WHEN " + r8 + " <= q8 THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS coverage
         |FROM base JOIN fit USING (k) JOIN qh USING (k)
         |WHERE sp = 3
         |GROUP BY k, n_train, n_cal, q8 ORDER BY k""".stripMargin
    },

    // q299: greedy k-center — 4 unrolled farthest-point rounds, each a
    // per-vector exact squared distance on the 1e-8 integer grid and a
    // deterministic 1-row argmax; MATERIALIZED because every m-frame
    // feeds both its argmax and the next round's least()
    "q299_k_center" -> {
      val d8 = dsum12("(p.x - c.x) * (p.x - c.x)")
      def distTo(sel: String) =
        s"""SELECT p.vec_id, CAST(floor($d8 * 1e8 + 0.5) AS BIGINT) AS d8
           |    FROM pe p JOIN (SELECT i, x FROM pe WHERE vec_id = $sel) c USING (i)
           |    GROUP BY p.vec_id""".stripMargin
      val rounds = (2 to 4).map { r =>
        s"""m$r AS MATERIALIZED (
           |  SELECT m.vec_id, least(m.d8, n.d8) AS d8 FROM m${r - 1} m JOIN (
           |    ${distTo(s"(SELECT vec_id FROM s${r - 1})")}) n ON n.vec_id = m.vec_id),
           |s$r AS MATERIALIZED (SELECT vec_id, d8 FROM m$r ORDER BY d8 DESC, vec_id LIMIT 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH pe AS MATERIALIZED (
         |  SELECT vec_id, CAST(t.i AS BIGINT) AS i, CAST(embedding[t.i + 1] AS DOUBLE) AS x
         |  FROM embeddings, (SELECT unnest(generate_series(0, 63)) AS i) t),
         |m1 AS MATERIALIZED (
         |  ${distTo("0")}),
         |s1 AS MATERIALIZED (SELECT vec_id, d8 FROM m1 ORDER BY d8 DESC, vec_id LIMIT 1),
         |$rounds
         |SELECT * FROM (
         |  SELECT CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS vec_id,
         |         CAST(0.0 AS DOUBLE) AS dist2
         |  UNION ALL SELECT 1, vec_id, CAST(d8 AS DOUBLE) / 1e8 FROM s1
         |  UNION ALL SELECT 2, vec_id, CAST(d8 AS DOUBLE) / 1e8 FROM s2
         |  UNION ALL SELECT 3, vec_id, CAST(d8 AS DOUBLE) / 1e8 FROM s3
         |  UNION ALL SELECT 4, vec_id, CAST(d8 AS DOUBLE) / 1e8 FROM s4)
         |ORDER BY pos""".stripMargin
    },

    // q300: Good–Turing smoothed counts — term counts, then the
    // frequency-of-frequencies table and r* for the low-count band
    "q300_good_turing" ->
      s"""WITH tf AS (SELECT t AS term, CAST(count(*) AS BIGINT) AS r
         |            FROM (SELECT unnest(list_transform(generate_series(2, len(s)),
         |                           i -> s[i - 1] || ' ' || s[i])) AS t
         |                  FROM (SELECT ${toks("text")} AS s FROM documents)
         |                  WHERE len(s) >= 2)
         |            GROUP BY t),
         |ff AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM tf GROUP BY r),
         |tot AS (SELECT CAST(sum(r * n_r) AS BIGINT) AS n_tokens FROM ff)
         |SELECT f.r, f.n_r, g.n_r AS n_r1, n_tokens,
         |       ${t6("CAST(f.r + 1 AS DOUBLE) * CAST(g.n_r AS DOUBLE) / CAST(f.n_r AS DOUBLE)")} AS r_star
         |FROM ff f JOIN ff g ON g.r = f.r + 1 CROSS JOIN tot
         |WHERE f.r <= 5 ORDER BY f.r""".stripMargin,

    // q301: Newman modularity of the q109 LP communities — replays the
    // LP rounds verbatim, then per-community integer edge/degree sums
    // and one pinned double expression per row
    "q301_modularity" -> {
      val corpus =
        s"""SELECT doc_id, text FROM ($nearDupCorpus)
           |WHERE doc_id < 100 OR (doc_id >= 10000 AND doc_id < 10100)""".stripMargin
      val rounds = (1 to 3).map { i =>
        s"""l$i AS (
           |  SELECT v, label FROM (
           |    SELECT ed.dst AS v, l.label, count(*) AS n,
           |           row_number() OVER (PARTITION BY ed.dst
           |             ORDER BY count(*) DESC, l.label) AS rn
           |    FROM ed0 ed JOIN l${i - 1} l ON l.v = ed.src
           |    GROUP BY ed.dst, l.label)
           |  WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""${shinglesSql(corpus)},
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY doc_a, doc_b),
         |pairs AS (SELECT doc_a, doc_b FROM (
         |  SELECT doc_a, doc_b, ${t6("CAST(ni AS DOUBLE) / (ca.n + cb.n - ni)")} AS jaccard
         |  FROM inter JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b)
         |  WHERE jaccard >= 0.5),
         |ed0 AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |        UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |l0 AS (SELECT DISTINCT src AS v, src AS label FROM ed0),
         |$rounds,
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM ed0),
         |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM ed0 GROUP BY src),
         |dc AS (SELECT l.label, CAST(count(*) AS BIGINT) AS n_vertices,
         |              CAST(sum(deg) AS BIGINT) AS d_c
         |       FROM deg JOIN l3 l ON l.v = deg.src GROUP BY l.label),
         |intra AS (SELECT ls.label,
         |                 CAST(count(*) // 2 AS BIGINT) AS intra_edges
         |          FROM ed0 e JOIN l3 ls ON ls.v = e.src
         |                     JOIN l3 ld ON ld.v = e.dst
         |          WHERE ls.label = ld.label GROUP BY ls.label)
         |SELECT dc.label, n_vertices,
         |       COALESCE(intra_edges, CAST(0 AS BIGINT)) AS intra_edges,
         |       d_c AS degree_sum,
         |       ${t6("CAST(2 * COALESCE(intra_edges, 0) AS DOUBLE) / CAST(m2 AS DOUBLE) - " +
                  "(CAST(d_c AS DOUBLE) / CAST(m2 AS DOUBLE)) * " +
                  "(CAST(d_c AS DOUBLE) / CAST(m2 AS DOUBLE))")} AS contribution
         |FROM dc LEFT JOIN intra USING (label) CROSS JOIN tot
         |ORDER BY dc.label""".stripMargin
    },

    // q302: 2-D Pareto frontier — per-price max size, running-max cut
    // over strictly-cheaper rows, item counts at each frontier point
    "q302_pareto_frontier" ->
      s"""WITH g AS (SELECT CAST(p_retailprice AS DOUBLE) AS v,
         |                  CAST(max(p_size) AS BIGINT) AS s
         |           FROM part GROUP BY 1),
         |w AS (SELECT v, s, max(s) OVER (ORDER BY v
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
         |      FROM g),
         |f AS (SELECT v, s FROM w WHERE prevmax IS NULL OR s > prevmax)
         |SELECT f.v AS p_retailprice, f.s AS p_size,
         |       CAST(count(*) AS BIGINT) AS n_items
         |FROM f JOIN part p ON CAST(p.p_retailprice AS DOUBLE) = f.v
         |                  AND CAST(p.p_size AS BIGINT) = f.s
         |GROUP BY f.v, f.s ORDER BY p_retailprice""".stripMargin,

    // q303: sorted-neighborhood candidates — q30's simhash, global
    // (simhash, doc_id) rank, window-2 band pairs, hamming ≤ 2
    "q303_simhash_neighborhood" ->
      s"""WITH tok AS (SELECT doc_id, ${md5Long("t")} AS h
         |            FROM (SELECT doc_id, unnest(${toks("text")}) AS t FROM documents)),
         |votes AS (SELECT doc_id, i, SUM(CASE WHEN ((h >> i) & 1) = 1 THEN 1 ELSE -1 END) AS v
         |          FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS i)
         |          GROUP BY doc_id, i),
         |sig AS (SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS simhash
         |        FROM votes GROUP BY doc_id),
         |ranked AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, simhash,
         |                  CAST(row_number() OVER (ORDER BY simhash, doc_id) AS BIGINT) AS r
         |           FROM sig)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM ranked a JOIN ranked b ON b.r > a.r AND b.r <= a.r + 2
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
         |ORDER BY doc_a, doc_b""".stripMargin,

    // q304: HLL set overlap — tagged b=10 sketches, a register-max
    // union merge, inclusion–exclusion, exact-join audit column
    "q304_hll_overlap" ->
      s"""WITH hs AS (
         |  SELECT tag,
         |    CAST(concat('0x', substr(h, 1, 8)) AS BIGINT) % 1024 AS register,
         |    $hll10Rho AS r
         |  FROM (SELECT event_type AS tag,
         |          md5(concat('hll|', CAST(user_id AS VARCHAR))) AS h,
         |          CAST(concat('0x', substr(md5(concat('hll|', CAST(user_id AS VARCHAR))), 9, 13)) AS BIGINT) AS body
         |        FROM events WHERE event_type IN ('click', 'purchase'))),
         |sk AS (SELECT tag, register, max(r) AS max_rho FROM hs GROUP BY tag, register),
         |allsk AS (SELECT * FROM sk
         |          UNION ALL
         |          SELECT 'union' AS tag, register, max(max_rho) AS max_rho
         |          FROM sk GROUP BY register),
         |est AS (${hll10Est("allsk", "tag")}),
         |exact AS (SELECT CAST(count(*) AS BIGINT) AS exact_intersection FROM
         |  (SELECT DISTINCT user_id FROM events WHERE event_type = 'click') ca
         |  JOIN (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase') cb
         |  USING (user_id))
         |SELECT a.est_distinct AS est_a, b.est_distinct AS est_b,
         |       u.est_distinct AS est_union,
         |       ${t6("GREATEST(0.0, a.est_distinct + b.est_distinct - u.est_distinct)")} AS est_intersection,
         |       exact_intersection
         |FROM est a, est b, est u, exact
         |WHERE a.tag = 'click' AND b.tag = 'purchase' AND u.tag = 'union'""".stripMargin,

    // q305: rolling 7-day HLL WAU — per-day register tables, day→window
    // fan-out, register-max merge per target day, exact-twin audit
    "q305_rolling_hll_wau" ->
      s"""WITH days AS (SELECT CAST($tsUs // 86400000000 AS BIGINT) AS day,
         |                     CAST(user_id AS VARCHAR) AS u FROM events),
         |hs AS (SELECT day,
         |         CAST(concat('0x', substr(h, 1, 8)) AS BIGINT) % 1024 AS register,
         |         $hll10Rho AS r
         |       FROM (SELECT day, md5(concat('hll|', u)) AS h,
         |               CAST(concat('0x', substr(md5(concat('hll|', u)), 9, 13)) AS BIGINT) AS body
         |             FROM days)),
         |sk AS (SELECT day, register, max(r) AS max_rho FROM hs GROUP BY day, register),
         |rolled AS (SELECT day_t AS day, register, max(max_rho) AS max_rho
         |           FROM (SELECT unnest(generate_series(day, day + 6)) AS day_t,
         |                        register, max_rho FROM sk)
         |           GROUP BY day_t, register),
         |est AS (${hll10Est("rolled", "day")}),
         |exact AS (SELECT day_t AS day, CAST(count(DISTINCT u) AS BIGINT) AS exact_wau
         |          FROM (SELECT unnest(generate_series(day, day + 6)) AS day_t, u
         |                FROM (SELECT DISTINCT day, u FROM days))
         |          GROUP BY day_t),
         |obs AS (SELECT DISTINCT day FROM days)
         |SELECT est.day, est.est_distinct AS est_wau, exact_wau,
         |       ${t6("abs(est.est_distinct - CAST(exact_wau AS DOUBLE)) / CAST(exact_wau AS DOUBLE)")} AS rel_error
         |FROM est JOIN exact USING (day) JOIN obs USING (day)
         |ORDER BY est.day""".stripMargin,

    // q306: join-cardinality estimate — left-side equi-depth cuts at
    // the exact q192 ranks, value-level bucket fan-out on both sides,
    // per-bucket containment formula, real-join audit columns
    "q306_join_cardinality" -> {
      val qs = (1 until 16).map(k => (k.toDouble / 16).toString).mkString(", ")
      s"""WITH lv AS (SELECT CAST(user_id AS BIGINT) AS v,
         |                   CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
         |rv AS (SELECT CAST(o_custkey AS BIGINT) AS v,
         |              CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1),
         |ltot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM lv),
         |lcum AS (SELECT v, n, CAST(sum(n) OVER (ORDER BY v
         |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ca FROM lv),
         |probes AS (SELECT GREATEST(1, CAST(ceil(q * CAST(nt AS DOUBLE)) AS BIGINT)) AS rnk
         |           FROM (SELECT unnest([$qs]) AS q) CROSS JOIN ltot),
         |cuts AS (SELECT CAST(l.v AS DOUBLE) AS cut
         |         FROM probes p JOIN lcum l ON l.ca >= p.rnk AND l.ca - l.n < p.rnk),
         |lbk AS (SELECT v, n, CAST(sum(CASE WHEN CAST(v AS DOUBLE) > cut THEN 1 ELSE 0 END) AS BIGINT) AS bucket
         |        FROM lv CROSS JOIN cuts GROUP BY v, n),
         |rbk AS (SELECT v, n, CAST(sum(CASE WHEN CAST(v AS DOUBLE) > cut THEN 1 ELSE 0 END) AS BIGINT) AS bucket
         |        FROM rv CROSS JOIN cuts GROUP BY v, n),
         |lb AS (SELECT bucket, CAST(sum(n) AS BIGINT) AS n1,
         |              CAST(count(*) AS BIGINT) AS d1 FROM lbk GROUP BY bucket),
         |rb AS (SELECT bucket, CAST(sum(n) AS BIGINT) AS n2,
         |              CAST(count(*) AS BIGINT) AS d2 FROM rbk GROUP BY bucket),
         |est AS (SELECT ${dsum12("CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / GREATEST(CAST(d1 AS DOUBLE), CAST(d2 AS DOUBLE))")} AS est_rows_raw
         |        FROM lb JOIN rb USING (bucket)),
         |act AS (SELECT CAST(sum(l.n * r.n) AS BIGINT) AS actual_rows
         |        FROM lv l JOIN rv r ON l.v = r.v)
         |SELECT CAST(16 AS BIGINT) AS n_buckets, ${t6("est_rows_raw")} AS est_rows,
         |       actual_rows,
         |       CASE WHEN actual_rows > 0 THEN
         |         ${t6("abs(est_rows_raw - CAST(actual_rows AS DOUBLE)) / CAST(actual_rows AS DOUBLE)")}
         |       END AS rel_error
         |FROM est CROSS JOIN act""".stripMargin
    },

    // q307: expectations gate — one aggregate scan, five audit rows
    "q307_expectations_audit" -> {
      val dom = "('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')"
      s"""WITH agg AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         |  CAST(count(DISTINCT o_orderkey) AS DOUBLE) AS du,
         |  CAST(SUM(CASE WHEN o_orderpriority IN $dom THEN 1 ELSE 0 END) AS DOUBLE) AS pd,
         |  CAST(SUM(CASE WHEN o_totalprice IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) AS nn,
         |  CAST(SUM(CASE WHEN o_totalprice > 0.0 THEN 1 ELSE 0 END) AS DOUBLE) AS pp
         |  FROM orders)
         |SELECT * FROM (
         |  SELECT 'order_count' AS expectation, ${t6("n")} AS observed,
         |         COALESCE(${t6("n")} >= 1000.0 AND ${t6("n")} <= 1e15, false) AS pass FROM agg
         |  UNION ALL SELECT 'orderkey_unique', ${t6("du / n")},
         |         COALESCE(${t6("du / n")} >= 1.0 AND ${t6("du / n")} <= 1.0, false) FROM agg
         |  UNION ALL SELECT 'priority_domain_share', ${t6("pd / n")},
         |         COALESCE(${t6("pd / n")} >= 1.0 AND ${t6("pd / n")} <= 1.0, false) FROM agg
         |  UNION ALL SELECT 'totalprice_nonnull_share', ${t6("nn / n")},
         |         COALESCE(${t6("nn / n")} >= 0.999 AND ${t6("nn / n")} <= 1.0, false) FROM agg
         |  UNION ALL SELECT 'totalprice_positive_share', ${t6("pp / n")},
         |         COALESCE(${t6("pp / n")} >= 0.999 AND ${t6("pp / n")} <= 1.0, false) FROM agg)
         |ORDER BY expectation""".stripMargin
    },

    // q308: stratified k-fold — salted-hash folds, per-stratum shares
    "q308_stratified_kfold" ->
      s"""WITH tagged AS (SELECT o_orderpriority AS stratum,
         |  CAST(${md5Long("concat('fold|', CAST(o_orderkey AS VARCHAR))")} % 5 AS BIGINT) AS fold
         |  FROM orders),
         |tot AS (SELECT stratum, CAST(count(*) AS BIGINT) AS n_stratum
         |        FROM tagged GROUP BY 1)
         |SELECT t.stratum, fold, CAST(count(*) AS BIGINT) AS n,
         |       ${t6("CAST(count(*) AS DOUBLE) / CAST(max(n_stratum) AS DOUBLE)")} AS share
         |FROM tagged t JOIN tot USING (stratum)
         |GROUP BY t.stratum, fold ORDER BY stratum, fold""".stripMargin,

    // q309: hash-gated class rebalance — integer keep threshold on the
    // 1e-6 grid, per-class audit with the King–Zeng logit correction
    "q309_balanced_downsample" ->
      s"""WITH base AS (SELECT (l_returnflag = 'R') AS pos,
         |  ${md5Long("concat('bal|', concat_ws('-', l_orderkey, l_linenumber))")} AS h
         |  FROM lineitem),
         |counts AS (SELECT pos, CAST(count(*) AS BIGINT) AS n_before
         |           FROM base GROUP BY pos),
         |sizes AS (SELECT CAST(min(n_before) AS BIGINT) AS n_min FROM counts),
         |kept AS (SELECT b.pos, n_before,
         |  CASE WHEN n_before = n_min THEN TRUE
         |       ELSE (h % 1000000) < CAST(floor(CAST(n_min AS DOUBLE) / CAST(n_before AS DOUBLE) * 1e6) AS BIGINT)
         |  END AS keep
         |  FROM base b JOIN counts USING (pos) CROSS JOIN sizes)
         |SELECT pos AS is_positive, CAST(max(n_before) AS BIGINT) AS n_before,
         |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_after,
         |  ${t6("CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / CAST(max(n_before) AS DOUBLE)")} AS keep_rate,
         |  ${t6("ln(CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / CAST(max(n_before) AS DOUBLE))")} AS logit_correction
         |FROM kept GROUP BY pos ORDER BY is_positive""".stripMargin,

    // q310: sorted-neighborhood candidates → connected components —
    // q303's pair SQL closed transitively (the q62 closure pattern)
    "q310_neighborhood_clusters" ->
      s"""WITH RECURSIVE tok AS (SELECT doc_id, ${md5Long("t")} AS h
         |            FROM (SELECT doc_id, unnest(${toks("text")}) AS t FROM documents)),
         |votes AS (SELECT doc_id, i, SUM(CASE WHEN ((h >> i) & 1) = 1 THEN 1 ELSE -1 END) AS v
         |          FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS i)
         |          GROUP BY doc_id, i),
         |sig AS (SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS simhash
         |        FROM votes GROUP BY doc_id),
         |ranked AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, simhash,
         |                  CAST(row_number() OVER (ORDER BY simhash, doc_id) AS BIGINT) AS r
         |           FROM sig),
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |          FROM ranked a JOIN ranked b ON b.r > a.r AND b.r <= a.r + 2
         |          WHERE bit_count(xor(a.simhash, b.simhash)) <= 2),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION SELECT doc_b, doc_a FROM pairs),
         |reach(id, rr) AS (
         |  SELECT DISTINCT src AS id, src AS rr FROM edges
         |  UNION
         |  SELECT e.src, reach.rr FROM edges e JOIN reach ON reach.id = e.dst)
         |SELECT id AS doc_id, min(rr) AS cluster_rep
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,

    // q312: contrastive triplets — q161's exact top-1 cosine positive,
    // salted-hash-ranked negatives excluding query and positive
    "q312_triplet_mine" ->
      s"""WITH qs AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
         |            FROM embeddings WHERE vec_id IN (0, 7, 11, 23, 42)),
         |sc AS (SELECT q.qid, e.vec_id AS id,
         |         ${t6(cosine("CAST(e.embedding AS DOUBLE[])", "q.qv"))} AS score
         |       FROM embeddings e, qs q WHERE e.vec_id != q.qid),
         |pos AS (SELECT qid, id AS pos_id, score AS pos_score FROM (
         |  SELECT qid, id, score,
         |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rn
         |  FROM sc) WHERE rn = 1),
         |cand AS (SELECT p.qid, p.pos_id, p.pos_score, e.vec_id AS neg_id,
         |           ${md5Long("concat('neg|', CAST(p.qid AS VARCHAR), '|', CAST(e.vec_id AS VARCHAR))")} AS h
         |         FROM embeddings e, pos p
         |         WHERE e.vec_id != p.qid AND e.vec_id != p.pos_id)
         |SELECT qid, pos_id, pos_score, CAST(rn AS BIGINT) AS neg_rank, neg_id
         |FROM (SELECT qid, pos_id, pos_score, neg_id,
         |        row_number() OVER (PARTITION BY qid ORDER BY h, neg_id) AS rn
         |      FROM cand)
         |WHERE rn <= 4 ORDER BY qid, neg_rank""".stripMargin,

    // q318: tokenizer fertility — the q60 exact-BPE replay rolled up
    // per language against whitespace word counts
    "q318_tokenizer_fertility" -> {
      val pat = """''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"""
      val merges = graft.operators.TextAnalysis.BpeMergeRanks.toSeq
        .sortBy(_._2).map(_._1)
      val mergesList = merges
        .map(m => "'" + m.replace("'", "''") + "'").mkString("[", ",", "]")
      s"""WITH RECURSIVE
         |pieces AS (
         |  SELECT doc_id, unnest(regexp_extract_all(text, '$pat')) AS piece
         |  FROM documents WHERE doc_id < 60),
         |cores AS (
         |  SELECT doc_id, row_number() OVER () AS pidx,
         |         CASE WHEN starts_with(piece, ' ') THEN substr(piece, 2)
         |              ELSE piece END AS core
         |  FROM pieces WHERE NOT regexp_matches(piece, '^\\s+$$')),
         |r AS (
         |  SELECT doc_id, pidx, regexp_extract_all(core, '(?s).') AS syms, 0 AS iter
         |  FROM cores
         |  UNION ALL
         |  SELECT doc_id, pidx,
         |         syms[1:pos-1] || [syms[pos] || syms[pos+1]] || syms[pos+2:],
         |         iter + 1
         |  FROM (SELECT doc_id, pidx, syms, iter,
         |               list_min(ranks) AS best,
         |               list_position(ranks, list_min(ranks)) AS pos
         |        FROM (SELECT doc_id, pidx, syms, iter,
         |                     list_transform(generate_series(1, len(syms) - 1),
         |                       i -> coalesce(nullif(list_position($mergesList,
         |                              syms[i] || ' ' || syms[i+1]), 0), 999999)) AS ranks
         |              FROM r WHERE len(syms) >= 2))
         |  WHERE best < 999999),
         |merged AS (SELECT doc_id, pidx, arg_max(len(syms), iter) AS n
         |           FROM r GROUP BY doc_id, pidx),
         |bpe AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens_exact FROM (
         |  SELECT doc_id, n FROM merged
         |  UNION ALL
         |  SELECT doc_id, 1 AS n FROM pieces WHERE regexp_matches(piece, '^\\s+$$'))
         |GROUP BY doc_id),
         |words AS (SELECT doc_id, lang,
         |            CAST(len(${toks("text")}) AS BIGINT) AS n_words
         |          FROM documents WHERE doc_id < 60)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_words) AS BIGINT) AS n_words,
         |       CAST(sum(n_tokens_exact) AS BIGINT) AS n_bpe_tokens,
         |       ${t6("CAST(sum(n_tokens_exact) AS DOUBLE) / CAST(sum(n_words) AS DOUBLE)")} AS fertility
         |FROM words JOIN bpe USING (doc_id)
         |GROUP BY lang ORDER BY lang""".stripMargin
    },

    // q319: packing-budget sweep — the q68 offset formula at four
    // budgets, per-budget fragmentation rollup
    "q319_packing_sweep" -> {
      val arms = Seq(512L, 1024L, 2048L, 4096L).map { b =>
        s"""SELECT CAST($b AS BIGINT) AS budget,
           |       CAST(count(*) AS BIGINT) AS n_seqs,
           |       CAST(sum(seq_tokens) AS BIGINT) AS total_tokens,
           |       CAST(SUM(CASE WHEN seq_tokens > $b THEN 1 ELSE 0 END) AS BIGINT) AS n_overflow,
           |       ${t6(s"CAST(sum(seq_tokens) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * ${b.toDouble})")} AS mean_fill
           |FROM (SELECT start // $b AS shard, CAST(sum(n) AS BIGINT) AS seq_tokens
           |      FROM cum GROUP BY 1)""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH toks AS (SELECT doc_id,
         |                CAST(len(${toks("text")}) AS BIGINT) AS n FROM documents),
         |cum AS (SELECT doc_id, n,
         |          CAST(sum(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n
         |               AS BIGINT) AS start
         |        FROM toks)
         |$arms
         |ORDER BY budget""".stripMargin
    },

    // q316: blocking recall — md5-group ground-truth pairs vs the q303
    // candidate set over the exact-copy corpus
    "q316_blocking_recall" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents
         |                UNION ALL
         |                SELECT doc_id + 10000, text FROM documents),
         |grp AS (SELECT md5(text) AS h, list_sort(list(doc_id)) AS ids
         |        FROM corpus GROUP BY md5(text) HAVING count(*) >= 2),
         |tp AS (SELECT CAST(p.lo AS BIGINT) AS lo, CAST(p.hi AS BIGINT) AS hi
         |       FROM (SELECT unnest(flatten(list_transform(generate_series(1, len(ids) - 1),
         |               i -> list_transform(ids[i + 1:],
         |                      x -> {'lo': ids[i], 'hi': x})))) AS p
         |             FROM grp)),
         |tok AS (SELECT doc_id, ${md5Long("t")} AS h
         |        FROM (SELECT doc_id, unnest(${toks("text")}) AS t FROM corpus)),
         |votes AS (SELECT doc_id, i, SUM(CASE WHEN ((h >> i) & 1) = 1 THEN 1 ELSE -1 END) AS v
         |          FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS i)
         |          GROUP BY doc_id, i),
         |sig AS (SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS simhash
         |        FROM votes GROUP BY doc_id),
         |ranked AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, simhash,
         |                  CAST(row_number() OVER (ORDER BY simhash, doc_id) AS BIGINT) AS r
         |           FROM sig),
         |cands AS (SELECT DISTINCT least(a.doc_id, b.doc_id) AS lo,
         |                 greatest(a.doc_id, b.doc_id) AS hi
         |          FROM ranked a JOIN ranked b ON b.r > a.r AND b.r <= a.r + 2
         |          WHERE bit_count(xor(a.simhash, b.simhash)) <= 2),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_true_pairs FROM tp),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates FROM cands),
         |nh AS (SELECT CAST(count(*) AS BIGINT) AS n_hit
         |       FROM tp WHERE EXISTS (SELECT 1 FROM cands c
         |                             WHERE c.lo = tp.lo AND c.hi = tp.hi))
         |SELECT n_true_pairs, n_candidates, n_hit,
         |       ${t6("CAST(n_hit AS DOUBLE) / CAST(n_true_pairs AS DOUBLE)")} AS recall
         |FROM nt CROSS JOIN nc CROSS JOIN nh""".stripMargin,

    // q317: blocking window frontier — maximal-window pair mine with
    // rank offsets, per-window cuts as filters, shared ground truth
    "q317_blocking_sweep" -> BlockingFrontierSql,

    // q320: the auto-tuner's selection over the SAME frontier — regime
    // 0 = smallest window meeting recall within budget, regime 1 =
    // highest recall within budget, regime 2 = cheapest window
    "q320_blocking_autotune" ->
      s"""SELECT "window", n_true_pairs, n_candidates, n_hit, recall,
         |       (recall >= 0.75 AND n_candidates <= 3000) AS met_target
         |FROM ($BlockingFrontierSql) f
         |ORDER BY (CASE WHEN recall >= 0.75 AND n_candidates <= 3000 THEN 0
         |               WHEN n_candidates <= 3000 THEN 1 ELSE 2 END),
         |         (CASE WHEN recall >= 0.75 AND n_candidates <= 3000 THEN CAST("window" AS DOUBLE)
         |               WHEN n_candidates <= 3000 THEN -recall
         |               ELSE CAST("window" AS DOUBLE) END),
         |         "window"
         |LIMIT 1""".stripMargin,

    // q313: stutter audit — 1-based list twin of the 0-based Spark
    // adjacent-equality lambda, per-language rollup
    "q313_stutter_audit" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n) AS BIGINT) AS n_tokens,
         |       CAST(sum(st) AS BIGINT) AS n_stutter,
         |       ${t6("CAST(sum(st) AS DOUBLE) / CAST(sum(n) AS DOUBLE)")} AS stutter_rate
         |FROM (SELECT lang, CAST(len(s) AS BIGINT) AS n,
         |        CASE WHEN len(s) >= 2
         |             THEN CAST(len(list_filter(list_transform(generate_series(2, len(s)),
         |                    i -> s[i] = s[i - 1]), x -> x)) AS BIGINT)
         |             ELSE CAST(0 AS BIGINT) END AS st
         |      FROM (SELECT lang, ${toks("text")} AS s FROM documents))
         |GROUP BY lang ORDER BY lang""".stripMargin,

    // q314: materialized-column integrity — n_chars vs the text length
    "q314_field_consistency" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(CASE WHEN n_chars != len(text) THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
        |       CAST(max(abs(n_chars - len(text))) AS BIGINT) AS max_abs_diff
        |FROM documents""".stripMargin,

    // q315: per-source Gopher pass rates — the q88 battery joined back
    // to the acquisition feed
    "q315_source_quality_gate" ->
      s"""WITH w AS (SELECT doc_id, ${toks("text")} AS words FROM documents),
         |b AS (SELECT doc_id, words, len(words) AS n_words,
         |        CASE WHEN len(words) >= 2
         |             THEN list_transform(range(1, len(words)),
         |                    i -> concat(words[i], ' ', words[i + 1]))
         |             ELSE CAST([] AS VARCHAR[]) END AS bigrams
         |      FROM w),
         |m AS (SELECT doc_id,
         |        CAST(n_words AS BIGINT) AS n_words,
         |        ${t6("CAST(list_sum(list_transform(words, x -> len(x))) AS DOUBLE) / n_words")} AS mean_word_len,
         |        ${t6("1.0 - CAST(len(list_distinct(words)) AS DOUBLE) / n_words")} AS dup_word_frac,
         |        CASE WHEN n_words >= 2 THEN
         |          ${t6("CAST(list_max(list_transform(list_distinct(bigrams), bg -> len(list_filter(bigrams, x -> x = bg)))) AS DOUBLE) / (n_words - 1)")}
         |        ELSE CAST(0 AS DOUBLE) END AS top_bigram_frac,
         |        CAST(len(list_filter(['the','be','to','of','and','that','have','with','a','in'],
         |          s -> list_contains(words, s))) AS BIGINT) AS stop_hits
         |      FROM b),
         |k AS (SELECT doc_id,
         |        (n_words BETWEEN 25 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
         |         AND dup_word_frac <= 0.6 AND top_bigram_frac <= 0.10 AND stop_hits >= 1) AS keep
         |      FROM m)
         |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
         |       ${t6("CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS pass_rate
         |FROM documents d JOIN k USING (doc_id)
         |GROUP BY d.source ORDER BY d.source""".stripMargin,

    // q311: per-fold midrank AUC — the q211 integer rank algebra with
    // the salted-hash fold as the partition key
    "q311_kfold_auc" ->
      s"""WITH f AS (SELECT
         |    CAST(${md5Long("concat('fold|', CAST(o_orderkey AS VARCHAR))")} % 5 AS BIGINT) AS fold,
         |    o_totalprice AS v,
         |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pos
         |  FROM orders),
         |counts AS (SELECT fold, v, CAST(count(*) AS BIGINT) AS cnt,
         |                  CAST(sum(pos) AS BIGINT) AS n_pos
         |           FROM f GROUP BY fold, v),
         |cum AS (SELECT fold, cnt, n_pos,
         |          CAST(sum(cnt) OVER (PARTITION BY fold ORDER BY v
         |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |        FROM counts),
         |r AS (SELECT fold, cnt, n_pos, 2 * (cum - cnt) + cnt + 1 AS r2 FROM cum)
         |SELECT fold, CAST(sum(n_pos) AS BIGINT) AS n_pos,
         |       CAST(sum(cnt - n_pos) AS BIGINT) AS n_neg,
         |       ${t6("CAST(CAST(sum(n_pos * r2) AS BIGINT) - CAST(sum(n_pos) AS BIGINT) * (CAST(sum(n_pos) AS BIGINT) + 1) AS DOUBLE) / " +
              "CAST(2 * CAST(sum(n_pos) AS BIGINT) * CAST(sum(cnt - n_pos) AS BIGINT) AS DOUBLE)")} AS auc
         |FROM r GROUP BY fold ORDER BY fold""".stripMargin,

    // q295: Markov entropy rate — the q276 stationary chain joined to
    // per-state conditional entropies from one 25-row aggregation
    "q295_markov_entropy" -> {
      val its = (1 to 20).map { i =>
        val prev = if (i == 1) "it0" else s"it${i - 1}"
        s"""it$i AS (SELECT next_type AS state, ${dsum12("pi * p")} AS pi
           |         FROM p JOIN $prev ON p.prev_type = $prev.state
           |         GROUP BY next_type)""".stripMargin
      }.mkString(",\n")
      s"""WITH $markovCtes,
         |states AS (SELECT DISTINCT prev_type AS state FROM p),
         |nsc AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM states),
         |it0 AS (SELECT state, CAST(1.0 AS DOUBLE) / CAST(ns AS DOUBLE) AS pi
         |        FROM states CROSS JOIN nsc),
         |$its,
         |rowh AS (SELECT prev_type AS state, ${dsum12("-(p * ln(p))")} AS h_state
         |         FROM p GROUP BY prev_type)
         |SELECT state, ${t6("pi")} AS stationary, ${t6("h_state")} AS h_state,
         |       ${t6("pi * h_state")} AS contribution
         |FROM it20 JOIN rowh USING (state) ORDER BY state""".stripMargin
    },

    // q296: difference-in-differences — one conditional aggregation,
    // four 12-decimal cell sums, pinned-form mean divisions
    "q296_diff_in_diff" -> {
      def cnt(t: Int, p: Int) =
        s"CAST(sum(CASE WHEN tr = $t AND post = $p THEN 1 END) AS BIGINT)"
      def s12(t: Int, p: Int) = dsum12(
        s"CASE WHEN tr = $t AND post = $p THEN value ELSE CAST(0.0 AS DOUBLE) END")
      def m(sc: String, nc: String) = s"($sc / CAST($nc AS DOUBLE))"
      s"""WITH b AS (SELECT value,
         |             CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS tr,
         |             CASE WHEN CAST($tsUs // 86400000000 AS BIGINT) >= 19738
         |                  THEN 1 ELSE 0 END AS post
         |           FROM events),
         |g AS (SELECT ${cnt(1, 0)} AS n_t_pre, ${cnt(1, 1)} AS n_t_post,
         |             ${cnt(0, 0)} AS n_c_pre, ${cnt(0, 1)} AS n_c_post,
         |             ${s12(1, 0)} AS s_t_pre, ${s12(1, 1)} AS s_t_post,
         |             ${s12(0, 0)} AS s_c_pre, ${s12(0, 1)} AS s_c_post
         |      FROM b)
         |SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
         |       ${t6(m("s_t_pre", "n_t_pre"))} AS m_t_pre,
         |       ${t6(m("s_t_post", "n_t_post"))} AS m_t_post,
         |       ${t6(m("s_c_pre", "n_c_pre"))} AS m_c_pre,
         |       ${t6(m("s_c_post", "n_c_post"))} AS m_c_post,
         |       ${t6(s"((${m("s_t_post", "n_t_post")} - ${m("s_t_pre", "n_t_pre")}) - " +
              s"(${m("s_c_post", "n_c_post")} - ${m("s_c_pre", "n_c_pre")}))")} AS did
         |FROM g""".stripMargin
    },

    // q297: CUPED — per-user pre/post means, pooled moment sums on the
    // 12-decimal grid, θ / lifts / ρ² as pinned-form double expressions
    "q297_cuped" -> {
      val nD = "CAST(n AS DOUBLE)"
      val nT = "CAST(n_t AS DOUBLE)"
      val nC = "CAST((n - n_t) AS DOUBLE)"
      val covxy = s"(($nD * sxy - sx * sy) / ($nD * $nD))"
      val varx = s"(($nD * sxx - sx * sx) / ($nD * $nD))"
      val vary = s"(($nD * syy - sy * sy) / ($nD * $nD))"
      val theta = s"($covxy / $varx)"
      val rawLift = s"(sy_t / $nT - (sy - sy_t) / $nC)"
      val adjLift = s"($rawLift - $theta * (sx_t / $nT - (sx - sx_t) / $nC))"
      s"""WITH bu AS (
         |  SELECT user_id,
         |         CAST(sum(pre) AS BIGINT) AS nx, CAST(sum(1 - pre) AS BIGINT) AS ny,
         |         ${dsum12("CASE WHEN pre = 1 THEN value ELSE CAST(0.0 AS DOUBLE) END")} AS sx,
         |         ${dsum12("CASE WHEN pre = 0 THEN value ELSE CAST(0.0 AS DOUBLE) END")} AS sy
         |  FROM (SELECT user_id, value,
         |          CASE WHEN CAST($tsUs // 86400000000 AS BIGINT) < 19738
         |               THEN 1 ELSE 0 END AS pre
         |        FROM events)
         |  GROUP BY user_id),
         |u AS (SELECT user_id, sx / CAST(nx AS DOUBLE) AS x,
         |             sy / CAST(ny AS DOUBLE) AS y,
         |             CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS tr
         |      FROM bu WHERE nx > 0 AND ny > 0),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |             ${dsum12("x")} AS sx, ${dsum12("y")} AS sy,
         |             ${dsum12("x * y")} AS sxy, ${dsum12("x * x")} AS sxx,
         |             ${dsum12("y * y")} AS syy,
         |             CAST(sum(tr) AS BIGINT) AS n_t,
         |             ${dsum12("CASE WHEN tr = 1 THEN x ELSE CAST(0.0 AS DOUBLE) END")} AS sx_t,
         |             ${dsum12("CASE WHEN tr = 1 THEN y ELSE CAST(0.0 AS DOUBLE) END")} AS sy_t
         |      FROM u)
         |SELECT n AS n_users, n_t AS n_treat, ${t6(theta)} AS theta,
         |       ${t6(rawLift)} AS raw_lift, ${t6(adjLift)} AS adj_lift,
         |       ${t6(s"($covxy * $covxy / ($varx * $vary))")} AS var_reduction
         |FROM g""".stripMargin
    },

    // q293: Bradley–Terry MM fixpoint over the per-order top-2-price
    // duels — un-normalized linear chain (scale-invariant likelihood),
    // one Σp division at the end; every p-frame MATERIALIZED because
    // each round references its predecessor twice
    "q293_bradley_terry" -> {
      val rounds = (1 to 8).map { k =>
        s"""p$k AS MATERIALIZED (
           |  SELECT g.a, pa.w,
           |         CAST(pa.w AS DOUBLE) / ${dsum12("CAST(g.n AS DOUBLE) / (pa.x + pb.x)")} AS x
           |  FROM games g JOIN p${k - 1} pa ON pa.a = g.a
           |  JOIN p${k - 1} pb ON pb.a = g.b
           |  GROUP BY g.a, pa.w)""".stripMargin
      }.mkString(",\n")
      s"""WITH $duelsCtes,
         |wins AS (SELECT wf AS p, CAST(count(*) AS BIGINT) AS w FROM duels GROUP BY wf),
         |games AS MATERIALIZED (
         |  SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM (
         |    SELECT wf AS a, lf AS b FROM duels
         |    UNION ALL SELECT lf AS a, wf AS b FROM duels)
         |  GROUP BY a, b),
         |p0 AS MATERIALIZED (
         |  SELECT pl.a, coalesce(w.w, 0) AS w, CAST(1.0 AS DOUBLE) AS x
         |  FROM (SELECT DISTINCT a FROM games) pl LEFT JOIN wins w ON w.p = pl.a),
         |$rounds,
         |tot AS (SELECT ${dsum12("x")} AS tot FROM p8)
         |SELECT a AS player, w AS n_wins, ${t6("x / tot")} AS strength
         |FROM p8 CROSS JOIN tot ORDER BY player""".stripMargin
    },

    // q294: directed pairwise win rates + Wilson 95% lower bound over
    // the same duels — integer counts, one pinned-z double expression
    "q294_winrate_wilson" -> {
      val z = "1.959964e0"
      val z2 = s"${(1.959964 * 1.959964).toString}e0"
      val nD = "CAST(n AS DOUBLE)"
      val phat = s"(CAST(w AS DOUBLE) / $nD)"
      val low = s"(($phat + $z2 / (2.0e0 * $nD) - " +
        s"$z * sqrt($phat * (1.0e0 - $phat) / $nD + $z2 / (4.0e0 * $nD * $nD))) / " +
        s"(1.0e0 + $z2 / $nD))"
      s"""WITH $duelsCtes,
         |g AS (SELECT a, b, CAST(sum(won) AS BIGINT) AS w,
         |             CAST(count(*) AS BIGINT) AS n FROM (
         |        SELECT wf AS a, lf AS b, 1 AS won FROM duels
         |        UNION ALL SELECT lf AS a, wf AS b, 0 AS won FROM duels)
         |      GROUP BY a, b)
         |SELECT a, b, w, n, ${t6(phat)} AS win_rate, ${t6(low)} AS wilson_low
         |FROM g ORDER BY a, b""".stripMargin
    },

    // q291: top principal component — the final normalized v of the
    // power-iteration chain, trunc6'd per dim
    "q291_pca_component" ->
      s"""${pcaCtes(6)}
         |SELECT j AS dim, ${t6("x")} AS loading FROM v6 ORDER BY dim""".stripMargin,

    // q292: spectral summary — λ₁ = ‖C·v₅‖ from round 6, trace from
    // the diagonal, explained ratio as one division
    "q292_pca_explained" ->
      s"""${pcaCtes(6)},
         |tr AS (SELECT ${dsum12("cov")} AS trace FROM cov WHERE i = j)
         |SELECT ${t6("nrm")} AS lambda1, ${t6("trace")} AS trace,
         |       ${t6("nrm / trace")} AS explained_ratio
         |FROM n6 CROSS JOIN tr""".stripMargin,
  ) ++ SparkEntry.SharedSqlQueries.map { case (name, _, text) =>
    // the verbatim shared-SQL family: the oracle twin is the SAME text
    // modulo the two documented token substitutions (see
    // SparkEntry.duckanizeSql)
    name -> SparkEntry.duckanizeSql(text)
  }.toMap
}
