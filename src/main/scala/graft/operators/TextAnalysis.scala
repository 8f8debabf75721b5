package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token stats,
  * quality scoring, fingerprinting, language-ID heuristics. Everything is
  * per-row narrow work (no shuffle) built on codegen'd functions — at
  * 100 TB this runs at scan speed.
  */
object TextAnalysis {

  /** Token counting + stop-word stats per document (A7-adjacent; the
    * reference counts tokens per message via tiktoken with a word-count
    * fallback — utils/token_counter.py:114-160). */
  def tokenStats(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    // counts as long so the schema lines up with BIGINT-returning oracles
    docs.select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct"),
      (size(toks) - size(contentTokens(col("text")))).cast("long").as("n_stopwords"),
      length(col("text")).cast("long").as("n_chars_computed"))
      .orderBy("doc_id")
  }

  /** Exact token-length quantiles per group — the corpus length
    * distribution every pretraining recipe reports (and cuts outliers
    * by). Interpolation (percentile_cont semantics: rank h = p·(n−1),
    * value = v_lo + frac·(v_hi − v_lo)) is spelled out EXPLICITLY so
    * both engines run the identical IEEE ops — the builtin
    * `percentile`/`quantile_cont` pair interpolates with different
    * association and lands ulps apart exactly ON the trunc6 grid.
    *
    * Shape at scale: one shuffle keyed on the group + a per-group sort
    * (rank assignment); the quantile picks are two rows per (group, p).
    * This is the exact/auditable variant — at 100 TB per-group sorts of
    * the full corpus are real cost, and `approx_percentile` (t-digest,
    * bounded error, no sort) is the approximate path Spark already
    * ships; this operator exists for when the number must be exact. */
  def lengthQuantiles(
      docs: DataFrame,
      groupCol: String = "lang",
      ps: Seq[(String, Double)] = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
    : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col(groupCol),
      size(tokens(col("text"))).cast("double").as("v"))
    val ranked = tok.withColumn("rank",
      row_number().over(Window.partitionBy(groupCol).orderBy(col("v"))))
    val counts = tok.groupBy(groupCol).agg(count(lit(1)).as("cnt"))
    val j = ranked.join(counts, groupCol)
    def h(p: Double): Column = lit(p) * (col("cnt") - 1)
    val picks = ps.flatMap { case (name, p) =>
      Seq(
        min(when(col("rank") === floor(h(p)) + 1, col("v"))).as(s"lo_$name"),
        min(when(col("rank") === least(floor(h(p)) + 2, col("cnt")), col("v")))
          .as(s"hi_$name"))
    }
    val agg = j.groupBy(groupCol).agg(max(col("cnt")).as("cnt"), picks: _*)
    val outCols = col(groupCol) +: ps.map { case (name, p) =>
      val frac = h(p) - floor(h(p))
      trunc6(col(s"lo_$name") + frac * (col(s"hi_$name") - col(s"lo_$name")))
        .as(name)
    }
    agg.select(outCols: _*).orderBy(groupCol)
  }

  /** The composite quality score of one text column, trunc6'd (shared by
    * [[qualityScore]] and the cleaning recipe so the filter threshold
    * compares the exact reported value). */
  private[graft] def qualityExpr(t: Column): Column = {
    val toks = tokens(t)
    val nTok = size(toks).cast("double")
    val stopRatio = (size(toks) - size(contentTokens(t))).cast("double") / nTok
    val uniqRatio = size(array_distinct(toks)).cast("double") / nTok
    val avgTokLen = (length(t) - size(toks) + 1).cast("double") / nTok
    trunc6(uniqRatio * 0.5 + (lit(1.0) - stopRatio) * 0.3 +
      least(avgTokLen / 8.0, lit(1.0)) * 0.2)
  }

  /** Quality scoring: length/stopword/uniqueness ratios. A simple,
    * deterministic stand-in for fastText-style quality classifiers. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val stopRatio = (size(toks) - size(contentTokens(col("text")))).cast("double") / nTok
    val uniqRatio = size(array_distinct(toks)).cast("double") / nTok
    val avgTokLen = (length(col("text")) - size(toks) + 1).cast("double") / nTok
    docs.select(
      col("doc_id"),
      trunc6(stopRatio).as("stop_ratio"),
      trunc6(uniqRatio).as("uniq_ratio"),
      trunc6(avgTokLen).as("avg_token_len"),
      qualityExpr(col("text")).as("quality"))
      .orderBy("doc_id")
  }

  /** CCNet-style language-model quality proxy (Wenzek et al., "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data"
    * filters on KenLM perplexity): score each document by the mean
    * negative log-probability of its tokens under the corpus's OWN
    * unigram distribution. The unigram variant keeps the filter's shape
    * — documents full of rare/garbage tokens score high, templated
    * boilerplate scores low — while staying deterministic and
    * engine-exact (the n-gram LM slot swaps in behind the same
    * signature).
    *
    * Scale shape: ONE map-side-combinable token groupBy builds the
    * unigram table (vocab-sized, ≪ corpus — Spark broadcasts it from
    * stats or shuffles by term when the vocabulary outgrows that), one
    * per-doc aggregation scores. The decimal-widened average keeps the
    * sum order-independent for the oracle. */
  def unigramLogProb(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val counts = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("n_total"))
    toks
      .join(counts, "term")
      .crossJoin(broadcast(total))
      .withColumn("nll",
        -log(col("cnt").cast("double") / col("n_total").cast("double")))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        trunc6(davg(col("nll"))).as("avg_nll"))
      .orderBy("doc_id")
  }

  /** Interpolated BIGRAM language-model scoring — the next rung of the
    * CCNet perplexity-filter ladder above [[unigramLogProb]]: per
    * position, p = λ·p(w|prev) + (1−λ)·p(w), with the pure unigram at
    * the document start; score = mean −ln p. The model is the corpus's
    * own counts, so like q66 the whole thing is engine-exact and a real
    * n-gram LM drops into the same signature.
    *
    * Scale shape: the (prev, term) pair expansion is ROW-LOCAL (one
    * compiled transform, no self-join on position); unigram and bigram
    * tables are vocab-sized map-side-combinable groupBys (≪ corpus,
    * broadcast from stats when small enough); scoring is the per-
    * position frame joined against those two tables plus one per-doc
    * aggregation. Decimal-widened averaging keeps the oracle exact. */
  def bigramLogProb(docs: DataFrame, lambda: Double = 0.8): DataFrame = {
    val pos = docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(expr(
        "transform(t, (w, i) -> struct(w AS term, " +
          "CASE WHEN i = 0 THEN NULL ELSE t[i - 1] END AS prev))")).as("p"))
      .select(col("doc_id"), col("p.term").as("term"), col("p.prev").as("prev"))
    val uni = pos.groupBy("term").agg(count(lit(1)).as("u_cnt"))
    val total = uni.agg(sum(col("u_cnt")).as("n_total"))
    val bi = pos.filter(col("prev").isNotNull)
      .groupBy("prev", "term").agg(count(lit(1)).as("b_cnt"))
    val uniPrev = uni.select(col("term").as("prev"), col("u_cnt").as("p_cnt"))
    pos
      .join(bi, Seq("prev", "term"), "left")
      .join(uni, "term")
      .join(uniPrev, Seq("prev"), "left")
      .crossJoin(broadcast(total))
      .withColumn("p_uni",
        col("u_cnt").cast("double") / col("n_total").cast("double"))
      .withColumn("nll", -log(when(col("prev").isNull, col("p_uni"))
        .otherwise(
          lit(lambda) * (coalesce(col("b_cnt"), lit(0L)).cast("double") /
            col("p_cnt").cast("double")) +
            lit(1.0 - lambda) * col("p_uni"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        trunc6(davg(col("nll"))).as("avg_nll"))
      .orderBy("doc_id")
  }

  /** DSIR data selection (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling"): score every raw document by the
    * log importance ratio between a TARGET distribution (the docs
    * matching `isTarget` — e.g. the wiki/books slice you want more of)
    * and the RAW distribution (the rest), both modeled as bag-of-
    * hashed-unigram models with +1 smoothing over `buckets` hashed
    * features. High scores = raw docs that look like the target domain;
    * resampling keeps the top mass. The reported score is the MEAN
    * per-token log ratio (length-normalized; the paper's sum is
    * `score × n_tokens`).
    *
    * Scale shape: the feature hash is row-local md5, both count tables
    * are ≤ `buckets` rows built by one map-side-combinable groupBy each
    * and BROADCAST to the scoring join; scoring itself is the token
    * scan + one per-doc aggregation. Nothing corpus-sized shuffles. */
  def dsirWeights(docs: DataFrame, isTarget: Column,
      buckets: Int = 4096): DataFrame = {
    // materialized once: the hashed token frame feeds BOTH model counts
    // and the scoring join — without the lineage cut the tokenize+hash
    // scan re-runs three times (measured 1.46 s → 0.7 s at sf0.1)
    val toks = docs
      .select(col("doc_id"), isTarget.as("is_target"),
        explode(tokens(col("text"))).as("term"))
      .withColumn("bucket",
        conv(substring(md5(concat(lit("dsir|"), col("term"))), 1, 13), 16, 10)
          .cast("long") % buckets)
      .localCheckpoint()
    def model(flag: Boolean, cn: String, tn: String) = {
      val cnt = toks.filter(col("is_target") === flag)
        .groupBy("bucket").agg(count(lit(1)).as(cn))
      val tot = cnt.agg(sum(col(cn)).as(tn))
      (cnt, tot)
    }
    val (tCnt, tTot) = model(flag = true, "t_cnt", "t_total")
    val (rCnt, rTot) = model(flag = false, "r_cnt", "r_total")
    // score only the RAW pool (targets are already in-domain); +1/+B
    // Laplace smoothing keeps unseen buckets finite in both models
    toks.filter(!col("is_target"))
      .join(broadcast(tCnt), Seq("bucket"), "left")
      .join(broadcast(rCnt), Seq("bucket"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .withColumn("log_ratio",
        log((coalesce(col("t_cnt"), lit(0L)) + lit(1L)).cast("double") /
            (col("t_total") + lit(buckets.toLong)).cast("double")) -
        log((coalesce(col("r_cnt"), lit(0L)) + lit(1L)).cast("double") /
            (col("r_total") + lit(buckets.toLong)).cast("double")))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        trunc6(davg(col("log_ratio"))).as("avg_log_ratio"))
      .orderBy("doc_id")
  }

  /** Multinomial Naive Bayes over hashed unigram features — the
    * classical text classifier occupying the fasttext slot of corpus
    * pipelines (language/domain/quality gating), chosen here because
    * training IS counting: priors and per-class feature counts are two
    * map-side-combinable groupBys, so the ENTIRE train+score pipeline
    * is deterministic and replays exactly in SQL (gradient-trained
    * models pin merge-for-merge like the BPE trainer instead). Scoring
    * expands each token to the C classes (a broadcast of the C-row
    * class table), per-class log-likelihoods sum decimal-widened, and
    * the argmax rides the row_number idiom the WindowTopKRewrite turns
    * into the bounded heap. Labels double as training data — the
    * registered query demonstrates the operator on the corpus's own
    * lang labels (a real pipeline trains on a held-out labeled slice).
    */
  /** All per-class NB scores (doc_id, cls, score) — the scored frame
    * behind [[naiveBayesLang]]'s argmax and [[nbCalibration]]'s margin
    * bins. */
  def naiveBayesScores(docs: DataFrame, buckets: Int = 4096): DataFrame = {
    val toks = docs
      .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("term"))
      .withColumn("bucket",
        conv(substring(md5(concat(lit("nb|"), col("term"))), 1, 13), 16, 10)
          .cast("long") % buckets)
      .localCheckpoint()
    val classes = docs.groupBy(col("lang").as("cls"))
      .agg(count(lit(1)).as("n_docs"))
    val nTotal = classes.agg(sum(col("n_docs")).as("n_total"))
    val priors = classes.crossJoin(broadcast(nTotal))
      .select(col("cls"),
        log(col("n_docs").cast("double") / col("n_total").cast("double"))
          .as("log_prior"))
    val clsTok = toks.groupBy(col("lang").as("cls"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val clsTot = clsTok.groupBy("cls").agg(sum(col("cnt")).as("cls_total"))
    // score (doc, bucket, count) FEATURES, not token instances: the
    // per-class fan-out and the log-likelihood sum shrink from
    // |tokens|×classes to |distinct buckets per doc|×classes rows, and
    // the Σ count·lp runs over signed scaled longs (measured 2.5× on
    // the interleaved bench vs the per-token decimal sum)
    val feats = toks.groupBy("doc_id", "bucket").agg(count(lit(1)).as("tcnt"))
    val scored = feats
      .crossJoin(broadcast(clsTot))
      .join(broadcast(clsTok), Seq("cls", "bucket"), "left")
      .withColumn("lp",
        log((coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double") /
          (col("cls_total") + lit(buckets.toLong)).cast("double")))
      .groupBy("doc_id", "cls")
      .agg(zsum8(col("tcnt").cast("double") * col("lp")).as("ll"))
      .join(broadcast(priors), "cls")
      .withColumn("score", trunc6(col("log_prior") + col("ll")))
    scored.select(col("doc_id"), col("cls"), col("score"))
  }

  def naiveBayesLang(docs: DataFrame, buckets: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("cls"))
    naiveBayesScores(docs, buckets)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("cls").as("pred_lang"), col("score"))
      .orderBy("doc_id")
  }

  /** Calibration report for [[naiveBayesLang]] by CONFIDENCE MARGIN:
    * documents ranked by the top-1 vs top-2 score gap, cut into
    * equal-count bins, each bin reporting its empirical accuracy — the
    * reliability table read before trusting classifier confidence as a
    * filter threshold (margin avoids the softmax a probability
    * calibration would need, keeping both engines transcendental-free
    * beyond the NB lls themselves). Margin bins are rank-derived
    * (integer `(rn−1)·bins div n`), so bin edges can't drift; at
    * corpus scale the margin rank rides the two-phase prefix count
    * (Stats.orderedPrefixSums shape), not this global row_number. */
  def nbCalibration(docs: DataFrame, bins: Int = 10,
      buckets: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("cls"))
    val top2 = naiveBayesScores(docs, buckets)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    val first = top2.filter(col("rn") === 1)
      .select(col("doc_id"), col("cls").as("pred_lang"), col("score").as("s1"))
    val second = top2.filter(col("rn") === 2)
      .select(col("doc_id"), col("score").as("s2"))
    val lab = first.join(second, "doc_id")
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), (col("s1") - col("s2")).as("margin"),
        when(col("pred_lang") === col("lang"), 1L).otherwise(0L).as("correct"))
    val tot = lab.agg(count(lit(1)).as("n_all"))
    val wr = Window.orderBy(col("margin"), col("doc_id"))
    lab.withColumn("rn", row_number().over(wr).cast("long"))
      .crossJoin(broadcast(tot))
      .withColumn("bin", expr(s"(rn - 1) * $bins div n_all"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("correct")).as("n_correct"),
        trunc6(sum(col("correct")).cast("double") /
          count(lit(1)).cast("double")).as("accuracy"),
        trunc6(zsum8(col("margin")) / count(lit(1)).cast("double"))
          .as("mean_margin"))
      .orderBy("bin")
  }

  /** Hashed bag-of-words features for the linear classifiers:
    * (doc_id, bucket, cnt) — one tokenize scan + one map-side-
    * combinable groupBy. */
  def lrFeatures(docs: DataFrame, buckets: Int): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .withColumn("bucket",
        conv(substring(md5(concat(lit("lr|"), col("term"))), 1, 13), 16, 10)
          .cast("long") % buckets)
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))

  /** The EPOCH-0 gradient of [[trainQualityLr]] — at w = 0 the sigmoid
    * is exactly 0.5, so the full-batch gradient Σ(0.5 − y)·x / n has no
    * transcendentals and replays exactly in SQL: the oracle hook for
    * the gradient trainer, the q84-BPE-round-0 design. */
  def lrEpoch0Grad(docs: DataFrame, isPos: Column,
      buckets: Int = 256): DataFrame = {
    val feat = lrFeatures(docs, buckets)
    val lab = docs.select(col("doc_id"), when(isPos, 1.0).otherwise(0.0).as("y"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    feat.join(lab, "doc_id").crossJoin(broadcast(n))
      .groupBy("bucket", "n_docs")
      .agg(dsum12((lit(0.5) - col("y")) * col("cnt")).as("g"))
      .select(col("bucket"), trunc6(col("g") / col("n_docs")).as("grad"))
      .orderBy("bucket")
  }

  /** Distributed full-batch logistic regression over hashed bag-of-
    * words features — the gradient-trained sibling of the counting
    * [[naiveBayesLang]], occupying the fasttext-quality-classifier
    * slot when a labeled slice exists. The intercept rides as a
    * virtual always-on feature (bucket = `buckets`), so each epoch is
    * exactly TWO jobs over the checkpointed feature frame: a per-doc
    * margin aggregation (weights broadcast as a literal array — B+1
    * doubles, the codebook pattern) and a per-bucket decimal-widened
    * gradient aggregation whose B+1 scalars come back to the driver
    * for the update. Nothing corpus-sized ever leaves the executors;
    * at 100 TB this is the textbook full-batch distributed LR.
    * Determinism: md5 features, dsum12 gradient sums — OperatorSpec
    * pins the trained weights against a local reference trainer. */
  def trainQualityLr(docs: DataFrame, isPos: Column, buckets: Int = 256,
      epochs: Int = 10, rate: Double = 0.5): Array[Double] = {
    val lab = docs
      .select(col("doc_id"), when(isPos, 1.0).otherwise(0.0).as("y"))
      .localCheckpoint()
    val feat = lrFeatures(docs, buckets)
      .unionByName(lab.select(col("doc_id"),
        lit(buckets.toLong).as("bucket"), lit(1L).as("cnt")))
      .localCheckpoint()
    val nDocs = lab.count().toDouble
    var w = Array.fill(buckets + 1)(0.0)
    for (_ <- 1 to epochs) {
      val wl = typedlit(w.toSeq)
      val err = feat
        .withColumn("wx",
          element_at(wl, col("bucket").cast("int") + 1) * col("cnt"))
        .groupBy("doc_id").agg(dsum12(col("wx")).as("m"))
        .join(lab, "doc_id")
        .select(col("doc_id"),
          (lit(1.0) / (lit(1.0) + exp(-col("m"))) - col("y")).as("err"))
      val grads = feat.join(err, "doc_id")
        .groupBy("bucket").agg(dsum12(col("err") * col("cnt")).as("g"))
        .collect().map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
      w = w.zipWithIndex.map { case (wv, i) =>
        wv - rate * grads.getOrElse(i, 0.0) / nDocs }
    }
    w
  }

  /** Score docs with a trained LR weight vector (last slot = bias). */
  def scoreLr(docs: DataFrame, w: Array[Double]): DataFrame = {
    val buckets = w.length - 1
    val wl = typedlit(w.toSeq)
    val feat = lrFeatures(docs, buckets)
      .unionByName(docs.select(col("doc_id"),
        lit(buckets.toLong).as("bucket"), lit(1L).as("cnt")))
    feat
      .withColumn("wx",
        element_at(wl, col("bucket").cast("int") + 1) * col("cnt"))
      .groupBy("doc_id").agg(dsum12(col("wx")).as("m"))
      .select(col("doc_id"),
        trunc6(lit(1.0) / (lit(1.0) + exp(-col("m")))).as("score"))
      .orderBy("doc_id")
  }

  /** Weighted sampling without replacement (Efraimidis & Spirakis 2006,
    * "Weighted random sampling with a reservoir"): each row draws a
    * deterministic md5-derived uniform u ∈ (0, 1) and the k rows with
    * the LARGEST u^(1/w) win — here ranked by the monotone-equivalent
    * ln(u)/w, which avoids pow's cross-engine rounding. Inclusion
    * probability is proportional to weight, the sample is reproducible
    * under any partitioning (the draw depends only on the id), and the
    * cut is a TakeOrdered heap — one row-local scan, no shuffle beyond
    * the top-k merge. Zero/negative weights are excluded (ES requires
    * w > 0). */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
      k: Int, salt: String = "ws0"): DataFrame = {
    // 52-bit md5 slice + 1 over 2^52 + 1: u ∈ (0, 1), never 0 or 1
    val u = (conv(substring(
      md5(concat(lit(s"$salt|"), col(idCol).cast("string"))), 1, 13), 16, 10)
      .cast("long") + lit(1L)).cast("double") / lit(4503599627370497.0)
    df.filter(weight > 0)
      .select(col(idCol), trunc6(log(u) / weight.cast("double")).as("sample_key"))
      .orderBy(col("sample_key").desc, col(idCol))
      .limit(k)
  }

  /** HTML → main-text extraction (the trafilatura/jusText slot of a
    * web-crawl pipeline, reduced to its deterministic core): drop
    * script/style payloads, drop nav/header/footer boilerplate
    * blocks, strip remaining tags, decode the five standard entities,
    * collapse whitespace. Pure codegen'd regexp/concat chain — no UDF
    * — and every pattern is in the Java-regex ∩ RE2 portable subset
    * ((?s), lazy quantifiers, character classes; no backreferences),
    * so a SQL engine replays the extraction byte-for-byte. Row-local:
    * scan-speed at any corpus size. */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c,
      "(?s)<(script|style)[^>]*>.*?</(script|style)>", " ")
    // longer alternatives first: leftmost-first matching would let
    // "head" claim the opening of a <header> block
    val noChrome = regexp_replace(noScript,
      "(?s)<(header|head|nav|footer)[^>]*>.*?</(header|head|nav|footer)>", " ")
    val noTags = regexp_replace(noChrome, "<[^>]*>", " ")
    // decode order: named entities first, ampersand LAST (else
    // &amp;lt; would double-decode)
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (ent, ch)) =>
        regexp_replace(acc, ent, ch)
      }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Per-document DEFLATE compression ratio — the Gopher/RedPajama
    * quality heuristic entropy approximates analytically: templated,
    * repetitive, machine-generated text compresses far below prose
    * (ratios under ~0.3 at typical doc lengths are near-certain
    * boilerplate). zlib lives behind a JNI seam, so this is the one
    * honest UDF in the text stack (no Catalyst expression can reach
    * Deflater) — still row-local scan-speed, and deterministic: level-6
    * DEFLATE output length is a pure function of the bytes. Not
    * SQL-expressible → registered as a bench extra with its spec, not
    * an oracle query. */
  def compressionRatio(docs: DataFrame): DataFrame = {
    val ratioUdf = udf { text: String =>
      if (text == null || text.isEmpty) 1.0
      else {
        val raw = text.getBytes("UTF-8")
        val d = new java.util.zip.Deflater(6)
        d.setInput(raw); d.finish()
        val buf = new Array[Byte](8192)
        var total = 0L
        while (!d.finished()) total += d.deflate(buf)
        d.end()
        math.floor(total.toDouble / raw.length * 1e6) / 1e6
      }
    }
    docs.select(col("doc_id"), col("n_chars"),
      ratioUdf(col("text")).as("deflate_ratio"))
      .orderBy("doc_id")
  }

  /** Per-document Shannon entropy of the token distribution — the
    * lexical-diversity gate (low entropy = keyword stuffing, tag soup,
    * generated boilerplate; the Gopher/C4 family's repetition rules
    * approximate this, entropy is the information-theoretic version).
    * One (doc, term) count aggregation + one per-doc aggregation of
    * −Σ p·ln p through the order-independent decimal sum; row-local
    * otherwise, scan-speed at any corpus size. */
  def tokenEntropy(docs: DataFrame): DataFrame = {
    val tf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
    val n = tf.groupBy("doc_id").agg(sum(col("c")).as("n"))
    tf.join(n, "doc_id")
      .withColumn("p", col("c").cast("double") / col("n").cast("double"))
      .groupBy("doc_id")
      .agg(max(col("n")).as("n_tokens"),
        trunc6(-dsum12(col("p") * log(col("p")))).as("entropy"))
      .orderBy("doc_id")
  }

  /** Zipf rank–frequency fit over the top-N corpus terms: OLS of
    * ln(freq) on ln(rank) — a healthy natural-language corpus slopes
    * near −1, and a drifting slope is an early machine-generated /
    * template-spam signal (alongside [[tokenEntropy]] and
    * [[compressionRatio]]). One term-count aggregation, a single
    * bounded top-N cut (N pinned, so the OLS frame is N rows BY
    * CONSTRUCTION at any corpus size), ln terms reduced on the
    * 12-decimal grid. Rank ties break lexicographically. */
  def zipfSlope(docs: DataFrame, topN: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs.select(explode(tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("n").desc, col("term"))
    val top = tf.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topN)
      .select(log(col("rank").cast("double")).as("x"),
        log(col("n").cast("double")).as("y"))
    val d = (c: String) => col(c).cast("double")
    top
      .agg(count(lit(1)).as("n_terms"),
        dsum12(col("x")).as("sx"), dsum12(col("y")).as("sy"),
        dsum12(col("x") * col("y")).as("sxy"),
        dsum12(col("x") * col("x")).as("sxx"),
        dsum12(col("y") * col("y")).as("syy"))
      .select(col("n_terms"),
        trunc6((d("n_terms") * col("sxy") - col("sx") * col("sy")) /
          (d("n_terms") * col("sxx") - col("sx") * col("sx"))).as("slope"),
        trunc6((col("sy") - (d("n_terms") * col("sxy") - col("sx") * col("sy")) /
          (d("n_terms") * col("sxx") - col("sx") * col("sx")) * col("sx")) /
          d("n_terms")).as("intercept"),
        trunc6((d("n_terms") * col("sxy") - col("sx") * col("sy")) *
          (d("n_terms") * col("sxy") - col("sx") * col("sy")) /
          ((d("n_terms") * col("sxx") - col("sx") * col("sx")) *
            (d("n_terms") * col("syy") - col("sy") * col("sy")))).as("r2"))
  }

  /** Flesch reading-ease + Flesch–Kincaid grade per document, with the
    * classic heuristics made engine-portable: words = space tokens,
    * sentences = [.!?]+ separator runs (floor 1), syllables = vowel
    * groups [aeiouy]+ over the lowercased text (the standard
    * approximation — counts every vowel cluster as one syllable).
    * Pure row-local regex work, runs at scan speed; the constants ride
    * as pinned literals in both engines. */
  def readability(docs: DataFrame): DataFrame = {
    val t = col("text")
    val words = size(tokens(t)).cast("long")
    val sentences = greatest(lit(1L),
      (size(split(t, "[.!?]+")) - lit(1)).cast("long"))
    val syllables = greatest(lit(1L),
      (size(split(lower(t), "[aeiouy]+")) - lit(1)).cast("long"))
    val d = (c: Column) => c.cast("double")
    val wps = d(col("n_words")) / d(col("n_sentences"))
    val spw = d(col("n_syllables")) / d(col("n_words"))
    docs.select(col("doc_id"), words.as("n_words"),
        sentences.as("n_sentences"), syllables.as("n_syllables"))
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        trunc6(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw)
          .as("flesch"),
        trunc6(lit(0.39) * wps + lit(11.8) * spw - lit(15.59))
          .as("fk_grade"))
      .orderBy("doc_id")
  }

  /** Lexical-richness profile per language: types, tokens, hapax
    * legomena (single-occurrence terms), type–token ratio, hapax
    * share, and Herdan's C (ln V / ln N — the size-robust richness
    * measure; raw TTR shrinks with corpus size, so comparing corpora
    * on TTR alone misleads). Two grouped counts over the (lang, term)
    * frame — vocabulary-sized, never row-sized. */
  def lexicalRichness(docs: DataFrame): DataFrame = {
    val tf = docs.select(col("lang"), explode(tokens(col("text"))).as("term"))
      .groupBy("lang", "term").agg(count(lit(1)).as("c"))
    val d = (c: String) => col(c).cast("double")
    tf.groupBy("lang")
      .agg(count(lit(1)).as("types"), sum(col("c")).as("tokens"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("hapax"))
      .select(col("lang"), col("types"), col("tokens"), col("hapax"),
        trunc6(d("types") / d("tokens")).as("ttr"),
        trunc6(d("hapax") / d("types")).as("hapax_share"),
        trunc6(log(d("types")) / log(d("tokens"))).as("herdan_c"))
      .orderBy("lang")
  }

  /** Per-language top-k word bigrams by corpus frequency — the
    * collocation/phrase-mining profile of a multilingual corpus (and
    * the input to phrase-aware tokenizer vocab decisions). Bigram
    * expansion is ROW-LOCAL (an index-transform over the token array,
    * no position self-join); one map-side-combinable (lang, bigram)
    * count and a per-lang bounded-heap cut finish it. Count ties break
    * lexicographically so the cut is deterministic in any engine. */
  def topBigramsPerLang(docs: DataFrame, topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(col("lang"), tokens(col("text")).as("t"))
      // guard: Spark's sequence(1, 0) is DESCENDING, not empty — a
      // 1-token doc would fabricate a null bigram without this filter
      .filter(size(col("t")) >= 2)
      .select(col("lang"), explode(expr(
        "transform(sequence(1, size(t) - 1), " +
          "i -> concat(t[i - 1], ' ', t[i]))")).as("bigram"))
      .groupBy("lang", "bigram").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("bigram"))
    val heapRegistered = docs.sparkSession.sessionState.planner.strategies
      .exists(_ eq graft.plans.TopKPerKeyStrategy)
    val cut = // plain sessions (no GraftExtensions) fall back to the window idiom
      if (heapRegistered)
        graft.plans.TopKPerKey(counts, Seq("lang"),
          Seq(col("cnt").desc, col("bigram")), topK)
          .withColumn("rank", row_number().over(w).cast("long"))
      else
        counts.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= topK)
    cut.orderBy("lang", "rank")
  }

  /** TF-IDF keyword extraction: the top `topK` terms of every document
    * by tf·ln(N/df) — the per-document keyword/tag step of a corpus
    * indexing pipeline. The per-doc cut routes through the engine's
    * [[graft.plans.TopKPerKey]] bounded-heap operator (no windowed full
    * sort of the corpus-sized (doc, term) score table); ranks are then
    * numbered within the tiny survivor set. */
  def tfidfKeywords(docs: DataFrame, topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // df is a vocab-sized aggregate (≪ the (doc, term) table) — the
    // planner broadcasts it from stats; no bare corpus scan ever builds
    val scored = tf
      .join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        trunc6(col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double"))))
      .select(col("doc_id"), col("term").as("keyword"), col("score"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("keyword"))
    val heapRegistered = docs.sparkSession.sessionState.planner.strategies
      .exists(_ eq graft.plans.TopKPerKeyStrategy)
    val cut = // plain sessions (no GraftExtensions) fall back to the window idiom
      if (heapRegistered)
        graft.plans.TopKPerKey(scored, Seq("doc_id"),
          Seq(col("score").desc, col("keyword")), topK)
          .withColumn("rank", row_number().over(w).cast("long"))
      else
        scored.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= topK)
    cut.orderBy("doc_id", "rank")
  }

  /** Token-balanced contiguous sharding for corpus export: assign each
    * document (in doc_id order) to shard ⌊start_offset / target⌋, where
    * start_offset is the running token total of all earlier docs — the
    * "write N roughly-equal training shards" step of every corpus
    * export, with deterministic, order-stable assignments.
    *
    * A naive `sum() OVER (ORDER BY doc_id)` collapses to ONE partition
    * (Spark's unpartitioned window); this is the scalable two-phase
    * prefix sum instead: range-partition by doc_id, per-partition token
    * sums to the driver (one long per partition), prefix-scan there,
    * then a per-row running total seeded by the partition's offset. The
    * sorted RDD is locally checkpointed between the two phases — a
    * recomputation could re-sample range boundaries and silently shift
    * every offset, so losing the blocks must FAIL the job, not corrupt
    * the assignment. */
  def shardByTokens(docs: DataFrame, targetTokens: Long): DataFrame =
    tokenStartOffsets(docs)
      .select(col("doc_id"), col("n_tokens"),
        // integer `div` — exact long floor division, as the pre-refactor
        // RDD code's JVM `/` was
        expr(s"start div $targetTokens").as("shard"))
      .orderBy("doc_id")

  /** The two-phase distributed prefix sum shared by [[shardByTokens]]
    * and the block packers: every document's global token START offset
    * in `orderKey` order (doc_id when None; doc_id always breaks ties)
    * — (doc_id, n_tokens, start). */
  private def tokenStartOffsets(
      docs: DataFrame, orderKey: Option[Column] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sized = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        orderKey.getOrElse(col("doc_id")).cast("long").as("okey"))
      .repartitionByRange(col("okey"), col("doc_id"))
      .sortWithinPartitions("okey", "doc_id")
      .as[(Long, Long, Long)]
      .rdd
      .localCheckpoint()
    val partSums = sized
      .mapPartitionsWithIndex { case (i, it) =>
        var s = 0L; it.foreach(s += _._2); Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(partSums.scanLeft(0L)(_ + _))
    sized
      .mapPartitionsWithIndex { case (i, it) =>
        var cum = offsets.value(i)
        it.map { case (id, n, _) =>
          val start = cum; cum += n; (id, n, start)
        }
      }
      .toDF("doc_id", "n_tokens", "start")
  }

  /** GPT-style FIXED-BLOCK packing: conceptually concatenate the whole
    * corpus's tokens in doc_id order and cut every `blockTokens` —
    * documents SPLIT across block boundaries (the complement of
    * [[packSequences]], which packs whole documents to a budget; block
    * packing is what next-token pretraining actually consumes). Returns
    * one row per block: (block_id, n_docs spanned, n_tokens — full
    * except the final remainder, first_doc, last_doc).
    *
    * Scale shape: start offsets via the two-phase prefix sum, then each
    * doc expands ROW-LOCALLY to the (few) blocks it overlaps and one
    * block-keyed aggregation summarizes — no corpus-wide window, no
    * single-partition cumsum. */
  def packBlocks(docs: DataFrame, blockTokens: Long): DataFrame =
    blocksFromOffsets(tokenStartOffsets(docs), blockTokens)

  /** [[packBlocks]] in deterministically SHUFFLED document order — real
    * pretraining packs the token stream after a seeded global shuffle,
    * not in source order (adjacent source docs correlate). The order is
    * the md5 of "seed|doc_id" (doc_id breaks the vanishing-probability
    * hash ties), so the permutation is reproducible across engines,
    * partitionings and cluster sizes; at scale the shuffle is the range
    * exchange the prefix sum already pays, so ordering costs nothing
    * extra. */
  def packBlocksShuffled(
      docs: DataFrame, blockTokens: Long, seed: String): DataFrame =
    blocksFromOffsets(
      tokenStartOffsets(docs,
        Some(md5LongSalted(col("doc_id").cast("string"), seed))),
      blockTokens)

  private def blocksFromOffsets(
      offsets: DataFrame, blockTokens: Long): DataFrame =
    offsets
      .select(col("doc_id"), col("n_tokens"), col("start"),
        // integer `div`, never double-divide-then-truncate: at 100 TB
        // token offsets a double quotient can round across the boundary
        explode(sequence(
          expr(s"start div $blockTokens"),
          expr(s"(start + n_tokens - 1) div $blockTokens")))
          .as("block_id"))
      .withColumn("toks_in_block",
        least(col("start") + col("n_tokens"), (col("block_id") + 1) * blockTokens) -
          greatest(col("start"), col("block_id") * blockTokens))
      .groupBy("block_id")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("toks_in_block")).cast("long").as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("block_id")

  /** Sequence packing for pretraining export: concatenate documents (in
    * doc_id order) into contiguous ~`seqTokens`-token training
    * sequences — the step that turns a cleaned corpus into the packed
    * rows a trainer actually consumes. Built on [[shardByTokens]]'s
    * two-phase distributed prefix sum (never a single-partition window
    * cumsum), then one groupBy keyed on the sequence id reassembles
    * each pack in order. Returns (seq_id, n_docs, n_tokens, text). */
  def packSequences(docs: DataFrame, seqTokens: Long): DataFrame = {
    val shards = shardByTokens(docs, seqTokens)
      .select(col("doc_id"), col("shard").as("seq_id"))
    docs.select(col("doc_id"), col("text"))
      .join(shards, "doc_id")
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("doc_id"), col("text")))),
          s => s.getField("text"))).as("text"))
      .withColumn("n_tokens", size(tokens(col("text"))).cast("long"))
      .select("seq_id", "n_docs", "n_tokens", "text")
      .orderBy("seq_id")
  }

  /** Temperature-weighted corpus mixing (the GPT-3/PaLM-style α-scaled
    * multinomial over sources): each stratum's keep-rate makes the
    * EXPECTED mixture follow n_i^α shares — α < 1 up-weights rare
    * sources — normalized so the RAREST stratum's rate is 1.0 (rare
    * data survives whole, common data down-samples; no replication).
    * Rates derive from one stratum
    * count aggregation; the keep decision is the same md5-threshold
    * row predicate as [[stratifiedSample]] (reproducible across
    * engines, partitionings and cluster sizes, pushes to the scan).
    * Returns the kept rows with their stratum rate attached. */
  def temperatureMix(
      docs: DataFrame,
      strataCol: String,
      alpha: Double,
      salt: String = "mix"): DataFrame = {
    // rate_i ∝ n_i^(α−1), normalized to max 1 — then expected kept
    // count n_i·rate_i ∝ n_i^α, the temperature-scaled share
    val counts = docs.groupBy(strataCol)
      .agg(count(lit(1)).cast("double").as("n"))
      .withColumn("w", pow(col("n"), lit(alpha - 1.0)))
    val maxW = counts.agg(max(col("w")).as("max_w"))
    val rates = counts.crossJoin(broadcast(maxW))
      .select(col(strataCol), trunc6(col("w") / col("max_w")).as("rate"))
    val keyCol = md5LongSalted(col("doc_id").cast("string"), salt)
      .mod(1000000L).cast("double")
    // pass every input column through (plus the stratum's rate) so the
    // mix composes into pipelines — the registered query projects. An
    // input "rate" column (e.g. a re-mix of this operator's own output)
    // is superseded, not duplicated into an ambiguous pair.
    docs.join(broadcast(rates.withColumnRenamed("rate", "__mix_rate")), strataCol)
      .filter(keyCol < col("__mix_rate") * 1000000d)
      .select(docs.columns.filterNot(_ == "rate").map(col)
        :+ col("__mix_rate").as("rate"): _*)
      .orderBy("doc_id")
  }

  /** The full training-export pipeline in one plan — what a user runs
    * to turn raw documents into trainer-ready rows: [[cleanCorpus]]
    * (lang/quality/repetition filters, deterministic sample, PII
    * redaction, first-wins dedup) → [[temperatureMix]] (α-scaled
    * source balancing) → [[packSequences]] (contiguous ~seqTokens
    * training rows). Each stage is the already-oracle-checked operator;
    * the dedup cut rides the heap operator, the mix join broadcasts,
    * the pack is the prefix sum. The cleaned frame is MATERIALIZED
    * once (eager localCheckpoint — the same pinning shardByTokens
    * uses): the mix's stratum-count aggregation and the main path both
    * read it, instead of each re-running the scoring scan (measured 2×
    * on the whole pipeline; at warehouse scale this intermediate is
    * the natural durable checkpoint between recipe stages anyway). */
  def trainingExport(
      docs: DataFrame,
      markers: Map[String, Seq[String]],
      recipe: CleanRecipe,
      alpha: Double,
      seqTokens: Long,
      mixSalt: String = "mix"): DataFrame = {
    val cleaned = cleanCorpus(docs, markers, recipe).localCheckpoint(true)
    val mixed = temperatureMix(cleaned, "lang_guess", alpha, mixSalt)
    packSequences(mixed.select(col("doc_id"), col("redacted").as("text")), seqTokens)
  }

  /** Document fingerprint: md5 over the sorted distinct content tokens —
    * stable under token reordering and duplication. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(concat_ws(" ", array_sort(tokenSet(col("text"))))).as("fingerprint"))
      .orderBy("doc_id")

  /** Deterministic stratified sampling for corpus mixing: keep a row iff
    * md5_52(id|salt) mod 1e6 falls under its stratum's rate — the
    * standard reproducible subsample for pretraining-data recipes
    * ("keep 50% of en, 10% of low-quality, all of rare langs"). Unlike
    * `DataFrame.sample` this is a pure row-local predicate: stable
    * across runs, engines, partitionings and cluster sizes, and it
    * pushes down to the scan. Strata without an entry keep
    * `defaultRate`. */
  def stratifiedSample(
      docs: DataFrame,
      idCol: String,
      stratumCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0,
      salt: String = "s1"): DataFrame = {
    val rate = rates.toSeq.sortBy(_._1).foldRight(lit(defaultRate): Column) {
      case ((stratum, r), acc) => when(col(stratumCol) === stratum, lit(r)).otherwise(acc)
    }
    docs.filter(
      md5Long(concat(col(idCol).cast("string"), lit("|" + salt)))
        .mod(1000000L).cast("double") < rate * 1000000d)
  }

  /** Corpus-mixture report: per-stratum document/token counts and the
    * stratum's share of total tokens — the "what is this dataset made
    * of" table every mixing recipe starts from. */
  def mixtureReport(docs: DataFrame, strataCols: Seq[String]): DataFrame = {
    val keys = strataCols.map(col)
    val perStratum = docs
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text"))).cast("long")).as("n_tokens"))
    perStratum
      .withColumn("token_share", trunc6(
        col("n_tokens").cast("double") /
          sum(col("n_tokens")).over(org.apache.spark.sql.expressions.Window
            .partitionBy())))
      .orderBy(strataCols.map(col): _*)
  }

  /** The GPT-2-style pre-tokenizer regex (contractions, letter runs,
    * number runs, punctuation runs, whitespace), minus the `\s+(?!\S)`
    * lookahead which RE2-based engines can't express — portable between
    * the JVM and the SQL oracle. */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** A7 token counting, BPE-pre-tokenizer flavor: counts the regex
    * pre-tokenization pieces a BPE tokenizer would start from — a far
    * closer estimate of model token counts than whitespace words
    * (reference primary path is tiktoken, utils/token_counter.py:19-110;
    * exact BPE merges need the vocab file, which has no place in a
    * pure-engine build). */
  def bpeTokenCount(docs: DataFrame): DataFrame = {
    val pieces = regexp_extract_all(col("text"), lit(BpePattern), lit(0))
    docs.select(
      col("doc_id"),
      size(pieces).cast("long").as("n_bpe_pieces"),
      size(tokens(col("text"))).cast("long").as("n_ws_tokens"))
      .orderBy("doc_id")
  }

  /** Merge ranks of the SHIPPED BPE vocab (trained from scratch by the
    * committed `tools/TrainBpe` on public corpus text — the same
    * resource-file pattern as the trained weight tensors): line i
    * ("left right") has rank i+1; lower rank = earlier-learned = higher
    * merge priority. */
  lazy val BpeMergeRanks: Map[String, Int] = {
    val in = getClass.getResourceAsStream("/graft/bpe/merges.txt")
    require(in != null, "missing resource graft/bpe/merges.txt")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .zipWithIndex.map { case (l, i) => l -> (i + 1) }.toMap
    finally in.close()
  }

  /** Exact BPE symbol count of one whitespace-free piece core under a
    * merge-rank table: start from characters, repeatedly merge the
    * LEFTMOST occurrence of the lowest-ranked adjacent pair until no
    * adjacent pair is in the table, return the surviving symbol count.
    * Deterministic and mirrored verbatim by the q60 DuckDB oracle's
    * recursive CTE — the cross-engine-checkable BPE variant (merge-all-
    * occurrences-per-step converges to the same count on non-degenerate
    * tables but is far harder to express in SQL). Out-of-alphabet cores
    * simply never match a merge and shatter to characters — byte-level
    * BPE's behavior for unknown content. */
  private[graft] def bpeMergeCount(core: String, ranks: Map[String, Int]): Int = {
    if (core.isEmpty) return 0
    var syms = core.map(_.toString).toArray
    var done = false
    while (!done && syms.length >= 2) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse(syms(i) + " " + syms(i + 1), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPos = i }
        i += 1
      }
      if (bestPos < 0) done = true
      else syms = (syms.take(bestPos) :+ (syms(bestPos) + syms(bestPos + 1))) ++
        syms.drop(bestPos + 2)
    }
    syms.length
  }

  /** A7 token counting, EXACT-merge flavor: the real BPE merge loop over
    * the shipped vocab, closing the gap q50's pre-tokenizer estimate
    * leaves (reference utils/token_counter.py:19-110 — tiktoken with a
    * pretrained vocab; the vocab here is the committed trained table).
    * Per piece: pure-whitespace → 1 token; otherwise one optional
    * leading space folds into the word (the GPT-2 'Ġ' convention) and
    * the core runs [[bpeMergeCount]]. Row-local imperative kernel → a
    * Scala UDF (the merge loop is genuinely iterative; there is no
    * native-function spelling), still scan-speed with no shuffle. */
  def bpeExactTokenCount(docs: DataFrame): DataFrame = {
    val ranks = BpeMergeRanks
    // java.util.regex.Pattern is Serializable: compile once, ship in the closure
    val compiled = java.util.regex.Pattern.compile(BpePattern)
    val countUdf = udf { text: String =>
      if (text == null) 0L
      else {
        val m = compiled.matcher(text)
        var total = 0L
        while (m.find()) {
          val piece = m.group()
          total += (if (piece.trim.isEmpty) 1L
            else {
              val core = if (piece.startsWith(" ")) piece.substring(1) else piece
              bpeMergeCount(core, ranks).toLong
            })
        }
        total
      }
    }
    docs.select(col("doc_id"), countUdf(col("text")).as("n_tokens_exact"))
      .orderBy("doc_id")
  }

  /** Merge every non-overlapping (a, b) adjacency left to right — the
    * BPE training-side vocab update, shared by the local and distributed
    * trainers. */
  private[graft] def mergeAdjacent(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Round-0 BPE pair statistics: the weighted adjacent CHARACTER-pair
    * counts over the corpus's pre-tokenized word cores — the aggregation
    * a BPE trainer's first round maximizes, useful on its own as a
    * corpus-composition diagnostic. One scan (piece regex + char-pair
    * expansion are row-local) and ONE pair-keyed exchange with map-side
    * partial counts; top-k cuts through TakeOrdered. Ties break on the
    * pair string for a total order. */
  def bpePairStats(docs: DataFrame, topK: Int = 20): DataFrame =
    docs
      .select(explode(regexp_extract_all(col("text"), lit(BpePattern), lit(0))).as("piece"))
      .select(regexp_replace(col("piece"), "^ ", "").as("core"))
      .filter(col("core").rlike("^[\\p{L}\\p{N}]+$") && length(col("core")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(core) - 1), i -> substring(core, i, 2))")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(topK)

  /** Distributed BPE training (Sennrich et al. 2016) — the corpus-scale
    * twin of the committed local trainer (`graft.tools.TrainBpe`, which
    * collects text to the driver and fit the SHIPPED merge table): here
    * the weighted word vocab stays a DataFrame, so the vocab can be
    * billions of distinct cores. Merge-for-merge identical to the local
    * trainer on the same corpus (OperatorSpec pins 30 rounds).
    *
    * Cost shape: one corpus scan + one word-keyed exchange build the
    * vocab, and every training round is ONE job over that (far smaller)
    * vocab table — adjacent-pair expansion is row-local, the pair count
    * map-side-combines, and the argmax is a sorted limit(1) (count desc,
    * then pair string asc ≡ (left, right) lexicographic, since symbols
    * never contain spaces and ' ' sorts below every letter/digit). The
    * vocab update (replay pending merges per word) is a narrow map with
    * no job of its own; lineage is cut by an eager localCheckpoint every
    * `checkpointEvery` rounds (dropping the old generation's reference
    * lets the ContextCleaner reclaim its blocks). Stops early when no
    * pair reaches `minPairFreq` — same stop rule as the local trainer. */
  def bpeTrain(
      docs: DataFrame, numMerges: Int, minPairFreq: Long = 2,
      checkpointEvery: Int = 20): Seq[(String, String)] = {
    var base = docs
      .select(explode(regexp_extract_all(col("text"), lit(BpePattern), lit(0))).as("piece"))
      .select(regexp_replace(col("piece"), "^ ", "").as("core"))
      .filter(col("core").rlike("^[\\p{L}\\p{N}]+$"))
      .groupBy("core").agg(count(lit(1)).as("freq"))
      .select(expr("transform(sequence(1, length(core)), i -> substring(core, i, 1))")
        .as("syms"), col("freq"))
      .localCheckpoint()
    def applyPending(p: Seq[(String, String)]) = udf { syms: Seq[String] =>
      p.foldLeft(syms) { case (s, (a, b)) => mergeAdjacent(s, a, b) }
    }
    var pending = Vector.empty[(String, String)]
    val learned = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val symsNow =
        if (pending.isEmpty) col("syms") else applyPending(pending)(col("syms"))
      val best = base
        .select(symsNow.as("s"), col("freq"))
        .filter(size(col("s")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(s) - 1), " +
            "i -> concat_ws(' ', element_at(s, i), element_at(s, i + 1)))")).as("pair"),
          col("freq"))
        .groupBy("pair").agg(sum("freq").as("cnt"))
        .filter(col("cnt") >= minPairFreq)
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1)
        .collect()
      if (best.isEmpty) done = true
      else {
        val Array(a, b) = best(0).getString(0).split(" ", 2)
        pending :+= ((a, b))
        learned += ((a, b))
        round += 1
        if (pending.size >= checkpointEvery) {
          base = base.withColumn("syms", applyPending(pending)(col("syms")))
            .localCheckpoint()
          pending = Vector.empty
        }
      }
    }
    learned.result()
  }

  /** The language guess of one text column: argmax marker-hit share,
    * ties to the alphabetically first language, "und" when every score
    * is zero — the exact semantics of [[languageId]]'s when-chain, but
    * each score evaluates ONCE: the (score, -rank, lang) structs go
    * through one `array_max`, whose struct comparison breaks score ties
    * toward the earliest language (larger -rank = earlier). The
    * when-chain form re-evaluates every score O(langs²) times, which
    * dominates the cleaning recipe's scan. */
  private[graft] def langGuessExpr(t: Column, markers: Map[String, Seq[String]]): Column = {
    val toks = tokens(t)
    val langs = markers.keys.toSeq.sorted
    val entries = langs.zipWithIndex.map { case (lang, i) =>
      struct(
        (size(array_intersect(toks, lit(markers(lang).toArray))).cast("double") /
          size(toks)).as("s"),
        lit(-i).as("nr"),
        lit(lang).as("l"))
    }
    val top = array_max(array(entries: _*))
    when(top.getField("s") > 0d, top.getField("l")).otherwise(lit("und"))
  }

  /** One corpus-cleaning recipe: thresholds compare the SAME trunc6'd
    * values the standalone operators report, so a recipe replays
    * exactly from their outputs. */
  case class CleanRecipe(
      langs: Seq[String],
      minQuality: Double,
      maxRepRatio: Double,
      sampleRate: Double,
      salt: String = "clean")

  /** Ordered row-local stage predicates of a recipe: language allowlist,
    * quality floor, repetition ceiling, deterministic rate sample. */
  private[graft] def stagePreds(
      markers: Map[String, Seq[String]], recipe: CleanRecipe): Seq[Column] = Seq(
    langGuessExpr(col("text"), markers).isin(recipe.langs: _*),
    qualityExpr(col("text")) >= recipe.minQuality,
    repRatioExpr(col("text")) <= recipe.maxRepRatio,
    md5Long(concat(col("doc_id").cast("string"), lit("|" + recipe.salt)))
      .mod(1000000L).cast("double") < recipe.sampleRate * 1000000d)

  private[graft] def redactedExpr(t: Column): Column =
    regexp_replace(regexp_replace(t, PhonePattern, "[PHONE]"),
      EmailPattern, "[EMAIL]")

  /** The full cleaning pass every pretraining recipe runs (C4/Gopher
    * lineage): language allowlist → quality floor → repetition ceiling →
    * deterministic rate sample → PII redaction → exact dedup (smallest
    * doc id per redacted content wins). Every filter is a row-local
    * expression, so the whole recipe evaluates in ONE scan pass; the
    * only shuffle is the dedup's content-hash partition. Returns the
    * surviving (doc_id, lang_guess, redacted) rows. */
  def cleanCorpus(
      docs: DataFrame,
      markers: Map[String, Seq[String]],
      recipe: CleanRecipe): DataFrame = {
    // Score once in a PROJECTION, filter on the named columns. The
    // barrier column (nondeterministic) stops predicate pushdown from
    // substituting the scoring expressions back into a single monster
    // filter condition — which blows past codegen size limits and
    // re-evaluates the tokenization per reference (measured 20× slower
    // than this two-step plan at sf0.1). The barrier never reaches the
    // output and the result is bit-identical.
    val preds = stagePreds(markers, recipe)
    val scored = docs
      .select(col("doc_id"), col("text"),
        langGuessExpr(col("text"), markers).as("lang_guess"),
        preds(1).as("__q"), preds(2).as("__r"), preds(3).as("__s"))
      .withColumn("__barrier", monotonically_increasing_id())
    val survivors = scored
      .filter(col("__s") && col("lang_guess").isin(recipe.langs: _*) &&
        col("__q") && col("__r"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(contentHash(col("redacted"))).orderBy(col("doc_id"))
    survivors
      .withColumn("redacted", redactedExpr(col("text")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("lang_guess"), col("redacted"))
      .orderBy("doc_id")
  }

  /** The recipe's audit report in ONE aggregation pass: survivors of
    * each stage prefix (what did each filter cost me) plus the final
    * post-dedup distinct count — the per-stage drop table every data
    * recipe publishes. */
  def cleanReport(
      docs: DataFrame,
      markers: Map[String, Seq[String]],
      recipe: CleanRecipe): DataFrame = {
    // stage flags evaluate ONCE per row in a projection (barrier blocks
    // re-substitution into the aggregate — see cleanCorpus); the
    // aggregation then counts booleans
    val ps = stagePreds(markers, recipe)
    val flags = docs
      .select(ps(0).as("p1"), ps(1).as("p2"), ps(2).as("p3"), ps(3).as("p4"),
        when(ps.reduce(_ && _), contentHash(redactedExpr(col("text")))).as("h"))
      .withColumn("__barrier", monotonically_increasing_id())
    flags.agg(
      count(lit(1)).as("n_total"),
      count(when(col("p1"), 1)).as("n_lang"),
      count(when(col("p1") && col("p2"), 1)).as("n_quality"),
      count(when(col("p1") && col("p2") && col("p3"), 1)).as("n_repetition"),
      count(when(col("p1") && col("p2") && col("p3") && col("p4"), 1)).as("n_sampled"),
      countDistinct(col("h")).as("n_deduped"))
  }

  /** N-gram-frequency language ID heuristic: score each candidate language
    * by the share of tokens that hit its marker set; argmax with
    * deterministic tie-break on language name. */
  def languageId(docs: DataFrame, markers: Map[String, Seq[String]]): DataFrame = {
    val toks = tokens(col("text"))
    val scoreCols = markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      (size(array_intersect(toks, lit(words.toArray))).cast("double") /
        size(toks)).as(s"score_$lang")
    }
    val scored = docs.select((col("doc_id") +: col("text") +: scoreCols): _*)
    // argmax via greatest + chained when: deterministic, SQL-portable
    val langs = markers.keys.toSeq.sorted
    val best = langs.map(l => col(s"score_$l")).reduce((a, b) => greatest(a, b))
    // first (alphabetically) language reaching the max wins ties: a
    // right-fold builds the when-chain with the first language tested
    // first, so no self-referential acc comparison is needed
    val pickFirst = langs.foldRight(lit("und")) { (l, acc) =>
      when(col(s"score_$l") === best && best > 0d, lit(l)).otherwise(acc)
    }
    scored.select(
      col("doc_id"),
      pickFirst.as("lang_guess"),
      trunc6(best).as("lang_score"))
      .orderBy("doc_id")
  }

  /** Total n-gram count — pure arithmetic on the token count (the gram
    * list itself is never built): len−n+1 when len ≥ n, else 0. */
  private def nGramsTotal(t: Column, n: Int): Column = {
    val len = size(tokens(t))
    when(len >= n, len - n + 1).otherwise(lit(0))
  }

  /** The trunc6'd n-gram repetition ratio of one text column (shared by
    * [[repetitionRatio]] and the cleaning recipe): distinct grams from
    * the compiled [[graft.functions.NGramDistinct]] kernel, total grams
    * from token arithmetic. */
  private[graft] def repRatioExpr(t: Column, n: Int = 3): Column = {
    val total = nGramsTotal(t, n)
    trunc6(when(total > 0,
      lit(1.0) - size(ngramsDistinct(tokens(t), n)).cast("double") /
        total.cast("double"))
      .otherwise(lit(0.0)))
  }

  /** N-gram repetition ratio (the Gopher/C4-style "repetitious text"
    * quality filter): 1 − distinct/total word n-grams per document.
    * Pure narrow projection, no explode, no shuffle: the distinct-gram
    * set builds in one compiled loop per row. */
  def repetitionRatio(docs: DataFrame, n: Int = 3): DataFrame =
    docs
      .select(
        col("doc_id"),
        nGramsTotal(col("text"), n).cast("long").as("n_grams"),
        size(ngramsDistinct(tokens(col("text")), n)).cast("long").as("n_distinct"),
        repRatioExpr(col("text"), n).as("rep_ratio"))
      .orderBy("doc_id")

  /** The Gopher quality-rule battery (Rae et al. 2021, "Scaling
    * Language Models: Methods, Analysis & Insights from Training
    * Gopher", Table A1): per-document structural signals and a keep
    * decision. Every signal is row-local (split + higher-order array
    * functions inside whole-stage codegen) — the whole battery is a
    * scan-speed projection with NO shuffle, which is what lets it run
    * first in a 100 TB cleaning pipeline, ahead of anything that
    * exchanges data.
    *
    * Signals (document-local forms of the published rules):
    *  - `n_words`, bounds [minWords, maxWords]
    *  - `mean_word_len`, bounds [minMeanWordLen, maxMeanWordLen]
    *  - `dup_word_frac` = 1 − distinct/total words (repetition),
    *    bound ≤ maxDupWordFrac
    *  - `top_bigram_frac` = occurrences of the most frequent adjacent
    *    word pair / (n_words − 1), bound ≤ maxTopBigramFrac
    *  - `stop_hits` = how many of the 10 Gopher stop words appear,
    *    bound ≥ minStopHits
    */
  final case class GopherRules(
      minWords: Int = 25, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxDupWordFrac: Double = 0.6, maxTopBigramFrac: Double = 0.10,
      minStopHits: Int = 1)

  /** The Gopher rule paper's stop-word list ("the, be, to, of, and,
    * that, have, with" + the articles the synthetic corpus carries). */
  val GopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with", "a", "in")

  def gopherQuality(docs: DataFrame,
      rules: GopherRules = GopherRules()): DataFrame = {
    val words = split(col("text"), " ")
    val nWords = size(words)
    // mode count of the adjacent-word bigrams through the compiled
    // NGramModeCount kernel — one hash-count loop per row. The
    // declarative forms are row-locally correct but interpret per
    // element (see the expression's scaladoc for the measured cliff)
    val topBigramCount = ngramModeCount(words, 2)
    // Σ word lengths ≡ len(text) − (nWords − 1): splitting on a single
    // char partitions the string exactly, so the per-element aggregate
    // lambda (interpreted) collapses to codegen'd integer arithmetic
    val meanLen = trunc6(
      (length(col("text")) - (nWords - 1)).cast("double") / nWords)
    val dupFrac = trunc6(lit(1.0) -
      size(array_distinct(words)).cast("double") / nWords)
    // distinct stop words present — array_intersect is a codegen'd
    // collection op where the filter(array_contains) lambda re-splits
    // the text once PER STOP WORD (lambda bodies defeat CSE)
    val stopHits = size(array_intersect(
      typedlit(GopherStopWords), words)).cast("long")
    docs
      .select(
        col("doc_id"),
        nWords.cast("long").as("n_words"),
        meanLen.as("mean_word_len"),
        dupFrac.as("dup_word_frac"),
        when(nWords >= 2,
          trunc6(topBigramCount.cast("double") / (nWords - 1)))
          .otherwise(lit(0.0)).as("top_bigram_frac"),
        stopHits.as("stop_hits"))
      .withColumn("keep",
        col("n_words").between(rules.minWords, rules.maxWords) &&
          col("mean_word_len").between(rules.minMeanWordLen, rules.maxMeanWordLen) &&
          col("dup_word_frac") <= rules.maxDupWordFrac &&
          col("top_bigram_frac") <= rules.maxTopBigramFrac &&
          col("stop_hits") >= rules.minStopHits)
      .orderBy("doc_id")
  }

  /** PII patterns redacted by [[redactPii]]: NANP-style phone numbers
    * (the TPC-H c_phone shape) and email addresses. RE2-safe (no
    * lookaround), so the same patterns run in Spark, DuckDB and the
    * reference's Python. */
  val PhonePattern = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** PII scrubbing for training corpora: replace phone/email spans with
    * typed placeholders and count what was redacted (audit trail).
    * Row-local regex work — scan speed, no shuffle. */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df
      .withColumn("redacted",
        regexp_replace(regexp_replace(t, PhonePattern, "[PHONE]"),
          EmailPattern, "[EMAIL]"))
      .withColumn("n_redacted",
        ((size(split(t, PhonePattern)) - 1) +
          (size(split(t, EmailPattern)) - 1)).cast("long"))
  }

  /** Top-k collocations by pointwise mutual information (Church &
    * Hanks 1990): adjacent bigrams scored by how much more often the
    * pair occurs than chance, `ln(n_ab·N·N / (M·n_a·n_b))` in one
    * product-form log so both engines evaluate one IEEE expression.
    * Two vocabulary-sized aggregations + two broadcast-sized joins
    * (unigram counts onto bigram counts) — scan-dominated at 100 TB;
    * the min-count floor keeps the rare-pair noise (PMI's classic
    * failure mode) out of the ranking. */
  def pmiCollocations(docs: DataFrame, minCount: Int = 5,
      topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tk = docs.select(tokens(col("text")).as("t"))
    val uni = tk.select(explode(col("t")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n_term"))
    val uniTotal = uni.agg(sum(col("n_term")).as("n_total"))
    // sequence(1, 0) is DESCENDING in Spark — guard 1-token docs
    val bigAll = tk.filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), " +
          "i -> concat(t[i - 1], ' ', t[i]))")).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n_ab"))
    // M counts ALL bigram occurrences (the PMI denominator), so the
    // min-count floor only prunes the ranking, never shifts the scores
    val bigTotal = bigAll.agg(sum(col("n_ab")).as("m_total"))
    val big = bigAll.filter(col("n_ab") >= minCount)
    val d = (c: String) => col(c).cast("double")
    val scored = big
      .withColumn("term_a", split(col("bigram"), " ").getItem(0))
      .withColumn("term_b", split(col("bigram"), " ").getItem(1))
      .join(broadcast(uni.toDF("term_a", "n_a")), "term_a")
      .join(broadcast(uni.toDF("term_b", "n_b")), "term_b")
      .crossJoin(broadcast(uniTotal)).crossJoin(broadcast(bigTotal))
      .withColumn("pmi", trunc6(log(
        d("n_ab") * d("n_total") * d("n_total") /
          (d("m_total") * d("n_a") * d("n_b")))))
    val w = Window.orderBy(col("pmi").desc, col("bigram"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("rank"), col("bigram"), col("n_ab"), col("pmi"))
      .orderBy("rank")
  }

  /** Next-token conditional distribution for the hottest contexts: the
    * bigram-LM view `P(next | context) = n_ab / Σ_b n_ab` for the
    * `topContexts` most frequent context terms, top `topNext`
    * continuations each — the quick-look table behind perplexity
    * debugging and boilerplate detection (a context whose top
    * continuation owns ~all its mass is template text). One bigram
    * aggregation reused for both the context totals and the
    * continuations; ranking windows run over vocabulary-sized frames. */
  def nextTokenDistribution(docs: DataFrame, topContexts: Int = 5,
      topNext: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val big = docs.select(tokens(col("text")).as("t"))
      // sequence(1, 0) is DESCENDING in Spark — guard 1-token docs
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), " +
          "i -> struct(t[i - 1] AS ctx, t[i] AS nxt))")).as("p"))
      .groupBy(col("p.ctx").as("ctx"), col("p.nxt").as("nxt"))
      .agg(count(lit(1)).as("n_ab"))
    val ctxTot = big.groupBy("ctx").agg(sum(col("n_ab")).as("n_ctx"))
    val wCtx = Window.orderBy(col("n_ctx").desc, col("ctx"))
    val hot = ctxTot.withColumn("crank", row_number().over(wCtx).cast("long"))
      .filter(col("crank") <= topContexts)
    val wNxt = Window.partitionBy("ctx")
      .orderBy(col("n_ab").desc, col("nxt"))
    big.join(broadcast(hot), "ctx")
      .withColumn("rank", row_number().over(wNxt).cast("long"))
      .filter(col("rank") <= topNext)
      .select(col("crank"), col("ctx"), col("rank"), col("nxt"), col("n_ab"),
        trunc6(col("n_ab").cast("double") / col("n_ctx").cast("double"))
          .as("p"))
      .orderBy("crank", "rank")
  }

  /** Jensen–Shannon divergence between the unigram distributions of two
    * corpus halves (Lin 1991) — the dataset-shift detector run before
    * mixing a new crawl into a training recipe. Per-term contributions
    * use the 0·ln0 = 0 convention (a term absent from one half
    * contributes only through the other half's KL term), summed on the
    * 12-decimal decimal grid so the reduction is order-independent
    * across partitions. Two vocabulary-sized aggregations + one
    * full-outer join; nothing corpus². */
  def corpusDivergence(docs: DataFrame, splitCol: Column): DataFrame = {
    val tk = docs.select(splitCol.as("half"),
      explode(tokens(col("text"))).as("term"))
    val cnt = tk.groupBy("half", "term").agg(count(lit(1)).as("n"))
    val a = cnt.filter(col("half") === 0).select(col("term"), col("n").as("n_a"))
    val b = cnt.filter(col("half") === 1).select(col("term"), col("n").as("n_b"))
    val tot = cnt.groupBy("half").agg(sum(col("n")).as("t"))
    val totA = tot.filter(col("half") === 0).select(col("t").as("tokens_a"))
    val totB = tot.filter(col("half") === 1).select(col("t").as("tokens_b"))
    val joined = a.join(b, Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .crossJoin(broadcast(totA)).crossJoin(broadcast(totB))
    val p = col("n_a").cast("double") / col("tokens_a").cast("double")
    val q = col("n_b").cast("double") / col("tokens_b").cast("double")
    val m = (p + q) / lit(2.0)
    val contrib =
      (when(col("n_a") > 0, p * log(p / m)).otherwise(lit(0.0)) +
        when(col("n_b") > 0, q * log(q / m)).otherwise(lit(0.0))) * lit(0.5)
    val ln2 = java.lang.Math.log(2.0)
    joined
      .agg(
        count(when(col("n_a") > 0, 1)).as("n_terms_a"),
        count(when(col("n_b") > 0, 1)).as("n_terms_b"),
        count(when(col("n_a") > 0 && col("n_b") > 0, 1)).as("n_shared"),
        max(col("tokens_a")).as("tokens_a"),
        max(col("tokens_b")).as("tokens_b"),
        dsum12(contrib).as("jsd_raw"))
      .select(col("n_terms_a"), col("n_terms_b"), col("n_shared"),
        col("tokens_a"), col("tokens_b"),
        trunc6(col("jsd_raw")).as("jsd"),
        trunc6(col("jsd_raw") / lit(ln2)).as("jsd_bits"))
  }

  /** Per-group distinguishing terms by weighted log-odds-ratio with an
    * informative Dirichlet prior (Monroe, Colaresi & Quinn 2008,
    * "Fightin' Words") — each language's top terms vs the rest of the
    * corpus, z-scored so rare-term variance is priced in (the failure
    * mode of raw tf-idf contrast). The prior α_w follows corpus
    * frequency scaled to total mass α0. One (group × term) aggregation
    * joined to broadcast-sized vocabulary and group totals — no
    * corpus-sized shuffle beyond the first count. */
  def fightinWords(docs: DataFrame, groupCol: String, alpha0: Double = 500.0,
      minCount: Int = 3, topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tk = docs.select(col(groupCol).as("grp"),
      explode(tokens(col("text"))).as("term"))
    val byGrp = tk.groupBy("grp", "term").agg(count(lit(1)).as("y_wi"))
    val corpus = byGrp.groupBy("term").agg(sum(col("y_wi")).as("y_w"))
    val grpTot = byGrp.groupBy("grp").agg(sum(col("y_wi")).as("n_i"))
    val allTot = corpus.agg(sum(col("y_w")).as("n"))
    val d = (c: String) => col(c).cast("double")
    val a0 = lit(alpha0)
    val scored = byGrp.filter(col("y_wi") >= minCount)
      .join(broadcast(corpus), "term")
      .join(broadcast(grpTot), "grp")
      .crossJoin(broadcast(allTot))
      .withColumn("aw", a0 * d("y_w") / d("n"))
      .withColumn("delta",
        log((d("y_wi") + col("aw")) /
            (d("n_i") + a0 - d("y_wi") - col("aw"))) -
          log((d("y_w") - d("y_wi") + col("aw")) /
              (d("n") - d("n_i") + a0 - (d("y_w") - d("y_wi")) - col("aw"))))
      .withColumn("z", trunc6(col("delta") /
        sqrt(lit(1.0) / (d("y_wi") + col("aw")) +
          lit(1.0) / (d("y_w") - d("y_wi") + col("aw")))))
    val w = Window.partitionBy("grp").orderBy(col("z").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("grp"), col("rank"), col("term"), col("y_wi"), col("z"))
      .orderBy("grp", "rank")
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
    * the word co-occurrence graph — vertices are content tokens
    * (stop-words removed), undirected edges link tokens ADJACENT in the
    * filtered sequence (window 2) that co-occur ≥ `minPairs` times
    * corpus-wide; the support floor is the hub cap that keeps wedge
    * fan-out bounded. Same iteration plan as [[GraphOps.pageRank]]
    * (one src join + one decimal-summed aggregation per unrolled
    * round) but keyed by the token STRING — no id remapping pass.
    * The pair fan-out is row-local; everything after the first count
    * is vocabulary-sized. */
  def textRank(docs: DataFrame, iters: Int = 5, damping: Double = 0.85,
      minPairs: Long = 2, topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val und = docs.select(contentTokens(col("text")).as("t"))
      // sequence(1, 0) is DESCENDING in Spark — guard 1-token docs
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), " +
          "i -> struct(least(t[i - 1], t[i]) AS a, greatest(t[i - 1], t[i]) AS b))"))
        .as("p"))
      .filter(col("p.a") =!= col("p.b"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minPairs)
    val e = und.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(und.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).localCheckpoint()
    val nV = lit(deg.count())
    val ed = e.join(deg, "src")
    var ranks = deg.select(col("src").as("v"))
      .select(col("v"), (lit(1.0) / nV).as("rank"))
    for (_ <- 1 to iters) {
      ranks = ed.join(ranks.select(col("v").as("src"), col("rank")), "src")
        .select(col("dst").as("v"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("v").agg(dsum12(col("c")).as("s"))
        .select(col("v"),
          ((lit(1.0) - lit(damping)) / nV +
            lit(damping) * col("s")).as("rank"))
    }
    ranks
      .withColumn("pos", row_number().over(
        Window.orderBy(col("rank").desc, col("v"))).cast("long"))
      .filter(col("pos") <= topK)
      .select(col("pos"), col("v").as("term"), trunc6(col("rank")).as("score"))
      .orderBy("pos")
  }

  /** Good–Turing frequency re-estimation over the corpus vocabulary
    * (Good 1953): from the frequency-of-frequencies table S(r), the
    * smoothed count r* = (r+1)·S(r+1)/S(r) for the low-count band —
    * the "how much mass do rare words really deserve" correction that
    * prices unseen-vocabulary probability (S(1)/N, readable from the
    * r=1 row). Two grouped counts (term, then count-of-counts); the
    * S-table is count-band-sized, so everything past the term count is
    * free at any scale. */
  def goodTuring(docs: DataFrame, maxR: Int = 5): DataFrame = {
    // bigram events: unigram counts in a synthetic corpus never reach
    // the low-count band, bigrams have a genuine rare tail (the Katz
    // backoff context GT was built for); adjacent bands absent from
    // the S-table drop out of the inner join (r* undefined there)
    val tf = docs.select(tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), " +
          "i -> concat(t[i - 1], ' ', t[i]))")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("r"))
    val ff = tf.groupBy("r").agg(count(lit(1)).as("n_r"))
      .localCheckpoint()
    val tot = ff.agg(sum(col("r") * col("n_r")).as("n_tokens"))
    val nxt = ff.select((col("r") - 1L).as("r"), col("n_r").as("n_r1"))
    ff.join(nxt, "r")
      .filter(col("r") <= maxR)
      .crossJoin(broadcast(tot))
      .select(col("r"), col("n_r"), col("n_r1"), col("n_tokens"),
        trunc6((col("r") + 1L).cast("double") * col("n_r1").cast("double") /
          col("n_r").cast("double")).as("r_star"))
      .orderBy("r")
  }

  /** Packing-budget sweep: sequences, overflow count and mean fill at
    * every budget in one report — all arms derive from ONE
    * token-start-offset frame (the two-phase prefix sum runs once,
    * checkpointed; each budget's shard is integer division on the
    * shared offsets, exactly the SQL twin's single cum CTE). */
  def packingSweep(docs: DataFrame, budgets: Seq[Long]): DataFrame = {
    val offsets = tokenStartOffsets(docs).localCheckpoint()
    budgets.map { b =>
      offsets
        .select(expr(s"start div $b").as("shard"), col("n_tokens"))
        .groupBy("shard").agg(sum(col("n_tokens")).as("seq_tokens"))
        .agg(count(lit(1)).as("n_seqs"),
          sum(col("seq_tokens")).as("total_tokens"),
          sum(when(col("seq_tokens") > b, 1L).otherwise(0L))
            .as("n_overflow"))
        .select(lit(b).as("budget"), col("n_seqs"), col("total_tokens"),
          col("n_overflow"),
          trunc6(col("total_tokens").cast("double") /
            (col("n_seqs").cast("double") * lit(b.toDouble)))
            .as("mean_fill"))
    }.reduce(_ unionByName _).orderBy("budget")
  }

  /** Consecutive-duplicate token audit — what a stutter-collapse
    * cleaning pass (the C4 whitespace/repetition trim) would remove,
    * rolled up per language. Row-local array lambda (Spark's 0-based
    * indexing mirrors the twin's 1-based list form shifted by one),
    * one lang-keyed aggregation; single-token docs contribute zero by
    * the explicit CASE (Spark's sequence(1, 0) DESCENDS — never build
    * it). */
  def stutterAudit(docs: DataFrame): DataFrame = {
    val d = (c: String) => col(c).cast("double")
    docs.select(col("lang"), tokens(col("text")).as("t"))
      .select(col("lang"), size(col("t")).cast("long").as("n"),
        when(size(col("t")) >= 2,
          expr("size(filter(transform(sequence(1, size(t) - 1), " +
            "i -> t[i] = t[i - 1]), x -> x))").cast("long"))
          .otherwise(lit(0L)).as("s"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"),
        sum(col("s")).as("n_stutter"))
      .withColumn("stutter_rate",
        trunc6(d("n_stutter") / d("n_tokens")))
      .orderBy("lang")
  }
}
