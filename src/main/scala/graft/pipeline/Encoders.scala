package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Pluggable embedding encoder stage (reference: rag/encode/base.py
  * registry + rag/encode/MiniLM.py SentenceTransformer wrapper, K9).
  *
  * The production path is a broadcast ONNX session driven from
  * `mapPartitions` — each partition encodes its rows in batches, so the
  * work distributes across executors with no shuffle and no driver
  * round-trip. Model inference libraries are not available in this
  * environment, so the shipped implementation is [[HashingEncoder]]: the
  * same partition-parallel shape with a deterministic feature-hashing
  * kernel (tokens hashed into `dim` buckets, L2-normalized) standing in
  * for the model forward pass.
  */
trait TextEncoder extends Serializable {
  def dim: Int
  /** Encode one text — used for query-time single encodes. */
  def encodeOne(text: String): Array[Float]

  /** Add an `embedding` array<float> column derived from `textCol` —
    * partition-parallel, the same `mapPartitions` shape a real ONNX
    * encoder uses (batch per partition, no shuffle). */
  def encode(df: DataFrame, textCol: String): DataFrame = {
    val enc = this
    val outSchema = df.schema.add("embedding", ArrayType(FloatType, containsNull = false))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ enc.encodeOne(r.getString(idx)).toSeq)
      }
    }(encoder)
  }
}

/** Deterministic feature-hashing encoder: token counts hashed into `dim`
  * buckets with a signed hash, L2-normalized. Embeds semantically-similar
  * (token-overlapping) texts near each other, which is exactly what the
  * retrieval tests need, and is reproducible across runs/engines. */
case class HashingEncoder(dim: Int = Schemas.EmbeddingDim) extends TextEncoder {

  def encodeOne(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    text.split(" ").foreach { tok =>
      if (tok.nonEmpty) {
        val h = scala.util.hashing.MurmurHash3.stringHash(tok, 42)
        val bucket = math.floorMod(h, dim)
        val sign = if (((h >>> 31) & 1) == 0) 1f else -1f
        v(bucket) += sign
      }
    }
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (norm > 0) v.map(x => (x / norm).toFloat) else v
  }
}

/** Fixed-weight random-projection encoder — the closest stand-in for a
  * real model this dependency-free build can ship (and a step up in
  * honesty from token hashing): a frozen, seed-derived dense layer
  * W[dim×featDim] maps a hashed bag-of-tokens feature vector through
  * tanh, L2-normalized. The compute is a genuine per-row matrix-vector
  * product with broadcast-once weights inside `mapPartitions` — exactly
  * the shape of an ONNX session forward pass (reference
  * rag/encode/MiniLM.py), so swapping in real weights changes only the
  * kernel, not the distribution strategy. Deterministic across
  * executors: the weights regenerate from the fixed seed per JVM. */
case class RandomProjectionEncoder(
    dim: Int = Schemas.EmbeddingDim,
    featDim: Int = 256,
    seed: Long = 42L) extends TextEncoder {

  // frozen "model weights": regenerated deterministically per executor
  // instead of shipping tensors through the closure
  @transient private lazy val weights: Array[Array[Float]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(dim, featDim)((rnd.nextGaussian() / math.sqrt(featDim)).toFloat)
  }

  def encodeOne(text: String): Array[Float] = {
    val feat = new Array[Float](featDim)
    text.split(" ").foreach { tok =>
      if (tok.nonEmpty) {
        val h = scala.util.hashing.MurmurHash3.stringHash(tok, seed.toInt)
        feat(math.floorMod(h, featDim)) += (if (((h >>> 31) & 1) == 0) 1f else -1f)
      }
    }
    val w = weights
    val v = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      var acc = 0.0
      val row = w(i)
      var j = 0
      while (j < featDim) { acc += row(j) * feat(j); j += 1 }
      v(i) = math.tanh(acc).toFloat
      i += 1
    }
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (norm > 0) v.map(x => (x / norm).toFloat) else v
  }
}

/** Oracle-reproducible sign-hash encoder: token t lands in bucket
  * md5_52(t) % dim with sign from bit 6 of the same digest, counts left
  * UNNORMALIZED — every component is a small exact integer, and cosine is
  * scale-invariant, so a SQL oracle can rebuild the identical similarity
  * from md5() alone (DuckDB: CAST(concat('0x', substr(md5(t),1,13)) AS
  * BIGINT), bucket = h % dim, sign = ((h >> 6) & 1)). Used wherever a
  * correctness gate needs bit-exact cross-engine embeddings; the
  * murmur-based [[HashingEncoder]] stays the default runtime stub. */
case class Md5SignEncoder(dim: Int = Schemas.EmbeddingDim) extends TextEncoder {
  def encodeOne(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    text.split(" ").foreach { t =>
      if (t.nonEmpty) {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(t.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 13)
        val h = java.lang.Long.parseLong(hex, 16) // 52 bits, non-negative
        val b = (h % dim).toInt
        v(b) += (if (((h >> 6) & 1) == 0L) 1f else -1f)
      }
    }
    v
  }
}

/** Pluggable second-stage reranker (reference: rag/rerank/MiniLM.py
  * cross-encoder, K8). Production = broadcast cross-encoder model in
  * `mapPartitions` over (query, candidate) pairs; shipped stand-in scores
  * by normalized token overlap — deterministic, same plumbing. */
trait Reranker extends Serializable {
  def rerank(candidates: DataFrame, queryText: String, topK: Int): DataFrame
}

case class OverlapReranker() extends Reranker {
  /** candidates: must carry (id, content); returns (id, content,
    * rerank_score) top-k sorted desc with id tie-break. */
  def rerank(candidates: DataFrame, queryText: String, topK: Int): DataFrame = {
    val qTokens = queryText.split(" ").filter(_.nonEmpty).distinct
    candidates
      .withColumn("rerank_score",
        graft.functions.TextFunctions.trunc6(
          size(array_intersect(array_distinct(split(col("content"), " ")),
            lit(qTokens))).cast("double") / lit(qTokens.length.toDouble)))
      .orderBy(col("rerank_score").desc, col("id"))
      .limit(topK)
  }
}

/** Fixed-weight CROSS-encoder stand-in (K8): a frozen two-layer MLP
  * scores each (query, candidate) pair JOINTLY — the feature vector is
  * [feat(q) ; feat(c) ; feat(q)⊙feat(c)] so the model sees the
  * interaction, which is what distinguishes a cross-encoder from a
  * bi-encoder — computed per candidate row inside `mapPartitions` with
  * weights regenerated once per executor from the seed. This is the
  * exact distribution shape of the reference's MiniLM cross-encoder
  * (rag/rerank/MiniLM.py:26-240): swapping real weights in changes only
  * the forward function. Frozen-random weights score arbitrarily (shape,
  * not semantics), so [[OverlapReranker]] stays the default heuristic. */
case class ProjectionCrossEncoder(
    featDim: Int = 128,
    hidden: Int = 32,
    seed: Long = 7L) extends Reranker {

  @transient private lazy val weights: (Array[Array[Float]], Array[Float]) = {
    val rnd = new java.util.Random(seed)
    (Array.fill(hidden, 3 * featDim)(
      (rnd.nextGaussian() / math.sqrt(3.0 * featDim)).toFloat),
      Array.fill(hidden)((rnd.nextGaussian() / math.sqrt(hidden.toDouble)).toFloat))
  }

  private def feat(text: String): Array[Float] = {
    val f = new Array[Float](featDim)
    text.split(" ").foreach { tok =>
      if (tok.nonEmpty) {
        val h = scala.util.hashing.MurmurHash3.stringHash(tok, seed.toInt)
        f(math.floorMod(h, featDim)) += (if (((h >>> 31) & 1) == 0) 1f else -1f)
      }
    }
    val n = math.sqrt(f.map(x => x.toDouble * x).sum)
    if (n > 0) f.map(x => (x / n).toFloat) else f
  }

  /** One pairwise forward pass. */
  def score(query: String, candidate: String): Double = {
    val (w1, w2) = weights
    val fq = feat(query); val fc = feat(candidate)
    val joint = new Array[Float](3 * featDim)
    var j = 0
    while (j < featDim) {
      joint(j) = fq(j); joint(featDim + j) = fc(j)
      joint(2 * featDim + j) = fq(j) * fc(j)
      j += 1
    }
    var out = 0.0
    var i = 0
    while (i < hidden) {
      var acc = 0.0
      val row = w1(i)
      var k = 0
      while (k < 3 * featDim) { acc += row(k) * joint(k); k += 1 }
      out += w2(i) * math.tanh(acc)
      i += 1
    }
    math.tanh(out)
  }

  def rerank(candidates: DataFrame, queryText: String, topK: Int): DataFrame = {
    val self = this
    val outSchema = candidates.schema.add("rerank_score",
      org.apache.spark.sql.types.DoubleType)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val contentIdx = candidates.schema.fieldIndex("content")
    candidates.mapPartitions { rows =>
      rows.map { r =>
        val s = self.score(queryText, r.getString(contentIdx))
        Row.fromSeq(r.toSeq :+ math.floor(s * 1e6) / 1e6)
      }
    }(enc)
      .orderBy(col("rerank_score").desc, col("id"))
      .limit(topK)
  }
}
