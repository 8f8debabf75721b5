package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard. All hashes are md5-derived so every stage is
  * deterministic and engine-portable (no JVM-specific hash functions).
  *
  * Scale notes: exact dedup is one hash-shuffle. MinHash/LSH is the
  * standard band trick — the only shuffle keyed on raw doc content is the
  * per-band bucket join, whose fan-out is controlled by (bands, rows-per-
  * band); skewed buckets (boilerplate docs) would be salted or capped at
  * 100 TB. Candidate verification re-joins shingle sets only for candidate
  * pairs, never all pairs.
  */
object Dedup {

  /** Exact dedup by content hash (T5; reference rag/retrieve/buffer.py:334-343
    * dedups on hash(content)). One row per distinct content: the kept
    * (minimum) id and the number of copies. */
  def exact(docs: DataFrame): DataFrame =
    docs
      .groupBy(contentHash(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))

  /** Word n-gram shingles with positions, one row per (doc_id, shingle). */
  def shingles(docs: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val withTok = docs.select(
      col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
    val shingled = (1 until n).foldLeft(withTok.withColumn("sh", col("tok"))) {
      case (df, i) => df.withColumn("sh",
        concat_ws(" ", col("sh"), lead(col("tok"), i).over(w)))
    }
    // window results must be materialized as columns before filtering
    shingled
      .withColumn("last_tok", lead(col("tok"), n - 1).over(w))
      .filter(col("last_tok").isNotNull)
      .select(col("doc_id"), col("sh").as("shingle"))
      .distinct()
  }

  /** MinHash signature: `numHashes` 32-bit hash functions derived as hex
    * slices of ⌈numHashes/4⌉ salted md5s per shingle (md5 dominates the
    * cost, so 4 hash functions share one digest), then per-doc numeric
    * min — order-independent → exact and engine-portable. */
  def minhashSignature(sh: DataFrame, numHashes: Int): DataFrame = {
    val nMd5 = (numHashes + 3) / 4
    val withMd5 = sh.select(
      col("doc_id") +:
        (0 until nMd5).map(j =>
          md5(concat(lit(s"mh$j|"), col("shingle"))).as(s"m$j")): _*)
    val aggs = (0 until numHashes).map { i =>
      min(conv(substring(col(s"m${i / 4}"), (i % 4) * 8 + 1, 8), 16, 10)
        .cast("long")).as(s"mh$i")
    }
    withMd5.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash + LSH near-dup pairs, verified with exact shingle Jaccard.
    * numHashes = bands × rowsPerBand. Returns (doc_a, doc_b, jaccard). */
  def minhashLsh(
      docs: DataFrame,
      shingleSize: Int = 3,
      bands: Int = 4,
      rowsPerBand: Int = 2,
      jaccardThreshold: Double = 0.5): DataFrame = {
    val sh = shingles(docs, shingleSize).cache()
    val sig = minhashSignature(sh, bands * rowsPerBand)
    // one row per (doc, band): explode rather than a bands-way union so the
    // signature aggregation runs once, not `bands` times
    val bandStructs = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), concat_ws("|", cols: _*).as("bkey"))
    }
    val bandRows = sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
      .cache()
    val candidates = bandRows.as("x")
      .join(bandRows.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // exact verification: Jaccard over shingle sets, candidates only
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    minhashVerify(candidates, sh, counts, jaccardThreshold)
  }

  private def minhashVerify(
      candidates: DataFrame, sh: DataFrame, counts: DataFrame,
      threshold: Double): DataFrame = {
    val shA = sh.toDF("doc_a", "shingle")
    val shB = sh.toDF("doc_b", "shingle")
    val interCount = candidates
      .join(shA, "doc_a")
      .join(shB, Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_inter"))
    val cA = counts.toDF("doc_a", "n_a")
    val cB = counts.toDF("doc_b", "n_b")
    interCount
      .join(cA, "doc_a").join(cB, "doc_b")
      .withColumn("jaccard",
        trunc6(col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** SimHash over `bits` low bits of the portable token hash: per bit,
    * majority vote weighted by term frequency; returns (doc_id, simhash). */
  def simhash(docs: DataFrame, bits: Int = 16): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(tokens(col("text"))).as("tok"))
      .withColumn("h", md5Long(col("tok")))
    val bitCols = (0 until bits).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"b$i")
    }
    val votes = tok.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
    val sim = (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc + when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L)
    }
    votes.select(col("doc_id"), sim.as("simhash")).orderBy("doc_id")
  }

  /** Exact n-gram Jaccard similarity for all pairs of the given (pre-
    * filtered, small) docs — the quadratic baseline; LSH (above) is the
    * scale path. */
  def ngramJaccardPairs(
      docs: DataFrame, n: Int, threshold: Double): DataFrame = {
    val sh = shingles(docs, n)
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val shA = sh.toDF("doc_a", "shingle")
    val shB = sh.toDF("doc_b", "shingle")
    val inter = shA.join(shB, "shingle")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(counts.toDF("doc_a", "n_a"), "doc_a")
      .join(counts.toDF("doc_b", "n_b"), "doc_b")
      .withColumn("jaccard",
        trunc6(col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Embedding near-dup pairs: cosine ≥ threshold among all pairs (exact
    * quadratic baseline; the LSH/IVF path replaces this at scale). */
  def embeddingNearDups(embeddings: DataFrame, threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions
    val a = embeddings.select(col("vec_id").as("id_a"), col("embedding").as("e_a"))
    val b = embeddings.select(col("vec_id").as("id_b"), col("embedding").as("e_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("score", trunc6(VectorFunctions.cosine(col("e_a"), col("e_b"))))
      .filter(col("score") >= threshold)
      .select(col("id_a"), col("id_b"), col("score"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
