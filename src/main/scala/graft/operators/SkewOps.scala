package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB path.
  *
  * AQE's skew-join handles most cases at runtime; salting is the
  * explicit fallback when one join key dominates (e.g. a boilerplate
  * near-dup bucket, a celebrity user): the hot side's key is split into
  * `salts` sub-keys and the small side is replicated `salts`×, so the
  * hot partition fans out across executors instead of pinning one.
  */
object SkewOps {

  /** Salted inner equi-join of `big` (skewed) with `small` on `key`.
    * Deterministic salting: the salt derives from a hash of the big
    * side's whole row key-set surrogate (`saltCol` expression), not from
    * rand(), so results are reproducible. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int,
      saltSource: String): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(col(saltSource)), lit(salts)).cast("int"))
    val replicatedSmall = small
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedBig
      .join(replicatedSmall, Seq(key, "_salt"))
      .drop("_salt")
  }

  /** Salted SELF-join for same-key pair generation (LSH/MinHash bucket
    * candidates): the right side gets a deterministic salt
    * hash(rightId) % salts, the left side is replicated `salts`× with a
    * partner column, and the join key becomes (keys..., partner) — a hot
    * bucket's pair workload spreads across `salts` join keys while
    * producing EXACTLY the same pairs (every right row's salt value is
    * covered by one left replica). Use when one bucket dominates
    * (boilerplate near-identical docs) and AQE's skew split isn't
    * enough. */
  def saltedSelfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      rightId: String,
      salts: Int): DataFrame = {
    val l = left.withColumn("_partner",
      explode(sequence(lit(0), lit(salts - 1))))
    val r = right.withColumn("_partner",
      pmod(xxhash64(col(rightId)), lit(salts)).cast("int"))
    l.join(r, keys :+ "_partner").drop("_partner")
  }

  /** Key-frequency profile: the driver-side check that decides whether a
    * key needs salting (top-n heaviest keys with counts). */
  def keyProfile(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(key)
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(topN)
}
