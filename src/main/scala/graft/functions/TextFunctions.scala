package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType}

/** Text primitives shared by keyword retrieval, BM25, dedup and the
  * text-analysis operators. Everything here is built from codegen'd
  * `org.apache.spark.sql.functions` so the hot path stays inside
  * whole-stage codegen, and everything is expressible 1:1 in the DuckDB
  * oracle SQL (string_split / md5 / list ops).
  */
object TextFunctions {

  /** Stop-word set used by buffer keyword retrieval
    * (reference: rag/retrieve/buffer.py:231-237). */
  val StopWords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "but", "in", "on", "at", "to", "for",
    "of", "with", "by", "is", "are", "was", "were", "be", "been", "being")

  /** Whitespace tokenization of already-normalized text. */
  def tokens(c: Column): Column = split(c, " ")

  /** Tokens with stop words removed (order-preserving, keeps duplicates). */
  def contentTokens(c: Column): Column =
    filter(tokens(c), t => !t.isin(StopWords: _*))

  /** Distinct query/content tokens minus stop words — set semantics, as in
    * the reference's word-overlap scorer. */
  def tokenSet(c: Column): Column = array_distinct(contentTokens(c))

  /** Exact-content fingerprint (reference: rag/retrieve/buffer.py:340 uses
    * hash(content); md5 here so the oracle matches bit-for-bit). */
  def contentHash(c: Column): Column = md5(c)

  /** First 52 bits of md5(s) as a non-negative Long — a portable,
    * engine-agnostic integer hash (DuckDB: CAST(concat('0x', substr(md5(s),
    * 1, 13)) AS BIGINT)). 13 hex digits = 52 bits, fits exactly in a
    * Double too, which keeps every consumer engine honest. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 13), 16, 10).cast(LongType)

  /** Salted md5-derived hash for MinHash-style signatures. */
  def md5LongSalted(c: Column, salt: String): Column =
    md5Long(concat(lit(salt + "|"), c))

  /** Portable 6-decimal truncation: floor(x·1e6)/1e6 is pure IEEE-double
    * arithmetic, bit-identical in Spark and DuckDB. (Spark's `round` goes
    * through BigDecimal.valueOf's shortest-decimal string — HALF_UP on
    * 0.1234565 even though the stored double is 0.12345649…, which a
    * multiply-based C round correctly rounds DOWN. Truncation dodges the
    * whole class of mismatch.) Scores are truncated BEFORE ranking so
    * top-k cuts agree across engines. */
  def trunc6(c: Column): Column =
    (floor(c * lit(1e6)) / lit(1e6)).cast(DoubleType)

  /** Exact big-sum helper: widen to DECIMAL(30,8) per row so the sum is
    * order-independent and matches the oracle exactly, then return Double.
    * Plain sum(double) differs between engines in the last ulps because
    * accumulation order differs.
    *
    * The decimal→double conversion goes through a STRING: both engines
    * parse decimal strings with correct rounding, whereas DuckDB's direct
    * DECIMAL→DOUBLE cast double-rounds through the int128 numerator and
    * can land 1 ulp away from Java's BigDecimal.doubleValue. */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(30, 8))).cast(StringType).cast(DoubleType)

  /** Order-independent sum of small per-row double scores at 12-decimal
    * resolution — for fusion/BM25 style Σ over a handful of irrational
    * doubles, where plain double summation is accumulation-order-dependent
    * across engines. */
  def dsum12(c: Column): Column =
    sum(c.cast(DecimalType(38, 12))).cast(StringType).cast(DoubleType)

  /** Exact average built from dsum / count — deterministic across engines. */
  def davg(c: Column): Column =
    (dsum(c) / count(c)).cast(DoubleType)
}
