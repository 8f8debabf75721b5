package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql.{columnOf, expressionOf}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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

  /** DISTINCT space-joined word n-grams of a token array, first-occurrence
    * order — value-identical to `array_distinct(transform(sequence(...),
    * i => array_join(slice(toks, i+1, n), " ")))`, but built in ONE
    * compiled loop per row: lambda higher-order functions (transform/
    * slice/array_join) are interpreted PER ELEMENT in Spark, which made
    * gram-building the measured hot spot of every shingle operator
    * (~30× over this kernel on the bench corpus). */
  def ngramsDistinct(toks: Column, n: Int): Column =
    columnOf(NGramDistinct(expressionOf(toks), n))

  /** Max occurrences of any single word n-gram (the Gopher top-bigram
    * kernel) — one compiled hash-count pass; see [[NGramModeCount]]. */
  def ngramModeCount(toks: Column, n: Int): Column =
    columnOf(NGramModeCount(expressionOf(toks), n))

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

  /** Driver-side twin of [[dsum12]], bit-identical by construction —
    * for BOUNDED fixpoints (≤ alphabet-sized state spaces) that run on
    * the driver instead of as dozens of 25-row exchanges. Each term
    * follows Spark's double→decimal(38,12) cast exactly (shortest-
    * string BigDecimal, then HALF_UP at scale 12 — Decimal.set /
    * changePrecision), decimals sum exactly in any order, and the
    * result goes through the same decimal→string→double parse.
    * TrainedWeightsSpec-style pin: OperatorSpec asserts ≡ [[dsum12]]
    * on randomized inputs. */
  def dsum12Local(terms: Iterable[Double]): Double = {
    val s = terms.foldLeft(java.math.BigDecimal.ZERO) { (acc, t) =>
      acc.add(java.math.BigDecimal.valueOf(t)
        .setScale(12, java.math.RoundingMode.HALF_UP))
    }
    java.lang.Double.parseDouble(s.toString)
  }

  /** Exact average built from dsum / count — deterministic across engines. */
  def davg(c: Column): Column =
    (dsum(c) / count(c)).cast(DoubleType)

  /** Exact big-sum via SCALED LONGS — same semantics as [[dsum]] (each
    * row rounded half-up at the 8th decimal, then an order-free exact
    * sum) but ~2.7× faster: no per-row decimal cast (whose
    * BigDecimal-via-toString conversion dominates dsum's cost — measured
    * on TPC-H Q1: 1.61 s decimal vs 0.59 s scaled-long at sf0.1).
    *
    * Per row the value splits into floor(x) (exact long; x − floor(x)
    * is IEEE-exact for x ≥ 0) and floor(frac·1e8 + 0.5) (half-up at 8
    * decimals with NO rounding ties — floor of an IEEE sum is
    * bit-deterministic in every engine, unlike round()'s half-even/
    * half-up/shortest-string zoo). Both parts sum as plain longs in
    * whole-stage codegen. Range: int parts ≤ 4·10⁵ and frac parts
    * ≤ 10⁸ keep per-GROUP sums inside a long to ~10¹³ rows/group —
    * far past 100 TB. The final (int + frac/1e8) reassembly is one
    * deterministic double rounding, identical in both engines.
    * Requires c ≥ 0 (all the monetary/quantity columns it serves). */
  def xsum(c: Column): Column = {
    val intSum = sum(floor(c).cast(LongType)).cast(DoubleType)
    val fracSum = sum(floor((c - floor(c)) * lit(1e8) + lit(0.5)).cast(LongType))
      .cast(DoubleType)
    (intSum + fracSum / lit(1e8)).cast(DoubleType)
  }

  /** Exact scaled-long sum for NON-NEGATIVE per-row PRODUCTS up to
    * ~10¹¹ (price², qty·price, the moment power sums) at a 6-decimal
    * half-up grid — the [[xsum]] scheme with the integer part split
    * into million-base hi/lo longs so no accumulator overflows even at
    * ~10¹² rows/group: per-row hi ≤ 10⁵, lo < 10⁶, frac ≤ 10⁶ each sum
    * as plain longs in whole-stage codegen, where the DECIMAL(38,12)
    * cast this replaces pays a per-row BigDecimal round-trip. The hi/lo
    * split is integer-exact ((vi − vi mod 10⁶)/10⁶ — the double divide
    * of an exact multiple of 10⁶ is exact), and the three-term
    * reassembly is one fixed deterministic IEEE expression, identical
    * in both engines. The 6-decimal quantization IS the operator's
    * definition — the SQL twin quantizes identically. Requires c ≥ 0. */
  def psum6(c: Column): Column = {
    val vi = floor(c).cast(LongType)
    val lo = vi % lit(1000000L)
    val hi = ((vi - lo).cast(DoubleType) / lit(1e6)).cast(LongType)
    val f6 = floor((c - floor(c)) * lit(1e6) + lit(0.5)).cast(LongType)
    (sum(hi).cast(DoubleType) * lit(1e6) + sum(lo).cast(DoubleType) +
      sum(f6).cast(DoubleType) / lit(1e6)).cast(DoubleType)
  }

  /** Exact average built from xsum / count — the fast [[davg]]. */
  def xavg(c: Column): Column =
    (xsum(c) / count(c)).cast(DoubleType)

  /** Order-free exact sum for SIGNED small values via ONE scaled long:
    * each row quantized half-up at the 8th decimal — floor(x·1e8 + 0.5)
    * (x·1e8 is a single correctly-rounded IEEE multiply, floor of it is
    * bit-deterministic in every engine, and the scheme works for
    * negative x where [[xsum]]'s floor/frac split requires x ≥ 0) —
    * then summed as plain longs in whole-stage codegen. The quantized
    * semantics ARE the operator's definition (the SQL twin quantizes
    * identically), measured ~5× faster than [[dsum12]]'s per-row
    * decimal casts on the covariance fan-out. Bound: |x| ≤ S keeps a
    * group's sum exact to ~9.2·10¹⁸/(S·10⁸) rows — 9·10¹⁰ rows/group
    * at S = 1 (embedding components), far past any per-group fan-in
    * here. */
  def zsum8(c: Column): Column =
    (sum(floor(c * lit(1e8) + lit(0.5)).cast(LongType)).cast(DoubleType) /
      lit(1e8)).cast(DoubleType)

  /** Membership probe of a string column against a pre-built Bloom
    * filter (serialized `org.apache.spark.util.sketch.BloomFilter`
    * bytes). May return false positives, never false negatives — pair
    * with an exact join on the survivors when exactness is required. */
  def bloomMightContain(c: Column, bloomBytes: Array[Byte]): Column =
    columnOf(BloomMightContain(expressionOf(c), bloomBytes))

  /** [[bloomMightContain]] for LONG keys (the hashed-shingle shape) —
    * probes with the filter's native long hash, matching how
    * `DataFrameStatFunctions.bloomFilter` inserts integral columns. */
  def bloomMightContainLong(c: Column, bloomBytes: Array[Byte]): Column =
    columnOf(BloomMightContainLong(expressionOf(c), bloomBytes))

  /** Space-join of the tokens whose 1-BASED position is NOT in
    * `positions` — span removal's re-assembly kernel, one compiled
    * O(n + m log m) merge per row; see [[TokensExceptPositions]]. */
  def tokensExceptPositions(toks: Column, positions: Column): Column =
    columnOf(TokensExceptPositions(
      expressionOf(toks), expressionOf(positions)))
}

/** Distinct word n-grams of a `array<string>` column in one compiled
  * loop: space-joined windows of `n` consecutive tokens, deduplicated in
  * first-occurrence order (the exact semantics of `array_distinct` over
  * the transform/slice/array_join lambda chain, which Spark interprets
  * per element). CodegenFallback costs one virtual call per ROW — the
  * loop body itself is JIT-compiled JVM code; null tokens (impossible
  * from `split`, containsNull=false upstream) would join as empty. */
case class NGramDistinct(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(space, parts.toIndexedSeq: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Mode count of word n-grams — max occurrences of any single n-gram —
  * in ONE compiled hash-counting pass over the token array (the kernel
  * of Gopher's top-bigram repetition rule). The declarative
  * formulations are catastrophically slower per row: an index-based
  * `transform(sequence, i -> element_at(toks, i))` re-evaluates the
  * tokenization PER ELEMENT (CSE cannot reach inside lambda bodies —
  * measured 8.6 s for q88 at sf0.1), and even the sort+run-length HOF
  * fold interprets per element with struct state (~1.6 s); this evals
  * the whole row in one tight loop (0.3 s, scan-speed). */
case class NGramModeCount(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return 0
    val counts = new java.util.HashMap[UTF8String, Integer]()
    val parts = new Array[UTF8String](n)
    var best = 0
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      val key = UTF8String.concatWs(space, parts.toIndexedSeq: _*)
      val c = counts.merge(key, 1, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Re-assembly kernel for span removal: given a token array and the
  * (distinct, in-range) 1-based positions to drop, emit the surviving
  * tokens space-joined in original order. One compiled pass per row —
  * positions sort once (m log m), then a linear merge over the tokens
  * (O(n + m)) — replacing the declarative form's per-doc corpus-token
  * explode → (doc_id, pos) shuffle join → collect_list re-sort, which
  * paid two corpus-token-sized exchanges for what is row-local work
  * once the covered positions arrive as an array. `array_contains`
  * inside a filter lambda would be the HOF alternative: interpreted
  * per element AND O(n·m) per row. Null positions array = drop
  * nothing (docs with no covered tokens). */
case class TokensExceptPositions(toks: Expression, positions: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def left: Expression = toks
  override def right: Expression = positions
  override def dataType: DataType = StringType

  // positions MUST be long elements: the merge reads them via
  // toLongArray, and an int-element UnsafeArrayData would silently
  // reinterpret its bytes rather than convert
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (toks.dataType, positions.dataType) match {
      // positions must be non-null elements: eval reads the array via
      // toLongArray, which NPEs on a GenericArrayData null slot and
      // silently reads 0 from an UnsafeArrayData one
      case (ArrayType(StringType, _), ArrayType(LongType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"requires (array<string>, array<bigint> with non-null elements), got ($l, $r)")
    }
  }

  private val space = UTF8String.fromString(" ")

  override def nullable: Boolean = toks.nullable

  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val t = toks.eval(input)
    if (t == null) return null
    val arr = t.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val p = positions.eval(input)
    if (p == null) {
      val all = new Array[UTF8String](n)
      var i = 0
      while (i < n) { all(i) = arr.getUTF8String(i); i += 1 }
      return UTF8String.concatWs(space, all.toIndexedSeq: _*)
    }
    val posArr = p.asInstanceOf[ArrayData].toLongArray()
    java.util.Arrays.sort(posArr)
    // sized for the worst case (drop nothing): duplicate or out-of-range
    // positions then cost capacity, never a silently dropped token
    val kept = new Array[UTF8String](n)
    var i = 0; var j = 0; var k = 0
    while (i < n) {
      val pos = i + 1L // 1-based token position
      while (j < posArr.length && posArr(j) < pos) j += 1
      if (j < posArr.length && posArr(j) == pos) j += 1
      else { kept(k) = arr.getUTF8String(i); k += 1 }
      i += 1
    }
    UTF8String.concatWs(space, kept.toIndexedSeq.take(k): _*)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(toks = newLeft, positions = newRight)
}

/** `mightContain` probe against a Bloom filter shipped as serialized
  * bytes inside the expression tree (task binaries are torrent-broadcast
  * by Spark, so the filter crosses the wire once per executor, not per
  * task). The filter deserializes lazily once per JVM/expression instance;
  * the per-row probe is a couple of hash-and-bit-test operations on the
  * raw UTF-8 bytes — no String allocation. CodegenFallback costs one
  * virtual call per row, negligible next to the probe itself. */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {

  import org.apache.spark.sql.types.BooleanType

  override def dataType: DataType = BooleanType

  @transient private lazy val bloom =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))

  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[BloomMightContain]]'s sibling for LONG keys: probes via
  * `mightContainLong`, the same hash `bloomFilter` uses to insert
  * integral columns — string and long probes are NOT interchangeable
  * on one filter, so the key representation must match the build. */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {

  import org.apache.spark.sql.types.BooleanType

  override def dataType: DataType = BooleanType

  @transient private lazy val bloom =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))

  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
