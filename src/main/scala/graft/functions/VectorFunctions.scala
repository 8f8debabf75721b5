package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSql.{columnOf, expressionOf}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector kernels for embedding columns (`ArrayType(FloatType)`).
  *
  * The reference engine scores similarity with a numpy matmul
  * (reference: store/vector_store/numpy_store.py:558-626). Here the scoring
  * is a native Catalyst expression with whole-stage codegen so it runs
  * inside the generated loop with no boxing — the Spark-idiomatic
  * equivalent of a vectorized kernel. Accumulation is sequential in index
  * order (deterministic, matches a straightforward SQL oracle).
  */
object VectorFunctions {

  /** dot(a, b) over float/double arrays, computed in Double. */
  def dot(a: Column, b: Column): Column =
    columnOf(DotProduct(expressionOf(a), expressionOf(b)))

  /** L2 norm of a float/double array. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0d, 0d).otherwise(dot(a, b) / denom)
  }

  /** Cosine mapped to [0, 1] as (s+1)/2 — the buffer-retrieval convention
    * (reference: rag/retrieve/buffer.py:311-326). */
  def cosine01(a: Column, b: Column): Column = (cosine(a, b) + lit(1d)) / lit(2d)

  /** ADC distance of a PQ code array against a flattened LUT (see
    * [[graft.pipeline.PqIndex]]): Σ_s lut[s·ksub + codes[s]]. */
  def pqAdc(codes: Column, lut: Array[Double], ksub: Int): Column =
    columnOf(PqAdc(expressionOf(codes), lut, ksub))
}

/** Asymmetric-distance lookup for product-quantized vectors: one double
  * per row from `m` LUT loads — the whole ADC scan becomes a per-row
  * codegen'd expression feeding TakeOrdered directly, with no code
  * explode and no aggregation exchange (the row-layout twin in
  * [[graft.pipeline.PqIndex.adcTopK]] pays both, and stays as the
  * oracle-checked reference semantics). Accumulates in subspace order —
  * same additions as a fixed-order SQL sum. Out-of-range codes (never
  * produced by the encoder) yield null via the bounds check. */
case class PqAdc(child: Expression, lut: Array[Double], ksub: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType

  // always nullable (out-of-range code → null) even over a non-null
  // child — keeps ev.isNull a real variable in the generated code
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc needs array<int> codes, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val m = a.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) {
      val c = a.getInt(s)
      val i = s * ksub + c
      if (c < 0 || c >= ksub || i >= lut.length) return null
      acc += lut(i)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("pqLut", lut, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $a.numElements();
         |double $acc = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  int $c = $a.getInt($s);
         |  if ($c < 0 || $c >= $ksub || $s * $ksub + $c >= $lutRef.length) {
         |    ${ev.isNull} = true; break;
         |  }
         |  $acc += $lutRef[$s * $ksub + $c];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Σ a(i)·b(i) with each element widened to Double before multiply.
  * Null if either side is null. Mismatched lengths intentionally truncate
  * to min(length): the kernel treats the shorter vector as zero-padded,
  * which keeps the hot loop branch-free — callers are responsible for
  * dimension agreement (everything in this engine encodes at
  * `Schemas.EmbeddingDim`). Codegen emits a tight primitive loop (no
  * per-element nulls expected — embedding arrays are containsNull=false;
  * null elements are treated as 0).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemIsDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val la = elemIsDouble(left); val rb = elemIsDouble(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (la) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (rb) b.getDouble(i) else b.getFloat(i).toDouble
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (elemIsDouble(left)) "getDouble" else "getFloat"
    val getB = if (elemIsDouble(right)) "getDouble" else "getFloat"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$getA($i)) * ((double) $b.$getB($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
