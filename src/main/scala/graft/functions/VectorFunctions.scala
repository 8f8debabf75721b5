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
