package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Static vector kernel for codegen — the generated Java calls
  * [[VectorKernel.cosine]] directly, one virtual-call boundary per row
  * (the ExtractTextKernel pattern of SURVEY.md par 4.3).
  *
  * Semantics contract with the higher-order formulation it replaces
  * (`aggregate(zip_with(q, v, (x,y) -> x*y), 0d, (s,x) -> s+x)` plus the
  * two norm folds): IDENTICAL doubles, not just close ones —
  *  - accumulation runs in index order 0..n-1 (the fold order), so the
  *    IEEE sums are bit-equal to the lambda chain's;
  *  - the final value is dot / (sqrt(na) * sqrt(nb)) in exactly that
  *    operation order (matching `dot / (nq * nv)`);
  *  - length mismatch returns SQL NULL (zip_with pads with null, the
  *    null poisons the product, the fold returns null);
  *  - a null ELEMENT returns SQL NULL (same poisoning path);
  *  - zero vectors produce NaN (0/0), exactly as the folds do.
  * The round-6 consumers therefore cannot observe the swap — pinned by
  * FunctionsSpec against the original lambda formulation.
  *
  * Why it exists: the three-fold formulation allocates a zipped array
  * and evaluates three interpreted lambda chains per candidate pair; a
  * brute-force ANN pass at 10^5 probes x 10^6 candidates pays that
  * allocation ~10^11 times. The fused loop reads both arrays once,
  * allocates nothing, and stays inside whole-stage codegen.
  */
object VectorKernel {
  /** In-order dot product; NULL on length mismatch or a null element
    * (the zip_with-pad poisoning semantics).
    */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** In-order squared-L2 distance, same fold/null contract: each step
    * adds (a_i - b_i) * (a_i - b_i) exactly as the lambda
    * `(p, x) -> (p - x) * (p - x)` does.
    */
  def l2sq(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb)))
  }
}

/** Shared shape of the fused vector expressions: ARRAY<DOUBLE> x 2 ->
  * DOUBLE through one static kernel call (inside WholeStageCodegen).
  */
abstract class FusedVectorExpression extends BinaryExpression {
  protected def kernelMethod: String // static method name on VectorKernel
  protected def kernel(a: ArrayData, b: ArrayData): java.lang.Double

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<DOUBLE> inputs, got ${left.dataType} and ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val d = kernel(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (d == null) null else d.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("vres")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Double $boxed = graft.functions.VectorKernel.$kernelMethod($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin)
  }
}

/** `dot_d(a, b)` — fused in-order dot product. */
case class DotD(left: Expression, right: Expression) extends FusedVectorExpression {
  override def prettyName: String = "dot_d"
  override protected def kernelMethod: String = "dot"
  override protected def kernel(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorKernel.dot(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotD =
    copy(left = newLeft, right = newRight)
}

/** `l2_sq(a, b)` — fused in-order squared-L2 distance. */
case class L2Sq(left: Expression, right: Expression) extends FusedVectorExpression {
  override def prettyName: String = "l2_sq"
  override protected def kernelMethod: String = "l2sq"
  override protected def kernel(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorKernel.l2sq(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)
}

/** `cosine_sim(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) -> DOUBLE`: fused
  * single-pass cosine similarity as a native Catalyst expression with
  * `doGenCode` (static call, stays inside WholeStageCodegen).
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<DOUBLE> inputs, got ${left.dataType} and ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val d = VectorKernel.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (d == null) null else d.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("cos")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Double $boxed = graft.functions.VectorKernel.cosine($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
