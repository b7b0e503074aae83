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
