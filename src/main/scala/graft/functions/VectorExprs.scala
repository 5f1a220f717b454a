package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the vector hot path (SURVEY.md §4
  * "potential custom pieces").
  *
  * `zip_with` + `aggregate` higher-order functions evaluate their
  * lambdas interpreted (they are excluded from whole-stage codegen), so
  * an O(n²)-pair cosine scan pays lambda-dispatch per element. This
  * expression generates a tight Java loop instead: `float_dot(a, b)` =
  * Σ (double)aᵢ·(double)bᵢ — the same left-to-right double accumulation
  * as the higher-order formulation, so results are bit-identical and
  * oracle parity is unchanged.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_dot expects (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"
  // Mismatched dimensions yield NULL (same as the zip_with/aggregate HOF
  // formulation, whose null-padding poisons the sum) — so this must be
  // nullable even over non-null children.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      s
    }
  }

  // ctx.freshName on every generated local: two float_dot calls codegen'd
  // into one scope would otherwise redeclare `i` and silently fall back to
  // the interpreted path.
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Shared builder with an arity check (indexing alone would silently
    * drop extra arguments). */
  private[graft] def build(exprs: Seq[Expression]): FloatDot = {
    require(exprs.length == 2, s"float_dot expects 2 arguments, got ${exprs.length}")
    FloatDot(exprs(0), exprs(1))
  }

  /** Registers `float_dot` in the session's function registry so it is
    * usable from `expr(...)`/SQL. Idempotent. (The library-install path
    * would be a SparkSessionExtensions.injectFunction; runtime
    * registration keeps the harness's plain sessions working.) */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_dot", build, "built-in")
}
