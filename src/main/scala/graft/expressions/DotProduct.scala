package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two array<double> columns, with
  * whole-stage codegen (`doGenCode`) — the hot kernel of the similarity
  * search module as a first-class expression instead of an interpreted
  * higher-order-function chain (the relational surface needs no custom
  * expressions; the engine's other two are [[BloomMightContain]] — the
  * sketch probe — and [[TopKByScore]] — the bounded-heap aggregate).
  *
  * Semantics: strict left-to-right fold `acc += a(i) * b(i)` from 0.0 —
  * the exact order of `aggregate(zip_with(a, b, _*_), 0d, _+_)` and of
  * DuckDB's `list_reduce(list_transform(list_zip(a, b), ...))`, so
  * results are bit-identical to both and stay hash-comparable against the
  * oracle. Null-intolerant: a null array yields null (codegen via
  * nullSafeCodeGen); element nulls are the caller's contract (cast arrays
  * carry containsNull=false). Mismatched lengths also yield null — the
  * same semantics as `zip_with`'s null padding in VectorSim.dotHof, so the
  * two documented-equivalent forms cannot diverge on ragged inputs.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // nullable even over non-null inputs: ragged arrays produce null
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires array<double> inputs, got ${left.dataType} and ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"""
         |int ${ev.value}_n = $x.numElements();
         |if (${ev.value}_n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double ${ev.value}_acc = 0.0;
         |  for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
         |    ${ev.value}_acc += $x.getDouble(${ev.value}_i) * $y.getDouble(${ev.value}_i);
         |  }
         |  ${ev.value} = ${ev.value}_acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API entry point — resolves through the function registry, so
    * the session must carry GraftExtensions (Sessions.local does). */
  def apply(a: Column, b: Column): Column = call_function("graft_dot", a, b)
}
