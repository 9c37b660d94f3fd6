package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `l2sq(a, b)` — squared L2 distance Σ(aᵢ−bᵢ)² over two double arrays
  * as a native Catalyst expression, the distance twin of [[DotProduct]]
  * (same motivation, same contract): the PQ family evaluates a
  * subvector L2² per (pair, subspace) on its ADC/assignment/rerank hot
  * paths, and the declarative `aggregate(zip_with(...))` form walks two
  * lambda dispatches and an intermediate array per element — worse,
  * higher-order functions never enter whole-stage codegen, so the
  * arithmetic core of the scan runs interpreted. `doGenCode` emits the
  * hand-written loop; inside a higher-order lambda (pqAssign's per-j
  * argmin) the `nullSafeEval` loop still beats the nested-HOF form.
  *
  * Summation is sequential left-to-right over (a-b)², bit-identical to
  * the previous `aggregate(zip_with)` fold AND to the DuckDB oracle's
  * `list_sum(list_transform(...))` — swapping the implementation
  * changes no hash.
  */
case class L2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${L2Sq.FuncName} expects two array<double> args, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $x.getDouble($i) - $y.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)
}

object L2Sq {
  val FuncName = "graft_l2sq"

  /** Idempotent registration, same contract as [[DotProduct.register]]. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier(FuncName)
    if (!reg.functionExists(id))
      reg.createOrReplaceTempFunction(
        FuncName, exprs => L2Sq(exprs(0), exprs(1)), "built-in")
  }

  def apply(a: Column, b: Column): Column = call_function(FuncName, a, b)
}
